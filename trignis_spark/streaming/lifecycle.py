"""Poller lifecycle: per-environment threads, hot reload, the
never-two-pollers invariant.

Reference semantics (``ChangeTrackingBackgroundService.cs:42-49,205-325``
+ ``EnvironmentConfigService.cs:55-155``): one task per environment;
config reloads diff by name and stop/start affected tasks under a
lifecycle gate; through arbitrary reload storms there must never be two
concurrently-running pollers for one environment — proven by the
interval-overlap oracle (``DuplicatePollerStressTests.cs:74-82``, our
``j4_interval_overlap`` query shape).

The probe log records (env, started_at, ended_at) per cycle so tests
can run the same oracle.
"""

from __future__ import annotations

import datetime as dt
import threading
from dataclasses import dataclass, field

from trignis_spark.config import EnvironmentConfig, diff_environments


@dataclass
class ProbeLog:
    """Thread-safe (env, start, end) interval log — the stress oracle's input."""

    rows: list[dict] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _next_id: int = 0

    def start(self, env: str) -> int:
        with self._lock:
            pid = self._next_id
            self._next_id += 1
            self.rows.append(
                {
                    "id": pid,
                    "env": env,
                    "started_at": dt.datetime.now(dt.timezone.utc),
                    "ended_at": None,
                }
            )
            return pid

    def end(self, pid: int) -> None:
        with self._lock:
            for r in self.rows:
                if r["id"] == pid:
                    r["ended_at"] = dt.datetime.now(dt.timezone.utc)

    def overlaps(self) -> list[tuple[int, int]]:
        """Interval-overlap self-join per env (J4). Zero rows = invariant
        holds. Open intervals count as extending to +inf."""
        far = dt.datetime.max.replace(tzinfo=dt.timezone.utc)
        with self._lock:
            rows = [dict(r) for r in self.rows]
        out = []
        for a in rows:
            for b in rows:
                if a["env"] == b["env"] and a["id"] < b["id"]:
                    a_end = a["ended_at"] or far
                    b_end = b["ended_at"] or far
                    if a["started_at"] < b_end and b["started_at"] < a_end:
                        out.append((a["id"], b["id"]))
        return out


class EnvironmentRunner(threading.Thread):
    """One environment's poll loop: cycle → sleep(interval) → repeat."""

    def __init__(self, env: EnvironmentConfig, cycle_fn, probe: ProbeLog,
                 interval_override: float | None = None):
        super().__init__(daemon=True, name=f"poller-{env.name}")
        self.env = env
        self.cycle_fn = cycle_fn
        self.probe = probe
        self.interval = (
            interval_override
            if interval_override is not None
            else env.polling_interval_seconds
        )
        self._stop_event = threading.Event()

    def stop(self, timeout: float = 5.0) -> None:
        """Signal and wait for termination. Blocks past `timeout` (with
        warnings) rather than return with the thread alive — the caller
        may immediately start a replacement poller, and two live pollers
        for one environment is the one forbidden state."""
        import logging

        self._stop_event.set()
        self.join(timeout)
        while self.is_alive():
            logging.getLogger("trignis_spark.lifecycle").warning(
                "%s: poller still mid-cycle after %.0fs; waiting before "
                "replacement can start", self.env.name, timeout,
            )
            self.join(timeout)

    def run(self) -> None:
        import logging

        log = logging.getLogger("trignis_spark.lifecycle")
        while not self._stop_event.is_set():
            pid = self.probe.start(self.env.name)
            try:
                self.cycle_fn(self.env)
            except Exception:  # noqa: BLE001 — a failed cycle retries next tick
                # reference contract: nothing advances, the same rows are
                # re-fetched next cycle — so the loop must survive
                log.exception("%s: poll cycle failed; retrying next interval",
                              self.env.name)
            finally:
                self.probe.end(pid)
            self._stop_event.wait(self.interval)


class Orchestrator:
    """Manages one runner per environment under a lifecycle gate."""

    def __init__(self, cycle_fn, probe: ProbeLog | None = None,
                 interval_override: float | None = None):
        self.cycle_fn = cycle_fn
        self.probe = probe or ProbeLog()
        self.interval_override = interval_override
        self._runners: dict[str, EnvironmentRunner] = {}
        self._configs: dict[str, EnvironmentConfig] = {}
        self._gate = threading.Lock()  # ≙ _lifecycleGate SemaphoreSlim

    def _start_locked(self, env: EnvironmentConfig) -> None:
        runner = EnvironmentRunner(
            env, self.cycle_fn, self.probe, self.interval_override
        )
        self._runners[env.name] = runner
        self._configs[env.name] = env
        runner.start()

    def _stop_locked(self, name: str) -> None:
        runner = self._runners.pop(name, None)
        self._configs.pop(name, None)
        if runner is not None:
            runner.stop()

    def start(self, envs: list[EnvironmentConfig]) -> None:
        with self._gate:
            for env in envs:
                if env.name not in self._runners:
                    self._start_locked(env)

    def reload(self, envs: list[EnvironmentConfig]) -> tuple[set, set, set]:
        """Hot reload: stop removed/updated runners (fully, inside the
        gate) before starting replacements — the invariant's crux."""
        new = {e.name: e for e in envs}
        with self._gate:
            added, removed, updated = diff_environments(self._configs, new)
            for name in removed | updated:
                self._stop_locked(name)
            for name in added | updated:
                self._start_locked(new[name])
            return added, removed, updated

    def shutdown(self) -> None:
        with self._gate:
            for name in list(self._runners):
                self._stop_locked(name)

    def running(self) -> set[str]:
        with self._gate:
            return set(self._runners)
