"""Config directory watcher: debounced hot reload of environments/*.json.

Reference semantics (``EnvironmentConfigService.cs:55-155``): watch the
environments directory, debounce bursts of file events (500 ms), parse +
validate changed files, and hand the full new config set to the
Orchestrator — whose lifecycle gate guarantees the never-two-pollers
invariant across the swap.

Implemented as mtime polling (portable, no inotify dependency); the
debounce means a burst of writes triggers one reload.
"""

from __future__ import annotations

import glob
import logging
import os
import threading

from trignis_spark.config import (
    EnvironmentConfig,
    load_environment_json,
    validate_environment,
)

log = logging.getLogger("trignis_spark.watcher")

DEBOUNCE_SECONDS = 0.5


def load_environment_dir(
    path: str, crypto=None
) -> tuple[list[EnvironmentConfig], list[str]]:
    """Parse + validate every environments/*.json file. Invalid files are
    reported and skipped (a broken config must not take down running
    pollers). ``crypto`` (an ``EncryptionService``) decrypts ``PWENC:``
    secrets on load."""
    envs: list[EnvironmentConfig] = []
    problems: list[str] = []
    for fp in sorted(glob.glob(os.path.join(path, "*.json"))):
        try:
            env = load_environment_json(
                open(fp, encoding="utf-8").read(), crypto=crypto
            )
        except Exception as e:  # noqa: BLE001
            problems.append(f"{fp}: parse error: {e}")
            continue
        errors, warnings = validate_environment(env)
        for w in warnings:
            log.warning("%s: %s", fp, w)
        if errors:
            problems.append(f"{fp}: {'; '.join(errors)}")
            continue
        envs.append(env)
    return envs, problems


class ConfigWatcher:
    """Polls a config dir; on (debounced) change, calls reload_fn(envs)."""

    def __init__(
        self,
        path: str,
        reload_fn,
        poll_interval: float = 0.2,
        debounce: float = DEBOUNCE_SECONDS,
        crypto=None,
    ):
        self.path = path
        self.reload_fn = reload_fn
        self.crypto = crypto
        self.poll_interval = poll_interval
        self.debounce = debounce
        self._stop_event = threading.Event()
        self._thread: threading.Thread | None = None
        self._baseline: tuple | None = None
        self.reloads = 0

    def _fingerprint(self) -> tuple:
        entries = []
        for fp in glob.glob(os.path.join(self.path, "*.json")):
            try:
                st = os.stat(fp)
            except OSError:
                continue  # deleted/renamed mid-scan — next poll sees the result
            entries.append((fp, st.st_mtime_ns, st.st_size))
        return tuple(sorted(entries))

    def _run(self) -> None:
        # baseline captured synchronously in start() — a write racing the
        # thread spawn is still detected
        last = self._baseline
        while not self._stop_event.is_set():
            self._stop_event.wait(self.poll_interval)
            cur = self._fingerprint()
            if cur == last:
                continue
            # debounce: wait for the burst to settle
            while not self._stop_event.is_set():
                self._stop_event.wait(self.debounce)
                nxt = self._fingerprint()
                if nxt == cur:
                    break
                cur = nxt
            last = cur
            if self.crypto is not None:
                # encrypt-on-reload: a hand-edited file with plaintext
                # secrets is re-encrypted before anything else reads it
                self.crypto.encrypt_config_files(self.path)
            envs, problems = load_environment_dir(self.path, crypto=self.crypto)
            for p in problems:
                log.error("config reload: %s", p)
            self.reload_fn(envs)
            self.reloads += 1

    def start(self) -> None:
        self._baseline = self._fingerprint()
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="config-watcher"
        )
        self._thread.start()

    def stop(self, timeout: float = 5.0) -> None:
        self._stop_event.set()
        if self._thread is not None:
            self._thread.join(timeout)
