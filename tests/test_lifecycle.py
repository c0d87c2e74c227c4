"""Lifecycle stress: the never-two-pollers invariant through reload
storms (port of DuplicatePollerStressTests) + shutdown stops all."""

import threading
import time

from trignis_spark.config import EnvironmentConfig, TrackingObject
from trignis_spark.streaming.lifecycle import Orchestrator, ProbeLog


def _env(name, interval=60):
    return EnvironmentConfig(
        name=name,
        tracking_objects=(TrackingObject(name="o", table_name="t"),),
        polling_interval_seconds=interval,
    )


def _slow_cycle(env):
    time.sleep(0.07)  # simulated procedure latency (reference uses 0.7s)


def test_no_duplicate_pollers_through_reload_storm():
    probe = ProbeLog()
    orch = Orchestrator(_slow_cycle, probe, interval_override=0.02)
    envs = [_env("a"), _env("b"), _env("c")]
    orch.start(envs)
    try:
        # 12 reload rounds mutating configs (forces stop/start of every env)
        for i in range(12):
            mutated = [_env(e.name, interval=60 + i + 1) for e in envs]
            orch.reload(mutated)
            time.sleep(0.03)
        # 16-way concurrent reload burst
        threads = [
            threading.Thread(
                target=orch.reload,
                args=([_env(e.name, interval=200 + t) for e in envs],),
            )
            for t in range(16)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        time.sleep(0.1)
    finally:
        orch.shutdown()
    assert probe.overlaps() == []  # zero interval overlaps per environment
    assert len(probe.rows) > 10  # pollers actually ran


def test_shutdown_freezes_probe_count():
    probe = ProbeLog()
    orch = Orchestrator(_slow_cycle, probe, interval_override=0.01)
    orch.start([_env("a"), _env("b")])
    time.sleep(0.15)
    orch.shutdown()
    assert orch.running() == set()
    frozen = len(probe.rows)
    time.sleep(0.15)
    assert len(probe.rows) == frozen  # no poller survived shutdown


def test_reload_adds_and_removes():
    probe = ProbeLog()
    orch = Orchestrator(_slow_cycle, probe, interval_override=0.02)
    orch.start([_env("a")])
    added, removed, updated = orch.reload([_env("a"), _env("b")])
    assert added == {"b"} and removed == set() and updated == set()
    assert orch.running() == {"a", "b"}
    added, removed, updated = orch.reload([_env("b")])
    assert removed == {"a"}
    assert orch.running() == {"b"}
    orch.shutdown()


def test_runner_survives_cycle_exceptions():
    calls = []

    def flaky_cycle(env):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("transient source failure")

    probe = ProbeLog()
    orch = Orchestrator(flaky_cycle, probe, interval_override=0.02)
    orch.start([_env("a")])
    time.sleep(0.3)
    orch.shutdown()
    # first cycle raised; the poller kept going and ran more cycles
    assert len(calls) >= 3
    assert probe.overlaps() == []
