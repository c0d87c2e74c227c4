"""Health surface: monitor stats, threshold alerting cooldown, probes,
snapshot caching."""

import datetime as dt

from trignis_spark.deadletter import DeadLetterStore
from trignis_spark.health import (
    ConnectionHealth,
    DeadLetterMonitor,
    HealthService,
)
from trignis_spark.state import PauseStore, StateStore, env_scope

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


def _fill(dlq, n, obj="objA", start=NOW):
    for i in range(n):
        dlq.save(
            source_key=f"k{obj}{i}",
            tracking_object_name=obj,
            environment_name="e",
            database_name="db",
            data=f'{{"i":"{obj}{i}"}}',
            error_message="timeout" if i % 2 == 0 else "refused",
            now=start + dt.timedelta(minutes=i),
        )


def test_monitor_stats_windows_and_topk(tmp_path):
    dlq = DeadLetterStore(str(tmp_path))
    _fill(dlq, 3, obj="objA", start=NOW - dt.timedelta(days=2))  # old
    _fill(dlq, 5, obj="objB", start=NOW - dt.timedelta(minutes=30))  # recent
    s = DeadLetterMonitor(dlq).stats(now=NOW)
    assert s["total"] == 8
    assert s["last_hour"] == 5
    assert s["last_day"] == 5
    assert s["last_week"] == 8
    assert s["top_failing_objects"][0] == {"object": "objB", "count": 5}
    assert s["most_common_error"] == "timeout"


def test_threshold_alert_with_cooldown_and_prewarn(tmp_path):
    dlq = DeadLetterStore(str(tmp_path))
    mon = DeadLetterMonitor(dlq, threshold=4)
    _fill(dlq, 3)
    assert mon.check_threshold(NOW) == "pre-warning"  # 3 >= 0.75*4
    _fill(dlq, 1, obj="objC")
    assert mon.check_threshold(NOW) == "alert"
    assert mon.check_threshold(NOW + dt.timedelta(minutes=30)) is None  # cooldown
    assert mon.check_threshold(NOW + dt.timedelta(hours=2)) == "alert"


def test_connection_health_counts_and_recovery():
    ch = ConnectionHealth()
    for _ in range(3):
        ch.record_probe("db1", ok=False)
    ch.record_probe("mq1", ok=False)
    assert ch.failures("db1") == 3
    assert ch.unhealthy(after=3) == ["db1"]
    ch.record_probe("db1", ok=True)
    assert ch.failures("db1") == 0
    assert ch.drain_recoveries() == ["db1"]
    assert ch.drain_recoveries() == []  # drained


def test_health_snapshot_cached_with_ttl(tmp_path):
    state = StateStore(str(tmp_path / "s"))
    dlq = DeadLetterStore(str(tmp_path / "d"))
    pauses = PauseStore(str(tmp_path / "p"))
    state.set_last_version("e1", "o1", 7)
    pauses.pause(env_scope("e2"))
    t = [0.0]
    svc = HealthService(state, dlq, pauses, cache_ttl_seconds=120, clock=lambda: t[0])
    snap = svc.snapshot()
    assert snap["status"] == "healthy"
    assert snap["state"] == [{"environment": "e1", "object": "o1", "last_version": 7}]
    assert snap["paused_scopes"] == ["env:e2"]

    _fill(dlq, 1)
    assert svc.snapshot()["status"] == "healthy"  # cached within TTL
    t[0] = 121.0
    assert svc.snapshot()["status"] == "degraded"  # TTL expired → refreshed
    assert svc.snapshot(force=True)["deadletters"]["total"] == 1
