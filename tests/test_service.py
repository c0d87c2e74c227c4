"""Service composition soak: pollers + watcher + replay loop together,
with an induced sink failure healing mid-run."""

import json
import time

from trignis_spark.operators import changefeed as cf
from trignis_spark.service import TrignisSparkService
from trignis_spark.sinks.base import RetryPolicy
from trignis_spark.sinks.memory import MemorySink
from trignis_spark.tables import load


def _write_env_file(path, name, sink_name):
    (path / f"{name}.json").write_text(
        json.dumps(
            {
                "name": name,
                "tracking_objects": [
                    {"name": "events", "table_name": "events",
                     "initial_sync_mode": "Full"}
                ],
                "destinations": [
                    {"name": sink_name, "kind": "memory", "options": {}}
                ],
            }
        )
    )


def test_service_soak_with_failure_and_replay(spark, tmp_path, monkeypatch):
    cfg = tmp_path / "environments"
    cfg.mkdir()
    _write_env_file(cfg, "alpha", "mem")

    # swap the memory-sink factory for one we can observe and break
    sinks_made = {}

    import trignis_spark.service as svc_mod

    real_build = svc_mod.build_sink

    def tracking_build(kind, name, options, env=None):
        sink = real_build(kind, name, options, env=env)
        if isinstance(sink, MemorySink):
            sinks_made[env.name] = sink
        return sink

    monkeypatch.setattr(svc_mod, "build_sink", tracking_build)

    def source_factory(obj):
        return lambda s, o: cf.events_as_outbox(
            load(s, "/root/testdata/sf0.001", o.table_name)
        )

    service = TrignisSparkService(
        spark,
        str(cfg),
        str(tmp_path / "work"),
        source_factory,
        replay_interval_seconds=0.3,
        poll_interval_override=0.2,
        retry=RetryPolicy(attempts=1, delay_seconds=0, sleep=lambda _: None),
    )
    problems = service.start()
    assert problems == []
    try:
        deadline = time.time() + 90
        while "alpha" not in sinks_made and time.time() < deadline:
            time.sleep(0.05)
        sink = sinks_made["alpha"]

        # wait for the first full-sync export to fully commit (sink
        # delivery happens before the watermark write — wait for both)
        while (
            service.state.get_last_version("alpha", "events") != 999
            and time.time() < deadline
        ):
            time.sleep(0.05)
        assert sink.payloads, "first cycle never exported"
        assert service.state.get_last_version("alpha", "events") == 999

        # hot-add a second environment whose sink fails → DLQ capture
        _write_env_file(cfg, "beta", "mem")
        while "beta" not in sinks_made and time.time() < deadline:
            time.sleep(0.05)
        beta_sink = sinks_made["beta"]
        beta_sink.always_fail = True
        while not service.dlq.rows() and time.time() < deadline:
            time.sleep(0.05)
        assert any(
            r["environment_name"] == "beta" for r in service.dlq.rows()
        ), "failure was not dead-lettered"

        # endpoint heals → the replay loop drains the DLQ
        beta_sink.always_fail = False
        beta_sink.fail_times = 0
        while service.dlq.rows() and time.time() < deadline:
            time.sleep(0.1)
        assert service.dlq.rows() == [], "replay loop did not drain the DLQ"

        # health reflects live state; single-poller invariant held
        snap = service.health.snapshot(force=True)
        assert {s["environment"] for s in snap["state"]} >= {"alpha", "beta"}
    finally:
        service.stop()
    assert service.probe.overlaps() == []
    assert service.orchestrator.running() == set()
