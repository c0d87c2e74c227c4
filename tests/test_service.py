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

        # endpoint heals → the replay loop drains the DLQ. If a sweep
        # already failed during the outage, the row backed off 60 s —
        # reset its attempts (the operator's manual-replay semantic) so
        # it rejoins the rotation inside the test window.
        beta_sink.always_fail = False
        beta_sink.fail_times = 0
        while service.dlq.rows() and time.time() < deadline:
            for r in service.dlq.rows():
                if r["attempts"] > 0:
                    service.dlq.reset_attempts(r["id"])
            time.sleep(0.1)
        assert service.dlq.rows() == [], "replay loop did not drain the DLQ"

        # health reflects live state; single-poller invariant held
        snap = service.health.snapshot(force=True)
        assert {s["environment"] for s in snap["state"]} >= {"alpha", "beta"}
    finally:
        service.stop()
    assert service.probe.overlaps() == []
    assert service.orchestrator.running() == set()


def test_service_api_and_crypto_integration(spark, tmp_path):
    """Composition root round 2: PWENC encrypt-on-start rewrites config
    secrets, the loader decrypts them, and the HTTP app serves the
    control plane over this service's stores."""
    import pytest

    pytest.importorskip("flask")
    pytest.importorskip("cryptography")
    from trignis_spark.crypto import ENCRYPTED_HEADER, EncryptionService

    cfg = tmp_path / "environments"
    cfg.mkdir()
    (cfg / "alpha.json").write_text(
        json.dumps(
            {
                "name": "alpha",
                "tracking_objects": [
                    {"name": "events", "table_name": "events",
                     "initial_sync_mode": "Full"}
                ],
                "destinations": [
                    {
                        "name": "hook",
                        "kind": "http",
                        "options": {
                            "url": "https://example.test/x",
                            "bearer_token": "tok-plain",
                        },
                    }
                ],
            }
        )
    )
    crypto = EncryptionService(str(tmp_path / "work"), passphrase="k")

    def source_factory(obj):
        return lambda s, o: cf.events_as_outbox(
            load(s, "/root/testdata/sf0.001", o.table_name)
        )

    service = TrignisSparkService(
        spark, str(cfg), str(tmp_path / "work"), source_factory,
        retry=RetryPolicy(attempts=1, delay_seconds=0, sleep=lambda _: None),
        crypto=crypto,
    )
    problems = service.start()
    try:
        assert problems == []
        # encrypt-on-start rewrote the plaintext token at rest
        on_disk = json.loads((cfg / "alpha.json").read_text())
        assert on_disk["destinations"][0]["options"]["bearer_token"].startswith(
            ENCRYPTED_HEADER
        )
        # ...and the loaded config decrypted it
        env = service._envs_snapshot()["alpha"]
        assert env.destinations[0].options["bearer_token"] == "tok-plain"

        client = service.api_app().test_client()
        # let one poll cycle land a watermark, then read it over HTTP
        deadline = time.time() + 60
        while time.time() < deadline:
            body = client.get("/health/state").get_json()
            if body["total_environments"] == 1:
                break
            time.sleep(0.5)
        [envs] = body["environments"]
        assert envs["name"] == "alpha"
        assert client.get("/health").status_code == 200
        # pause through the API pauses the live service
        client.post("/ui/api/pause", json={"environment": "alpha"})
        assert service.pauses.is_paused("alpha")
    finally:
        service.stop()


def test_build_sink_queue_kinds_with_injected_transport():
    from trignis_spark.sinks import build_sink
    from trignis_spark.sinks.base import ExportContext
    from trignis_spark.sinks.queue import CappedQueueSink

    sent = []
    sink = build_sink(
        "aws-sqs", "q", {"send": lambda body, attrs: sent.append((body, attrs))}
    )
    assert isinstance(sink, CappedQueueSink) and sink.flavor == "aws-sqs"
    sink.write('{"x":1}', ExportContext("e", "db", "obj", "k"))
    assert sent and sent[0][0] == b'{"x":1}'


def test_build_sink_queue_kind_builds_live_transport():
    from trignis_spark.sinks import build_sink
    from trignis_spark.sinks.transports import RabbitMqTransport

    sink = build_sink("rabbitmq", "mq", {"host": "mq.example", "queue": "q"})
    assert isinstance(sink.send, RabbitMqTransport)


def test_service_routes_mirror_sink_to_distributed_path(spark, tmp_path):
    """A 'mirror' destination in config builds a DataFrameSink and the
    poll cycle maintains the mirror table (no envelope collect)."""
    cfg = tmp_path / "environments"
    cfg.mkdir()
    (cfg / "alpha.json").write_text(json.dumps({
        "name": "alpha",
        "tracking_objects": [
            {"name": "events", "table_name": "events",
             "initial_sync_mode": "Full"}
        ],
        "destinations": [
            {"name": "mt", "kind": "mirror",
             "options": {"path": str(tmp_path / "mirror"),
                          "key_cols": ["user_key"],
                          "tracked_cols": ["event_type", "value"]}}
        ],
    }))

    def source_factory(obj):
        return lambda s, o: cf.events_as_outbox(
            load(s, "/root/testdata/sf0.001", o.table_name)
        )

    service = TrignisSparkService(
        spark, str(cfg), str(tmp_path / "work"), source_factory,
        retry=RetryPolicy(attempts=1, delay_seconds=0, sleep=lambda _: None),
        poll_interval_override=1.0,
    )
    try:
        assert service.start() == []
        deadline = time.time() + 90
        mirror_dir = tmp_path / "mirror" / "events"
        while time.time() < deadline and not (mirror_dir / "_CURRENT").exists():
            time.sleep(0.5)
        assert (mirror_dir / "_CURRENT").exists()
        gen = (mirror_dir / "_CURRENT").read_text().strip()
        back = spark.read.parquet(str(mirror_dir / gen))
        assert back.count() > 0
        assert set(back.columns) == {"user_key", "event_type", "value"}
    finally:
        service.stop()
