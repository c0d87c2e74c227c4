"""Continuous-aggregate sink: incremental merge ≡ full recompute,
replay idempotence, generation pruning, and coarser resolutions served
from the stored finest level."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from trignis_spark.operators import rollup as ru
from trignis_spark.sinks.base import ExportContext
from trignis_spark.sinks.rollup_sink import RollupSink

CTX = ExportContext(environment="e", database="d", object_name="events")


def _events(spark, start, n):
    rows = [
        (
            start + i,
            "click" if i % 2 == 0 else "view",
            dt.datetime(2024, 1, 1) + dt.timedelta(minutes=17 * (start + i)),
            float(i) + 0.25,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz, value double"
    )


def _snapshot(spark, sink):
    cur = sink.read_current(spark, CTX)
    return {
        (r["bucket"], r["event_type"], r["n"], str(r["val_sum"]))
        for r in cur.collect()
    }


@pytest.fixture
def sink(tmp_path):
    return RollupSink(
        name="rollup",
        path=str(tmp_path / "rollups"),
        ts_col="ts",
        value_col="value",
        dims=("event_type",),
        resolution="hour",
    )


def test_incremental_merge_equals_full_recompute(spark, sink):
    b1, b2 = _events(spark, 0, 40), _events(spark, 40, 25)
    sink.write_df(b1, CTX, {"Sync": {"Version": 40}})
    sink.write_df(b2, CTX, {"Sync": {"Version": 65}})

    full = ru.normalize_level(
        ru.rollup_level(b1.unionByName(b2), "ts", "hour",
                        ("event_type",), "value")
    )
    want = {
        (r["bucket"], r["event_type"], r["n"], str(r["val_sum"]))
        for r in full.collect()
    }
    assert _snapshot(spark, sink) == want


def test_replay_of_applied_batch_is_noop(spark, sink):
    b1, b2 = _events(spark, 0, 40), _events(spark, 40, 25)
    sink.write_df(b1, CTX, {"Sync": {"Version": 40}})
    sink.write_df(b2, CTX, {"Sync": {"Version": 65}})
    before = _snapshot(spark, sink)
    sink.write_df(b2, CTX, {"Sync": {"Version": 65}})  # redelivery
    assert _snapshot(spark, sink) == before


def test_generations_pruned_keeping_newest(spark, sink, tmp_path):
    for i, v in enumerate((10, 20, 30)):
        sink.write_df(_events(spark, 10 * i, 10), CTX, {"Sync": {"Version": v}})
    root = tmp_path / "rollups" / "events"
    gens = sorted(d.name for d in root.iterdir() if d.name.startswith("gen-"))
    assert gens == ["gen-20", "gen-30"]  # keep_generations=2
    assert sink.current_generation(CTX).endswith("gen-30")


def test_coarser_resolution_served_from_stored_finest(spark, sink):
    b1, b2 = _events(spark, 0, 40), _events(spark, 40, 25)
    sink.write_df(b1, CTX, {"Sync": {"Version": 40}})
    sink.write_df(b2, CTX, {"Sync": {"Version": 65}})
    daily = ru.coarsen(sink.read_current(spark, CTX), "day", ("event_type",))
    direct = ru.rollup_level(
        b1.unionByName(b2), "ts", "day", ("event_type",), "value"
    )
    got = {
        (r["bucket"], r["event_type"], r["n"], str(r["val_sum"]))
        for r in daily.collect()
    }
    want = {
        (r["bucket"], r["event_type"], r["n"], str(r["val_sum"]))
        for r in direct.collect()
    }
    assert got == want


def test_rollup_sink_kind_builds_and_validates():
    from trignis_spark.config import (
        EnvironmentConfig,
        SinkConfig,
        TrackingObject,
        validate_environment,
    )
    from trignis_spark.sinks import build_sink
    from trignis_spark.sinks.rollup_sink import RollupSink as RS

    s = build_sink(
        "rollup", "r",
        {"path": "/tmp/x", "ts_col": "ts", "value_col": "value",
         "dims": ["event_type"], "resolution": "day"},
    )
    assert isinstance(s, RS) and s.dims == ("event_type",)

    env = EnvironmentConfig(
        name="e",
        tracking_objects=(TrackingObject(name="o", table_name="t"),),
        destinations=(SinkConfig(name="r", kind="rollup",
                                 options={"path": "/tmp/x"}),),
    )
    errs, _ = validate_environment(env)
    assert any("rollup sink requires ts_col" in e for e in errs)


def test_rollup_as_poll_df_sink(spark, tmp_path):
    """Wired as a PollPipeline df_sink: each poll cycle's change batch
    advances the continuously-maintained rollup alongside the
    watermark."""
    import datetime as dt

    from trignis_spark.config import EnvironmentConfig, TrackingObject
    from trignis_spark.deadletter import DeadLetterStore
    from trignis_spark.sinks.base import RetryPolicy
    from trignis_spark.state import StateStore
    from trignis_spark.streaming.poller import PollPipeline

    sink = RollupSink(
        name="rollup", path=str(tmp_path / "rollups"),
        ts_col="ts", value_col="value", dims=("event_type",),
        resolution="hour",
    )
    rows = [
        (1, 1, "I", "click", dt.datetime(2024, 1, 1, 10, 5), 1.5),
        (2, 2, "I", "view", dt.datetime(2024, 1, 1, 10, 40), 2.0),
    ]
    schema = ("version long, xact_id long, operation string, "
              "event_type string, ts timestamp_ntz, value double")
    env = EnvironmentConfig(
        name="e",
        tracking_objects=(
            TrackingObject(name="events", table_name="t",
                           initial_sync_mode="Full"),
        ),
    )
    p = PollPipeline(
        spark, env,
        source_fn=lambda s, o: s.createDataFrame(rows, schema),
        sinks=[], df_sinks=[sink],
        state=StateStore(str(tmp_path / "state")),
        dlq=DeadLetterStore(str(tmp_path / "dlq")),
        retry=RetryPolicy(attempts=1, delay_seconds=0, sleep=lambda _: None),
    )
    ctx_obj = CTX.__class__(environment="e", database="", object_name="events")
    [r1] = p.run_cycle()
    cur = {
        (str(r["bucket"]), r["event_type"]): (r["n"], str(r["val_sum"]))
        for r in sink.read_current(spark, ctx_obj).collect()
    }
    assert cur == {
        ("2024-01-01 10:00:00", "click"): (1, "1.500000"),
        ("2024-01-01 10:00:00", "view"): (1, "2.000000"),
    }
    # next cycle: two more events, one in a new hour bucket
    rows.append((3, 3, "I", "click", dt.datetime(2024, 1, 1, 10, 50), 0.5))
    rows.append((4, 4, "I", "click", dt.datetime(2024, 1, 1, 11, 5), 4.0))
    [r2] = p.run_cycle()
    assert r2.mode == "sync"
    cur = {
        (str(r["bucket"]), r["event_type"]): (r["n"], str(r["val_sum"]))
        for r in sink.read_current(spark, ctx_obj).collect()
    }
    assert cur[("2024-01-01 10:00:00", "click")] == (2, "2.000000")
    assert cur[("2024-01-01 11:00:00", "click")] == (1, "4.000000")
