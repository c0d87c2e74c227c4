"""Structured Streaming export: micro-batch fan-out, checkpointed
exactly-once file offsets, late-data windowed aggregation."""

import datetime as dt
import json

from trignis_spark.config import EnvironmentConfig, TrackingObject
from trignis_spark.deadletter import DeadLetterStore
from trignis_spark.sinks.base import RetryPolicy
from trignis_spark.sinks.memory import MemorySink
from trignis_spark.sources.parquet_outbox import outbox_schema, stream_outbox
from trignis_spark.state import StateStore
from trignis_spark.streaming.structured import (
    run_export_stream,
    windowed_rate_stats,
)

ENV = EnvironmentConfig(
    name="stream-env",
    tracking_objects=(TrackingObject(name="outbox", table_name="t"),),
)
OBJ = ENV.tracking_objects[0]
RETRY = RetryPolicy(attempts=1, delay_seconds=0, sleep=lambda _: None)


def _write_wave(spark, path, start, n):
    rows = [
        (
            start + i,
            start + i,
            "I",
            i % 3,
            ["value"],
            dt.datetime(2024, 1, 1, 0, start + i, 0),
            float(i),
            "{}",
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, outbox_schema())
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(spark, path, sink, state, dlq, checkpoint):
    q = run_export_stream(
        stream_outbox(spark, path),
        ENV, OBJ, [sink], state, dlq,
        checkpoint_dir=checkpoint, available_now=True, retry=RETRY,
    )
    q.awaitTermination(120)
    return q


def test_stream_export_drains_and_checkpoints(spark, tmp_path):
    path = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    state = StateStore(str(tmp_path / "state"))
    dlq = DeadLetterStore(str(tmp_path / "dlq"))
    sink = MemorySink("s")

    _write_wave(spark, path, start=1, n=5)
    _drain(spark, path, sink, state, dlq, ckpt)
    assert len(sink.payloads) == 1
    first = json.loads(sink.payloads[0][0])
    assert [d["version"] for d in first["Data"]] == [1, 2, 3, 4, 5]
    assert state.get_last_version("stream-env", "outbox") == 5

    # second wave: only new files are processed (checkpoint offsets)
    _write_wave(spark, path, start=6, n=3)
    _drain(spark, path, sink, state, dlq, ckpt)
    assert len(sink.payloads) == 2
    second = json.loads(sink.payloads[1][0])
    assert [d["version"] for d in second["Data"]] == [6, 7, 8]
    assert state.get_last_version("stream-env", "outbox") == 8

    # no new data → drain is a no-op (exactly-once file tracking)
    _drain(spark, path, sink, state, dlq, ckpt)
    assert len(sink.payloads) == 2


def test_stream_failures_deadletter_but_epoch_commits(spark, tmp_path):
    path = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    state = StateStore(str(tmp_path / "state"))
    dlq = DeadLetterStore(str(tmp_path / "dlq"))
    good, bad = MemorySink("good"), MemorySink("bad", always_fail=True)

    _write_wave(spark, path, start=1, n=4)
    q = run_export_stream(
        stream_outbox(spark, path), ENV, OBJ, [good, bad], state, dlq,
        checkpoint_dir=ckpt, available_now=True, retry=RETRY,
    )
    q.awaitTermination(120)
    assert len(good.payloads) == 1
    assert len(dlq.rows()) == 1
    assert dlq.rows()[0]["source_key"] == "stream-env/outbox/bad"
    assert state.get_last_version("stream-env", "outbox") == 4  # advanced anyway

    # restart with the same checkpoint: epoch committed → no reprocessing
    q2 = run_export_stream(
        stream_outbox(spark, path), ENV, OBJ, [good, bad], state, dlq,
        checkpoint_dir=ckpt, available_now=True, retry=RETRY,
    )
    q2.awaitTermination(120)
    assert len(good.payloads) == 1 and len(dlq.rows()) == 1


def test_windowed_rate_stats_with_watermark(spark, tmp_path):
    path = str(tmp_path / "outbox")
    _write_wave(spark, path, start=1, n=10)
    stats = windowed_rate_stats(stream_outbox(spark, path), window="5 minutes")
    q = (
        stats.writeStream.format("memory")
        .queryName("rate_stats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; the plan must at
    # least carry the watermark + window aggregation without error
    rows = spark.sql("SELECT * FROM rate_stats").collect()
    assert all(r["n"] >= 1 for r in rows)


def test_streaming_dedup_across_batches(spark, tmp_path):
    from trignis_spark.streaming.structured import streaming_dedup

    path, ckpt = str(tmp_path / "outbox"), str(tmp_path / "ckpt-dedup")
    # wave 1 + wave 2 share versions 3..5 (replayed rows)
    _write_wave(spark, path, start=1, n=5)
    _write_wave(spark, path, start=3, n=3)

    captured = []

    def capture(batch_df, epoch_id):
        captured.extend(r.asDict() for r in batch_df.collect())

    q = (
        streaming_dedup(stream_outbox(spark, path), keys=["version"])
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    versions = sorted(r["version"] for r in captured)
    assert versions == [1, 2, 3, 4, 5]  # duplicates suppressed

    # a later drain re-delivering version 5 is also suppressed (state held)
    _write_wave(spark, path, start=5, n=1)
    q2 = (
        streaming_dedup(stream_outbox(spark, path), keys=["version"])
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(r["version"] for r in captured) == [1, 2, 3, 4, 5]


def test_session_window_stats_native(spark, tmp_path):
    from trignis_spark.streaming.structured import session_window_stats

    path = str(tmp_path / "outbox")
    # two bursts for user 0, 40 min apart → two sessions once closed
    _write_wave(spark, path, start=1, n=3)     # minutes 1..3
    _write_wave(spark, path, start=45, n=3)    # minutes 45..47
    stats = session_window_stats(
        stream_outbox(spark, path), gap="30 minutes",
        watermark_delay="0 seconds",
    )
    q = (
        stats.writeStream.format("memory")
        .queryName("sess_stats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM sess_stats ORDER BY user_key, session_start"
    ).collect()
    # append mode emits sessions the watermark has closed; the first
    # burst's sessions must be out (the stream's max event time is far
    # past their end + gap)
    assert rows, "no closed sessions emitted"
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_streaming_dedup_within_watermark_ignores_ts_drift(spark, tmp_path):
    """Same key, drifted event time: still suppressed — the native
    dropDuplicatesWithinWatermark path (key-only identity, bounded
    state)."""
    import datetime as dt

    from trignis_spark.sources.parquet_outbox import outbox_schema
    from trignis_spark.streaming.structured import (
        streaming_dedup_within_watermark,
    )

    path, ckpt = str(tmp_path / "outbox"), str(tmp_path / "ckpt-ddw")

    def wave(rows):
        spark.createDataFrame(rows, outbox_schema()).coalesce(1) \
            .write.mode("append").parquet(path)

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    wave([(v, v, "I", 1, ["value"], t0, 1.0, "{}") for v in (1, 2, 3)])
    # replay of version 3 with a 2-minute-drifted timestamp
    wave([(3, 3, "I", 1, ["value"],
           t0 + dt.timedelta(minutes=2), 1.0, "{}")])

    captured = []

    def capture(batch_df, epoch_id):
        captured.extend(r.asDict() for r in batch_df.collect())

    stream = spark.readStream.schema(outbox_schema()).parquet(path)
    q = (
        streaming_dedup_within_watermark(stream, keys=["version"])
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["version"] for r in captured) == [1, 2, 3]
