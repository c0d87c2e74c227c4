"""applyInPandasWithState: state survives across micro-batches via the
checkpointed state store."""

import datetime as dt

from trignis_spark.sources.parquet_outbox import outbox_schema, stream_outbox
from trignis_spark.streaming.stateful import running_watermarks


def _write_wave(spark, path, start, n, op="I"):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (start + i, start + i, op, i % 3, ["value"],
         t0 + dt.timedelta(seconds=start + i), float(i), "{}")
        for i in range(n)
    ]
    spark.createDataFrame(rows, outbox_schema()).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, path, ckpt, captured):
    def capture(batch_df, epoch_id):
        captured.extend(r.asDict() for r in batch_df.collect())

    q = (
        running_watermarks(stream_outbox(spark, path))
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_running_watermark_state_accumulates(spark, tmp_path):
    path, ckpt = str(tmp_path / "outbox"), str(tmp_path / "ckpt")

    _write_wave(spark, path, start=1, n=10, op="I")
    out1 = []
    _drain(spark, path, ckpt, out1)
    first = {r["object_key"]: r for r in out1}
    assert first["I"]["last_version"] == 10
    assert first["I"]["total_rows"] == 10
    assert first["I"]["batches_seen"] == 1

    # second wave: state carries over through the checkpointed state store
    _write_wave(spark, path, start=11, n=5, op="I")
    _write_wave(spark, path, start=16, n=3, op="U")
    out2 = []
    _drain(spark, path, ckpt, out2)
    by_key = {r["object_key"]: r for r in out2}
    assert by_key["I"]["last_version"] == 15
    assert by_key["I"]["total_rows"] == 15  # cumulative across batches
    assert by_key["I"]["batches_seen"] == 2
    assert by_key["U"]["total_rows"] == 3
    assert by_key["U"]["batches_seen"] == 1
