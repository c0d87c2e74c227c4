"""Snapshot-diff source: I/U/D emission across cycles, empty no-change
cycles, integration with the poll pipeline."""

import json

from trignis_spark.config import EnvironmentConfig, TrackingObject
from trignis_spark.deadletter import DeadLetterStore
from trignis_spark.sinks.base import RetryPolicy
from trignis_spark.sinks.memory import MemorySink
from trignis_spark.sources.snapshot import SnapshotDiffSource
from trignis_spark.state import StateStore
from trignis_spark.streaming.poller import PollPipeline

OBJ = TrackingObject(
    name="accounts",
    table_name="accounts",
    key_columns=("pk",),
    tracked_columns=("status", "amount"),
    initial_sync_mode="Full",
)
ENV = EnvironmentConfig(name="snap-env", tracking_objects=(OBJ,))


def test_snapshot_source_cycles(spark, tmp_path):
    tables = {"accounts": [(1, "a", 10.0), (2, "b", 20.0)]}

    def reader(s, obj):
        return s.createDataFrame(
            tables[obj.table_name], "pk long, status string, amount double"
        )

    src = SnapshotDiffSource(str(tmp_path / "snap"), reader)
    sink = MemorySink("m")
    pipe = PollPipeline(
        spark, ENV, src, [sink],
        StateStore(str(tmp_path / "st")), DeadLetterStore(str(tmp_path / "dl")),
        retry=RetryPolicy(attempts=1, delay_seconds=0, sleep=lambda _: None),
    )

    # cycle 1: first snapshot → all inserts at version 1
    [r1] = pipe.run_cycle()
    assert (r1.mode, r1.exported_rows, r1.new_watermark) == ("full", 2, 1)
    data1 = json.loads(sink.payloads[0][0])["Data"]
    assert {d["operation"] for d in data1} == {"I"}

    # cycle 2: no changes → nothing exported, watermark holds
    [r2] = pipe.run_cycle()
    assert (r2.mode, r2.exported_rows) == ("empty", 0)

    # cycle 3: one update, one delete, one insert
    tables["accounts"] = [(1, "a", 99.0), (3, "c", 30.0)]
    [r3] = pipe.run_cycle()
    assert (r3.mode, r3.exported_rows, r3.new_watermark) == ("sync", 3, 3)
    by_pk = {d["pk"]: d for d in json.loads(sink.payloads[1][0])["Data"]}
    assert by_pk[1]["operation"] == "U" and by_pk[1]["changed"] == ["amount"]
    assert by_pk[2]["operation"] == "D"
    assert by_pk[3]["operation"] == "I"

    # cycle 4: steady state again
    [r4] = pipe.run_cycle()
    assert r4.mode == "empty"


def test_crash_before_commit_re_emits_batch(spark, tmp_path):
    """A pending snapshot whose cycle never committed is discarded; the
    next cycle re-diffs the same baseline and re-emits (at-least-once)."""
    tables = {"accounts": [(1, "a", 10.0)]}

    def reader(s, obj):
        return s.createDataFrame(
            tables[obj.table_name], "pk long, status string, amount double"
        )

    src = SnapshotDiffSource(str(tmp_path / "snap"), reader)
    # cycle 1 committed normally
    df1 = src(spark, OBJ)
    assert df1.count() == 1
    src.commit(OBJ)

    # cycle 2: diff computed but NO commit (simulated crash before export)
    tables["accounts"] = [(1, "a", 99.0)]
    df2 = src(spark, OBJ)
    assert [r["operation"] for r in df2.collect()] == ["U"]
    # crash: commit never called; a new source instance starts fresh
    src2 = SnapshotDiffSource(str(tmp_path / "snap"), reader)
    df3 = src2(spark, OBJ)
    rows = df3.collect()
    assert [r["operation"] for r in rows] == ["U"]  # batch re-emitted
    assert rows[0]["amount"] == 99.0
    src2.commit(OBJ)
    # after commit the change is gone for good
    assert src2(spark, OBJ).count() == 0


def test_half_finished_promotion_recovers(spark, tmp_path):
    import os

    tables = {"accounts": [(1, "a", 10.0), (2, "b", 20.0)]}

    def reader(s, obj):
        return s.createDataFrame(
            tables[obj.table_name], "pk long, status string, amount double"
        )

    src = SnapshotDiffSource(str(tmp_path / "snap"), reader)
    src(spark, OBJ)
    src.commit(OBJ)
    base = str(tmp_path / "snap" / "accounts")
    # simulate a crash mid-promotion: baseline renamed away, pending left
    os.rename(base + "/snapshot", base + "/snapshot.old")
    os.makedirs(base + "/pending", exist_ok=True)
    # recovery on next read: baseline restored, pending discarded
    tables["accounts"] = [(1, "a", 10.0)]  # row 2 deleted upstream
    src2 = SnapshotDiffSource(str(tmp_path / "snap"), reader)
    rows = src2(spark, OBJ).collect()
    assert [r["operation"] for r in rows] == ["D"]  # diff vs restored baseline
