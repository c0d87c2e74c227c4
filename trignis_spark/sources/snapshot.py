"""Snapshot-diff source: change feeds for tables with no outbox or CT.

The third source family (SURVEY §7.2 step 3): when the tracked table
offers neither change tracking nor an outbox, the engine keeps the
previous snapshot and diffs it against the current read — a full-outer
PK join emitting I/U/D rows with per-column ``$changed`` masks
(``operators.changefeed.snapshot_diff``).

Versioning: each poll bumps a per-object cycle counter; every change in
that cycle carries the cycle number as its ``version``, so the
watermark algebra (max-version advance, incremental scans) works
unchanged.

Consistency: the new snapshot is persisted at *read* time, before
export. If an export then fails, the rows are already in the DLQ
payload (at-least-once via replay) — mirroring the reference's
"watermark advances after the export attempt" contract rather than
re-diffing. A crash before the diff completes leaves the old snapshot
in place → the next cycle re-diffs identically.

Scale: the stored snapshot is parquet; bucket both sides on the key
(``plans/bucketing.py``) to make the repeated diff join shuffle-free.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trignis_spark.config import TrackingObject
from trignis_spark.operators import changefeed as cf


@dataclass
class SnapshotDiffSource:
    """source_fn adapter for PollPipeline.

    ``reader_fn(spark, obj)`` returns the *current* table state.
    Snapshots and cycle counters persist under ``root`` per object.
    """

    root: str
    reader_fn: object  # (spark, TrackingObject) -> DataFrame

    def _paths(self, obj: TrackingObject) -> tuple[str, str]:
        base = os.path.join(self.root, obj.name)
        return os.path.join(base, "snapshot"), os.path.join(base, "cycle.json")

    def _cycle(self, meta_path: str) -> int:
        if os.path.exists(meta_path):
            return json.load(open(meta_path))["cycle"]
        return 0

    def __call__(self, spark: SparkSession, obj: TrackingObject) -> DataFrame:
        if not obj.key_columns:
            raise ValueError(f"object '{obj.name}': snapshot diff requires key_columns")
        snap_path, meta_path = self._paths(obj)
        current = self.reader_fn(spark, obj)
        tracked = obj.tracked_columns or tuple(
            c for c in current.columns if c not in obj.key_columns
        )
        cycle = self._cycle(meta_path) + 1

        if os.path.exists(snap_path):
            prev = spark.read.parquet(snap_path)
            diff = cf.snapshot_diff(
                prev, current, obj.key_columns, tracked, version=cycle
            )
        else:
            # first cycle: everything is an insert at version 1
            diff = current.select(
                F.lit("I").alias(cf.OPERATION),
                F.lit(cycle).cast("long").alias(cf.VERSION),
                F.lit(None).cast("array<string>").alias(cf.CHANGED),
                *[F.col(k) for k in obj.key_columns],
                *[F.col(c) for c in tracked],
            )

        # persist the new snapshot before export (see module docstring);
        # write to a versioned dir + atomic meta swap so a crash mid-write
        # never corrupts the previous snapshot
        new_snap = f"{snap_path}.cycle{cycle}"
        current.write.mode("overwrite").parquet(new_snap)
        diff = diff.localCheckpoint(eager=True)  # materialize before swap
        if os.path.exists(snap_path):
            import shutil

            shutil.rmtree(snap_path)
        os.rename(new_snap, snap_path)
        os.makedirs(os.path.dirname(meta_path), exist_ok=True)
        tmp = meta_path + ".tmp"
        json.dump({"cycle": cycle}, open(tmp, "w"))
        os.replace(tmp, meta_path)
        return diff
