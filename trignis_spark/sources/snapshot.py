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

Consistency (at-least-once, mirroring the reference's "nothing advances
on error → same rows re-fetched"):

- the current table state is scanned **once** into a *pending* snapshot
  directory, and the diff is computed from that persisted copy — the
  emitted batch and the stored baseline can never diverge, even against
  a live mutating source;
- the pending snapshot is promoted to the committed baseline only in
  ``commit()``, which ``PollPipeline`` calls *after* the export attempt
  and watermark advance. A crash anywhere before commit discards the
  pending snapshot, so the next cycle re-diffs the same baseline and
  re-emits the batch (duplicates are absorbed by the DLQ's hash dedup /
  idempotent sinks);
- promotion is a rename dance with explicit crash recovery on the next
  read (a half-finished promotion restores the old baseline or finishes
  discarding it — the baseline is never lost).

Scale: snapshots are parquet; bucket both sides on the key
(``plans/bucketing.py``) to make the repeated diff join shuffle-free.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trignis_spark.config import TrackingObject
from trignis_spark.operators import changefeed as cf


@dataclass
class SnapshotDiffSource:
    """source_fn adapter for PollPipeline (with a ``commit`` hook).

    ``reader_fn(spark, obj)`` returns the *current* table state.
    Snapshots and cycle counters persist under ``root`` per object.
    """

    root: str
    reader_fn: object  # (spark, TrackingObject) -> DataFrame
    _staged: dict[str, int] = field(default_factory=dict)

    def _paths(self, obj: TrackingObject) -> dict[str, str]:
        base = os.path.join(self.root, obj.name)
        return {
            "snapshot": os.path.join(base, "snapshot"),
            "old": os.path.join(base, "snapshot.old"),
            "pending": os.path.join(base, "pending"),
            "meta": os.path.join(base, "cycle.json"),
        }

    def _recover(self, p: dict[str, str]) -> None:
        """Finish or roll back a promotion interrupted by a crash."""
        if os.path.exists(p["old"]):
            if not os.path.exists(p["snapshot"]):
                os.rename(p["old"], p["snapshot"])  # roll back half-promotion
            else:
                shutil.rmtree(p["old"])  # promotion finished; drop leftovers
        if os.path.exists(p["pending"]):
            # a pending snapshot whose batch was never committed: discard —
            # the next diff re-emits those changes (at-least-once)
            shutil.rmtree(p["pending"])

    def _cycle(self, meta_path: str) -> int:
        if os.path.exists(meta_path):
            return json.load(open(meta_path))["cycle"]
        return 0

    def __call__(self, spark: SparkSession, obj: TrackingObject) -> DataFrame:
        if not obj.key_columns:
            raise ValueError(f"object '{obj.name}': snapshot diff requires key_columns")
        p = self._paths(obj)
        self._recover(p)
        cycle = self._cycle(p["meta"]) + 1

        # one scan of the live source, persisted; diff reads the persisted
        # copy so batch and baseline cannot diverge
        self.reader_fn(spark, obj).write.mode("overwrite").parquet(p["pending"])
        current = spark.read.parquet(p["pending"])
        tracked = obj.tracked_columns or tuple(
            c for c in current.columns if c not in obj.key_columns
        )

        if os.path.exists(p["snapshot"]):
            prev = spark.read.parquet(p["snapshot"])
            diff = cf.snapshot_diff(
                prev, current, obj.key_columns, tracked, version=cycle
            )
        else:
            # first cycle: everything is an insert
            diff = current.select(
                F.lit("I").alias(cf.OPERATION),
                F.lit(cycle).cast("long").alias(cf.VERSION),
                F.lit(None).cast("array<string>").alias(cf.CHANGED),
                *[F.col(k) for k in obj.key_columns],
                *[F.col(c) for c in tracked],
            )
        self._staged[obj.name] = cycle
        return diff

    def commit(self, obj: TrackingObject) -> None:
        """Promote the pending snapshot — called by the poller after the
        export attempt; without it the next cycle re-emits the batch."""
        cycle = self._staged.pop(obj.name, None)
        if cycle is None:
            return
        p = self._paths(obj)
        if not os.path.exists(p["pending"]):
            return
        if os.path.exists(p["snapshot"]):
            os.rename(p["snapshot"], p["old"])
        os.rename(p["pending"], p["snapshot"])
        if os.path.exists(p["old"]):
            shutil.rmtree(p["old"])
        tmp = p["meta"] + ".tmp"
        os.makedirs(os.path.dirname(p["meta"]), exist_ok=True)
        json.dump({"cycle": cycle}, open(tmp, "w"))
        os.replace(tmp, p["meta"])
