"""Mirror-table sink: the consumer side of the change feed.

The reference relays change batches; every downstream system then MERGEs
them into its own copy of the table (``stored-procedure.md`` positions
the JSON batches as exactly that input). This sink closes the loop
inside the engine: it maintains a queryable parquet mirror of each
tracked table by applying every exported batch with the engine's own
null-vs-mask merge semantics (``operators/changefeed.apply_changes``).

Mechanics:

- **Within-batch compaction** (``compact_changes``): a batch may carry
  several changes for one key (I then U, U then D, D then I...).
  They are collapsed set-wise to at most one *net* change per key —
  window + groupBy on the key, one shuffle, no per-row iteration — so
  the merge join sees unique keys.
- **Atomic generation swap**: each applied batch writes a new
  ``gen-<version>`` snapshot directory, then flips the ``_CURRENT``
  pointer file; readers resolve the pointer, so they never observe a
  half-written snapshot. Old generations are pruned, keeping
  ``keep_generations``.
- At 100 TB the snapshot-rewrite becomes Delta/Iceberg ``MERGE INTO``
  (same compacted-net-change input, storage-side row-level apply); the
  generation-swap form is the dependency-free equivalent with the same
  at-least-once idempotence: re-applying a batch whose generation
  already exists is a no-op.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trignis_spark.operators.changefeed import (
    CHANGED,
    OPERATION,
    VERSION,
    apply_changes,
)
from trignis_spark.sinks.base import ExportContext
from trignis_spark.sinks.generations import GenerationStore
from trignis_spark.sinks.spark_file import DataFrameSink


def _touched(col: str):
    """Did this change row define column ``col``? I defines everything;
    U defines masked columns (NULL mask = full-row update)."""
    return (F.col(OPERATION) == "I") | (
        (F.col(OPERATION) == "U")
        & (
            F.col(CHANGED).isNull()
            | F.array_contains(F.col(CHANGED), col)
        )
    )


def compact_changes(
    changes: DataFrame,
    key_cols: tuple[str, ...],
    tracked_cols: tuple[str, ...],
) -> DataFrame:
    """Collapse a multi-change batch to ≤1 net change row per key.

    Replay semantics in version order, computed set-wise:

    - rows at or before the key's **last delete** are dead history;
    - if nothing lives after the last delete → net ``D``;
    - else net ``I`` if the survivor sequence starts with an insert
      (the row was (re)created inside this batch), else net ``U``;
    - each tracked column takes the value of the **latest row that
      defined it** (``max_by`` over touching rows); the net ``U`` mask
      is the union of touched columns, so downstream null-vs-mask
      semantics are preserved exactly.

    One window + one aggregation, both partitioned by the key — Spark
    plans a single exchange.
    """
    keys = list(key_cols)
    if CHANGED not in changes.columns:
        # mask-less feeds (plain outbox without per-column tracking):
        # NULL mask = full-row update semantics
        changes = changes.withColumn(
            CHANGED, F.lit(None).cast("array<string>")
        )
    w = Window.partitionBy(*keys)
    last_d = F.max(F.when(F.col(OPERATION) == "D", F.col(VERSION))).over(w)
    live = F.col(VERSION) > F.coalesce(F.col("__last_d"), F.lit(-(1 << 62)))

    staged = changes.withColumn("__last_d", last_d).withColumn(
        "__live", live
    )
    aggs = [
        F.max(VERSION).alias(VERSION),
        F.max(F.when(F.col("__live"), 1).otherwise(0)).alias("__any_live"),
        F.max(
            F.when(F.col("__live") & (F.col(OPERATION) == "I"), 1).otherwise(0)
        ).alias("__any_ins"),
    ]
    for c in tracked_cols:
        touch_v = F.when(F.col("__live") & _touched(c), F.col(VERSION))
        aggs.append(F.max_by(F.col(c), touch_v).alias(f"__v_{c}"))
        aggs.append(
            F.max(F.when(touch_v.isNotNull(), 1).otherwise(0)).alias(f"__t_{c}")
        )
    g = staged.groupBy(*keys).agg(*aggs)

    op = (
        F.when(F.col("__any_live") == 0, F.lit("D"))
        .when(F.col("__any_ins") == 1, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    mask = F.when(
        op == "U",
        F.filter(
            F.array(
                *[
                    F.when(F.col(f"__t_{c}") == 1, F.lit(c))
                    for c in tracked_cols
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    return g.select(
        *keys,
        F.col(VERSION),
        op.alias(OPERATION),
        mask.alias(CHANGED),
        *[F.col(f"__v_{c}").alias(c) for c in tracked_cols],
    )


@dataclass
class MirrorTableSink(GenerationStore, DataFrameSink):
    """Maintain a parquet mirror of one tracked table under
    ``path/<object>/gen-<version>`` with a ``_CURRENT`` pointer
    (bookkeeping shared via :class:`GenerationStore`)."""

    name: str
    path: str
    key_cols: tuple[str, ...]
    tracked_cols: tuple[str, ...]
    keep_generations: int = field(default=2)

    def write_df(self, batch: DataFrame, ctx: ExportContext,
                 metadata: dict) -> None:
        spark = batch.sparkSession
        sync = metadata.get("Sync", {})
        version = sync.get("Version", 0)
        if self.replay_of_applied(ctx, version):
            return

        cols = [*self.key_cols, *self.tracked_cols]
        old = self.read_current(spark, ctx)
        if sync.get("Type") == "Full" or old is None:
            # snapshot batches define the whole state
            state = batch.filter(
                F.col(OPERATION).isNull() | (F.col(OPERATION) != "D")
            ).select(*cols)
        else:
            net = compact_changes(batch, self.key_cols, self.tracked_cols)
            state = apply_changes(old, net, self.key_cols, self.tracked_cols)
        self.commit_generation(state, ctx, version)
