"""Skew mitigation: salted aggregation and salted broadcast-side joins.

At 100 TB a hot key (one user generating 1% of all events, one
stop-shingle) turns a clean equijoin/groupBy into a straggler. AQE's
skew-join handling covers sort-merge joins; these helpers cover the two
remaining cases:

- ``salted_count``: two-phase aggregation — explode each key into
  ``n_salts`` partial groups, aggregate, then merge. The partial stage
  spreads a hot key across n_salts reducers.
- ``salted_join``: replicate the *small* side n_salts× and salt the big
  side's key, so one hot key lands on n_salts different reducers.

Both are algebraic rewrites of the unsalted plan — same results, more
balanced shuffle. Compose with monotonically higher n_salts as skew
grows; salting is a no-op semantically (verified by equivalence tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic pseudo-random salt per row (hash of all columns),
    uniform in [0, n_salts)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_count(
    df: DataFrame, keys: Sequence[str], n_salts: int = 16,
    count_alias: str = "n",
) -> DataFrame:
    """groupBy(keys).count() as a two-phase salted aggregation."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(count_alias))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equijoin with the big side salted and the small side replicated
    n_salts× — a hot join key fans out over n_salts reducers instead of
    one. Result is identical to ``big.join(small, on, how)`` for inner
    and left joins. Right/full outer are rejected: an unmatched
    small-side key would survive once per salt replica (n_salts
    null-padded rows instead of one)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "replicated small-side rows would duplicate unmatched keys "
            "under right/full outer semantics"
        )
    big_s = with_salt(big, n_salts)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    joined = big_s.join(small_s, [*on, "__salt"], how)
    return joined.drop("__salt")


def chunked_running_sum(
    df: DataFrame,
    part_keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    chunk_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Running sum over ``(part_keys) ORDER BY (order_cols)`` computed as
    a two-level prefix sum partitioned by ``(part_keys, chunk_col)`` —
    identical values to the single window, but a hot partition key's rows
    spread over its chunks instead of funneling through one task.

    Contract: ``chunk_col`` must be monotone non-decreasing along
    ``order_cols`` within each partition (e.g. the leading bits of the
    leading order column), so chunks are contiguous runs of the global
    order. The stitch aggregates one row per (partition, chunk) and
    windows those — O(chunks) per key, never O(rows)."""
    wl = (
        Window.partitionBy(*part_keys, chunk_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("_local_cum", F.sum(value_col).over(wl))
    totals = local.groupBy(*part_keys, chunk_col).agg(
        F.sum(value_col).alias("_chunk_sum")
    )
    ws = (
        Window.partitionBy(*part_keys)
        .orderBy(chunk_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = totals.withColumn(
        "_base", F.coalesce(F.sum("_chunk_sum").over(ws), F.lit(0))
    ).select(*part_keys, chunk_col, "_base")
    return (
        local.join(base, [*part_keys, chunk_col])
        .withColumn(out_col, F.col("_base") + F.col("_local_cum"))
        .drop("_local_cum", "_base")
    )


def top_keys(df: DataFrame, keys: Sequence[str], k: int = 20) -> DataFrame:
    """Skew diagnosis: the k heaviest keys and their share of all rows."""
    total = df.count()
    share: Column = (F.col("n") / F.lit(total)).alias("share")
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), *keys)
        .limit(k)
        .select(*keys, "n", share)
    )
