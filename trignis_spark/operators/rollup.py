"""Hypertable-style time rollups: hierarchical continuous aggregates.

The timeseries-database pattern (continuous aggregates / materialized
rollups): aggregate raw events to the finest resolution once, then
compute every coarser resolution *from the next finer rollup* instead
of re-scanning raw data. For decomposable aggregates (count, sum, min,
max) this is exact, and at 100 TB it is the difference between one raw
scan per resolution and one raw scan total — the hour→day→month
cascade works on data that is orders of magnitude smaller than the
events table.

``cascade`` returns the whole resolution ladder as DataFrames; persist
each level (partitioned by its bucket) to serve dashboards without
touching raw data. Average/other non-decomposable metrics: carry
(sum, count) pairs through the cascade and divide at read time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: supported bucket resolutions, finest → coarsest
RESOLUTIONS = ("minute", "hour", "day", "month")


def bucket(df: DataFrame, ts_col: str, resolution: str) -> DataFrame:
    if resolution not in RESOLUTIONS:
        raise ValueError(f"resolution must be one of {RESOLUTIONS}")
    return df.withColumn("bucket", F.date_trunc(resolution, F.col(ts_col)))


def rollup_level(
    df: DataFrame,
    ts_col: str,
    resolution: str,
    dims: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Aggregate raw rows to one resolution: count + exact decimal sum."""
    return (
        bucket(df, ts_col, resolution)
        .groupBy("bucket", *dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(20,6)")).alias("val_sum"),
        )
    )


def coarsen(finer: DataFrame, resolution: str, dims: Sequence[str]) -> DataFrame:
    """One cascade step: re-bucket a finer rollup and merge its partial
    aggregates — no raw data touched."""
    return (
        finer.withColumn("bucket", F.date_trunc(resolution, F.col("bucket")))
        .groupBy("bucket", *dims)
        .agg(F.sum("n").alias("n"), F.sum("val_sum").alias("val_sum"))
    )


def cascade(
    df: DataFrame,
    ts_col: str,
    dims: Sequence[str],
    value_col: str,
    resolutions: Sequence[str] = ("hour", "day"),
) -> dict[str, DataFrame]:
    """Build the full rollup ladder: raw → resolutions[0] → … → last.

    Exactness: sums/counts are decomposable, so every level equals the
    direct aggregation of raw data at that resolution (property-checked
    in tests and against the SQL oracle).
    """
    order = [r for r in RESOLUTIONS if r in resolutions]
    if order != list(resolutions):
        raise ValueError(f"resolutions must be finest→coarsest from {RESOLUTIONS}")
    out: dict[str, DataFrame] = {}
    current = rollup_level(df, ts_col, resolutions[0], dims, value_col)
    out[resolutions[0]] = current
    for res in resolutions[1:]:
        current = coarsen(current, res, dims)
        out[res] = current
    return out


#: stable accumulator type carried across incremental merges — wide
#: enough for 100 TB-scale sums (24 integer digits), and fixed so the
#: stored rollup schema does not drift as Spark widens sum() precision
_SUM_T = "decimal(30,6)"


def normalize_level(level: DataFrame) -> DataFrame:
    """Pin a rollup level to the stable stored schema."""
    return level.withColumn("val_sum", F.col("val_sum").cast(_SUM_T))


def merge_rollup(
    current: DataFrame, delta: DataFrame, dims: Sequence[str]
) -> DataFrame:
    """Exact merge of two same-resolution rollups: decomposable partial
    aggregates re-aggregate, so ``merge(rollup(A), rollup(B)) ==
    rollup(A ∪ B)`` (property-checked in tests).

    The shuffle key is (bucket, dims) over *rollup* rows — cardinality
    bounded by buckets × dimension values, orders of magnitude below the
    raw stream. Only touched buckets change, but re-writing untouched
    ones costs one bounded scan, not a raw-data scan."""
    u = normalize_level(current).unionByName(normalize_level(delta))
    return (
        u.groupBy("bucket", *dims)
        .agg(
            F.sum("n").alias("n"),
            F.sum("val_sum").cast(_SUM_T).alias("val_sum"),
        )
    )
