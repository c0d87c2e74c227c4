"""As-of and range joins — time-series operators Spark lacks natively.

- ``asof_join``: for each probe row, the latest build row with
  ``build_time <= probe_time`` per key. Implemented with the scalable
  **union-timeline** pattern: tag both sides, union, sort within key by
  (time, side), and carry the last build attributes forward with a
  running ``last(..., ignorenulls=True)`` window. One shuffle on the
  key, no range-condition join at all — the classic way to beat the
  O(n·m) theta join (DuckDB's native ASOF JOIN serves as the oracle).
- ``range_join``: probe timestamps against build intervals
  [start, end) with **bucketed blocking**: intervals are exploded into
  fixed-width time buckets, probes hash to their bucket, and the exact
  range predicate verifies — an equijoin on (key, bucket) instead of a
  cartesian per key. Bucket width trades replication for candidate
  volume (set it near the median interval length).

Scale notes: both operators are single-shuffle equijoin shapes; AQE
skew handling applies to hot keys. The as-of window is a running
aggregate (no full-partition materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    build_cols: tuple[str, ...],
    how: str = "left",
) -> DataFrame:
    """For each probe row: the build row with the greatest
    ``build_time <= probe_time`` for the same key.

    Ties at identical ``build_time`` per key must be pre-deduplicated by
    the caller (keep one row per (key, time)) so results are total.
    ``how='inner'`` drops probe rows with no preceding build row.
    """
    p = probe.withColumn("__side", F.lit(1)).withColumn(
        "__t", F.col(probe_time)
    )
    b = (
        build.select(
            F.col(key),
            F.col(build_time).alias("__t"),
            *[F.col(c) for c in build_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union
    for c in probe.columns:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast(dict(probe.dtypes)[c]))
    for c in build_cols:
        if c not in p.columns:
            p = p.withColumn(c, F.lit(None).cast(dict(b.dtypes)[c]))
    cols = [key, "__t", "__side", *build_cols] + [
        c for c in probe.columns if c != key
    ]
    u = p.select(*cols).unionByName(b.select(*cols))

    # build rows (side 0) sort before probe rows at equal time → "<=" semantics.
    # Carry the build attributes as ONE struct: the struct itself is
    # non-null exactly for build rows, so last(..., ignorenulls=True)
    # carries the whole latest build row atomically — NULL fields inside
    # it stay NULL (never stitched from an older row), and struct
    # presence is the correct match test for how='inner'.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[c for c in u.columns if c not in build_cols],
        F.last(
            F.when(
                F.col("__side") == 0,
                F.struct(*[F.col(c) for c in build_cols]),
            ),
            ignorenulls=True,
        ).over(w).alias("__b"),
    )
    out = carried.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__b").isNotNull())
    return out.select(
        *[c for c in out.columns if c not in ("__side", "__t", "__b")],
        *[F.col(f"__b.{c}").alias(c) for c in build_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join points to the intervals [start, end) containing them, per key,
    via time-bucket blocking (equijoin on (key, bucket) + exact verify)."""
    bucket = lambda col: F.floor(  # noqa: E731
        F.unix_timestamp(F.col(col)) / bucket_seconds
    )
    pts = points.withColumn("__pb", bucket(point_time))
    ivs = intervals.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                bucket(start_col),
                # end is exclusive, but a partial last bucket still overlaps
                bucket(end_col),
            )
        ),
    )
    joined = pts.join(
        ivs,
        (pts[key] == ivs[key]) & (F.col("__pb") == F.col("__bk")),
    )
    return (
        joined.filter(
            (F.col(point_time) >= F.col(start_col))
            & (F.col(point_time) < F.col(end_col))
        )
        .drop("__pb", "__bk")
        .drop(ivs[key])
    )
