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
    direction: str = "backward",
) -> DataFrame:
    """Per probe row, the matching build row for the same key:

    - ``backward`` (default): greatest ``build_time <= probe_time``;
    - ``forward``: smallest ``build_time >= probe_time``;
    - ``nearest``: whichever of the two is closer in time, ties to the
      backward match (pandas ``merge_asof`` semantics).

    Ties at identical ``build_time`` per key must be pre-deduplicated by
    the caller (keep one row per (key, time)) so results are total.
    ``how='inner'`` drops probe rows with no match.

    All directions share one key shuffle; ``nearest`` adds a second sort
    (not exchange) for the forward-looking window frame.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
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

    # Carry the build attributes as ONE struct (plus the build time for
    # the nearest tie-break): the struct is non-null exactly for build
    # rows, so last/first(..., ignorenulls=True) carries the whole
    # matched build row atomically — NULL fields inside it stay NULL
    # (never stitched from another row), and struct presence is the
    # correct match test for how='inner'.
    bstruct = F.when(
        F.col("__side") == 0,
        F.struct(F.col("__t").alias("__bt"),
                 *[F.col(c) for c in build_cols]),
    )
    # backward: build rows (side 0) sort before probes at equal time,
    # so "<=" includes the equal-time build in the preceding frame
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: probes sort before builds at equal time, so ">=" includes
    # the equal-time build in the following frame
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.desc("__side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.select(
        *[c for c in u.columns if c not in build_cols],
        F.last(bstruct, ignorenulls=True).over(wb).alias("__bwd"),
        F.first(bstruct, ignorenulls=True).over(wf).alias("__fwd"),
    )
    if direction == "backward":
        chosen = F.col("__bwd")
    elif direction == "forward":
        chosen = F.col("__fwd")
    else:
        from pyspark.sql.types import (
            DateType,
            TimestampNTZType,
            TimestampType,
        )

        t_type = u.schema["__t"].dataType
        if isinstance(t_type, (TimestampType, TimestampNTZType)):
            back_gap = F.expr("timestampdiff(MICROSECOND, __bwd.__bt, __t)")
            fwd_gap = F.expr("timestampdiff(MICROSECOND, __t, __fwd.__bt)")
        elif isinstance(t_type, DateType):
            # dates cannot cast to double; day-granularity gap instead
            back_gap = F.datediff(F.col("__t"), F.col("__bwd.__bt"))
            fwd_gap = F.datediff(F.col("__fwd.__bt"), F.col("__t"))
        else:
            back_gap = F.col("__t").cast("double") - F.col(
                "__bwd.__bt"
            ).cast("double")
            fwd_gap = F.col("__fwd.__bt").cast("double") - F.col(
                "__t"
            ).cast("double")
        chosen = (
            F.when(F.col("__bwd").isNull(), F.col("__fwd"))
            .when(F.col("__fwd").isNull(), F.col("__bwd"))
            .when(back_gap <= fwd_gap, F.col("__bwd"))
            .otherwise(F.col("__fwd"))
        )
    out = carried.withColumn("__b", chosen).filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__b").isNotNull())
    return out.select(
        *[
            c
            for c in out.columns
            if c not in ("__side", "__t", "__b", "__bwd", "__fwd")
        ],
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
