"""Bucketed-table helpers: shuffle-free co-located joins.

The snapshot-diff change feed joins two snapshots of the same table on
its PK every cycle (SURVEY §7.2 step 3); at 100 TB that repeated
sort-merge shuffle dominates the cycle. Bucketing both snapshots on the
key (same bucket count) makes the join co-located: Spark reads matching
buckets pairwise and the Exchange disappears from the plan —
``tests/test_bucketing.py`` asserts exactly that.

Buckets also pre-shape downstream groupBys on the same key. Rule of
thumb: bucket count ≈ cluster cores × small multiple, fixed per table
family so all writers agree.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: Sequence[str], how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key; with matching
    bucket specs Spark plans a zero-shuffle sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
