"""Persistent near-duplicate corpus index: build once, probe per batch.

``operators.dedup.incremental_pairs`` recomputes corpus shingles and
sizes on every call — right for a one-shot query, wrong for the
production loop where the same 100 TB corpus is probed by every poll
cycle. This module materializes the inverted index once and makes each
cycle a cheap probe:

- **index table** ``<name>`` — (shingle BIGINT, doc_id BIGINT, sz INT),
  bucketed *and sorted* by shingle. Per-doc shingle-set size is
  denormalized onto every row, so a probe never runs a corpus-wide
  size aggregation — the Jaccard denominator ships with the candidate.
- **membership sidecar** ``<name>_docs`` — (doc_id BIGINT, sz INT),
  bucketed by doc_id. Gives O(lookup) idempotence for extends (a
  replayed batch anti-joins to nothing) without scanning the index.

Probe shape at scale: the batch side is one poll cycle (small), so it
broadcasts and the bucketed index is scanned in place — no shuffle of
the corpus, candidate aggregation shuffles only the collision set. If a
batch ever outgrows broadcast, the bucketed-by-shingle layout lets the
same join run as a co-located sort-merge after repartitioning only the
batch to the bucket count.

Extends append with the same bucket spec, so the layout survives
incremental growth; at-least-once upstream delivery is safe because
``extend_index`` drops documents already present before appending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trignis_spark.operators.dedup import shingle_table

DEFAULT_BUCKETS = 16


def _docs_table(table: str) -> str:
    return f"{table}_docs"


def _refresh(spark: SparkSession, table: str) -> None:
    """Invalidate the caller session's cached file listing for both
    index tables. Needed because writes may run on a *different* session
    than later reads — inside ``foreachBatch`` the write goes through the
    micro-batch's cloned session, and without this the probing session
    keeps serving the pre-append file list."""
    spark.catalog.refreshTable(table)
    spark.catalog.refreshTable(_docs_table(table))


def _sized_shingles(docs: DataFrame, n: int) -> DataFrame:
    sh = shingle_table(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    return sh.join(sizes, "doc_id").select("shingle", "doc_id", "sz")


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    table: str,
    n: int = 3,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize the corpus inverted index (overwrites both tables,
    including orphaned locations left by other sessions)."""
    from trignis_spark.maintenance import drop_table_and_location

    drop_table_and_location(spark, table)
    drop_table_and_location(spark, _docs_table(table))
    rows = _sized_shingles(docs, n)
    (
        rows.write.mode("overwrite")
        .bucketBy(n_buckets, "shingle")
        .sortBy("shingle")
        .format("parquet")
        .saveAsTable(table)
    )
    (
        rows.select("doc_id", "sz")
        .distinct()
        .write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .format("parquet")
        .saveAsTable(_docs_table(table))
    )
    _refresh(spark, table)


def probe_index(
    spark: SparkSession,
    table: str,
    batch_docs: DataFrame,
    threshold: float,
    n: int = 3,
) -> DataFrame:
    """Near-dup matches of a batch against the stored corpus:
    (batch_doc, corpus_doc, jaccard) at or above ``threshold``.

    Broadcast batch shingles probe the index map-side; the stored ``sz``
    rides along so the only post-join work is the candidate aggregation
    and the Jaccard arithmetic."""
    bsh = shingle_table(batch_docs, n)
    bsz = bsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("szb"))
    b = F.broadcast(
        bsh.select(F.col("doc_id").alias("batch_doc"), "shingle")
    )
    idx = spark.table(table).select(
        "shingle", F.col("doc_id").alias("corpus_doc"), F.col("sz").alias("szc")
    )
    inter = (
        idx.join(b, "shingle")
        .groupBy("batch_doc", "corpus_doc")
        .agg(F.count(F.lit(1)).alias("isz"), F.max("szc").alias("szc"))
    )
    return (
        inter.join(
            F.broadcast(bsz.withColumnRenamed("doc_id", "batch_doc")),
            "batch_doc",
        )
        .select(
            "batch_doc",
            "corpus_doc",
            (
                F.col("isz").cast("double")
                / (F.col("szb") + F.col("szc") - F.col("isz"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def extend_index(
    spark: SparkSession,
    docs: DataFrame,
    table: str,
    n: int = 3,
    n_buckets: int = DEFAULT_BUCKETS,
) -> int:
    """Append new documents to the index, skipping any doc_id already
    present (idempotent under at-least-once replay). Returns the number
    of documents actually added.

    Appends go through ``saveAsTable`` with the same bucket spec, so
    new files land in the correct buckets and the sorted-bucket layout
    survives incremental growth."""
    known = spark.table(_docs_table(table)).select("doc_id")
    fresh = docs.join(known, "doc_id", "left_anti")
    rows = _sized_shingles(fresh, n).localCheckpoint(eager=True)
    added = rows.select("doc_id").distinct().count()
    if added == 0:
        return 0
    (
        rows.write.mode("append")
        .bucketBy(n_buckets, "shingle")
        .sortBy("shingle")
        .format("parquet")
        .saveAsTable(table)
    )
    (
        rows.select("doc_id", "sz")
        .distinct()
        .write.mode("append")
        .bucketBy(n_buckets, "doc_id")
        .format("parquet")
        .saveAsTable(_docs_table(table))
    )
    _refresh(spark, table)
    return added


def compact_index(
    spark: SparkSession, table: str, n_buckets: int = DEFAULT_BUCKETS
) -> int:
    """Housekeeping for sustained polling: every ``extend_index`` call
    appends a file set per bucket, so a 30 s poll cadence accretes
    thousands of small files per day (the flat-directory twin is
    ``maintenance.ParquetCompactor``). Rewrites both tables to ~one
    file per bucket via catalog-swap; probe results are unchanged by
    construction (same rows, same bucket spec — asserted under load in
    tests/test_soak.py). Run between poll cycles; appends must be
    quiesced during the swap. Returns the post-compaction file count."""
    from trignis_spark.maintenance import compact_bucketed_table

    n = compact_bucketed_table(
        spark, table, "shingle", n_buckets, sort_col="shingle"
    )
    n += compact_bucketed_table(spark, _docs_table(table), "doc_id", n_buckets)
    _refresh(spark, table)
    return n
