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
the corpus, candidate aggregation shuffles only the collision set. A
batch whose shingle rows outgrow broadcast (``MAX_BROADCAST_SHINGLES``,
e.g. a Full initial resync) automatically takes the co-located
sort-merge path in
``probe_prefix_index``: only the batch repartitions to the bucket
count; the corpus is still never shuffled.

Extends append with the same bucket spec, so the layout survives
incremental growth; at-least-once upstream delivery is safe because
``extend_index`` drops documents already present before appending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trignis_spark.operators.dedup import shingle_table
from trignis_spark.plans.bucketing import batch_anti_join

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


#: per-(warehouse, table) cache of the v2 meta row (threshold, n,
#: n_parts) — immutable after build (extends never rewrite it), yet
#: every probe re-collected it: one driver action per poll cycle on
#: the text gate's hot path (the same fixed overhead VERDICT r8 #1
#: flagged on the IVF-PQ probes; see ``ivfpq_index._STATE_CACHE``).
#: Build and attach — the only meta writers/registrars — drop entries.
_META_CACHE: dict = {}


def _meta_row(spark: SparkSession, table: str):
    key = (spark.conf.get("spark.sql.warehouse.dir", ""), table)
    row = _META_CACHE.get(key)
    if row is None:
        _META_CACHE[key] = row = spark.table(_meta_table(table)).collect()[0]
    return row


def _drop_meta_cache(spark: SparkSession, table: str) -> None:
    _META_CACHE.pop(
        (spark.conf.get("spark.sql.warehouse.dir", ""), table), None
    )


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
        # count DISTINCT shingles, not rows: a crash between the index
        # append and the _docs-sidecar append makes the next at-least-
        # once replay re-append the same rows, and duplicate
        # (doc_id, shingle) rows would double-count the intersection
        # (inflating jaccard past 1.0) — distinct makes replayed
        # appends harmless (ADVICE r5)
        .groupBy("batch_doc", "corpus_doc")
        .agg(F.countDistinct("shingle").alias("isz"),
             F.max("szc").alias("szc"))
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
    fresh = batch_anti_join(docs, known, "doc_id")
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


# --------------------------------------------------------------------------
# Prefix-pruned index (v2): hot-shingle-proof probes
# --------------------------------------------------------------------------
#
# ``probe_index`` joins the batch against the *full* inverted index, so
# a stop-shingle ("the quick brown" appearing in 10% of the corpus)
# makes every probe pay that shingle's full posting list. The v2 layout
# splits the two jobs the full index was doing:
#
# - ``<name>`` (probe table): only each corpus doc's
#   floor((1-t)·|d|)+1 *rarest* shingles (rarest-first under the
#   build-time df order), bucketed+sorted by shingle. Corpus-side-only
#   prefix pruning is lossless for J ≥ t by a per-document pigeonhole:
#   a qualifying pair shares ≥ ceil(t·|C|) shingles, and the stored
#   prefix's complement holds only ceil(t·|C|)-1 of C's shingles, so at
#   least one shared shingle is always stored. Crucially the argument
#   never compares orders across documents — any per-doc choice of that
#   many shingles works — so extends may rank against their *own* df
#   snapshot; df ordering is a performance heuristic (short posting
#   lists), not a correctness requirement, and staleness cannot lose
#   pairs.
# - ``<name>_full`` (verify table): every (doc_id, shingle, sz) row,
#   *partitioned* by ``pb = pmod(hash(doc_id), P)`` so the verification
#   join's broadcast candidate set triggers dynamic partition pruning —
#   verify I/O is proportional to the candidate docs' partitions, not
#   the corpus.
# - ``<name>_docs`` membership sidecar as in v1.
# - ``<name>_meta``: (threshold, n, n_parts) — probes below the build
#   threshold are rejected (the stored prefix would be too short).

VERIFY_PARTS = 64


def _full_table(table: str) -> str:
    return f"{table}_full"


def _meta_table(table: str) -> str:
    return f"{table}_meta"


def _pb(col: str = "doc_id", parts: int = VERIFY_PARTS) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(parts)).cast("int")


def _doc_shingles(docs: DataFrame, n: int,
                  n_parts: int = VERIFY_PARTS) -> DataFrame:
    """(doc_id, shs ARRAY<BIGINT> sorted, sz, pb) — the verify table's
    DOC-LEVEL layout (round 10). The row-level layout scanned one row
    per (doc, shingle): at the 5 M-doc decade leg that was a 260 M-row
    scan through two joins and a countDistinct aggregation per probe
    (~16 s of the 29 s probe — the decade leg's saturation point),
    because a realistic candidate set (~3 500 docs) hashes across all
    64 ``pb`` partitions and DPP prunes nothing. One array row per doc
    is 52× fewer rows, intersections compute INSIDE a projection
    (``array_intersect`` against the broadcast batch arrays — no
    explode, no aggregation shuffle), and the only corpus-sized work
    left is the narrow doc-row scan.

    Built entirely MAP-SIDE: the per-doc shingle hashes are already an
    array before ``shingle_table`` explodes them, so sorting the
    distinct array in place produces the identical row with zero
    shuffles — an explode→groupBy form would re-gather the corpus's
    shingle rows through a full exchange just to undo the explode
    (750 M rows at the 5 M-doc decade leg). Side effect (an
    improvement): docs with fewer than ``n`` tokens now appear with
    ``shs = []`` instead of vanishing in the explode, so the docs
    sidecar records them and extends stop re-adding them every cycle;
    they carry no shingles, so probe results are untouched."""
    from trignis_spark.functions import portable as pf

    toks = docs.select(
        "doc_id", F.expr(pf.tokens(pf.SPARK, "text")).alias("tokens")
    )
    th = toks.select(
        "doc_id",
        F.expr(pf.token_hashes(pf.SPARK, "tokens")).alias("th"),
    )
    return (
        th.select(
            "doc_id",
            F.array_sort(
                F.array_distinct(
                    F.expr(pf.shingle_hashes(pf.SPARK, "th", n))
                )
            ).alias("shs"),
        )
        .withColumn("sz", F.size("shs").cast("long"))
        .withColumn("pb", _pb(parts=n_parts))
    )


def _prefix_rows(docs: DataFrame, n: int, threshold: float) -> DataFrame:
    """(shingle, doc_id, sz) for each doc's rarest floor((1-t)sz)+1
    shingles under this batch's df order."""
    from pyspark.sql import Window

    sh = shingle_table(docs, n)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn(
            "_rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("_df", "shingle")
            ),
        )
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    return ranked.filter(
        # +1e-6 before floor: float (1-t)·sz can land one ulp under an
        # exact integer and silently shorten the prefix by one (loses
        # boundary pairs — see dedup.jaccard_pairs); longer is safe
        F.col("_rnk")
        <= F.floor(F.lit(1.0 - threshold) * F.col("sz") + F.lit(1e-6)) + 1
    ).select("shingle", "doc_id", "sz")


def build_prefix_index(
    spark: SparkSession,
    docs: DataFrame,
    table: str,
    threshold: float,
    n: int = 3,
    n_buckets: int = DEFAULT_BUCKETS,
    n_parts: int = VERIFY_PARTS,
) -> None:
    """Materialize the prefix-pruned probe table, the partitioned
    verify table, the membership sidecar and the meta row."""
    from trignis_spark.maintenance import drop_table_and_location

    for t in (table, _full_table(table), _docs_table(table),
              _meta_table(table)):
        drop_table_and_location(spark, t)
    (
        _prefix_rows(docs, n, threshold)
        .write.mode("overwrite")
        .bucketBy(n_buckets, "shingle")
        .sortBy("shingle")
        .format("parquet")
        .saveAsTable(table)
    )
    full = _doc_shingles(docs, n, n_parts)
    (
        full.repartition("pb")
        .write.mode("overwrite")
        .partitionBy("pb")
        .format("parquet")
        .saveAsTable(_full_table(table))
    )
    (
        full.select("doc_id", "sz")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .format("parquet")
        .saveAsTable(_docs_table(table))
    )
    spark.createDataFrame(
        [(float(threshold), n, n_parts)],
        "threshold double, n int, n_parts int",
    ).write.mode("overwrite").format("parquet").saveAsTable(
        _meta_table(table)
    )
    _drop_meta_cache(spark, table)
    for t in (table, _full_table(table), _docs_table(table),
              _meta_table(table)):
        spark.catalog.refreshTable(t)


#: probes whose batch SHINGLE set exceeds this row count take the
#: co-located sort-merge path instead of broadcasting the batch. The
#: broadcast payload is the batch's shingle rows — which scale with
#: total batch text length, not document count (ADVICE r6: a batch of
#: few but very long documents blows a per-document gate) — so the
#: gate counts what it actually ships: ~10 M (doc_id, shingle-hash)
#: rows ≈ a few hundred MB hashed relation. A poll-cycle batch is a
#: few hundred docs × a few hundred shingles; only a Full initial
#: resync routed through ``probe`` approaches this.
MAX_BROADCAST_SHINGLES = 10_000_000


def _bucket_count(spark: SparkSession, table: str) -> int:
    """Bucket count from the catalog (the v2 meta row predates the
    sort-merge path and does not carry it)."""
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if (row["col_name"] or "").strip() == "Num Buckets":
            return int(row["data_type"].strip())
    return DEFAULT_BUCKETS


def attach_prefix_index(spark: SparkSession, table: str,
                        n_buckets: int = DEFAULT_BUCKETS) -> None:
    """Re-register a persisted prefix index's four tables in a fresh
    session's catalog (see ``ivfpq_index.attach_ivfpq_index`` — same
    in-memory-catalog restart story). The shingle and docs tables
    re-declare their bucket specs so bucketed extends still append;
    the v2 meta row predates the bucket count (see ``_bucket_count``),
    so an index built with a non-default count must pass it."""
    from trignis_spark.maintenance import attach_table

    attach_table(spark, table, bucket_cols=["shingle"],
                 n_buckets=n_buckets, sort_cols=["shingle"])
    attach_table(spark, _full_table(table))
    attach_table(spark, _docs_table(table), bucket_cols=["doc_id"],
                 n_buckets=n_buckets)
    attach_table(spark, _meta_table(table))
    _drop_meta_cache(spark, table)


def probe_prefix_index(
    spark: SparkSession,
    table: str,
    batch_docs: DataFrame,
    threshold: float,
    broadcast_batch: bool | None = None,
) -> DataFrame:
    """Near-dup matches of a batch against the prefix index:
    (batch_doc, corpus_doc, jaccard ≥ threshold) — identical results to
    ``probe_index`` at any threshold ≥ the build threshold (asserted).

    Phase 1 (candidates): broadcast batch shingles ⋈ the pruned probe
    table — hot shingles are absent from the index by construction, so
    candidate volume tracks rare-shingle collisions only. Phase 2
    (verify): broadcast candidates (carrying the batch docs' shingle
    ARRAYS) ⋈ the doc-array verify table — one narrow row per corpus
    doc, the exact intersection computed by ``array_intersect`` inside
    the projection (round 10; see ``_doc_shingles`` — the row-level
    layout re-scanned 52× the rows and paid a countDistinct shuffle
    per probe, the 5 M-doc decade leg's saturation point). The
    partition key derived from candidate doc ids still enables dynamic
    partition pruning when the candidate set is small. Both phases are
    map-side on the corpus; pre-round-10 persisted indexes keep their
    row-level verify (dispatched on the stored schema).

    **Broadcast-overflow fallback** (VERDICT r5 #3): a batch that
    outgrows broadcast (a Full initial resync routed through ``probe``
    would hit the executor broadcast ceiling) takes the co-located
    sort-merge path instead — the batch shingles repartition to the
    probe table's bucket count so the bucketed corpus side is *still*
    never shuffled, and the verify/size joins run as plain shuffle
    joins (corpus-sized work is inherent when the batch is
    corpus-sized). ``broadcast_batch=None`` decides from the batch's
    SHINGLE-row count (> ``MAX_BROADCAST_SHINGLES`` ⇒ sort-merge) —
    the payload actually broadcast, so a batch of few but very long
    documents is gated correctly (ADVICE r6); results are identical on
    either path (asserted in tests)."""
    meta = _meta_row(spark, table)
    if threshold < meta.threshold - 1e-12:
        raise ValueError(
            f"index {table!r} was built for threshold >= {meta.threshold}; "
            f"probing at {threshold} would lose pairs (rebuild the index)"
        )
    n = meta.n
    bsh = shingle_table(batch_docs, n).select(
        F.col("doc_id").alias("batch_doc"), "shingle"
    )
    if broadcast_batch is None:
        from trignis_spark.operators.similarity import exceeds

        # limit-bounded probe, not a full count: this gate runs on
        # every poll-cycle probe and the batch plan can be expensive
        broadcast_batch = not exceeds(bsh, MAX_BROADCAST_SHINGLES)

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_batch else df
    if not broadcast_batch:
        # align the batch with the bucketed probe table's layout so the
        # candidate join sort-merges without shuffling the corpus side
        bsh = bsh.repartition(_bucket_count(spark, table), "shingle")
    bsz = bsh.groupBy("batch_doc").agg(F.count(F.lit(1)).alias("szb"))
    cand = (
        spark.table(table)
        .join(_b(bsh), "shingle")
        .select("batch_doc", F.col("doc_id").alias("corpus_doc"))
        .distinct()
        # NOTE: deliberately not checkpointed — the candidate plan
        # feeds exactly one broadcast, and leaving it as a plan (with
        # its selective joins visible) lets dynamic partition pruning
        # consider the verify-table scan
    )
    full = spark.table(_full_table(table))
    cand_pb = cand.withColumn(
        "pb", _pb("corpus_doc", meta.n_parts)
    )
    if "shs" in full.columns:
        # doc-array layout (round 10 — see ``_doc_shingles``): the
        # batch's shingle ARRAYS ride the broadcast candidate rows, so
        # the verify is ONE narrow doc-row scan joined to the
        # candidates with the intersection computed inside the
        # projection — no per-shingle explode, no aggregation
        barr = bsh.groupBy("batch_doc").agg(
            F.array_sort(F.collect_list("shingle")).alias("bshs"),
            F.count(F.lit(1)).alias("szb"),
        )
        pairs = (
            full.join(
                _b(cand_pb.join(barr, "batch_doc")),
                (full.doc_id == cand_pb.corpus_doc)
                & (full.pb == cand_pb.pb),
            )
            .select(
                "batch_doc",
                "corpus_doc",
                F.size(F.array_intersect("shs", "bshs")).alias("isz"),
                F.col("sz").alias("szc"),
                "szb",
            )
            # replayed crash-window extends can duplicate whole doc
            # rows; dedup AFTER the projection so the guard shuffle
            # carries scalars, not shingle arrays (duplicate rows hold
            # identical arrays ⇒ identical isz — which survives is
            # immaterial; same pattern as ivfpq_probe's guard)
            .dropDuplicates(["batch_doc", "corpus_doc"])
        )
        return pairs.select(
            "batch_doc",
            "corpus_doc",
            (
                F.col("isz").cast("double")
                / (F.col("szb") + F.col("szc") - F.col("isz"))
            ).alias("jaccard"),
        ).filter(F.col("jaccard") >= threshold)
    # legacy row-level verify table (pre-round-10 persisted indexes)
    inter = (
        full.join(
            _b(cand_pb),
            (full.doc_id == cand_pb.corpus_doc)
            & (full.pb == cand_pb.pb),
        )
        .join(_b(bsh), ["batch_doc", "shingle"])
        # countDistinct: verify-table rows duplicated by a replayed
        # crash-window extend must not double-count isz (ADVICE r5; see
        # probe_index)
        .groupBy("batch_doc", "corpus_doc")
        .agg(F.countDistinct("shingle").alias("isz"),
             F.max("sz").alias("szc"))
    )
    return (
        inter.join(_b(bsz), "batch_doc")
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


def extend_prefix_index(
    spark: SparkSession,
    docs: DataFrame,
    table: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> int:
    """Append new documents (idempotent under replay). Prefix rows for
    the new docs rank against the *new batch's own* df snapshot — safe
    because corpus-side prefix pruning is lossless under any per-doc
    shingle choice of the required length (see module notes); the df
    order only tunes posting-list length."""
    meta = _meta_row(spark, table)
    known = spark.table(_docs_table(table)).select("doc_id")
    fresh = batch_anti_join(docs, known, "doc_id").localCheckpoint(
        eager=True
    )
    added = fresh.count()
    if added == 0:
        return 0
    (
        _prefix_rows(fresh, meta.n, meta.threshold)
        .write.mode("append")
        .bucketBy(n_buckets, "shingle")
        .sortBy("shingle")
        .format("parquet")
        .saveAsTable(table)
    )
    # follow the stored verify layout: doc-array (round 10) or legacy
    # row-level — an append must never mix schemas in one table
    if "shs" in spark.table(_full_table(table)).columns:
        full = _doc_shingles(fresh, meta.n, meta.n_parts)
        sizes = full.select("doc_id", "sz")
    else:
        full = _sized_shingles(fresh, meta.n).withColumn(
            "pb", _pb(parts=meta.n_parts)
        )
        sizes = full.select("doc_id", "sz").distinct()
    (
        full.repartition("pb")
        .write.mode("append")
        .partitionBy("pb")
        .format("parquet")
        .saveAsTable(_full_table(table))
    )
    (
        sizes
        .write.mode("append")
        .bucketBy(n_buckets, "doc_id")
        .format("parquet")
        .saveAsTable(_docs_table(table))
    )
    for t in (table, _full_table(table), _docs_table(table)):
        spark.catalog.refreshTable(t)
    return added


# --------------------------------------------------------------------------
# Layout-agnostic dispatch (v1 full index or v2 prefix index)
# --------------------------------------------------------------------------


def is_prefix_index(spark: SparkSession, table: str) -> bool:
    """v2 indexes are recognized by their meta table."""
    return spark.catalog.tableExists(_meta_table(table))


def probe(
    spark: SparkSession,
    table: str,
    batch_docs: DataFrame,
    threshold: float,
    n: int = 3,
    broadcast_batch: bool | None = None,
) -> DataFrame:
    """Probe whichever index layout ``table`` holds — identical results
    either way (v2's shingle width comes from its meta row; ``n`` is
    only used for v1; ``broadcast_batch`` — v2's oversize-batch
    fallback dial — only for v2)."""
    if is_prefix_index(spark, table):
        return probe_prefix_index(
            spark, table, batch_docs, threshold, broadcast_batch
        )
    return probe_index(spark, table, batch_docs, threshold, n)


def extend(
    spark: SparkSession,
    docs: DataFrame,
    table: str,
    n: int = 3,
    n_buckets: int = DEFAULT_BUCKETS,
) -> int:
    """Extend whichever index layout ``table`` holds (idempotent)."""
    if is_prefix_index(spark, table):
        return extend_prefix_index(spark, docs, table, n_buckets)
    return extend_index(spark, docs, table, n, n_buckets)


def compact_prefix_index(
    spark: SparkSession, table: str, n_buckets: int = DEFAULT_BUCKETS
) -> int:
    """Housekeeping for the v2 layout under sustained polling: every
    ``extend_prefix_index`` appends a file set to the bucketed probe
    table, the partitioned verify table, and the docs sidecar. Rewrites
    all three to ~one file per bucket/partition via the maintenance
    catalog-swap helpers; probe results are unchanged by construction
    (same rows, same specs — asserted in tests). Appends must be
    quiesced during the swap. Returns the post-compaction file count."""
    from trignis_spark.maintenance import (
        compact_bucketed_table,
        compact_partitioned_table,
    )

    n = compact_bucketed_table(
        spark, table, "shingle", n_buckets, sort_col="shingle"
    )
    n += compact_partitioned_table(spark, _full_table(table), "pb")
    n += compact_bucketed_table(spark, _docs_table(table), "doc_id", n_buckets)
    for t in (table, _full_table(table), _docs_table(table)):
        spark.catalog.refreshTable(t)
    return n
