"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

The four standard near-duplicate detectors for large-scale training-data
pipelines, each expressed as a shuffle-conscious DataFrame plan:

- **exact**: content-hash groupBy — one shuffle on the hash.
- **ngram_jaccard**: inverted-index candidate join on shared shingles
  (never an all-pairs cross join), then exact set-overlap verification.
- **minhash_lsh**: k permutation min-hashes per doc → banded bucket keys
  → candidates share a bucket → verified with true Jaccard. The classic
  shingle→minhash→band→bucket-join pipeline; candidate volume is
  O(collisions), not O(n²).
- **simhash**: 32-bit weighted-feature hash; near-dup pairs found by
  **lossless band blocking** — 8 disjoint 4-bit bands; by pigeonhole any
  pair within Hamming distance ≤ 7 shares ≥ 1 identical band, so
  blocking + verify returns exactly the same pairs as a cross join
  while scaling like an equijoin.

Hashing uses the portable rolling hash so the DuckDB oracle replays
results exactly (see ``trignis_spark.functions.portable``); pass
``portable=False`` to swap in ``xxhash64`` for production throughput.

Scale notes (100 TB): all candidate generation is equijoin-shaped on
hash/bucket keys, so AQE handles skew (a hot shingle = a hot key —
bound it with the ``max_df`` document-frequency cap, the standard
stop-shingle trick). Verification joins run on the candidate set only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trignis_spark.functions import portable as pf

#: scan-partition floor above which the one-shot pair operators
#: materialize their shingle table before the multi-reference pipeline
#: (round 11). Their plans reference the shingle rows up to SEVEN
#: times (df ranking, per-doc window, candidate join sides, verify
#: sides, sizes), each re-running the corpus tokenize/hash/shingle HOF
#: pipeline — at corpus scale one materialization + six cheap reads
#: beats seven interpreted passes, but on a fixture-sized corpus
#: (single scan partition) the eager barrier costs more than the
#: recomputation (measured: 2.3 s vs 1.8 s at sf0.1). Partition count
#: is a data-volume proxy (~128 MB of text per partition), not a
#: core-count constant, so the gate scales with the input.
SHINGLE_CHECKPOINT_MIN_PARTS = 4


def _materialize_if_big(shingles: DataFrame) -> DataFrame:
    try:
        # an input that is already a materialized scan (a caller-held
        # localCheckpoint, or a driver-literal frame) gains nothing
        # from a second checkpoint job — re-checkpointing it paid a
        # redundant full materialization (ADVICE r11)
        root = shingles._jdf.queryExecution().analyzed()
        if root.getClass().getSimpleName() in (
            "LogicalRDD", "LocalRelation"
        ):
            return shingles
        parts = shingles.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans; stay lazy
        parts = 1
    if parts >= SHINGLE_CHECKPOINT_MIN_PARTS:
        return shingles.localCheckpoint(eager=True)
    return shingles


def shingle_table(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingle *hashes* per document:
    (doc_id, shingle BIGINT).

    Tokens are hashed once and combined arithmetically per shingle
    (``portable.token_hashes``/``shingle_hashes``) — no shingle string
    is ever materialized, and every downstream join/group runs on 8-byte
    integer keys instead of strings (cheaper hashing + smaller shuffles
    at scale)."""
    toks = docs.select(
        "doc_id", F.expr(pf.tokens(pf.SPARK, text_col)).alias("tokens")
    )
    th = toks.select(
        "doc_id", F.expr(pf.token_hashes(pf.SPARK, "tokens")).alias("th")
    )
    return th.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr(pf.shingle_hashes(pf.SPARK, "th", n)))
        ).alias("shingle"),
    )


def exact_duplicates(docs: DataFrame, portable: bool = True) -> DataFrame:
    """Exact dedup by normalized content hash: one row per distinct
    content with its canonical (lowest) doc_id and multiplicity."""
    norm = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
    h = pf.sha256_hex(pf.SPARK, norm) if portable else f"xxhash64({norm})"
    return (
        docs.select("doc_id", F.expr(h).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("copies"),
        )
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float,
    max_df: int | None = None,
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index blocking.

    Corpus-sized shingle inputs (≥ ``SHINGLE_CHECKPOINT_MIN_PARTS``
    scan partitions) are materialized eagerly at *DataFrame-build*
    time — constructing the result frame runs one localCheckpoint job
    before any action on it (already-materialized inputs are passed
    through untouched).

    Candidate generation uses **prefix filtering** (Chaudhuri et al.
    SSJoin / Bayardo et al. All-Pairs): shingles get a global canonical
    order (document frequency ascending, rarest first), and only each
    document's first ``floor((1-t)·|d|) + 1`` shingles are indexed. By
    the prefix-filter lemma any pair with Jaccard ≥ t must share an
    indexed shingle, so this is **lossless** — identical output to the
    naive full inverted index — while the index shrinks ~5× at t=0.8
    and, decisively, high-df stop-shingles fall out of candidate
    generation on their own (a shingle is only indexed where it is
    among a doc's rarest). The naive full-index form
    (``prefix_filter=False``) is quadratic in the hottest shingle's df:
    at 500 k docs it spilled >70 GB and died; the prefix form runs the
    same corpus in ~2 min (sf10 scale point, BASELINE.md).

    A symmetric length filter (``t·|d2| ≤ |d1| ≤ |d2|/t``, implied by
    J ≥ t) prunes candidates before the distinct.

    ``max_df`` additionally drops shingles appearing in more than that
    many docs (stop-shingles) from candidate generation only. Combined
    with prefix filtering it stays exactly as lossy as ``max_df`` alone
    (pairs sharing only stop-shingles are lost, nothing else): the
    prefix length and the symmetric length filter are computed from the
    *unfiltered* per-doc shingle counts, so for any pair with full-set
    J ≥ t that shares ≥ 1 non-stop shingle, at most
    ``|d| - ceil(t·|d|)`` shingles of either filtered set lie outside
    the shared (non-stop) intersection — the canonical-order-smallest
    shared non-stop shingle therefore sits inside both stored prefixes
    of length ``floor((1-t)·|d|) + 1``. (Sizing the prefix from the
    max_df-filtered sets instead silently dropped such pairs — ADVICE
    r5.) Verification always uses full shingle sets, so reported
    Jaccard values are exact.
    """
    from pyspark.sql import Window

    # corpus-sized inputs materialize the shingle rows once instead of
    # re-shingling per plan reference — see SHINGLE_CHECKPOINT_MIN_PARTS
    shingles = _materialize_if_big(shingles)
    block = shingles
    if max_df is not None:
        df_ok = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        block = shingles.join(df_ok, "shingle")
    if prefix_filter:
        # global canonical order: df ascending, shingle value tie-break
        dfreq = block.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("_df")
        )
        ranked = block.join(dfreq, "shingle").withColumn(
            "_rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("_df", "shingle")
            ),
        )
        if max_df is None:
            # block == shingles, so the window count IS the full size —
            # no extra shuffle
            ranked = ranked.withColumn(
                "_sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
            )
        else:
            # sizes MUST come from the unfiltered sets (see docstring):
            # the prefix ranks within the filtered set but its length —
            # and the length filter — are governed by full-set Jaccard
            full_sz = shingles.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("_sz")
            )
            ranked = ranked.join(full_sz, "doc_id")
        # indexing prefix for J ≥ t: |d| - ceil(t·|d|) + 1 rarest shingles
        block = ranked.filter(
            F.col("_rnk")
            # +1e-6 before floor: in floats (1-0.8)*55 is
            # 10.999..., one under the exact 11 — flooring that
            # would store one-too-few prefix shingles exactly when
            # (1-t)·sz is an integer and silently lose boundary
            # pairs (caught by the sf0.1 oracle gate). Rounding up
            # can only lengthen the prefix, which is always safe.
            <= F.floor(F.lit(1.0 - threshold) * F.col("_sz")
                       + F.lit(1e-6)) + 1
        ).select("doc_id", "shingle", "_sz")
    else:
        block = block.withColumn("_sz", F.lit(None).cast("long"))
    a, b = block.alias("a"), block.alias("b")
    length_ok = (
        # epsilon slack: 0.8*55 in floats is 44.000000000000007,
        # which would reject a true min-size of exactly t·max;
        # looser-by-epsilon is safe (verification is exact)
        (F.col("b._sz") * threshold <= F.col("a._sz") + 1e-6)
        & (F.col("a._sz") * threshold <= F.col("b._sz") + 1e-6)
        if prefix_filter
        else F.lit(True)
    )
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & length_ok,
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # exact verification over full shingle sets (shared with MinHash-LSH)
    return jaccard_pairs_for_candidates(cand, shingles).filter(
        F.col("jaccard") >= threshold
    )


def minhash_signatures(shingles: DataFrame, portable: bool = True) -> DataFrame:
    """k=8 permutation MinHash signature per doc: h_j = min (a_j·x + b_j) mod P.

    ``shingles.shingle`` is already an integer feature hash, so the
    permutations are pure arithmetic."""
    x = "shingle" if portable else f"pmod(xxhash64(shingle), {pf.P31})"
    hashed = shingles.select("doc_id", F.expr(x).alias("x"))
    aggs = [
        F.min(F.expr(f"(x * {a} + {b}) % {pf.P31}")).alias(f"mh{j}")
        for j, (a, b) in enumerate(pf.MINHASH_PERMS)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    portable: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: 8 minhashes in 4 bands of 2; candidate
    pairs share ≥1 band; verified with exact Jaccard ≥ threshold.
    Corpus-sized corpora pay one eager shingle materialization job at
    DataFrame-build time (see ``SHINGLE_CHECKPOINT_MIN_PARTS``)."""
    # corpus-sized inputs: one materialization feeds the signature
    # pass and the three verify-side references — see
    # SHINGLE_CHECKPOINT_MIN_PARTS
    shingles = _materialize_if_big(shingle_table(docs, n))
    sig = minhash_signatures(shingles, portable)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.col(f"mh{2 * bi}").alias("h1"),
                        F.col(f"mh{2 * bi + 1}").alias("h2"),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.h1", "bk.h2")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    verified = jaccard_pairs_for_candidates(cand, shingles)
    return verified.filter(F.col("jaccard") >= threshold)


def jaccard_pairs_for_candidates(
    cand: DataFrame, shingles: DataFrame
) -> DataFrame:
    """Exact Jaccard for a given candidate-pair set."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa, sb = shingles.alias("sa"), shingles.alias("sb")
    inter = (
        cand.join(sa, F.col("sa.doc_id") == F.col("d1"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("d2"))
            & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("isz"))
    )
    z1 = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    z2 = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(z1, "d1")
        .join(z2, "d2")
        .select(
            "d1",
            "d2",
            (
                F.col("isz").cast("double")
                / (F.col("sz1") + F.col("sz2") - F.col("isz"))
            ).alias("jaccard"),
        )
    )


def simhash_table(
    docs: DataFrame, n: int = 3, portable: bool = True
) -> DataFrame:
    """32-bit SimHash per doc over the word-shingle multiset (shingle
    hashes are the features — computed arithmetically from per-token
    hashes, no string shingles)."""
    toks = docs.select("doc_id", F.expr(pf.tokens(pf.SPARK, "text")).alias("tokens"))
    th = toks.select(
        "doc_id", F.expr(pf.token_hashes(pf.SPARK, "tokens")).alias("th")
    )
    feats = th.select(
        "doc_id",
        F.explode(F.expr(pf.shingle_hashes(pf.SPARK, "th", n))).alias("shingle"),
    )
    if not portable:
        feats = feats.select(
            "doc_id", F.expr(f"pmod(xxhash64(shingle), {pf.P31})").alias("shingle")
        )
    return feats.groupBy("doc_id").agg(
        F.expr(pf.simhash32(pf.SPARK, "shingle")).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 6, portable: bool = True
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius via lossless band
    blocking: 8 disjoint 4-bit bands — any pair with distance ≤ 7 agrees
    on some band, so this equijoin finds exactly the cross-join answer."""
    if max_hamming > 7:
        raise ValueError("8x4-bit banding is lossless only for max_hamming <= 7")
    sh = simhash_table(docs, portable=portable)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.expr(f"(simhash >> {4 * bi}) & 15").alias("bv"),
                    )
                    for bi in range(8)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.bv")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.expr(pf.hamming32(pf.SPARK, "a.simhash", "b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_wide_table(
    docs: DataFrame, n: int = 3, bits: int = pf.WIDE_BITS
) -> DataFrame:
    """Wide (≤62-bit) SimHash per doc — same shingle features as
    ``simhash_table``, production fingerprint width (see
    ``pf.simhash_wide``)."""
    toks = docs.select(
        "doc_id", F.expr(pf.tokens(pf.SPARK, "text")).alias("tokens")
    )
    th = toks.select(
        "doc_id", F.expr(pf.token_hashes(pf.SPARK, "tokens")).alias("th")
    )
    feats = th.select(
        "doc_id",
        F.explode(F.expr(pf.shingle_hashes(pf.SPARK, "th", n))).alias("shingle"),
    )
    return feats.groupBy("doc_id").agg(
        F.expr(pf.simhash_wide(pf.SPARK, "shingle", bits)).alias("simhash")
    )


def simhash_wide_pairs(
    docs: DataFrame, max_hamming: int = 3, bits: int = pf.WIDE_BITS
) -> DataFrame:
    """SimHash near-dup pairs at production scale: wide fingerprint,
    small Hamming radius, *wide* blocking bands — the Manku-et-al shape
    (64-bit fingerprint, k≈3, bands of ~16 bits).

    Lossless: ``max_hamming + 1`` disjoint bands, so any pair within
    the radius agrees on at least one band (pigeonhole) and the
    equijoin finds exactly the cross-join answer. The scale property
    the 32-bit variant lacks: band value space is ``2^(bits/(h+1))``
    (~32k here) instead of 16, so bucket occupancy — and the candidate
    join — stays near-linear in corpus size. Measured at the tiled sf1
    corpus (50k docs): 120 s → ~4 s vs ``simhash_pairs``."""
    n_bands = max_hamming + 1
    layout = pf.band_layout(bits, n_bands)
    sh = simhash_wide_table(docs, bits=bits)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.expr(
                            f"(simhash >> {off}) & {(1 << w) - 1}"
                        ).alias("bv"),
                    )
                    for bi, (off, w) in enumerate(layout)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.bv")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.expr(
                pf.hamming32(pf.SPARK, "a.simhash", "b.simhash")
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_pairs(
    corpus_shingles: DataFrame,
    batch_shingles: DataFrame,
    threshold: float,
    broadcast_batch: bool = True,
    prefix_filter: bool = False,
) -> DataFrame:
    """Incremental dedup: near-duplicate matches of an *arriving batch*
    against an *existing corpus* — the shape a change-feed-fed training
    pipeline runs every poll cycle (only new/changed documents are
    checked, never corpus×corpus).

    Both inputs are ``shingle_table`` outputs. Candidates come from an
    inverted-index equijoin on the shingle hash; exact Jaccard verifies
    each candidate. Returns (batch_doc, corpus_doc, jaccard) for every
    pair at or above ``threshold``.

    Scale shape: the batch side is small by construction (one poll
    cycle), so with ``broadcast_batch`` the candidate join is map-side —
    the corpus inverted index is probed in place and never shuffled.
    Corpus document sizes are recomputed here for self-containment; a
    production index stores them alongside the shingles so the size join
    is a lookup, not an aggregation.
    """
    b = batch_shingles.select(
        F.col("doc_id").alias("batch_doc"), "shingle"
    )
    c = corpus_shingles.select(
        F.col("doc_id").alias("corpus_doc"), "shingle"
    )
    if prefix_filter:
        # Same lossless prefix filter as ``jaccard_pairs`` (candidates
        # must share one of each side's floor((1-t)|d|)+1 rarest
        # shingles under a shared total order), batch-vs-corpus form.
        # The canonical order is corpus document frequency (batch-only
        # shingles rank rarest at df 0 — any consistent total order
        # satisfies the lemma). Only worth it at *tight* thresholds
        # (t ≥ ~0.8), where the prefix is a small fraction of each
        # shingle set; at t = 0.5 the prefix keeps ~half of every doc,
        # so the two corpus-wide shuffles it costs outweigh the
        # candidate reduction (measured at the sf10 corpus with a
        # corpus-sized batch: 105 s direct vs 313 s prefix). For a true
        # poll-cycle batch the default direct probe never shuffles the
        # corpus at all.
        from pyspark.sql import Window

        dfreq = c.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))

        def _prefix(side: DataFrame, idc: str) -> DataFrame:
            ranked = (
                side.join(dfreq, "shingle", "left")
                .withColumn("_df", F.coalesce(F.col("_df"), F.lit(0)))
                .withColumn(
                    "_rnk",
                    F.row_number().over(
                        Window.partitionBy(idc).orderBy("_df", "shingle")
                    ),
                )
                .withColumn(
                    "_sz", F.count(F.lit(1)).over(Window.partitionBy(idc))
                )
            )
            return ranked.filter(
                F.col("_rnk")
                <= F.floor(F.lit(1.0 - threshold) * F.col("_sz")
                           + F.lit(1e-6)) + 1  # see jaccard_pairs
            ).select(idc, "shingle", "_sz")

        bp = _prefix(b, "batch_doc").withColumnRenamed("_sz", "_bsz")
        cp = _prefix(c, "corpus_doc").withColumnRenamed("_sz", "_csz")
        if broadcast_batch:
            bp = F.broadcast(bp)
        cand = (
            cp.join(bp, "shingle")
            .filter(
                (F.col("_bsz") * threshold <= F.col("_csz") + 1e-6)
                & (F.col("_csz") * threshold <= F.col("_bsz") + 1e-6)
            )
            .select("batch_doc", "corpus_doc")
            .distinct()
            # the candidate set is referenced by four downstream joins
            # (two semi-joins, the fan-out, and the size lookup); it is
            # small but costs two corpus-wide shuffles to produce, so
            # materialize it once instead of re-running the prefix
            # pipeline per reference
            .localCheckpoint(eager=True)
        )
        # verification sees only hit docs: semi-join both shingle
        # tables down to candidates before the intersection count
        bsub = b.join(
            F.broadcast(cand.select("batch_doc").distinct()), "batch_doc"
        )
        csub = c.join(
            F.broadcast(cand.select("corpus_doc").distinct()), "corpus_doc"
        )
        inter = (
            bsub.join(F.broadcast(cand), "batch_doc")
            .join(csub, ["corpus_doc", "shingle"])
            .groupBy("batch_doc", "corpus_doc")
            .agg(F.count(F.lit(1)).alias("isz"))
        )
    else:
        if broadcast_batch:
            b = F.broadcast(b)
        inter = (
            c.join(b, "shingle")
            .groupBy("batch_doc", "corpus_doc")
            .agg(F.count(F.lit(1)).alias("isz"))
        )
    szb = batch_shingles.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("szb")
    ).withColumnRenamed("doc_id", "batch_doc")
    # corpus sizes are needed only for docs that produced a candidate —
    # semi-join the corpus down to those before aggregating, so the size
    # computation is a map-side filter + small agg instead of a
    # corpus-wide shuffle (measured 137 s → 105 s at the sf10 corpus;
    # the hit set is bounded by the batch's candidate fan-out, so the
    # broadcast is safe at any corpus size)
    hit_docs = inter.select("corpus_doc").distinct()
    szc = (
        corpus_shingles.join(
            F.broadcast(hit_docs),
            corpus_shingles.doc_id == hit_docs.corpus_doc,
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("szc"))
        .withColumnRenamed("doc_id", "corpus_doc")
    )
    return (
        inter.join(F.broadcast(szb), "batch_doc")
        .join(szc, "corpus_doc")
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


def cluster_near_duplicates(
    docs: DataFrame, pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Fuzzy-dedup clustering: connected components over the near-dup
    pair graph, labeling every doc with its component's minimum doc_id
    (the canonical representative a corpus pipeline keeps).

    Iterative min-label propagation: each round, every node adopts the
    smallest label among itself and its neighbors; converges in
    O(component diameter) rounds — near-dup components are tiny (pairs,
    triangles), so 2-3 rounds in practice, bounded by ``max_iterations``.
    Each round is one join + one aggregate on the (small) pair set, not
    the corpus; the final labeling joins back to docs once.
    """
    edges = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .unionByName(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
        .distinct()
    )
    labels = docs.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nb_label"))
            .withColumnRenamed("a", "node2")
        )
        updated = labels.join(
            neighbor_min, labels.node == F.col("node2"), "left_outer"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
            ).alias("label"),
        )
        updated = updated.localCheckpoint(eager=True)  # cut the lineage per round
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), F.col("u.node") == F.col("l.node"))
            .filter(F.col("u.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
