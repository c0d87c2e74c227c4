"""Distributed Lloyd's k-means over an embedding column — the coarse
quantizer trainer for the IVF index (``ann_index`` accepts the trained
centroids in place of its sign-pattern stand-in).

Scale shape per iteration: the centroid set is tiny (k × dim) and
broadcast; assignment is a map-side argmin over the corpus (no corpus
shuffle), and the centroid update is one partial-aggregated shuffle
keyed by (cluster, component) — cardinality k·dim, independent of
corpus size. The loop runs a fixed ``iters`` (IVF training does not
need convergence detection; a fixed small number of Lloyd rounds is
the standard recipe), so no per-round driver-side convergence check
exists at all.

Determinism: initialization is the first k vectors by ``vec_id`` (no
RNG), and mean accumulation is fixed-point decimal so the trained
centroids are reproducible across partitionings — the property the
oracle-checked queries rely on elsewhere in the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point accumulator for order-independent component means
_ACC = "decimal(30,12)"

#: squared L2 distance between two equal-length double arrays
_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _as_double_vec(embeddings: DataFrame, emb_col: str) -> DataFrame:
    return embeddings.select(
        "vec_id",
        F.expr(f"transform({emb_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    )


def init_centroids(embeddings: DataFrame, k: int,
                   emb_col: str = "embedding") -> DataFrame:
    """Deterministic seed: the k lowest-``vec_id`` vectors become
    centroids 0..k-1.

    Scale shape: ``orderBy().limit(k)`` runs as a distributed
    TakeOrderedAndProject (per-partition top-k, then a k·partitions
    merge on one task), so the corpus never funnels through a single
    partition. The cid assignment is a single aggregate over the k
    surviving rows — no window function anywhere in the plan.

    ``vec_id`` is documented as the embeddings table's key, but the
    seed must not become flaky if that contract is violated: the
    take-k orders on the full (vec_id, v) pair, so duplicate ids tie-
    break on the embedding arrays (Spark orders arrays lexicographic-
    ally) and the *selection* at the limit boundary stays deterministic
    across partitionings — ordering on vec_id alone would let Spark
    keep an arbitrary subset of equal-id rows. With unique ids this is
    exactly the documented "k lowest vec_ids in order" contract.
    """
    vecs = _as_double_vec(embeddings, emb_col)
    top = vecs.orderBy("vec_id", "v").limit(k)
    packed = top.agg(
        F.array_sort(F.collect_list(F.struct("vec_id", "v"))).alias("s")
    )
    return (
        packed.select(F.posexplode("s").alias("cid", "sv"))
        .select(F.col("cid").cast("int").alias("cid"),
                F.col("sv.v").alias("cvec"))
    )


def assign_clusters(embeddings: DataFrame, centroids: DataFrame,
                    emb_col: str = "embedding") -> DataFrame:
    """(vec_id, cid): each vector's nearest centroid (squared L2, ties
    to the lowest cid). Broadcast centroids → map-side argmin; the
    corpus is never shuffled."""
    return assign_clusters_topn(embeddings, centroids, 1, emb_col)


def assign_clusters_topn(embeddings: DataFrame, centroids: DataFrame,
                         n: int, emb_col: str = "embedding") -> DataFrame:
    """(vec_id, cid) for each vector's ``n`` nearest centroids (squared
    L2, ties to the lowest cid) — multi-assignment is the standard
    recall device for cluster-blocked candidate generation: a pair
    split across a cell boundary still meets in a shared second-nearest
    cell. Broadcast centroids → map-side scoring.

    ``n = 1`` (every Lloyd round's assignment — the training hot loop)
    aggregates with ``min_by`` over the (d2, cid) struct key instead of
    ranking a window: partial aggregation collapses the N·k scored rows
    to N map-side *before* the shuffle, where the window form sorted
    all N·k through one shuffle per round (at a √N-cell quantizer that
    is N^1.5 rows — the dominant cost of flat training at sf10). The
    (d2, cid) struct key reproduces the window's exact orderBy
    semantics, so assignments — and therefore trained centroids and
    every oracle replay — are bit-identical."""
    vecs = _as_double_vec(embeddings, emb_col)
    scored = vecs.join(F.broadcast(centroids)).withColumn(
        "d2", F.expr(_SQDIST.format(a="v", b="cvec"))
    )
    if n == 1:
        return scored.groupBy("vec_id").agg(
            F.min_by("cid", F.struct("d2", "cid")).alias("cid")
        )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select("vec_id", "cid")
    )


def _update(embeddings: DataFrame, centroids: DataFrame,
            emb_col: str) -> DataFrame:
    """One Lloyd round: assign, then recompute component means in
    fixed-point; clusters that lost every member keep their centroid."""
    vecs = _as_double_vec(embeddings, emb_col)
    assigned = assign_clusters(embeddings, centroids, emb_col).join(
        vecs, "vec_id"
    )
    comp = assigned.select(
        "cid", F.posexplode("v").alias("pos", "x")
    )
    means = (
        comp.groupBy("cid", "pos")
        .agg(
            # exact decimal accumulation, ONE double division at the end
            # (identical expression tree to the SQL oracle)
            (
                F.sum(F.col("x").cast(_ACC)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), "
                "s -> s.m)"
            ).alias("cvec")
        )
    )
    return (
        centroids.select("cid", F.col("cvec").alias("_old"))
        .join(means, "cid", "left")
        .select("cid", F.coalesce("cvec", "_old").alias("cvec"))
    )


def train_kmeans(embeddings: DataFrame, k: int, iters: int = 5,
                 emb_col: str = "embedding") -> DataFrame:
    """Train k centroids with ``iters`` Lloyd rounds. Returns
    (cid INT, cvec ARRAY<DOUBLE>), localCheckpointed per round so the
    lineage stays flat regardless of ``iters``."""
    centroids = init_centroids(embeddings, k, emb_col).localCheckpoint(
        eager=True
    )
    for _ in range(iters):
        centroids = _update(embeddings, centroids, emb_col).localCheckpoint(
            eager=True
        )
    return centroids


# --------------------------------------------------------------------------
# Two-level (hierarchical) quantizer — the >10⁶-vector path
# --------------------------------------------------------------------------
#
# Flat k-means blocking needs k ≈ √N cells to keep per-cell occupancy
# (and hence candidate-pair volume, Σ occupancy²) bounded, but flat
# assignment costs N·k distance evaluations — at 10⁶ vectors that is
# 10⁹ and growing as N^1.5. The standard fix (IVF-HNSW/IMI lineage) is
# a two-level quantizer: √k coarse cells, then k-fine sub-cells trained
# *within* each coarse cell. Assignment drops to N·(k_coarse + k_fine)
# ≈ N·2√k because a vector only scores the fine centroids of its own
# coarse cell(s); cell count — and therefore occupancy — is unchanged
# at k_coarse·k_fine. Everything below keeps the module's determinism
# contract (first-k seeds, decimal means, dist-then-id tie-breaks) so a
# SQL oracle replays both levels bit-for-bit.


def _assign_fine(vecs: DataFrame, fine: DataFrame, n: int = 1) -> DataFrame:
    """(vec_id, ccid, fid): each vector's ``n`` nearest fine centroids
    *within each of its coarse cells*. ``vecs`` is (vec_id, ccid, v);
    ``fine`` is (ccid, fid, cvec) and broadcasts (≤ k total rows), so
    scoring is map-side — a vector never sees another cell's centroids."""
    scored = vecs.join(F.broadcast(fine), "ccid").withColumn(
        "d2", F.expr(_SQDIST.format(a="v", b="cvec"))
    )
    if n == 1:
        # map-side partial min_by — same rationale (and same exact
        # tie-break semantics) as assign_clusters_topn's n=1 path
        return scored.groupBy("vec_id", "ccid").agg(
            F.min_by("fid", F.struct("d2", "fid")).alias("fid")
        )
    w = Window.partitionBy("vec_id", "ccid").orderBy("d2", "fid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .select("vec_id", "ccid", "fid")
    )


def _update_fine(vecs: DataFrame, fine: DataFrame) -> DataFrame:
    """One grouped Lloyd round over every coarse cell at once: assign
    within-cell, recompute (ccid, fid) component means in fixed-point;
    fine cells that lost every member keep their centroid. One
    partial-aggregated shuffle of cardinality k·dim — never a per-cell
    driver loop, so the round count is independent of k_coarse."""
    assigned = _assign_fine(vecs, fine, 1).join(
        vecs.select("vec_id", "v"), "vec_id"
    )
    comp = assigned.select("ccid", "fid", F.posexplode("v").alias("pos", "x"))
    means = (
        comp.groupBy("ccid", "fid", "pos")
        .agg(
            (
                F.sum(F.col("x").cast(_ACC)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("ccid", "fid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), "
                "s -> s.m)"
            ).alias("cvec")
        )
    )
    return (
        fine.select("ccid", "fid", F.col("cvec").alias("_old"))
        .join(means, ["ccid", "fid"], "left")
        .select("ccid", "fid", F.coalesce("cvec", "_old").alias("cvec"))
    )


def train_kmeans_2level(
    embeddings: DataFrame,
    k_coarse: int,
    k_fine: int,
    iters: int = 2,
    emb_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Train the hierarchical quantizer: ``k_coarse`` top-level cells
    (flat ``train_kmeans``), then ``k_fine`` sub-cells per coarse cell,
    trained with ``iters`` grouped Lloyd rounds constrained to each
    vector's (single-assignment) coarse cell. Returns
    ``(coarse (cid, cvec), fine (ccid, fid, cvec))``.

    Fine seeding is the per-cell analog of ``init_centroids``: the
    ``k_fine`` lowest-(vec_id, v) members of each coarse cell become
    fids 0..k_fine-1 (deterministic under duplicate ids for the same
    reason). A coarse cell with fewer members seeds fewer fine cells; a
    coarse cell that ended training empty has none (its vectors — by
    definition none at train time — would lose nothing)."""
    coarse = train_kmeans(embeddings, k_coarse, iters, emb_col)
    casg = assign_clusters(embeddings, coarse, emb_col)
    vecs = (
        _as_double_vec(embeddings, emb_col)
        .join(casg.withColumnRenamed("cid", "ccid"), "vec_id")
        .select("vec_id", "ccid", "v")
        .localCheckpoint(eager=True)  # reused by every fine round
    )
    w = Window.partitionBy("ccid").orderBy("vec_id", "v")
    fine = (
        vecs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_fine)
        .select(
            "ccid",
            (F.col("_rn") - 1).cast("int").alias("fid"),
            F.col("v").alias("cvec"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        fine = _update_fine(vecs, fine).localCheckpoint(eager=True)
    return coarse, fine


def flatten_2level(fine: DataFrame, k_fine: int) -> DataFrame:
    """Flatten a two-level quantizer's fine table to the flat
    ``(cid, cvec)`` contract the IVF index stores and probes against:
    ``cid = ccid·k_fine + fid``. Cells a coarse cell never filled are
    simply absent — cell ids are sparse, which every consumer treats as
    an opaque key."""
    return fine.select(
        (F.col("ccid") * k_fine + F.col("fid")).cast("int").alias("cid"),
        "cvec",
    )


def _live_coarse(coarse: DataFrame, fine: DataFrame) -> DataFrame:
    """Coarse cells that actually have fine centroids. A coarse cell
    can end training memberless (e.g. duplicate vectors among the
    seeds collapse one cell empty and ``_update``'s coalesce keeps its
    centroid), so it seeds no fine cells — yet a *new* vector (an
    extend batch) can still be nearest to it. Assigning through such a
    cell would fall into the fine inner join's hole and silently drop
    the vector, so every 2-level assignment scores only live cells:
    the vector lands in its nearest coarse cell that can actually hold
    it. Both sides are broadcast-sized (≤ k rows)."""
    return coarse.join(
        F.broadcast(
            fine.select(F.col("ccid").alias("cid")).distinct()
        ),
        "cid",
        "left_semi",
    )


def assign_clusters_2level(
    embeddings: DataFrame,
    coarse: DataFrame,
    fine: DataFrame,
    k_fine: int,
    emb_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cid): single-assignment through the hierarchy — nearest
    coarse cell, then nearest fine cell within it, flattened to the
    global cell id. Costs k_coarse + k_fine distance evaluations per
    vector instead of the flat path's k_coarse·k_fine — the build/extend
    assignment wall breaker for trained-quantizer IVF indexes. (A
    vector may land in a different cell than a flat global argmin would
    pick — standard for hierarchical quantizers; probes compensate with
    nprobe, and probing all cells remains exhaustive.) Only coarse
    cells with fine centroids are scored (``_live_coarse``) — an
    assignment must never land where no fine cell can hold it, which
    would silently drop the vector from the index being built or
    extended."""
    casg = assign_clusters(embeddings, _live_coarse(coarse, fine), emb_col)
    vecs = (
        _as_double_vec(embeddings, emb_col)
        .join(casg.withColumnRenamed("cid", "ccid"), "vec_id")
        .select("vec_id", "ccid", "v")
    )
    return _assign_fine(vecs, fine, 1).select(
        "vec_id",
        (F.col("ccid") * k_fine + F.col("fid")).cast("int").alias("cid"),
    )


def assign_cells_2level_topn(
    embeddings: DataFrame,
    coarse: DataFrame,
    fine: DataFrame,
    n_coarse: int = 2,
    n_fine: int = 2,
    emb_col: str = "embedding",
) -> DataFrame:
    """(vec_id, ccid, fid) for each vector's ``n_coarse`` nearest
    coarse cells × ``n_fine`` nearest fine cells within each — up to
    ``n_coarse·n_fine`` blocking slots per vector. Multi-assignment at
    *both* levels is what recovers pairs split across coarse
    boundaries (the recall risk hierarchical blocking adds over flat).
    Cost per vector: k_coarse + n_coarse·k_fine distance evaluations.
    Only coarse cells with fine centroids are scored (``_live_coarse``)
    — a memberless cell has no fine centroids, so a slot spent on it
    would silently vanish in the fine join instead of blocking against
    a populated cell (the SQL oracle replays the same live-cell
    filter)."""
    casg = assign_clusters_topn(
        embeddings, _live_coarse(coarse, fine), n_coarse, emb_col
    )
    vecs = (
        _as_double_vec(embeddings, emb_col)
        .join(casg.withColumnRenamed("cid", "ccid"), "vec_id")
        .select("vec_id", "ccid", "v")
    )
    return _assign_fine(vecs, fine, n_fine)
