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
    cell. Broadcast centroids → map-side scoring; one shuffle on
    vec_id for the per-vector rank."""
    vecs = _as_double_vec(embeddings, emb_col)
    scored = vecs.join(F.broadcast(centroids)).withColumn(
        "d2", F.expr(_SQDIST.format(a="v", b="cvec"))
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
