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


def _spread(vecs: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle-partition
    count. Assignment is a pure projection, so its parallelism is
    whatever the *scan* provides — a corpus stored in a few files
    would score N·k distances on a few cores (sf1 = 2 files measured
    2-way on 32 cores). One narrow N-row shuffle is trivial next to
    the N·k·dim compute it parallelizes; per-vector cost is uniform,
    so round-robin is the right spread (no key, no skew). Results are
    row-wise and unaffected by placement.

    Corpus-sized callers only: a poll-cycle extend batch should skip
    the spread (``spread=False`` on the public entry points) — the
    shuffle plus a task per target partition is pure overhead for a
    batch that fits in a few."""
    try:
        n = int(vecs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:  # e.g. a platform-managed "auto" setting
        n = vecs.sparkSession.sparkContext.defaultParallelism
    return vecs.repartition(n)


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
    return _init_vecs(_as_double_vec(embeddings, emb_col), k)


def _init_vecs(vecs: DataFrame, k: int) -> DataFrame:
    """``init_centroids`` on prepped (vec_id, v) rows."""
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
                    emb_col: str = "embedding",
                    spread: bool = True) -> DataFrame:
    """(vec_id, cid): each vector's nearest centroid (squared L2, ties
    to the lowest cid). Broadcast centroids → map-side argmin; the
    corpus is never shuffled. ``spread=False`` for batch-sized inputs
    (poll-cycle extends) — see ``_spread``."""
    return assign_clusters_topn(embeddings, centroids, 1, emb_col, spread)


def _pack(centroids: DataFrame, keys: list[str],
          id_col: str) -> DataFrame:
    """Collapse a centroid table into one array<struct<id, cvec>> per
    ``keys`` group (one global row when ``keys`` is empty), sorted by
    id for determinism. The packed side is tiny (≤ k centroids ×
    ~0.5 KB) and broadcasts."""
    agg = F.array_sort(
        F.collect_list(F.struct(F.col(id_col), F.col("cvec")))
    ).alias("_cents")
    if keys:
        return centroids.groupBy(*keys).agg(agg)
    return centroids.agg(agg)


def _nearest_expr(id_col: str, n: int, vec_col: str = "v") -> str:
    """SQL that scores every packed centroid against ``v`` and yields
    the ``n`` nearest ids (squared L2, ties to the lowest id) as an
    array — one expression per *vector* row, so assignment is a pure
    map-side projection: no N·k row explosion, no aggregate, no sort,
    no shuffle. (A ``min_by`` over a (d2, id) struct key computes the
    same thing but Spark plans struct-keyed min_by as SortAggregate —
    it *sorted* the N·k scored rows per partition, measured as the
    single-thread straggler of flat sf10 training; ranking them
    through a window additionally shuffled them. Both reproduce this
    expression's exact orderBy semantics, so assignments — and every
    trained centroid and oracle replay — are bit-identical across the
    three forms.)"""
    d2 = _SQDIST.format(a=vec_col, b="c.cvec")
    scored = f"transform(_cents, c -> struct({d2} AS d2, c.{id_col} AS i))"
    if n == 1:
        return f"array_min({scored}).i"
    return f"transform(slice(array_sort({scored}), 1, {n}), s -> s.i)"


def assign_clusters_topn(embeddings: DataFrame, centroids: DataFrame,
                         n: int, emb_col: str = "embedding",
                         spread: bool = True) -> DataFrame:
    """(vec_id, cid) for each vector's ``n`` nearest centroids (squared
    L2, ties to the lowest cid) — multi-assignment is the standard
    recall device for cluster-blocked candidate generation: a pair
    split across a cell boundary still meets in a shared second-nearest
    cell. The centroid set packs into a single broadcast array and each
    vector scores it inside one projection expression
    (``_nearest_expr``) — the whole assignment, including every Lloyd
    round of training, is map-side with zero shuffle (one ``_spread``
    repartition excepted — see there; ``spread=False`` for batch-sized
    inputs)."""
    vecs = _as_double_vec(embeddings, emb_col)
    return _assign_vecs_topn(_spread(vecs) if spread else vecs,
                             centroids, n)


#: per-row score size (centroids × dims) above which assignment
#: dispatches to the Arrow-vectorized path (round 8): Spark evaluates
#: higher-order-function lambdas interpreted — never codegen'd — at
#: ~86 µs per 768-dim distance (measured r7), so a 2 M × 768-dim
#: corpus scoring 45 coarse cells would spend HOURS inside
#: ``_nearest_expr`` where the numpy fold below does the identical
#: arithmetic ~100× faster. Both paths are locked bit-identical
#: (tests/test_kmeans.py::test_arrow_assignment_matches_hof*), so the
#: dispatch is purely a performance decision; the floor keeps every
#: pinned oracle fixture (64-dim, k ≤ ~100 ⇒ score ≤ ~6 400) on the
#: expression path the DuckDB replay was written against. 16 384, not
#: the original 32 768: the 2 M × 768 ingest-gate build (k=38 ⇒ score
#: 29 184) sat just under the old floor and ground its training
#: assignments interpreted.
VECTORIZED_ASSIGN_MIN_SCORE = 16_384


def _fold_sqdist(X, C, acc_out):
    """Squared-L2 scores of every row of ``X`` (b × dims) against every
    row of ``C`` (k × dims) with the EXACT expression tree of
    ``_SQDIST``: the accumulator adds ``(x_i − y_i)²`` in ascending
    component order, each step one correctly-rounded IEEE double op —
    matmul/einsum would reassociate and drift the last ulp, flipping
    argmin on near-ties. Writes into ``acc_out`` (b × k)."""
    import numpy as np

    acc_out[:] = 0.0
    b, k = acc_out.shape
    t = np.empty((b, k))
    for i in range(X.shape[1]):
        np.subtract(X[:, i, None], C[None, :, i], out=t)
        np.multiply(t, t, out=t)
        acc_out += t
    return acc_out


def _assign_vecs_topn_arrow(vecs: DataFrame, rows: list,
                            n: int, carry: tuple) -> DataFrame:
    """Arrow-vectorized twin of the ``_nearest_expr`` projection over
    pre-collected centroid ``rows`` (cid-ordered; the collected matrix
    IS the broadcast side — k × dims doubles, the same payload
    ``_pack`` ships). Each Arrow batch scores it with the bit-exact
    fold; ranking is ``argmin`` / stable ``argsort`` over cid-ordered
    columns — exactly array_min / array_sort's (d2, cid) order. Same
    map-side, zero-shuffle shape: mapInPandas is a projection over the
    scan, no row explosion."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cids = np.asarray([r["cid"] for r in rows], np.int32)
    C = np.asarray([r["cvec"] for r in rows], np.float64)
    src = vecs.select(
        "vec_id", *carry, *([] if "v" in carry else ["v"])
    )
    out_fields = [src.schema["vec_id"], *(src.schema[c] for c in carry),
                  StructField("cid", IntegerType(), True)]
    schema = StructType(out_fields)
    keep = ["vec_id", *carry]
    m = min(n, len(cids))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64,
                                                     copy=False)
            acc = np.empty((len(pdf), len(cids)))
            _fold_sqdist(X, C, acc)
            if n == 1:
                out = pdf[keep].copy()
                out["cid"] = cids[np.argmin(acc, axis=1)]
                yield out
            else:
                top = np.argsort(acc, axis=1, kind="stable")[:, :m]
                out = pdf[keep].iloc[
                    np.repeat(np.arange(len(pdf)), m)
                ].copy()
                out["cid"] = cids[top.ravel()]
                yield out

    return src.mapInPandas(gen, schema)


def _assign_vecs_topn(vecs: DataFrame, centroids: DataFrame, n: int,
                      carry: tuple = ()) -> DataFrame:
    """``assign_clusters_topn``'s core on prepped (vec_id, v) rows —
    the training loop preps (and spreads, and checkpoints) the corpus
    once and calls this every round. ``carry`` keeps extra input
    columns (e.g. ``v``) on the output: the projection is
    row-preserving, so a consumer that needs the vector next to its
    cell id takes it directly instead of joining back to the corpus
    (the join-back was an N-row shuffle per Lloyd round).

    Dispatches to the Arrow-vectorized twin when the per-row score
    size (k × dims) crosses ``VECTORIZED_ASSIGN_MIN_SCORE``; the size
    probe collects the centroid table — k rows, the broadcast payload
    either path ships anyway."""
    rows = centroids.select("cid", "cvec").orderBy("cid").collect()
    if rows and len(rows) * len(rows[0]["cvec"]) >= \
            VECTORIZED_ASSIGN_MIN_SCORE:
        return _assign_vecs_topn_arrow(vecs, rows, n, carry)
    packed = _pack(centroids, [], "cid")
    scored = vecs.crossJoin(F.broadcast(packed))
    cols = ["vec_id", *carry]
    if n == 1:
        return scored.select(
            *cols, F.expr(_nearest_expr("cid", 1)).alias("cid")
        ).filter(F.col("cid").isNotNull())  # empty centroid set ⇒ no rows
    return scored.select(
        *cols,
        F.explode(F.expr(_nearest_expr("cid", n))).alias("cid"),
    )


def _update(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd round over prepped (vec_id, v) rows: assign (carrying
    the vector through the projection — no join back to the corpus),
    then recompute component means in fixed-point; clusters that lost
    every member keep their centroid."""
    assigned = _assign_vecs_topn(vecs, centroids, 1, carry=("v",))
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
    lineage stays flat regardless of ``iters``. The corpus is prepped,
    spread and checkpointed ONCE — every round's assignment then reads
    the materialized, well-partitioned vectors instead of re-running
    the scan (the same one-prep pattern ``train_kmeans_2level`` uses
    for its fine rounds)."""
    vecs = _spread(_as_double_vec(embeddings, emb_col)).localCheckpoint(
        eager=True
    )
    return _train_vecs(vecs, k, iters)


def _train_vecs(vecs: DataFrame, k: int, iters: int) -> DataFrame:
    """``train_kmeans``'s core on prepped (vec_id, v) rows — callers
    that already hold the spread, checkpointed corpus (the two-level
    trainer) reuse it instead of re-prepping."""
    centroids = _init_vecs(vecs, k).localCheckpoint(eager=True)
    for _ in range(iters):
        centroids = _update(vecs, centroids).localCheckpoint(eager=True)
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


def _assign_fine_arrow(vecs: DataFrame, rows: list, n: int,
                       carry: tuple) -> DataFrame:
    """Arrow-vectorized twin of ``_assign_fine``: the per-coarse-cell
    fine centroid matrices are collected into one dict (k_coarse ×
    k_fine × dims doubles — the payload ``_pack`` would broadcast
    anyway) shipped via an explicit Spark broadcast, and each Arrow
    batch groups its rows by ccid and scores its own cell's matrix
    with the bit-exact fold. Rows whose ccid has no fine centroids
    drop, mirroring the HOF form's inner join."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cells: dict = {}
    for r in rows:
        cells.setdefault(r["ccid"], ([], []))
        cells[r["ccid"]][0].append(r["fid"])
        cells[r["ccid"]][1].append(r["cvec"])
    cells = {
        cc: (np.asarray(fs, np.int32), np.asarray(vs, np.float64))
        for cc, (fs, vs) in cells.items()
    }
    bc = vecs.sparkSession.sparkContext.broadcast(cells)
    src = vecs.select(
        "vec_id", "ccid", *carry, *([] if "v" in carry else ["v"])
    )
    keep = (["vec_id", "ccid", *carry] if n == 1
            else ["vec_id", "ccid"])
    out_fields = [*(src.schema[c] for c in keep),
                  StructField("fid", IntegerType(), True)]
    schema = StructType(out_fields)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = []
            for cc, grp in pdf.groupby("ccid", sort=True):
                cell = bc.value.get(cc)
                if cell is None:  # no fine centroids ⇒ inner-join drop
                    continue
                fids, Cm = cell
                X = np.stack(grp["v"].to_numpy()).astype(
                    np.float64, copy=False
                )
                acc = np.empty((len(grp), len(fids)))
                _fold_sqdist(X, Cm, acc)
                if n == 1:
                    out = grp[keep].copy()
                    out["fid"] = fids[np.argmin(acc, axis=1)]
                else:
                    m = min(n, len(fids))
                    top = np.argsort(acc, axis=1, kind="stable")[:, :m]
                    out = grp[keep].iloc[
                        np.repeat(np.arange(len(grp)), m)
                    ].copy()
                    out["fid"] = fids[top.ravel()]
                parts.append(out)
            if parts:
                import pandas as pd

                yield pd.concat(parts, ignore_index=True)

    return src.mapInPandas(gen, schema)


def _assign_fine(vecs: DataFrame, fine: DataFrame, n: int = 1,
                 carry: tuple = ()) -> DataFrame:
    """(vec_id, ccid, fid): each vector's ``n`` nearest fine centroids
    *within each of its coarse cells*. ``vecs`` is (vec_id, ccid, v);
    ``fine`` is (ccid, fid, cvec) — packed per coarse cell and
    broadcast (≤ k total rows), so each (vector, coarse cell) row
    scores its own cell's centroids inside one projection expression
    (``_nearest_expr`` — same map-side, shuffle-free, bit-identical
    rationale as ``assign_clusters_topn``; ``carry`` keeps extra input
    columns on the output, see ``_assign_vecs_topn``). Dispatches to
    the Arrow twin past ``VECTORIZED_ASSIGN_MIN_SCORE`` on the
    *largest* cell's score size — the HOF lambda is interpreted and
    becomes the wall at wide dims (see ``_assign_vecs_topn``); the
    size probe collects the fine table, the broadcast payload either
    path ships anyway."""
    rows = fine.select("ccid", "fid", "cvec").orderBy(
        "ccid", "fid"
    ).collect()
    if rows:
        from collections import Counter

        kmax = max(Counter(r["ccid"] for r in rows).values())
        if kmax * len(rows[0]["cvec"]) >= VECTORIZED_ASSIGN_MIN_SCORE:
            return _assign_fine_arrow(vecs, rows, n, carry)
    packed = _pack(fine, ["ccid"], "fid")
    scored = vecs.join(F.broadcast(packed), "ccid")
    if n == 1:
        return scored.select(
            "vec_id", "ccid", *carry,
            F.expr(_nearest_expr("fid", 1)).alias("fid")
        )
    return scored.select(
        "vec_id",
        "ccid",
        F.explode(F.expr(_nearest_expr("fid", n))).alias("fid"),
    )


def _update_fine(vecs: DataFrame, fine: DataFrame) -> DataFrame:
    """One grouped Lloyd round over every coarse cell at once: assign
    within-cell, recompute (ccid, fid) component means in fixed-point;
    fine cells that lost every member keep their centroid. One
    partial-aggregated shuffle of cardinality k·dim — never a per-cell
    driver loop, so the round count is independent of k_coarse. The
    vector rides through the assignment projection — no join back to
    the corpus."""
    assigned = _assign_fine(vecs, fine, 1, carry=("v",))
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
    definition none at train time — would lose nothing).

    The corpus is prepped, spread and checkpointed once; coarse
    training, the coarse assignment and every fine round read the same
    materialized vectors, and the assignment carries the vector
    through its projection — no join back to the corpus anywhere in
    training."""
    vecs0 = _spread(_as_double_vec(embeddings, emb_col)).localCheckpoint(
        eager=True
    )
    coarse = _train_vecs(vecs0, k_coarse, iters)
    vecs = (
        _assign_vecs_topn(vecs0, coarse, 1, carry=("v",))
        .select("vec_id", F.col("cid").alias("ccid"), "v")
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
    spread: bool = True,
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
    extended. ``spread=False`` for batch-sized inputs (poll-cycle
    extends) — see ``_spread``."""
    src = _as_double_vec(embeddings, emb_col)
    vecs = (
        _assign_vecs_topn(
            _spread(src) if spread else src,
            _live_coarse(coarse, fine),
            1,
            carry=("v",),
        )
        .select("vec_id", F.col("cid").alias("ccid"), "v")
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
    vecs = (
        _assign_vecs_topn(
            _spread(_as_double_vec(embeddings, emb_col)),
            _live_coarse(coarse, fine),
            n_coarse,
            carry=("v",),
        )
        .select("vec_id", F.col("cid").alias("ccid"), "v")
    )
    return _assign_fine(vecs, fine, n_fine)
