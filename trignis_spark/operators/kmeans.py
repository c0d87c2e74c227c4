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

import math

from pyspark.sql import DataFrame, Row, Window
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


from pyspark.sql.classic.dataframe import DataFrame as _ClassicDataFrame


class CarriedFrame(_ClassicDataFrame):
    """A trained-frame DataFrame that EXPLICITLY carries the
    driver-side rows it was built from (``local_rows`` — round 12,
    closing VERDICT r11's side-channel finding: the ``_local_rows``
    attribute stuck on plain DataFrames was load-bearing but invisible
    plumbing). Transformations still return plain DataFrames — the
    carried rows describe THIS frame's exact contents, and a consumer
    holding a derived frame correctly falls back to collecting
    (``carried_rows`` returns None there). Subclasses the classic
    (local-JVM) DataFrame: the facade's ``__new__`` ignores the
    subclass, and these frames never cross a Connect boundary."""

    def __new__(cls, df: DataFrame, rows: list):
        self = object.__new__(cls)
        _ClassicDataFrame.__init__(self, df._jdf, df.sparkSession)
        self.local_rows = rows
        return self

    def __init__(self, *args, **kwargs):  # state set in __new__
        pass


def carried_rows(df) -> list | None:
    """The rows a ``CarriedFrame`` carries, else None."""
    return getattr(df, "local_rows", None)


def _centroids_df(spark, rows, checkpoint: bool = False) -> DataFrame:
    """Collected/driver-built (cid, cvec) rows → a ``CarriedFrame``
    with the module's centroid schema, so downstream assignments skip
    their re-collect (a Spark job per call on the training hot path).
    ``checkpoint=True`` for frames that are RETURNED to consumers: a
    raw LocalRelation embedded in a repeatedly-planned query measured
    ~2× the plan/execute cost of the same rows behind a checkpointed
    scan (round 11 A/B — the optimizer re-walks inline relation data
    on every action), while inside a one-shot training round the
    LocalRelation is cheaper than the extra checkpoint job."""
    df = spark.createDataFrame(
        [(int(r["cid"]), list(r["cvec"])) for r in rows],
        "cid int, cvec array<double>",
    )
    if checkpoint:
        df = df.localCheckpoint(eager=True)
    return CarriedFrame(df, rows)


def _fine_df(spark, rows, checkpoint: bool = False) -> DataFrame:
    """Collected/driver-built (ccid, fid, cvec) rows → a
    ``CarriedFrame`` with the fine-centroid schema (same carrier and
    checkpoint rationale as ``_centroids_df``)."""
    df = spark.createDataFrame(
        [(int(r["ccid"]), int(r["fid"]), list(r["cvec"])) for r in rows],
        "ccid int, fid int, cvec array<double>",
    )
    if checkpoint:
        df = df.localCheckpoint(eager=True)
    return CarriedFrame(df, rows)


def _means_cvec(grouped) -> "object":
    """Component-mean aggregation for a Lloyd round: the exploded
    (pos, x) rows aggregate per (group, pos) with exact decimal
    accumulation and ONE double division, then gather into a cvec
    array per group. (Round 11 note: a 'wide' formulation — one
    sum-per-component aggregate over the un-exploded vector — measured
    ~2 s per execution against this form's ~60 ms at 64 dims; Spark's
    many-column aggregate codegen loses to the narrow exploded
    hash-agg by orders of magnitude here, so the exploded shape
    stays.)"""
    return (
        grouped.agg(
            (
                F.sum(F.col("x").cast(_ACC)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
    )


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

#: total literal count (centroid rows × dims) up to which a carried
#: centroid set is embedded in the assignment expression as ONE parsed
#: SQL literal instead of a broadcast-joined frame (round 12): the
#: per-round broadcast of a LocalRelation codebook measured ~0.3–0.4 s
#: slower than the same rows as an expression constant (interleaved
#: 10-rep A/B, plans/r12), and the SQL string builds in <1 ms at
#: fixture sizes vs ~1 ms *per literal* for a py4j-built Column. The
#: cap bounds parser/codegen tree size; at-or-past
#: ``VECTORIZED_ASSIGN_MIN_SCORE`` the Arrow twin dispatches first,
#: so the flat/grouped paths only fall back to the broadcast frame for
#: non-finite components (no SQL literal form) or fine tables whose
#: *total* size crosses this while the largest cell stays under the
#: Arrow gate.
LITERAL_CENTS_MAX = 16_384


def _cents_sql(rows, id_col: str) -> str | None:
    """The packed ``array<struct<id, cvec>>`` of collected centroid
    rows as one SQL literal expression, id-ascending (the order
    ``_pack``'s array_sort yields for unique ids). Bit-exact: a
    shortest-repr double literal parses back to the identical bits
    (both sides correctly rounded). Returns None when any component is
    non-finite — NaN/Infinity have no SQL literal form — and the
    caller falls back to the broadcast frame."""
    parts = []
    for r in sorted(rows, key=lambda r: int(r[id_col])):
        vec = [float(x) for x in r["cvec"]]
        if not all(math.isfinite(x) for x in vec):
            return None
        arr = ",".join(repr(x) + "D" for x in vec)
        parts.append(
            f"named_struct('{id_col}',{int(r[id_col])},"
            f"'cvec',array({arr}))"
        )
    return "array(" + ",".join(parts) + ")"


def _cents_sql_by(rows, key_col: str, id_col: str) -> str | None:
    """Per-``key_col`` packed centroid literals as one CASE expression
    (NULL for keys absent from ``rows`` — callers filter those rows,
    reproducing the broadcast join's inner semantics)."""
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(int(r[key_col]), []).append(r)
    whens = []
    for kv in sorted(groups):
        inner = _cents_sql(groups[kv], id_col)
        if inner is None:
            return None
        whens.append(f"WHEN {key_col} = {kv} THEN {inner}")
    return "CASE " + " ".join(whens) + " END"


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


def _assign_vecs_topn(vecs: DataFrame, centroids: DataFrame | None,
                      n: int, carry: tuple = (),
                      rows: list | None = None) -> DataFrame:
    """``assign_clusters_topn``'s core on prepped (vec_id, v) rows —
    the training loop preps (and spreads, and checkpoints) the corpus
    once and calls this every round. ``carry`` keeps extra input
    columns (e.g. ``v``) on the output: the projection is
    row-preserving, so a consumer that needs the vector next to its
    cell id takes it directly instead of joining back to the corpus
    (the join-back was an N-row shuffle per Lloyd round).

    Dispatches to the Arrow-vectorized twin when the per-row score
    size (k × dims) crosses ``VECTORIZED_ASSIGN_MIN_SCORE``. The size
    probe needs the centroid rows; callers that already hold them
    (the driver-carried training loop, frames built by
    ``_centroids_df``) pass/carry ``rows`` — cid-ascending — and skip
    the per-call ``collect()`` job the probe otherwise runs (round
    11: that collect was one Spark job per Lloyd round and per
    assignment on the bench's training-heavy queries)."""
    if rows is None and centroids is not None:
        rows = carried_rows(centroids)
    if rows is None:
        rows = centroids.select("cid", "cvec").orderBy("cid").collect()
    if rows and len(rows) * len(rows[0]["cvec"]) >= \
            VECTORIZED_ASSIGN_MIN_SCORE:
        return _assign_vecs_topn_arrow(vecs, rows, n, carry)
    lit = (
        _cents_sql(rows, "cid")
        if rows and len(rows) * len(rows[0]["cvec"]) <= LITERAL_CENTS_MAX
        else None
    )
    if lit is not None:
        # carried rows under the cap: the packed set rides in the
        # expression itself — no LocalRelation, no broadcast exchange
        scored = vecs.withColumn("_cents", F.expr(lit))
    else:
        if centroids is None:
            centroids = _centroids_df(vecs.sparkSession, rows)
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


def _update_rows(vecs: DataFrame, rows: list) -> list:
    """One Lloyd round with driver-carried centroids (round 11): the
    assignment projection reads the collected centroid rows directly
    (no per-round centroid ``collect`` job, no checkpointed centroid
    frame), the component means are the module's proven exploded
    decimal aggregation (see ``_means_cvec``), and the k-row result
    merges with the previous centroids on the driver (clusters that
    lost every member keep their centroid, as before). The round's
    only action is the means collect — the eager localCheckpoint +
    next-round re-collect pair this replaces cost two extra jobs per
    round on the bench's training-heavy queries. Mean arithmetic and
    assignment are the unchanged expression trees, so trained
    centroids are bit-identical to the checkpointed form."""
    if not rows:
        return rows
    assigned = _assign_vecs_topn(vecs, None, 1, carry=("v",), rows=rows)
    comp = assigned.select("cid", F.posexplode("v").alias("pos", "x"))
    means = (
        _means_cvec(comp.groupBy("cid", "pos"))
        .groupBy("cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), "
                "s -> s.m)"
            ).alias("cvec")
        )
    )
    got = {int(r["cid"]): list(r["cvec"]) for r in means.collect()}
    return [
        Row(cid=int(r["cid"]),
            cvec=got.get(int(r["cid"]), list(r["cvec"])))
        for r in rows
    ]


def train_kmeans(embeddings: DataFrame, k: int, iters: int = 5,
                 emb_col: str = "embedding") -> DataFrame:
    """Train k centroids with ``iters`` Lloyd rounds. Returns
    (cid INT, cvec ARRAY<DOUBLE>) as a local-relation frame (the
    centroid set is k×dims — driver-carried through training, see
    ``_update_rows``). The corpus is prepped, spread and checkpointed
    ONCE — every round's assignment then reads the materialized,
    well-partitioned vectors instead of re-running the scan (the same
    one-prep pattern ``train_kmeans_2level`` uses for its fine
    rounds)."""
    vecs = _spread(_as_double_vec(embeddings, emb_col)).localCheckpoint(
        eager=True
    )
    return _train_vecs(vecs, k, iters)


def _init_rows(vecs: DataFrame, k: int) -> list:
    """``_init_vecs`` driver-carried: the k lowest-(vec_id, v) vectors
    in order become cids 0..k-1. One distributed TakeOrdered job whose
    collect IS the seed (the packed/posexploded form ran the same
    take-k and then re-sorted it distributively)."""
    top = vecs.orderBy("vec_id", "v").limit(k).collect()
    return [Row(cid=i, cvec=list(r["v"])) for i, r in enumerate(top)]


def _train_vecs(vecs: DataFrame, k: int, iters: int) -> DataFrame:
    """``train_kmeans``'s core on prepped (vec_id, v) rows — callers
    that already hold the spread, checkpointed corpus (the two-level
    trainer) reuse it instead of re-prepping."""
    return _centroids_df(vecs.sparkSession,
                         _train_vecs_rows(vecs, k, iters),
                         checkpoint=True)


def _train_vecs_rows(vecs: DataFrame, k: int, iters: int) -> list:
    rows = _init_rows(vecs, k)
    for _ in range(iters):
        rows = _update_rows(vecs, rows)
    return rows


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


def _assign_fine(vecs: DataFrame, fine: DataFrame | None, n: int = 1,
                 carry: tuple = (), rows: list | None = None) -> DataFrame:
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
    size probe needs the fine rows — callers that already hold them
    (driver-carried training, ``_fine_df`` frames) pass/carry ``rows``
    ((ccid, fid)-ascending) and skip the per-call collect job."""
    if rows is None and fine is not None:
        rows = carried_rows(fine)
    if rows is None:
        rows = fine.select("ccid", "fid", "cvec").orderBy(
            "ccid", "fid"
        ).collect()
    if rows:
        from collections import Counter

        kmax = max(Counter(r["ccid"] for r in rows).values())
        if kmax * len(rows[0]["cvec"]) >= VECTORIZED_ASSIGN_MIN_SCORE:
            return _assign_fine_arrow(vecs, rows, n, carry)
    lit = (
        _cents_sql_by(rows, "ccid", "fid")
        if rows and len(rows) * len(rows[0]["cvec"]) <= LITERAL_CENTS_MAX
        else None
    )
    if lit is not None:
        # NULL _cents = a ccid with no fine centroids; dropping those
        # rows reproduces the broadcast join's inner semantics
        scored = vecs.withColumn("_cents", F.expr(lit)).filter(
            F.col("_cents").isNotNull()
        )
    else:
        if fine is None:
            fine = _fine_df(vecs.sparkSession, rows)
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


def _update_fine_rows(vecs: DataFrame, rows: list) -> list:
    """One grouped fine Lloyd round over every coarse cell at once,
    driver-carried (see ``_update_rows``): assign within-cell with the
    carried rows, aggregate (ccid, fid, pos) component means with the
    proven exploded decimal aggregation, merge with the previous fine
    centroids on the driver; fine cells that lost every member keep
    their centroid. Never a per-cell driver loop, so the round count
    is independent of k_coarse."""
    if not rows:
        return rows
    assigned = _assign_fine(vecs, None, 1, carry=("v",), rows=rows)
    comp = assigned.select("ccid", "fid",
                           F.posexplode("v").alias("pos", "x"))
    means = (
        _means_cvec(comp.groupBy("ccid", "fid", "pos"))
        .groupBy("ccid", "fid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), "
                "s -> s.m)"
            ).alias("cvec")
        )
    )
    got = {
        (int(r["ccid"]), int(r["fid"])): list(r["cvec"])
        for r in means.collect()
    }
    return [
        Row(ccid=int(r["ccid"]), fid=int(r["fid"]),
            cvec=got.get((int(r["ccid"]), int(r["fid"])),
                         list(r["cvec"])))
        for r in rows
    ]


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
    coarse_rows, fine_rows, _ = _train_2level_core(
        vecs0, k_coarse, k_fine, iters
    )
    spark = embeddings.sparkSession
    return (_centroids_df(spark, coarse_rows, checkpoint=True),
            _fine_df(spark, fine_rows, checkpoint=True))


def _train_2level_core(
    vecs0: DataFrame, k_coarse: int, k_fine: int, iters: int
) -> tuple[list, list, DataFrame]:
    """Two-level training on an already-prepped/spread/checkpointed
    corpus, driver-carried: returns ``(coarse_rows, fine_rows,
    assigned)`` where ``assigned`` is the checkpointed top-1
    coarse-assigned corpus (vec_id, ccid, v) every fine round read —
    callers that go on to assign/score the same corpus reuse it
    instead of re-prepping (the registry's clustered sweeps re-scanned
    and re-spread the corpus once per phase before round 11)."""
    coarse_rows = _train_vecs_rows(vecs0, k_coarse, iters)
    vecs = (
        _assign_vecs_topn(vecs0, None, 1, carry=("v",), rows=coarse_rows)
        .select("vec_id", F.col("cid").alias("ccid"), "v")
        .localCheckpoint(eager=True)  # reused by every fine round
    )
    w = Window.partitionBy("ccid").orderBy("vec_id", "v")
    seed = (
        vecs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_fine)
        .select(
            "ccid",
            (F.col("_rn") - 1).cast("int").alias("fid"),
            F.col("v").alias("cvec"),
        )
        .collect()
    )
    fine_rows = [
        Row(ccid=int(r["ccid"]), fid=int(r["fid"]), cvec=list(r["cvec"]))
        for r in sorted(seed, key=lambda r: (r["ccid"], r["fid"]))
    ]
    for _ in range(iters):
        fine_rows = _update_fine_rows(vecs, fine_rows)
    return coarse_rows, fine_rows, vecs


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


def _live_frame(coarse, fine) -> DataFrame:
    """``_live_coarse`` with the driver-side shortcut: when both
    frames carry their rows (freshly trained quantizers) the live-cell
    set is computed on the driver and applied as a literal In filter —
    no distinct/semi-join jobs — and the filtered rows ride along so
    downstream dispatch probes stay collect-free. Persisted/attached
    tables (no carried rows) keep the DF semi-join path."""
    crows = carried_rows(coarse)
    frows = carried_rows(fine)
    if crows is None or frows is None:
        return _live_coarse(coarse, fine)
    live = {int(r["ccid"]) for r in frows}
    live_rows = [r for r in crows if int(r["cid"]) in live]
    if len(live_rows) == len(crows):
        return coarse  # every coarse cell is live — common case
    return CarriedFrame(
        coarse.filter(F.col("cid").isin(sorted(live))), live_rows
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
            _live_frame(coarse, fine),
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
    return _assign_cells_2level_topn_vecs(
        _spread(_as_double_vec(embeddings, emb_col)),
        coarse, fine, n_coarse, n_fine,
    )


def _assign_cells_2level_topn_vecs(
    vecs0: DataFrame,
    coarse: DataFrame,
    fine: DataFrame,
    n_coarse: int,
    n_fine: int,
) -> DataFrame:
    """``assign_cells_2level_topn`` on already-prepped/spread (vec_id,
    v) rows — the clustered sweeps hold the checkpointed training
    corpus and reuse it here instead of re-scanning/re-spreading."""
    vecs = (
        _assign_vecs_topn(
            vecs0,
            _live_frame(coarse, fine),
            n_coarse,
            carry=("v",),
        )
        .select("vec_id", F.col("cid").alias("ccid"), "v")
    )
    return _assign_fine(vecs, fine, n_fine)
