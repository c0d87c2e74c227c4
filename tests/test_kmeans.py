"""Distributed Lloyd's k-means and the trained-quantizer IVF path:
determinism, assignment sanity, probe-all exactness, and trained
extends."""

import pytest
from pyspark.sql import functions as F

from trignis_spark.operators import ann_index as ai
from trignis_spark.operators import kmeans as km
from trignis_spark.operators import similarity as sim
from trignis_spark.tables import load

SF = "/root/testdata/sf0.001"
QUERY_PRED = "vec_id % 100 = 0"


@pytest.fixture
def trained_index(spark):
    yield "ann_trained_t"
    for suffix in ("", "_ids", "_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS ann_trained_t{suffix}")


def _centroid_map(cdf):
    return {r["cid"]: tuple(round(x, 9) for x in r["cvec"])
            for r in cdf.collect()}


def test_training_is_deterministic_and_total(spark):
    emb = load(spark, SF, "embeddings")
    c1 = km.train_kmeans(emb, k=8, iters=3)
    c2 = km.train_kmeans(emb, k=8, iters=3)
    assert _centroid_map(c1) == _centroid_map(c2)
    assert set(_centroid_map(c1)) == set(range(8))

    # every vector lands in exactly one cluster
    assigned = km.assign_clusters(emb, c1)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()


def test_lloyd_rounds_do_not_increase_distortion(spark):
    emb = load(spark, SF, "embeddings")

    def distortion(centroids):
        vecs = km._as_double_vec(emb, "embedding")
        a = km.assign_clusters(emb, centroids).join(vecs, "vec_id").join(
            F.broadcast(centroids), "cid"
        )
        return a.select(
            F.sum(F.expr(km._SQDIST.format(a="v", b="cvec"))).alias("d")
        ).first()["d"]

    d1 = distortion(km.train_kmeans(emb, k=8, iters=1))
    d3 = distortion(km.train_kmeans(emb, k=8, iters=3))
    assert d3 <= d1 + 1e-9


def test_trained_probe_all_cells_equals_brute_force(spark, trained_index):
    emb = load(spark, SF, "embeddings")
    cents = km.train_kmeans(emb, k=8, iters=2)
    ai.build_ann_index(spark, emb, trained_index, centroids=cents)

    queries = emb.filter(F.expr(QUERY_PRED))
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ai.probe_ann_index(
            spark, trained_index, queries, k=10, nprobe=8
        ).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in sim.cosine_topk(emb, QUERY_PRED, k=10).collect()
    }
    assert got == want  # probing every cell scores every vector: exact


def test_trained_extend_assigns_through_stored_centroids(spark, trained_index):
    emb = load(spark, SF, "embeddings")
    first, rest = emb.filter("vec_id < 400"), emb.filter("vec_id >= 400")
    cents = km.train_kmeans(first, k=8, iters=2)
    ai.build_ann_index(spark, first, trained_index, centroids=cents)

    assert ai.extend_ann_index(spark, rest, trained_index) == rest.count()
    # post-extend, probe-all over the full corpus is still exact
    queries = emb.filter(F.expr(QUERY_PRED))
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ai.probe_ann_index(
            spark, trained_index, queries, k=5, nprobe=8
        ).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(emb, QUERY_PRED, k=5).collect()
    }
    assert got == want


def test_init_centroids_deterministic_under_duplicate_vec_ids(spark):
    """vec_id is documented as the embeddings key, but duplicates must
    not make initialization flaky: the seed sort compares the whole
    (vec_id, v) struct, so equal ids fall through to the embedding
    arrays — an arbitrary-looking but fully deterministic order
    (ADVICE r4 carry-over). Same duplicates, different partitionings,
    identical centroids."""
    rows = [
        (2, [float(i), 1.0]) for i in range(5)  # five vec_id=2 duplicates
    ] + [(1, [9.0, 9.0]), (3, [4.0, 4.0])]
    a = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(1)
    b = spark.createDataFrame(
        list(reversed(rows)), "vec_id long, embedding array<double>"
    ).repartition(7)

    got_a = [tuple(r) for r in km.init_centroids(a, k=4).orderBy("cid").collect()]
    got_b = [tuple(r) for r in km.init_centroids(b, k=4).orderBy("cid").collect()]
    assert got_a == got_b
    # the documented contract still holds on the unique ids: cid 0 is the
    # lowest vec_id's vector
    assert got_a[0][1] == [9.0, 9.0]
    # duplicates of vec_id=2 order by their arrays: [0,1] before [1,1]...
    assert [c[1] for c in got_a[1:]] == [[0.0, 1.0], [1.0, 1.0], [2.0, 1.0]]


def test_packed_assignment_matches_window_ranking_with_ties(spark):
    """The packed-projection assignment (array_min / slice(array_sort)
    over struct(d2, id)) must reproduce the ranked window form
    bit-for-bit, INCLUDING tie-breaks: duplicate vectors and duplicate
    centroids force exact d2 ties, where the contract is lowest id
    wins. Locks the equivalence the oracle replays rely on."""
    import random

    from pyspark.sql import Window

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(20)]
    # duplicates ⇒ exact distance ties between centroids and among rows
    rows = [(i, base[i % 20]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(j, base[j % 5]) for j in range(7)],  # cids 5,6 duplicate 0,1
        "cid int, cvec array<double>",
    )

    def window_reference(n):
        vecs = km._as_double_vec(emb, "embedding")
        scored = vecs.join(F.broadcast(cents)).withColumn(
            "d2", F.expr(km._SQDIST.format(a="v", b="cvec"))
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .select("vec_id", "cid")
        )

    for n in (1, 2, 3):
        got = {(r.vec_id, r.cid)
               for r in km.assign_clusters_topn(emb, cents, n).collect()}
        want = {(r.vec_id, r.cid) for r in window_reference(n).collect()}
        assert got == want and len(got) == 60 * n
    # ties land on the LOWEST cid (cids 5, 6 shadow 0, 1 exactly)
    one = km.assign_clusters(emb, cents)
    assert not {r.cid for r in one.collect()} & {5, 6}


def _tie_corpus(spark, dims=8, n=80):
    """Corpus engineered for assignment ties: duplicate vectors (exact
    zero-distance ties across centroids seeded from them) plus random
    rows."""
    import random

    rng = random.Random(13)
    rows = []
    for i in range(n):
        if i % 7 == 0 and i > 0:
            rows.append((i, list(rows[i - 1][1])))  # exact duplicate
        else:
            rows.append((i, [rng.uniform(-1, 1) for _ in range(dims)]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _force_arrow(val):
    import contextlib

    @contextlib.contextmanager
    def cm():
        orig = km.VECTORIZED_ASSIGN_MIN_SCORE
        km.VECTORIZED_ASSIGN_MIN_SCORE = val
        try:
            yield
        finally:
            km.VECTORIZED_ASSIGN_MIN_SCORE = orig

    return cm()


def test_arrow_assignment_matches_hof_flat(spark):
    """Round 8: the Arrow-vectorized assignment must be BIT-IDENTICAL
    to the ``_nearest_expr`` HOF projection — same ascending-component
    fold, same (d2, cid) tie-break — on a tie-laden corpus, for n=1
    and n>1, carry included."""
    emb = _tie_corpus(spark)
    cents = km.init_centroids(emb, 6)
    for n in (1, 3):
        with _force_arrow(10**9):  # force HOF
            hof = km.assign_clusters_topn(emb, cents, n)
            want = sorted((r.vec_id, r.cid) for r in hof.collect())
        with _force_arrow(0):  # force Arrow
            arr = km.assign_clusters_topn(emb, cents, n)
            got = sorted((r.vec_id, r.cid) for r in arr.collect())
        assert got == want and got


def test_arrow_assignment_matches_hof_fine(spark):
    """Same bit-exactness lock for the per-coarse-cell fine assignment,
    including the inner-join drop of vectors whose coarse cell has no
    fine centroids."""
    emb = _tie_corpus(spark)
    with _force_arrow(10**9):
        coarse, fine = km.train_kmeans_2level(emb, 3, 2, iters=1)
        coarse = coarse.localCheckpoint(eager=True)
        # drop one coarse cell's fine centroids to exercise the
        # inner-join parity
        fine = fine.filter("ccid <> 1").localCheckpoint(eager=True)
        want1 = sorted(
            (r.vec_id, r.ccid, r.fid)
            for r in km.assign_cells_2level_topn(
                emb, coarse, fine, 2, 2).collect()
        )
    with _force_arrow(0):
        got1 = sorted(
            (r.vec_id, r.ccid, r.fid)
            for r in km.assign_cells_2level_topn(
                emb, coarse, fine, 2, 2).collect()
        )
    assert got1 == want1 and got1


def test_arrow_training_matches_hof_training(spark):
    """Training through the Arrow assignment path must produce the
    exact centroids of the HOF path — every Lloyd round's assignment
    is bit-identical, so the decimal means are too."""
    emb = _tie_corpus(spark, dims=6, n=60)
    with _force_arrow(10**9):
        want = _centroid_map(km.train_kmeans(emb, 5, iters=2))
    with _force_arrow(0):
        got = _centroid_map(km.train_kmeans(emb, 5, iters=2))
    assert got == want and len(got) == 5


def test_rows_carried_round_matches_checkpointed_form(spark):
    """Round-11 training restructure: the driver-carried Lloyd round
    (`_update_rows`) must produce BIT-identical centroids to the
    pre-round-11 formulation (assignment against a checkpointed
    centroid frame, posexplode means, left-join coalesce merge)."""
    emb = load(spark, SF, "embeddings")
    vecs = km._spread(km._as_double_vec(emb, "embedding")).localCheckpoint(
        eager=True
    )
    rows = km._init_rows(vecs, 8)

    def legacy_round(vecs, centroids):
        assigned = km._assign_vecs_topn(vecs, centroids, 1, carry=("v",))
        comp = assigned.select("cid", F.posexplode("v").alias("pos", "x"))
        means = (
            km._means_cvec(comp.groupBy("cid", "pos"))
            .groupBy("cid")
            .agg(F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), "
                "s -> s.m)").alias("cvec"))
        )
        return (
            centroids.select("cid", F.col("cvec").alias("_old"))
            .join(means, "cid", "left")
            .select("cid", F.coalesce("cvec", "_old").alias("cvec"))
        )

    legacy = km._centroids_df(spark, rows).localCheckpoint(eager=True)
    carried = rows
    for _ in range(2):
        legacy = legacy_round(vecs, legacy).localCheckpoint(eager=True)
        carried = km._update_rows(vecs, carried)
    want = {int(r["cid"]): tuple(r["cvec"]) for r in legacy.collect()}
    got = {int(r["cid"]): tuple(r["cvec"]) for r in carried}
    assert got == want  # exact doubles, no rounding


def test_trained_frames_carry_rows_and_match_table(spark):
    """Public trainers return checkpointed CarriedFrames whose
    `local_rows` equal the frame's own rows (the carrier skips
    dispatch-probe collects — it must never drift from the frame)."""
    emb = load(spark, SF, "embeddings")
    cents = km.train_kmeans(emb, k=5, iters=2)
    assert isinstance(cents, km.CarriedFrame)
    rows = km.carried_rows(cents)
    assert rows is not None
    # a derived frame no longer carries rows (they describe the exact
    # contents of the frame they were attached to)
    assert km.carried_rows(cents.limit(3)) is None
    from_frame = {int(r["cid"]): tuple(r["cvec"]) for r in cents.collect()}
    from_rows = {int(r["cid"]): tuple(r["cvec"]) for r in rows}
    assert from_rows == from_frame


def test_literal_cents_assignment_matches_broadcast_frame(spark):
    """The SQL-literal packed-centroid path (round 12) assigns
    bit-identically to the broadcast-frame path it replaces, including
    nasty doubles (subnormals, -0.0, huge magnitudes) that exercise
    the shortest-repr -> parse round trip."""
    from pyspark.sql import Row

    vec_rows = [
        Row(vec_id=i, v=[float(x) for x in
                         (i * 0.1 - 2, -i * 1e-300, (i % 3) - 1.0,
                          1e308 / (i + 1))])
        for i in range(40)
    ]
    vecs = spark.createDataFrame(vec_rows, "vec_id long, v array<double>")
    cents = [
        Row(cid=0, cvec=[0.1 + 0.2, -0.0, 5e-324, 1e308]),
        Row(cid=1, cvec=[-1.5, 1 / 3, 2.0, 0.0]),
        Row(cid=2, cvec=[0.0, 0.0, -1e-300, 9e307]),
    ]
    lit_sql = km._cents_sql(cents, "cid")
    assert lit_sql is not None
    # literal path (what _assign_vecs_topn takes below the cap)
    got = km._assign_vecs_topn(vecs, None, 1, rows=cents)
    # broadcast-frame path, forced by a zero-size literal cap
    old_cap = km.LITERAL_CENTS_MAX
    km.LITERAL_CENTS_MAX = 0
    try:
        want = km._assign_vecs_topn(vecs, None, 1, rows=cents)
    finally:
        km.LITERAL_CENTS_MAX = old_cap
    assert {(r["vec_id"], r["cid"]) for r in got.collect()} == \
        {(r["vec_id"], r["cid"]) for r in want.collect()}
    # non-finite components must refuse the literal form
    bad = [Row(cid=0, cvec=[1.0, float("nan")])]
    assert km._cents_sql(bad, "cid") is None
