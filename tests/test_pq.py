"""Product quantization: code validity, training determinism, ADC
recall floor, and the broadcast/no-shuffle plan shape."""

from pyspark.sql import functions as F

from trignis_spark.operators import pq
from trignis_spark.operators import similarity as sim
from trignis_spark.plans import assert_no_cartesian_product
from trignis_spark.tables import load

SF = "/root/testdata/sf0.001"
M, K = 8, 16


def test_codes_are_dense_and_in_range(spark):
    emb = load(spark, SF, "embeddings")
    cb = pq.train_pq(emb, m=M, k=K, iters=2)
    codes = pq.encode_pq(emb, cb, M)
    n = emb.count()
    assert codes.count() == n * M  # one code per (vector, subspace)
    lo, hi = codes.agg(F.min("code"), F.max("code")).first()
    assert 0 <= lo and hi < K


def test_training_is_deterministic(spark):
    emb = load(spark, SF, "embeddings")
    a = {
        (r["sub"], r["cid"], tuple(r["cvec"]))
        for r in pq.train_pq(emb, m=2, k=4, iters=2).collect()
    }
    b = {
        (r["sub"], r["cid"], tuple(r["cvec"]))
        for r in pq.train_pq(emb, m=2, k=4, iters=2).collect()
    }
    assert a == b and len(a) == 2 * 4


def test_adc_recall_floor_vs_brute_force(spark):
    """ADC over m=8/k=16 codes (a 32x compression of the float corpus)
    must keep a meaningful share of the exact top-10 — measured 0.28 on
    the random-unit-vector corpus, the hard case; floor set with margin.
    In an IVF-PQ deployment ADC is the candidate ranker inside probed
    cells, not the final answer — exact re-ranking of the ADC top-c
    restores precision."""
    emb = load(spark, SF, "embeddings")
    cb = pq.train_pq(emb, m=M, k=K, iters=2)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(emb).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in pq.pq_topk(emb, cb, m=M).collect()
    }
    assert len(got & truth) / len(truth) >= 0.15


def test_adc_plan_broadcasts_lut_no_cartesian(spark):
    emb = load(spark, SF, "embeddings")
    cb = pq.train_pq(emb, m=2, k=4, iters=1)
    assert_no_cartesian_product(pq.pq_topk(emb, cb, m=2))


def test_ivfpq_with_full_shortlist_equals_exact_cell_search(spark):
    """Degenerate-equivalence invariant: with an unbounded shortlist the
    ADC stage only orders candidates, the exact re-rank sees the whole
    cell, and the cascade must equal the exact IVF search of the same
    cell (ivf_topk, nprobe=1) pair-for-pair."""
    emb = load(spark, SF, "embeddings")
    cb = pq.train_pq(emb, m=2, k=4, iters=1)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq.ivfpq_topk(emb, cb, m=2, shortlist=10**6).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in sim.ivf_topk(emb).collect()
    }
    assert got == want and got


def test_ivfpq_rerank_recovers_adc_ordering_loss(spark):
    """The re-rank stage must not do worse than raw ADC against the
    exact in-cell answer: agreement with ivf_topk (the exact search of
    the same candidate set) is at least as high after exact re-ranking
    of the top-30 as for the pure-ADC top-10."""
    emb = load(spark, SF, "embeddings")
    cb = pq.train_pq(emb, m=M, k=K, iters=2)
    exact_cell = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ivf_topk(emb).collect()
    }
    cascade = {
        (r["query_id"], r["neighbor_id"])
        for r in pq.ivfpq_topk(emb, cb, m=M, shortlist=30).collect()
    }
    adc10 = {
        (r["query_id"], r["neighbor_id"])
        for r in pq.ivfpq_topk(emb, cb, m=M, shortlist=10).collect()
    }
    assert len(cascade & exact_cell) >= len(adc10 & exact_cell)
    assert len(cascade & exact_cell) / len(exact_cell) >= 0.5


def _force_encode(val):
    import contextlib

    @contextlib.contextmanager
    def cm():
        orig = pq.VECTORIZED_ENCODE_MIN_SCORE
        pq.VECTORIZED_ENCODE_MIN_SCORE = val
        try:
            yield
        finally:
            pq.VECTORIZED_ENCODE_MIN_SCORE = orig

    return cm()


def _tie_corpus(spark):
    # duplicate vectors seed duplicate centroids (first-k init), so
    # assignments hit exact d2 ties that only the lowest-cid rule breaks
    rows = [
        (1, [1.0, 0.0, 2.0, -1.0]),
        (2, [1.0, 0.0, 2.0, -1.0]),
        (3, [0.0, 1.0, -2.0, 1.0]),
        (4, [0.5, 0.5, 0.0, 0.0]),
        (5, [-1.0, 2.0, 1.0, 1.0]),
        (6, [1.0, 0.0, 2.0, -1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_arrow_encode_matches_hof(spark):
    """Round 8: past ``VECTORIZED_ENCODE_MIN_SCORE`` the PQ encode
    dispatches to the Arrow twin — codes (and codebooks trained through
    the dispatched assignment) must match the HOF projection
    BIT-IDENTICALLY on a tie-laden corpus."""
    emb = _tie_corpus(spark)
    with _force_encode(10**9):  # force HOF
        cb_h = pq.train_pq(emb, m=2, k=3, iters=2)
        want_cb = sorted(
            (r.sub, r.cid, tuple(r.cvec)) for r in cb_h.collect()
        )
        want = sorted(
            (r.vec_id, r.sub, r.code)
            for r in pq.encode_pq(emb, cb_h, m=2).collect()
        )
    with _force_encode(0):  # force Arrow
        cb_a = pq.train_pq(emb, m=2, k=3, iters=2)
        got_cb = sorted(
            (r.sub, r.cid, tuple(r.cvec)) for r in cb_a.collect()
        )
        got = sorted(
            (r.vec_id, r.sub, r.code)
            for r in pq.encode_pq(emb, cb_a, m=2).collect()
        )
    assert got_cb == want_cb
    assert got == want and got


def test_arrow_encode_matches_hof_wide(spark):
    """Same lock for the wide one-row-per-vector codes layout
    (``ivfpq_index._wide_codes``): the numpy fold over slice views must
    reproduce the per-candidate slice expression's codes exactly,
    bucket carried through."""
    from trignis_spark.operators import ivfpq_index as ipq

    emb = _tie_corpus(spark)
    cb = pq.train_pq(emb, m=2, k=3, iters=1)
    rows = ipq._bucketed(emb, 4)
    with _force_encode(10**9):
        want = sorted(
            (r.vec_id, tuple(r.codes), r.bucket)
            for r in ipq._wide_codes(rows, cb, 2).collect()
        )
    with _force_encode(0):
        got = sorted(
            (r.vec_id, tuple(r.codes), r.bucket)
            for r in ipq._wide_codes(rows, cb, 2).collect()
        )
    assert got == want and got
