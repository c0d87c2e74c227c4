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
