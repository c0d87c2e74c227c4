"""Operator-level correctness on controlled synthetic data: the dedup
detectors find a planted near-duplicate, the IVF path trades recall for
candidate reduction, snapshot-diff produces exact I/U/D + masks."""

import pytest
from pyspark.sql import functions as F

from trignis_spark.operators import changefeed as cf
from trignis_spark.operators import dedup as dd
from trignis_spark.operators import similarity as sim


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")  # one token differs
    other = "completely different content about spark planning and shuffles here"
    rows = [(1, base), (2, near), (3, other)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_finds_planted_near_dup(spark):
    pairs = dd.jaccard_pairs(dd.shingle_table(_docs(spark)), threshold=0.5).collect()
    assert [(p["d1"], p["d2"]) for p in pairs] == [(1, 2)]
    assert 0.5 <= pairs[0]["jaccard"] < 1.0


def test_minhash_lsh_finds_planted_near_dup(spark):
    pairs = dd.minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()
    assert [(p["d1"], p["d2"]) for p in pairs] == [(1, 2)]


def test_simhash_banding_equals_cross_join(spark):
    docs = _docs(spark)
    banded = {
        (r["d1"], r["d2"], r["hamming"])
        for r in dd.simhash_pairs(docs, max_hamming=7).collect()
    }
    sh = dd.simhash_table(docs)
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r["d1"], r["d2"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= 7)
        .collect()
    }
    assert banded == brute  # lossless banding guarantee


def test_exact_duplicates_counts_copies(spark):
    docs = spark.createDataFrame(
        [(1, "same  text"), (2, "same text"), (3, "unique")],
        "doc_id long, text string",
    )
    rows = {r["canonical_doc_id"]: r["copies"]
            for r in dd.exact_duplicates(docs).collect()}
    # whitespace-normalized: docs 1 and 2 collapse
    assert rows == {1: 2, 3: 1}


def test_ivf_recall_vs_brute(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], 0) for i in range(200)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    brute = sim.cosine_topk(emb, query_pred="vec_id % 100 = 0", k=5)
    ivf = sim.ivf_topk(emb, query_pred="vec_id % 100 = 0", k=5, n_buckets=4)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    v = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    assert len(v) > 0
    # IVF is approximate: it returns a subset-quality answer, bounded work
    recall = len(b & v) / len(b)
    assert recall >= 0.2  # same-bucket probe keeps a useful fraction


def test_snapshot_diff_exact_iud(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "pk long, status string, amount double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0)],
        "pk long, status string, amount double",
    )
    out = {
        r["pk"]: r
        for r in cf.snapshot_diff(
            old, new, key_cols=("pk",), tracked_cols=("status", "amount")
        ).collect()
    }
    assert set(out) == {1, 2, 4}  # 3 unchanged → dropped
    assert out[1]["operation"] == "D" and out[1]["status"] is None
    assert out[2]["operation"] == "U" and out[2]["changed"] == ["amount"]
    assert out[2]["amount"] == 25.0
    assert out[4]["operation"] == "I" and out[4]["changed"] is None


def test_cluster_near_duplicates_chain(spark):
    """Multi-hop component: pairs (1-2), (2-3), (3-4) form one cluster
    labeled by the minimum id; isolated docs label themselves."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "d1 long, d2 long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.cluster_near_duplicates(docs, pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_frame_sample_fans_out_and_samples(spark):
    from trignis_spark.operators.multimodal import attach_payload, frame_sample

    docs = spark.createDataFrame(
        [(1, "abcdefghij", "x", "s", 10)],  # 10 chars, frame=4 → frames 0,1,2
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = frame_sample(attach_payload(docs), frame_chars=4, every=2).collect()
    got = {(r["frame_index"], r["frame_len"], r["frame_checksum"]) for r in rows}
    # frames: 0='abcd', 1='efgh', 2='ij'; sampled every 2nd → 0 and 2
    assert got == {
        (0, 4, sum(map(ord, "abcd"))),
        (2, 2, sum(map(ord, "ij"))),
    }


def test_resize_stub_strides_bytes(spark):
    from trignis_spark.operators.multimodal import attach_payload, resize_stub

    docs = spark.createDataFrame(
        [(1, "abcdefgh", "x", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = resize_stub(attach_payload(docs), stride=4).collect()[0]
    assert bytes(r["payload"]) == b"ae"
    assert (r["orig_len"], r["resized_len"]) == (8, 2)


def test_scrub_pii_counts_and_stages(spark):
    from trignis_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b-c99@ex-1.org then 10.0.0.255 and plain 12345 end")],
        "id long, note string",
    )
    r = scrub_pii(df, text_col="note").collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_number"]) == (1, 1, 1)
    # the email's and IP's digits are redacted before the number pass
    assert r["scrubbed"] == "mail <EMAIL> then <IP> and plain <NUM> end"


def test_scrub_pii_no_matches_passthrough(spark):
    from trignis_spark.operators.text import scrub_pii

    df = spark.createDataFrame([(1, "no pii here at all")], "id long, note string")
    r = scrub_pii(df, text_col="note").collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_number"]) == (0, 0, 0)
    assert r["scrubbed"] == "no pii here at all"


def test_duplicated_spans_finds_shared_8gram(spark):
    from trignis_spark.operators.text import duplicated_spans

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),
            (2, "head " + shared),
            (3, "totally different words with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    rows = duplicated_spans(docs, span_words=8, min_docs=2).collect()
    spans = {r["span"]: (r["tf"], r["df"], r["first_doc"]) for r in rows}
    assert spans == {shared: (2, 2, 1)}


def test_incremental_pairs_matches_batch_against_corpus_only(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    docs = spark.createDataFrame(
        [
            (1, base),  # corpus
            (2, base),  # corpus twin of 1 — must NOT be reported (corpus-corpus)
            (10, near),  # batch: near-dup of corpus docs
            (11, "unrelated text about window functions and shuffle planning"),
        ],
        "doc_id long, text string",
    )
    sh = dd.shingle_table(docs)
    batch = sh.filter(F.col("doc_id") >= 10)
    corpus = sh.filter(F.col("doc_id") < 10)
    got = {
        (r["batch_doc"], r["corpus_doc"])
        for r in dd.incremental_pairs(corpus, batch, threshold=0.5).collect()
    }
    assert got == {(10, 1), (10, 2)}


def test_banded_near_dup_finds_planted_pairs(spark):
    # planted clusters: base vector + tiny noise => cos > 0.99; fillers
    # are random => cos ~ 0. The banded+Hamming form must find every
    # planted pair (tight pairs collide in essentially all bands) and
    # report only exact-verified pairs.
    import random

    rng = random.Random(11)
    rows = []
    for c in range(5):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for k in range(3):
            rows.append(
                (c * 10 + k,
                 [x + rng.uniform(-0.01, 0.01) for x in base])
            )
    for i in range(200):
        rows.append((1000 + i, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["d1"], r["d2"]) for r in
           sim.cosine_near_dup_pairs_banded(emb, threshold=0.9).collect()}
    want = {(c * 10 + a, c * 10 + b)
            for c in range(5) for a in range(3) for b in range(3) if a < b}
    assert got == want


def test_banded_near_dup_matches_unbanded_on_tight_pairs(spark):
    # same planted corpus: the banded form's exact verification must
    # agree with the saturating 4x4 layout on every pair both block
    import random

    rng = random.Random(13)
    rows = []
    for c in range(4):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for k in range(2):
            rows.append(
                (c * 10 + k,
                 [x + rng.uniform(-0.005, 0.005) for x in base])
            )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    banded = {(r["d1"], r["d2"], round(r["cos"], 9)) for r in
              sim.cosine_near_dup_pairs_banded(emb, threshold=0.9).collect()}
    loose = {(r["d1"], r["d2"], round(r["cos"], 9)) for r in
             sim.cosine_near_dup_pairs(emb, threshold=0.9).collect()}
    assert banded == loose and len(banded) == 4


def test_incremental_pairs_prefix_filter_lossless(spark):
    # the prefix-filtered batch-vs-corpus probe must return exactly the
    # direct probe's pairs (prefix filtering is lossless for J >= t)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc{i % 4}")
         for i in range(12)]
        + [(100 + i, f"totally different words here number {i}")
           for i in range(6)],
        "doc_id long, text string",
    )
    sh = dd.shingle_table(docs)
    from pyspark.sql import functions as SF
    batch = sh.filter(SF.expr("doc_id % 3 = 0"))
    corpus = sh.filter(SF.expr("doc_id % 3 <> 0"))
    for t in (0.5, 0.8):
        direct = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
                  for r in dd.incremental_pairs(corpus, batch, t).collect()}
        pref = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
                for r in dd.incremental_pairs(
                    corpus, batch, t, prefix_filter=True).collect()}
        assert direct == pref
    assert len(direct) > 0


def test_clustered_near_dup_finds_planted_clusters(spark):
    # trained-cell blocking must find loose-threshold (cos ~ 0.5+)
    # planted cluster pairs that sign-band LSH misses at this regime
    import random

    rng = random.Random(17)
    rows = []
    for c in range(4):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for k in range(4):
            rows.append(
                (c * 10 + k,
                 [x + rng.uniform(-0.4, 0.4) for x in base])
            )
    for i in range(100):
        rows.append((1000 + i, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.d1, r.d2) for r in
           sim.cosine_near_dup_pairs_clustered(
               emb, threshold=0.5, k=8, assign_n=2).collect()}
    # ground truth: brute-force pairs at the same threshold
    from pyspark.sql import functions as SF
    base = emb.selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    ).withColumn("n2", SF.expr(sim.NORM2.format(a="v")))
    a, b = base.alias("a"), base.alias("b")
    truth = {
        (r.d1, r.d2)
        for r in a.join(b, SF.col("a.vec_id") < SF.col("b.vec_id"))
        .select(
            SF.col("a.vec_id").alias("d1"), SF.col("b.vec_id").alias("d2"),
            (SF.expr(sim.DOT.format(a="a.v", b="b.v"))
             / SF.sqrt(SF.col("a.n2") * SF.col("b.n2"))).alias("cos"))
        .filter(SF.col("cos") >= 0.5).collect()
    }
    assert truth, "fixture must plant loose-threshold pairs"
    # every reported pair is true (exact verification) ...
    assert got <= truth
    # ... and cluster blocking recovers a solid majority of them
    assert len(got) / len(truth) >= 0.6


def test_jaccard_prefix_float_boundary_pair_not_lost(spark):
    # regression (caught by the sf0.1 oracle gate): |A|=5, |B|=4 with
    # J = 4/5 = exactly the 0.8 threshold. In floats (1-0.8)*5 is
    # 0.9999999999999998, so an un-epsiloned floor stores a 1-shingle
    # prefix for A instead of 2 — and when A's rarest shingle is its
    # unique one, the prefixes are disjoint and the pair silently
    # vanishes. The epsiloned prefix must keep it.
    rows = [(1, 100)] + [(1, s) for s in (1, 2, 3, 4)] \
        + [(2, s) for s in (1, 2, 3, 4)]
    sh = spark.createDataFrame(rows, "doc_id long, shingle long")
    got = {(r.d1, r.d2, round(r.jaccard, 9))
           for r in dd.jaccard_pairs(sh, threshold=0.8).collect()}
    assert got == {(1, 2, 0.8)}


def test_jaccard_max_df_with_prefix_filter_as_lossless_as_max_df_alone(spark):
    # regression (ADVICE r5): with max_df set, the prefix length and the
    # symmetric length filter must come from the UNFILTERED per-doc
    # shingle counts. Construct the adversarial shape: docs 1 and 2
    # share one rare shingle plus 20 stop-shingles; after the stop set
    # is dropped their filtered sizes are 1 vs 10, which fails the
    # (wrongly) filtered-size length filter even though full-set
    # J = 21/30 = 0.7 >= t.
    stops = list(range(1, 21))  # df = 10 > max_df
    rows = (
        [(1, 1000)] + [(1, s) for s in stops]
        + [(2, 1000)] + [(2, 1000 + i) for i in range(1, 10)]
        + [(2, s) for s in stops]
        + [(d, s) for d in range(3, 11) for s in stops]
    )
    sh = spark.createDataFrame(rows, "doc_id long, shingle long")
    for t in (0.5, 0.7):
        plain = {(r.d1, r.d2, round(r.jaccard, 9)) for r in
                 dd.jaccard_pairs(sh, t, max_df=5,
                                  prefix_filter=False).collect()}
        pref = {(r.d1, r.d2, round(r.jaccard, 9)) for r in
                dd.jaccard_pairs(sh, t, max_df=5,
                                 prefix_filter=True).collect()}
        assert pref == plain
    assert (1, 2, round(21 / 30, 9)) in pref


def test_2level_clustered_near_dup_recall_at_least_flat(spark):
    # the hierarchical twin must not trade recall for its cheaper
    # assignment: on the planted-cluster corpus its pair set is (a)
    # exact-verified (subset of brute-force truth) and (b) at least as
    # complete as the flat form at the same total cell count — top-2
    # multi-assign at both levels gives 4 blocking slots vs flat's 2
    import random

    rng = random.Random(17)
    rows = []
    for c in range(4):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for k in range(4):
            rows.append(
                (c * 10 + k,
                 [x + rng.uniform(-0.4, 0.4) for x in base])
            )
    for i in range(100):
        rows.append((1000 + i, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flat = {(r.d1, r.d2) for r in
            sim.cosine_near_dup_pairs_clustered(
                emb, threshold=0.5, k=8, assign_n=2).collect()}
    two = {(r.d1, r.d2) for r in
           sim.cosine_near_dup_pairs_clustered_2level(
               emb, threshold=0.5, k_coarse=2, k_fine=4,
               assign_n=2).collect()}
    base = emb.selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    ).withColumn("n2", F.expr(sim.NORM2.format(a="v")))
    a, b = base.alias("a"), base.alias("b")
    truth = {
        (r.d1, r.d2)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("d1"), F.col("b.vec_id").alias("d2"),
            (F.expr(sim.DOT.format(a="a.v", b="b.v"))
             / F.sqrt(F.col("a.n2") * F.col("b.n2"))).alias("cos"))
        .filter(F.col("cos") >= 0.5).collect()
    }
    assert two <= truth
    assert len(two) >= len(flat)
    assert len(two) / len(truth) >= 0.6


def test_2level_assignment_survives_memberless_coarse_cell(spark):
    """A coarse cell can end training with no members (so no fine
    centroids), yet a NEW vector can still be nearest to it. The
    2-level assignment must score only coarse cells that have fine
    centroids — never silently drop the vector (an index build/extend
    routed through a dead cell would lose it unsearchably)."""
    from trignis_spark.operators import kmeans as km

    coarse = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])],
        "cid int, cvec array<double>",
    )
    # cell 1 is dead: no fine centroids
    fine = spark.createDataFrame(
        [(0, 0, [0.0, 0.0]), (0, 1, [1.0, 1.0])],
        "ccid int, fid int, cvec array<double>",
    )
    emb = spark.createDataFrame(
        [(7, [9.5, 9.5]), (8, [0.1, 0.1])],
        "vec_id long, embedding array<float>",
    )
    asg = km.assign_clusters_2level(emb, coarse, fine, k_fine=2)
    got = {(r.vec_id, r.cid) for r in asg.collect()}
    # vec 7 (nearest the dead cell) lands in live cell 0's nearest fine
    # cell (fid 1 at [1,1]) instead of vanishing
    assert got == {(7, 1), (8, 0)}

    slots = km.assign_cells_2level_topn(
        emb, coarse, fine, n_coarse=2, n_fine=2
    )
    rows = slots.collect()
    assert {r.vec_id for r in rows} == {7, 8}
    assert all(r.ccid == 0 for r in rows)  # only live cells block


def test_auto_band_layout_scales_with_corpus():
    from trignis_spark.operators.similarity import auto_band_layout

    nb_s, bb_s = auto_band_layout(200_000)
    nb_l, bb_l = auto_band_layout(2_000_000)
    assert (nb_s, bb_s) == (16, 12)  # the classic layout, unchanged
    assert bb_l > bb_s  # patterns grow with the corpus
    assert nb_l >= nb_s  # recall estimate held by more bands
    assert auto_band_layout(500) == (16, 12)  # small corpora: floor


def test_band_starts_distinct_and_legacy_compatible():
    """ADVICE r6: at the old 32-band cap, band 31 read exactly band 0's
    bits (start 4·31 ≡ 0 mod 62) — one wasted band. Starts must be
    pairwise distinct (distinct starts ⇒ distinct stride-5 bit sets)
    while leaving every pinned registry layout (≤ 31 bands at 62 bits)
    byte-identical to the legacy 4·b sequence."""
    from trignis_spark.operators.similarity import (
        band_bit_indices, band_starts,
    )

    assert band_starts(16, 62) == [4 * b for b in range(16)]
    assert band_starts(31, 62) == [(4 * b) % 62 for b in range(31)]
    for n, bits in ((32, 62), (62, 62), (95, 124), (124, 124)):
        s = band_starts(n, bits)
        assert len(set(s)) == n
        sets = {frozenset(band_bit_indices(st, 12, bits)) for st in s}
        assert len(sets) == n  # no two bands read the same bit set
    with pytest.raises(ValueError):
        band_starts(63, 62)


def test_auto_band_layout_holds_occupancy_across_decades():
    """VERDICT r6 #2: the fixed 20/32 caps re-saturated buckets at
    ~67 M vectors. Caps now derive from the signature width — with the
    wide signature (the default above WIDE_SIG_MIN anyway) occupancy
    stays ≤ TARGET_BAND_OCC and the independent-band recall estimate
    holds through N = 10⁹, analytically."""
    import math

    from trignis_spark.operators.similarity import (
        BAND_RECALL_TARGET, TARGET_BAND_OCC, WIDE_SIG_MIN,
        auto_band_layout, band_starts,
    )

    p = 1.0 - math.acos(0.9) / math.pi
    for exp in range(5, 10):  # 10^5 .. 10^9
        n = 10 ** exp
        wide = n > WIDE_SIG_MIN
        nb, bb = auto_band_layout(n, 0.9, wide=wide)
        assert n / 2 ** bb <= TARGET_BAND_OCC
        assert 1.0 - (1.0 - p ** bb) ** nb >= BAND_RECALL_TARGET - 1e-9
        # and the layout is realizable: that many distinct band starts
        assert len(band_starts(nb, 62 * (2 if wide else 1))) == nb


def test_auto_band_layout_warns_when_caps_bind():
    import warnings

    from trignis_spark.operators.similarity import auto_band_layout

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        nb, bb = auto_band_layout(10 ** 9, 0.9, wide=False)  # narrow!
    assert bb <= 62 and nb <= 62
    assert any("band starts" in str(x.message) for x in w)


def test_explicit_hamming_max_pins_narrow_signature(spark):
    """ADVICE r6 (medium): an explicit hamming_max calibrated for the
    62-bit signature must not be silently compared against the wide
    124-bit Hamming sum when the corpus crosses WIDE_SIG_MIN — wide
    auto-enablement is suppressed unless wide is also explicit."""
    import random

    rng = random.Random(29)
    rows = [(0, [rng.uniform(-1, 1) for _ in range(64)])]
    rows.append((1, [x + 0.001 for x in rows[0][1]]))
    for i in range(60):
        rows.append((10 + i, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    orig = sim.WIDE_SIG_MIN
    sim.WIDE_SIG_MIN = 1  # corpus "crosses" the wide bound
    try:
        got = {(r.d1, r.d2) for r in sim.cosine_near_dup_pairs_banded(
            emb, threshold=0.9, hamming_max=18).collect()}
    finally:
        sim.WIDE_SIG_MIN = orig
    # with wide auto-enabled the 18-bit cutoff would reject even the
    # planted copy (~36 differing bits of 124 at the threshold);
    # pinning narrow keeps it
    assert (0, 1) in got


def test_verify_broadcast_gate_is_byte_budgeted(spark):
    """VERDICT r6 #1: the exact-verify broadcast gate must scale with
    vector width — the row ceiling a 768-dim corpus gets is ~11× lower
    than a 64-dim one, and a corpus past its width's ceiling takes the
    shuffle path (no broadcast in the verify plan)."""
    r64 = sim._verify_broadcast_rows(64)
    r768 = sim._verify_broadcast_rows(768)
    r4096 = sim._verify_broadcast_rows(4096)
    assert r64 > 9 * r768 > 0 and r768 > 4 * r4096 > 0
    # 64-dim keeps the previously measured ~1M-row behavior
    assert 900_000 <= r64 <= 1_000_000
    # a 1M-vector 768-dim corpus (~6 GB) must NOT broadcast
    assert 1_000_000 > sim.VERIFY_BROADCAST_BYTES // (768 * 8)

    emb = spark.range(0, 50).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 768), i -> CAST(id + i AS FLOAT)) "
        "AS embedding",
    )
    base = sim._prep(emb)
    cand = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
    orig = sim.VERIFY_BROADCAST_BYTES
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # kill Catalyst's own stats-driven broadcast so the plan shows the
    # GATE's decision (the fixture corpus is tiny either way)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sim.VERIFY_BROADCAST_BYTES = 768 * 8 * 10  # ceiling ~= 9 rows < 50
    try:
        plan = sim._verify_pairs(cand, base, 0.5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # width forced shuffle
        sim.VERIFY_BROADCAST_BYTES = orig
        plan = sim._verify_pairs(cand, base, 0.5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # 50 rows fit the budget
    finally:
        sim.VERIFY_BROADCAST_BYTES = orig
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_clustered_capped_bounds_candidates_and_matches_full_sweep(spark):
    """The bounded sweep (VERDICT r6 #3): with a cap larger than any
    cell it must equal the full two-level sweep exactly; with a small
    cap it returns a deterministic subset (every pair still
    exact-verified)."""
    import random

    rng = random.Random(17)
    rows = []
    for c in range(4):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for k in range(4):
            rows.append(
                (c * 10 + k,
                 [x + rng.uniform(-0.4, 0.4) for x in base])
            )
    for i in range(100):
        rows.append((1000 + i, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(threshold=0.5, k_coarse=2, k_fine=4, assign_n=2)
    full = {(r.d1, r.d2, round(r.cos, 9)) for r in
            sim.cosine_near_dup_pairs_clustered_2level(
                emb, **kw).collect()}
    wide_cap = {(r.d1, r.d2, round(r.cos, 9)) for r in
                sim.cosine_near_dup_pairs_clustered_capped(
                    emb, cap_m=500, **kw).collect()}
    tight = {(r.d1, r.d2, round(r.cos, 9)) for r in
             sim.cosine_near_dup_pairs_clustered_capped(
                 emb, cap_m=1, **kw).collect()}
    assert wide_cap == full and full
    assert tight <= full and tight


def test_clustered_capped_query_chunking_is_invisible(spark):
    """Mega-cell parallelism must not change results: forcing every
    cell to split into many query chunks (CELL_TASK_QUERIES=7) returns
    exactly the single-chunk pair set — each vector's top-m is ranked
    against ALL cell-mates regardless of chunking."""
    import random

    rng = random.Random(31)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(threshold=0.2, k_coarse=2, k_fine=2, assign_n=2, cap_m=3)
    whole = {(r.d1, r.d2, round(r.cos, 9)) for r in
             sim.cosine_near_dup_pairs_clustered_capped(
                 emb, **kw).collect()}
    orig = sim.CELL_TASK_QUERIES
    sim.CELL_TASK_QUERIES = 7
    try:
        split = {(r.d1, r.d2, round(r.cos, 9)) for r in
                 sim.cosine_near_dup_pairs_clustered_capped(
                     emb, **kw).collect()}
    finally:
        sim.CELL_TASK_QUERIES = orig
    assert split == whole and whole


def test_flat_clustered_dispatches_to_2level_past_corpus_bound(spark):
    """VERDICT r6 #4: the flat entry point owns the >FLAT_CLUSTER_MAX
    decision — above the bound it trains hierarchically (⌈√k⌉ × ⌈√k⌉)
    with the same output contract, bit-identical to calling the
    two-level form directly."""
    import random

    rng = random.Random(17)
    rows = []
    for c in range(4):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for k in range(4):
            rows.append(
                (c * 10 + k,
                 [x + rng.uniform(-0.4, 0.4) for x in base])
            )
    for i in range(100):
        rows.append((1000 + i, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    orig = sim.FLAT_CLUSTER_MAX
    sim.FLAT_CLUSTER_MAX = 10
    try:
        via_flat = {(r.d1, r.d2, round(r.cos, 9)) for r in
                    sim.cosine_near_dup_pairs_clustered(
                        emb, threshold=0.5, k=16, assign_n=2).collect()}
    finally:
        sim.FLAT_CLUSTER_MAX = orig
    direct = {(r.d1, r.d2, round(r.cos, 9)) for r in
              sim.cosine_near_dup_pairs_clustered_2level(
                  emb, threshold=0.5, k_coarse=4, k_fine=4,
                  assign_n=2).collect()}
    assert via_flat == direct and direct


def test_wide_signature_banded_finds_planted_pairs(spark):
    """The 124-bit wide prefilter (auto above WIDE_SIG_MIN, forced here)
    must keep every planted tight pair while pruning at double the
    signature width — same planted-corpus contract as the narrow
    form."""
    import random

    rng = random.Random(23)
    rows = []
    for c in range(5):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for k in range(3):
            rows.append(
                (c * 10 + k,
                 [x + rng.uniform(-0.005, 0.005) for x in base])
            )
    for i in range(300):
        rows.append((1000 + i, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["d1"], r["d2"]) for r in
           sim.cosine_near_dup_pairs_banded(
               emb, threshold=0.9, wide=True).collect()}
    want = {(c * 10 + a, c * 10 + b)
            for c in range(5) for a in range(3) for b in range(3) if a < b}
    assert got == want


def test_band_values_expr_matches_reference(spark):
    """The HOF band-value expression (one transform over a literal
    index array — the form that survives janino's 64 KB method limit
    at decade-4 layouts like 43×19) must compute bit-identical bv to
    the definitional per-band shift/mask sum over hand-set signature
    words, narrow and wide."""
    import random

    from trignis_spark.operators.similarity import (
        band_bit_indices, band_starts, band_values_expr,
    )

    rng = random.Random(7)
    rows = [
        (i, rng.getrandbits(62), rng.getrandbits(62)) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, sig long, sig2 long")
    for n_bands, band_bits, wide in ((16, 12, False), (43, 19, True),
                                     (95, 24, True)):
        total = 124 if wide else 62
        got = {
            r["vec_id"]: r["bvs"]
            for r in df.select(
                "vec_id",
                F.expr(
                    band_values_expr(n_bands, band_bits, total,
                                     wide=wide)
                ).alias("bvs"),
            ).collect()
        }
        starts = band_starts(n_bands, total)
        for vid, sig, sig2 in rows:
            want = [
                sum(
                    (((sig if idx < 62 else sig2) >> (idx % 62)) & 1)
                    << j
                    for j, idx in enumerate(
                        band_bit_indices(st, band_bits, total)
                    )
                )
                for st in starts
            ]
            assert got[vid] == want, (n_bands, band_bits, wide, vid)


def test_clustered_capped_candidate_blocking_is_invisible(spark):
    """Round 8 (VERDICT r7 #2): splitting the CANDIDATE side of the
    within-cell scoring (CELL_TASK_CANDS) must not change results —
    block-local top-m sets merge associatively to the cell-global
    top-m, so the pair set and cosines are bit-identical to the
    unsplit run even when both axes split at once."""
    import random

    rng = random.Random(47)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(150)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(threshold=0.2, k_coarse=2, k_fine=2, assign_n=2, cap_m=3)
    whole = {(r.d1, r.d2, r.cos) for r in
             sim.cosine_near_dup_pairs_clustered_capped(
                 emb, **kw).collect()}
    oq, oc = sim.CELL_TASK_QUERIES, sim.CELL_TASK_CANDS
    sim.CELL_TASK_QUERIES, sim.CELL_TASK_CANDS = 11, 7
    try:
        split = {(r.d1, r.d2, r.cos) for r in
                 sim.cosine_near_dup_pairs_clustered_capped(
                     emb, **kw).collect()}
    finally:
        sim.CELL_TASK_QUERIES, sim.CELL_TASK_CANDS = oq, oc
    assert split == whole and whole


def test_clustered_capped_group_rows_bounded(spark):
    """The per-task memory bound (VERDICT r7 #2): every Arrow group the
    capped sweep's grouped-map receives holds at most
    CELL_TASK_QUERIES + CELL_TASK_CANDS rows — so a task's vector
    payload is ≤ (Q + C) × dims × 8 bytes no matter how skewed the
    cells are. Checked against a synthetic mega-cell via the chunk
    assignment itself."""
    # one giant cell: every vector shares (ccid, fid) = (0, 0)
    slots = spark.range(0, 400).selectExpr(
        "CAST(0 AS INT) AS ccid", "CAST(0 AS INT) AS fid",
        "id AS vec_id", "array(CAST(id AS DOUBLE)) AS v",
        "CAST(1.0 AS DOUBLE) AS n2",
    )
    oq, oc = sim.CELL_TASK_QUERIES, sim.CELL_TASK_CANDS
    sim.CELL_TASK_QUERIES, sim.CELL_TASK_CANDS = 32, 48
    try:
        chunked = sim._chunk_slots(slots)
        sizes = chunked.groupBy(
            "ccid", "fid", "_qchunk", "_cchunk"
        ).count().agg(F.max("count")).first()[0]
        assert sizes <= 32 + 48
        # and every (query, candidate) pair is covered exactly once
        pairs = chunked.filter("_is_q").alias("q").join(
            chunked.filter("_is_c").alias("c"),
            (F.col("q._qchunk") == F.col("c._qchunk"))
            & (F.col("q._cchunk") == F.col("c._cchunk")),
        ).groupBy(
            F.col("q.vec_id").alias("qv"), F.col("c.vec_id").alias("cv")
        ).count()
        assert pairs.filter("count != 1").count() == 0
        assert pairs.count() == 400 * 400
    finally:
        sim.CELL_TASK_QUERIES, sim.CELL_TASK_CANDS = oq, oc


def test_similarity_n_vectors_hint_skips_count(spark):
    """VERDICT r7 #7: the auto-sizing entry points accept an
    ``n_vectors`` hint so JDBC/stream-backed frames are not scanned
    just to size a layout — with the hint supplied, ``count()`` must
    never be called on the input."""
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, -1.0, 0.5]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )

    def boom():
        raise AssertionError("count() called despite n_vectors hint")

    emb.count = boom  # shadow the bound method on this instance
    sim.cosine_near_dup_pairs_banded(emb, 0.9, n_vectors=30)
    sim.cosine_near_dup_pairs_clustered(emb, 0.4, k=None, n_vectors=30)
    sim.cosine_near_dup_pairs_clustered_2level(
        emb, 0.4, k_coarse=None, k_fine=None, n_vectors=30)
    sim.cosine_near_dup_pairs_clustered_capped(emb, 0.4, n_vectors=30)
    # and the dispatch path threads the hint through
    sim.cosine_near_dup_pairs_clustered(
        emb, 0.4, k=None, n_vectors=sim.FLAT_CLUSTER_MAX + 1)


def test_bucket_expr_dims_literal_matches_dynamic(spark):
    """VERDICT r9 #2: corpus-sided callers bind the vector width as a
    literal so the strided v2 positions fold at plan time instead of
    evaluating ``size(v)`` once per bit per row. The literal form must
    produce the exact cell id the dynamic form does — on widths both
    divisible and non-divisible by the bit count."""
    from trignis_spark.operators.similarity import bucket_expr

    for dims in (7, 11, 64, 768):
        df = spark.range(200).select(
            F.expr(
                f"transform(sequence(1, {dims}), "
                "j -> sin(CAST(id * j AS DOUBLE) + 0.1))"
            ).alias("v")
        )
        for n_buckets in (16, 2048):
            got = df.select(
                F.expr(bucket_expr("v", n_buckets)).alias("dyn"),
                F.expr(bucket_expr("v", n_buckets, dims=dims)).alias(
                    "lit"
                ),
            )
            assert got.filter("dyn != lit").count() == 0
    # dims=None and dims<=0 keep the dynamic form (positions computed
    # from size(v) per bit); the literal form's POSITIONS are folded —
    # its only size() is the width guard, never a position division
    assert "div" in bucket_expr("v", 16)
    assert "div" in bucket_expr("v", 16, dims=0)
    assert "div" not in bucket_expr("v", 16, dims=64)
    assert "raise_error" in bucket_expr("v", 16, dims=64)

    # width guard (ADVICE r10): a corpus whose width disagrees with the
    # bound literal must fail loudly, not bucket by wrong positions
    import pytest

    mixed = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 65)], "vec_id long, v array<double>"
    )
    with pytest.raises(Exception, match="bucket_expr: vector width"):
        mixed.select(
            F.expr(bucket_expr("v", 16, dims=64)).alias("b")
        ).collect()
