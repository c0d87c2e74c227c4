"""Persistent dedup index: build → probe parity with the one-shot
operator, idempotent extends, and growth changing probe results."""

import pytest
from pyspark.sql import functions as F

from trignis_spark.operators import dedup as dd
from trignis_spark.operators import dedup_index as di

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = BASE.replace("today", "tonight")
OTHER = "completely different content about spark planning and shuffles here"


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture
def index(spark):
    yield "dedup_idx_t"
    spark.sql("DROP TABLE IF EXISTS dedup_idx_t")
    spark.sql("DROP TABLE IF EXISTS dedup_idx_t_docs")


def test_probe_matches_one_shot_operator(spark, index):
    corpus = _frame(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    batch = _frame(spark, [(10, NEAR), (11, "nothing shared with anyone")])
    di.build_index(spark, corpus, index)

    via_index = {
        (r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 9))
        for r in di.probe_index(spark, index, batch, threshold=0.5).collect()
    }
    one_shot = {
        (r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 9))
        for r in dd.incremental_pairs(
            dd.shingle_table(corpus), dd.shingle_table(batch), threshold=0.5
        ).collect()
    }
    assert via_index == one_shot
    assert {(b, c) for b, c, _ in via_index} == {(10, 1), (10, 2)}


def test_extend_is_idempotent_and_grows_probe_results(spark, index):
    di.build_index(spark, _frame(spark, [(1, OTHER)]), index)
    batch = _frame(spark, [(10, NEAR)])
    assert di.probe_index(spark, index, batch, threshold=0.5).count() == 0

    # a replayed extend adds the new doc exactly once
    newcomer = _frame(spark, [(2, BASE)])
    assert di.extend_index(spark, newcomer, index) == 1
    assert di.extend_index(spark, newcomer, index) == 0  # replay: no-op
    docs = spark.table("dedup_idx_t_docs")
    assert docs.filter(F.col("doc_id") == 2).count() == 1

    # and the probe now sees the near-dup through the extended index
    got = di.probe_index(spark, index, batch, threshold=0.5).collect()
    assert [(r["batch_doc"], r["corpus_doc"]) for r in got] == [(10, 2)]


def test_index_layout_is_bucketed_on_shingle(spark, index):
    di.build_index(spark, _frame(spark, [(1, BASE), (3, OTHER)]), index)
    ddl = spark.sql("DESCRIBE TABLE EXTENDED dedup_idx_t").collect()
    info = {r["col_name"]: r["data_type"] for r in ddl}
    assert "shingle" in info.get("Bucket Columns", "")
    assert "shingle" in info.get("Sort Columns", "")


@pytest.fixture
def pindex(spark):
    yield "dedup_pidx_t"
    for suffix in ("", "_full", "_docs", "_meta"):
        spark.sql(f"DROP TABLE IF EXISTS dedup_pidx_t{suffix}")


def _rand_docs(seed, n_docs, start=0):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(n_docs):
        k = rng.randint(6, 14)
        rows.append((start + i, " ".join(rng.choice(vocab)
                                         for _ in range(k))))
    # plant hot shingles: a boilerplate prefix shared by many docs
    rows += [(start + n_docs + j,
              "standard header line here " + rows[j % n_docs][1])
             for j in range(n_docs // 2)]
    return rows


def test_prefix_probe_matches_full_probe(spark, index, pindex):
    corpus = _frame(spark, _rand_docs(3, 16))
    batch = _frame(spark, _rand_docs(4, 6, start=1000))
    di.build_index(spark, corpus, index)
    di.build_prefix_index(spark, corpus, pindex, threshold=0.5)
    for t in (0.5, 0.7, 0.9):
        full = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 9))
                for r in di.probe_index(spark, index, batch,
                                        threshold=t).collect()}
        pref = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 9))
                for r in di.probe_prefix_index(spark, pindex, batch,
                                               threshold=t).collect()}
        assert pref == full


def test_prefix_probe_rejects_looser_threshold(spark, pindex):
    di.build_prefix_index(
        spark, _frame(spark, [(1, BASE)]), pindex, threshold=0.8
    )
    with pytest.raises(ValueError, match="threshold"):
        di.probe_prefix_index(
            spark, pindex, _frame(spark, [(10, NEAR)]), threshold=0.5
        )


def test_prefix_extend_idempotent_and_lossless(spark, index, pindex):
    start = _frame(spark, _rand_docs(5, 10))
    di.build_index(spark, start, index)
    di.build_prefix_index(spark, start, pindex, threshold=0.5)
    newcomers = _frame(spark, _rand_docs(6, 8, start=500))
    assert di.extend_index(spark, newcomers, index) == 12
    assert di.extend_prefix_index(spark, newcomers, pindex) == 12
    assert di.extend_prefix_index(spark, newcomers, pindex) == 0  # replay
    batch = _frame(spark, _rand_docs(7, 5, start=2000))
    full = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 9))
            for r in di.probe_index(spark, index, batch,
                                    threshold=0.5).collect()}
    pref = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 9))
            for r in di.probe_prefix_index(spark, pindex, batch,
                                           threshold=0.5).collect()}
    assert pref == full


def test_prefix_index_excludes_hot_shingles(spark, pindex):
    # every doc shares the same boilerplate opening; with a tight
    # threshold the stored prefix is small and the boilerplate shingles
    # (df = corpus size, ranked last) must not be indexed for the
    # longer docs
    boiler = "standard header line for every single document in the set"
    rows = [(i, boiler + f" unique tail {i} alpha beta gamma delta",)
            for i in range(20)]
    di.build_prefix_index(
        spark, _frame(spark, rows), pindex, threshold=0.8
    )
    probe_tbl = spark.table(pindex)
    full_tbl = spark.table(pindex + "_full")
    # pruned probe table holds far fewer shingle postings than the
    # corpus's total shingle volume (the verify table stores one
    # doc-array row per doc since round 10 — compare volumes, not rows)
    total_shingles = full_tbl.agg(F.sum("sz")).first()[0]
    assert probe_tbl.count() * 2 < total_shingles
    # the hottest shingle (df == n_docs) is absent from the probe table
    hot = (full_tbl.select(F.explode("shs").alias("shingle"))
           .groupBy("shingle").count()
           .orderBy(F.desc("count")).first())
    assert hot["count"] == 20
    assert probe_tbl.filter(F.col("shingle") == hot["shingle"]).count() == 0


def test_prefix_index_compaction_preserves_probe_results(spark, pindex):
    from trignis_spark.maintenance import table_data_files

    di.build_prefix_index(
        spark, _frame(spark, _rand_docs(8, 10)), pindex, threshold=0.5
    )
    for seed, start in ((9, 500), (10, 600), (11, 700)):
        di.extend_prefix_index(
            spark, _frame(spark, _rand_docs(seed, 4, start=start)), pindex
        )
    # same generator seed as the corpus build => identical texts under
    # fresh doc ids, so the probe is guaranteed non-empty
    batch = _frame(spark, _rand_docs(8, 5, start=3000))
    before = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
              for r in di.probe_prefix_index(spark, pindex, batch,
                                             0.5).collect()}
    files_before = sum(
        len(table_data_files(spark, t))
        for t in (pindex, pindex + "_full", pindex + "_docs")
    )
    n_after = di.compact_prefix_index(spark, pindex)
    assert n_after < files_before
    after = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
             for r in di.probe_prefix_index(spark, pindex, batch,
                                            0.5).collect()}
    assert after == before and len(before) > 0
    # compaction is idempotent: a re-run with no new appends converges
    assert di.compact_prefix_index(spark, pindex) == n_after


def _replay_duplicate_rows(spark, table, bucket_col, sort=False,
                           partitioned=None):
    """Re-append a table's current rows to itself — the state a crashed
    extend leaves behind when the next at-least-once replay re-appends
    a batch whose _docs-sidecar write never landed (ADVICE r5)."""
    rows = spark.table(table)
    w = rows.write.mode("append").format("parquet")
    if partitioned and partitioned in rows.columns:
        w = rows.repartition(partitioned).write.mode("append") \
            .format("parquet").partitionBy(partitioned)
    elif bucket_col is not None:
        w = w.bucketBy(di.DEFAULT_BUCKETS, bucket_col)
        if sort:
            w = w.sortBy(bucket_col)
    # else: v4 doc-sorted verify table — a plain append IS the crash
    # shape (a replayed extend appends an identical sorted run)
    w.saveAsTable(table)
    spark.catalog.refreshTable(table)


def test_probe_unaffected_by_replayed_duplicate_index_rows(spark, index):
    corpus = _frame(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    batch = _frame(spark, [(10, NEAR)])
    di.build_index(spark, corpus, index)
    before = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
              for r in di.probe_index(spark, index, batch, 0.5).collect()}
    _replay_duplicate_rows(spark, index, "shingle", sort=True)
    after = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
             for r in di.probe_index(spark, index, batch, 0.5).collect()}
    assert after == before and before


def test_prefix_probe_unaffected_by_replayed_duplicate_rows(spark):
    name = "dedup_pidx_dup_t"
    corpus = _frame(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    batch = _frame(spark, [(10, NEAR)])
    try:
        di.build_prefix_index(spark, corpus, name, threshold=0.5)
        before = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
                  for r in di.probe_prefix_index(
                      spark, name, batch, 0.5).collect()}
        # the crash window duplicates the probe AND verify tables but
        # not the _docs sidecar; jaccard (isz from the verify table)
        # must not double-count
        _replay_duplicate_rows(spark, name, "shingle", sort=True)
        _replay_duplicate_rows(spark, di._full_table(name), None,
                               partitioned="pb")
        after = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
                 for r in di.probe_prefix_index(
                     spark, name, batch, 0.5).collect()}
        assert after == before and before
        assert all(j <= 1.0 for _, _, j in after)
    finally:
        for t in (name, di._full_table(name), di._docs_table(name),
                  di._meta_table(name)):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_prefix_probe_sort_merge_fallback_identical_pairs(spark):
    """VERDICT r5 #3: a batch too big to broadcast takes the co-located
    sort-merge path — same pairs, no cartesian, and no auto-broadcast
    sneaking back in (autoBroadcastJoinThreshold disabled for the
    run). The corpus-side scan must stay the bucketed table."""
    from trignis_spark.plans import assert_no_cartesian_product

    name = "dedup_pidx_smj_t"
    corpus = _frame(
        spark,
        [(1, BASE), (2, BASE), (3, OTHER)]
        + [(20 + i, f"filler document number {i} about topic {i % 5} "
                    f"with trailing words {i}") for i in range(40)],
    )
    batch = _frame(
        spark,
        [(10, NEAR), (11, "nothing shared with anyone")]
        + [(100 + i, f"filler document number {i} about topic {i % 5} "
                     f"with trailing words {i}") for i in range(10)],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        di.build_prefix_index(spark, corpus, name, threshold=0.5)
        want = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
                for r in di.probe_prefix_index(
                    spark, name, batch, 0.5).collect()}
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        smj = di.probe_prefix_index(
            spark, name, batch, 0.5, broadcast_batch=False
        )
        assert_no_cartesian_product(smj)
        plan = smj._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # really the fallback
        got = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
               for r in smj.collect()}
        assert got == want and want
        # the auto dial picks broadcast for small batches and the
        # fallback above MAX_BROADCAST_SHINGLES — and it gates on the
        # shingle rows actually broadcast, so a batch of FEW but very
        # long documents still takes the fallback (ADVICE r6)
        assert di.MAX_BROADCAST_SHINGLES >= 1_000_000
        orig = di.MAX_BROADCAST_SHINGLES
        di.MAX_BROADCAST_SHINGLES = 10  # 2 long docs >> 10 shingles
        try:
            auto = di.probe_prefix_index(spark, name, batch, 0.5)
            plan = auto._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan
            got2 = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
                    for r in auto.collect()}
            assert got2 == want
        finally:
            di.MAX_BROADCAST_SHINGLES = orig
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in (name, di._full_table(name), di._docs_table(name),
                  di._meta_table(name)):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_attach_prefix_index_restores_probes(spark, pindex):
    """Re-registering a persisted prefix index's tables from their
    warehouse directories (fresh-session/in-memory-catalog restart —
    simulated by copying the dirs under a name the catalog has never
    seen) must leave probe results identical."""
    import os
    import shutil
    from urllib.parse import urlparse

    rows = _rand_docs(3, 16)
    corpus = _frame(spark, rows)
    # batch: verbatim copies of three corpus docs → guaranteed pairs
    batch = _frame(spark, [(1000 + i, rows[i][1]) for i in range(3)])
    di.build_prefix_index(spark, corpus, pindex, threshold=0.5)
    want = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 9))
            for r in di.probe_prefix_index(spark, pindex, batch,
                                           threshold=0.5).collect()}
    assert want

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    twin = pindex + "_reattached"
    for suffix in ("", "_full", "_docs", "_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {twin}{suffix}")
        dst = os.path.join(wh, twin + suffix)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(os.path.join(wh, pindex + suffix), dst)
    try:
        di.attach_prefix_index(spark, twin)
        got = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 9))
               for r in di.probe_prefix_index(spark, twin, batch,
                                              threshold=0.5).collect()}
        assert got == want
    finally:
        for suffix in ("", "_full", "_docs", "_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {twin}{suffix}")
            dst = os.path.join(wh, twin + suffix)
            if os.path.isdir(dst):
                shutil.rmtree(dst)


def test_prefix_probe_dispatches_on_legacy_row_verify_layout(
    spark, pindex
):
    """Pre-round-10 persisted indexes store the verify table as one
    row per (doc, shingle); round-10 builds store one doc-array row
    per doc. Probe and extend dispatch on the stored schema, and the
    two layouts must return identical pairs."""
    rows = [(i, f"alpha beta gamma doc {i} tail words here") for i in
            range(30)] + [(100, "alpha beta gamma doc 3 tail words here")]
    docs = _frame(spark, rows)
    di.build_prefix_index(spark, docs, pindex, threshold=0.8)
    batch = _frame(spark, [(500, "alpha beta gamma doc 3 tail words here")])
    want = {(r["batch_doc"], r["corpus_doc"], r["jaccard"])
            for r in di.probe_prefix_index(spark, pindex, batch,
                                           0.8).collect()}
    assert want
    # rewrite the verify table in the legacy row-level layout
    meta = di._meta_row(spark, pindex)
    legacy = di._sized_shingles(docs, meta.n).withColumn(
        "pb", di._pb(parts=meta.n_parts)
    )
    spark.sql(f"DROP TABLE {di._full_table(pindex)}")
    (
        legacy.repartition("pb").write.mode("overwrite")
        .partitionBy("pb").format("parquet")
        .saveAsTable(di._full_table(pindex))
    )
    got = {(r["batch_doc"], r["corpus_doc"], r["jaccard"])
           for r in di.probe_prefix_index(spark, pindex, batch,
                                          0.8).collect()}
    assert got == want
    # extend follows the STORED layout: appended rows stay row-level
    di.extend_prefix_index(
        spark, _frame(spark, [(600, "totally different new words "
                                    "number six hundred")]), pindex)
    assert "shingle" in spark.table(di._full_table(pindex)).columns
    got2 = {(r["batch_doc"], r["corpus_doc"], r["jaccard"])
            for r in di.probe_prefix_index(spark, pindex, batch,
                                           0.8).collect()}
    assert got2 == want


def test_prefix_probe_dispatches_on_v3_partitioned_doc_array_layout(
    spark, pindex
):
    """Round-10 persisted indexes store the doc-array verify table
    hash-partitioned on ``pb``; round-11 builds store it doc_id-sorted
    with no ``pb``. Probe and extend dispatch on the stored schema and
    the layouts must return identical pairs."""
    rows = [(i, f"alpha beta gamma doc {i} tail words here") for i in
            range(30)] + [(100, "alpha beta gamma doc 3 tail words here")]
    docs = _frame(spark, rows)
    di.build_prefix_index(spark, docs, pindex, threshold=0.8)
    assert "pb" not in spark.table(di._full_table(pindex)).columns  # v4
    batch = _frame(spark, [(500, "alpha beta gamma doc 3 tail words here")])
    want = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 12))
            for r in di.probe_prefix_index(spark, pindex, batch,
                                           0.8).collect()}
    assert want
    # rewrite the verify table in the v3 pb-partitioned doc-array layout
    meta = di._meta_row(spark, pindex)
    v3 = di._doc_shingles(docs, meta.n, meta.n_parts)
    spark.sql(f"DROP TABLE {di._full_table(pindex)}")
    (
        v3.repartition("pb").write.mode("overwrite")
        .partitionBy("pb").format("parquet")
        .saveAsTable(di._full_table(pindex))
    )
    got = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 12))
           for r in di.probe_prefix_index(spark, pindex, batch,
                                          0.8).collect()}
    assert got == want
    # extend follows the STORED layout: appended rows keep pb
    di.extend_prefix_index(
        spark, _frame(spark, [(600, "totally different new words "
                                    "number six hundred")]), pindex)
    assert "pb" in spark.table(di._full_table(pindex)).columns
    got2 = {(r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 12))
            for r in di.probe_prefix_index(spark, pindex, batch,
                                           0.8).collect()}
    assert got2 == want


def test_compaction_after_attach_swaps_external_tables(spark, pindex):
    """Round 11: a serving process that restarts re-registers its
    index via ``attach_prefix_index`` (EXTERNAL tables), and the next
    housekeeping compaction must still swap — the managed-only rename
    dance failed with LOCATION_ALREADY_EXISTS because an external
    rename leaves the warehouse directory behind (hit live on the
    50 M-doc decade leg). Simulated like the ivfpq attach test: copy
    the warehouse dirs under a name the catalog has never seen."""
    import os
    import shutil
    from urllib.parse import urlparse

    di.build_prefix_index(
        spark, _frame(spark, _rand_docs(8, 10)), pindex, threshold=0.5
    )
    di.extend_prefix_index(
        spark, _frame(spark, _rand_docs(9, 4, start=500)), pindex
    )
    batch = _frame(spark, _rand_docs(8, 5, start=3000))
    want = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
            for r in di.probe_prefix_index(spark, pindex, batch,
                                           0.5).collect()}
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    twin = pindex + "_reatt"
    for suffix in ("", "_full", "_docs", "_meta"):
        src, dst = pindex + suffix, twin + suffix
        spark.sql(f"DROP TABLE IF EXISTS {dst}")
        if os.path.isdir(os.path.join(wh, dst)):
            shutil.rmtree(os.path.join(wh, dst))
        shutil.copytree(os.path.join(wh, src), os.path.join(wh, dst))
    try:
        di.attach_prefix_index(spark, twin)
        n = di.compact_prefix_index(spark, twin)
        assert n > 0
        got = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
               for r in di.probe_prefix_index(spark, twin, batch,
                                              0.5).collect()}
        assert got == want and got
        # the swapped-in tables accept further extends (spec intact)
        more = _rand_docs(10, 3, start=900)
        assert di.extend_prefix_index(
            spark, _frame(spark, more), twin
        ) == len(more)
    finally:
        for suffix in ("", "_full", "_docs", "_meta"):
            t = twin + suffix
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            if os.path.isdir(os.path.join(wh, t)):
                shutil.rmtree(os.path.join(wh, t))
