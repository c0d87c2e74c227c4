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
