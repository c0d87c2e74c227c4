"""Salting is an algebraic no-op: salted plans equal unsalted results."""

from pyspark.sql import functions as F

from trignis_spark.operators.skew import salted_count, salted_join, top_keys


def _skewed(spark, n=2000):
    # 50% of rows share key 0 (the hot key), the rest spread over 100 keys
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_count_equals_plain_count(spark):
    df = _skewed(spark)
    plain = {(r["k"], r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {(r["k"], r["n"]) for r in salted_count(df, ["k"]).collect()}
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(100)], "k long, label string"
    )
    plain = {
        (r["k"], r["v"], r["label"])
        for r in big.join(small, ["k"]).collect()
    }
    salted = {
        (r["k"], r["v"], r["label"])
        for r in salted_join(big, small, ["k"], n_salts=8).collect()
    }
    assert salted == plain
    assert len(plain) == 2000  # every row matched


def test_top_keys_finds_hot_key(spark):
    df = _skewed(spark)
    top = top_keys(df, ["k"], k=3).collect()
    assert top[0]["k"] == 0
    assert top[0]["share"] > 0.4  # the planted hot key dominates


def test_salted_join_rejects_outer_joins(spark):
    import pytest as _pytest

    big = _skewed(spark, n=10)
    small = spark.createDataFrame([(1, "x")], "k long, label string")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="full")


def test_chunked_running_sum_equals_single_window(spark):
    """Two-level prefix sum == plain running sum, including under a
    100x-hot partition key; the sub-chunked window's max group is
    bounded by the chunk granularity."""
    import random

    from pyspark.sql import Window

    rng = random.Random(7)
    rows = [(1, i, rng.randint(1, 9), i % 16) for i in range(3200)]  # hot key
    rows += [(k, i, rng.randint(1, 9), i % 16)
             for k in range(2, 30) for i in range(32)]
    df = spark.createDataFrame(rows, "k long, ord long, val long, chunk long")
    # contract: chunk monotone along ord — remap chunk to ord div 200
    df = df.withColumn("chunk", (F.col("ord") / 200).cast("long"))

    w = (
        Window.partitionBy("k").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {(r["k"], r["ord"], r["cum"]) for r in
            df.withColumn("cum", F.sum("val").over(w)).collect()}
    from trignis_spark.operators.skew import chunked_running_sum

    got = {(r["k"], r["ord"], r["cum"]) for r in
           chunked_running_sum(df, ["k"], ["ord"], "val", "chunk").collect()}
    assert got == want

    plain_max = df.groupBy("k").count().agg(F.max("count")).first()[0]
    chunk_max = (
        df.groupBy("k", "chunk").count().agg(F.max("count")).first()[0]
    )
    assert plain_max == 3200 and chunk_max <= 200
