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
