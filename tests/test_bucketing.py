"""Bucketed co-located join: the repeated snapshot-diff join runs with
zero Exchange when both sides share the bucket spec."""

from pyspark.sql import functions as F

from trignis_spark.plans.bucketing import bucketed_join, write_bucketed
from trignis_spark.plans.explain import plan_str
from trignis_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_bucketed_snapshot_join_has_no_exchange(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load(spark, SF, "orders")
        old = orders.filter(F.expr("o_orderkey % 83 <> 0"))
        new = orders.filter(F.expr("o_orderkey % 97 <> 0")).select(
            "o_orderkey",
            F.expr("o_totalprice * 1.1").alias("o_totalprice"),
        )
        write_bucketed(old, "snap_old", ["o_orderkey"], n_buckets=8)
        write_bucketed(new, "snap_new", ["o_orderkey"], n_buckets=8)

        joined = bucketed_join(spark, "snap_old", "snap_new", ["o_orderkey"])
        plan = plan_str(joined)
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan

        # same join on the raw (unbucketed) frames DOES shuffle
        raw = old.join(new.withColumnRenamed("o_totalprice", "p2"), ["o_orderkey"])
        assert "Exchange" in plan_str(raw)

        # and the results are identical
        assert joined.count() == raw.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_old")
        spark.sql("DROP TABLE IF EXISTS snap_new")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
