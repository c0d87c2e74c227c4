"""TPC-H query-shape completion: the 14 shapes not yet in queries.py.

Together with tpch_q1/q3/q4/q5/q6/q12/q14/q18 in ``queries.py`` this
gives the engine every TPC-H access pattern — min-cost correlated
subquery (Q2), multi-nation volume joins (Q7/Q8), profit decomposition
(Q9), top-k revenue (Q10), group-having-over-global-scalar (Q11),
outer-join histograms (Q13), scalar-max view (Q15), distinct-count with
NOT-IN exclusion (Q16), correlated-average filter (Q17), disjunctive
predicate pushdown (Q19), nested-IN having (Q20), multi-EXISTS
self-joins (Q21), and anti-join with scalar-average gate (Q22).

The driver's tables are reduced TPC-H (TESTDATA.md): there is no
``partsupp``, no comment/phone/address columns, and the only lineitem
date is ``l_shipdate``. Adaptations (documented per query):
- ``lineitem`` grouped by (partkey, suppkey) is the partsupp surrogate;
  unit price ``l_extendedprice / l_quantity`` is the supply-cost
  surrogate and ``p_retailprice`` the cost side of Q9's profit.
- Q21's "late" marker is ``l_linestatus = 'O'`` (still open) instead of
  receiptdate > commitdate.
- Q22's phone country code is ``c_nationkey % 5``.

Determinism follows queries.py's rules: float aggregates accumulate in
exact DECIMAL then cast to DOUBLE once; raw doubles are only passed
through or combined with a fixed expression-tree shape; every top-k has
a total-order tie-break.

Scale notes (100 TB stance): all dimension joins (region, nation,
supplier, part at sf — and in production anything under the broadcast
threshold) are explicit ``F.broadcast``; fact-fact joins shuffle on
their natural keys and benefit from AQE; scalar gates (Q11/Q15/Q17/Q22)
are 1-row cross joins, which Spark plans as broadcast-nested-loop over a
single row rather than collecting to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trignis_spark.queries import _DEC, register
from trignis_spark.tables import load


def _dsum(expr: str, alias: str):
    """Order-independent sum of a double expression: exact DECIMAL
    accumulation, one final cast to DOUBLE (both engines bit-identical)."""
    return F.sum(F.expr(f"CAST({expr} AS {_DEC})")).cast("double").alias(alias)


_VOLUME = "l_extendedprice * (1 - l_discount)"


def _nation_region(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    """Nation keys inside one region — tiny dim, always broadcast."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == r_name)
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )


# --------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated MIN subquery → window-min)
# --------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eur AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ), ranked AS (
        SELECT c.l_partkey, c.supplycost, e.s_suppkey, e.s_name,
               e.s_acctbal, e.n_name,
               min(c.supplycost) OVER (PARTITION BY c.l_partkey) AS min_cost
        FROM cost c JOIN eur e ON e.s_suppkey = c.l_suppkey
    )
    SELECT k.s_acctbal, k.s_name, k.n_name, p.p_partkey, p.p_type,
           k.supplycost
    FROM ranked k JOIN part p ON p.p_partkey = k.l_partkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
      AND k.supplycost = k.min_cost
    ORDER BY k.s_acctbal DESC, k.n_name, k.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape. Supply cost surrogate = min unit price per
    (part, supplier) over lineitem (no partsupp table). The correlated
    ``= (SELECT min(...))`` becomes a window-min over the part key —
    one shuffle, no per-row subquery. Dims broadcast."""
    li = load(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.expr("l_extendedprice / l_quantity")).alias("supplycost")
    )
    nr = _nation_region(spark, sf_dir, "EUROPE")
    s = load(spark, sf_dir, "supplier")
    eur = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select(
        "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    ranked = (
        cost.join(F.broadcast(eur), cost.l_suppkey == eur.s_suppkey)
        .withColumn("min_cost", F.min("supplycost").over(Window.partitionBy("l_partkey")))
        .filter(F.col("supplycost") == F.col("min_cost"))
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        ranked.join(F.broadcast(p), ranked.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations by year
# --------------------------------------------------------------------------


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST({_VOLUME} AS {_DEC})) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bidirectional nation pair over a two-year ship window.
    The nation filter is applied to the broadcast dims *before* the fact
    joins so the supplier/customer fan-in shrinks first."""
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == n.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"
        )
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(_VOLUME, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — market share of one nation within a region, by order year
# --------------------------------------------------------------------------


@register(
    "tpch_q8_market_share",
    f"""
    WITH all_nations AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST({_VOLUME} AS {_DEC}) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS {_DEC}) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share,
           CAST(sum(volume) AS DOUBLE) AS total_volume
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: conditional share of a DECIMAL-accumulated volume.
    Both numerator and denominator sum exactly, then one double divide."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    nr = _nation_region(spark, sf_dir, "ASIA")
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(nr), F.col("c_nationkey") == nr.n_nationkey
    ).select("c_custkey")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    sup = s.join(F.broadcast(n1), s.s_nationkey == F.col("sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    vol = F.expr(f"CAST({_VOLUME} AS {_DEC})")
    zero = F.expr(f"CAST(0 AS {_DEC})")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)
    ).cast("double")
    den = F.sum("volume").cast("double")
    return (
        base.groupBy("o_year")
        .agg((num / den).alias("mkt_share"), den.alias("total_volume"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------


@register(
    "tpch_q9_product_profit",
    f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity AS {_DEC}))
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape. Profit surrogate: revenue minus ``p_retailprice *
    l_quantity`` (no ps_supplycost in the reduced schema). The LIKE
    filter prunes part before the broadcast join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity"
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            F.expr(f"CAST({profit} AS {_DEC})").alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# --------------------------------------------------------------------------


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST({_VOLUME} AS {_DEC})) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: one-quarter order window, returned lines only, top 20
    by exact-decimal revenue with a custkey tie-break."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ'1997-10-01 00:00:00' AND "
            "o_orderdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"
        )
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(_VOLUME, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 — important stock: per-part value above a global-fraction threshold
# --------------------------------------------------------------------------


@register(
    "tpch_q11_important_stock",
    f"""
    WITH eur AS (
        SELECT s.s_suppkey FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ), pv AS (
        SELECT l.l_partkey,
               CAST(sum(CAST(l.l_extendedprice * l.l_quantity AS {_DEC}))
                    AS DOUBLE) AS part_value
        FROM lineitem l JOIN eur e ON e.s_suppkey = l.l_suppkey
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > (
        SELECT CAST(sum(CAST(part_value AS {_DEC})) AS DOUBLE) * 0.001 FROM pv
    )
    ORDER BY part_value DESC, l_partkey
    LIMIT 100
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape. Stock value surrogate = extendedprice·quantity summed
    per part over European suppliers' lines; the HAVING-over-global-sum
    is a 1-row broadcast cross join, never a driver collect.

    Determinism: the global threshold sums the per-part DOUBLEs — a sum
    over ≤|parts| values whose addition order Spark cannot guarantee, so
    it re-accumulates exactly: each part_value is decimal again before
    the total."""
    nr = _nation_region(spark, sf_dir, "EUROPE")
    s = load(spark, sf_dir, "supplier")
    eur = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem")
    pv = (
        li.join(F.broadcast(eur), li.l_suppkey == eur.s_suppkey)
        .groupBy("l_partkey")
        .agg(_dsum("l_extendedprice * l_quantity", "part_value"))
    )
    total = pv.agg(
        (F.sum(F.expr(f"CAST(part_value AS {_DEC})")).cast("double") * F.lit(0.001)).alias(
            "threshold"
        )
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer-join histogram)
# --------------------------------------------------------------------------


@register(
    "tpch_q13_order_distribution",
    """
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left-outer join keeps order-less customers (count 0),
    then a histogram of counts. Priority filter stands in for the
    original comment LIKE exclusion."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q15 — top supplier (scalar-max over an aggregated view)
# --------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST({_VOLUME} AS {_DEC})) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the view's max is a 1-row broadcast; equality on the
    exact-decimal-derived double is reproducible across engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1997-04-01 00:00:00'"
        )
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_VOLUME, "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — supplier relationship count with NOT-IN exclusion
# --------------------------------------------------------------------------


@register(
    "tpch_q16_parts_supplier",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape. The complaints exclusion becomes negative-balance
    suppliers; NOT IN over a never-null key = broadcast anti-join."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated average)
# --------------------------------------------------------------------------


@register(
    "tpch_q17_small_quantity",
    f"""
    WITH pq AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) / count(*)
                 AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS {_DEC})) AS DOUBLE) / 7.0
             AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_size < 10
      AND l.l_quantity < 0.2 * pq.avg_qty
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape. The correlated AVG becomes a grouped side-aggregate
    joined back on the part key (container filter → p_size). The
    average itself is decimal-sum / count, identical in both engines."""
    li = load(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (
            F.sum(F.expr(f"CAST(l_quantity AS {_DEC})")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == F.col("pq_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.expr(f"CAST(l_extendedprice AS {_DEC})")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue over disjunctive brand/size/quantity triples
# --------------------------------------------------------------------------


@register(
    "tpch_q19_discounted_revenue",
    f"""
    SELECT CAST(sum(CAST({_VOLUME} AS {_DEC})) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: the disjunction splits per-side — part predicates
    (brand, size) prune the broadcast dim; the mixed branches evaluate
    post-join. Container/shipmode legs are dropped (columns absent)."""
    p = load(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
    )
    li = load(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_dsum(_VOLUME, "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN + HAVING threshold)
# --------------------------------------------------------------------------


@register(
    "tpch_q20_promotion_suppliers",
    f"""
    WITH small_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ), heavy AS (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM small_parts)
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) > 300.0
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s.s_name, n.n_name
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape. Availqty/excess-stock leg is replaced by a shipped-
    quantity threshold (no partsupp); both INs become semi-joins, the
    inner one broadcast."""
    sp = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00' AND "
            "l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'"
        )
    )
    heavy = (
        li.join(F.broadcast(sp), li.l_partkey == sp.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(_dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 300.0)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting
# --------------------------------------------------------------------------


@register(
    "tpch_q21_waiting_suppliers",
    """
    WITH open_lines AS (
        SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_linestatus = 'O'
    ), all_lines AS (
        SELECT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s.s_name, count(*) AS numwait
    FROM open_lines l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM all_lines l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM open_lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the sole-blocker pattern — semi-join proves another
    supplier exists on the order, anti-join proves no *other* supplier's
    line is still open ('O' stands in for receipt>commit lateness)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    open_lines = load(spark, sf_dir, "lineitem").filter(
        F.col("l_linestatus") == "O"
    ).select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = open_lines.alias("l1")
    l2 = li.alias("l2")
    l3 = open_lines.alias("l3")
    return (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join + scalar-average gate)
# --------------------------------------------------------------------------


@register(
    "tpch_q22_sales_opportunity",
    f"""
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(c_acctbal AS {_DEC})) AS DOUBLE) / count(*)
                 AS threshold
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS {_DEC})) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal a
    WHERE CAST(c.c_nationkey % 5 AS INTEGER) IN (0, 1, 2)
      AND c.c_acctbal > a.threshold
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape. Country code surrogate = c_nationkey % 5 (no phone
    column). Rich-but-idle customers: above the positive-balance average
    (decimal-exact scalar, broadcast) with no *recent* orders
    (anti-join; 'recent' keeps the result non-empty on dense synthetic
    data where every customer has some order)."""
    c = load(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 5).cast("int")
    ).filter(F.col("cntrycode").isin(0, 1, 2))
    avg_bal = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.expr(f"CAST(c_acctbal AS {_DEC})")).cast("double")
                / F.count(F.lit(1))
            ).alias("threshold")
        )
    )
    o = load(spark, sf_dir, "orders").filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ'2000-01-01 00:00:00'")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("cntrycode")
    )
