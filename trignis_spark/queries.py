"""Query registry: every implemented operator exposed as a (Spark, oracle-SQL) pair.

This is the driver-facing inventory (``__spark_entry__`` is a thin shim over
it). Each entry maps one operator family from SURVEY.md §2 onto the
driver's parquet tables; the oracle SQL is the same computation in ANSI
SQL for DuckDB.

Determinism rules (so value-hashes match across engines):
- float aggregates go through exact DECIMAL accumulation, then one cast
  to DOUBLE (order-independent, bit-identical in both engines);
- raw doubles are only passed through or combined with a fixed
  expression-tree shape (IEEE ops are deterministic given identical
  operand order);
- arrays are emitted as comma-joined strings; timestamps as formatted
  strings; every top-k has a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trignis_spark.operators import changefeed as cf
from trignis_spark.tables import load

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Shared fixtures: the events table viewed as a versioned outbox.
# Fixed poll parameters used by the incremental-scan queries; the horizon
# is probed from the source (max assigned commit id minus an in-flight
# allowance), mirroring pg_snapshot_xmin (SURVEY §1.4).
# --------------------------------------------------------------------------

WM = 500  # stored watermark for the simulated poll cycle

_OUTBOX_SQL = """
    SELECT event_id AS version,
           event_id + (user_id % 5) AS xact_id,
           CASE event_type WHEN 'signup' THEN 'I'
                           WHEN 'error' THEN 'D'
                           ELSE 'U' END AS operation,
           user_id AS user_key,
           CASE WHEN event_type = 'click' THEN ['value']
                WHEN event_type = 'view' THEN ['value', 'props']
                WHEN event_type = 'purchase' THEN ['value', 'event_type']
           END AS changed,
           ts, event_type, value, props
    FROM events
"""
_HORIZON_SQL = "(SELECT max(event_id) - 2 FROM events)"


def _outbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cf.events_as_outbox(load(spark, sf_dir, "events"))


def _horizon(spark: SparkSession, sf_dir: str) -> int:
    return load(spark, sf_dir, "events").agg(F.max("event_id") - 2).first()[0]


def _changed_csv():
    return F.array_join(F.col(cf.CHANGED), ",").alias("changed_cols")


# --------------------------------------------------------------------------
# Change-feed operators (SURVEY §2.1 S2/S3/S6, §2.2 P2-P5, §2.4 A1/A2)
# --------------------------------------------------------------------------


@register(
    "cf_outbox_scan",
    f"""
    WITH outbox AS ({_OUTBOX_SQL})
    SELECT version, xact_id, operation, user_key,
           array_to_string(changed, ',') AS changed_cols,
           event_type, value, props
    FROM outbox
    WHERE version > {WM} AND xact_id < {_HORIZON_SQL}
    """,
)
def cf_outbox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 + P2 + P3: incremental outbox scan bounded by the commit horizon."""
    scan = cf.outbox_scan(_outbox(spark, sf_dir), WM, _horizon(spark, sf_dir))
    return scan.select(
        "version", "xact_id", "operation", "user_key",
        _changed_csv(), "event_type", "value", "props",
    )


@register(
    "cf_full_snapshot",
    f"""
    WITH outbox AS ({_OUTBOX_SQL})
    SELECT version, 'I' AS operation, user_key, event_type, value, props
    FROM outbox
    """,
)
def cf_full_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: full-sync scan — whole table as insert events."""
    return cf.full_snapshot(_outbox(spark, sf_dir)).select(
        "version", "operation", "user_key", "event_type", "value", "props"
    )


@register(
    "cf_seed_zero_rows",
    f"""
    WITH outbox AS ({_OUTBOX_SQL})
    SELECT version, operation, user_key FROM outbox WHERE false
    """,
)
def cf_seed_zero_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/P7: seed handshake returns a schema-stable empty batch."""
    return cf.seed_frame(_outbox(spark, sf_dir)).select(
        "version", "operation", "user_key"
    )


@register(
    "cf_horizon_watermark",
    f"""
    WITH outbox AS ({_OUTBOX_SQL})
    SELECT coalesce(max(version), {WM}) AS new_watermark
    FROM outbox WHERE version > {WM} AND xact_id < {_HORIZON_SQL}
    """,
)
def cf_horizon_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: next watermark computed through the same horizon as the scan."""
    return cf.horizon_watermark(_outbox(spark, sf_dir), WM, _horizon(spark, sf_dir))


@register(
    "cf_batch_watermark",
    f"""
    WITH outbox AS ({_OUTBOX_SQL})
    SELECT coalesce(max(version), {WM}) AS new_watermark,
           count(*) AS exported_rows
    FROM outbox
    WHERE version > {WM} AND xact_id < {_HORIZON_SQL}
    """,
)
def cf_batch_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: max-version watermark over the exported batch, count alongside."""
    scan = cf.outbox_scan(_outbox(spark, sf_dir), WM, _horizon(spark, sf_dir))
    return cf.batch_watermark(scan, WM)


@register(
    "cf_column_mask",
    f"""
    WITH outbox AS ({_OUTBOX_SQL})
    SELECT version, operation, user_key,
           array_to_string(changed, ',') AS changed_cols,
           CASE WHEN operation = 'I' OR list_contains(coalesce(changed, []), 'event_type')
                THEN event_type END AS event_type,
           CASE WHEN operation = 'I' OR list_contains(coalesce(changed, []), 'value')
                THEN value END AS value,
           CASE WHEN operation = 'I' OR list_contains(coalesce(changed, []), 'props')
                THEN props END AS props
    FROM outbox
    WHERE version > {WM}
      AND (operation <> 'U' OR len(coalesce(changed, [])) > 0)
    """,
)
def cf_column_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 + P5: drop no-op updates, then emit per-column values only when
    inserted or named in the $changed mask (else NULL)."""
    scan = cf.outbox_scan(_outbox(spark, sf_dir), WM)
    masked = cf.mask_columns(
        cf.changed_filter(scan), tracked=("event_type", "value", "props")
    )
    return masked.select(
        "version", "operation", "user_key", _changed_csv(),
        "event_type", "value", "props",
    )


# --------------------------------------------------------------------------
# Snapshot-diff change feed (SURVEY §7.2 step 3; postgres.column.sql trigger)
# --------------------------------------------------------------------------

_DIFF_OLD_SQL = "SELECT * FROM orders WHERE o_orderkey % 83 <> 0"
_DIFF_NEW_SQL = """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
           o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
"""


def _diff_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load(spark, sf_dir, "orders")
    old = orders.filter(F.expr("o_orderkey % 83 <> 0"))
    new = orders.filter(F.expr("o_orderkey % 97 <> 0")).select(
        "o_orderkey",
        F.expr(
            "CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END"
        ).alias("o_orderstatus"),
        F.expr(
            "CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END"
        ).alias("o_totalprice"),
        "o_orderpriority",
    )
    return old, new


@register(
    "cf_snapshot_diff",
    f"""
    WITH old AS ({_DIFF_OLD_SQL}), new AS ({_DIFF_NEW_SQL}),
    j AS (
      SELECT old.o_orderkey AS ok, new.o_orderkey AS nk,
             old.o_orderstatus AS os, new.o_orderstatus AS ns,
             old.o_totalprice AS op_, new.o_totalprice AS np_,
             old.o_orderpriority AS opr, new.o_orderpriority AS npr
      FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey),
    d AS (
      SELECT *,
        list_filter([
          CASE WHEN os IS DISTINCT FROM ns THEN 'o_orderstatus' END,
          CASE WHEN op_ IS DISTINCT FROM np_ THEN 'o_totalprice' END,
          CASE WHEN opr IS DISTINCT FROM npr THEN 'o_orderpriority' END],
          x -> x IS NOT NULL) AS mask,
        CASE WHEN ok IS NOT NULL AND nk IS NULL THEN 'D'
             WHEN ok IS NULL AND nk IS NOT NULL THEN 'I' END AS io
      FROM j)
    SELECT coalesce(io, 'U') AS operation,
           CASE WHEN coalesce(io, 'U') = 'U' THEN array_to_string(mask, ',') END AS changed_cols,
           coalesce(nk, ok) AS o_orderkey,
           CASE WHEN coalesce(io, 'U') <> 'D' THEN ns END AS o_orderstatus,
           CASE WHEN coalesce(io, 'U') <> 'D' THEN np_ END AS o_totalprice,
           CASE WHEN coalesce(io, 'U') <> 'D' THEN npr END AS o_orderpriority
    FROM d
    WHERE io IS NOT NULL OR len(mask) > 0
    """,
)
def cf_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed from successive snapshots: full-outer join on the PK →
    I/U/D + per-column IS-DISTINCT-FROM mask. Mutations are simulated
    deterministically from `orders` so the oracle can reproduce them."""
    old, new = _diff_frames(spark, sf_dir)
    diff = cf.snapshot_diff(
        old, new,
        key_cols=("o_orderkey",),
        tracked_cols=("o_orderstatus", "o_totalprice", "o_orderpriority"),
    )
    return diff.select(
        "operation",
        F.when(F.col("operation") == "U", F.array_join("changed", ",")).alias(
            "changed_cols"
        ),
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority",
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# --------------------------------------------------------------------------


@register(
    "j1_change_base_join",
    f"""
    WITH outbox AS ({_OUTBOX_SQL})
    SELECT o.version, o.operation, o.user_key, c.c_name, c.c_mktsegment
    FROM outbox o LEFT OUTER JOIN customer c ON o.user_key = c.c_custkey
    WHERE o.version > {WM}
    """,
)
def j1_change_base_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: change-side outer join to the base table — deletes survive with
    NULL base columns. The base/dim side is broadcast (small at any sf
    relative to the change stream)."""
    changes = cf.outbox_scan(_outbox(spark, sf_dir), WM)
    base = load(spark, sf_dir, "customer")
    return changes.join(
        F.broadcast(base), changes.user_key == base.c_custkey, "left_outer"
    ).select("version", "operation", "user_key", "c_name", "c_mktsegment")


@register(
    "j4_interval_overlap",
    """
    WITH iv AS (
      SELECT event_id, user_id, ts AS started_at,
             ts + to_seconds(CAST(value AS BIGINT)) AS ended_at
      FROM events)
    SELECT a.user_id AS env, a.event_id AS a_id, b.event_id AS b_id
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.started_at < b.ended_at AND b.started_at < a.ended_at
    """,
)
def j4_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: interval-overlap self-join — the reference's duplicate-poller
    stress oracle (DuplicatePollerStressTests.cs:74-82). Equijoin on the
    partition key (user) keeps the theta part local to each group."""
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        "user_id",
        F.col("ts").alias("started_at"),
        F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, CAST(value AS BIGINT))").alias(
            "ended_at"
        ),
    )
    a, b = iv.alias("a"), iv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("a.started_at") < F.col("b.ended_at"))
            & (F.col("b.started_at") < F.col("a.ended_at")),
        )
        .select(
            F.col("a.user_id").alias("env"),
            F.col("a.event_id").alias("a_id"),
            F.col("b.event_id").alias("b_id"),
        )
    )


# --------------------------------------------------------------------------
# Dead-letter monitor aggregations (SURVEY §2.4 A4-A6, §2.5 W2/W3, §2.6 D1)
# --------------------------------------------------------------------------

_ANCHOR = "2024-03-01 00:00:00"


@register(
    "a4_deadletter_windows",
    f"""
    SELECT count(*) AS total,
           count(CASE WHEN ts >= TIMESTAMP '{_ANCHOR}' - INTERVAL 1 HOUR THEN 1 END) AS last_hour,
           count(CASE WHEN ts >= TIMESTAMP '{_ANCHOR}' - INTERVAL 24 HOUR THEN 1 END) AS last_day,
           count(CASE WHEN ts >= TIMESTAMP '{_ANCHOR}' - INTERVAL 7 DAY THEN 1 END) AS last_week
    FROM events WHERE event_type = 'error' AND ts < TIMESTAMP '{_ANCHOR}'
    """,
)
def a4_deadletter_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: multi-window conditional counts in one pass (DeadLetterMonitor
    stats), error events standing in for dead letters."""
    ev = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "error") & (F.col("ts") < F.lit(_ANCHOR).cast("timestamp_ntz"))
    )
    anchor = F.lit(_ANCHOR).cast("timestamp_ntz")
    return ev.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("ts") >= anchor - F.expr("INTERVAL 1 HOUR"), 1)).alias("last_hour"),
        F.count(F.when(F.col("ts") >= anchor - F.expr("INTERVAL 24 HOUR"), 1)).alias("last_day"),
        F.count(F.when(F.col("ts") >= anchor - F.expr("INTERVAL 7 DAY"), 1)).alias("last_week"),
    )


@register(
    "a5_top_failing_objects",
    """
    SELECT user_id, count(*) AS failure_count
    FROM events WHERE event_type = 'error'
    GROUP BY user_id
    ORDER BY failure_count DESC, user_id
    LIMIT 5
    """,
)
def a5_top_failing_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: top-k failing objects — groupBy + ordered limit with a total
    tie-break so the k-th row is deterministic."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("failure_count"))
        .orderBy(F.desc("failure_count"), F.asc("user_id"))
        .limit(5)
    )


@register(
    "a6_most_common_error",
    """
    SELECT props AS error_message, count(*) AS occurrences
    FROM events WHERE event_type = 'error'
    GROUP BY props
    ORDER BY occurrences DESC, error_message
    LIMIT 1
    """,
)
def a6_most_common_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: most-common error message (mode with deterministic tie-break)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy(F.col("props").alias("error_message"))
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("error_message"))
        .limit(1)
    )


@register(
    "w3_replay_page",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events WHERE event_type = 'error'
    ORDER BY ts DESC, event_id DESC
    LIMIT 25 OFFSET 25
    """,
)
def w3_replay_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/W3: ordered bounded batch + pagination (replay queue / DLQ UI)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .select(
            "event_id", "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
        .offset(25)
        .limit(25)
    )


@register(
    "d1_dedup_content_hash",
    """
    SELECT event_id, user_id, event_type, value
    FROM (
      SELECT event_id, user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id, event_type, value
                                ORDER BY event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def d1_dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: content dedup — first event per (user, type, value) content key,
    deterministic keep-lowest-id (the DLQ's UNIQUE(SourceKey, DataHash))."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type", "value").orderBy("event_id")
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# Relational/analytics headliners over the TPC-H-ish tables (generic
# agg/join coverage; also the bench workload).
# --------------------------------------------------------------------------


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(20,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Aggregates accumulate in exact
    DECIMAL (order-independent) and convert to DOUBLE once at the end."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate <= TIMESTAMP_NTZ'1998-09-02 00:00:00'")
    )
    dec = lambda c: F.col(c).cast("decimal(20,6)")  # noqa: E731
    disc_price = F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))")
    charge = F.expr(
        "CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(20,6))"
    )
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
        (F.sum(dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def queries() -> dict[str, SparkQuery]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
