"""Live-RDBMS parity run for the JDBC incremental source.

EXTERNAL ONLY: needs a reachable database (``docker compose up`` in this
directory) and the matching JDBC driver on the Spark classpath. The
build sandbox has neither; see README.md.

What it proves — per dialect, two independent read paths agree
row-for-row against a live database:

``--dialect postgres`` (default):
1. **pushdown path**: ``jdbc.read_incremental`` — the generated dialect
   SQL (``id > :wm AND xact_id < :horizon``) executes inside PostgreSQL,
   Spark receives only the change batch (optionally as partitioned
   version-range reads);
2. **filter path**: a plain full-outbox JDBC read with the same
   predicates applied Spark-side via ``changefeed.outbox_scan``.

``--dialect sqlserver``:
1. **pushdown path**: the generated ``CHANGETABLE(CHANGES t, @from)
   LEFT OUTER JOIN t`` executes inside SQL Server (the reference's
   load-bearing join, 02-stored-procedure.sqlserver.table.sql:31-56 —
   right-outer from the base side so deletes survive);
2. **join path**: the raw ``CHANGETABLE`` rows and the base table are
   read as two separate JDBC scans and joined *in Spark* with the same
   left-outer semantics and projection.

Identical results prove the generated SQL implements exactly the
reference's visibility contract rather than merely resembling it. Both
legs also probe S5 (server watermark); postgres additionally probes P3
(commit horizon — CT versions are commit-gated server-side, so SQL
Server has no horizon probe by design).

Usage:
    cd harness && docker compose up -d postgres
    spark-submit --packages org.postgresql:postgresql:42.7.4 \
        run_parity.py [--host localhost] [--from-version 100]

    cd harness && docker compose up -d mssql
    docker compose exec mssql /opt/mssql-tools18/bin/sqlcmd -C -U sa \
        -P 'Trignis!Harness1' -i /setup_changetracking.sql
    spark-submit --packages com.microsoft.sqlserver:mssql-jdbc:12.8.1.jre11 \
        run_parity.py --dialect sqlserver [--from-version 0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from trignis_spark.config import TrackingObject
from trignis_spark.operators import changefeed as cf
from trignis_spark.sources import jdbc

PG_USER = "trignis"
PG_PASSWORD = "trignis-harness"  # harness-local credential, see compose file
MSSQL_USER = "sa"
MSSQL_PASSWORD = "Trignis!Harness1"


def _compare(pushed_rows, other_rows, label: str) -> int:
    a = {tuple(r) for r in pushed_rows}
    b = {tuple(r) for r in other_rows}
    if a != b:
        print(f"MISMATCH ({label}): pushdown-only={len(a - b)} "
              f"other-only={len(b - a)}")
        for row in list(a ^ b)[:5]:
            print("  ", row)
        return 1
    print(f"PARITY OK ({label}): {len(a)} change rows identical on both paths")
    return 0


def run_postgres(spark: SparkSession, args) -> int:
    dialect = jdbc.DIALECTS["postgres"]
    url = dialect.jdbc_url(args.host, args.port or 5432, args.database)
    obj = TrackingObject(
        name="items",
        table_name="items_outbox",
        key_columns=("pk",),
        tracked_columns=("label", "qty", "price", "note"),
    )

    # S5 + P3 probes through the dialect's probe SQL
    probe = jdbc.JdbcOutboxSource(
        dialect=dialect, url=url, user=PG_USER, password=PG_PASSWORD
    )
    horizon = probe.probe_horizon(spark, obj)
    current = probe.probe_current_version(spark, obj)
    print(f"server watermark={current} commit horizon={horizon}")

    # path 1: generated pushdown SQL (partitioned version-range read)
    pushed = jdbc.read_incremental(
        spark, dialect, url, obj,
        from_version=args.from_version, horizon=horizon,
        user=PG_USER, password=PG_PASSWORD,
        version_bounds=(args.from_version, current),
    )

    # path 2: full outbox scan + Spark-side predicates
    full = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", dialect.driver)
        .option("user", PG_USER)
        .option("password", PG_PASSWORD)
        .option("dbtable", "items_outbox")
        .load()
        .withColumnRenamed("id", "version")
    )
    filtered = cf.outbox_scan(full, args.from_version, horizon).select(
        pushed.columns
    )
    return _compare(pushed.collect(), filtered.collect(), "postgres outbox")


def run_sqlserver(spark: SparkSession, args) -> int:
    from pyspark.sql import functions as F

    dialect = jdbc.DIALECTS["sqlserver"]
    url = (
        dialect.jdbc_url(args.host, args.port or 1433, args.database)
        + ";encrypt=true;trustServerCertificate=true"
    )
    obj = TrackingObject(
        name="items",
        table_name="dbo.items",
        key_columns=("pk",),
        tracked_columns=("label", "qty", "price", "note"),
    )

    def _read(query: str):
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", dialect.driver)
            .option("user", MSSQL_USER)
            .option("password", MSSQL_PASSWORD)
            .option("query", query)
            .load()
        )

    # S5 probe: server watermark (no P3 — CT versions are commit-gated
    # by snapshot isolation server-side, SqlDialect.horizon_sql is None)
    current = _read(dialect.current_version_sql).first()[0]
    print(f"server watermark={current} (change-tracking current version)")

    # path 1: the generated CHANGETABLE join, executed inside SQL Server
    pushed = jdbc.read_incremental(
        spark, dialect, url, obj,
        from_version=args.from_version,
        user=MSSQL_USER, password=MSSQL_PASSWORD,
    )

    # path 2: raw change rows + base table as two scans, joined in Spark
    # with the same deletes-survive outer-join semantics and projection
    changes = _read(
        "SELECT SYS_CHANGE_OPERATION AS operation, "
        "SYS_CHANGE_VERSION AS version, pk "
        f"FROM CHANGETABLE(CHANGES dbo.items, {args.from_version}) AS ct"
    )
    base = _read("SELECT pk, label, qty, price, note FROM dbo.items")
    joined = (
        changes.join(base, "pk", "left_outer")
        .select(
            "operation", "version", "pk",
            *[F.col(c) for c in ("label", "qty", "price", "note")],
        )
        .select(pushed.columns)
    )
    return _compare(
        pushed.collect(), joined.collect(), "sqlserver changetable"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dialect", choices=("postgres", "sqlserver"),
                    default="postgres")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=None,
                    help="default: 5432 (postgres) / 1433 (sqlserver)")
    ap.add_argument("--database", default="trignis")
    ap.add_argument("--from-version", type=int, default=100)
    ap.add_argument("--partitions", type=int, default=4)
    args = ap.parse_args()

    spark = SparkSession.builder.master("local[4]").appName(
        f"trignis-{args.dialect}-parity"
    ).getOrCreate()
    if args.dialect == "sqlserver":
        return run_sqlserver(spark, args)
    return run_postgres(spark, args)


if __name__ == "__main__":
    sys.exit(main())
