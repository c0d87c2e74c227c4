"""Live-PostgreSQL parity run for the JDBC incremental source.

EXTERNAL ONLY: needs a reachable PostgreSQL (``docker compose up`` in
this directory) and the PostgreSQL JDBC driver on the Spark classpath.
The build sandbox has neither; see README.md.

What it proves — the two read paths agree row-for-row against a live
database:

1. **pushdown path**: ``jdbc.read_incremental`` — the generated
   dialect SQL (``id > :wm AND xact_id < :horizon``) executes inside
   PostgreSQL, Spark receives only the change batch (optionally as
   partitioned version-range reads);
2. **filter path**: a plain full-outbox JDBC read with the same
   predicates applied Spark-side via ``changefeed.outbox_scan``.

Identical results prove the generated SQL implements exactly the
reference's visibility contract (version watermark + commit horizon,
``02-stored-procedure.postgres.table.sql:43-60``) rather than merely
resembling it. Also probes S5 (server watermark) and P3 (horizon).

Usage:
    cd harness && docker compose up -d
    spark-submit --packages org.postgresql:postgresql:42.7.4 \
        run_parity.py [--host localhost] [--from-version 100]
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

USER = "trignis"
PASSWORD = "trignis-harness"  # harness-local credential, see compose file


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=5432)
    ap.add_argument("--database", default="trignis")
    ap.add_argument("--from-version", type=int, default=100)
    ap.add_argument("--partitions", type=int, default=4)
    args = ap.parse_args()

    spark = SparkSession.builder.master("local[4]").appName(
        "trignis-pg-parity"
    ).getOrCreate()
    dialect = jdbc.DIALECTS["postgres"]
    url = dialect.jdbc_url(args.host, args.port, args.database)
    obj = TrackingObject(
        name="items",
        table_name="items_outbox",
        key_columns=("pk",),
        tracked_columns=("label", "qty", "price", "note"),
    )

    # S5 + P3 probes through the dialect's probe SQL
    probe = jdbc.JdbcOutboxSource(
        dialect=dialect, url=url, user=USER, password=PASSWORD
    )
    horizon = probe.probe_horizon(spark, obj)
    current = probe.probe_current_version(spark, obj)
    print(f"server watermark={current} commit horizon={horizon}")

    # path 1: generated pushdown SQL (partitioned version-range read)
    pushed = jdbc.read_incremental(
        spark, dialect, url, obj,
        from_version=args.from_version, horizon=horizon,
        user=USER, password=PASSWORD,
        version_bounds=(args.from_version, current),
    )

    # path 2: full outbox scan + Spark-side predicates
    full = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", dialect.driver)
        .option("user", USER)
        .option("password", PASSWORD)
        .option("dbtable", "items_outbox")
        .load()
        .withColumnRenamed("id", "version")
    )
    filtered = cf.outbox_scan(full, args.from_version, horizon).select(
        pushed.columns
    )

    a = {tuple(r) for r in pushed.collect()}
    b = {tuple(r) for r in filtered.collect()}
    if a != b:
        print(f"MISMATCH: pushdown-only={len(a - b)} filter-only={len(b - a)}")
        for row in list(a ^ b)[:5]:
            print("  ", row)
        return 1
    print(f"PARITY OK: {len(a)} change rows identical on both paths")
    return 0


if __name__ == "__main__":
    sys.exit(main())
