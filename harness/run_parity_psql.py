"""Live-PostgreSQL parity leg over the psql transport.

The build sandbox gained a local PostgreSQL 15 server but still has no
JDBC driver jar and no network, so the Spark-JDBC transport
(``run_parity.py``) remains unrunnable here. This leg executes
everything the JDBC transport would ask the *server* to do against a
real PostgreSQL via psql/COPY:

1. the harness outbox DDL + capture trigger (``setup_outbox.sql``) —
   the reference's change-capture contract
   (01-change-tracking-setup.postgres.sql semantics) on a live engine;
2. the **generated pushdown SQL** (``jdbc.incremental_query`` — the
   exact string the JDBC source ships, byte-pinned by
   tests/test_sources.py) executed server-side over a real I/U/D
   workload;
3. the **S5 watermark probe** and **P3 commit-horizon probe** SQL;
4. parity: the server-executed pushdown batch must match Spark running
   ``changefeed.outbox_scan`` (version + horizon predicates applied
   Spark-side) over the full outbox, row-for-row;
5. live horizon semantics: rows committed after a horizon probe carry
   ``xact_id >= horizon`` and are excluded by that horizon's scan,
   then picked up by the next probe's — the defer-don't-skip contract
   (reference 02-stored-procedure.postgres.table.sql:58-60).

Only the JDBC wire itself stays unexercised (no driver jar); the SQL,
the trigger contract, and the predicate parity are proven live.

Usage (bootstraps a scratch cluster under /tmp as an unprivileged
user when PGDATA is absent; requires local postgres 13+ binaries):

    python harness/run_parity_psql.py [--keep-server]
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PGDATA = "/tmp/trignis_pg"
PGPORT = "54329"
PGHOST = "/tmp"
PGUSER = "trignis"
RUN_AS = "nobody"  # postgres refuses uid 0; the scratch cluster runs unprivileged

ENV = {**os.environ, "PGHOST": PGHOST, "PGPORT": PGPORT,
       "PGUSER": PGUSER, "PGDATABASE": "postgres"}


def _su(cmd: str) -> None:
    subprocess.run(["su", "-s", "/bin/sh", RUN_AS, "-c", cmd],
                   check=True, cwd="/tmp")


def ensure_server() -> None:
    if not os.path.isdir(PGDATA):
        os.makedirs(PGDATA)
        subprocess.run(["chown", RUN_AS, PGDATA], check=True)
        _su(f"/usr/local/bin/initdb -D {PGDATA} -U {PGUSER} --auth=trust")
    alive = subprocess.run(
        ["psql", "-At", "-c", "SELECT 1"], env=ENV,
        capture_output=True,
    ).returncode == 0
    if not alive:
        _su(f"/usr/local/bin/pg_ctl -D {PGDATA} -l {PGDATA}.log "
            f"-o '-p {PGPORT} -k {PGHOST} -c listen_addresses=' start")


def stop_server() -> None:
    _su(f"/usr/local/bin/pg_ctl -D {PGDATA} stop -m fast")


def sql(stmt: str) -> str:
    out = subprocess.run(["psql", "-X", "-At", "-c", stmt], env=ENV,
                         check=True, capture_output=True, text=True)
    return out.stdout.strip()


def sql_file(path: str) -> None:
    subprocess.run(["psql", "-X", "-q", "-v", "ON_ERROR_STOP=1",
                    "-f", path], env=ENV, check=True)


def copy_csv(select: str, path: str) -> None:
    with open(path, "w") as f:
        subprocess.run(
            ["psql", "-X", "-c",
             f"COPY ({select}) TO STDOUT WITH (FORMAT csv, HEADER)"],
            env=ENV, check=True, stdout=f,
        )


OUTBOX_SHAPE = ("SELECT id AS version, xact_id, operation, pk, changed, "
                "label, qty, price, note FROM items_outbox")

CSV_SCHEMA = ("version long, xact_id long, operation string, pk long, "
              "changed string, label string, qty string, price string, "
              "note string")


def workload(tag: str, n: int = 40) -> None:
    """Deterministic I/U/D mix across several transactions — the
    trigger writes one outbox row per statement-row."""
    for base in range(0, n, 10):
        stmts = ["BEGIN"]
        for i in range(base, base + 10):
            stmts.append(
                f"INSERT INTO items (label, qty, price, note) VALUES "
                f"('{tag}-{i}', {i}, {i}.50, NULL)"
            )
        stmts.append("COMMIT")
        sql("; ".join(stmts))
    sql(f"UPDATE items SET qty = qty + 1, note = '{tag}-touched' "
        f"WHERE qty % 3 = 0")
    sql("DELETE FROM items WHERE qty % 7 = 0")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep-server", action="store_true")
    args = ap.parse_args()

    ensure_server()
    rc = 0
    try:
        sql("DROP DATABASE IF EXISTS trignis")
        sql("CREATE DATABASE trignis")
        ENV["PGDATABASE"] = "trignis"
        sql_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "setup_outbox.sql"))
        workload("alpha")

        from trignis_spark.config import TrackingObject
        from trignis_spark.operators import changefeed as cf
        from trignis_spark.session import get_spark
        from trignis_spark.sources import jdbc

        dialect = jdbc.DIALECTS["postgres"]
        obj = TrackingObject(
            name="items", table_name="items_outbox", key_columns=("pk",),
            tracked_columns=("label", "qty", "price", "note"),
        )

        # S5: the dialect's watermark probe, executed live
        current = int(sql(dialect.current_version_sql.format(
            outbox=obj.table_name)))
        truth = int(sql("SELECT COALESCE(MAX(id), 0) FROM items_outbox"))
        assert current == truth, (current, truth)
        print(f"PARITY OK (S5 watermark probe): server watermark={current}")

        # P3: the dialect's commit-horizon probe, executed live
        h1 = int(sql(dialect.horizon_sql))
        print(f"probe: commit horizon={h1}")

        # rows committed AFTER the h1 probe must carry xact_id >= h1
        workload("beta")
        late_min_xact = int(sql(
            f"SELECT MIN(xact_id) FROM items_outbox WHERE id > {current}"))
        assert late_min_xact >= h1, (late_min_xact, h1)
        print(f"PARITY OK (P3 ordering): post-probe commits have "
              f"xact_id >= {h1} (min seen {late_min_xact})")

        spark = get_spark("pg-parity", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

        failures = 0
        for label, from_version, horizon in (
            ("full history, no horizon", 0, None),
            ("full history, horizon h1", 0, h1),
            ("incremental from mid-watermark", current // 2, None),
            ("incremental + horizon", current // 2, h1),
        ):
            # path 1: the GENERATED pushdown SQL executes in PostgreSQL
            pushed_sql = jdbc.incremental_query(
                dialect, obj, from_version, horizon)
            copy_csv(pushed_sql, "/tmp/pg_pushdown.csv")
            pushed = spark.read.csv("/tmp/pg_pushdown.csv", header=True,
                                    schema=CSV_SCHEMA)
            # path 2: full outbox export + Spark-side predicates
            copy_csv(OUTBOX_SHAPE, "/tmp/pg_full.csv")
            full = spark.read.csv("/tmp/pg_full.csv", header=True,
                                  schema=CSV_SCHEMA)
            filtered = cf.outbox_scan(full, from_version, horizon)
            a = {tuple("" if v is None else str(v) for v in r)
                 for r in pushed.collect()}
            b = {tuple("" if v is None else str(v) for v in r)
                 for r in filtered.collect()}
            if a != b:
                print(f"MISMATCH ({label}): pushdown-only={len(a - b)} "
                      f"spark-only={len(b - a)}")
                failures += 1
            else:
                print(f"PARITY OK ({label}): {len(a)} change rows "
                      f"identical on both paths")

        # defer-don't-skip: the h1-gated scan excluded the beta rows;
        # a fresh horizon picks them up
        h2 = int(sql(dialect.horizon_sql))
        deferred = jdbc.incremental_query(dialect, obj, current, h1)
        picked = jdbc.incremental_query(dialect, obj, current, h2)
        n_deferred = int(sql(f"SELECT COUNT(*) FROM ({deferred}) s"))
        n_picked = int(sql(f"SELECT COUNT(*) FROM ({picked}) s"))
        n_beta = int(sql(
            f"SELECT COUNT(*) FROM items_outbox WHERE id > {current}"))
        assert n_deferred == 0 and n_picked == n_beta, (
            n_deferred, n_picked, n_beta)
        print(f"PARITY OK (P3 defer-don't-skip): horizon {h1} defers all "
              f"{n_beta} post-probe rows; horizon {h2} delivers them")

        spark.stop()
        rc = 1 if failures else 0
    finally:
        if not args.keep_server:
            stop_server()
    print("RESULT", "FAIL" if rc else "PASS")
    return rc


if __name__ == "__main__":
    sys.exit(main())
