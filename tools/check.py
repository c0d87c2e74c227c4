"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive multiset of
stringified rows (stricter than any reasonable value-hash the driver
could use). Usage:

    python tools/check.py [--sf /root/testdata/sf0.01] [--only name,name]

Runtime budget (local[32], 120 registered queries): expect ~2.5 min at
sf0.01 and ~8 min at sf0.1. A run drifting well past those numbers
means ONE query went runaway — bisect with --only rather than waiting
out a hung CI (the workflow's timeout-minutes is sized ~2× the sf0.01
budget). NOTE: --only silently ignores names not present in the
registry; verify spelling against __spark_entry__.queries().
"""

from __future__ import annotations

import argparse
import datetime as _dt
import decimal
import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from trignis_spark.session import get_spark  # noqa: E402
from trignis_spark.tables import TABLE_NAMES  # noqa: E402


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _rows_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def register_views(con, sf_dir: str) -> None:
    """Register the driver's parquet tables as DuckDB views, same names
    the driver's gate uses."""
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def check_one(spark, con, sf_dir, fn, oracle):
    """Run one registered query on Spark and its oracle on DuckDB and
    compare. Returns (status, problems): status in {'pass','weak'} and
    problems a list of human-readable mismatch strings (empty = green);
    pass/weak statuses carry the row count as 'pass:N'. 'weak' = no
    oracle registered, rows-only check (query must at least execute).
    Spark/DuckDB errors surface as problems, not exceptions — same
    contract as the driver's gate."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = sdf.collect()
    except Exception as e:  # noqa: BLE001
        return "fail", [f"spark error: {e}"]
    if oracle is None:
        return f"weak:{len(srows)}", []
    try:
        rel = con.sql(oracle)
        ocols = [d[0] for d in rel.description]
        orows = rel.fetchall()
    except Exception as e:  # noqa: BLE001
        return "fail", [f"duckdb error: {e}"]
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(
            f"columns spark={sorted(scols)} oracle={sorted(ocols)}"
        )
    if not problems:
        sm = _rows_multiset([tuple(r) for r in srows], scols)
        om = _rows_multiset(orows, ocols)
        if sm != om:
            extra_s = list((sm - om).items())[:3]
            extra_o = list((om - sm).items())[:3]
            problems.append(
                f"values differ; spark-only={extra_s} oracle-only={extra_o}"
            )
    return ("fail" if problems else f"pass:{len(srows)}"), problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    spark = get_spark("trignis-check")
    con = duckdb.connect()
    register_views(con, args.sf)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        status, problems = check_one(
            spark, con, args.sf, fn, oracles.get(name)
        )
        dt = time.time() - t0
        if status == "fail":
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        elif status.startswith("weak"):
            rows = status.split(":", 1)[1]
            print(f"WEAK {name}: rows={rows} (no oracle, rows-only check) "
                  f"({dt:.2f}s)")
            n_weak += 1
        else:
            print(f"PASS {name}: rows={status.split(':', 1)[1]} ({dt:.2f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
