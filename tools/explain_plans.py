"""Dump ``.explain("formatted")`` for registry queries to files.

Usage:
    python tools/explain_plans.py --out plans/r11 --suffix before \
        [--only name,name] [--sf /root/testdata/sf0.1]

Writes ``<out>/<name>_<suffix>.txt`` per query. Plan-only — builds each
DataFrame and formats its physical plan without executing it (probe
queries still pay their index build/meta reads at plan time, same as
any consumer). Queries whose *plan construction* fails are recorded
with the traceback so the sweep survives.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trignis_spark import queries as q  # noqa: E402
from trignis_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    spark = get_spark("explain-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    only = {s for s in args.only.split(",") if s}
    os.makedirs(args.out, exist_ok=True)

    for name, fn in registry.items():
        if only and name not in only:
            continue
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        try:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "PLAN FAILED\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
