"""Scale-point runner: time a named subset of registry queries at a
given sf dir, one line per query, surviving per-query failures.

Unlike bench.py (the driver's one-JSON-line contract), this prints
progress as it goes and records errors instead of dying — built for the
sf1/sf10 scale-point measurements where a single cliff or OOM shouldn't
lose the rest of the table.

Usage: python tools/bench_subset.py --sf .localdata/sf10 q1,q2,...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trignis_spark import queries as q  # noqa: E402
from trignis_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".localdata/sf10")
    ap.add_argument("names", help="comma-separated registry query names")
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    unknown = [n for n in names if n not in q.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()

    # Warm file listing + JVM once, same as bench.py.
    registry["cf_batch_watermark"](spark, args.sf).collect()
    for probe_q in ("ann_ivfpq_probe", "dedup_index_probe"):
        if probe_q in names:
            t0 = time.time()
            registry[probe_q](spark, args.sf).write.mode(
                "overwrite"
            ).format("noop").save()
            print(f"# {probe_q} index build+probe (cold): "
                  f"{time.time() - t0:.2f}s", flush=True)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        try:
            registry[name](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            timings[name] = round(time.time() - t0, 2)
            print(f"{name:40s} {timings[name]:8.2f}s", flush=True)
        except Exception:
            timings[name] = -1.0
            print(f"{name:40s}   FAILED after "
                  f"{time.time() - t0:.1f}s", flush=True)
            traceback.print_exc()

    print(json.dumps({"sf": args.sf, "queries": timings,
                      "total": round(sum(v for v in timings.values()
                                         if v > 0), 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
