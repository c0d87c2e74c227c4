"""Per-query job/stage/task profile at a given sf dir.

For each named registry query: run it to completion via the noop sink
under a dedicated job group, then report wall seconds, Spark job count,
stage count and task count (from the status tracker). High job counts
on a small fixture flag driver-action overhead (collects / counts /
eager checkpoints) — the guide §1 "where is the time" question for a
latency-bound bench.

Usage: python tools/profile_queries.py [--sf DIR] [--queries a,b,c]
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
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None,
                    help="comma-separated names (default: bench set)")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark("profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    else:
        import bench

        names = bench.HEADLINE + [n for n in bench.OPTIONAL
                                  if n in q.QUERIES]

    # same warm-up discipline as bench.py
    registry["cf_batch_watermark"](spark, args.sf).collect()
    for probe_q in ("ann_ivfpq_probe", "dedup_index_probe"):
        if probe_q in names:
            registry[probe_q](spark, args.sf).write.mode(
                "overwrite").format("noop").save()

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        fn = registry[name]
        best = None
        for it in range(max(1, args.repeat)):
            group = f"prof_{name}_{it}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            try:
                fn(spark, args.sf).write.mode("overwrite").format(
                    "noop").save()
                dt = time.time() - t0
            except Exception:
                traceback.print_exc()
                dt = -1.0
            finally:
                spark.sparkContext.setJobGroup(None, None)
            jobs = tracker.getJobIdsForGroup(group)
            n_stages = n_tasks = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            rec = {"sec": round(dt, 3), "jobs": len(jobs),
                   "stages": n_stages, "tasks": n_tasks}
            # a failed first iteration (sec = -1) must be replaceable
            # by any later successful run (ADVICE r11)
            if best is None or best["sec"] <= 0 or \
                    (0 < rec["sec"] < best["sec"]):
                best = rec
        out[name] = best
        print(f"{name:44s} {best['sec']:8.3f}s  jobs={best['jobs']:3d} "
              f"stages={best['stages']:4d} tasks={best['tasks']:5d}",
              flush=True)
    print(json.dumps({"sf": args.sf, "profile": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
