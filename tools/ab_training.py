"""Interleaved A/B runner for the round-12 training-bundle decomposition.

Runs the six training-heavy queries plus two untouched drift controls,
labelling each query as its own job group so the per-query Spark job
count is recorded next to the wall time (a regression that shows up as
extra driver-side jobs — per-round collects, checkpoints, probe jobs —
is visible directly instead of inferred from wall-clock).

Usage: python tools/ab_training.py --state <label> [--sf DIR] [--out FILE]

The state label is free text naming which file-state the working tree
holds (e.g. "head", "pre1701", "preS"); the harness that alternates
states is the shell loop in OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trignis_spark import queries as q  # noqa: E402
from trignis_spark.session import get_spark  # noqa: E402

CONTROLS = ["tpch_q18_large_orders", "dedup_ngram_jaccard"]
TRAINING = [
    "emb_kmeans_quantizer",
    "emb_pq_codebook",
    "ann_ivfpq_topk",
    "dedup_embedding_cosine_clustered",
    "dedup_embedding_cosine_clustered_scaled",
    "dedup_embedding_cosine_clustered_capped",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None,
                    help="append one JSON line per run to this file")
    args = ap.parse_args()

    spark = get_spark("ab-training")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    tracker = spark.sparkContext.statusTracker()

    # Warm JVM + file listing (same as bench.py) so per-query numbers
    # measure the pipelines, not session startup.
    registry["cf_batch_watermark"](spark, args.sf).collect()

    rec: dict[str, dict] = {}
    for name in CONTROLS + TRAINING:
        spark.sparkContext.setJobGroup(name, name)
        times = []
        for _ in range(2):
            t0 = time.time()
            registry[name](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            times.append(round(time.time() - t0, 3))
        jobs = len(tracker.getJobIdsForGroup(name)) // 2
        # first execution pays JVM/Python-worker warmup (measured ~15 s
        # extra on the capped sweep's grouped map in a cold JVM); the
        # best-of-2 is the comparable per-state number
        rec[name] = {"sec": min(times), "first": times[0], "jobs": jobs}
        print(f"{name:42s} {min(times):7.3f}s (first {times[0]:.3f})  "
              f"jobs={jobs}", flush=True)

    line = json.dumps({"state": args.state, "t": round(time.time(), 1),
                       "queries": rec})
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
