"""Recall-vs-cap curve for the bounded clustered sweep — VERDICT r6 #3.

Runs ``cosine_near_dup_pairs_clustered_capped`` at several ``cap_m``
values against the UNCAPPED two-level sweep's pair set (the ground
truth the cap trades against) on a corpus where the full sweep is
feasible (default: the 200 k-vector sf10 tiling, where the uncapped
form measures ~340 s). Prints one JSON line per cap for BASELINE.md.

Usage: python tools/measure_capped_recall.py [--src .localdata/sf10]
        [--caps 1,2,4,8,16] [--threshold 0.4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=".localdata/sf10")
    ap.add_argument("--caps", default="1,2,4,8,16")
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--kc", type=int, default=None)
    ap.add_argument("--kf", type=int, default=None)
    ap.add_argument("--skip-truth", action="store_true",
                    help="only time the capped runs (no recall)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from trignis_spark.operators import similarity as sim
    from trignis_spark.tables import load

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "80g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, args.src, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    kc = args.kc or sim.auto_two_level_k(n)
    kf = args.kf or kc
    print(f"# corpus {n} vectors, {kc}x{kf} cells, "
          f"threshold {args.threshold}", flush=True)

    truth = None
    if not args.skip_truth:
        t0 = time.time()
        truth = {(r.d1, r.d2) for r in
                 sim.cosine_near_dup_pairs_clustered_2level(
                     emb, args.threshold, k_coarse=kc, k_fine=kf,
                     assign_n=2).collect()}
        print(json.dumps({"leg": "uncapped_truth", "n": n,
                          "pairs": len(truth),
                          "sec": round(time.time() - t0, 1)}), flush=True)

    for cap in (int(c) for c in args.caps.split(",")):
        t0 = time.time()
        got = {(r.d1, r.d2) for r in
               sim.cosine_near_dup_pairs_clustered_capped(
                   emb, args.threshold, k_coarse=kc, k_fine=kf,
                   assign_n=2, cap_m=cap).collect()}
        row = {"leg": f"capped_m{cap}", "n": n, "pairs": len(got),
               "sec": round(time.time() - t0, 1)}
        if truth is not None:
            row["recall_vs_uncapped"] = round(
                len(got & truth) / max(1, len(truth)), 4)
            row["false_pairs"] = len(got - truth)
        print(json.dumps(row), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
