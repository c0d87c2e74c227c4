"""Isolated mega-cell sub-split probe measurement — VERDICT r10 #2.

Round 10's query-side hash chunks spread a skewed cell's CANDIDATES
over tasks, but every union leg still re-scanned the whole cell and
the mega-cell's file count still bounded scan parallelism. Round 11's
build-side sub-split (``CELL_SPLIT_FACTOR``) stores hash sub-cells as
separate partition directories, so the scan itself parallelizes. The
done-criterion is "probe wall on the product manifold insensitive to
max occupancy": this tool builds TWO indexes over the same corpus —
one with the sub-split disabled (``split_factor=None``), one with the
default — reports each build's max/mean cell occupancy and partition
sizes, then times the same probe-only rerank-free ADC batch warm on
both (the r10 isolated-measurement shape: 2 000 replayed corpus
vectors as queries, ``rerank=False``, ``include_score=True``), and
asserts the two probes' result sets are BIT-identical (the sub-split
must never change candidates, only scan parallelism).

Usage: python tools/measure_cell_split.py [--src .localdata/man768]
        [--batch 2000] [--runs 4] [--m 8] [--k 64] [--nprobe 2]
        [--train-rows 200000] [--skip-build] [--driver-mem 56g]
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
    ap.add_argument("--src", default=".localdata/man768")
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--train-rows", type=int, default=200_000)
    ap.add_argument("--margin-rows", type=int, default=200_000,
                    help="sampled ADC-margin certification: this leg "
                         "measures probe wall, not gate decisions, so "
                         "the statistical bound is fine and saves a "
                         "full-corpus reconstruction pass per build")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--driver-mem", default="56g")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from trignis_spark.operators import ivfpq_index as ipq

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.src, "embeddings.parquet"))

    names = {"nosplit": None, "split": ipq.CELL_SPLIT_FACTOR}
    tables = {lbl: f"csplit_{lbl}" for lbl in names}
    if not args.skip_build:
        for lbl, sf in names.items():
            t0 = time.time()
            ipq.build_ivfpq_index(
                spark, emb, tables[lbl], m=args.m, k=args.k,
                train_rows=args.train_rows, margin_rows=args.margin_rows,
                split_factor=sf,
            )
            print(json.dumps({"leg": f"build_{lbl}",
                              "sec": round(time.time() - t0, 1)}),
                  flush=True)
    else:
        for lbl in names:
            ipq.attach_ivfpq_index(spark, tables[lbl])

    for lbl in names:
        occ = (
            spark.table(ipq._codes_table(tables[lbl]))
            .groupBy("bucket").count()
            .agg(F.max("count").alias("mx"),
                 F.avg("count").alias("mean"),
                 F.count(F.lit(1)).alias("cells"))
            .first()
        )
        print(json.dumps({
            "leg": f"occupancy_{lbl}", "max": occ["mx"],
            "mean": round(occ["mean"], 1), "partitions": occ["cells"],
        }), flush=True)

    # the r10 isolated shape: replayed corpus vectors as the query
    # batch (every query has true neighbors => realistic candidate
    # volume), probe-only, rerank-free, ADC scores included
    queries = (
        emb.filter(F.col("vec_id") % 997 == 0)
        .limit(args.batch)
        .localCheckpoint(eager=True)
    )
    results = {}
    for lbl in names:
        walls = []
        for r in range(args.runs + 1):  # +1 warmup, dropped
            t0 = time.time()
            out = ipq.ivfpq_probe(
                spark, tables[lbl], queries, k=10, nprobe=args.nprobe,
                rerank=False, include_score=True,
            )
            n = out.count()
            w = round(time.time() - t0, 2)
            if r:
                walls.append(w)
            print(json.dumps({"leg": f"probe_{lbl}", "run": r,
                              "warm": bool(r), "sec": w, "rows": n}),
                  flush=True)
        results[lbl] = walls

    a = ipq.ivfpq_probe(spark, tables["nosplit"], queries, k=10,
                        nprobe=args.nprobe, rerank=False,
                        include_score=True).collect()
    b = ipq.ivfpq_probe(spark, tables["split"], queries, k=10,
                        nprobe=args.nprobe, rerank=False,
                        include_score=True).collect()
    ident = sorted(tuple(r) for r in a) == sorted(tuple(r) for r in b)
    print(json.dumps({
        "leg": "summary",
        "bit_identical": ident,
        "warm_nosplit": results["nosplit"],
        "warm_split": results["split"],
        "min_nosplit": min(results["nosplit"]),
        "min_split": min(results["split"]),
    }), flush=True)
    return 0 if ident else 1


if __name__ == "__main__":
    sys.exit(main())
