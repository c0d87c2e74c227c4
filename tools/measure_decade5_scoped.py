"""Decade-5 (200 M-vector) scoping — VERDICT r7 #4, the analytic-first
pass.

A 200 M × 64-dim corpus is 51 GB of parquet; with ~54 GB free and the
same disk doubling as shuffle scratch, a full decade-5 tiling does not
fit this sandbox. The one dial that BINDS at 200 M is the IVF-PQ
4096-cell file-count cap (``auto_n_buckets`` saturates at 16.7 M
vectors): past it, per-probed-cell codes grow linearly — 48 828 at
200 M vs 4 882 at the measured 20 M. Everything else holds
analytically (band layout valid to 10⁹; the capped sweep's exchange
partitioning and the verify gate are byte-budgeted, not row-budgeted).

Probe cost is linear in SCANNED CODES = nprobe × occupancy (the ADC
scan is the probe; LUT build and re-rank are per-query constants), so
the decade-5 probe cost at the capped layout is measured
OCCUPANCY-EQUIVALENTLY on the real 20 M index: nprobe 20 × occ 4 882
scans the same 97.7 k codes/query that nprobe 2 × occ 48 828 would at
200 M. The nprobe sweep below gives the scan-cost line and its
nprobe-20 point IS the decade-5 estimate; the extend/ids legs scale
linearly in corpus rows (map-side scans, no shuffle) and are measured
at 20 M for the ×10 extrapolation.

Usage: python tools/measure_decade5_scoped.py [--queries 2000]
       (requires the decade-4 index ``sf10000_ivfpq`` from
        tools/measure_decade4.py; queries come from the index's own
        float table, so the source corpus parquet is not needed)
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
    ap.add_argument("--name", default="sf10000_ivfpq")
    ap.add_argument("--queries", type=int, default=2000)
    ap.add_argument("--nprobes", default="2,10,20")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from trignis_spark.operators import ivfpq_index as ipq
    from trignis_spark.session import get_spark

    spark = get_spark("d5-scoped", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    ipq.attach_ivfpq_index(spark, args.name)
    meta = spark.table(f"{args.name}_meta").first()
    n_codes = spark.table(f"{args.name}_codes").count()
    occ = n_codes // meta["n_buckets"]
    print(json.dumps({"leg": "layout", "corpus_codes": n_codes,
                      "n_buckets": int(meta["n_buckets"]),
                      "mean_occ": int(occ)}), flush=True)

    # queries come from the index's own float table: ``v`` is the
    # exact float→double widening of the source embedding, so the
    # cast back to float is the original vector bit-for-bit (the
    # corpus parquet need not exist for a serving-cost measurement)
    emb = spark.table(args.name).select(
        "vec_id",
        F.expr("transform(v, x -> CAST(x AS FLOAT))").alias("embedding"),
    )
    q = (
        emb.filter("vec_id % 9973 = 1").limit(args.queries)
        .localCheckpoint(eager=True)
    )
    nq = q.count()
    for np_ in (int(x) for x in args.nprobes.split(",")):
        # warm + measured run: the first probe pays file listing for
        # the pruned partitions; serving refreshes stay warm
        for tag in ("cold", "warm"):
            t0 = time.time()
            rows = ipq.ivfpq_probe(spark, args.name, q, k=10,
                                   nprobe=np_, shortlist=30).count()
            print(json.dumps({
                "leg": f"probe_nprobe{np_}_{tag}", "queries": nq,
                "rows": rows, "scanned_codes_per_query": int(np_ * occ),
                "sec": round(time.time() - t0, 1),
            }), flush=True)

    # per-cycle ids anti-join (the ingest dedup term): map-side scan of
    # the full ids table — linear in corpus rows, so the 200 M cost is
    # 10x this wall on the same plan
    from trignis_spark.plans.bucketing import batch_anti_join

    known = spark.table(f"{args.name}_ids")
    batch = q.select((F.col("vec_id") + F.lit(1 << 44)).alias("vec_id"))
    t0 = time.time()
    n_fresh = batch_anti_join(batch, known, "vec_id").count()
    print(json.dumps({"leg": "ids_anti_join", "batch": nq,
                      "fresh": n_fresh,
                      "sec": round(time.time() - t0, 1)}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
