"""Decade-5 measured leg: IVF-PQ at 100 M vectors (round 8).

VERDICT r7 #4 scoped decade 5 analytically (200 M does not fit this
sandbox) and measured the binding dial occupancy-equivalently on the
decade-4 index. This tool closes the remaining gap with a REAL corpus
a decade past 20 M, sized to fit: the vectors are a *computed*
DataFrame (hash-derived components, same recipe as the ingest soak's
fresh vectors) so the source costs zero disk — only the index tables
land on disk (~30 GB at 100 M × 64-dim), and two build-path walls the
analytic pass predicted are exercised for real:

- ``train_rows`` (sampled PQ training): the full m×N subvector spread
  is ~72 GB of localCheckpoint scratch at 100 M — the build cannot
  complete without it;
- explicit ``n_buckets`` past the 4096 auto-cap: decade 5 is where the
  file-count cap binds hardest (√100M wants 16 384).

Legs printed as one JSON line each:
1. build (train_rows=1 M, n_buckets per --n-buckets),
2. probe 2 000 planted queries at --nprobe (twin recall = ground truth:
   each planted query's true neighbor is its ε-source),
3. probe again at an nprobe whose scanned-codes/query matches the
   CAPPED-4096 layout at the same corpus — the direct validation of
   round 8's occupancy-equivalence method,
4. extend with a fresh computed batch (the per-poll-cycle serving
   cost: ids anti-join + frozen-codebook encode + append).

Usage: python tools/measure_decade5.py [--n 100000000] [--dims 64]
         [--every 997] [--name d5_ivfpq] [--n-buckets 16384]
         [--queries 2000] [--nprobe 2] [--skip-build]
         [--driver-mem 56g]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS = 0.0005  # same per-component plant shift as the ingest soak


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--dims", type=int, default=64)
    ap.add_argument("--every", type=int, default=997)
    ap.add_argument("--name", default="d5_ivfpq")
    ap.add_argument("--n-buckets", type=int, default=16384)
    ap.add_argument("--train-rows", type=int, default=1_000_000)
    ap.add_argument("--margin-rows", type=int, default=1_000_000,
                    help="ADC-margin certification sample (statistical "
                         "bound — see build_ivfpq_index); the round-9 "
                         "full-corpus default would add a corpus-sized "
                         "vec_id join to a leg that gates in exact "
                         "mode and never uses the margin")
    ap.add_argument("--queries", type=int, default=2000)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--shortlist", type=int, default=30)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--skip-equiv", action="store_true")
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--gate-cycles", type=int, default=0,
                    help="run N embedding-ingest-gate poll cycles "
                         "against the index (2000-row batches: 40%% "
                         "replay / 30%% ε-near-dup / 30%% fresh, the "
                         "soak mix) with cache_index=True — the "
                         "decade-5 poll-cycle cost")
    ap.add_argument("--gate-cache", choices=("pin", "none"),
                    default="pin",
                    help="pin: cacheTable the serving tables "
                         "(r8-default — fits while index < heap; the "
                         "39 GB 100M float table OOMs a 56 GB heap); "
                         "none: rely on the OS page cache (128 GB box "
                         "holds the parquet bytes; Spark-level pin is "
                         "the wrong layer once corpus > heap)")
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

    n, dims, every = args.n, args.dims, args.every
    stride = 1
    while stride <= n:
        stride *= 10

    def computed(ids_df, shift: float = 0.0):
        add = f" + CAST({shift} AS FLOAT)" if shift else ""
        return ids_df.select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {dims}), i -> CAST("
                f"sin(CAST(hash(id, i) AS DOUBLE)) * 3.0{add} AS FLOAT))"
            ).alias("embedding"),
        )

    base = computed(spark.range(n))
    # plants: ε-shifted copies of every --every-th base vector, ids
    # offset by the first power of ten above n (hash(id, i) is seeded
    # from the SOURCE id so the twin pair shares its components)
    plant_ids = spark.range(0, n, every)
    plants = computed(plant_ids, shift=EPS).select(
        (F.col("vec_id") + F.lit(stride)).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(plants)
    n_total = n + (n + every - 1) // every

    if not args.skip_build:
        t0 = time.time()
        ipq.build_ivfpq_index(
            spark, corpus, args.name, m=8, k=16,
            n_buckets=args.n_buckets, train_rows=args.train_rows,
            margin_rows=args.margin_rows,
        )
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        du = subprocess.run(["du", "-s"] + [
            os.path.join(wh, t.lower()) for t in ipq._all_tables(args.name)
        ], capture_output=True, text=True).stdout
        disk_kb = sum(int(l.split()[0]) for l in du.splitlines() if l)
        print(json.dumps({
            "leg": "build_ivfpq", "n": n_total, "dims": dims,
            "n_buckets": args.n_buckets, "train_rows": args.train_rows,
            "sec": round(time.time() - t0, 1),
            "index_gb": round(disk_kb / 2**20, 1),
        }), flush=True)
    elif not spark.catalog.tableExists(args.name):
        ipq.attach_ivfpq_index(spark, args.name)

    occupancy = n_total / args.n_buckets

    def probe_leg(tag: str, nprobe: int) -> None:
        # planted queries: the ground-truth neighbor of plant id
        # (src + stride) is src itself at cos ≈ 1 − ~1e-8
        qids = spark.range(0, args.queries * every, every)
        queries = computed(qids, shift=EPS).select(
            (F.col("vec_id") + F.lit(stride)).alias("vec_id"), "embedding"
        ).localCheckpoint(eager=True)
        nq = queries.count()
        t0 = time.time()
        got = ipq.ivfpq_probe(
            spark, args.name, queries, k=10, nprobe=nprobe,
            shortlist=args.shortlist,
        )
        hits = got.filter(
            f"neighbor_id = query_id - {stride}"
        ).count()
        dt = time.time() - t0
        print(json.dumps({
            "leg": tag, "queries": nq, "nprobe": nprobe,
            "codes_per_query": int(nprobe * occupancy),
            "sec": round(dt, 1), "ms_per_query": round(dt * 1000 / nq, 1),
            "twin_recall_at_10": round(hits / nq, 4),
        }), flush=True)

    if not args.skip_probe:
        probe_leg("probe", args.nprobe)
    if not args.skip_equiv and not args.skip_probe:
        # scanned-codes parity with the capped-4096 layout at this
        # corpus: occupancy_capped = n_total/4096, so nprobe_eq =
        # nprobe * (n_buckets/4096) scans the same codes/query
        np_eq = max(1, args.nprobe * args.n_buckets // 4096)
        if np_eq != args.nprobe:
            probe_leg("probe_capped_equiv", np_eq)

    # extend leg: one poll-cycle-sized fresh batch (computed, ids
    # disjoint from corpus and plants)
    batch = computed(
        spark.range(3 * stride, 3 * stride + 10_000)
    )
    t0 = time.time()
    added = ipq.extend_ivfpq_index(spark, batch, args.name)
    print(json.dumps({
        "leg": "extend", "batch": 10_000, "added": added,
        "sec": round(time.time() - t0, 1),
    }), flush=True)

    if args.gate_cycles:
        from trignis_spark.streaming.ingest import (
            EmbeddingIngestStats, make_embedding_ingest_fn,
        )

        stats: list[EmbeddingIngestStats] = []
        gate = make_embedding_ingest_fn(
            spark, args.name, ".localdata/d5_gate_accepted",
            cos_threshold=0.95, nprobe=args.nprobe, stats=stats,
            cache_index=(args.gate_cache == "pin"),
        )
        b = 2000
        n_rep, n_dup = int(b * 0.4), int(b * 0.3)
        for c in range(args.gate_cycles):
            rep = computed(
                spark.range(c * 10_000, c * 10_000 + n_rep * 29, 29)
                .limit(n_rep)
            )
            dup = computed(
                spark.range(c * 7_000, c * 7_000 + n_dup * 31, 31)
                .limit(n_dup), shift=EPS,
            ).select(
                (F.col("vec_id") + F.lit(5 * stride + c * 10**7))
                .alias("vec_id"), "embedding",
            )
            fr = spark.range(n_fresh := b - n_rep - n_dup).select(
                (F.col("id") + F.lit(7 * stride + c * 10**7))
                .alias("vec_id"),
                F.expr(
                    f"transform(sequence(1, {dims}), i -> CAST("
                    f"sin(CAST(hash(id, i, {c}, 777) AS DOUBLE)) * 3.0"
                    " AS FLOAT))"
                ).alias("embedding"),
            )
            bdf = rep.unionByName(dup).unionByName(fr) \
                .localCheckpoint(eager=True)
            bdf.count()
            t0 = time.time()
            gate(bdf, epoch_id=c)
            s = stats[-1]
            print(json.dumps({
                "leg": "gate_cycle", "cycle": c,
                "sec": round(time.time() - t0, 2),
                "already_known": s.already_known, "near_dup": s.near_dup,
                "accepted": s.accepted, "timings": s.timings,
            }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
