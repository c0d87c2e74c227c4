"""Embedding ingestion gate soak at the 2 M-vector corpus — VERDICT r6 #6.

The text gate is soak-tested; the embedding gate
(``streaming/ingest.py::make_embedding_ingest_fn``) was unit-tested
only at toy scale. This drives it the way production would run it:

1. build the two-level ANN index ONCE over ``.localdata/sf1000e``
   (~2 M 64-dim vectors),
2. poll ``--cycles`` constant-size batches through the gate, each a
   realistic mix: 40% replayed ids (must dedup via the ids table),
   30% ε-near-dups of indexed vectors (must be rejected by the cosine
   gate), 30% genuinely fresh vectors (must be accepted + indexed
   exactly-once),
3. print per-cycle wall time, gate decisions, and the post-soak
   invariant (index grew by exactly the accepted count; no id twice).

Prints one JSON line per cycle + a summary line for BASELINE.md.

Usage: python tools/soak_embedding_ingest.py [--src .localdata/sf1000e]
        [--cycles 10] [--batch 2000] [--name soak2m_ann]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=".localdata/sf1000e")
    ap.add_argument("--cycles", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument("--name", default="soak2m_ann")
    ap.add_argument("--accepted", default=".localdata/soak2m_accepted")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing index of the same name")
    ap.add_argument("--family", choices=("ann", "ivfpq"), default="ann",
                    help="index family to build behind the gate; the "
                         "gate itself auto-detects which it got. At "
                         "wide dims the float probe is the cycle "
                         "(86 s of 95 s at 2 M x 768) while the ADC "
                         "probe reads m codes per candidate instead "
                         "of `dims` floats — BASELINE.md width-regime "
                         "note")
    ap.add_argument("--run-salt", type=int, default=0,
                    help="offsets the synthetic fresh/dup id ranges so "
                         "a --skip-build rerun against an index that "
                         "already absorbed a previous soak's accepts "
                         "still exercises accept+extend (same-salt "
                         "reruns dedup everything to already_known)")
    ap.add_argument("--precision", choices=("exact", "adc"),
                    default="exact",
                    help="gate scoring: exact re-ranked cosine, or "
                         "the quantized ADC cosine thresholded at "
                         "(threshold - certified margin) — IVF-PQ "
                         "indexes only; kills the per-cycle corpus-"
                         "float re-rank scan")
    ap.add_argument("--cache-index", action="store_true",
                    help="pin the index's serving tables in Spark "
                         "storage cache across cycles (sound under "
                         "the r8 tail design: extends never refresh "
                         "the base tables)")
    ap.add_argument("--driver-mem", default="56g",
                    help="JVM heap; leave headroom for Arrow/netty "
                         "direct buffers + Python workers (see "
                         "measure_wide.py --driver-mem)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from trignis_spark.operators import ann_index as ai
    from trignis_spark.streaming.ingest import (
        EmbeddingIngestStats, make_embedding_ingest_fn,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{args.src}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    dims = len(emb.select("embedding").first()[0])
    if not args.skip_build:
        t0 = time.time()
        if args.family == "ivfpq":
            from trignis_spark.operators import ivfpq_index as ipq

            ipq.build_ivfpq_index(spark, emb, args.name)
            print(json.dumps({"leg": "build_ivfpq", "n": n,
                              "sec": round(time.time() - t0, 1)}),
                  flush=True)
        else:
            from trignis_spark.operators.similarity import auto_two_level_k

            k = auto_two_level_k(n)  # r6 third-decade sizing (38x38 at 2M)
            ai.build_ann_index_2level(spark, emb, args.name, k, k)
            print(json.dumps({"leg": "build_2level", "n": n,
                              "cells": k * k,
                              "sec": round(time.time() - t0, 1)}),
                  flush=True)
    elif not spark.catalog.tableExists(args.name):
        # a fresh session's in-memory catalog forgot the persisted
        # index — re-register it (no-op under a shared metastore);
        # family-aware: an IVF-PQ index carries a _codes sidecar
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        wh = wh.removeprefix("file:")
        if os.path.isdir(os.path.join(wh, f"{args.name}_codes".lower())):
            from trignis_spark.operators import ivfpq_index as ipq

            ipq.attach_ivfpq_index(spark, args.name)
        else:
            ai.attach_ann_index(spark, args.name)
    base_ids = spark.table(ai._ids_table(args.name)).count()
    shutil.rmtree(args.accepted, ignore_errors=True)

    stats: list[EmbeddingIngestStats] = []
    gate = make_embedding_ingest_fn(
        spark, args.name, args.accepted, cos_threshold=0.95, nprobe=2,
        stats=stats, precision=args.precision,
        cache_index=args.cache_index,
    )

    b = args.batch
    n_replay, n_dup = int(b * 0.4), int(b * 0.3)
    n_fresh = b - n_replay - n_dup
    salt = args.run_salt * 10 ** 11
    fresh_base = 10 ** 12 + salt  # ids disjoint from corpus and plants
    dup_base = 2 * 10 ** 12 + salt
    expected_accept = 0
    times = []
    for c in range(args.cycles):
        # 40% replay: corpus ids (already indexed — ids-table dedup)
        replay = emb.filter(f"vec_id % 1009 = {c}").limit(n_replay)
        # 30% near-dups: ε-shifted copies of indexed vectors, new ids
        dup = (
            emb.filter(f"vec_id % 997 = {c}").limit(n_dup)
            .select(
                (F.col("vec_id") + F.lit(dup_base + c * 10 ** 9))
                .alias("vec_id"),
                F.expr(
                    "transform(embedding, x -> CAST(x + 0.0005 AS FLOAT))"
                ).alias("embedding"),
            )
        )
        # 30% genuinely fresh: deterministic pseudo-random vectors far
        # from everything (hash-derived components, unit-scale)
        # the salt must reach the CONTENT hash, not just the ids: a
        # re-run whose fresh vectors repeat a previous run's values is
        # (correctly) rejected by the cosine gate as all near-dups once
        # the index absorbed that run's accepts
        fresh = spark.range(n_fresh).select(
            (F.col("id") + F.lit(fresh_base + c * 10 ** 9))
            .alias("vec_id"),
            F.expr(
                "transform(sequence(1, %d), i -> CAST("
                "sin(CAST(hash(id, i, %d, %d) AS DOUBLE)) * 3.0 AS FLOAT))"
                % (dims, c, args.run_salt)
            ).alias("embedding"),
        )
        # materialize the synthetic batch BEFORE the timed call: the
        # replay/dup legs each scan the corpus parquet, and lazy
        # evaluation used to bill those driver-side scans to the
        # gate's first stage (~13 s/cycle at the 6.2 GB 768-dim
        # corpus, and >100 s when the page cache was cold — round 8's
        # first soak read misleadingly slow because of it)
        batch = replay.unionByName(dup).unionByName(fresh) \
            .localCheckpoint(eager=True)
        batch.count()
        t0 = time.time()
        gate(batch, epoch_id=c)
        dt = time.time() - t0
        times.append(dt)
        s = stats[-1]
        expected_accept += s.accepted
        print(json.dumps({
            "cycle": c, "sec": round(dt, 2),
            "arrived": s.arrived, "already_known": s.already_known,
            "near_dup": s.near_dup, "accepted": s.accepted,
            "rows_per_sec": round(s.arrived / dt, 1),
            "timings": s.timings,
        }), flush=True)

    # post-soak invariants: exactly-once index growth, no duplicate ids
    ids = spark.table(ai._ids_table(args.name))
    total, distinct = ids.count(), ids.select("vec_id").distinct().count()
    acc_rows = spark.read.parquet(args.accepted).count()
    ok = (total == base_ids + expected_accept and total == distinct
          and acc_rows == expected_accept)
    print(json.dumps({
        "leg": "soak_summary", "cycles": args.cycles, "batch": b,
        "corpus": n, "index_ids": total,
        "accepted_total": expected_accept,
        "exactly_once_ok": ok,
        "mean_cycle_sec": round(sum(times) / len(times), 2),
        "p_max_cycle_sec": round(max(times), 2),
    }), flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
