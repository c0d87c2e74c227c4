"""Fourth-decade spot check (20 M vectors): banded near-dup + IVF-PQ.

VERDICT r6 #7 — each prior decade (200 k, 2 M) exposed a real
saturation point; this leg probes the next one. Embeddings-only
corpus: ``tools/gen_sf.py``'s ``_tile_embeddings`` ×10 000 over the
driver's sf0.1 table (~5 GB on disk, 20 M 64-dim vectors), generated
on first run into ``.localdata/sf10000e``.

Legs (each fenced so one failure doesn't mask the others):

1. **Banded near-dup with planted ε-pairs** — every 97th corpus
   vector gets a +1e-3 per-component twin under a disjoint id range;
   recall is counted exactly (planted pair ⇔ d2 − d1 = STRIDE and
   d1 % 97 = 0). Exercises ``auto_band_layout`` one decade past the
   2 M leg (wide signatures, ~19-bit bands) and the byte-budgeted
   verify gate at 20 M rows.
2. **IVF-PQ build + probe** — exercises ``auto_n_buckets`` where the
   4096-cell cap binds (√20M ≈ 4472), the packed-projection
   assignment at that cell count, and dynamic partition pruning on
   the cell-partitioned layout at ~1000 probe queries.

Counts pairs in ONE aggregation pass (no driver collect of the pair
set — at 20 M the within-copy near-dup pairs replicate 10 000× and
the set is millions of rows).

Usage: SPARK_GRAFT_DRIVER_MEM=80g python tools/measure_decade4.py
        [--src .localdata/sf10000e] [--skip-banded] [--skip-ivfpq]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANT_STRIDE = 1 << 40  # id offset for planted twins; disjoint from corpus ids


def ensure_corpus(src: str) -> None:
    path = os.path.join(src, "embeddings.parquet")
    if os.path.exists(path):
        return
    import duckdb

    from tools.gen_sf import _stride, _tile_embeddings

    os.makedirs(src, exist_ok=True)
    con = duckdb.connect()
    stride = _stride(con, "/root/testdata/sf0.1", "embeddings", ["vec_id"])
    t0 = time.time()
    n = _tile_embeddings("/root/testdata/sf0.1", src, 10000, stride)
    print(f"RESULT corpus generated n={n} stride={stride} "
          f"time={time.time() - t0:.0f}s", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=".localdata/sf10000e")
    ap.add_argument("--skip-banded", action="store_true")
    ap.add_argument("--skip-ivfpq", action="store_true")
    args = ap.parse_args()

    ensure_corpus(args.src)

    from pyspark.sql import functions as F

    from trignis_spark.operators import ivfpq_index as ipq
    from trignis_spark.operators import similarity as sim
    from trignis_spark.session import get_spark

    spark = get_spark("decade4", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{args.src}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    print(f"RESULT corpus n={n}", flush=True)
    print(f"RESULT auto_n_buckets(n)={ipq.auto_n_buckets(n)} "
          f"(sqrt rule wants {int(n ** 0.5)})", flush=True)

    ok = True
    if not args.skip_banded:
        try:
            plant = emb.filter("vec_id % 97 = 0").select(
                (F.col("vec_id") + F.lit(PLANT_STRIDE)).alias("vec_id"),
                F.expr("transform(embedding, x -> x + 1e-3D)")
                .alias("embedding"),
            )
            n_plant = plant.count()
            corpus = emb.unionByName(plant)
            nb, bb = sim.auto_band_layout(n + n_plant, 0.9, wide=True)
            print(f"RESULT banded layout bands={nb} bits={bb}", flush=True)
            t0 = time.time()
            pairs = sim.cosine_near_dup_pairs_banded(corpus, threshold=0.9)
            agg = pairs.agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(
                    (
                        (F.col("d2") - F.col("d1") == F.lit(PLANT_STRIDE))
                        & (F.col("d1") % 97 == 0)
                    ).cast("long")
                ).alias("found"),
            ).first()
            el = time.time() - t0
            print(f"RESULT banded planted={n_plant} found={agg['found']} "
                  f"recall={(agg['found'] or 0) / n_plant:.4f} "
                  f"total_pairs={agg['total']} time={el:.1f}s", flush=True)
        except Exception:
            traceback.print_exc()
            print("RESULT banded FAILED", flush=True)
            ok = False

    if not args.skip_ivfpq:
        try:
            name = "sf10000_ivfpq"
            ipq._drop_stale(spark, name)
            t0 = time.time()
            ipq.build_ivfpq_index(spark, emb, name, m=8, k=16)
            cells = spark.table(ipq._meta_table(name)).first()["n_buckets"]
            print(f"RESULT ivfpq build cells={cells} "
                  f"time={time.time() - t0:.1f}s", flush=True)
            q = emb.filter("vec_id % 20000 = 0")  # ~1000 probe queries
            for run in ("cold", "warm"):
                t0 = time.time()
                cnt = ipq.ivfpq_probe(spark, name, q, k=10, nprobe=1,
                                      shortlist=30).count()
                print(f"RESULT ivfpq probe {run} rows={cnt} "
                      f"time={time.time() - t0:.1f}s", flush=True)
        except Exception:
            traceback.print_exc()
            print("RESULT ivfpq FAILED", flush=True)
            ok = False

    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
