"""ADC-gated ingest on a real (clusterable) embedding manifold — VERDICT r8 #3.

``precision='adc'``'s certified-margin machinery had only ever run
against gaussian fixtures, where it correctly REFUSES (margin ≈ 1.32
swallows any threshold) — so the gate's decision path had never
executed end-to-end at scale. This tool closes that gap on the
``gen_wide.py --manifold product`` corpus (per-subspace planted
centers + small residuals — a corpus the PQ codebook can represent, so
the build certifies margin ≪ 0.1):

1. build ONE IVF-PQ index over the corpus, assert the certified margin
   actually admits the threshold (θ − margin > within-manifold noise),
2. CLONE it byte-for-byte (filesystem copy + attach) so the exact and
   adc gates evolve two identical indexes independently,
3. poll ``--cycles`` identical batches through BOTH gates — the soak
   mix (40% replayed ids / 30% ε-near-dups / 30% fresh *on-manifold*
   vectors synthesized from ``centers.parquet``; gaussian fresh would
   quantize at residual ~1.4 and correctly trip the drift widening),
4. after every cycle assert the two gates accepted EXACTLY the same
   vec_id set — the decision-parity oracle: |cos − adc_cos| ≤ margin
   one-sidedness means parity can only break if a true cosine lands in
   [θ − 2·margin, θ), which the product manifold makes unreachable,
5. print per-cycle wall times for both modes (the adc column is the
   ≤ ~10 s-warm target) and a summary line for BASELINE.md.

Usage: python tools/soak_adc_parity.py [--src .localdata/man768]
        [--cycles 8] [--batch 2000] [--name par768] [--threshold 0.9]
        [--skip-build] [--fold-tail-rows N] [--driver-mem 56g]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS = 0.0005  # per-component plant shift (the ingest soak's ε)


def clone_index(spark, src: str, dst: str) -> None:
    """Byte-identical index clone: copy the five table directories in
    the warehouse and re-register (attach recovers partition specs).
    Cheap next to a second build, and removes any doubt about whether
    two builds diverged."""
    from trignis_spark.operators import ivfpq_index as ipq

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ipq._all_tables(src):
        d = t.replace(src, dst, 1)
        spark.sql(f"DROP TABLE IF EXISTS {d}")
        dpath = os.path.join(wh, d.lower())
        shutil.rmtree(dpath, ignore_errors=True)
        shutil.copytree(os.path.join(wh, t.lower()), dpath)
    ipq.attach_ivfpq_index(spark, dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=".localdata/man768")
    ap.add_argument("--cycles", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument("--name", default="par768")
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=64,
                    help="PQ codes per subspace — keep >=8x the corpus's "
                         "k_man so seeding covers every planted center "
                         "(see gen_wide.py --k-man)")
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--train-rows", type=int, default=200_000,
                    help="sampled PQ training bound (the full m*N "
                         "subvector spread is ~14 GB of checkpoint "
                         "scratch at 2M x 768; 200k rows see every "
                         "planted center thousands of times over)")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--fold-tail-rows", type=int, default=None)
    ap.add_argument("--accepted", default=".localdata/par768_accepted")
    ap.add_argument("--driver-mem", default="56g")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from trignis_spark.operators import ivfpq_index as ipq

    if os.environ.get("SPARK_GRAFT_BAND_OFF"):
        # A/B hook (round 12): disarm the margin-band float gather so
        # the exact gate takes the classic broadcast-join scan over the
        # SAME build — the before-leg of the deferred-gather A/B.
        # Ingest's cache decision reads the same dial, so the disarmed
        # run also pins the float base exactly as round 11 did.
        ipq.BAND_MARGIN_MAX = -1.0
        print(json.dumps({"leg": "band", "armed": False}), flush=True)
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
    centers = spark.read.parquet(f"{args.src}/centers.parquet")
    m_man = centers.agg(F.max("sub")).first()[0] + 1
    k_man = centers.agg(F.max("cid")).first()[0] + 1
    n = emb.count()
    dims = len(emb.select("embedding").first()[0])

    name_ex, name_adc = args.name + "_ex", args.name + "_adc"
    if not args.skip_build:
        t0 = time.time()
        # full-corpus certified margin (the round-9 build default) —
        # the whole point of this leg is that the bound actually gates
        ipq.build_ivfpq_index(spark, emb, name_ex, m=args.m, k=args.k,
                              train_rows=args.train_rows)
        print(json.dumps({
            "leg": "build_ivfpq", "n": n, "dims": dims,
            "sec": round(time.time() - t0, 1),
        }), flush=True)
        t0 = time.time()
        clone_index(spark, name_ex, name_adc)
        print(json.dumps({"leg": "clone",
                          "sec": round(time.time() - t0, 1)}), flush=True)
    else:
        for nm in (name_ex, name_adc):
            if not spark.catalog.tableExists(nm):
                ipq.attach_ivfpq_index(spark, nm)
    margin = ipq.stored_adc_margin(spark, name_adc)
    eff = args.threshold - margin
    print(json.dumps({"leg": "margin", "adc_margin": round(margin, 5),
                      "threshold": args.threshold,
                      "eff_threshold": round(eff, 5)}), flush=True)
    assert margin < 0.1, (
        f"manifold did not certify: margin {margin:.3f} — the adc gate "
        "would refuse (is --src a --manifold product corpus?)"
    )

    for d in (args.accepted + "_ex", args.accepted + "_adc"):
        shutil.rmtree(d, ignore_errors=True)
    stats_ex: list[EmbeddingIngestStats] = []
    stats_adc: list[EmbeddingIngestStats] = []
    gate_ex = make_embedding_ingest_fn(
        spark, name_ex, args.accepted + "_ex",
        cos_threshold=args.threshold, nprobe=args.nprobe,
        stats=stats_ex, precision="exact", cache_index=True,
        fold_tail_rows=args.fold_tail_rows,
    )
    gate_adc = make_embedding_ingest_fn(
        spark, name_adc, args.accepted + "_adc",
        cos_threshold=args.threshold, nprobe=args.nprobe,
        stats=stats_adc, precision="adc", cache_index=True,
        fold_tail_rows=args.fold_tail_rows,
    )

    b = args.batch
    n_rep, n_dup = int(b * 0.4), int(b * 0.3)
    n_fresh = b - n_rep - n_dup
    stride = 1
    while stride <= n:
        stride *= 10
    # on-manifold fresh synthesis: per-subspace center via the SAME
    # id→code map as gen_wide.py's product manifold but a different
    # hash salt, + a tiny deterministic residual — new code
    # combinations, so nearest indexed cosines sit near shared/m ≪ θ
    packed = centers.agg(
        F.array_sort(F.collect_list(F.struct("sub", "cid", "cvec")))
        .alias("_cb")
    )
    fresh_expr = (
        f"flatten(transform(sequence(0, {m_man - 1}), s -> "
        f"element_at(filter(_cb, c -> c.sub = s AND c.cid = "
        f"pmod(hash(vec_id, s, 424243), {k_man})), 1).cvec))"
    )

    def fresh_batch(c: int, base_id: int):
        return (
            spark.range(n_fresh)
            .select((F.col("id") + F.lit(base_id)).alias("vec_id"))
            .crossJoin(F.broadcast(packed))
            .select(
                "vec_id",
                F.expr(
                    f"transform({fresh_expr}, (x, i) -> CAST(x + "
                    f"sin(CAST(hash(vec_id, i, {c}) AS DOUBLE)) * 0.005"
                    " AS FLOAT))"
                ).alias("embedding"),
            )
        )

    parity_ok = True
    t_ex, t_adc = [], []
    for c in range(args.cycles):
        replay = emb.filter(f"vec_id % 1009 = {c}").limit(n_rep)
        dup = (
            emb.filter(f"vec_id % 997 = {c}").limit(n_dup)
            .select(
                (F.col("vec_id") + F.lit(2 * 10 ** 12 + c * 10 ** 9))
                .alias("vec_id"),
                F.expr(
                    f"transform(embedding, x -> CAST(x + {EPS} AS FLOAT))"
                ).alias("embedding"),
            )
        )
        fresh = fresh_batch(c, 10 ** 12 + c * 10 ** 9)
        batch = replay.unionByName(dup).unionByName(fresh) \
            .localCheckpoint(eager=True)
        batch.count()

        t0 = time.time()
        gate_ex(batch, epoch_id=c)
        dt_ex = time.time() - t0
        t0 = time.time()
        gate_adc(batch, epoch_id=c)
        dt_adc = time.time() - t0
        t_ex.append(dt_ex)
        t_adc.append(dt_adc)

        def accepted_ids(path: str) -> set:
            # the gate writes only on accepting epochs — an all-reject
            # run (e.g. --skip-build against indexes that already
            # absorbed these ids) never creates the directory
            if not os.path.isdir(path):
                return set()
            return {r[0] for r in spark.read.parquet(path)
                    .filter(f"epoch_id = {c}").select("vec_id").collect()}

        acc_ex = accepted_ids(args.accepted + "_ex")
        acc_adc = accepted_ids(args.accepted + "_adc")
        same = acc_ex == acc_adc
        parity_ok = parity_ok and same
        se, sa = stats_ex[-1], stats_adc[-1]
        print(json.dumps({
            "cycle": c, "exact_sec": round(dt_ex, 2),
            "adc_sec": round(dt_adc, 2),
            "accepted": len(acc_ex), "near_dup": se.near_dup,
            "already_known": se.already_known,
            "decisions_match": same,
            "adc_margin": round(sa.adc_margin, 5),
            "exact_timings": se.timings, "adc_timings": sa.timings,
        }), flush=True)
        if not same:
            print(json.dumps({
                "leg": "parity_diff", "cycle": c,
                "only_exact": sorted(acc_ex - acc_adc)[:20],
                "only_adc": sorted(acc_adc - acc_ex)[:20],
            }), flush=True)

    warm_ex = t_ex[1:] if len(t_ex) > 1 else t_ex
    warm_adc = t_adc[1:] if len(t_adc) > 1 else t_adc
    print(json.dumps({
        "leg": "parity_summary", "cycles": args.cycles, "batch": b,
        "corpus": n, "dims": dims, "parity_ok": parity_ok,
        "adc_margin_final": round(
            ipq.stored_adc_margin(spark, name_adc), 5),
        "mean_warm_exact_sec": round(sum(warm_ex) / len(warm_ex), 2),
        "mean_warm_adc_sec": round(sum(warm_adc) / len(warm_adc), 2),
    }), flush=True)
    spark.stop()
    return 0 if parity_ok else 1


if __name__ == "__main__":
    sys.exit(main())
