"""Wide-dimensionality (768-dim) proof leg — VERDICT r6 #1.

Runs the embedding serving paths over the ``tools/gen_wide.py`` corpus
(default: 100 k base vectors + ~1 k planted ε-copies at 768 dims) and
reports wall time + planted recall for each:

- banded near-dup (auto layout; and the wide-signature form) at
  cos ≥ 0.9 — the corpus exceeds the 768-dim byte-budgeted broadcast
  ceiling (~86.7 k rows), so the exact-verify takes the shuffle
  fallback: this leg is the first real exercise of that path.
- two-level clustered near-dup, capped sweep (cap_m=8) at cos ≥ 0.9 —
  the loose-threshold machinery at real width (planted pairs are the
  only structure a gaussian corpus has, so recall is measured at the
  plant's cosine).
- IVF-PQ build (auto √N cells) + probe: recall@10 of each planted
  source's twin among the probe results.

Prints one JSON line per leg; paste the table into BASELINE.md.

Usage: python tools/measure_wide.py [--src .localdata/wide768]
                                    [--every 97] [--legs banded,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recover_plants(emb, n_base: int):
    """Planted (base_id, base_id + stride) pairs: stride is the first
    power of ten above n_base (gen_wide.py's id scheme)."""
    stride = 1
    while stride <= n_base:
        stride *= 10
    plant_ids = {r.vec_id for r in
                 emb.filter(f"vec_id >= {stride}").select("vec_id").collect()}
    return {(p - stride, p) for p in plant_ids}, stride


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=".localdata/wide768")
    ap.add_argument("--n-base", type=int, default=100_000)
    ap.add_argument("--legs", default="banded,banded_wide,capped,ivfpq")
    ap.add_argument("--capped-cells", type=int, default=32,
                    help="k_coarse = k_fine for the capped leg "
                         "(cells = k^2; size ~ sqrt(N x slots / "
                         "target_occ) per level)")
    ap.add_argument("--cap-m", type=int, default=8)
    ap.add_argument("--driver-mem", default="56g",
                    help="JVM heap. NOT most-of-the-box: at 2 M x 768 "
                         "an 80g heap got OS-OOM-killed at 101.9 GB "
                         "java RSS (heap + ~20 GB Arrow/netty direct "
                         "buffers) with 32 Python workers alongside; "
                         "a smaller heap spills instead — same cluster "
                         "lesson as executor memoryOverhead")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from trignis_spark.operators import ivfpq_index as ipq
    from trignis_spark.operators import similarity as sim

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        # 256, not 64: the capped leg's grouped-map exchange is
        # ~rows × dims × 4 B (~30 GB at 2 M × 768) and the reduce-side
        # group sort spills its WHOLE partition once a partition
        # outgrows task execution memory — at 64 partitions (~470 MB
        # each) the spill doubled peak scratch and filled the disk;
        # at 256 (~120 MB) the sorts stay in memory and peak disk is
        # the exchange alone
        .config("spark.sql.shuffle.partitions", "256")
        # zstd beats lz4 ~10% on float-array shuffle blocks — margin,
        # not the fix
        .config("spark.io.compression.codec", "zstd")
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{args.src}/embeddings.parquet")
    n_total = emb.count()
    dims = len(emb.select("embedding").first()[0])
    plants, stride = recover_plants(emb, args.n_base)
    print(f"# corpus {n_total} vectors, {dims}-dim, "
          f"{len(plants)} planted pairs, "
          f"verify broadcast ceiling at this width = "
          f"{sim._verify_broadcast_rows(dims)} rows "
          f"({'SHUFFLE' if n_total > sim._verify_broadcast_rows(dims) else 'broadcast'} path)",
          flush=True)
    legs = set(args.legs.split(","))

    def report(leg, secs, found=None, extra=None):
        row = {"leg": leg, "dims": dims, "n": n_total,
               "sec": round(secs, 1)}
        if found is not None:
            rec = len(found & plants) / len(plants)
            row["recall"] = round(rec, 4)
            row["false_pairs"] = len(found - plants)
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    if "banded" in legs:
        t0 = time.time()
        got = {(r.d1, r.d2) for r in sim.cosine_near_dup_pairs_banded(
            emb, threshold=0.9).collect()}
        report("banded_auto", time.time() - t0, got)

    if "banded_wide" in legs:
        t0 = time.time()
        got = {(r.d1, r.d2) for r in sim.cosine_near_dup_pairs_banded(
            emb, threshold=0.9, wide=True).collect()}
        report("banded_wide", time.time() - t0, got)

    if "capped" in legs:
        # default 32×32 cells instead of the auto 18×18: an isotropic
        # gaussian corpus under first-k seeding skews cell occupancy
        # ~17× (max 21 259 vs mean 1 250 at 18×18 — measured), and
        # more cells is the right dial here — the cap keeps output
        # linear at any cell count (see the operator's skew note). At
        # 2 M × 768 pass --capped-cells 128 (16 384 cells ⇒ ~490 mean
        # occupancy) so the Σ occupancy²·dims scoring stays bounded.
        kc = args.capped_cells
        t0 = time.time()
        got = {(r.d1, r.d2) for r in
               sim.cosine_near_dup_pairs_clustered_capped(
                   emb, threshold=0.9, k_coarse=kc, k_fine=kc,
                   cap_m=args.cap_m).collect()}
        report(f"clustered_capped_m{args.cap_m}_{kc}x{kc}",
               time.time() - t0, got)

    if "ivfpq" in legs:
        name = "wide768_ivfpq"
        t0 = time.time()
        ipq.build_ivfpq_index(spark, emb, name, m=8, k=16)
        t_build = time.time() - t0
        q = emb.filter(f"vec_id >= {stride}")  # the plants probe
        t0 = time.time()
        topk = ipq.ivfpq_probe(spark, name, q, k=10, nprobe=2,
                               shortlist=30)
        hits = {(r.neighbor_id, r.query_id) for r in topk.collect()}
        t_probe = time.time() - t0
        found = hits & plants
        report("ivfpq", t_build, None,
               {"build_sec": round(t_build, 1),
                "probe_sec": round(t_probe, 1),
                "twin_recall_at10": round(len(found) / len(plants), 4)})

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
