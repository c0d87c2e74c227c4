"""Wide-dimensionality embedding corpus with planted near-dup pairs.

Every fixture and scale point so far used 64-dim vectors; production
embeddings are 768–4096-dim, and the broadcast gates were row-count
constants blind to that width until round 7 (VERDICT r6 #1). This tool
manufactures the missing evidence in two manifold shapes:

- ``--manifold gaussian`` (default): a deterministic ``dims``-wide
  gaussian corpus — the PQ *worst case* (nothing for a codebook to
  exploit; a 2 M × 768 gaussian certifies adc_margin ≈ 1.32, which is
  exactly why the ADC gate refuses it).
- ``--manifold product``: a clusterable corpus a PQ codebook CAN
  represent (VERDICT r8 #3 — the fixture where ``precision='adc'``
  actually gates): each vector picks one of ``k_man`` centers per
  PQ subspace independently (hash-chosen) plus a small gaussian
  residual (``--sigma``). With k_man ≤ the index's k, every subspace
  concentrates on k_man patterns, so m=8/k=16 training certifies a
  margin ≈ σ·√dims/|x| ≪ 0.1 — while two *distinct* code combinations
  share ≈ 1/k_man of their subspaces and sit near cos ≈ shared/m:
  the [θ − 2·margin, θ) over-rejection band is unreachable by
  construction, so exact and ADC gate decisions must coincide.
  The per-subspace centers land in ``<out>/centers.parquet``
  (sub, cid, cvec) so downstream tools can synthesize *on-manifold*
  fresh vectors (a gaussian fresh vector would quantize at residual
  ~1.4 and — correctly — trip the extend drift-widening).

ε-shifted copies are planted every ``every``-th vector (cos ≈ 1 − ~1e-6
at 768 dims — far above any tight threshold), so the embedding serving
paths can be measured at real widths with a known ground-truth pair
set:

    planted pairs = {(i, i + stride) : i % every == 0}

``stride`` is the first power of ten above n_base, so planted ids never
collide with base ids and recall is a set lookup. Everything is seeded
NumPy — re-running regenerates byte-identical parquet. Large corpora
write chunked part files under ``embeddings.parquet/`` (a directory —
Spark and DuckDB both read it transparently).

Usage: python tools/gen_wide.py [--n 100000] [--dims 768]
                                [--every 97] [--out .localdata/wide768]
                                [--manifold gaussian|product]
                                [--k-man 16] [--sigma 0.005]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

EPS = 1e-3  # same plant ε as the registry's planted-recall gates

CHUNK = 200_000  # rows per written part file (≈ 600 MB of float32 @768)


def generate(n: int, dims: int, every: int, out: str,
             seed: int = 20260814, manifold: str = "gaussian",
             k_man: int = 16, m_man: int = 8,
             sigma: float = 0.005) -> tuple[int, int]:
    import numpy as np
    import pandas as pd

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(seed)
    stride = 1
    while stride <= n:
        stride *= 10

    centers = None
    if manifold == "product":
        sub = dims // m_man
        centers = rng.standard_normal((m_man, k_man, sub))
        # equal-norm centers: two vectors sharing j of m subspaces then
        # sit at cos ≈ j/m ± ~0.015 (cross-terms + residual) instead of
        # ± ~0.05 under χ²-variable norms — the decision band near a
        # 0.95 threshold is 5σ away from the j=m−1 level, so exact and
        # ADC gates cannot disagree on a borderline pair
        centers = (
            centers / np.linalg.norm(centers, axis=2, keepdims=True)
            * np.sqrt(sub)
        ).astype(np.float32)
        pd.DataFrame({
            "sub": [s for s in range(m_man) for _ in range(k_man)],
            "cid": [c for _ in range(m_man) for c in range(k_man)],
            "cvec": [centers[s, c].astype(np.float64)
                     for s in range(m_man) for c in range(k_man)],
        }).to_parquet(f"{out}/centers.parquet", index=False)

    def make_rows(ids: "np.ndarray") -> "np.ndarray":
        if manifold == "gaussian":
            return rng.standard_normal((len(ids), dims)).astype(np.float32)
        # product manifold: per-subspace center choice is a pure
        # function of the id (so a re-run of any chunking regenerates
        # the same vector for the same id), residual is seeded rng
        sub = dims // m_man
        mat = np.empty((len(ids), dims), np.float32)
        for s in range(m_man):
            # splitmix64 mix — a multiplicative-congruence map mod 16
            # degenerates (the multiplier is odd, so ids 16 apart got
            # identical combos in every subspace)
            z = (ids.astype(np.uint64)
                 + np.uint64(s) * np.uint64(0x9E3779B97F4A7C15))
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            codes = ((z ^ (z >> np.uint64(31)))
                     % np.uint64(k_man)).astype(np.int64)
            mat[:, s * sub:(s + 1) * sub] = centers[s][codes]
        mat += rng.standard_normal(mat.shape).astype(np.float32) * \
            np.float32(sigma)
        return mat

    emb_dir = f"{out}/embeddings.parquet"
    if os.path.isdir(emb_dir):
        shutil.rmtree(emb_dir)
    elif os.path.exists(emb_dir):
        os.remove(emb_dir)
    os.makedirs(emb_dir)
    total = 0
    part = 0
    for lo in range(0, n, CHUNK):
        ids = np.arange(lo, min(n, lo + CHUNK), dtype=np.int64)
        base = make_rows(ids)
        plant_src = ids[ids % every == 0]
        plants = base[(plant_src - lo)] + np.float32(EPS)
        chunk_ids = np.concatenate([ids, plant_src + stride])
        mat = np.concatenate([base, plants])
        # bounded row groups: pandas' default writes ONE row group per
        # part file (595 MB at 200 k × 768) — the minimum read unit for
        # every scan and for hadoop's vectored IO, whose 300 s range
        # fetch timed out on exactly these files under disk contention
        # (round 11). 16 Ki rows ≈ 50 MB at 768 dims keeps fetches and
        # row-group pruning sane at any width.
        pd.DataFrame({
            "vec_id": chunk_ids, "embedding": list(mat)
        }).to_parquet(f"{emb_dir}/part-{part:05d}.parquet", index=False,
                      row_group_size=16384)
        total += len(chunk_ids)
        part += 1
    return total, stride


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dims", type=int, default=768)
    ap.add_argument("--every", type=int, default=97)
    ap.add_argument("--manifold", choices=("gaussian", "product"),
                    default="gaussian")
    ap.add_argument("--k-man", type=int, default=8,
                    help="product manifold: centers per subspace. Keep "
                         "it WELL below the index k (≥8× slack): the "
                         "PQ trainer seeds k random corpus rows per "
                         "subspace, so covering every planted center "
                         "whp needs k·(1−1/k_man)^k ≈ 0 — k_man=8 with "
                         "k=64 leaves ~1%% miss probability, while "
                         "k_man=k=16 misses almost surely (measured "
                         "margin 0.91 instead of ~0.01)")
    ap.add_argument("--sigma", type=float, default=0.005,
                    help="product manifold: residual scale — the "
                         "certified margin lands near σ·√dims/|x|")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "wide768" if args.manifold == "gaussian" else "man768")
    total, stride = generate(args.n, args.dims, args.every, out,
                             manifold=args.manifold, k_man=args.k_man,
                             sigma=args.sigma)
    print(f"{out}/embeddings.parquet: {total} rows "
          f"({args.dims}-dim {args.manifold}, plant stride {stride})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
