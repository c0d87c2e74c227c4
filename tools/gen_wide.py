"""Wide-dimensionality embedding corpus with planted near-dup pairs.

Every fixture and scale point so far used 64-dim vectors; production
embeddings are 768–4096-dim, and the broadcast gates were row-count
constants blind to that width until round 7 (VERDICT r6 #1). This tool
manufactures the missing evidence: a deterministic ``dims``-wide
gaussian corpus with ε-shifted copies planted every ``every``-th
vector (cos ≈ 1 − ~1e-6 at 768 dims — far above any tight threshold),
so the embedding serving paths can be measured at real widths with a
known ground-truth pair set:

    planted pairs = {(i, i + stride) : i % every == 0}

``stride`` is the first power of ten above n_base, so planted ids never
collide with base ids and recall is a set lookup. Everything is seeded
NumPy — re-running regenerates byte-identical parquet.

Usage: python tools/gen_wide.py [--n 100000] [--dims 768]
                                [--every 97] [--out .localdata/wide768]
"""

from __future__ import annotations

import argparse
import os
import sys

EPS = 1e-3  # same plant ε as the registry's planted-recall gates


def generate(n: int, dims: int, every: int, out: str,
             seed: int = 20260814) -> tuple[int, int]:
    import numpy as np
    import pandas as pd

    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, dims)).astype(np.float32)
    stride = 1
    while stride <= n:
        stride *= 10
    plant_src = np.arange(0, n, every)
    plants = base[plant_src] + np.float32(EPS)
    ids = np.concatenate([np.arange(n), plant_src + stride])
    mat = np.concatenate([base, plants])
    df = pd.DataFrame({"vec_id": ids.astype(np.int64),
                       "embedding": list(mat)})
    df.to_parquet(f"{out}/embeddings.parquet", index=False)
    return len(df), stride


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dims", type=int, default=768)
    ap.add_argument("--every", type=int, default=97)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "wide768"))
    args = ap.parse_args()
    total, stride = generate(args.n, args.dims, args.every, args.out)
    print(f"{args.out}/embeddings.parquet: {total} rows "
          f"({args.dims}-dim, plant stride {stride})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
