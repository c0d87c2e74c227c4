"""Embedding near-duplicate detection: every operating point, one demo.

Runs the four blocking strategies over the driver's embeddings table
and reports pairs found + recall against brute-force ground truth, so
the recall/cost menu in BASELINE.md is reproducible in one command:

- tight threshold (cos ≥ 0.9): ``cosine_near_dup_pairs_banded`` —
  62-bit sign signature, 16 overlapping 12-bit bands, in-join Hamming
  prefilter. The production form for dedup at the usual operating
  point; near-linear at the sf10 corpus.
- loose threshold (cos ≥ 0.4), flat: ``cosine_near_dup_pairs_clustered``
  — trained k-means cells, top-2 multi-assign. Assignment is brute N·k,
  so the √N cell dial walls at ~10⁶ vectors.
- loose threshold, scale path: ``cosine_near_dup_pairs_clustered_2level``
  — hierarchical quantizer (√k coarse × k fine), 2×2 multi-assign,
  N·2√k assignment. Higher recall than flat at matched cell count
  (BASELINE.md r6 table) and the only loose-threshold form that
  completes the sf10 corpus.
- diagnostic: ``cosine_near_dup_pairs`` (fixed sign-LSH bands) — the
  saturating baseline the production forms replace.

    python examples/run_embedding_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trignis_spark.operators import similarity as sim
from trignis_spark.session import get_spark
from trignis_spark.tables import load


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("embedding-dedup-demo")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    print(f"corpus: {n} vectors from {sf_dir}")

    base = emb.selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    ).withColumn("n2", F.expr(sim.NORM2.format(a="v")))

    def truth_at(t: float) -> set:
        a, b = base.alias("a"), base.alias("b")
        return {
            (r.d1, r.d2)
            for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("d1"),
                F.col("b.vec_id").alias("d2"),
                (
                    F.expr(sim.DOT.format(a="a.v", b="b.v"))
                    / F.sqrt(F.col("a.n2") * F.col("b.n2"))
                ).alias("cos"),
            )
            .filter(F.col("cos") >= t)
            .collect()
        }

    def show(name: str, df, truth: set) -> None:
        t0 = time.time()
        got = {(r.d1, r.d2) for r in df.collect()}
        rec = len(got & truth) / len(truth) if truth else 1.0
        print(
            f"  {name:38s} pairs={len(got):6d}  recall={rec:5.3f}  "
            f"({time.time() - t0:.1f}s)"
        )
        assert got <= truth, "exact verification must forbid false positives"

    for t, forms in (
        (0.9, [("banded prod (62-bit sig, 16x12)",
                sim.cosine_near_dup_pairs_banded(emb, threshold=0.9))]),
        (0.4, [
            ("flat clustered k=16",
             sim.cosine_near_dup_pairs_clustered(emb, threshold=0.4, k=16)),
            ("2-level clustered (auto cells)",
             sim.cosine_near_dup_pairs_clustered_2level(
                 emb, threshold=0.4, k_coarse=None, k_fine=None)),
            ("fixed 4x4 sign bands (diagnostic)",
             sim.cosine_near_dup_pairs(emb, threshold=0.4)),
        ]),
    ):
        truth = truth_at(t)
        print(f"threshold cos >= {t}: {len(truth)} true pairs")
        for name, df in forms:
            show(name, df, truth)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
