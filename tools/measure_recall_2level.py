"""Measure blocking recall of the clustered near-dup forms against
brute-force ground truth at a scale factor (default sf0.1, the bench
corpus — the corpus behind BASELINE.md's recall table).

Ground truth is the exact all-pairs cosine at the threshold (O(N²) —
minutes at sf0.1, do not point this at sf1+); each operator's recall is
|found ∩ truth| / |truth|. Every operator's found set is also asserted
to be a subset of truth (exact verification ⇒ no false positives).

Usage: python tools/measure_recall_2level.py [--sf DIR] [--threshold 0.4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trignis_spark.operators import similarity as sim  # noqa: E402
from trignis_spark.session import get_spark  # noqa: E402
from trignis_spark.tables import load  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=0.4)
    args = ap.parse_args()

    spark = get_spark("recall-2level", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, args.sf, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    t = args.threshold

    base = emb.selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    ).withColumn("n2", F.expr(sim.NORM2.format(a="v")))
    a, b = base.alias("a"), base.alias("b")
    t0 = time.time()
    truth = {
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
    print(f"truth: {len(truth)} pairs at cos>={t} over {n} vectors "
          f"({time.time() - t0:.1f}s brute force)")

    def recall(name, df):
        t1 = time.time()
        got = {(r.d1, r.d2) for r in df.collect()}
        extra = got - truth
        assert not extra, f"{name}: {len(extra)} false positives?!"
        r = len(got) / len(truth) if truth else 1.0
        print(f"{name}: recall {r:.3f} ({len(got)}/{len(truth)}) "
              f"in {time.time() - t1:.1f}s")
        return r

    recall("flat k=16 (registry dials)",
           sim.cosine_near_dup_pairs_clustered(emb, t, k=16, assign_n=2))
    recall("2level 4x4 (registry dials)",
           sim.cosine_near_dup_pairs_clustered_2level(
               emb, t, k_coarse=4, k_fine=4, assign_n=2))
    auto = sim.auto_two_level_k(n)
    recall(f"2level auto {auto}x{auto}",
           sim.cosine_near_dup_pairs_clustered_2level(
               emb, t, k_coarse=None, k_fine=None, assign_n=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
