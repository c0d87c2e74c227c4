"""Reproduce the BASELINE.md hot-shingle index comparison.

Builds both persistent near-dup index layouts over (a) the sf10 tiled
documents corpus (benign shingle df) and (b) a synthetic
boilerplate-heavy corpus where every document opens with the same
12-word header — the regime real web/code corpora live in — then times
a 50-doc probe against each. Asserts the two layouts return identical
pairs before reporting.

Usage: python tools/bench_hot_shingles.py [--sf .localdata/sf10]
       (generate the sf dir first: python tools/gen_sf.py --copies 100
        --out .localdata/sf10)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trignis_spark.operators import dedup_index as di  # noqa: E402
from trignis_spark.session import get_spark  # noqa: E402
from trignis_spark.tables import load  # noqa: E402

BOILER = ("terms of service apply to this document please read "
          "carefully before use")


def _measure(spark, corpus, batch, tag: str) -> None:
    t0 = time.time()
    di.build_index(spark, corpus, f"hot_{tag}_v1")
    t_b1 = time.time() - t0
    t0 = time.time()
    di.build_prefix_index(spark, corpus, f"hot_{tag}_v2", threshold=0.8)
    t_b2 = time.time() - t0

    def run(fn):
        fn().count()  # warm
        t0 = time.time()
        rows = {(r.batch_doc, r.corpus_doc, round(r.jaccard, 9))
                for r in fn().collect()}
        return rows, time.time() - t0

    p1, t1 = run(lambda: di.probe_index(spark, f"hot_{tag}_v1", batch, 0.8))
    p2, t2 = run(lambda: di.probe_prefix_index(
        spark, f"hot_{tag}_v2", batch, 0.8))
    assert p1 == p2, f"layouts disagree on {tag}: {len(p1)} vs {len(p2)}"
    print(f"{tag}: build v1 {t_b1:.1f}s / v2 {t_b2:.1f}s; "
          f"probe ({len(p1)} pairs) v1 {t1:.2f}s / v2 {t2:.2f}s")
    for t in (f"hot_{tag}_v1", f"hot_{tag}_v2"):
        for s in ("", "_full", "_docs", "_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{s}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".localdata/sf10")
    ap.add_argument("--n-boiler", type=int, default=200_000)
    args = ap.parse_args()

    spark = get_spark("hot-shingles")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, args.sf, "documents")
    _measure(
        spark,
        docs.filter("doc_id % 100 <> 0"),
        docs.filter("doc_id % 10000 = 7"),
        "benign",
    )

    adv = spark.createDataFrame(
        [(i, BOILER + f" unique tail {i} alpha{i % 997} beta{i % 131} "
                      f"gamma{i % 17} delta epsilon zeta")
         for i in range(args.n_boiler)],
        "doc_id long, text string",
    )
    _measure(
        spark,
        adv,
        adv.filter("doc_id % 4000 = 1"),
        "boilerplate",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
