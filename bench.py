"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is executed to completion via the no-op sink (full pipeline
runs — scan, shuffle, agg — without driver-side collect overhead).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from trignis_spark import queries as q
from trignis_spark.session import default_parallelism, get_spark

# Headline set: the change-feed hot path + the heaviest relational,
# dedup, similarity and text operators. Names must exist in q.QUERIES.
HEADLINE = [
    "cf_outbox_scan",
    "cf_column_mask",
    "cf_snapshot_diff",
    "j1_change_base_join",
    "d1_dedup_content_hash",
    "tpch_q1_pricing_summary",
]
# Optional entries appended as the inventory grows; missing names skipped.
OPTIONAL = [
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_effect",
    "tpch_q18_large_orders",
    "a3_ordered_export",
    "cf_apply_changes",
    "j6_asof_join",
    "j7_range_join",
    "rollup_daily_cascade",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_scaled",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_scaled",
    "dedup_embedding_cosine_prod",
    "dedup_embedding_cosine_clustered",
    "ann_cosine_topk",
    "text_quality_score",
    "corpus_build",
    "sample_stratified",
    "dlq_due_for_replay",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q13_order_distribution",
    "tpch_q17_small_quantity",
    "tpch_q21_waiting_suppliers",
    "sessionize_events_scaled",
    "corpus_pack_sequences_scaled",
    "ann_ivfpq_topk",
    "ann_ivfpq_probe",
    "ann_ivfpq_probe_adc",
    "text_bm25_topk",
    "agg_exact_percentiles",
    "dedup_index_probe",
    "dedup_embedding_cosine_clustered_scaled",
    "dedup_embedding_cosine_prod_wide",
    "dedup_embedding_cosine_prod_wide768",
    "dedup_embedding_cosine_clustered_capped",
    # core-scaling probe: the one compute-bound row at fixture scale,
    # so the driver's low-vs-high-core comparison has a query whose
    # ratio reflects parallelism (round 12 — see the query docstring)
    "ann_cosine_allpairs",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=None,
        help="scale-factor dir (overrides $SPARK_GRAFT_SF_DIR); e.g. "
        ".localdata/sf1 from tools/gen_sf.py",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated registry names to run instead of the "
        "headline set (for scale-point runs over a subset, e.g. the "
        "scaled/production shapes at sf10)",
    )
    ap.add_argument(
        "--best-of",
        type=int,
        default=1,
        metavar="N",
        help="run the timed sweep N times and report each query's "
        "MINIMUM — the standard noisy-box discipline (round 9's "
        "driver box ran the UNTOUCHED query set 1.42x slower than "
        "round 7's, swamping per-query code drift in one-shot runs); "
        "the driver's recorded run stays N=1",
    )
    ap.add_argument(
        "--compare",
        default=None,
        metavar="BENCH_rN.json",
        help="after the run, print (to stderr) the shared-query-set "
        "total ratio vs a prior round's recorded bench JSON plus the "
        "worst per-query drifts — run as the round's LAST act so "
        "BASELINE.md records end-of-round numbers, not mid-round ones",
    )
    args = ap.parse_args()
    sf_dir = (
        args.sf
        or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("trignis-bench")
    spark.sparkContext.setLogLevel("ERROR")

    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
        unknown = [n for n in names if n not in q.QUERIES]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    else:
        names = HEADLINE + [n for n in OPTIONAL if n in q.QUERIES]
    registry = q.queries()

    # Warm the JVM + file listing once so per-query numbers measure the
    # pipelines, not session startup.
    registry["cf_batch_watermark"](spark, sf_dir).collect()
    # Pre-build the persistent IVF-PQ index: ann_ivfpq_probe's number is
    # the *serving* cost (train-once-probe-many); ann_ivfpq_topk right
    # above it carries the train-per-call cost for comparison.
    # Pre-build the persistent indexes: the *_probe numbers are the
    # serving cost (train/index-once, probe-many); the train-per-call
    # twins in the same run carry the full cost for comparison.
    for probe_q in ("ann_ivfpq_probe", "dedup_index_probe"):
        if probe_q in names:
            registry[probe_q](spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()

    timings: dict[str, float] = {}
    for _ in range(max(1, args.best_of)):
        for name in names:
            fn = registry[name]
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 3)
    # Echo the resolved core count and master so the driver can verify
    # the $SPARK_GRAFT_CPUS contract from the JSON line itself (the
    # scaling probe previously had to infer it from timings alone).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cpus": default_parallelism(),
                "master": spark.sparkContext.master,
            }
        )
    )
    if args.compare:
        _compare(timings, args.compare)
    return 0


def _compare(timings: dict[str, float], ref_path: str) -> None:
    """Shared-query-set drift report vs a prior round's bench JSON —
    written to STDERR (stdout stays the driver's one-JSON-line
    contract). Round 8's regression shipped because the shared-set
    check ran mid-round and perf-touching commits followed; this makes
    the check one command to run as the round's last act."""
    with open(ref_path) as f:
        ref = json.load(f)
    # accept either bench.py's own stdout line or the driver's
    # recorded BENCH_rN.json (which wraps it under "parsed")
    ref = ref.get("parsed", ref)["queries"]
    shared = sorted(set(timings) & set(ref))
    if not shared:
        print(f"--compare: no shared queries with {ref_path}",
              file=sys.stderr)
        return
    now_t = sum(timings[n] for n in shared)
    ref_t = sum(ref[n] for n in shared)
    drifts = sorted(
        ((timings[n] - ref[n], n) for n in shared), reverse=True
    )
    print(
        f"--compare vs {ref_path}: shared {len(shared)} queries, "
        f"{ref_t:.1f}s -> {now_t:.1f}s = {now_t / ref_t:.2f}x",
        file=sys.stderr,
    )
    for d, n in drifts[:5]:
        print(
            f"  worst drift: {n} {ref[n]:.2f}s -> {timings[n]:.2f}s "
            f"({d:+.2f}s, {timings[n] / ref[n]:.2f}x)",
            file=sys.stderr,
        )
    for d, n in drifts[-3:]:
        if d < 0:
            print(
                f"  best gain:  {n} {ref[n]:.2f}s -> {timings[n]:.2f}s "
                f"({d:+.2f}s)",
                file=sys.stderr,
            )


if __name__ == "__main__":
    sys.exit(main())
