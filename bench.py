"""Benchmark harness: runs the headline queries at the bench scale
factor and prints ONE JSON line for the driver.

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is fully materialized through the no-op sink (row-level
execution, nothing collected to the driver) — the same way a cluster
job would be costed.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY
from end_to_end_etl_pipeline_spark.session import create_spark_session

BENCH_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "monthly_segment_growth",
    "customer_master",
    "top_events_per_user",
    "dedup_exact_text",
    "text_quality",
    "label_centroids",
    # round 2: LLM-pipeline operators at bench scale
    "near_dup_pairs",
    "cosine_topk",
    "doc_fingerprints",
    "purchase_last_view_asof",
    "scd2_transition",
    "user_sessions",
    "shipping_priority",
    # round 2b: compressed-ANN tier (train + encode + ADC + re-rank)
    "pq_topk",
    # round 2b: 6-way join with same-nation residual (TPC-H Q5 shape)
    "local_supplier_volume",
    # round 2b: composed training-corpus pipeline (normalize -> gate ->
    # dedup -> split), one shuffle end to end
    "clean_corpus",
    # round 2c: dual-role-dimension join (TPC-H Q8 shape)
    "nation_market_share",
    # round 2c: cross-split 8-gram contamination audit (df-capped join)
    "split_contamination",
    # round 2c: sliding-window RAG chunking (map-side only)
    "doc_chunks",
    # round 2d: correlated-min over derived bridge (TPC-H Q2 shape)
    "min_cost_supplier",
    # round 2d: conditional-agg threshold + semi joins (TPC-H Q20 shape)
    "excess_stock_suppliers",
    # round 2d: tf-idf keyword extraction (reused grouped relation)
    "doc_tfidf_terms",
    # round 2e: CDC-delta aggregate maintenance (change-proportional)
    "incremental_priority_revenue",
    # round 2e: percentile-clipped robust stats (broadcast scalar bounds)
    "winsorized_price_stats",
    # round 2e: value-RANGE trailing window anomaly scoring
    "daily_event_anomaly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = create_spark_session(app_name="bench")

    # warmup: JVM/codegen spin-up, not counted
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = REGISTRY.get(name)
        if q is None:
            continue
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Second pass with plans/codegen JIT-warm: the steady-state number
    # a long-running cluster job sees, where execution dominates and
    # per-query plan compilation has been amortized away. The COLD
    # pass above stays the headline metric so round-over-round
    # comparisons remain apples-to-apples.
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = REGISTRY.get(name)
        if q is None:
            continue
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        warm[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "warm_total_sec": round(sum(warm.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
