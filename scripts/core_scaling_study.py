"""r13 core-count scaling study at ~sf1 (VERDICT r12 #5).

The r12 8-vs-32-core comparison at sf0.1 was a dead instrument: with
sub-second queries the fleet is scheduling-bound, 13/34 queries ran
FASTER on 8 cores, and the best ratio anywhere was 1.47 against an
ideal of 4 — no per-operator parallelism verdicts can be drawn from
it. This study re-asks the question where data is big enough to
matter: build a ~sf1 lake once (scale_study.build_scaled — key-shifted
fact copies, cipher-salted corpus), then time a representative heavy
set in TWO FRESH PROCESSES, one with SPARK_GRAFT_CPUS=32 and one with
8 (bench-faithful: the session reads the env exactly as the driver's
low-core bench run does). Per query: 1 untimed JIT pass + N timed reps
via the noop sink; min reported. ratio = c8_min / c32_min — ≈1 means
the extra 24 cores bought nothing (the genuinely-serial list), ~4 is
the core-count ideal for a CPU-bound fully-parallel operator.

Usage:
  python scripts/core_scaling_study.py            # orchestrates both
  python scripts/core_scaling_study.py --run DIR  # one child (env set)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

QUERIES = [
    # TPC-H fact scans / joins / windows
    "pricing_summary",
    "revenue_by_nation",
    "customer_master",
    "local_supplier_volume",
    "min_cost_supplier",
    "winsorized_price_stats",
    "user_sessions",
    "top_events_per_user",
    "nation_market_share",
    "scd2_transition",
    # text / dedup / retrieval / ANN
    "dedup_exact_text",
    "clean_corpus",
    "near_dup_pairs",
    "split_contamination",
    "doc_tfidf_terms",
    "bm25_doc_search",
    "hybrid_doc_retrieval",
    "pq_topk",
]
REPS = 2


def run_child(sf_dir: str, reps: int) -> None:
    from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY
    from end_to_end_etl_pipeline_spark.session import create_spark_session

    spark = create_spark_session(app_name="core_scaling_child")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in QUERIES:
        fn = REGISTRY[name].spark
        spark.sparkContext.setJobDescription(f"warm {name}")
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"timed {name} rep{rep}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr)
    print("CHILD_RESULT " + json.dumps(
        {"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "queries": out}
    ))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None, help="child mode: sf dir")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=REPS)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--order", nargs="*", default=["32", "8"],
                    help="child core counts, in run order (order swaps "
                    "separate a real scaling ratio from box drift "
                    "between the two child windows)")
    args = ap.parse_args()

    if args.run:
        run_child(args.run, args.reps)
        return

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = tempfile.mkdtemp(prefix="core_scaling_sf1_")
    try:
        from end_to_end_etl_pipeline_spark.session import (
            create_spark_session,
        )
        from scale_study import build_scaled

        spark = create_spark_session(app_name="core_scaling_build")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        build_scaled(spark, src, out, args.factor)
        print(f"built {args.factor}x lake at {out} in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
        spark.stop()

        results = {}
        for cpus in args.order:
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", out,
                 "--reps", str(args.reps)],
                capture_output=True, text=True, timeout=7200, env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            print(proc.stderr[-2000:], file=sys.stderr)
            for line in reversed(proc.stdout.splitlines()):
                if line.startswith("CHILD_RESULT "):
                    results[cpus] = json.loads(
                        line[len("CHILD_RESULT "):])["queries"]
                    break
            else:
                raise RuntimeError(f"child c{cpus} produced no result "
                                   f"(rc={proc.returncode})")
        lo, hi = min(args.order, key=int), max(args.order, key=int)
        table = {
            n: {
                f"c{hi}_sec": results[hi][n],
                f"c{lo}_sec": results[lo][n],
                "ratio": round(results[lo][n] / max(results[hi][n], 1e-9), 2),
            }
            for n in QUERIES
        }
        print(json.dumps({"metric": "core_scaling_sf1",
                          "factor": args.factor, "queries": table}))
    finally:
        if args.keep:
            print(f"kept {out}", file=sys.stderr)
        else:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
