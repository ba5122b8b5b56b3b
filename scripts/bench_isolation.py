"""Isolation re-measure for bench watch items (VERDICT r08 #3).

The full bench runs 32 queries back-to-back in one session; r08's
round-over-round regressions (scd2_transition x1.20, near_dup_pairs
x1.19, purchase_last_view_asof x1.15) were all within the measured
1.27x intra-pass drift and none had a plan change — this script
separates drift from real regression by measuring each watch item
ALONE in a fresh plain session: canary first, one untimed cold pass
(JIT/codegen), then N warm reps; reports min/median and
canary-normalized values, the same normalization the bench headline
uses.

Usage: python scripts/bench_isolation.py [--reps 5] [q1 q2 ...]
Default queries: the r08 watch list.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402  (repo-root bench.py: canary + store builders)
from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY  # noqa: E402
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402

WATCH = ["near_dup_pairs", "scd2_transition", "dedup_store_probe"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or WATCH

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = create_spark_session(app_name="bench_isolation")
    spark.sparkContext.setLogLevel("ERROR")

    cleanup = []
    try:
        for name in names:
            if name == "dedup_store_probe":
                # same untimed amortized-store setup as the bench
                _cat, fn, tmpdir = bench._build_dedup_store(spark, sf_dir)
                cleanup.append(tmpdir)
            elif name == "ivfpq_store_topk":
                _cat, fn, tmpdir = bench._build_ann_store(spark, sf_dir)
                cleanup.append(tmpdir)
            elif name == "png_decode_only":
                fn, tmpdir = bench._build_png_blobs(spark, sf_dir)
                cleanup.append(tmpdir)
            else:
                fn = REGISTRY[name].spark

            can = []
            for _ in range(3):
                can.append(bench.canary(spark, sf_dir))
            canary_warm = min(can)

            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            cold = round(time.perf_counter() - t0, 3)

            warm = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                warm.append(round(time.perf_counter() - t0, 3))
            print(
                json.dumps(
                    {
                        "query": name,
                        "canary_warm": canary_warm,
                        "cold": cold,
                        "warm_min": min(warm),
                        "warm_median": round(statistics.median(warm), 3),
                        "warm_samples": warm,
                        "warm_norm": round(min(warm) / canary_warm, 2),
                    }
                ),
                flush=True,
            )
    finally:
        import shutil

        for d in cleanup:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
