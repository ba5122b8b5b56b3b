"""r13 dedup_store_probe stage-floor study (VERDICT r12 #6).

The bench's `dedup_store_probe` is a 100-doc batch probed against a
~5k-signature store — 1.83 s cold / ~20 stages at sf0.1, i.e. almost
pure fixed scheduling latency. This study measures where the stages
come from and A/Bs candidate reductions, judged by interleaved
same-session reps (memory lesson: never cross-run on this box) plus
the job/stage counts from the session's own UI REST endpoint.

Usage: python scripts/probe_study.py [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench  # noqa: E402
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def run_counted(spark, df, tag: str) -> dict:
    jobs_before = {j["jobId"] for j in _api(spark, "/jobs")}
    spark.sparkContext.setJobDescription(tag)
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    jobs = [j for j in _api(spark, "/jobs") if j["jobId"] not in jobs_before]
    n_stages = sum(len(j["stageIds"]) for j in jobs)
    n_skipped = sum(j.get("numSkippedStages", 0) for j in jobs)
    return {"sec": round(dt, 3), "jobs": len(jobs), "stages": n_stages,
            "skipped_stages": n_skipped}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = create_spark_session(app_name="probe_study",
                             extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    _cat, probe, tmpdir = bench._build_dedup_store(spark, args.sf_dir)
    try:
        df = probe(spark, args.sf_dir)
        # untimed JIT warm
        df.write.mode("overwrite").format("noop").save()
        stats = []
        for rep in range(args.reps):
            stats.append(run_counted(spark, probe(spark, args.sf_dir),
                                     f"probe rep{rep}"))
        print(json.dumps({
            "per_rep": stats,
            "min_sec": min(s["sec"] for s in stats),
            "med_sec": round(statistics.median(s["sec"] for s in stats), 3),
        }), flush=True)
        print("PLAN_START", flush=True)
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")), flush=True)
    finally:
        import shutil
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main()
