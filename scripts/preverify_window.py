"""Pre-verify the DRIVER_WINDOW under a plain driver-faithful session
(standing rotation practice, established r05): run every window query
and its DuckDB oracle at the driver's correctness scale factor and
print one JSON line per query — all 50 must be green BEFORE the
rotated window ships.

Usage: python scripts/preverify_window.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from end_to_end_etl_pipeline_spark.queries.catalog import (  # noqa: E402
    DRIVER_WINDOW,
    REGISTRY,
)
from tests.oracle import compare  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    # PLAIN session, not create_spark_session: the driver won't have
    # the engine configs, so engine code must self-configure — this
    # is the driver-faithful preflight (verify skill §1)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("preverify_window")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_ok = 0
    failing: list[str] = []
    for name in DRIVER_WINDOW:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            df = q.spark(spark, args.sf_dir)
            problems = compare(df, q.oracle, args.sf_dir)
            if df.count() == 0:
                problems.append("vacuous at this sf")
        except Exception as exc:  # a crash is a red row, keep going
            problems = [f"query raised: {exc!r}"]
        dt = round(time.perf_counter() - t0, 1)
        ok = not problems
        n_ok += ok
        if not ok:
            failing.append(name)
        print(
            json.dumps(
                {"query": name, "ok": ok, "sec": dt, "problems": problems}
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "study": "preverify_window",
                "ok": n_ok,
                "total": len(DRIVER_WINDOW),
                "failing": failing,
            }
        ),
        flush=True,
    )
    sys.exit(0 if n_ok == len(DRIVER_WINDOW) else 1)


if __name__ == "__main__":
    main()
