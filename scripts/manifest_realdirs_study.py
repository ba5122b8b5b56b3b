"""Real-dirs control for the synthetic read-planning study: drive
~1.3k REAL appends (data write + stats + adaptive bloom + CAS commit)
through the default SEGMENT_SIZE=1024 sealing path, then run the SAME
measurements as scripts/manifest_readplan_study.py at that point.

Purpose (VERDICT r07 #1 asked for one real mid-scale point): validate
that the synthetic manifests/sidecars/segments the big study builds
cost the same per-dir as what ManifestCatalog.append actually writes
— if the real 1.3k-dir row matches the synthetic 1k-dir row's
per-dir planning costs, the synthetic 10k/100k extrapolation stands
on measured ground.

Also measures what the seal itself costs the one append that
triggers it (the amortization claim: one ~1s seal per 1024 appends).

Prints one JSON line. Run:
    python scripts/manifest_realdirs_study.py [--dirs 1300]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402
from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog  # noqa: E402
from scripts.manifest_readplan_study import KEYS_PER_DIR, measure  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", type=int, default=1300)
    args = ap.parse_args()
    spark = create_spark_session()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="manifest_realdirs_")
    try:
        cat = ManifestCatalog(spark, f"file://{root}")
        table = "ms.real"
        append_secs = []
        for i in range(args.dirs):
            df = (
                spark.range(i * KEYS_PER_DIR, (i + 1) * KEYS_PER_DIR)
                .select(
                    F.col("id").alias("key"),
                    F.col("id").alias("ts"),
                    (F.col("id") % 97).cast("double").alias("val"),
                )
                .coalesce(1)
            )
            t0 = time.time()
            cat.append(df, table, stats_cols=["ts"], bloom_cols=["key"])
            dt = time.time() - t0
            append_secs.append(dt)
            if (i + 1) % 100 == 0:
                print(f"# {i + 1} dirs appended", file=sys.stderr)
        m = cat.latest_manifest(table)
        # real data dirs are uuid-named: skip the synthetic-name hit
        # check and prove the planted hit end-to-end instead
        hit = (args.dirs - 2) * KEYS_PER_DIR + 7
        got = [r["key"] for r in cat.read_point(table, "key", hit).collect()]
        assert got == [hit], got
        out = measure(cat, table, args.dirs, check_hit_dir=False)
        out["layout"] = "real+sealed"
        out["sealed_dirs"] = len(m.get("sealed") or {})
        out["segments"] = len(m.get("segments") or {})
        out["append_sec_median"] = round(sorted(append_secs)[len(append_secs) // 2], 3)
        out["append_sec_max"] = round(max(append_secs), 3)  # the sealing append
        # per-decile medians expose the append-cost TREND vs dir count
        # (the O(dirs) manifest-serialization residual): a flat list =
        # sealing keeps appends constant-cost; a rising tail = the
        # manifest-list split becomes worth building
        k = max(1, len(append_secs) // 10)
        out["append_sec_decile_medians"] = [
            round(sorted(append_secs[i : i + k])[len(append_secs[i : i + k]) // 2], 3)
            for i in range(0, len(append_secs) - k + 1, k)
        ]
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
