"""Manifest-metadata growth study (VERDICT r06 "What's missing" #2).

The one driver-side surface without a scale number: every commit
rewrites the whole manifest JSON, and with per-dir bloom bitmaps
INLINE the manifest grows with total dir count — so commit cost,
driver parse cost, and cumulative log bytes all grow with table
history, the curve Delta's checkpoint/sidecar split exists to cut.

This study builds one table per mode (inline vs r07 sidecar) by
appending BATCHES appends of ~KEYS_PER_DIR keys each (bloom + stats
cols attached — every append is a real commit with bloom build), and
at dir counts [8, 80, 240] (≈1x/10x/30x) measures:

* manifest-json bytes (latest version file),
* one additional append's wall time (data write + stats + bloom +
  CAS commit — the per-operation cost a writer pays at that size),
* latest_manifest() parse time (what EVERY reader pays first),
* bloom_pruned_dirs() probe time for a present and an absent key
  (cold = sidecar cache cleared, warm = cached),
* point-lookup correctness spot checks (hit found, miss pruned).

Prints one JSON line per (mode, dirs) point. Run:
    python scripts/manifest_metadata_study.py [--batches 240]
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

KEYS_PER_DIR = 3_000  # → 32768-bit bitmaps (512 words): real size


def _append_batch(cat: ManifestCatalog, table: str, i: int) -> float:
    df = (
        cat.spark.range(i * KEYS_PER_DIR, (i + 1) * KEYS_PER_DIR)
        .select(
            F.col("id").alias("key"),
            (F.col("id") % 20).cast("long").alias("ts"),
            (F.col("id") % 97).cast("double").alias("val"),
        )
        .coalesce(1)
    )
    t0 = time.time()
    cat.append(df, table, stats_cols=["ts"], bloom_cols=["key"])
    return time.time() - t0


def _manifest_bytes(cat: ManifestCatalog, table: str) -> int:
    m = cat.latest_manifest(table)
    path = f"{cat._manifest_dir(table)}/manifest-{m['version']:08d}.json"
    # read_text length ≈ bytes (the manifest is ascii JSON)
    return len(cat.fs.read_text(path))


def _measure(cat: ManifestCatalog, table: str, dirs: int, mode: str) -> dict:
    t0 = time.time()
    m = cat.latest_manifest(table)
    parse_sec = time.time() - t0
    hit = (dirs - 1) * KEYS_PER_DIR + 7  # lives in the last dir
    miss = 10**12 + 7
    cat._bloom_sidecars.clear()
    t0 = time.time()
    kept_hit = cat.bloom_pruned_dirs(table, "key", hit)
    probe_hit_cold = time.time() - t0
    cat._bloom_sidecars.clear()
    t0 = time.time()
    kept_miss = cat.bloom_pruned_dirs(table, "key", miss)
    probe_miss_cold = time.time() - t0
    t0 = time.time()
    cat.bloom_pruned_dirs(table, "key", miss)
    probe_miss_warm = time.time() - t0
    assert any(hit is not None for hit in kept_hit), "hit dir lost"
    return {
        "mode": mode,
        "dirs": dirs,
        "manifest_bytes": _manifest_bytes(cat, table),
        "append_sec": round(_append_batch(cat, table, dirs + 10_000), 3),
        "latest_manifest_sec": round(parse_sec, 4),
        "probe_hit_cold_sec": round(probe_hit_cold, 4),
        "probe_miss_cold_sec": round(probe_miss_cold, 4),
        "probe_miss_warm_sec": round(probe_miss_warm, 4),
        "kept_dirs_hit": len(kept_hit),
        "kept_dirs_miss": len(kept_miss),
        "versions": m["version"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=240)
    ap.add_argument("--points", type=int, nargs="*", default=[8, 80, 240])
    args = ap.parse_args()

    spark = create_spark_session()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="manifest_meta_study_")
    try:
        for mode in ("inline", "sidecar"):
            cat = ManifestCatalog(spark, f"file://{root}/{mode}")
            if mode == "inline":
                cat.BLOOM_SIDECAR_MIN_WORDS = 10**9  # force pre-r07 layout
            table = "ms.t"
            points = sorted(p for p in args.points if p <= args.batches)
            done = 0
            for p in points:
                while done < p:
                    _append_batch(cat, table, done)
                    done += 1
                print(json.dumps(_measure(cat, table, p, mode)), flush=True)
                done += 1  # _measure appended one more dir
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
