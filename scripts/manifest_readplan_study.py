"""Manifest READ-PLANNING study past 240 dirs (VERDICT r07 "Next
round" #1 — the last unmeasured 100-TB driver-side surface).

A 100 TB table at ~1 GB/dir is ~100k dirs. The r07 metadata study
fixed bloom BYTES (sidecars) and version LISTING (_latest hint) but
stopped at 240 dirs; what remains unmeasured is what every READ pays
as the dir count grows:

* ``latest_manifest`` — one JSON parse of the full dir/stats/bloom-
  pointer state (O(dirs) driver work per read),
* ``pruned_dirs`` — the min/max range-planning Python loop (O(dirs)),
* ``bloom_pruned_dirs`` cold — O(dirs) sidecar FILE OPENS (the
  predicted bend: one tiny JSON read per dir),
* ``bloom_pruned_dirs`` warm — the in-memory probe loop,
* one append's manifest serialize+CAS-commit (O(dirs) JSON dumps).

Dirs are SYNTHETIC on the parse/planning axis (the dir's parquet
content never participates in planning — only its manifest entries
and its sidecar file do), built byte-compatible with what
``ManifestCatalog.append(stats_cols=, bloom_cols=)`` writes:
realistic 32768-bit sidecar bitmaps at the measured ~24% load factor
of 3000 keys x 3 hashes, one planted md5-compatible hit key per dir,
non-overlapping [lo, hi] stats. The real-dirs control is
``scripts/manifest_metadata_study.py`` (identical planning costs at
its 240-dir top point validate the synthesis).

Prints one JSON line per dir-count point. Run:
    python scripts/manifest_readplan_study.py [--points 240 1000 10000 100000]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402
from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog  # noqa: E402

KEYS_PER_DIR = 3_000
NUM_BITS = 32_768  # what the adaptive sizing picks for 3000 keys
WORDS = NUM_BITS // 32
DENSITY = 1.0 - (1.0 - 1.0 / NUM_BITS) ** (3 * KEYS_PER_DIR)  # ~0.24


def _positions(value: int) -> list[tuple[int, int]]:
    """Replicates ManifestCatalog._bloom_positions' driver fast path
    (int value, integral column) bit-for-bit."""
    out = []
    for h in range(3):
        pos = int(hashlib.md5(f"{h}:{value}".encode()).hexdigest()[:8], 16) % NUM_BITS
        out.append((pos // 32, pos % 32))
    return out


def build_synthetic(
    cat: ManifestCatalog, table: str, n_dirs: int, seed: int = 7,
    layout: str = "flat",
):
    """One committed manifest with n_dirs entries: per-dir stats
    (non-overlapping ts ranges), bloom bitmaps at the real load
    factor, one planted hit key per dir. The LAST dir holds a real
    one-row parquet file (bloom_pruned_dirs resolves the column type
    from the newest dir's footer).

    layout="flat": the r07 shape — stats inline, bitmaps in one
    sidecar JSON per dir. layout="sealed": the r08 shape — dirs
    sealed into SEGMENT_SIZE-dir columnar segments (same bytes a real
    append-triggered seal writes, built directly via pyarrow for
    generation speed), with a small unsealed tail."""
    tdir = cat.table_dir(table).replace("file://", "")
    os.makedirs(f"{tdir}/data", exist_ok=True)
    rng = np.random.default_rng(seed)
    dirs, stats, blooms, sealed, segments = [], {}, {}, {}, {}
    t_gen = time.time()
    seg_rows: dict = {"dir": [], "stats_json": [], "bloom_cols": [],
                      "bloom_num_bits": [], "bloom_words": []}

    def flush_segment():
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        seg_id = _uuid.uuid4().hex
        p_local = f"{tdir}/_segments/{seg_id}"
        os.makedirs(p_local, exist_ok=True)
        t = pa.table(
            {
                "dir": pa.array(seg_rows["dir"], pa.string()),
                "stats_json": pa.array(seg_rows["stats_json"], pa.string()),
                "bloom_cols": pa.array(seg_rows["bloom_cols"],
                                       pa.list_(pa.string())),
                "bloom_num_bits": pa.array(seg_rows["bloom_num_bits"],
                                           pa.list_(pa.int64())),
                "bloom_words": pa.array(seg_rows["bloom_words"],
                                        pa.list_(pa.int64())),
            }
        )
        pq.write_table(t, f"{p_local}/part-00000.parquet")
        segments[seg_id] = f"file://{p_local}"
        for d in seg_rows["dir"]:
            sealed[d] = seg_id
        for k in seg_rows:
            seg_rows[k] = []

    for i in range(n_dirs):
        d_local = f"{tdir}/data/{i:08d}"
        d = f"file://{d_local}"
        bits = rng.random(NUM_BITS) < DENSITY
        words = np.packbits(bits, bitorder="little").view(np.uint32)
        warr = words.copy().astype(np.int64)
        for w, b in _positions(i * KEYS_PER_DIR + 7):  # planted hit
            warr[w] |= np.int64(1 << b)
        lo = i * KEYS_PER_DIR
        st = {"ts": [lo, lo + KEYS_PER_DIR - 1]}
        if layout == "sealed" and i < (n_dirs // 1024) * 1024:
            os.makedirs(d_local, exist_ok=True)
            seg_rows["dir"].append(d)
            seg_rows["stats_json"].append(json.dumps(st))
            seg_rows["bloom_cols"].append(["key"])
            seg_rows["bloom_num_bits"].append([NUM_BITS])
            seg_rows["bloom_words"].append(warr.tolist())
            if len(seg_rows["dir"]) == 1024:
                flush_segment()
        else:
            os.makedirs(f"{d_local}/_sidecar", exist_ok=True)
            wd = {str(j): int(v) for j, v in enumerate(warr) if v}
            with open(f"{d_local}/_sidecar/blooms.json", "w") as f:
                json.dump({"key": {"num_bits": NUM_BITS, "words": wd}}, f)
            stats[d] = st
            blooms[d] = {"key": {"num_bits": NUM_BITS, "sidecar": 1}}
        dirs.append(d)
    gen_sec = time.time() - t_gen
    # newest dir needs a real parquet footer for _column_type
    df = cat.spark.createDataFrame([(0, 0, 0.0)], "key long, ts long, val double")
    df.coalesce(1).write.mode("overwrite").parquet(dirs[-1])
    manifest = {
        "dirs": dirs,
        "bucket_dirs": None,
        "n_buckets": None,
        "stats": stats,
        "blooms": blooms,
        "sealed": sealed or None,
        "segments": segments or None,
    }
    cat._commit(table, manifest)
    return gen_sec


def measure(cat: ManifestCatalog, table: str, n_dirs: int,
            check_hit_dir: bool = True) -> dict:
    # every reader's first step: hint + full JSON parse (cold), then
    # the version-keyed cache hit every later read in the same
    # process pays (warm)
    t0 = time.time()
    m = cat.latest_manifest(table)
    parse_sec = time.time() - t0
    t0 = time.time()
    cat.latest_manifest(table)
    parse_warm_sec = time.time() - t0
    assert len(m["dirs"]) == n_dirs

    # range planning (one-dir window in the middle)
    mid = (n_dirs // 2) * KEYS_PER_DIR + 5
    t0 = time.time()
    kept_range = cat.pruned_dirs(table, "ts", mid, mid + 10)
    range_sec = time.time() - t0

    hit = (n_dirs - 2) * KEYS_PER_DIR + 7
    miss = 10**15 + 7
    cat._bloom_sidecars.clear()
    cat._segment_cache.clear()
    t0 = time.time()
    kept_miss_cold = cat.bloom_pruned_dirs(table, "key", miss)
    miss_cold_sec = time.time() - t0
    t0 = time.time()
    kept_miss_warm = cat.bloom_pruned_dirs(table, "key", miss)
    miss_warm_sec = time.time() - t0
    t0 = time.time()
    kept_hit = cat.bloom_pruned_dirs(table, "key", hit)
    hit_warm_sec = time.time() - t0
    if check_hit_dir:  # synthetic dirs are index-named; real dirs are uuids
        assert any(d.endswith(f"{n_dirs - 2:08d}") for d in kept_hit), "hit dir lost"

    # one append's manifest cost at this size: payload rebase +
    # serialize + CAS publish (the data write itself is dir-local and
    # size-independent — excluded on purpose)
    payload = {k: v for k, v in m.items() if k != "version"}
    payload["dirs"] = payload["dirs"] + [f"{cat.table_dir(table)}/data/zz"]
    t0 = time.time()
    v = cat._commit_if(table, payload, m["version"])
    commit_sec = time.time() - t0
    assert v is not None
    mpath = f"{cat._manifest_dir(table)}/manifest-{v:08d}.json"
    manifest_bytes = len(cat.fs.read_text(mpath))

    return {
        "dirs": n_dirs,
        "manifest_bytes": manifest_bytes,
        "latest_manifest_sec": round(parse_sec, 4),
        "latest_manifest_warm_sec": round(parse_warm_sec, 5),
        "range_plan_sec": round(range_sec, 4),
        "bloom_miss_cold_sec": round(miss_cold_sec, 4),
        "bloom_miss_warm_sec": round(miss_warm_sec, 4),
        "bloom_hit_warm_sec": round(hit_warm_sec, 4),
        "commit_sec": round(commit_sec, 4),
        "kept_range": len(kept_range),
        "kept_miss": len(kept_miss_cold),
        "kept_miss_warm": len(kept_miss_warm),
        "kept_hit": len(kept_hit),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--points", type=int, nargs="*", default=[240, 1000, 10000, 100000]
    )
    ap.add_argument("--layouts", nargs="*", default=["flat", "sealed"])
    args = ap.parse_args()
    spark = create_spark_session()
    spark.sparkContext.setLogLevel("ERROR")
    for layout in args.layouts:
        for n in args.points:
            root = tempfile.mkdtemp(prefix="manifest_readplan_")
            try:
                cat = ManifestCatalog(spark, f"file://{root}")
                gen_sec = build_synthetic(cat, "ms.big", n, layout=layout)
                out = measure(cat, "ms.big", n)
                out["layout"] = layout
                out["gen_sec"] = round(gen_sec, 1)
                print(json.dumps(out), flush=True)
            finally:
                shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
