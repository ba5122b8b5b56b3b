"""Manifest segment checkpoints (sinks/segments.py): sealing moves
per-dir stats + bloom bitmaps out of the manifest JSON into immutable
columnar files without changing ANY planning or CRUD observable —
pruning decisions, point/range reads, rewrites of sealed dirs, time
travel, and vacuum must all behave exactly as the unsealed layout.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog


@pytest.fixture
def cat(spark, tmp_path):
    c = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    c.SEGMENT_SIZE = 4  # seal early so small tests exercise the path
    return c


def _batch(spark, lo: int, n: int = 10):
    pdf = pd.DataFrame(
        {
            "key": range(lo, lo + n),
            "ts": [v % 97 for v in range(lo, lo + n)],
            "val": [float(v) for v in range(lo, lo + n)],
        }
    )
    return spark.createDataFrame(pdf).coalesce(1).select(
        F.col("key").cast("long"), F.col("ts").cast("long"), "val"
    )


def _fill(spark, cat, tbl, batches=6, n=10):
    for i in range(batches):
        cat.append(_batch(spark, i * 1000, n), tbl,
                   stats_cols=["key"], bloom_cols=["key"])


def test_seal_triggers_and_shrinks_manifest(spark, cat):
    _fill(spark, cat, "sg.t", batches=6)
    m = cat.latest_manifest("sg.t")
    assert len(m["dirs"]) == 6
    sealed = m.get("sealed") or {}
    assert len(sealed) == 4  # first seal at SEGMENT_SIZE, tail unsealed
    assert set(sealed) <= set(m["dirs"])
    assert set(m.get("segments") or {}) == set(sealed.values())
    # sealed dirs carry NO inline metadata anymore
    for d in sealed:
        assert d not in (m.get("stats") or {})
        assert d not in (m.get("blooms") or {})
    # the segment file exists before the manifest referenced it
    for path in m["segments"].values():
        assert cat.fs.exists(path)


def test_point_and_range_reads_across_sealed_and_tail(spark, cat):
    _fill(spark, cat, "sg.t", batches=6)
    m = cat.latest_manifest("sg.t")
    sealed = set(m.get("sealed") or {})
    # hits in sealed dirs, tail dirs, and misses — all exact
    for probe in (0, 1009, 3003, 5009):  # dirs 0,1 sealed; 5 tail
        got = [r.key for r in cat.read_point("sg.t", "key", probe).collect()]
        assert got == [probe]
    assert cat.read_point("sg.t", "key", 99_999).count() == 0
    # pruning really consults segments: a sealed-dir hit keeps few dirs
    kept = cat.bloom_pruned_dirs("sg.t", "key", 0)
    assert len(kept) < 6 and any(d in sealed for d in kept)
    # range planning: key 2000..2009 lives in exactly one (sealed) dir
    kept_r = cat.pruned_dirs("sg.t", "key", 2000, 2009)
    assert len(kept_r) == 1 and kept_r[0] in sealed
    got = sorted(r.key for r in cat.read_range("sg.t", "key", 2000, 2004).collect())
    assert got == [2000, 2001, 2002, 2003, 2004]


def test_sealed_vs_unsealed_prune_equivalence(spark, tmp_path):
    """Bit-equivalent decisions: the sealed catalog must keep exactly
    the dirs (by position) the never-sealing twin keeps, for hits,
    misses, nulls, and ranges."""
    a = ManifestCatalog(spark, f"file://{tmp_path}/a")
    a.SEGMENT_SIZE = 3
    b = ManifestCatalog(spark, f"file://{tmp_path}/b")
    b.SEGMENT_SIZE = 10**9
    for c in (a, b):
        _fill(spark, c, "tw.t", batches=7)
    da, db = a.latest_manifest("tw.t")["dirs"], b.latest_manifest("tw.t")["dirs"]
    for probe in (0, 1005, 4001, 6009, 123_456, None):
        ka = {da.index(d) for d in a.bloom_pruned_dirs("tw.t", "key", probe)}
        kb = {db.index(d) for d in b.bloom_pruned_dirs("tw.t", "key", probe)}
        assert ka == kb, f"probe={probe}"
    for lo, hi in ((0, 9), (3000, 4005), (-5, -1)):
        ka = {da.index(d) for d in a.pruned_dirs("tw.t", "key", lo, hi)}
        kb = {db.index(d) for d in b.pruned_dirs("tw.t", "key", lo, hi)}
        assert ka == kb, f"range={lo},{hi}"


def test_rewrite_of_sealed_dir(spark, cat):
    _fill(spark, cat, "sg.t", batches=6)
    m = cat.latest_manifest("sg.t")
    # key 1004 lives in dir index 1 — sealed by now
    assert m["dirs"][1] in (m.get("sealed") or {})
    n = cat.delete_where("sg.t", "key", [1004])
    assert n == 1
    m2 = cat.latest_manifest("sg.t")
    assert m["dirs"][1] not in m2["dirs"]
    assert m["dirs"][1] not in (m2.get("sealed") or {})
    # rewritten dir kept the ORIGINAL stat/bloom columns (resolved
    # from the segment, not the now-empty inline maps)
    new_dir = [d for d in m2["dirs"] if d not in m["dirs"]]
    assert len(new_dir) == 1
    assert "key" in (m2["stats"] or {}).get(new_dir[0], {})
    assert "key" in (m2["blooms"] or {}).get(new_dir[0], {})
    # survivors of the rewritten dir still found via bloom probe
    assert [r.key for r in cat.read_point("sg.t", "key", 1005).collect()] == [1005]
    assert cat.read_point("sg.t", "key", 1004).count() == 0
    # other sealed dirs untouched and still pruned via their segment
    assert [r.key for r in cat.read_point("sg.t", "key", 2003).collect()] == [2003]


def test_delete_range_unlinks_sealed_dirs_without_rewrite(spark, cat):
    _fill(spark, cat, "sg.t", batches=6)
    m = cat.latest_manifest("sg.t")
    sealed_dir = m["dirs"][2]  # keys 2000..2009, ts 2000%97..
    assert sealed_dir in (m.get("sealed") or {})
    n = cat.delete_range("sg.t", "key", 2000, 2009)
    assert n == 10
    m2 = cat.latest_manifest("sg.t")
    # wholly-inside sealed dir unlinked — no replacement dir written
    assert sealed_dir not in m2["dirs"] and len(m2["dirs"]) == 5
    assert cat.read("sg.t").count() == 50


def test_time_travel_and_vacuum_with_segments(spark, cat):
    _fill(spark, cat, "sg.t", batches=5)
    v_old = cat.latest_manifest("sg.t")["version"]
    old_rows = cat.read("sg.t").count()
    cat.delete_where("sg.t", "key", [0, 1, 2])
    assert cat.read("sg.t", version=v_old).count() == old_rows
    # optimize = full rewrite: sealed/segments start fresh
    cat.optimize("sg.t", stats_cols=["key"], bloom_cols=["key"])
    m = cat.latest_manifest("sg.t")
    assert not m.get("sealed") and not m.get("segments")
    # vacuum to latest: the old segment file is now unreferenced
    segs_dir = f"{cat.table_dir('sg.t')}/_segments"
    assert len(cat.fs.listdir(segs_dir)) >= 1
    deleted = cat.vacuum("sg.t", keep_versions=1, min_age_seconds=0)
    assert any("_segments" in p for p in deleted)
    assert cat.fs.listdir(segs_dir) == []
    assert cat.read("sg.t").count() == old_rows - 3


def test_vacuum_retains_referenced_segments(spark, cat):
    _fill(spark, cat, "sg.t", batches=6)
    m = cat.latest_manifest("sg.t")
    cat.vacuum("sg.t", keep_versions=1, min_age_seconds=0)
    # latest references the segment: it must survive and still probe
    for path in m["segments"].values():
        assert cat.fs.exists(path)
    cat._segment_cache.clear()
    assert [r.key for r in cat.read_point("sg.t", "key", 1001).collect()] == [1001]


def test_manifest_json_contains_no_sealed_bitmaps(spark, cat):
    """The scale point of the feature: sealed dirs' bitmaps live in
    the segment parquet, not in any JSON the driver parses per read."""
    cat.BLOOM_SIDECAR_MIN_WORDS = 10**9  # force inline blooms pre-seal
    _fill(spark, cat, "sg.t", batches=5)
    m = cat.latest_manifest("sg.t")
    raw = json.dumps(m)
    assert len(m.get("sealed") or {}) == 4
    # only the single unsealed tail dir may carry inline words
    inline = [d for d, bm in (m.get("blooms") or {}).items()
              if "words" in (bm.get("key") or {})]
    assert inline == [m["dirs"][-1]]
    assert len(raw) < 20_000


def test_segment_loader_handles_multi_chunk_parquet(spark, tmp_path):
    """A segment file with several row groups comes back as
    multi-chunk Arrow columns — the flat-words offset assembly must
    splice chunks correctly or probes silently mis-read bitmaps."""
    import pyarrow.parquet as pq

    from end_to_end_etl_pipeline_spark.sinks.segments import (
        Segment,
        load_segment,
        write_segment,
    )

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    rows = []
    for i in range(10):
        words = {str(w): (i + 1) * (w + 1) for w in range(0, 128, 3)}
        rows.append(
            (f"file:///d/{i:04d}", {"ts": [i * 10, i * 10 + 9]},
             {"key": (4096, words)})
        )
    seg_id, path = write_segment(cat, "sg.mc", rows)
    local = path.replace("file://", "")
    one = pq.read_table(local)  # SINGLE-chunk control, read pre-rewrite
    pq.write_table(one, f"{local}/part-00000.parquet", row_group_size=3)

    seg = load_segment(cat, path)
    multi = pq.read_table(f"{local}/part-00000.parquet")
    assert len(multi.column("bloom_words").chunks) > 1, "rewrite must chunk"
    assert len(one.column("bloom_words").chunks) == 1, "control must not"
    ctrl = Segment(one)
    for lo, hi in ((0, 9), (45, 52), (200, 300)):
        assert seg.range_kept("ts", lo, hi) == ctrl.range_kept("ts", lo, hi)

    # word 0 holds (i+1): bit 0 set for even i, bit 1 set for
    # i in {1,2,5,6,9} — NONEMPTY i-dependent keep sets, so a chunk
    # splicing bug that shifts words can't hide behind all-drop or
    # all-keep (ground truth asserted, not just control equality)
    for probe, expect in (
        ([(0, 0)], [0, 2, 4, 6, 8]),
        ([(0, 1)], [1, 2, 5, 6, 9]),
        ([(0, 0), (0, 1)], [2, 6]),
    ):
        kept = seg.bloom_kept("key", lambda nb, p=probe: p)
        assert kept == [f"file:///d/{i:04d}" for i in expect], probe
        assert kept == ctrl.bloom_kept("key", lambda nb, p=probe: p)

    assert seg.stats_of("file:///d/0004") == {"ts": [40, 49]}
    # sliced-chunk handling: physical offsets must be rebased
    sliced = Segment(multi.slice(4))
    assert sliced.bloom_kept("key", lambda nb: [(0, 0)]) == [
        f"file:///d/{i:04d}" for i in (4, 6, 8)
    ]
