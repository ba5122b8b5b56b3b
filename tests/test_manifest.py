"""Manifest catalog: versioned commits, crash windows, optimistic
concurrency, and bucket-pruned SCD2 equivalence."""

import json
import os

import pytest
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.scd import scd2_next_state
from end_to_end_etl_pipeline_spark.sinks.manifest import (
    BUCKET_COL,
    BucketedSCD2,
    ManifestCatalog,
)
from end_to_end_etl_pipeline_spark.sinks.writers import ParquetCatalog


@pytest.fixture
def cat(spark, tmp_path):
    # file: URI so every op goes through the Hadoop FileSystem path
    return ManifestCatalog(spark, f"file://{tmp_path}/lake")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_commit_read_replace(spark, cat):
    assert not cat.exists("silver.t")
    cat.replace_atomic(_df(spark, [(1, "a"), (2, "b")]), "silver.t")
    assert cat.exists("silver.t")
    assert sorted(r.k for r in cat.read("silver.t").collect()) == [1, 2]
    cat.replace_atomic(_df(spark, [(3, "c")]), "silver.t")
    assert sorted(r.k for r in cat.read("silver.t").collect()) == [3]
    # both versions retained in the log
    assert [m["version"] for m in [cat.latest_manifest("silver.t")]] == [2]


def test_append_accumulates_dirs(spark, cat):
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    cat.append(_df(spark, [(2, "b")]), "t")
    assert sorted(r.k for r in cat.read("t").collect()) == [1, 2]
    assert len(cat.latest_manifest("t")["dirs"]) == 2


def test_uncommitted_data_dir_invisible(spark, cat, tmp_path):
    """Crash between data write and manifest publish: readers keep
    seeing the previous committed state."""
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    orphan = cat._new_data_dir("t")
    _df(spark, [(99, "zz")]).write.parquet(orphan)  # no commit
    assert sorted(r.k for r in cat.read("t").collect()) == [1]


def test_commit_retries_on_version_collision(spark, cat, tmp_path):
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    # another writer published version 2 concurrently
    m2 = cat.latest_manifest("t") | {"version": 2}
    mdir = cat._manifest_dir("t").replace("file:", "")
    with open(os.path.join(mdir, "manifest-00000002.json"), "w") as f:
        json.dump(m2, f)
    cat.replace_atomic(_df(spark, [(3, "c")]), "t")
    assert cat.latest_manifest("t")["version"] == 3
    assert sorted(r.k for r in cat.read("t").collect()) == [3]


def _src(spark, rows):
    return spark.createDataFrame(rows, "k int, attr string")


def test_bucketed_scd2_matches_unbucketed(spark, cat):
    b1 = _src(spark, [(i, f"v{i}") for i in range(20)])
    b2 = _src(
        spark,
        [(5, "changed5"), (7, "changed7"), (25, "new25")],
    )
    eng = BucketedSCD2(cat, n_buckets=8)
    r1 = eng.apply(b1, "dim.k", ["k"], ["attr"], as_of="2026-01-01 00:00:00")
    r2 = eng.apply(b2, "dim.k", ["k"], ["attr"], as_of="2026-02-01 00:00:00")

    # reference result: pure merges, no storage
    s1 = scd2_next_state(None, b1, ["k"], ["attr"], "2026-01-01 00:00:00")
    s2 = scd2_next_state(s1, b2, ["k"], ["attr"], "2026-02-01 00:00:00")
    expect = sorted(
        (r.k, r.attr, str(r.effective_from), str(r.effective_to), r.is_current)
        for r in s2.collect()
    )
    got = sorted(
        (r.k, r.attr, str(r.effective_from), str(r.effective_to), r.is_current)
        for r in eng.read_all("dim.k").collect()
    )
    assert got == expect

    # pruning: second apply touched only the buckets of keys 5, 7, 25
    touched = {
        r[0]
        for r in eng._bucketed(b2, ["k"]).select(BUCKET_COL).distinct().collect()
    }
    assert set(r2["changed_buckets"]) == touched
    assert len(r2["changed_buckets"]) < len(r1["changed_buckets"])

    # unchanged buckets still point at their version-1 data dirs
    m1_dirs = {}  # bucket -> dirs at v1
    m2 = cat.latest_manifest("dim.k")
    v1 = json.loads(
        cat.fs.read_text(cat._manifest_dir("dim.k") + "/manifest-00000001.json")
    )
    for b, dirs in v1["bucket_dirs"].items():
        if int(b) not in touched:
            assert m2["bucket_dirs"][b] == dirs


def test_bucketed_scd2_invariants(spark, cat):
    eng = BucketedSCD2(cat, n_buckets=4)
    eng.apply(_src(spark, [(1, "a"), (2, "b")]), "d", ["k"], ["attr"], "2026-01-01 00:00:00")
    eng.apply(_src(spark, [(1, "a2"), (3, "c")]), "d", ["k"], ["attr"], "2026-02-01 00:00:00")
    cur = eng.read_current("d")
    # exactly one current row per key
    assert cur.groupBy("k").count().filter("count > 1").count() == 0
    assert sorted((r.k, r.attr) for r in cur.collect()) == [(1, "a2"), (2, "b"), (3, "c")]
    hist = eng.read_all("d").filter(~F.col("is_current"))
    assert [(r.k, r.attr) for r in hist.collect()] == [(1, "a")]


def test_parquet_catalog_recovers_torn_swap(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "pq"))
    df = _df(spark, [(1, "a")])
    cat.replace_atomic(df, "t")
    dest = cat.path("t")
    os.rename(dest, dest + "__trash_deadbeef")  # simulate crash mid-swap
    assert cat.exists("t")  # recovery restored the old state
    assert sorted(r.k for r in cat.read("t").collect()) == [1]


def test_append_schema_evolution(spark, cat):
    """K9: a column added in a later append reads as NULL for older
    data dirs (the reference needs ALTER TABLE ADD COLUMN for this,
    b2s_yfinance.py:46-61)."""
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    wider = spark.createDataFrame([(2, "b", 9.5)], "k int, v string, score double")
    cat.append(wider, "t")
    out = cat.read("t")
    assert set(out.columns) == {"k", "v", "score"}
    rows = {r.k: r for r in out.collect()}
    assert rows[1].score is None  # backfilled NULL on the old dir
    assert rows[2].score == 9.5


def test_optimize_compacts_and_vacuum_collects(spark, cat):
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    cat.append(_df(spark, [(2, "b")]), "t")
    cat.append(_df(spark, [(3, "c")]), "t")
    assert len(cat.latest_manifest("t")["dirs"]) == 3
    # crash orphan: data written, never committed
    orphan = cat._new_data_dir("t")
    _df(spark, [(99, "zz")]).write.parquet(orphan)

    cat.optimize("t", cluster_by=["k"], target_partitions=1)
    assert len(cat.latest_manifest("t")["dirs"]) == 1
    assert sorted(r.k for r in cat.read("t").collect()) == [1, 2, 3]

    deleted = cat.vacuum("t", keep_versions=1, min_age_seconds=0)
    # 3 superseded dirs + 1 orphan gone, compacted dir retained
    assert len(deleted) == 4
    assert sorted(r.k for r in cat.read("t").collect()) == [1, 2, 3]
    assert cat._versions("t") == [cat.latest_manifest("t")["version"]]
    data_dirs = cat.fs.listdir(cat.table_dir("t") + "/data")
    assert len(data_dirs) == 1


def test_optimize_preserves_buckets(spark, cat):
    eng = BucketedSCD2(cat, n_buckets=4)
    eng.apply(_src(spark, [(i, f"v{i}") for i in range(12)]), "d", ["k"], ["attr"],
              "2026-01-01 00:00:00")
    eng.apply(_src(spark, [(1, "x")]), "d", ["k"], ["attr"], "2026-02-01 00:00:00")
    before = sorted((r.k, r.attr, r.is_current) for r in eng.read_all("d").collect())
    cat.optimize("d")
    after = sorted((r.k, r.attr, r.is_current) for r in eng.read_all("d").collect())
    assert after == before
    m = cat.latest_manifest("d")
    assert m["n_buckets"] == 4
    # every bucket now points at exactly one (compacted) dir
    assert all(len(ds) == 1 for ds in m["bucket_dirs"].values())
    cat.vacuum("d", keep_versions=1, min_age_seconds=0)
    assert sorted((r.k, r.attr, r.is_current) for r in eng.read_all("d").collect()) == before


def test_vacuum_safe_on_schemeless_root_and_young_dirs(spark, tmp_path):
    """Regression: a plain-path root (no file:// scheme) must not
    defeat the referenced-set check (qualified-path comparison), and
    dirs younger than the age floor survive as possible in-flight
    writers."""
    cat = ManifestCatalog(spark, str(tmp_path / "lake2"))  # no scheme
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    cat.replace_atomic(_df(spark, [(2, "b")]), "t")
    deleted = cat.vacuum("t", keep_versions=1, min_age_seconds=0)
    assert len(deleted) == 1  # only the superseded v1 dir
    assert sorted(r.k for r in cat.read("t").collect()) == [2]
    # the default age floor protects a young in-flight writer's dir
    inflight = cat._new_data_dir("t")
    _df(spark, [(9, "z")]).write.parquet(inflight)  # not yet committed
    assert cat.vacuum("t", keep_versions=1) == []
    assert cat.fs.exists(inflight)


def test_time_travel_reads(spark, cat):
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    cat.replace_atomic(_df(spark, [(2, "b"), (3, "c")]), "t")
    assert sorted(r.k for r in cat.read("t").collect()) == [2, 3]
    assert sorted(r.k for r in cat.read("t", version=1).collect()) == [1]
    # vacuumed versions are gone (data dirs collected)
    cat.vacuum("t", keep_versions=1, min_age_seconds=0)
    import pytest as _pytest

    with _pytest.raises(Exception):
        cat.read("t", version=1).collect()


def test_diff_versions_rowwise(spark, cat):
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "c")], "id long, v string"
    )
    cat.replace_atomic(v1, "cdc.rows")
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "id long, v string"
    )
    cat.replace_atomic(v2, "cdc.rows")
    out = cat.diff_versions("cdc.rows", 1, 2)
    got = sorted((r.id, r.v, r._change_type) for r in out.collect())
    # multiset semantics: one of the duplicate (3,'c') rows is a delete
    assert got == [
        (2, "B", "insert"),
        (2, "b", "delete"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]


def test_diff_versions_keyed_cdc(spark, cat):
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "nk", 1.0)],
        "id long, v string, x double",
    )
    cat.replace_atomic(v1, "cdc.keyed")
    v2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b2", 20.0), (4, "d", 40.0), (None, "nk", 2.0)],
        "id long, v string, x double",
    )
    cat.replace_atomic(v2, "cdc.keyed")
    out = cat.diff_versions("cdc.keyed", 1, keys=["id"])  # v_to defaults to latest
    got = sorted(
        ((r.id if r.id is not None else -1), r.v, r.x, r._change_type)
        for r in out.collect()
    )
    assert got == [
        (-1, "nk", 1.0, "update_pre"),  # NULL keys match null-safely
        (-1, "nk", 2.0, "update_post"),
        (2, "b", 20.0, "update_pre"),
        (2, "b2", 20.0, "update_post"),
        (3, "c", 30.0, "delete"),
        (4, "d", 40.0, "insert"),
    ]
    # unchanged key 1 emits nothing
    assert out.filter(F.col("id") == 1).count() == 0


def test_diff_versions_schema_evolution_reads_null_old(spark, cat):
    cat.replace_atomic(
        spark.createDataFrame([(1, "a")], "id long, v string"), "cdc.evo"
    )
    cat.append(
        spark.createDataFrame([(2, "b", 9.0)], "id long, v string, score double"),
        "cdc.evo",
    )
    out = cat.diff_versions("cdc.evo", 1, 2, keys=["id"])
    got = {(r.id, r.v, r.score, r._change_type) for r in out.collect()}
    assert got == {(2, "b", 9.0, "insert")}


def test_stats_pruned_range_read(spark, cat):
    for lo in (0, 10, 20):
        cat.append(
            spark.createDataFrame(
                [(k, f"v{k}") for k in range(lo, lo + 10)], "k int, v string"
            ),
            "skip.t",
            stats_cols=["k"],
        )
    # range inside the middle batch: exactly one dir survives pruning
    assert len(cat.pruned_dirs("skip.t", "k", 12, 18)) == 1
    got = sorted(r.k for r in cat.read_range("skip.t", "k", 12, 18).collect())
    assert got == list(range(12, 19))
    # same rows as the unpruned filter - skipping never changes results
    full = sorted(
        r.k for r in cat.read("skip.t").filter(F.col("k").between(12, 18)).collect()
    )
    assert got == full
    # boundary overlap keeps both touching dirs
    assert len(cat.pruned_dirs("skip.t", "k", 9, 10)) == 2
    # out-of-range: zero dirs, empty frame, schema intact
    empty = cat.read_range("skip.t", "k", 100, 200)
    assert empty.count() == 0 and empty.columns == ["k", "v"]


def test_stats_absent_dirs_are_kept(spark, cat):
    cat.append(spark.createDataFrame([(1, "a")], "k int, v string"), "skip.mixed")
    cat.append(
        spark.createDataFrame([(50, "z")], "k int, v string"),
        "skip.mixed",
        stats_cols=["k"],
    )
    # stat-less first dir must always be scanned (no false pruning)
    assert len(cat.pruned_dirs("skip.mixed", "k", 40, 60)) == 2
    assert sorted(r.k for r in cat.read_range("skip.mixed", "k", 40, 60).collect()) == [50]


def test_diff_versions_replays_old_to_new(spark, cat):
    """CDC soundness: v1 minus (deletes ∪ update_pre) plus
    (inserts ∪ update_post) must reconstruct v2 exactly."""
    v1 = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(20)], "id long, v string, x double"
    )
    cat.replace_atomic(v1, "cdc.replay")
    v2 = spark.createDataFrame(
        # drop ids 0-4, mutate 5-9, keep 10-19, add 20-24
        [(i, f"v{i}*", float(i) + 0.5) for i in range(5, 10)]
        + [(i, f"v{i}", float(i)) for i in range(10, 20)]
        + [(i, f"v{i}", float(i)) for i in range(20, 25)],
        "id long, v string, x double",
    )
    cat.replace_atomic(v2, "cdc.replay")
    feed = cat.diff_versions("cdc.replay", 1, 2, keys=["id"]).persist()
    removed = feed.filter(F.col("_change_type").isin("delete", "update_pre")).drop(
        "_change_type"
    )
    added = feed.filter(F.col("_change_type").isin("insert", "update_post")).drop(
        "_change_type"
    )
    rebuilt = cat.read("cdc.replay", version=1).exceptAll(removed).unionByName(added)
    assert rebuilt.exceptAll(cat.read("cdc.replay", version=2)).count() == 0
    assert cat.read("cdc.replay", version=2).exceptAll(rebuilt).count() == 0
    assert feed.count() == 5 + 2 * 5 + 5  # deletes + pre/post pairs + inserts


def test_zorder_key_interleaves_bits(spark):
    from end_to_end_etl_pipeline_spark.sinks.zorder import zorder_key

    # 2-bit quantization over [0,3]x[0,3]: the Morton codes of the
    # corners are hand-computable (x bits even positions, y bits odd).
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)], "x int, y int"
    )
    z = {(r.x, r.y): r.z for r in df.withColumn(
        "z", zorder_key(df, ["x", "y"], bits=2)).collect()}
    assert z[(0, 0)] == 0
    assert z[(3, 0)] == 0b0101       # x=11 at bits 0,2
    assert z[(0, 3)] == 0b1010       # y=11 at bits 1,3
    assert z[(3, 3)] == 0b1111
    assert z[(2, 1)] == 0b0110       # x=10 -> bit2, y=01 -> bit1
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(df, ["x", "y"], bits=32)


def test_zorder_rewrite_prunes_both_dimensions(spark, cat):
    from pyspark.sql import functions as F2

    # 32x32 grid: x and y are independent and uniform - a linear sort
    # on x cannot cluster y, the Morton layout clusters both.
    grid = spark.range(1024).select(
        (F2.col("id") % 32).cast("int").alias("x"),
        (F2.col("id") / 32).cast("int").alias("y"),
    )
    cat.replace_atomic(grid, "z.t")
    cat.optimize_zorder("z.t", ["x", "y"], bits=5, n_dirs=16)
    # every dimension prunes: a 4-wide slab on either axis must skip
    # most of the 16 dirs (16x16 Morton quadrants -> a 4-wide slab
    # touches a 1/8 band of the key space on either axis).
    x_dirs = cat.pruned_dirs("z.t", "x", 0, 3)
    y_dirs = cat.pruned_dirs("z.t", "y", 0, 3)
    assert len(x_dirs) <= 8, f"x slab hit {len(x_dirs)} of 16 dirs"
    assert len(y_dirs) <= 8, f"y slab hit {len(y_dirs)} of 16 dirs"
    # pruning never changes results
    got = sorted(
        (r.x, r.y) for r in cat.read_range("z.t", "y", 0, 3).collect()
    )
    assert got == sorted((x, y) for x in range(32) for y in range(4))
    # bucketed tables refuse zorder
    cat2 = BucketedSCD2(cat, n_buckets=4)
    cat2.apply(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        "z.bkt", keys=["k"], tracked=["v"], as_of="2024-01-01",
    )
    with pytest.raises(ValueError, match="bucketed"):
        cat.optimize_zorder("z.bkt", ["k"])


def test_zorder_refuses_empty_or_allnull(spark, cat):
    from end_to_end_etl_pipeline_spark.sinks.zorder import zorder_key

    empty = spark.createDataFrame([], "x int, y int")
    with pytest.raises(ValueError, match="no non-null"):
        zorder_key(empty, ["x", "y"])
    allnull = spark.createDataFrame([(None, 1)], "x int, y int")
    with pytest.raises(ValueError, match="no non-null"):
        zorder_key(allnull, ["x", "y"])


def test_append_rebases_on_concurrent_commit(spark, cat, tmp_path):
    """Lost-update guard: an append must rebase onto a manifest
    committed AFTER it read the log, keeping the concurrent dirs."""
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    base = cat.latest_manifest("t")
    # concurrent appender publishes v2 with its own dir
    other_dir = cat._new_data_dir("t")
    _df(spark, [(50, "x")]).write.parquet(other_dir.replace("file:", ""))
    m2 = {
        "dirs": base["dirs"] + [other_dir],
        "bucket_dirs": None, "n_buckets": None, "stats": None,
    }
    assert cat._commit_if("t", m2, base["version"]) == 2
    cat.append(_df(spark, [(2, "b")]), "t")
    latest = cat.latest_manifest("t")
    assert latest["version"] == 3
    assert len(latest["dirs"]) == 3  # base + concurrent + ours
    assert sorted(r.k for r in cat.read("t").collect()) == [1, 2, 50]


def test_replace_atomic_refuses_bucketed(spark, cat):
    eng = BucketedSCD2(cat, n_buckets=4)
    eng.apply(_src(spark, [(1, "a")]), "d2", ["k"], ["attr"], "2026-01-01 00:00:00")
    with pytest.raises(ValueError, match="bucketed"):
        cat.replace_atomic(_df(spark, [(9, "z")]), "d2")
    cat.replace_atomic(_df(spark, [(9, "z")]), "d2", allow_unbucket=True)
    assert sorted(r.k for r in cat.read("d2").collect()) == [9]


def test_read_empty_bucket_selection_is_empty_frame(spark, cat):
    eng = BucketedSCD2(cat, n_buckets=4)
    eng.apply(_src(spark, [(1, "a")]), "d3", ["k"], ["attr"], "2026-01-01 00:00:00")
    used = {
        int(b) for b, ds in cat.latest_manifest("d3")["bucket_dirs"].items() if ds
    }
    empty_bucket = next(b for b in range(4) if b not in used)
    out = cat.read("d3", buckets=[empty_bucket])
    assert out.count() == 0 and "k" in out.columns


def test_optimize_recomputes_stats(spark, cat):
    for lo in (0, 10):
        cat.append(
            spark.createDataFrame([(k, "v") for k in range(lo, lo + 10)],
                                  "k int, v string"),
            "skip.opt", stats_cols=["k"],
        )
    cat.optimize("skip.opt", cluster_by=["k"], target_partitions=1,
                 stats_cols=["k"])
    m = cat.latest_manifest("skip.opt")
    assert m["stats"] and list(m["stats"].values())[0]["k"] == [0, 19]
    assert sorted(r.k for r in cat.read_range("skip.opt", "k", 5, 6).collect()) == [5, 6]


def test_optimize_survives_append_during_data_dir_write(spark, cat):
    """A concurrent append landing while optimize() is WRITING its
    compacted data dir (before publish) must survive: the CAS fails,
    optimize rebases on the new latest, and the appended rows appear
    in the compacted table. Companion to
    test_optimize_rebases_on_concurrent_append below, which injects
    the race at the CAS itself — this one injects it a stage earlier,
    at data-dir creation. (The two previously shared a name, so this
    one was silently shadowed and never ran.)"""
    cat.replace_atomic(_df(spark, [(1, "a")]), "t")
    cat.append(_df(spark, [(2, "b")]), "t")

    injected = {"done": False}
    orig_new_dir = cat._new_data_dir

    def hook(name):
        # fires inside optimize, after it read the base manifest but
        # before it publishes — exactly the race window
        if not injected["done"]:
            injected["done"] = True  # set first: append recurses here
            cat.append(_df(spark, [(3, "c")]), "t")
        return orig_new_dir(name)

    cat._new_data_dir = hook
    try:
        cat.optimize("t", target_partitions=1)
    finally:
        cat._new_data_dir = orig_new_dir
    assert sorted(r.k for r in cat.read("t").collect()) == [1, 2, 3]
    # compacted: latest manifest holds a single data dir
    assert len(cat.latest_manifest("t")["dirs"]) == 1


def test_read_all_empty_bucketed_manifest(spark, cat):
    """A bucketed manifest whose buckets are ALL empty reads as an
    empty frame with the table's schema (from the newest version with
    data), never FileNotFoundError."""
    eng = BucketedSCD2(cat, n_buckets=4)
    eng.apply(_src(spark, [(1, "a"), (2, "b")]), "d", ["k"], ["attr"])
    m = cat.latest_manifest("d")
    empty = m | {"bucket_dirs": {b: [] for b in m["bucket_dirs"]}}
    cat._commit("d", {k: v for k, v in empty.items() if k != "version"})

    out = cat.read("d")
    assert out.count() == 0
    assert "k" in out.columns and "attr" in out.columns
    # single-empty-bucket selection still returns the empty frame too
    assert cat.read("d", buckets=[0]).count() == 0


def test_write_jsonl_sharded_content_addressed(spark, tmp_path):
    from end_to_end_etl_pipeline_spark.operators.sampling import hash_bucket
    from end_to_end_etl_pipeline_spark.sinks.writers import write_jsonl_sharded
    from pyspark.sql import functions as F
    import pytest

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], ["doc_id", "text"]
    )
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl_sharded(docs, out, n_shards=4, id_col="doc_id", compression=None)
    back = spark.read.json(out)
    assert back.count() == 40
    # shard derivation is the content-addressed hash, not round-robin
    expect = {
        r.doc_id: r.shard
        for r in docs.select(
            "doc_id", hash_bucket(F.col("doc_id"), 4).alias("shard")
        ).collect()
    }
    got = {r.doc_id: int(r.shard) for r in back.collect()}
    assert got == expect
    with pytest.raises(ValueError, match="id_col"):
        write_jsonl_sharded(docs, out, n_shards=4)


def test_optimize_rebases_on_concurrent_append(spark, cat):
    """The compaction lost-update race: an append committing between
    optimize's base read and its publish must fail the CAS, force a
    rebase, and SURVIVE the compaction (last-writer-wins here would
    silently drop the appended dir)."""
    cat.replace_atomic(_df(spark, [(1, "a"), (2, "b")]), "t8")
    orig = cat._commit_if
    fired = {"done": False}

    def racy(name, manifest, expected_base):
        if not fired["done"]:
            fired["done"] = True
            cat._commit_if = orig
            # concurrent writer lands AFTER optimize pinned its base
            cat.append(_df(spark, [(99, "z")]), "t8")
            cat._commit_if = racy
            # stale CAS: optimize's expected_base predates the append
            assert orig(name, manifest, expected_base) is None
            return None
        return orig(name, manifest, expected_base)

    cat._commit_if = racy
    try:
        cat.optimize("t8")
    finally:
        cat._commit_if = orig
    assert sorted(r.k for r in cat.read("t8").collect()) == [1, 2, 99]
    latest = cat.latest_manifest("t8")
    # the retry compacted base+append into one dir
    assert len(latest["dirs"]) == 1


def test_metastore_catalog_roundtrip_and_three_level_names(spark):
    """MetastoreCatalog: saveAsTable/spark.table addressing with the
    reference's 3-level names — an unregistered workspace catalog
    level collapses onto the session catalog, dashed names stay
    backtick-safe, replace_atomic survives reading its own target."""
    from end_to_end_etl_pipeline_spark.sinks.writers import MetastoreCatalog

    cat = MetastoreCatalog(spark)
    name = "`companies-data`.bronze_t.overview"
    try:
        assert cat.exists(name) is False
        cat.overwrite(_df(spark, [(1, "a"), (2, "b")]), name)
        assert cat.exists(name) is True
        # same table reachable by the collapsed 2-level name
        assert spark.table("`bronze_t`.`overview`").count() == 2
        cat.append(_df(spark, [(3, "c")]), name)
        assert cat.read(name).count() == 3
        # replace from a plan that reads the target (the SCD shape)
        newstate = cat.read(name).filter(F.col("k") >= 2)
        cat.replace_atomic(newstate, name)
        assert sorted(r.k for r in cat.read(name).collect()) == [2, 3]
        assert not spark.catalog.tableExists("bronze_t.overview__stage")
    finally:
        cat.drop(name)
    assert cat.exists(name) is False


def test_metastore_quoted_identifier_with_literal_dot(spark):
    """A backtick-quoted identifier containing a literal dot must not
    be sheared by name splitting: `` `my.catalog`.bronze_q.t `` is a
    3-level name whose first part is 'my.catalog' (unregistered →
    collapses onto the session catalog), not a 4-level mis-split."""
    from end_to_end_etl_pipeline_spark.sinks.writers import MetastoreCatalog

    cat = MetastoreCatalog(spark)
    assert cat._split_name("`my.catalog`.bronze_q.t") == [
        "my.catalog", "bronze_q", "t"
    ]
    assert cat._split_name("`companies-data`.bronze.t") == [
        "companies-data", "bronze", "t"
    ]
    name = "`my.catalog`.bronze_q.t"
    try:
        assert cat.exists(name) is False
        cat.overwrite(_df(spark, [(1, "a")]), name)
        assert cat.exists(name) is True
        assert cat.read(name).count() == 1
        # collapsed 2-level address reaches the same table
        assert spark.table("`bronze_q`.`t`").count() == 1
    finally:
        cat.drop(name)

    # dotted part in the DB/TABLE position: exists() re-quotes the
    # parts it hands tableExists, so the probe parses as the intended
    # 2-part name (db bronze_q, table 'my.table') and answers a
    # CORRECT False — not the pre-fix mis-split into a bogus 3-part
    # name. The session catalog itself can't hold such an identifier
    # (INVALID_SCHEMA_OR_RELATION_NAME), so the create path then
    # fails loudly at saveAsTable rather than clobbering anything.
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    assert cat.exists("bronze_q.`my.table`") is False
    with _pytest.raises(AnalysisException):
        cat.overwrite(_df(spark, [(5, "e")]), "bronze_q.`my.table`")


def test_metastore_alter_table_add_columns_ddl(spark):
    """K9 literal DDL: ALTER TABLE ADD COLUMNS backfills SCD columns
    onto an existing table (reference b2s_yfinance.py:46-61) —
    existing rows read NULL, appends may fill the new columns, no
    data rewrite."""
    from end_to_end_etl_pipeline_spark.sinks.writers import MetastoreCatalog

    cat = MetastoreCatalog(spark)
    name = "ddl_t.scd_backfill"
    try:
        cat.overwrite(_df(spark, [(1, "a")]), name)
        cat.add_columns(
            name, {"is_current": "boolean", "effective_from": "timestamp"}
        )
        got = cat.read(name)
        assert {"is_current", "effective_from"} <= set(got.columns)
        row = got.first()
        assert row.is_current is None and row.effective_from is None
        newer = _df(spark, [(2, "b")]).selectExpr(
            "k", "v", "true AS is_current",
            "timestamp'2026-01-01 00:00:00' AS effective_from",
        )
        cat.append(newer, name)
        rows = {r.k: r for r in cat.read(name).collect()}
        assert rows[1].is_current is None and rows[2].is_current is True
    finally:
        cat.drop(name)


def test_bloom_point_lookup_prunes_dirs_never_false_negative(spark, cat):
    """Per-dir bloom data skipping: three appends with disjoint
    hash-like ids; a point read touches only the dir(s) whose bloom
    might hold the key, present keys are ALWAYS found (no false
    negatives), dirs without blooms are kept, and NULL probes keep
    every dir."""
    ids = [[f"id_{i:04d}" for i in range(lo, lo + 40)] for lo in (0, 1000, 2000)]
    for batch in ids:
        cat.append(
            spark.createDataFrame([(k, len(k)) for k in batch], "key string, v int"),
            "bl.t", bloom_cols=["key"],
        )
    m = cat.latest_manifest("bl.t")
    assert len(m["dirs"]) == 3 and set(m["blooms"]) == set(m["dirs"])

    # every present key found, and pruning actually happens
    pruned_counts = []
    for batch in ids:
        for k in (batch[0], batch[-1]):
            dirs = cat.bloom_pruned_dirs("bl.t", "key", k)
            pruned_counts.append(len(dirs))
            got = cat.read_point("bl.t", "key", k).collect()
            assert [r.key for r in got] == [k]
    assert min(pruned_counts) == 1  # disjoint batches: typically one dir
    assert all(c <= 3 for c in pruned_counts)

    # an absent key usually prunes everything (false positives allowed)
    assert cat.read_point("bl.t", "key", "zz_not_there").count() == 0

    # NULL probe keeps all dirs; a bloom-less dir is never skipped
    assert len(cat.bloom_pruned_dirs("bl.t", "key", None)) == 3
    cat.append(
        spark.createDataFrame([("late_key", 1)], "key string, v int"), "bl.t"
    )  # no bloom_cols: this dir must always be read
    assert "late_key" in [
        r.key for r in cat.read_point("bl.t", "key", "late_key").collect()
    ]


def test_bloom_adaptive_sizing_and_legacy_bitmap_compat(spark, cat):
    """Bitmaps are sized ~10 bits per distinct key (power-of-two,
    floored at BLOOM_BITS) so a big append's bloom doesn't saturate —
    the r05 fixed 4096-bit bitmap approved ~41% of absent-key probes
    at just 1.9k keys/dir and would approve everything at 10x.  Probes
    must honor EACH dir's own modulus, including a legacy fixed-size
    bitmap left by an older writer (no false negatives across mixed
    sizes)."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    small = spark.range(0, 50).select(F.col("id").alias("key"))
    big = spark.range(100_000, 103_000).select(F.col("id").alias("key"))
    cat.append(small, "bla.t", bloom_cols=["key"])
    cat.append(big, "bla.t", bloom_cols=["key"])
    m = cat.latest_manifest("bla.t")
    sizes = {}
    for d in m["dirs"]:
        nb, words = cat._bloom_resolve(d, "key", m["blooms"][d]["key"])
        sizes[d] = nb
        assert nb % 2 == 0 and nb >= ManifestCatalog.BLOOM_BITS
        assert words  # sidecar or inline, the bits must materialize
    assert sorted(sizes.values()) == [4096, 32768]  # 50 keys / 3k keys
    # the 512-word (32768-bit) bitmap crossed BLOOM_SIDECAR_MIN_WORDS:
    # its words live in the dir's sidecar file, the manifest holds
    # only the marker — commit size stops growing with key count
    big_dir = next(d for d in m["dirs"] if sizes[d] == 32768)
    assert m["blooms"][big_dir]["key"].get("sidecar") == 1
    assert "words" not in m["blooms"][big_dir]["key"]
    assert cat.fs.exists(f"{big_dir}/_sidecar/blooms.json")
    small_dir = next(d for d in m["dirs"] if sizes[d] == 4096)
    assert "words" in m["blooms"][small_dir]["key"]  # tiny stays inline

    # no false negatives in either dir; cross-dir pruning works
    assert cat.read_point("bla.t", "key", 7).count() == 1
    assert cat.read_point("bla.t", "key", 102_500).count() == 1
    assert len(cat.bloom_pruned_dirs("bla.t", "key", 7)) <= 2
    # absent keys: the sized bitmaps should usually prune both dirs
    absent = [cat.read_point("bla.t", "key", k).count() for k in
              (999_999_007, 999_999_011, 999_999_013)]
    assert absent == [0, 0, 0]

    # legacy format: hand-rewrite one dir's bitmap to the pre-r06
    # shape ({word: bits} at BLOOM_BITS) — probes must still find keys
    import json as _json

    d0 = next(d for d in m["dirs"] if sizes[d] == 4096)
    legacy = dict(m["blooms"][d0]["key"]["words"])
    m["blooms"][d0]["key"] = legacy
    ver = cat._commit("bla.t", {k: v for k, v in m.items() if k != "version"})
    assert ver > 0
    assert cat.read_point("bla.t", "key", 7).count() == 1
    assert cat.read_point("bla.t", "key", 102_500).count() == 1


def test_bloom_sidecar_batch_load_prunes_on_scheme_less_root(spark, tmp_path):
    """The non-``file:`` sidecar branch (one wholetext Spark job for
    all missing sidecars — the object-store path) must actually PRUNE,
    not silently keep every dir. Two past silent degradations this
    pins: (a) ``input_file_name`` renders file:///x while
    makeQualified says file:/x, so keying the lookup on full URIs
    matches nothing; (b) an underscore-prefixed sidecar FILE is
    invisible even to an explicit spark.read.text — the sidecar must
    live in an underscore DIRECTORY (``_sidecar/blooms.json``) so
    parquet scans filter it but explicit reads still work. A
    scheme-less catalog root routes every sidecar through the batch
    branch locally."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat2 = ManifestCatalog(spark, str(tmp_path / "bare_lake"))
    cat2.BLOOM_SIDECAR_MIN_WORDS = 0  # force every bloom to sidecar
    cat2.append(
        spark.range(0, 50).select(F.col("id").alias("key")),
        "s.t", bloom_cols=["key"],
    )
    cat2.append(
        spark.range(100, 150).select(F.col("id").alias("key")),
        "s.t", bloom_cols=["key"],
    )
    m = cat2.latest_manifest("s.t")
    assert all(
        bm["key"].get("sidecar") == 1 for bm in m["blooms"].values()
    )
    assert not next(iter(m["dirs"])).startswith("file:")  # batch branch
    # pruning works: one dir per present key, zero for an absent key
    assert len(cat2.bloom_pruned_dirs("s.t", "key", 7)) == 1
    assert len(cat2.bloom_pruned_dirs("s.t", "key", 120)) == 1
    assert len(cat2.bloom_pruned_dirs("s.t", "key", 999_999_007)) == 0
    # and never a false negative
    assert cat2.read_point("s.t", "key", 7).count() == 1
    assert cat2.read_point("s.t", "key", 120).count() == 1


def test_bloom_probe_exotic_types_never_false_negative(spark, cat):
    """Probe values whose Python str() rendering differs from Spark's
    CAST(... AS STRING) — bool, float, Decimal, timestamp, date —
    must still find their dir (the probe routes them through the same
    Spark expression as the build; a divergent rendering would flip
    every probe bit and silently skip the only dir with the key)."""
    import datetime
    import decimal

    cases = [
        ("b", "boolean", True),
        ("f", "double", 1.5e-7),            # scientific-notation repr
        ("d", "decimal(10,4)", decimal.Decimal("3.1400")),
        ("ts", "timestamp", datetime.datetime(2024, 6, 1, 12, 30, 15)),
        ("dt", "date", datetime.date(2024, 6, 1)),
    ]
    for col, typ, val in cases:
        tbl = f"blx.{col}"
        cat.append(
            spark.createDataFrame([(val,), (None,)], f"{col} {typ}"),
            tbl, bloom_cols=[col],
        )
        # decoy dir with a different value: pruning has something to skip
        other = {
            "boolean": False,
            "double": 2.25,
            "decimal(10,4)": decimal.Decimal("9.9"),
            "timestamp": datetime.datetime(1999, 1, 1),
            "date": datetime.date(1999, 1, 1),
        }[typ]
        cat.append(
            spark.createDataFrame([(other,)], f"{col} {typ}"),
            tbl, bloom_cols=[col],
        )
        got = cat.read_point(tbl, col, val).collect()
        assert len(got) == 1 and got[0][col] == val, f"{typ} probe lost {val!r}"
    # the int/str hashlib fast path still agrees with the Spark route
    cat.append(
        spark.createDataFrame([(42, "x")], "k bigint, v string"),
        "blx.fast", bloom_cols=["k"],
    )
    assert cat.read_point("blx.fast", "k", 42).count() == 1

    # CROSS-typed probes: the fast path keys on the COLUMN type, so an
    # int probe against a double/decimal column must route through the
    # Spark expression (build hashed '42.0'/'42.0000', not '42') and
    # still find its row
    cat.append(
        spark.createDataFrame([(42.0,)], "fd double"),
        "blx.xd", bloom_cols=["fd"],
    )
    cat.append(spark.createDataFrame([(7.5,)], "fd double"), "blx.xd",
               bloom_cols=["fd"])
    assert cat.read_point("blx.xd", "fd", 42).count() == 1
    cat.append(
        spark.createDataFrame([(decimal.Decimal("42.0000"),)],
                              "dd decimal(10,4)"),
        "blx.xdec", bloom_cols=["dd"],
    )
    assert cat.read_point("blx.xdec", "dd", 42).count() == 1
    # a probe the column type can't hold degrades to no pruning (all
    # dirs kept), never a wrong skip
    assert len(cat.bloom_pruned_dirs("blx.fast", "k", "not-an-int")) == 1


def test_maybe_optimize_policy_triggers_on_fragmentation(spark, cat):
    """The small-files policy: below the threshold appends accumulate
    untouched; once dirs exceed max_dirs one compaction rewrite runs
    (rows identical, single dir), and the now-compact table is a
    no-op again. Bucketed tables trigger on the WORST bucket."""
    for i in range(4):
        cat.append(_df(spark, [(i, f"v{i}")]), "mo.t")
    assert cat.maybe_optimize("mo.t", max_dirs=4) is False  # 4 <= 4
    assert len(cat.latest_manifest("mo.t")["dirs"]) == 4
    cat.append(_df(spark, [(9, "v9")]), "mo.t")
    assert cat.maybe_optimize("mo.t", max_dirs=4) is True   # 5 > 4
    m = cat.latest_manifest("mo.t")
    assert len(m["dirs"]) == 1
    assert sorted(r.k for r in cat.read("mo.t").collect()) == [0, 1, 2, 3, 9]
    assert cat.maybe_optimize("mo.t", max_dirs=4) is False  # compact again

    # bucketed: two appends touching the same bucket → worst bucket 2
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    be = F.pmod(F.hash("k"), F.lit(4))
    for _ in range(2):
        cat.append_bucketed(df, "mo.b", be, n_buckets=4, bucket_keys=["k"])
    assert cat.maybe_optimize("mo.b", max_dirs=2) is False
    assert cat.maybe_optimize("mo.b", max_dirs=1) is True
    m = cat.latest_manifest("mo.b")
    assert all(len(ds) == 1 for ds in m["bucket_dirs"].values() if ds)
    assert cat.read("mo.b").count() == 4
    # bucketed tables skip via bucket pruning — stats/bloom kwargs are
    # refused loudly, never silently ignored
    with pytest.raises(ValueError, match="bucketed"):
        cat.optimize("mo.b", bloom_cols=["k"])


def test_bloom_survives_optimize_recompute(spark, cat):
    """Compaction drops dir-keyed blooms (dead dirs); passing
    bloom_cols recomputes them for the compacted dir and point
    lookups keep pruning correctly."""
    for lo in (0, 500):
        cat.append(
            spark.createDataFrame(
                [(f"k{i}", i) for i in range(lo, lo + 30)], "key string, v int"
            ),
            "blo.t", bloom_cols=["key"],
        )
    cat.optimize("blo.t", bloom_cols=["key"])
    m = cat.latest_manifest("blo.t")
    assert len(m["dirs"]) == 1 and set(m["blooms"]) == set(m["dirs"])
    assert [r.key for r in cat.read_point("blo.t", "key", "k510").collect()] == ["k510"]
    assert cat.read_point("blo.t", "key", "nope").count() == 0


def test_append_bucketed_cas_rebase_keeps_concurrent_commit(spark, cat):
    """Two interleaved bucketed appends: the loser's CAS fails, it
    rebases onto the winner's manifest, and the final state carries
    BOTH batches' dirs plus the winner's extras marker — the
    lost-update discipline the streaming index bridges depend on."""
    from pyspark.sql import functions as F

    def bdf(rows):
        return spark.createDataFrame(rows, "cell int, v string")

    cat.append_bucketed(
        bdf([(0, "a"), (1, "b")]), "cas.t", F.col("cell"), 4, ["cell"],
        bucket_fn="identity",
    )
    orig = cat._commit_if
    fired = {"done": False}

    def racy(name, manifest, expected_base):
        if not fired["done"]:
            fired["done"] = True
            cat._commit_if = orig
            # concurrent writer lands AFTER this append pinned its base
            cat.append_bucketed(
                bdf([(2, "c")]), "cas.t", F.col("cell"), 4, ["cell"],
                bucket_fn="identity",
                extras_update={"ann_last_batch_id": 7},
            )
            cat._commit_if = racy
            assert orig(name, manifest, expected_base) is None  # stale CAS
            return None
        return orig(name, manifest, expected_base)

    cat._commit_if = racy
    try:
        cat.append_bucketed(
            bdf([(3, "d")]), "cas.t", F.col("cell"), 4, ["cell"],
            bucket_fn="identity",
        )
    finally:
        cat._commit_if = orig
    m = cat.latest_manifest("cas.t")
    assert sorted(int(b) for b in m["bucket_dirs"]) == [0, 1, 2, 3]
    assert m["ann_last_batch_id"] == 7  # winner's marker survived the rebase
    got = sorted(r.v for r in cat.read("cas.t").collect())
    assert got == ["a", "b", "c", "d"]


def test_delete_where_rewrites_only_bloomed_dirs(spark, tmp_path):
    """Targeted delete: dirs whose blooms exclude every key survive
    byte-for-byte (same path objects in the new manifest); the delete
    count is exact; NULL keys survive three-valued IN; the prior
    version still time-travels to the pre-delete rows."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    # three appends with DISJOINT key groups so pruning is decisive
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(lo + i, f"v{lo + i}") for i in range(10)]
            + ([(None, "null-row")] if lo == 0 else []),
            "k bigint, v string",
        )
        cat.append(df, "t", bloom_cols=["k"])
    m0 = cat.latest_manifest("t")
    dirs0 = list(m0["dirs"])
    assert len(dirs0) == 3
    v_pre = m0["version"]

    n = cat.delete_where("t", "k", [105, 107])
    assert n == 2
    m1 = cat.latest_manifest("t")
    dirs1 = list(m1["dirs"])
    # the two unaffected dirs carry forward verbatim
    untouched = [d for d in dirs0 if d in dirs1]
    assert len(untouched) == 2
    # their stats/bloom entries carried too
    for d in untouched:
        assert d in (m1.get("blooms") or {})
    # rows: 31 - 2 deleted, NULL row intact
    rows = cat.read("t").collect()
    assert len(rows) == 29
    assert sum(1 for r in rows if r["k"] is None) == 1
    assert not any(r["k"] in (105, 107) for r in rows if r["k"] is not None)
    # time travel to pre-delete
    assert cat.read("t", version=v_pre).count() == 31
    # point-reads on survivors still bloom-prune to one dir
    assert len(cat.bloom_pruned_dirs("t", "k", 5)) == 1

    # deleting an absent key is a no-op at version level
    v_now = m1["version"]
    assert cat.delete_where("t", "k", [99999]) == 0
    assert cat.latest_manifest("t")["version"] == v_now


def test_delete_range_retention_unlinks_whole_dirs(spark, tmp_path):
    """Retention enforcement: dirs wholly inside the expired range
    are unlinked WITHOUT a rewrite (no new dir replaces them),
    straddling dirs are rewritten filtered, disjoint dirs survive
    verbatim, NULLs survive, and the prior version time-travels."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    # dir A: days 1-10 (wholly expired), dir B: days 8-20 would
    # straddle — make B days 11-20 disjoint and C straddle 5-15
    for lo, hi in ((1, 10), (11, 20), (5, 15)):
        rows = [(d, f"r{d}") for d in range(lo, hi + 1)]
        if lo == 5:  # NULL rides the straddling dir; dir A stays
            rows.append((None, "null-day"))  # NULL-free -> pure unlink
        cat.append(
            spark.createDataFrame(rows, "day int, v string"),
            "t", stats_cols=["day"],
        )
    m0 = cat.latest_manifest("t")
    dirs0 = list(m0["dirs"])
    v_pre = m0["version"]
    total0 = cat.read("t").count()

    # expire days 1..10: dir A dropped whole, dir C rewritten, B kept
    n = cat.delete_range("t", "day", 1, 10)
    # deleted: A's 10 real rows (NULL survives) + C's days 5..10 (6)
    assert n == 16
    m1 = cat.latest_manifest("t")
    dirs1 = list(m1["dirs"])
    assert dirs0[1] in dirs1          # disjoint dir untouched
    assert dirs0[0] not in dirs1      # expired dir unlinked
    assert dirs0[2] not in dirs1      # straddler replaced
    rows = cat.read("t").collect()
    assert len(rows) == total0 - 16
    assert sum(1 for r in rows if r["day"] is None) == 1
    assert all(r["day"] is None or r["day"] > 10 for r in rows)
    # stats carried/recomputed: range reads still prune
    assert dirs0[1] in cat.pruned_dirs("t", "day", 12, 13)
    assert cat.read("t", version=v_pre).count() == total0
    # disjoint range is a no-op at version level
    assert cat.delete_range("t", "day", 100, 200) == 0
    assert cat.latest_manifest("t")["version"] == m1["version"]


def test_delete_range_null_in_expired_dir_survives(spark, tmp_path):
    """A dir wholly inside the expired range but holding NULL rows is
    demoted to a rewrite (NULLs survive) instead of being unlinked."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    cat.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (None, "keep-me")], "day int, v string"
        ),
        "t", stats_cols=["day"],
    )
    assert cat.delete_range("t", "day", 1, 10) == 2
    rows = cat.read("t").collect()
    assert len(rows) == 1 and rows[0]["v"] == "keep-me"


def test_delete_where_null_value_in_list_is_stripped(spark, tmp_path):
    """A NULL inside the delete-values list must not poison the
    three-valued keep filter (`~col.isin([.., NULL])` is NULL for
    every non-matching row) — the round-5 review's mass-deletion
    hole: only the named keys go, everything else survives."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    cat.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)] + [(None, "nullk")],
            "k bigint, v string",
        ),
        "t", bloom_cols=["k"],
    )
    assert cat.delete_where("t", "k", [3, None, 7]) == 2
    rows = cat.read("t").collect()
    assert len(rows) == 9  # 11 - 2; NULL row and the other 8 survive
    assert {r["k"] for r in rows if r["k"] is not None} == {0, 1, 2, 4, 5, 6, 8, 9}
    # all-NULL list is a no-op
    assert cat.delete_where("t", "k", [None]) == 0


def test_delete_bucketed_null_value_stripped(spark, tmp_path):
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k bigint, v string"
    )
    cat.append_bucketed(df, "t", F.pmod(F.hash("k"), F.lit(4)), 4, ["k"])
    assert cat.delete_bucketed_where("t", "k", [2, None]) == 1
    assert cat.read("t").count() == 9


def test_update_where_rewrites_only_bloomed_dirs(spark, tmp_path):
    """Targeted UPDATE: matching rows get the set-expressions (which
    may reference the row's own columns), non-matching rows and
    unaffected dirs pass through byte-for-byte, NULL keys never
    match, stats/blooms recompute on the rewritten dir, and the
    prior version time-travels."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    for lo in (0, 100, 200):
        rows = [(lo + i, float(lo + i)) for i in range(10)]
        if lo == 0:
            rows.append((None, -1.0))
        cat.append(
            spark.createDataFrame(rows, "k bigint, price double"),
            "t", bloom_cols=["k"], stats_cols=["price"],
        )
    m0 = cat.latest_manifest("t")
    dirs0 = list(m0["dirs"])
    v_pre = m0["version"]

    n = cat.update_where(
        "t", "k", [105, 107, None], {"price": F.col("price") * 2}
    )
    assert n == 2
    m1 = cat.latest_manifest("t")
    untouched = [d for d in dirs0 if d in m1["dirs"]]
    assert len(untouched) == 2  # only the 100s dir rewritten
    rows = {r["k"]: r["price"] for r in cat.read("t").collect() if r["k"] is not None}
    assert rows[105] == 210.0 and rows[107] == 214.0
    assert rows[106] == 106.0  # same dir, unmatched: unchanged
    assert rows[5] == 5.0      # other dir: untouched
    null_rows = [r for r in cat.read("t").collect() if r["k"] is None]
    assert null_rows and null_rows[0]["price"] == -1.0
    # stats recomputed on the rewritten dir: a range read for the new
    # price still finds it
    assert any(
        r["k"] == 107 for r in cat.read_range("t", "price", 213.0, 215.0).collect()
    )
    assert cat.read("t", version=v_pre).count() == 31
    # updating the match column itself is refused
    import pytest as _pytest
    with _pytest.raises(ValueError, match="match column"):
        cat.update_where("t", "k", [1], {"k": F.lit(9)})
    # absent keys: no-op at version level
    v_now = m1["version"]
    assert cat.update_where("t", "k", [99999], {"price": F.lit(0.0)}) == 0
    assert cat.latest_manifest("t")["version"] == v_now


def test_delete_then_vacuum_completes_erasure(spark, tmp_path):
    """The GDPR end-state: delete_where removes the rows from the
    LIVE version, and vacuum(keep_versions=1) then physically
    reclaims every pre-delete data dir — after which no retained
    version can produce the deleted keys and the bytes are gone from
    disk. (Until vacuum, the prior version deliberately still reads
    them — that window IS the audit-trail dial.)"""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    for lo in (0, 100):
        cat.append(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(5)], "k bigint, v string"
            ),
            "t", bloom_cols=["k"],
        )
    m0 = cat.latest_manifest("t")
    v_pre, dirs0 = m0["version"], list(m0["dirs"])
    assert cat.delete_where("t", "k", [101, 103]) == 2
    # audit window: prior version still reads the deleted rows
    assert cat.read("t", version=v_pre).filter("k in (101, 103)").count() == 2

    deleted_dirs = cat.vacuum("t", keep_versions=1, min_age_seconds=0)
    # the rewritten dir (which held 101/103) was reclaimed; the
    # untouched dir survives
    rewritten = [d for d in dirs0 if d not in cat.latest_manifest("t")["dirs"]]
    assert rewritten and all(
        any(cat.fs.qualified(d) == cat.fs.qualified(x) for x in deleted_dirs)
        for d in rewritten
    )
    for d in rewritten:
        assert not cat.fs.exists(d)
    # only the post-delete version remains; the keys are unreachable
    assert cat._versions("t") == [cat.latest_manifest("t")["version"]]
    assert cat.read("t").filter("k in (101, 103)").count() == 0
    assert cat.read("t").count() == 8


def test_shallow_clone_zero_copy_and_divergence(spark, tmp_path):
    """Shallow clone: no data moves (the clone's manifest references
    the source's dirs), reads agree at clone time, and the two tables
    then diverge independently — the source's later appends/deletes
    never leak into the clone and vice versa."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    cat.append(_df(spark, [(1, "a"), (2, "b")]), "src", bloom_cols=["k"])
    cat.append(_df(spark, [(3, "c")]), "src")
    v = cat.shallow_clone("src", "snap")
    assert v == 1
    m = cat.latest_manifest("snap")
    assert m["cloned_from"] == {"table": "src", "version": 2}
    # zero-copy: identical dir references, blooms carried
    assert m["dirs"] == cat.latest_manifest("src")["dirs"]
    assert sorted(r.k for r in cat.read("snap").collect()) == [1, 2, 3]
    # divergence both ways
    cat.append(_df(spark, [(4, "d")]), "src")
    cat.delete_where("snap", "k", [1])
    assert sorted(r.k for r in cat.read("src").collect()) == [1, 2, 3, 4]
    assert sorted(r.k for r in cat.read("snap").collect()) == [2, 3]
    # cloning onto an existing table is refused; versioned clone works
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exists"):
        cat.shallow_clone("src", "snap")
    cat.shallow_clone("src", "snap_v1", version=1)
    assert sorted(r.k for r in cat.read("snap_v1").collect()) == [1, 2]


def test_maybe_vacuum_version_pressure_policy(spark, tmp_path):
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    for i in range(6):
        cat.append(_df(spark, [(i, f"v{i}")]), "t")
    # below threshold: nothing happens, full log retained
    assert cat.maybe_vacuum("t", max_versions=10, min_age_seconds=0) == []
    assert len(cat._versions("t")) == 6
    # over threshold: GC runs with the given retention
    deleted = cat.maybe_vacuum(
        "t", max_versions=5, keep_versions=2, min_age_seconds=0
    )
    assert deleted == []  # appends share no superseded dirs...
    assert len(cat._versions("t")) == 2  # ...but the log is trimmed
    # data intact
    assert cat.read("t").count() == 6
    # compaction then delete leaves superseded dirs for the GC
    cat.optimize("t", target_partitions=1)
    for i in range(6, 10):
        cat.append(_df(spark, [(i, f"v{i}")]), "t")
    deleted = cat.maybe_vacuum(
        "t", max_versions=3, keep_versions=1, min_age_seconds=0
    )
    assert deleted  # pre-compaction dirs reclaimed
    assert cat.read("t").count() == 10


def test_latest_manifest_hint_is_advisory(spark, cat):
    """The _latest hint is O(1)-read sugar, never truth: a STALE hint
    (lost overwrite race / external writer) forward-scans to the real
    latest over the dense version sequence, and a CORRUPT or missing
    hint falls back to the full listing. Either failure must yield
    exactly what the listing would."""
    cat.replace_atomic(_df(spark, [(1, "a")]), "h.t")
    cat.append(_df(spark, [(2, "b")]), "h.t")
    cat.append(_df(spark, [(3, "c")]), "h.t")
    mdir = cat._manifest_dir("h.t")
    assert cat.latest_manifest("h.t")["version"] == 3
    assert cat.fs.read_text(f"{mdir}/_latest").strip() == "3"

    # stale hint: points at v1 — reader must forward-scan to 3
    cat.fs.write_text(f"{mdir}/_latest", "1", overwrite=True)
    assert cat.latest_manifest("h.t")["version"] == 3

    # hint ahead of any committed version (crash before publish
    # rolled back): exists-check fails -> listing fallback
    cat.fs.write_text(f"{mdir}/_latest", "99", overwrite=True)
    assert cat.latest_manifest("h.t")["version"] == 3

    # corrupt hint -> listing fallback
    cat.fs.write_text(f"{mdir}/_latest", "not-a-number", overwrite=True)
    assert cat.latest_manifest("h.t")["version"] == 3

    # missing hint -> listing fallback; next commit rewrites it
    cat.fs.delete(f"{mdir}/_latest")
    assert cat.latest_manifest("h.t")["version"] == 3
    cat.append(_df(spark, [(4, "d")]), "h.t")
    assert cat.fs.read_text(f"{mdir}/_latest").strip() == "4"
    assert sorted(r.k for r in cat.read("h.t").collect()) == [1, 2, 3, 4]

    # vacuum keeps the hint consistent with the retained tail
    cat.vacuum("h.t", keep_versions=1, min_age_seconds=0)
    assert cat.latest_manifest("h.t")["version"] == 4


def test_column_type_cache_invalidated_on_replace(spark, cat):
    """ADVICE r07 low: replace_atomic can legally land a DIFFERENT
    type for an existing column name. A stale cached type would hash
    bloom probes under the old type and silently prune a dir that
    holds the value (false negative in read_point)."""
    cat.append(
        spark.createDataFrame([(7, "a"), (8, "b")], "key int, v string"),
        "retype.t", bloom_cols=["key"],
    )
    assert cat.read_point("retype.t", "key", 7).count() == 1  # caches int

    cat.replace_atomic(
        spark.createDataFrame([("7", "a"), ("zz", "b")], "key string, v string"),
        "retype.t", bloom_cols=["key"],
    )
    got = cat.read_point("retype.t", "key", "zz").collect()
    assert [r.key for r in got] == ["zz"]
    assert [r.key for r in cat.read_point("retype.t", "key", "7").collect()] == ["7"]

    # drop + recreate under yet another type must also re-read
    cat.drop("retype.t")
    cat.append(
        spark.createDataFrame([(99,)], "key bigint"), "retype.t",
        bloom_cols=["key"],
    )
    assert cat.read_point("retype.t", "key", 99).count() == 1


def test_rename_exclusive_is_an_atomic_claim(spark, cat, tmp_path):
    """The commit primitive: under contention exactly ONE claimant
    may win a target, and the winner's content is intact (POSIX
    rename() overwrites — the r08 two-writer fuzz caught the old
    check-then-rename losing a committed version to a racer)."""
    import threading

    base = f"file://{tmp_path}/claims"
    for rnd in range(20):
        target = f"{base}/slot-{rnd}"
        wins = []

        def claim(w: int) -> None:
            src = f"{base}/tmp-{rnd}-{w}"
            cat.fs.write_text(src, f"writer-{w}")
            if cat.fs.rename_exclusive(src, target):
                wins.append(w)
            else:
                cat.fs.delete(src)

        ts = [threading.Thread(target=claim, args=(w,)) for w in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1, f"round {rnd}: winners={wins}"
        assert cat.fs.read_text(target) == f"writer-{wins[0]}"


@pytest.fixture()
def jvm_cat(spark, tmp_path):
    """Catalog forced onto the JVM IO branch (what a real cluster FS
    takes): _fs_is_local=False disables the python fast path, so
    write_text/read_text/rename_exclusive and segment IO all route
    through org.apache.hadoop.fs against the SAME local dir — the
    branch the r08 local-IO gating fix made unreachable in local
    tests, and the one whose divergence from the python path is
    exactly the split-brain failure class."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    c = ManifestCatalog(spark, f"file://{tmp_path}/jvmlake")
    c.fs._fs_is_local = False
    return c


def test_hadoopfs_jvm_branch_matches_python_contract(jvm_cat, tmp_path):
    fs = jvm_cat.fs
    p = f"file://{tmp_path}/jvmlake/a/b/probe.txt"
    fs.write_text(p, "v1")
    assert fs.read_text(p) == "v1"
    assert fs.exists(p)
    fs.write_text(p, "v2", overwrite=True)
    assert fs.read_text(p) == "v2"
    assert any(e.endswith("probe.txt") for e in
               fs.listdir(f"file://{tmp_path}/jvmlake/a/b"))
    assert fs.mtime_ms(p) > 0
    # exclusive claim: first wins, second loses, winner content intact
    s1 = f"file://{tmp_path}/jvmlake/a/t1"
    s2 = f"file://{tmp_path}/jvmlake/a/t2"
    dst = f"file://{tmp_path}/jvmlake/a/slot"
    fs.write_text(s1, "one")
    fs.write_text(s2, "two")
    assert fs.rename_exclusive(s1, dst) is True
    assert fs.rename_exclusive(s2, dst) is False
    assert fs.read_text(dst) == "one"
    fs.delete(p)
    assert not fs.exists(p)


def test_segment_roundtrip_nonlocal_path(spark, jvm_cat):
    """write_segment/load_segment on the non-local branch (Spark job
    write, toPandas + pinned-schema read) must answer probes exactly
    like the local pyarrow branch — including an ALL-STATS segment
    whose empty bloom_cols lists give pandas nothing to infer
    element types from (the r08 review's inference-failure case)."""
    from end_to_end_etl_pipeline_spark.sinks.segments import (
        load_segment,
        write_segment,
    )

    rows = []
    for i in range(6):
        words = {"0": i + 1}  # word 0 bit pattern = i+1
        rows.append(
            (f"file:///jd/{i:02d}", {"ts": [i * 10, i * 10 + 9]},
             {"key": (4096, words)} if i % 2 == 0 else {})
        )
    seg_id, path = write_segment(jvm_cat, "jvm.t", rows)
    seg = load_segment(jvm_cat, path)
    assert seg.range_kept("ts", 25, 34) == ["file:///jd/02", "file:///jd/03"]
    # bloomless odd dirs kept conservatively; even dirs by bit 1 of
    # i+1 (set only for i=2) — an i-dependent, non-trivial keep set
    kept = seg.bloom_kept("key", lambda nb: [(0, 1)])
    assert kept == ["file:///jd/01", "file:///jd/02", "file:///jd/03",
                    "file:///jd/05"]
    # all-stats segment (no blooms anywhere)
    seg_id2, path2 = write_segment(
        jvm_cat, "jvm.t2",
        [(f"file:///jd2/{i}", {"ts": [i, i]}, {}) for i in range(3)],
    )
    seg2 = load_segment(jvm_cat, path2)
    assert seg2.range_kept("ts", 1, 1) == ["file:///jd2/1"]
    assert seg2.bloom_kept("key", lambda nb: [(0, 0)]) == [
        f"file:///jd2/{i}" for i in range(3)
    ]


def test_catalog_crud_on_jvm_branch_with_sealing(spark, jvm_cat):
    """End-to-end CRUD through forced JVM IO with sealing engaged
    (SEGMENT_SIZE=2): manifests, _latest hints, sidecars, segment
    files, and point lookups must all work on the branch a real
    cluster filesystem takes."""
    jvm_cat.SEGMENT_SIZE = 2
    for i in range(5):
        jvm_cat.append(
            spark.range(i * 10, i * 10 + 10).select(
                F.col("id").alias("key"), (F.col("id") % 7).alias("v")
            ),
            "jvm.crud", stats_cols=["key"], bloom_cols=["key"],
        )
    m = jvm_cat.latest_manifest("jvm.crud")
    assert m is not None and len(m.get("sealed") or {}) >= 2
    assert jvm_cat.read("jvm.crud").count() == 50
    assert [r.key for r in jvm_cat.read_point("jvm.crud", "key", 23).collect()] == [23]
    assert jvm_cat.read_range("jvm.crud", "key", 10, 19).count() == 10
    assert jvm_cat.delete_where("jvm.crud", "key", [23]) == 1
    assert jvm_cat.read_point("jvm.crud", "key", 23).count() == 0
    assert jvm_cat.read("jvm.crud").count() == 49
