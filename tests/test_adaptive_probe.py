"""ivf_probe_adaptive contract: per-query candidate-count floor,
crossing-cell inclusion, and equivalence to brute force when the
floor spans the corpus.  The oracle-gated query
(cosine_topk_ivf_adaptive) proves value parity; these pin the
operator-level selection rule on frames where the cells are skewed
by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    ivf_probe_adaptive,
)


def _skewed_corpus(spark):
    # cell 0: 8 vectors, cell 1: 3, cell 2: 1 — deliberately uneven
    rows = []
    vid = 0
    for lbl, n in [(0, 8), (1, 3), (2, 1)]:
        for i in range(n):
            rows.append((vid, [1.0 + lbl, float(i % 3), 1.0], lbl))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )


def test_adaptive_probe_meets_candidate_floor(spark):
    corpus = _skewed_corpus(spark)
    queries = corpus.filter("vec_id in (0, 8, 11)")
    counts = {r["label"]: r["n"] for r in
              corpus.groupBy("label").agg(F.count("*").alias("n")).collect()}
    prev_cells: dict = {}
    for floor in (1, 4, 9, 12):
        probed = ivf_probe_adaptive(
            queries, corpus, "vec_id", "embedding", "label",
            min_candidates=floor,
        ).collect()
        per_q: dict = {}
        for r in probed:
            per_q.setdefault(r["query_id"], set()).add(r["label"])
        for qid, cells in per_q.items():
            got = sum(counts[c] for c in cells)
            # floor met (or the whole corpus probed)
            assert got >= min(floor, sum(counts.values())), (qid, floor)
            # monotone: a higher floor only ever probes MORE cells,
            # and the smaller floor's cells are a subset
            assert prev_cells.get((qid, "cells"), set()) <= cells
            prev_cells[(qid, "cells")] = cells


def test_adaptive_probe_full_floor_equals_brute_force(spark):
    corpus = _skewed_corpus(spark)
    queries = corpus.filter("vec_id in (0, 8)")
    adaptive = cosine_topk_ivf(
        queries, corpus, "vec_id", "vec_id", "embedding", "label",
        k=3, min_candidates=10_000,
    )
    brute = cosine_topk(
        queries, corpus, "vec_id", "vec_id", "embedding", k=3,
    )
    assert sorted(map(tuple, adaptive.collect())) == sorted(
        map(tuple, brute.collect())
    )


def test_adaptive_probe_small_floor_probes_one_cell(spark):
    corpus = _skewed_corpus(spark)
    queries = corpus.filter("vec_id = 0")
    probed = ivf_probe_adaptive(
        queries, corpus, "vec_id", "embedding", "label", min_candidates=1
    ).collect()
    assert len(probed) == 1  # prev_cum 0 < 1 only for the best cell


def test_store_cell_counts_metadata_and_adaptive_probe(spark, tmp_path):
    """The persisted IVFADC store keeps exact per-cell counts in the
    manifest (write + every CAS append), and min_candidates probing
    consumes ONLY that metadata: floor satisfied per query, and with
    a corpus-sized floor the adaptive query equals the probe-all
    fixed-nprobe query exactly."""
    from end_to_end_etl_pipeline_spark.operators.ivf_store import (
        append_ivfpq_store,
        ivfpq_store_topk,
        write_ivfpq_store,
    )
    from end_to_end_etl_pipeline_spark.operators.pq import pq_train
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.first().embedding)
    cb = pq_train(emb, "vec_id", "embedding", num_subspaces=8, num_centroids=8)
    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    write_ivfpq_store(cat, even, "vec_id", "embedding", "label", cb,
                      "ann.pq", dim=dim)
    m0 = cat.latest_manifest("ann.pq")
    want_even = {str(r["label"]): r["n"] for r in
                 even.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert m0["cell_counts"] == want_even
    # append folds the batch counts in exactly
    append_ivfpq_store(cat, odd, "ann.pq", cell_col="label")
    m1 = cat.latest_manifest("ann.pq")
    want_all = {str(r["label"]): r["n"] for r in
                emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert m1["cell_counts"] == want_all

    queries = emb.orderBy("vec_id").limit(3)
    total = emb.count()
    got, probed = ivfpq_store_topk(
        cat, "ann.pq", queries, "vec_id", "embedding", k=3,
        min_candidates=total,
    )
    want, probed_all = ivfpq_store_topk(
        cat, "ann.pq", queries, "vec_id", "embedding", k=3,
        nprobe=m1["n_buckets"],
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert sorted(probed) == sorted(probed_all)
    # small floor: probed cells per query satisfy the floor by counts
    floor = 60
    _, probed_small = ivfpq_store_topk(
        cat, "ann.pq", queries, "vec_id", "embedding", k=3,
        min_candidates=floor,
    )
    assert len(probed_small) < m1["n_buckets"]

    # a store written before counts existed fails loudly, not wrongly
    legacy = {k: v for k, v in m1.items() if k not in ("cell_counts", "version")}
    cat._commit("ann.pq", legacy)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cell_counts"):
        ivfpq_store_topk(cat, "ann.pq", queries, "vec_id", "embedding",
                         k=3, min_candidates=10)


def test_adaptive_cut_rule():
    from end_to_end_etl_pipeline_spark.operators.ivf_store import _adaptive_cut

    pairs = [(0, 5), (0, 2), (0, 9), (1, 2), (1, 5)]
    counts = {"5": 40, "2": 30, "9": 100}
    # q0: prev 0<60 -> take 5 (cum 40); 40<60 -> take 2 (cum 70); stop
    # q1: prev 0<60 -> take 2 (cum 30); 30<60 -> take 5 (cum 70)
    assert _adaptive_cut(pairs, counts, 60) == [(0, 5), (0, 2), (1, 2), (1, 5)]
    # unknown cell counts as 0 (never blocks later cells)
    assert _adaptive_cut([(0, 7), (0, 5)], counts, 10) == [(0, 7), (0, 5)]


def test_ivf_store_delete_is_change_proportional_and_exact(spark, tmp_path):
    """Deleting vectors from the IVFADC store rewrites only the cells
    that held them (other cells' dirs survive verbatim), decrements
    cell_counts in the same commit, and the store then answers
    queries exactly like a write-once store built without those
    vectors (same frozen quantizer)."""
    from end_to_end_etl_pipeline_spark.operators.ivf_store import (
        delete_from_ivfpq_store,
        ivfpq_store_topk,
        write_ivfpq_store,
    )
    from end_to_end_etl_pipeline_spark.operators.pq import pq_train
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.first().embedding)
    cb = pq_train(emb, "vec_id", "embedding", num_subspaces=8, num_centroids=8)
    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    write_ivfpq_store(cat, emb, "vec_id", "embedding", "label", cb,
                      "ann.pq", dim=dim)
    m0 = cat.latest_manifest("ann.pq")
    # ids from exactly two cells
    victims = [r["vec_id"] for r in
               emb.filter(F.col("label").isin(0, 1)).orderBy("vec_id")
               .limit(4).collect()]
    victim_cells = {r["label"] for r in
                    emb.filter(F.col("vec_id").isin(victims)).collect()}
    n = delete_from_ivfpq_store(cat, "ann.pq", victims)
    assert n == len(victims)
    m1 = cat.latest_manifest("ann.pq")
    for b, ds in m0["bucket_dirs"].items():
        if int(b) not in victim_cells:
            assert m1["bucket_dirs"][b] == ds, f"cell {b} rewritten needlessly"
    # counts decremented exactly
    per_cell = {str(r["label"]): r["n"] for r in
                emb.filter(F.col("vec_id").isin(victims))
                .groupBy("label").agg(F.count("*").alias("n")).collect()}
    for b, c in per_cell.items():
        assert m1["cell_counts"][b] == m0["cell_counts"][b] - c
    # equivalence to a write-once store without the victims, same
    # frozen quantizer (pin the centroids side table)
    once = ManifestCatalog(spark, f"file://{tmp_path}/once")
    write_ivfpq_store(once, emb.filter(~F.col("vec_id").isin(victims)),
                      "vec_id", "embedding", "label", cb, "ann.pq", dim=dim)
    once.replace_atomic(cat.read("ann.pq__centroids"), "ann.pq__centroids")
    queries = emb.orderBy("vec_id").limit(3)
    got, _ = ivfpq_store_topk(cat, "ann.pq", queries, "vec_id", "embedding",
                              k=3, nprobe=3)
    want, _ = ivfpq_store_topk(once, "ann.pq", queries, "vec_id", "embedding",
                               k=3, nprobe=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # deleted ids never come back
    assert not set(r["match_id"] for r in got.collect()) & set(victims)


def test_text_index_tombstone_delete_and_purge(spark, tmp_path):
    """Mark-then-purge deletion on the inverted index: after the mark,
    search scores equal a fresh index built WITHOUT the docs (stats
    decremented + read-time filter); after the purge the postings are
    physically gone, the tombstone list is empty, and results are
    unchanged."""
    from end_to_end_etl_pipeline_spark.operators.text_index import (
        delete_from_text_index,
        purge_text_index_tombstones,
        text_index_search,
        write_text_index,
    )
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data fast"),
            (2, "spark caches data"),
            (3, "ducks swim on water"),
            (4, "spark spark spark streams"),
        ],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame([(0, "spark")], "query_id bigint, word string")

    cat = ManifestCatalog(spark, f"file://{tmp_path}/a")
    write_text_index(cat, docs, "doc_id", "text", "idx", n_buckets=8)
    n = delete_from_text_index(cat, "idx", [2, 999])
    assert n == 1  # 999 absent
    m = cat.latest_manifest("idx")
    assert m["ti_deleted_ids"] == [2]
    assert m["ti_n_docs"] == 3 and m["ti_sum_dl"] == 4 + 4 + 4  # doc2's 3 gone

    fresh = ManifestCatalog(spark, f"file://{tmp_path}/b")
    write_text_index(fresh, docs.filter("doc_id <> 2"), "doc_id", "text",
                     "idx", n_buckets=8)
    got, _ = text_index_search(cat, "idx", queries, k=10)
    want, _ = text_index_search(fresh, "idx", queries, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    purged = purge_text_index_tombstones(cat, "idx")
    assert purged > 0
    m2 = cat.latest_manifest("idx")
    assert m2["ti_deleted_ids"] == []
    assert cat.read("idx").filter("doc_id = 2").count() == 0
    got2, _ = text_index_search(cat, "idx", queries, k=10)
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, want.collect()))
    # idempotent re-delete is a no-op
    assert delete_from_text_index(cat, "idx", [2]) == 0


def test_dedup_store_delete_unremembers_docs(spark, tmp_path):
    """Deleting a doc's signatures makes the store accept its
    near-dups again (the un-ingest contract), in both storage modes;
    bucketed mode leaves untouched band buckets' dirs verbatim."""
    from end_to_end_etl_pipeline_spark.operators.dedup_store import (
        MinHashDedupStore,
    )
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, "completely different words about ducks and water")],
        "doc_id bigint, text string",
    )
    dup = spark.createDataFrame([(10, text)], "doc_id bigint, text string")

    for mode, buckets in (("plain", None), ("bucketed", 8)):
        cat = ManifestCatalog(spark, f"file://{tmp_path}/{mode}")
        store = MinHashDedupStore(cat, "sig", band_buckets=buckets)
        acc, rej = store.ingest(docs, "text")
        assert acc.count() == 2
        # exact dup of doc 1 is rejected while remembered
        acc2, rej2 = store.ingest(dup, "text")
        assert acc2.count() == 0 and rej2.count() == 1
        if buckets:
            m0 = cat.latest_manifest("sig__bands")
        n = store.delete([1])
        assert n == 1
        if buckets:
            m1 = cat.latest_manifest("sig__bands")
            changed = [b for b, ds in m0["bucket_dirs"].items()
                       if m1["bucket_dirs"].get(b) != ds]
            # doc 1 touches at most `bands` buckets
            assert 0 < len(changed) <= store.bands
        # forgotten: the same dup is now accepted
        acc3, rej3 = store.ingest(dup, "text")
        assert acc3.count() == 1 and rej3.count() == 0
        # absent id delete is a no-op
        assert store.delete([999]) == 0


def test_maybe_purge_text_index_threshold(spark, tmp_path):
    from end_to_end_etl_pipeline_spark.operators.text_index import (
        delete_from_text_index,
        maybe_purge_text_index,
        write_text_index,
    )
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    docs = spark.createDataFrame(
        [(i, f"word{i} common text") for i in range(6)],
        "doc_id bigint, text string",
    )
    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    write_text_index(cat, docs, "doc_id", "text", "idx", n_buckets=4)
    delete_from_text_index(cat, "idx", [0, 1])
    # under threshold: no rewrite, tombstones remain
    assert maybe_purge_text_index(cat, "idx", max_tombstones=5) == 0
    assert cat.latest_manifest("idx")["ti_deleted_ids"] == [0, 1]
    # over threshold: physical purge, list cleared
    assert maybe_purge_text_index(cat, "idx", max_tombstones=1) > 0
    m = cat.latest_manifest("idx")
    assert m["ti_deleted_ids"] == []
    assert cat.read("idx").filter("doc_id in (0, 1)").count() == 0
