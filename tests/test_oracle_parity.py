"""Differential tests: every registered query with an oracle must match
DuckDB exactly (row count + columns + order-insensitive values) at the
driver's correctness scale factor (sf0.01 — same data volume the
driver compares at, so rounding/boundary divergences that only appear
with more data points trip locally first). This mirrors the driver's
correctness gate.
"""

from __future__ import annotations

import pytest

from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY
from tests.oracle import compare

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_correctness_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_correctness_dir)
    problems = compare(df, q.oracle, sf_correctness_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
    # non-vacuity: an empty result passes "empty == empty" and checks
    # nothing (the r02 failure class — six zero-row TPC-H literals)
    assert df.count() > 0, f"{name} is vacuous at sf0.01"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_driver_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "queries() must be non-empty"
    assert set(os_) <= set(qs)


def test_driver_window_contract():
    """The driver's correctness gate only reads the first 50 registered
    queries; DRIVER_WINDOW pins what fills those slots. Guard both the
    ordering and the family coverage so a refactor can't silently push
    a whole operator family back out of the hard signal (the r02
    failure mode)."""
    import __spark_entry__ as e
    from end_to_end_etl_pipeline_spark.queries.catalog import DRIVER_WINDOW

    keys = list(e.queries())
    os_ = e.oracle_sql()
    assert keys[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)
    assert len(DRIVER_WINDOW) <= 50
    for n in DRIVER_WINDOW:
        assert n in os_, f"window query {n} must be oracle-matched"
    # one representative per family the driver must see
    must_have = {
        "medallion_gold_fact",  # bronze→silver→gold e2e
        "json_scan_roundtrip", "csv_scan_roundtrip", "orc_scan_roundtrip",
        "scd2_transition",
        "dedup_exact_text", "near_dup_pairs", "simhash_near_dup",
        "near_dup_clusters", "doc_span_overlap",
        "cosine_topk", "ivfpq_topk", "ann_recall_trained_cells",
        "line_dedup_corpus", "word_heavy_hitters_cms", "bloom_seen_docs",
        "lang_id", "doc_token_stats", "doc_tfidf_terms",
        "quality_classifier_scores", "corpus_funnel_audit",
        "curriculum_sample", "weighted_doc_sample",
        "orders_column_profile",
        "bpe_merge_rules", "split_contamination",
        "binary_doc_stats", "doc_frame_samples",
        "incremental_priority_revenue", "daily_uniques_hll",
        "incremental_dedup_ingest", "gopher_quality_filter",
        "semantic_pruned_corpus",
    }
    assert must_have <= set(DRIVER_WINDOW)
