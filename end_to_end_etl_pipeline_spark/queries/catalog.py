"""Query registry: every implemented operator exposed as a named query
plus (where SQL-expressible) an equivalent DuckDB oracle.

This is the engine's conformance surface (SURVEY.md §5): the driver
runs each Spark query and its oracle side-by-side at sf=0.01 and
compares row count + schema + order-insensitive value hash.

Determinism rules for oracle-matched queries:
* alias every computed column identically on both sides;
* round double aggregates (sums → 2dp on cent-valued data, ratios →
  6dp) so Spark/DuckDB summation-order ulp differences vanish;
* never use current_date/now in matched queries — anchor literals;
* deterministic tie-breaks on every window ordering.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class EngineQuery:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = EngineQuery(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{table}.parquet"
    nanos_cols = NANOS_TS_COLS.get(table)
    if not nanos_cols:
        return spark.read.parquet(path)
    # Nanosecond-precision parquet timestamps are illegal for Spark's
    # vectorized reader; read them as raw int64 nanos and truncate to
    # microsecond timestamps (exactly what DuckDB/Arrow consumers do).
    # Integer `div` — double division would lose precision at 1e18 ns.
    # Files written with us-precision timestamps read as timestamps
    # directly, so only convert columns that actually come back int64.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


# Import side-effect modules that populate REGISTRY.
from end_to_end_etl_pipeline_spark.queries import core  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import scans  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import scd_queries  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import textdata  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import vectors  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import medallion_queries  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import dedup_store_queries  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver correctness window.
#
# The driver's per-round correctness gate compares the FIRST 50 entries
# of ``queries()`` (registration order) against their DuckDB oracles;
# everything after position 50 only gets the weaker local pytest parity
# sweep. CORRECTNESS_r02 proved this cap the hard way: entries 51-102
# (every scan, SCD, text, vector, and multimodal query) got no driver
# row. So the window below is an explicit, test-asserted contract: one+
# representative of every SURVEY.md §2 family and every LLM-pipeline
# family sits inside the first 50, and the remaining queries — mostly
# additional TPC-H-shaped core coverage that WAS driver-verified green
# in r01/r02 — rotate behind them.
# ---------------------------------------------------------------------------

# r08 rotation (VERDICT r07 "Next round" #2 + #3 + #4 + #5).
#
# STANDING ROTATION POLICY (from r08 on): each round the window =
# (a) every query REGISTERED this round, in its shipping round (the
#     r06 invariant: driver row within one round of registration);
# (b) one representative per operator family (test-asserted below,
#     tests/test_oracle_parity.py) — preferring, within each family,
#     the member with the OLDEST driver evidence, so family slots
#     double as freshness rotation;
# (c) every remaining slot to the globally oldest-evidence queries.
# With 171+ queries and 50 slots this bounds driver-evidence age at
# roughly ceil(registry/50) + keeper-pinned rounds; the r02 cohort
# (39 rows after r07) clears at ~14 rotations/round. All rotated-in
# rows are pre-verified under a plain driver-faithful session before
# the swap (established r05 practice).
#
# IN this round: the SIX r08-registered queries (incl. the BMP
# codec gate and the custom-stateful sessionization gate, each taking
# a filler slot — registration invariant outranks two more stale
# refreshes; large_volume_orders / event_props_stats rotate in r09;
# crossencoder_trained_rerank takes its own family's slot from the
# r07-green crossencoder_rerank_topk) —
# streaming_join_view_purchase (NEW stream-stream-join family: banded
# interval join, two watermarked sides, spacer-batch-deterministic
# late exclusion), wav_pcm_decode_stats (REAL WAV-PCM16 codec leg of
# multimodal), quality_classifier_trained (in-engine logreg training)
# — plus the 12 oldest-evidence rows: text_quality (r01),
# customer_account_tiers, customer_balance_deciles,
# customer_order_distribution, discounted_brand_revenue,
# doc_word_counts, dq_orders_clean, purchase_last_view_asof (all
# r02), and the
# four r03 family picks ann_recall_trained_cells (ann slot),
# doc_bigram_logppl (text-analysis slot), orders_column_profile
# (profiling slot), local_supplier_volume (core-joins slot).
#
# OUT (every one green in CORRECTNESS_r07; every family still
# represented — test-asserted): text_scan_roundtrip (no family
# claim), streaming_scd2_dimension (scd2 -> orders_pit_dimension_join
# keeps the family; the streaming-bridge family keeps
# streaming_priority_revenue), orders_targeted_update (storage ->
# orders_retention_expiry), near_dup_pruned_corpus + near_dup_clusters
# + simhash_near_dup (near-dedup -> doc_span_overlap;
# curation-lineage -> c4_line_filtered_corpus),
# ann_store_rebalanced_topk (ann -> ann_recall_trained_cells),
# doc_unigram_logppl (text-analysis -> doc_bigram_logppl),
# doc_repetition_ratio (quality-classifier -> the trained gate),
# corpus_datacard + join_key_skew_profile (profiling ->
# orders_column_profile), binary_doc_stats (multimodal -> the real
# codec gate), excess_stock_suppliers (core-joins ->
# local_supplier_volume), user_sessions + shipping_priority +
# order_value_percentiles + referential_integrity_audit +
# medallion-adjacent keepers with r07 evidence and no family debt.
DRIVER_WINDOW: tuple[str, ...] = (
    # r08-registered queries, in their shipping round (the BMP gate
    # took the last filler's slot — registration invariant outranks
    # one more stale refresh; large_volume_orders rotates in r09)
    "streaming_join_view_purchase",
    "streaming_view_sessions",
    "wav_pcm_decode_stats",
    "bmp_image_decode_stats",
    "quality_classifier_trained",
    # family slots taken by their OLDEST-evidence member (r03)
    "ann_recall_trained_cells",
    "doc_bigram_logppl",
    "orders_column_profile",
    "local_supplier_volume",
    # asof family slot + r02 evidence refresh in one
    "purchase_last_view_asof",
    # family keepers (most recent green, no stale member exists)
    "medallion_gold_fact",
    "json_scan_roundtrip",
    "csv_scan_roundtrip",
    "orc_scan_roundtrip",
    "orders_pit_dimension_join",
    "line_dedup_corpus",
    "doc_span_overlap",
    "semantic_split_contamination",
    "incremental_dedup_ingest_bucketed",
    "keyword_doc_similarity",
    "hybrid_doc_retrieval",
    "mmr_diverse_rerank_grouped",
    # rerank-seam family slot: the r08-registered TRAINED gate
    # (in-engine balanced logreg through the same Arrow seam)
    # supersedes crossencoder_rerank_topk (green r07) — registration
    # invariant + strictly-stronger claim, family still covered
    "crossencoder_trained_rerank",
    "hard_negative_mining",
    "bm25_ndcg_eval",
    "customer_kanonymity",
    "preference_pair_mining",
    "priority_target_encoding",
    "orders_retention_expiry",
    "embedding_kmeans_clusters",
    "bloom_seen_docs",
    "c4_line_filtered_corpus",
    "doc_stratified_sample",
    "dsir_importance_scores",
    "packed_bin_manifests",
    "decontaminated_train_split",
    "vocab_drift_psi",
    "bpe_merge_rules_batched",
    "streaming_priority_revenue",
    "streaming_late_data_revenue",
    "customer_record_linkage",
    "purchase_touch_attribution",
    "event_type_value_trend",
    # oldest-evidence fillers (r01/r02)
    "text_quality",
    "customer_account_tiers",
    "customer_balance_deciles",
    "customer_order_distribution",
    "discounted_brand_revenue",
    "doc_word_counts",
    "dq_orders_clean",
)


def _apply_driver_window() -> None:
    """Reorder REGISTRY so DRIVER_WINDOW occupies positions 1-50,
    followed by every other query in original registration order.
    Fails fast on typos or on a window entry without an oracle."""
    assert len(DRIVER_WINDOW) == len(set(DRIVER_WINDOW)), "duplicate window entry"
    assert len(DRIVER_WINDOW) <= 50, "driver window is capped at 50"
    ordered: dict[str, EngineQuery] = {}
    for n in DRIVER_WINDOW:
        q = REGISTRY[n]  # KeyError == typo; fail at import
        assert q.oracle is not None, f"window query {n} has no oracle"
        ordered[n] = q
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_window()
