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

# r07 rotation (VERDICT r06 "Next round" #1): the five r06-registered
# queries that could not take a slot rotate IN — ann_store_rebalanced_topk
# (IVF hot-cell split conformance), streaming_scd2_dimension
# (foreachBatch SCD2 ≡ batch oracle), incremental_dedup_ingest_bucketed
# (band-bucketed twin, identical oracle as the plain store),
# vocab_drift_psi (per-word PSI drift), corpus_datacard (one-frame
# datasheet) — restoring the invariant that every registered query
# holds a driver row within one round of registration. Also IN: the
# NEW streaming_late_data_revenue watermark gate (VERDICT #6 — late/
# out-of-order rows vs the watermark contract; new family, lands in
# the window its shipping round) and the eight OLDEST-evidence rows
# (last green r02/r03): user_sessions, shipping_priority,
# order_value_percentiles, near_dup_clusters, bloom_seen_docs,
# doc_span_overlap, line_dedup_corpus, simhash_near_dup.
#
# Also IN (late r07): c4_line_filtered_corpus — the NEW C4-style
# line-level quality filter, in its shipping round, over
# user_time_weighted_value (green r06, no family claim).
#
# Slot accounting for the 15 rows that rotate OUT (every one green in
# CORRECTNESS_r06, every family still represented — test-asserted
# below): cosine_topk_ivf_adaptive (ann → ann_store_rebalanced_topk),
# scd2_member_delete (scd2 → streaming_scd2_dimension +
# orders_pit_dimension_join), vocab_oov_rates (vocab →
# vocab_drift_psi), incremental_dedup_ingest (→ the bucketed twin,
# same oracle), order_price_equidepth_bins (profiling →
# corpus_datacard + join_key_skew_profile), within_doc_line_dedup
# (exact-dedup → line_dedup_corpus), price_quantile_sketch (sketch →
# bloom_seen_docs), embedding_downsample + embedding_hadamard (vector
# hygiene, no family claim), important_part_value (core-joins →
# excess_stock_suppliers), daily_event_gapfill +
# daily_value_forward_fill (event shapes, no family claim),
# lang_temperature_mix + source_mix_plan (sampling →
# doc_stratified_sample).
#
# r08 rotation guidance: refresh the next-oldest evidence (rows whose
# last green is r03/r04) over same-family r06/r07-green rows, keeping
# every family represented; any NEW operator family lands in the
# window the round it ships.
DRIVER_WINDOW: tuple[str, ...] = (
    # medallion e2e flagship (scan→DQ→SCD2→gold KPIs in one row)
    "medallion_gold_fact",
    # sources: multiline JSON / CSV / ORC / text round-trips
    "json_scan_roundtrip",
    "csv_scan_roundtrip",
    "orc_scan_roundtrip",
    "text_scan_roundtrip",
    # SCD family: the streaming foreachBatch SCD2 bridge (NEW slot —
    # order-sensitive stream answering the batch oracle exactly; also
    # the streaming-bridge family) and the point-in-time dimension
    # join (as-of against SCD2 validity intervals)
    "streaming_scd2_dimension",
    "orders_pit_dimension_join",
    # storage-engine CRUD gates (sinks/manifest.py): retention expiry
    # via stats-pruned delete_range and targeted update_where
    "orders_retention_expiry",
    "orders_targeted_update",
    # streaming gates — foreachBatch materialized view (ivm slot,
    # green r06) + the NEW watermark/late-data contract gate (out-of-
    # order event stream; oracle admits exactly the rows the
    # watermark contract admits)
    "streaming_priority_revenue",
    "streaming_late_data_revenue",
    # dedup: exact line dedup (oldest-evidence refresh, last green
    # r02/r03) + near-dup (LSH-pruned corpus — also the curated-
    # corpus-production shape; plus the three r02/r03-evidence rows:
    # connected clusters, span overlap, simhash) + semantic
    # contamination + the BAND-BUCKETED incremental store twin
    # (identical oracle as the plain mode, green r06)
    "line_dedup_corpus",
    "near_dup_pruned_corpus",
    "near_dup_clusters",
    "doc_span_overlap",
    "simhash_near_dup",
    "semantic_split_contamination",
    "incremental_dedup_ingest_bucketed",
    # ANN: the hot-cell rebalance conformance gate (split loses
    # nothing; arrangement-independent oracle) takes the family slot
    "ann_store_rebalanced_topk",
    # embedding transforms: distributed Lloyd k-means keeps the
    # kmeans-vectors slot
    "embedding_kmeans_clusters",
    # retrieval stack: tf-idf keyword inverted-index similarity takes
    # the lexical slot; hybrid RRF fusion, the GROUPED MMR twin,
    # cross-encoder seam, nDCG eval, hard negatives, preference pairs
    "keyword_doc_similarity",
    "hybrid_doc_retrieval",
    "mmr_diverse_rerank_grouped",
    "crossencoder_rerank_topk",
    "bm25_ndcg_eval",
    "hard_negative_mining",
    "preference_pair_mining",
    # text analysis: unigram LM perplexity (family slot) + repetition
    # ratio (the Gopher quality signal — quality-classifier slot)
    "doc_unigram_logppl",
    "doc_repetition_ratio",
    # privacy + feature prep (singleton families)
    "customer_kanonymity",
    "priority_target_encoding",
    # corpus curation: decontaminated train split (splits slot),
    # token-budget packed bin manifests (packing slot), stratified
    # sampling (sampling slot)
    "decontaminated_train_split",
    "packed_bin_manifests",
    "doc_stratified_sample",
    # importance selection (singleton family) + vocab drift PSI (NEW
    # vocab slot) + the one-frame corpus datacard (profiling)
    "dsir_importance_scores",
    "vocab_drift_psi",
    "corpus_datacard",
    # tokenizer training: the batched scale path
    "bpe_merge_rules_batched",
    # multimodal binary
    "binary_doc_stats",
    # sketches: streaming bloom-filter membership takes the family
    # slot (oldest-evidence refresh, last green r02/r03)
    "bloom_seen_docs",
    # profiling: join-key skew profile (the pre-flight you run before
    # choosing a salting strategy)
    "join_key_skew_profile",
    # DQ: cross-table referential-integrity audit
    "referential_integrity_audit",
    # event-sequence shapes: sessionization (oldest-evidence refresh);
    # basket attribution keeps its keeper. (user_time_weighted_value,
    # green r06 and family-free, gave its slot to the NEW C4 line
    # filter so the "driver row within one round of registration"
    # invariant holds without r08 debt.)
    "user_sessions",
    "purchase_touch_attribution",
    # NEW this round: C4-style line-level quality filtering (zero-
    # shuffle gate+rebuild; curation-lineage family)
    "c4_line_filtered_corpus",
    # TPC-H-shaped core: Q11 keeper + the two oldest-evidence core
    # rows (Q3-ish shipping priority, percentile profile)
    "excess_stock_suppliers",
    "shipping_priority",
    "order_value_percentiles",
    # entity resolution + grouped Python model fit
    "customer_record_linkage",
    "event_type_value_trend",
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
