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

# r06 rotation: ALL 28 queries that had never held a driver row after
# r05 rotate IN (the full list in VERDICT r05 "What's missing" #1),
# plus the NEW streaming_priority_revenue conformance gate — the first
# driver-gated Structured Streaming surface (foreachBatch materialized
# view; lands in the window its shipping round like every new family).
# That is 29 new entries, leaving 21 keeper slots; after this round
# every registered query has held at least one driver-green row across
# r01-r06.
#
# The 21 keepers are exactly the families no rotation entry can cover:
# the four format round-trips + medallion e2e (singleton families) and
# the r04/r05-new singleton families (hybrid RRF, cross-encoder seam,
# hard negatives, nDCG eval, k-anonymity, preference pairs, target
# encoding, DSIR, quality-tiered OOV vocab, batched BPE, multimodal,
# record linkage, grouped models, incremental dedup store, semantic
# dedup, exact dedup, basket attribution) — all green r05 or earlier,
# all still window-pinned so no family leaves the hard signal.
#
# Slot accounting for the 29 rows that rotated OUT (every one driver-
# green in r04 or r05, every family still represented — test-asserted
# below): customer_master (flagship; entry() still runs it every
# round), scd2_transition (scd2 → scd2_member_delete, the MERGE
# DELETE leg), the five r05-green storage gates minus the two CRUD
# slots (storage → orders_retention_expiry + orders_targeted_update,
# the delete_range/update_where hard claims), doc_shared_span_extent
# (near-dedup → near_dup_pruned_corpus), ann_store_incremental_topk +
# ann_recall_at_k (ann → cosine_topk_ivf_adaptive, the adaptive-probe
# variant), embedding_int8_quantize (kmeans-vectors →
# embedding_kmeans_clusters, the Lloyd-iteration trainer),
# bm25_doc_search + bm25_store_search (lexical-retrieval →
# keyword_doc_similarity, the tf-idf inverted-index modality),
# mmr_diverse_rerank (diversified-retrieval → the GROUPED twin — the
# scale-right plan, one shuffle vs ~2k job barriers, same oracle),
# doc_script_profile + doc_pii_redacted (text-analysis →
# doc_unigram_logppl), quality_classifier_scores (quality signals →
# doc_repetition_ratio, the Gopher repetition signal),
# corpus_funnel_audit (curation-lineage → near_dup_pruned_corpus,
# the same curated-corpus-production shape as clean_corpus),
# split_contamination (splits → decontaminated_train_split),
# rag_context_pack (packing-chunking → packed_bin_manifests),
# source_capped_docs (sampling → doc_stratified_sample +
# lang_temperature_mix + source_mix_plan), incremental_priority_revenue
# (ivm → streaming_priority_revenue, the same apply_agg_delta state
# machinery fed by a real stream), daily_uniques_bitmap +
# winsorized_price_stats_sketch (sketch → price_quantile_sketch),
# daily_event_anomaly (profiling → join_key_skew_profile +
# order_price_equidepth_bins), min_cost_supplier + frequent_part_pairs
# (core-joins → excess_stock_suppliers + important_part_value),
# purchase_next_view_asof (asof → orders_pit_dimension_join, the
# point-in-time dimension join IS an as-of join on SCD2 validity).
#
# r07 rotation guidance: with the never-run list retired, rotate IN
# first the one r06-shipped query that could not take a slot (every
# r06 slot was spoken for by the never-run retirement + singleton
# keepers): ann_store_rebalanced_topk — the IVF hot-cell split gate
# (operators/ivf_store.py:rebalance_ivfpq_store), oracle-green at
# sf0.001+sf0.01, natural swap for a same-family ann row — and
# vocab_drift_psi (per-word PSI corpus drift between snapshots,
# vocab/profiling family, oracle-green at both SFs) — and
# streaming_scd2_dimension (the foreachBatch SCD2 bridge over a
# pinned-mtime file stream, answering the batch scd2_transition
# oracle exactly; scd + streaming-bridge families) — and
# incremental_dedup_ingest_bucketed (the band-bucketed >>RAM-scale
# execution twin, identical oracle; incremental-dedup family) — and
# corpus_datacard (the one-frame datasheet report; profiling
# family). Then
# refresh the OLDEST evidence (rows whose last green is r02/r03:
# user_sessions, shipping_priority, order_value_percentiles,
# near_dup_clusters, bloom_seen_docs, doc_span_overlap,
# line_dedup_corpus, simhash_near_dup) over same-family r05/r06-green
# rows, keeping every family represented. Any NEW operator family
# lands in the window the round it ships.
DRIVER_WINDOW: tuple[str, ...] = (
    # medallion e2e flagship (scan→DQ→SCD2→gold KPIs in one row)
    "medallion_gold_fact",
    # sources: multiline JSON / CSV / ORC / text round-trips
    "json_scan_roundtrip",
    "csv_scan_roundtrip",
    "orc_scan_roundtrip",
    "text_scan_roundtrip",
    # SCD family: the MERGE's DELETE leg (scd2_transition green
    # r01-r05) and the point-in-time dimension join (as-of against
    # SCD2 validity intervals)
    "scd2_member_delete",
    "orders_pit_dimension_join",
    # storage-engine CRUD gates (sinks/manifest.py): retention expiry
    # via stats-pruned delete_range and targeted update_where — the
    # deletion surface's two remaining hard claims (bloom/CDF/
    # time-travel/zorder/targeted-delete all green r05)
    "orders_retention_expiry",
    "orders_targeted_update",
    # streaming conformance gate — foreachBatch materialized view
    # over a file-source stream, final state vs one-shot oracle (NEW
    # this round; also the ivm family's slot — same apply_agg_delta
    # machinery as incremental_priority_revenue, green r05)
    "streaming_priority_revenue",
    # dedup: exact (zero-shuffle within-doc) + near-dup (the LSH-
    # pruned corpus output — also the curated-corpus-production
    # shape) + semantic (cross-split contamination) + the incremental
    # store
    "within_doc_line_dedup",
    "near_dup_pruned_corpus",
    "semantic_split_contamination",
    "incremental_dedup_ingest",
    # ANN: the adaptive-probe IVF variant (manifest cell-count cut,
    # no corpus touch) takes the family slot from the two r05-green
    # store rows
    "cosine_topk_ivf_adaptive",
    # embedding transforms: distributed Lloyd k-means (kmeans-vectors
    # slot), int8 round-trip green r05; plus the two vector hygiene
    # ops never driver-run
    "embedding_kmeans_clusters",
    "embedding_downsample",
    "embedding_hadamard",
    # retrieval stack: tf-idf keyword inverted-index similarity takes
    # the lexical slot (both BM25 rows green r05); hybrid RRF fusion,
    # the GROUPED MMR twin (scale-right plan, same oracle as the
    # plan-flat row green r05), cross-encoder seam, nDCG eval, hard
    # negatives, preference pairs
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
    # privacy + feature prep (singleton families, green r05)
    "customer_kanonymity",
    "priority_target_encoding",
    # corpus curation: decontaminated train split (splits slot),
    # token-budget packed bin manifests (packing slot), stratified /
    # temperature / source-mix sampling (sampling slots)
    "decontaminated_train_split",
    "packed_bin_manifests",
    "doc_stratified_sample",
    "lang_temperature_mix",
    "source_mix_plan",
    # importance selection + vocab (singleton families, green r05)
    "dsir_importance_scores",
    "vocab_oov_rates",
    # tokenizer training: the batched scale path (green r05)
    "bpe_merge_rules_batched",
    # multimodal binary (green r05)
    "binary_doc_stats",
    # sketches: the mergeable KLL-style quantile sketch takes the
    # family slot (bitmap + winsorized-sketch green r05)
    "price_quantile_sketch",
    # profiling: join-key skew profile (the pre-flight you run before
    # choosing a salting strategy) + equi-depth binning
    "join_key_skew_profile",
    "order_price_equidepth_bins",
    # DQ: cross-table referential-integrity audit
    "referential_integrity_audit",
    # event-sequence shapes: calendar gap-fill, forward-fill carry,
    # time-weighted value; basket attribution keeps its keeper
    "daily_event_gapfill",
    "daily_value_forward_fill",
    "user_time_weighted_value",
    "purchase_touch_attribution",
    # TPC-H-shaped core joins never driver-run (Q11/Q9-ish shapes)
    "excess_stock_suppliers",
    "important_part_value",
    # entity resolution + grouped Python model fit (green r05)
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
