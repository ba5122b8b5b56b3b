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

# r05 rotation: the 15 never-driver-run queries from the r04 queue
# plus the NEW bpe_merge_rules_batched gate rotate IN; 16 same-family
# rows that went driver-green in r04 rotate OUT to pytest parity
# (orc_scan_roundtrip stays pinned by the singleton family contract —
# instead the five r04-green TPC-H shapes, both r04-green ANN
# train-in-query rows, two r04-green near-dup rows, three r04-green
# text-analysis rows, daily_uniques_hll, winsorized_price_stats,
# weighted_doc_sample, and the two sequential-BPE rows make room).
# After this round every query registered BEFORE the r05 additions
# has held at least one driver-green row across r01-r05 (the families
# NEW in r05 — hybrid RRF, MMR, cross-encoder seam, hard negatives,
# preference pairs, target encoding, DSIR, targeted delete,
# k-anonymity, nDCG eval, semantic split contamination, RAG context
# pack — all landed in the window their shipping round; the rows that
# made room are all r04-green with their families still represented).
# The r05-shipped execution VARIANTS that did NOT take a slot
# (mmr_diverse_rerank_grouped, cosine_topk_ivf_adaptive,
# orders_retention_expiry, orders_targeted_update, scd2_member_delete,
# bpe's sequential rows already green) are pytest-parity-green and
# form the r06 never-driver-run queue below.
#
# r06 rotation guidance: rotate the queue above in first, then
# refresh the OLDEST evidence — rows whose last green is r02/r03
# (e.g. text_scan_roundtrip, user_sessions, shipping_priority,
# order_value_percentiles, doc_stratified_sample, keyword_doc_similarity,
# near_dup_clusters, bloom_seen_docs, doc_span_overlap, line_dedup_corpus,
# simhash_near_dup) — over same-family rows that went green in r05,
# keeping every family represented (test-asserted below). Any NEW
# operator family lands in the window the round it ships.
# cosine_topk_ivf_adaptive (new r05 VARIANT of the existing ann
# family), orders_retention_expiry (delete_range gate, storage
# family), orders_targeted_update (update_where gate, storage
# family), scd2_member_delete (the MERGE's DELETE leg, scd
# family), and mmr_diverse_rerank_grouped (the cogrouped-Arrow
# execution twin of the diversified-retrieval row — same oracle)
# are pytest-parity-green and natural r06 rotation candidates for
# an ann / storage / scd / retrieval slot respectively. The four
# late-r05 swaps (customer_kanonymity, bm25_ndcg_eval,
# semantic_split_contamination, rag_context_pack — all NEW, in for
# their shipping round) each displaced an r04-green row
# (dedup_exact_text, bpe_token_freqs, semantic_pruned_corpus,
# doc_packed_bins), so those four join the r02/r03-evidence pool as
# r06 refresh candidates too.
DRIVER_WINDOW: tuple[str, ...] = (
    # flagship + medallion e2e (scan→DQ→SCD2→gold KPIs in one row)
    "customer_master",
    "medallion_gold_fact",
    # sources: multiline JSON / CSV / ORC round-trips (S1/S2/S4/S5/K7)
    "json_scan_roundtrip",
    "csv_scan_roundtrip",
    "orc_scan_roundtrip",
    # SCD2 transition semantics (K5/J3)
    "scd2_transition",
    # storage-engine gates (sinks/manifest.py) — the manifest catalog's
    # hardest claims, never driver-run before r05: bloom membership
    # point-skip, change-data-feed, time-travel + vacuum retention,
    # Z-order clustered range read. All end-to-end scratch-table
    # queries with exact oracles.
    "bloom_point_lookup",
    "orders_change_data_feed",
    "orders_time_travel_vacuum",
    "zorder_range_read",
    # targeted DELETE (bloom-pruned dir rewrite + time travel) — NEW
    # in r05; doc_split_assign (green r04; splits-contamination stays
    # covered by split_contamination) gives up its slot
    "orders_targeted_delete",
    # dedup family — r05: ngram_jaccard_topk + embedding_near_dup
    # (green r04) rotate out; the zero-shuffle within-doc line dedup
    # and the winnowing shared-span extent take their slots
    # (near_dup_pairs — green r03+r04 AND benched cold+warm every
    # round — gives its slot to the NEW mmr_diverse_rerank below;
    # doc_shared_span_extent keeps the near-dedup family covered;
    # late-r05: dedup_exact_text — green r03+r04 AND benched every
    # round — gives its slot to the NEW customer_kanonymity below,
    # with exact-dedup staying covered by within_doc_line_dedup)
    "within_doc_line_dedup",
    "doc_shared_span_extent",
    # similarity / ANN family — r05: pq_topk + cosine_topk_ivf (green
    # r04) rotate out; ann_recall_at_k (exact-ground-truth recall A/B)
    # rotates in alongside the persisted-store composite
    "ann_store_incremental_topk",
    "ann_recall_at_k",
    # embedding transforms + semantic dedup — late-r05: the NEW
    # semantic_split_contamination (same within-cluster cosine
    # machinery, applied cross-split — the semantic half of eval
    # decontamination) takes the semantic-dedup slot from
    # semantic_pruned_corpus (green r04)
    "embedding_int8_quantize",
    "semantic_split_contamination",
    # incremental dedup store (O(batch) corpus dedup)
    "incremental_dedup_ingest",
    # lexical retrieval: BM25 ad-hoc + persisted inverted index;
    # hybrid RRF fusion (lexical + dense arms) is NEW in r05 and
    # lands in the window the round it ships — label_centroids
    # (green r04; kmeans-vectors family stays covered by
    # embedding_int8_quantize) gives up its slot
    "bm25_doc_search",
    "bm25_store_search",
    "hybrid_doc_retrieval",
    # diversified retrieval (MMR re-rank) and the Arrow-batched
    # cross-encoder rerank seam — both NEW in r05, landing in their
    # shipping round (lang_id — green r04 — gives up its slot; the
    # text-analysis family stays covered by doc_script_profile and
    # doc_pii_redacted)
    "mmr_diverse_rerank",
    "crossencoder_rerank_topk",
    # text analysis family — r05: doc_fingerprints, boilerplate_ratio,
    # doc_normalized, lang_id (green r04) rotate out;
    # doc_script_profile in
    "doc_script_profile",
    "quality_classifier_scores",
    # (word_heavy_hitters_cms — green r04 — gives its slot to the NEW
    # hard_negative_mining; the sketch family stays covered by
    # daily_uniques_bitmap)
    "hard_negative_mining",
    "doc_pii_redacted",
    # tokenizer training — r05: both sequential rows went green r04;
    # the batched SCALE path (one job per batch, proven ≡ sequential)
    # takes the merge-rules slot. Late-r05: bpe_token_freqs (green
    # r04, apply path) gives its slot to the NEW bm25_ndcg_eval —
    # the retrieval-quality metric closing the retrieval stack
    "bpe_merge_rules_batched",
    "bm25_ndcg_eval",
    # privacy: k-anonymity generalize-then-suppress over quasi-
    # identifiers (operators/privacy.py) — NEW late-r05 family,
    # landing in its shipping round
    "customer_kanonymity",
    # corpus curation: cleaning, splits, sampling, packing, chunking,
    # lineage (funnel audit), quality-tiered sampling
    # (clean_corpus — green r04 AND benched every round — gives its
    # slot to the NEW priority_target_encoding; curation-lineage
    # stays covered by corpus_funnel_audit)
    "priority_target_encoding",
    "corpus_funnel_audit",
    "split_contamination",
    # (doc_chunks — green r04 AND benched every round — gives its
    # slot to the NEW preference_pair_mining; late-r05:
    # doc_packed_bins — green r04 — gives its slot to the NEW
    # rag_context_pack, which keeps the packing-chunking family
    # covered from the retrieval side: dense top-5 → sliding chunks
    # → greedy token-budget context cut)
    "preference_pair_mining",
    "rag_context_pack",
    # DSIR importance scoring (hashed-ngram log-likelihood-ratio data
    # selection) is NEW late in r05 and lands in its shipping round;
    # curriculum_sample (green r04) gives up its slot and the
    # sampling family stays covered by source_capped_docs
    "dsir_importance_scores",
    "source_capped_docs",
    "vocab_oov_rates",
    # multimodal binary
    "binary_doc_stats",
    "doc_frame_samples",
    # incremental view maintenance
    "incremental_priority_revenue",
    # sketches + profiling — r05: daily_uniques_hll and the exact-sort
    # winsorization (green r04) rotate out; the exact-bitmap distinct
    # keeps the uniques family's driver row, the sketch winsorization
    # keeps the percentile family's
    "daily_uniques_bitmap",
    "winsorized_price_stats_sketch",
    "daily_event_anomaly",
    "customer_record_linkage",
    "min_cost_supplier",
    # event-sequence + basket shapes never driver-run before r05:
    # forward as-of with tolerance, linear touch attribution,
    # market-basket pair mining, per-group Arrow model fit (the five
    # r04-green TPC-H shapes rotate out to make room)
    "purchase_next_view_asof",
    "purchase_touch_attribution",
    "frequent_part_pairs",
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
