"""Physical-plan regression guards: the scale properties the engine
promises (filter pushdown to the parquet scan, broadcast of
dimension tables, bounded shuffle counts, no Python row UDFs in
codegen paths) asserted against `.explain`, so a future edit that
silently degrades a plan fails here long before it shows up at
100 TB.

These assert plan *structure*, not timings — stable across machines.
"""

import re

from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_pricing_summary_pushes_date_filter(spark):
    plan = _plan(spark, "pricing_summary")
    assert re.search(r"PushedFilters: \[.*l_shipdate", plan), (
        "shipdate band must reach the lineitem scan"
    )


def test_two_level_money_aggs_shuffle_partials_only(spark):
    """The r11 two-level exact-money form (pricing_summary /
    promo_revenue_ratio) must keep its level-1 aggregate map-side:
    the only exchanges in the plan carry (group x partition) partial
    rows or the final tiny group set — never the fact rows. Guarded
    structurally: hashpartitioning on a key set that includes __pid
    means the level-1 shuffle moves partials (each input partition
    emits <= n_groups rows for its own pid), and row-level work stays
    inside the scan-side WholeStageCodegen."""
    for name in ("pricing_summary", "promo_revenue_ratio"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "SPARK_PARTITION_ID()" in plan, (
            f"{name}: the two-level partial key is gone — the exact "
            "sums fell back to row-level decimal aggregation"
        )
        # the level-1 aggregate must still run map-side on the fact
        # rows; since r12 the money partials are try_sum (overflow ->
        # NULL -> loud merge-side raise_error instead of a silent
        # wrap, r11 ADVICE), so the partial shows as partial_try_sum
        assert "partial_try_sum" in plan, (
            f"{name}: level-1 money partials lost their overflow "
            "check (try_sum)"
        )
        assert "raise_error" in plan, (
            f"{name}: merge-side overflow guard gone"
        )


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    # nation+region must be broadcast, never shuffled as join sides
    assert plan.count("BroadcastExchange") >= 2


def test_q5_shape_pushdown_and_broadcast(spark):
    plan = _plan(spark, "local_supplier_volume")
    assert re.search(r"PushedFilters: \[.*o_orderdate", plan)
    assert re.search(r"PushedFilters: \[.*EqualTo\(r_name,ASIA", plan)
    assert "BroadcastHashJoin" in plan


def test_q10_shape_pushes_returnflag(spark):
    plan = _plan(spark, "returned_item_revenue")
    assert re.search(r"PushedFilters: \[.*EqualTo\(l_returnflag,R", plan)
    # global top-20 must be TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in plan


def test_dedup_exact_text_single_shuffle(spark):
    plan = _plan(spark, "dedup_exact_text")
    # one agg shuffle; the min_by rewrite must not reintroduce a join
    assert plan.count("Exchange") <= 2, plan  # hash agg exchange (+AQE read)
    assert "Join" not in plan
    assert "partial_min_by" in plan or "HashAggregate" in plan


def test_c4_line_filter_zero_shuffle(spark):
    """C4-style line filtering must stay a map-only pass: scan ->
    one projection+filter, NO Exchange, no Join — at 100 TB its cost
    is the scan itself, which is why C4 runs it before anything that
    shuffles."""
    plan = _plan(spark, "c4_line_filtered_corpus")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_no_python_row_udfs_in_batch_queries(spark):
    # BatchEvalPython = row-at-a-time Python UDF — banned in the hot
    # path engine-wide. (ArrowEvalPython / mapInPandas are the
    # sanctioned Python escapes and appear only in multimodal ops.)
    for name in [
        "pricing_summary",
        "customer_master",
        "near_dup_pairs",
        "cosine_topk",
        "doc_normalized",
        "doc_split_assign",
        "split_contamination",
        "vocab_oov_rates",
        "doc_chunks",
        "nation_market_share",
        # round-4 additions (event_type_value_trend is EXCLUDED by
        # design: it is the sanctioned Arrow grouped-map escape,
        # FlatMapGroupsInPandas — still never BatchEvalPython)
        "bm25_doc_search",
        "within_doc_line_dedup",
        "doc_script_profile",
        "daily_uniques_bitmap",
        "purchase_touch_attribution",
        "frequent_part_pairs",
        "doc_shared_span_extent",
        "winsorized_price_stats_sketch",
        "purchase_next_view_asof",
        "event_type_value_trend",
        # round-5 additions (crossencoder_rerank_topk uses the
        # sanctioned MapInPandas escape — still never BatchEvalPython)
        "hybrid_doc_retrieval",
        "mmr_diverse_rerank",
        # grouped-map twin: cogrouped Arrow (FlatMapCoGroupsInPandas)
        "mmr_diverse_rerank_grouped",
        "crossencoder_rerank_topk",
        "hard_negative_mining",
        "preference_pair_mining",
        "priority_target_encoding",
        "cosine_topk_ivf_adaptive",
        "orders_targeted_delete",
        "dsir_importance_scores",
        # late-round-5 additions
        "customer_kanonymity",
        "bm25_ndcg_eval",
        "semantic_split_contamination",
        "rag_context_pack",
    ]:
        assert "BatchEvalPython" not in _plan(spark, name), name


def test_kanonymity_grouped_counts_no_windows(spark):
    """Class sizes must come from grouped (map-side-partial) counts,
    never a window over the QI partition — a window ships every fact
    row of a hot class to one task; the grouped form ships bounded
    partials. Also fully JVM-side."""
    plan = _plan(spark, "customer_kanonymity")
    assert "Window" not in plan
    assert "partial_count" in plan or "partial count" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_store_probe_plan_checkpointed_and_jvm_side(spark, tmp_path):
    """The read-only probe (bench's amortized dedup twin) must stay
    a plain JVM-side plan: no Python row UDFs and no forced broadcast
    hint on the store side (store size is unbounded — AQE decides).

    r13 (VERDICT r12 #6): probe is no longer fully lazy — the batch
    signatures and the store-leg rejections are eagerly
    localCheckpoint'ed at construction (both batch-bounded), because
    the lazy plan re-executed the batch scan→MinHash subtree FOUR
    times (ReuseExchange never fires across the branches; measured
    23→17 stages on the bench probe). Pin the new shape: every
    batch-side access in the returned `rejected` plan reads the
    checkpointed rows (Scan ExistingRDD), never the batch source
    relation itself."""
    from end_to_end_etl_pipeline_spark.operators.dedup_store import (
        MinHashDedupStore,
    )
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    store = MinHashDedupStore(cat, "p.sigs", threshold=0.6)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "other words here")],
        "doc_id int, text string",
    )
    store.ingest(docs, "text")
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")], "doc_id int, text string"
    )
    accepted, rejected = store.probe(batch, "text")
    for df in (accepted, rejected):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BatchEvalPython" not in plan
    plan_r = rejected._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # batch MinHash computed once: branches read the checkpoint, and
    # the batch's own source relation never re-enters the plan (the
    # store parquet scan legitimately remains)
    assert "Scan ExistingRDD" in plan_r
    assert "LocalTableScan" not in plan_r, (
        "a batch-source scan re-entered the probe plan — the "
        "checkpoint dedup regressed"
    )
    analyzed = rejected._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed  # no forced store broadcast


def test_grouped_map_uses_arrow_not_row_udf(spark):
    """The applyInPandas escape hatch must plan as Arrow grouped-map
    (FlatMapGroupsInPandas), never the row-at-a-time Python UDF."""
    plan = _plan(spark, "event_type_value_trend")
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_scan_prunes_columns(spark):
    # a 2-column projection must not read the whole documents schema
    plan = _plan(spark, "dedup_exact_text")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}, cols


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    # a filter on the partition column must become PartitionFilters
    # (directory pruning — zero IO for excluded partitions), not a
    # post-scan Filter over all data
    from end_to_end_etl_pipeline_spark.queries.catalog import load
    from end_to_end_etl_pipeline_spark.sinks.writers import write_overwrite

    orders = load(spark, SF, "orders").withColumn("o_year", F.year("o_orderdate"))
    dest = str(tmp_path / "orders_by_year")
    write_overwrite(orders, dest, partition_by=["o_year"])
    got = spark.read.parquet(dest).filter("o_year = 1995")
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_year" in m.group(1), plan
    assert got.count() == load(spark, SF, "orders").filter("year(o_orderdate) = 1995").count()


def test_q19_shape_factors_single_side_conjuncts(spark):
    plan = _plan(spark, "discounted_brand_revenue")
    # Catalyst must factor the OR-of-ANDs: the brand IN-set and the
    # quantity-range hull push below the join to each side's scan
    assert re.search(r"PushedFilters: \[.*p_brand", plan), plan
    assert re.search(r"PushedFilters: \[.*l_quantity", plan), plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q21_shape_semi_anti_hash_on_orderkey(spark):
    plan = _plan(spark, "lone_returned_supplier")
    # the suppkey inequality must ride as a residual on a HASHED
    # orderkey join, never degrade to a nested-loop pair scan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"Join type: LeftSemi", plan)
    assert re.search(r"Join type: LeftAnti", plan)
    assert re.search(r"PushedFilters: \[.*EqualTo\(l_returnflag,R", plan)


def test_q13_left_join_keeps_priority_filter_in_join(spark):
    df = REGISTRY["customer_order_distribution"].spark(spark, SF)
    # customers with ONLY urgent orders must still appear with count 0
    zero = df.filter(F.col("order_cnt") == 0).count()
    assert zero > 0


def test_dynamic_partition_pruning_on_fact_dim_join(spark, tmp_path):
    # DPP: a selective dim-side filter must prune FACT partitions at
    # runtime (the filter's values aren't known at plan time). At
    # 100 TB this is the difference between scanning one nation's
    # partitions and scanning the whole fact table. The plan shows a
    # dynamicpruning subquery inside the scan's PartitionFilters.
    from end_to_end_etl_pipeline_spark.queries.catalog import load
    from end_to_end_etl_pipeline_spark.sinks.writers import write_overwrite

    cust = load(spark, SF, "customer")
    dest = str(tmp_path / "cust_by_nation")
    write_overwrite(cust, dest, partition_by=["c_nationkey"])
    fact = spark.read.parquet(dest)
    dim = (
        load(spark, SF, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    joined = fact.join(dim, fact.c_nationkey == dim.n_nationkey)
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruning" in plan.lower(), plan
    n3 = load(spark, SF, "customer").filter("c_nationkey = 3").count()
    assert joined.count() == n3


def test_q2_shape_broadcasts_dims_no_extra_lineitem_scan(spark):
    plan = _plan(spark, "min_cost_supplier")
    # supplier/nation/region/part all broadcast; lineitem scans once
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("file:") < 12  # scans stay bounded
    assert "CartesianProduct" not in plan


def test_q20_shape_single_lineitem_pass_semi_joins(spark):
    plan = _plan(spark, "excess_stock_suppliers")
    # the correlated availqty threshold must NOT become a second
    # lineitem aggregation - one groupBy with conditional sums:
    # exactly 4 scans (lineitem, part, supplier, nation)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 4
    assert "LeftSemi" in plan


def test_tfidf_single_corpus_explode(spark):
    plan = _plan(spark, "doc_tfidf_terms")
    # df-by-window formulation: exactly one Generate (explode) -
    # the duplicated-subtree regression this guards against had two
    assert len(re.findall(r"^\(\d+\) Generate", plan, re.M)) == 1
    assert "CartesianProduct" not in plan  # N joins via broadcast NLJ


def test_span_overlap_caps_before_pair_join(spark):
    plan = _plan(spark, "doc_span_overlap")
    # the df-cap semi join must run BEFORE the pair self-join
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_skew_profile_partial_aggregation(spark):
    plan = _plan(spark, "join_key_skew_profile")
    # group-size counting must map-side combine (partial_count)
    assert "partial_count" in plan


def _explain_str(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_jaccard_verify_broadcast_guard_switches_strategy(spark):
    """jaccard_on_pairs broadcasts the candidate set only under the
    size threshold; above it the verify legs must plan as non-broadcast
    joins (the dup-heavy-corpus OOM guard, asserted at plan level)."""
    from end_to_end_etl_pipeline_spark.operators.text_dedup import (
        char_shingles,
        jaccard_on_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "abcdefghij" * 3) for i in range(6)], "doc_id int, text string"
    )
    sets_ = char_shingles(docs, "doc_id", "text", n=6, distinct=True)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(a + 1, 6)], "id_a int, id_b int"
    )
    small = jaccard_on_pairs(pairs, sets_, "doc_id", n_pairs=15)
    big = jaccard_on_pairs(
        pairs, sets_, "doc_id", n_pairs=15, max_broadcast_pairs=10
    )
    assert "BroadcastHashJoin" in _explain_str(spark, small)
    # over-threshold: no explicit broadcast hint anywhere in the plan
    # (AQE may still pick broadcast at runtime from actual sizes —
    # that is the desired executor-side decision, not a driver OOM)
    assert "ResolvedHint" not in big._jdf.queryExecution().logical().toString()
    # results identical either way
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))


def test_gopher_filter_single_pass_no_shuffle(spark):
    """Every Gopher signal is a higher-order-function projection —
    the plan must contain no Exchange, no Join, no Generate
    (explode), and no Python eval."""
    plan = _plan(spark, "gopher_quality_filter")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_prune_single_cluster_shuffle_no_cartesian(spark):
    """SemDeDup pairing must go through a cluster-key equi-join —
    never a cartesian/broadcast-nested-loop over the corpus."""
    plan = _plan(spark, "semantic_pruned_corpus")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_probe_broadcasts_filter_never_shuffles_probe_keys(spark):
    """The Bloom filter side must enter the probe as a broadcast —
    the probing side joins it without a key shuffle (one exchange for
    the final per-key verdict agg is the only shuffle allowed)."""
    plan = _plan(spark, "bloom_seen_docs")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_build_is_partial_aggregated(spark):
    """The sketch build must partial-aggregate map-side (the exchange
    carries depth x width rows per task, not one row per occurrence),
    and the whole query must stay JVM-side."""
    from end_to_end_etl_pipeline_spark.operators.sketches import cms_build

    docs = REGISTRY["doc_word_counts"]  # any token source; use documents
    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    plan = cms_build(df, "word")._jdf.queryExecution().executedPlan().toString()
    # partial_sum below the exchange == map-side combine is in place
    assert "partial_sum" in plan, plan
    assert "BatchEvalPython" not in plan


def test_weighted_sample_plans_partial_topk(spark):
    """The Efraimidis-Spirakis draw must plan as TakeOrderedAndProject
    (per-partition partial top-k) — never a global Sort
    materialization."""
    plan = _plan(spark, "weighted_doc_sample")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_tier_queries_broadcast_scalar_bounds_only(spark):
    """curriculum_sample / corpus_funnel_audit join their percentile
    bounds as a broadcast of ONE row — the plan may contain that
    broadcast nested loop, but never a CartesianProduct, and the
    probing side must not shuffle into it."""
    for name in ("curriculum_sample", "corpus_funnel_audit"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_decontamination_uses_semi_joins_no_pair_blowup(spark):
    """The removal query must stay on semi/anti joins (drop-list
    shape) — no test x train pair materialization, no cartesian."""
    plan = _plan(spark, "decontaminated_train_split")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("LeftSemi") >= 2  # df-cap semi + dirty-gram semi
    assert "LeftAnti" in plan  # clean = train anti drop-list


def test_vocab_drift_psi_broadcasts_vocab_no_row_udfs(spark):
    """The drift profile's only corpus-scale work is the two token
    aggregations; the 200-word vocab must BROADCAST into the count
    join (a shuffled vocab join would re-shuffle the token stream),
    everything after is vocab-sized, and the whole plan stays
    JVM-side."""
    plan = _plan(spark, "vocab_drift_psi")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # map-side partial aggregation on the token stream
    assert "partial_count" in plan or "partial_sum" in plan


def test_wav_encode_is_projection_decode_arrow_only(spark):
    """The WAV path's scale claims: encoding a payload per order is a
    pure projection (no Exchange before the mapInPandas decode — at
    100 TB the cost is the scan), and Python touches bytes only
    through Arrow (ArrowEvalPython/mapInPandas), never a row UDF."""
    plan = _plan(spark, "wav_pcm_decode_stats")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    # scan -> encode -> decode is map-only; the only shuffle-free
    # contract is everything BEFORE the decode: no join anywhere
    assert "Join" not in plan
    assert "Exchange" not in plan, plan


def test_trained_classifier_inference_broadcasts_weights(spark):
    """quality_classifier_trained's INFERENCE plan: the 64-float
    weight table must broadcast into the token stream (never a
    shuffle side), and no Python row UDFs anywhere — training and
    scoring are pure JVM aggregation."""
    plan = _plan(spark, "quality_classifier_trained")
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_bmp_encode_is_projection_decode_arrow_only(spark):
    """Same contract as the WAV leg: JVM-side encode is a pure
    projection, Python touches bytes only through Arrow, no shuffle
    anywhere in encode->decode."""
    plan = _plan(spark, "bmp_image_decode_stats")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan, plan


def test_png_encode_is_projection_decode_arrow_only(spark):
    """Same contract as the WAV/BMP legs, now for the COMPRESSED
    codec: the zlib framing + adler32 + chunk CRCs all fold into the
    JVM projection (no Exchange, no join), and Python touches bytes
    only through Arrow-batched mapInPandas."""
    plan = _plan(spark, "png_image_decode_stats")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan, plan


def test_pairwise_ce_gradient_step_is_one_codegen_aggregate(spark):
    """The trained cross-encoder's claim: each gradient step is ONE
    whole-stage-codegen aggregate over the feature frame — no weight
    join (weights enter as literals), no Python in the scan (the
    features are array_intersect projections), exactly one shuffle
    (partial -> final agg)."""
    from end_to_end_etl_pipeline_spark.operators.retrieval import (
        CE_FEATURES,
        _ce_z,
        pairwise_ce_features,
    )

    pairs = spark.createDataFrame(
        [(1, "a b c", "a b"), (2, "x y", "x z")],
        "id long, q string, d string",
    )
    feats = pairwise_ce_features(pairs, "q", "d").withColumn(
        "y", F.lit(1.0)
    )
    w = [0.1, 0.2, 0.3, 0.4]
    err = F.lit(1.0) / (F.lit(1.0) + F.exp(-_ce_z(w))) - F.col("y")
    step = feats.agg(
        F.sum(err).alias("g0"),
        *[F.sum(err * F.col(c)).alias(f"g{j+1}")
          for j, c in enumerate(CE_FEATURES)],
    )
    plan = step._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan, "weights must enter as literals, not a join"
    # formatted mode names each node twice (tree + detail): one
    # physical Exchange == 2 mentions; partial->final agg only
    assert plan.count("Exchange") <= 2, plan
    assert "HashAggregate" in plan
