"""Scale-hardening study: does each heavy operator's wall time grow
~linearly when the data grows 10x?

Builds a ~sf1 scratch lake from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) by unioning FACTOR key-shifted copies of the
FACT tables while keeping the dimensions fixed — exactly how a real
warehouse grows (facts accrete, dims don't):

* ``lineitem`` / ``orders`` / ``customer`` / ``events``: copy ``i``
  shifts the entity keys (orderkey/custkey/event_id/user_id) by
  ``i * KEY_STRIDE`` so referential integrity holds within each copy
  and copies never collide; part/supp keys are left alone so the
  fixed dims still join.
* ``documents``: copy ``i`` maps every letter through a seeded
  per-copy substitution cipher (``F.translate``) — length-preserving
  and word-boundary-preserving, so token statistics are unchanged,
  but CHAR-level shingles diverge across copies, making the corpus
  genuinely 10x rather than 10x-duplicated. (A first attempt salted
  every word with an ``_i`` suffix; that breaks word-gram operators'
  cross-copy overlap but NOT char-6 shingles — word interiors stay
  identical, cross-copy Jaccard lands ~0.5-0.7, and MinHash-LSH
  correctly floods the verify stage with factor²-growing candidate
  pairs. That measures the corpus's self-similarity, not the
  operator's scaling.) Within-copy planted variants are preserved,
  so dedup still finds ~10x the pairs it finds at sf0.1.
* ``embeddings``: copy ``i`` adds ``i * 1e-3`` to every component —
  distinct vectors that stay in the same label clusters.
* ``region nation supplier part``: copied as-is.

Then runs a representative heavy-query set (scans, multi-way joins,
sort percentiles, windows, text dedup, contamination, BM25, ANN
training) once at the base SF and once at the scaled SF in the same
session (each materialized through the noop sink) and prints one
JSON line per query: base_sec, scaled_sec, and the ratio. A healthy
ratio for a 10x scale-up on a fixed 32-core box is <= ~10 plus a
constant; a superlinear ratio flags a shuffle/skew problem the
bench's single SF can't see.

``--skew`` additionally builds a SKEWED variant of the scaled lake —
every copy ``i > 0`` of ``orders`` reroutes half its rows to one hot
``o_custkey`` (a copy-0 key, so the customer join still hits), i.e.
~45% of all orders land on a single join key — and re-times the
join/agg-heavy queries against it. The delta between skewed and
uniform wall time is the empirical cost of a hot key under the
engine's mitigations (AQE skew-join split + salted-join operators);
a blowup here is what an unmitigated 100-TB hot key looks like.

Usage: python scripts/scale_study.py [--factor 10] [--skew] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import string
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY, load
from end_to_end_etl_pipeline_spark.session import create_spark_session

KEY_STRIDE = 1_000_000_000

DIM_TABLES = ["region", "nation", "supplier", "part"]

#: fact table -> columns shifted by i * KEY_STRIDE in copy i
FACT_KEY_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
}

#: join/agg shapes re-timed against the skewed lake under --skew
SKEW_QUERIES = [
    "customer_master",
    "revenue_by_nation",
    "monthly_segment_growth",
    "idle_rich_customers",
]

HEAVY_QUERIES = [
    # TPC-H shapes: full-fact scans, multi-way joins, sort percentile
    "pricing_summary",
    "revenue_by_nation",
    "customer_master",
    "local_supplier_volume",
    "min_cost_supplier",
    "winsorized_price_stats",
    # event windows
    "user_sessions",
    "daily_event_anomaly",
    # text / dedup / retrieval
    "dedup_exact_text",
    "within_doc_line_dedup",
    "near_dup_pairs",
    "split_contamination",
    "clean_corpus",
    "doc_tfidf_terms",
    "bm25_doc_search",
    # ANN with in-query training
    "pq_topk",
    # r06: the retrieval stack (retrieve -> fuse -> diversify ->
    # rerank -> evaluate); candidates are arm-bounded, so these
    # should be near-FLAT at 10x — only the arm scans grow
    "hybrid_doc_retrieval",
    "mmr_diverse_rerank_grouped",
    "crossencoder_rerank_topk",
    "bm25_ndcg_eval",
]


def _derangement(alphabet: str, seed: int) -> list[str]:
    """Seeded permutation of ``alphabet`` with NO fixed points
    (reject-and-reshuffle), so every ciphered character really
    changes — cross-copy shingle distinctness holds by construction,
    not by luck of the shuffle."""
    rng = random.Random(seed)
    while True:
        perm = list(alphabet)
        rng.shuffle(perm)
        if all(p != a for p, a in zip(perm, alphabet)):
            return perm


def _copies_with(df, shifts, factor):
    """Union ``factor`` key-shifted copies of ``df`` (copy 0 = as-is)."""
    out = None
    for i in range(factor):
        c = df
        for col, make in shifts.items():
            c = c.withColumn(col, make(i))
        out = c if out is None else out.unionByName(c)
    return out


def build_scaled(spark, src_dir: str, out_dir: str, factor: int) -> None:
    for t in DIM_TABLES:
        load(spark, src_dir, t).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, keys in FACT_KEY_SHIFTS.items():
        df = load(spark, src_dir, t)
        shifts = {
            k: (lambda i, k=k: F.col(k) + F.lit(i * KEY_STRIDE))
            for k in keys
        }
        scaled = _copies_with(df, shifts, factor)
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")

    docs = load(spark, src_dir, "documents")
    scaled_docs = None
    # letters AND digits, deranged (no fixed points): a plain seeded
    # shuffle can map characters to themselves and leaves digits /
    # punctuation untouched, so a >=6-char shingle of non-letters
    # could collide across copies — distinctness would be corpus-
    # dependent instead of guaranteed by construction
    alphabet = string.ascii_lowercase + string.ascii_uppercase + string.digits
    for i in range(factor):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_STRIDE))
        if i > 0:  # per-copy cipher: no cross-copy shingle overlap
            perm = _derangement(alphabet, seed=i)
            c = c.withColumn(
                "text", F.translate("text", alphabet, "".join(perm))
            )
        scaled_docs = c if scaled_docs is None else scaled_docs.unionByName(c)
    scaled_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load(spark, src_dir, "embeddings")
    scaled_emb = None
    for i in range(factor):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * KEY_STRIDE))
        if i > 0:
            c = c.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i=i: (x + F.lit(i * 1e-3)).cast("float"),
                ),
            )
        scaled_emb = c if scaled_emb is None else scaled_emb.unionByName(c)
    scaled_emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def build_skewed(spark, src_dir, uniform_dir, skew_dir, factor) -> None:
    """Same lake as ``build_scaled`` except ``orders``: copies i > 0
    send half their rows to one hot copy-0 custkey (see module doc).
    Every other table is reused from the uniform build."""
    os.makedirs(skew_dir, exist_ok=True)
    for t in DIM_TABLES + [
        "lineitem", "customer", "events", "documents", "embeddings",
    ]:
        shutil.copytree(
            f"{uniform_dir}/{t}.parquet", f"{skew_dir}/{t}.parquet"
        )
    orders = load(spark, src_dir, "orders")
    hot = orders.agg(F.min("o_custkey")).first()[0]
    out = None
    for i in range(factor):
        c = orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * KEY_STRIDE)
        )
        if i > 0:
            c = c.withColumn(
                "o_custkey",
                F.when(F.col("o_orderkey") % 2 == 0, F.lit(hot)).otherwise(
                    F.col("o_custkey") + F.lit(i * KEY_STRIDE)
                ),
            )
        out = c if out is None else out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{skew_dir}/orders.parquet")


def time_query(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].spark
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def time_delete_path(spark, sf_dir: str, n_appends: int = 8) -> dict:
    """The CRUD number the bench can't see: how much of the table does
    a targeted delete actually touch at scale?  Lands the lake's
    ``orders`` in a scratch ManifestCatalog as ``n_appends``
    date-interleaved bloom-indexed appends (every dir's orderkey RANGE
    spans the whole table, so only blooms can prune), deletes 5 keys,
    and reports wall time plus the dir-level prune rate — rewritten
    dirs vs total.  At 10x the per-dir bloom holds 10x the keys, so
    this is also the false-positive-rate-at-scale probe: a saturated
    bloom degrades prune_rate toward 0 (correct but slow), it never
    skips wrongly."""
    from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

    root = tempfile.mkdtemp(prefix="scale_delete_")
    try:
        cat = ManifestCatalog(spark, f"file://{root}")
        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderdate"
        )
        for m in range(n_appends):
            cat.append(
                orders.filter(F.month("o_orderdate") % n_appends == m).drop(
                    "o_orderdate"
                ),
                "d.orders",
                bloom_cols=["o_orderkey"],
            )
        keys = [
            r[0]
            for r in orders.select("o_orderkey")
            .orderBy("o_orderkey")
            .limit(5)
            .collect()
        ]
        before = set(cat.latest_manifest("d.orders")["dirs"])
        t0 = time.perf_counter()
        deleted = cat.delete_where("d.orders", "o_orderkey", keys)
        wall = round(time.perf_counter() - t0, 3)
        after = set(cat.latest_manifest("d.orders")["dirs"])
        # dirs TOUCHED = dirs the delete replaced (dropped from the
        # manifest); the rewrite may consolidate them into fewer
        # output dirs, so counting new dirs would under-report reads
        touched = len(before - after)
        return {
            "wall_sec": wall,
            "rows_deleted": deleted,
            "dirs_total": len(before),
            "dirs_rewritten": touched,
            "prune_rate": round(1.0 - touched / len(before), 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--keep", action="store_true", help="keep the scaled scratch dir"
    )
    ap.add_argument(
        "--skew",
        action="store_true",
        help="also time the join shapes against a hot-key skewed lake",
    )
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument(
        "--delete-path",
        action="store_true",
        help="also time a bloom-pruned targeted delete at both scales",
    )
    args = ap.parse_args()

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = create_spark_session(app_name="scale_study")
    out = tempfile.mkdtemp(prefix="scale_study_")
    names = args.queries or HEAVY_QUERIES
    try:
        t0 = time.perf_counter()
        build_scaled(spark, src, out, args.factor)
        print(
            f"built {args.factor}x scratch at {out} "
            f"in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        results = {}
        for name in names:
            time_query(spark, name, src)  # untimed: JIT/codegen warm-up
            base = time_query(spark, name, src)
            scaled = time_query(spark, name, out)
            ratio = round(scaled / base, 2) if base > 0 else None
            results[name] = {
                "base_sec": base,
                "scaled_sec": scaled,
                "ratio": ratio,
            }
            print(json.dumps({"query": name, **results[name]}))
        delete_results = {}
        if args.delete_path:
            time_delete_path(spark, src, n_appends=2)  # untimed warm-up
            delete_results["base"] = time_delete_path(spark, src)
            delete_results["scaled"] = time_delete_path(spark, out)
            for tag, r in delete_results.items():
                print(json.dumps({"delete_path": tag, **r}))
        skew_results = {}
        if args.skew:
            skew_dir = out + "_skew"
            t0 = time.perf_counter()
            build_skewed(spark, src, out, skew_dir, args.factor)
            print(
                f"built skewed orders at {skew_dir} "
                f"in {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
            try:
                for name in SKEW_QUERIES:
                    time_query(spark, name, out)  # untimed warm-up
                    uniform = time_query(spark, name, out)
                    skewed = time_query(spark, name, skew_dir)
                    ratio = (
                        round(skewed / uniform, 2) if uniform > 0 else None
                    )
                    skew_results[name] = {
                        "uniform_sec": uniform,
                        "skewed_sec": skewed,
                        "ratio": ratio,
                    }
                    print(json.dumps({"query": name, **skew_results[name]}))
            finally:
                if not args.keep:
                    shutil.rmtree(skew_dir, ignore_errors=True)
        print(
            json.dumps(
                {
                    "metric": "scale_study",
                    "factor": args.factor,
                    "base_sf_dir": src,
                    "queries": {
                        n: r["ratio"] for n, r in results.items()
                    },
                    "skew_ratio": {
                        n: r["ratio"] for n, r in skew_results.items()
                    },
                    "delete_path": delete_results or None,
                }
            )
        )
    finally:
        if args.keep:
            print(f"kept scratch at {out}", file=sys.stderr)
        else:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
