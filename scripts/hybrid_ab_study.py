"""r13 interleaved A/B: hybrid_doc_retrieval corpus passes (VERDICT
r12 #2 — "cut one of the three corpus passes").

The r12 plan shows the documents⋈embeddings corpus subtree running
THREE times: the dense arm (scan 1+4), bm25's tf/explode pass (27+30)
and bm25's dl-stats pass (52+55 — the broadcast side of the stats
crossJoin materializes through its own job, so the whole tokenization
re-runs for two aggregate values). Variants measured here, all
value-identical by construction (same multiset of (doc, word) token
rows, same dl, same stats — downstream float math untouched):

  cur   — shipped bm25_scores (explode-all-tokens + LeftSemi filter;
          separate stats pass).
  filt  — filter words to query terms BEFORE the explode (the qterms
          set rides a broadcast crossJoin as one array literal); the
          Generate emits only matching tokens. Still a separate
          stats pass (3 corpus passes, but the big one is cheaper).
  base  — ONE tokenization pass: per-doc skinny frame (doc, dl,
          matched_words) persisted; stats aggregates the cached
          frame, tf explodes it (2 corpus passes; the parquet scan +
          split run once).
  hyb   — `base` + the hybrid query also persists the joined corpus
          so the dense arm and the bm25 base build read ONE parquet
          scan of documents/embeddings.

Each variant is interleaved round-robin within one session, REPS
reps, min + median reported, canary-bracketed (memory lesson: the
box hosts a second tenant; cross-run comparisons lie).

Usage: python scripts/hybrid_ab_study.py [--reps 5] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from end_to_end_etl_pipeline_spark.operators.retrieval import (  # noqa: E402
    bm25_scores,
    rrf_fuse,
)
from end_to_end_etl_pipeline_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
)
from end_to_end_etl_pipeline_spark.queries.catalog import load  # noqa: E402
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402


def bm25_scores_filt(docs_words, qterms, k1=1.2, b=0.75, max_df_frac=0.5,
                     one_pass=False):
    """Variant: query-term filter BEFORE the explode; optionally ONE
    tokenization pass (persisted skinny per-doc frame serves both the
    dl-stats aggregate and the tf explode)."""
    doc_col, words_col = "doc_id", "words"
    uniq = qterms.select("word").distinct()
    qw = uniq.agg(F.collect_set("word").alias("__qws"))
    base = docs_words.crossJoin(F.broadcast(qw)).select(
        doc_col,
        F.size(words_col).alias("dl"),
        F.filter(
            words_col, lambda w: F.array_contains(F.col("__qws"), w)
        ).alias("__matched"),
    )
    if one_pass:
        base = base.persist()
    stats = base.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    toks = base.select(
        doc_col, "dl", F.explode("__matched").alias("word")
    )
    tf = toks.groupBy(doc_col, "word").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(stats))
        .filter(F.col("df") <= F.lit(max_df_frac) * F.col("n"))
        .join(F.broadcast(qterms), "word")
        .withColumn(
            "w",
            F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * F.col("tf") * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("query_id", doc_col).agg(
        F.round(F.sum("w"), 6).alias("bm25")
    )


def build_hybrid(spark, sf_dir, mode: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings")
    corpus = (
        docs.join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
        )
        .select(
            "doc_id",
            F.concat(
                "text", F.lit(" zqh"), (F.col("doc_id") % 7).cast("string")
            ).alias("text"),
            "embedding",
        )
    )
    if mode == "hyb":
        corpus = corpus.persist()
    qvecs = emb.filter(F.col("vec_id").between(100, 104)).select(
        (F.col("vec_id") - 100).alias("query_id"), "embedding"
    )
    dense = cosine_topk(
        qvecs, corpus, "query_id", "doc_id", "embedding", k=20,
        exclude_self=False,
    ).select("query_id", F.col("match_id").alias("doc_id"), "cosine")
    words = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    d = corpus.select("doc_id", words.alias("words"))
    qterms = spark.createDataFrame(
        [(i, w) for i in range(5) for w in (f"zqh{i}", "batch", "scan")],
        "query_id bigint, word string",
    )
    if mode == "cur":
        lex = bm25_scores(d, qterms)
    elif mode == "filt":
        lex = bm25_scores_filt(d, qterms, one_pass=False)
    else:  # base / hyb
        lex = bm25_scores_filt(d, qterms, one_pass=True)
    return rrf_fuse(
        [(dense, "cosine"), (lex, "bm25")],
        query_col="query_id", id_col="doc_id", k=60, arm_topk=20, topk=10,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--modes", nargs="*",
                    default=["cur", "filt", "base", "hyb"])
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = create_spark_session(app_name="hybrid_ab_study")
    spark.sparkContext.setLogLevel("ERROR")

    # value-identity gate before timing anything
    ref = {
        tuple(r) for r in build_hybrid(spark, args.sf_dir, "cur").collect()
    }
    for m in args.modes:
        got = {
            tuple(r) for r in build_hybrid(spark, args.sf_dir, m).collect()
        }
        assert got == ref, f"variant {m} diverged"
        spark.catalog.clearCache()
    print(json.dumps({"identity": "ok", "rows": len(ref)}), flush=True)

    def canary():
        t0 = time.perf_counter()
        spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
        return time.perf_counter() - t0

    # untimed JIT warm pass per variant
    for m in args.modes:
        build_hybrid(spark, args.sf_dir, m).write.mode("overwrite").format(
            "noop").save()
        spark.catalog.clearCache()

    times: dict[str, list[float]] = {m: [] for m in args.modes}
    cans = []
    for rep in range(args.reps):
        for m in args.modes:
            cans.append(canary())
            spark.sparkContext.setJobDescription(f"{m} rep{rep}")
            t0 = time.perf_counter()
            build_hybrid(spark, args.sf_dir, m).write.mode(
                "overwrite").format("noop").save()
            times[m].append(time.perf_counter() - t0)
            # a leaked cache would hand later reps of the persisting
            # variants a warm cache — clear between every execution
            spark.catalog.clearCache()
    out = {
        m: {"min": round(min(s), 3), "med": round(statistics.median(s), 3),
            "all": [round(x, 3) for x in s]}
        for m, s in times.items()
    }
    out["canary"] = {"min": round(min(cans), 3), "max": round(max(cans), 3)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
