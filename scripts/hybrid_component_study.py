"""r13: where does hybrid_doc_retrieval's wall time go? Time each
sub-plan alone (noop sink) with job/stage counts from the UI REST API.

Usage: python scripts/hybrid_component_study.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from end_to_end_etl_pipeline_spark.operators.retrieval import (  # noqa: E402
    bm25_scores,
    rrf_fuse,
)
from end_to_end_etl_pipeline_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
)
from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY, load  # noqa: E402
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def counted(spark, mk, tag: str, reps: int) -> dict:
    mk().write.mode("overwrite").format("noop").save()  # JIT warm
    secs = []
    jobs = stages = skipped = 0
    for rep in range(reps):
        before = {j["jobId"] for j in _api(spark, "/jobs")}
        spark.sparkContext.setJobDescription(f"{tag} rep{rep}")
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        secs.append(time.perf_counter() - t0)
        js = [j for j in _api(spark, "/jobs") if j["jobId"] not in before]
        jobs = len(js)
        stages = sum(len(j["stageIds"]) for j in js)
        skipped = sum(j.get("numSkippedStages", 0) for j in js)
    return {"min": round(min(secs), 3),
            "med": round(statistics.median(secs), 3),
            "jobs": jobs, "stages": stages, "skipped": skipped}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf = args.sf_dir

    spark = create_spark_session(app_name="hybrid_components",
                             extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    def corpus():
        docs = load(spark, sf, "documents").select("doc_id", "text")
        emb = load(spark, sf, "embeddings")
        return (
            docs.join(emb.select(F.col("vec_id").alias("doc_id"),
                                 "embedding"), "doc_id")
            .select(
                "doc_id",
                F.concat("text", F.lit(" zqh"),
                         (F.col("doc_id") % 7).cast("string")).alias("text"),
                "embedding",
            )
        )

    def qterms():
        return spark.createDataFrame(
            [(i, w) for i in range(5) for w in (f"zqh{i}", "batch", "scan")],
            "query_id bigint, word string",
        )

    def dense():
        emb = load(spark, sf, "embeddings")
        qvecs = emb.filter(F.col("vec_id").between(100, 104)).select(
            (F.col("vec_id") - 100).alias("query_id"), "embedding")
        return cosine_topk(qvecs, corpus(), "query_id", "doc_id",
                           "embedding", k=20, exclude_self=False)

    def lex():
        words = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        d = corpus().select("doc_id", words.alias("words"))
        return bm25_scores(d, qterms())

    def stats_leg():
        words = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        d = corpus().select("doc_id", words.alias("words"))
        dl = d.select("doc_id", F.size("words").alias("dl"))
        return dl.agg(F.count(F.lit(1)).alias("n"),
                      F.avg("dl").alias("avgdl"))

    def toks_leg():
        words = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
        d = corpus().select("doc_id", words.alias("words"))
        toks = d.select("doc_id", F.size("words").alias("dl"),
                        F.explode("words").alias("word"))
        uniq = qterms().select("word").distinct()
        return (toks.join(F.broadcast(uniq), "word", "left_semi")
                .groupBy("doc_id", "word")
                .agg(F.count(F.lit(1)).alias("tf"),
                     F.first("dl").alias("dl")))

    def full():
        return REGISTRY["hybrid_doc_retrieval"].spark(spark, sf)

    out = {}
    for tag, mk in [("full", full), ("dense", dense), ("lex", lex),
                    ("stats_leg", stats_leg), ("toks_leg", toks_leg),
                    ("corpus_count", lambda: corpus().select("doc_id"))]:
        out[tag] = counted(spark, mk, tag, args.reps)
        print(tag, out[tag], flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
