"""r13 probe A/B (VERDICT r12 #6): fold dedup_store_probe's repeated
subtrees into fewer jobs.

The current probe plan executes the BATCH subtree (documents scan →
repartition → shingle/MinHash → bands) FOUR times (store-leg probe
side, both est_nn sides, and the store-leg recompute feeding the
anti-join) and the store read twice — ReuseExchange never fires
across the branches. Variants:

  cur  — shipped probe (fully lazy).
  ckpt — sig_new eagerly localCheckpoint'ed (100 rows × K longs — one
         job computes the batch MinHash once; every branch reads the
         checkpointed rows), plus the store-leg rejected frame
         (collision survivors only, tiny) checkpointed before the
         anti-join/union fan-out.
  pers — same fan-out dedup via lazy .persist() (no extra job; racing
         branch tasks may double-fill the cache).

Decision identity is asserted before timing. Interleaved reps,
job/stage counts from the UI REST API.

Usage: python scripts/probe_ab_study.py [--reps 5]
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

import bench  # noqa: E402
from end_to_end_etl_pipeline_spark.operators.dedup_store import (  # noqa: E402
    MinHashDedupStore,
)
from end_to_end_etl_pipeline_spark.queries.catalog import load  # noqa: E402
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def probe_variant(store: MinHashDedupStore, docs, text_col: str, mode: str):
    """Rebuild probe's `rejected` under the given materialization
    mode, byte-faithful to MinHashDedupStore._decide's decision
    logic."""
    sig_new = store._signatures(docs, text_col)
    if mode == "ckpt":
        sig_new = sig_new.localCheckpoint(eager=True)
    elif mode == "pers":
        sig_new = sig_new.persist()
    bands_new = store._bands_with_sig(sig_new)

    sig_old = store.catalog.read(store.table)
    bands_old = store._bands_with_sig(sig_old)
    est = store._est_collisions(bands_new, bands_old)
    rejected_vs_store = (
        est.filter(F.col("est_jaccard") >= store.threshold)
        .groupBy("id_a")
        .agg(F.min("id_b").alias("dup_of"),
             F.max("est_jaccard").alias("est_jaccard"))
        .select(F.col("id_a").alias(store.id_col), "dup_of", "est_jaccard")
    )
    if mode == "ckpt":
        rejected_vs_store = rejected_vs_store.localCheckpoint(eager=True)
    elif mode == "pers":
        rejected_vs_store = rejected_vs_store.persist()

    est_nn = store._est_collisions(bands_new, bands_new).filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("est_jaccard") >= store.threshold)
    )
    store_rejected_ids = rejected_vs_store.select(
        F.col(store.id_col).alias("id_a")
    )
    est_nn = est_nn.join(store_rejected_ids, "id_a", "left_anti")
    rejected_in_batch = (
        est_nn.groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"),
             F.max("est_jaccard").alias("est_jaccard"))
        .select(F.col("id_b").alias(store.id_col), "dup_of", "est_jaccard")
    )
    return (
        rejected_vs_store.unionByName(rejected_in_batch)
        .groupBy(store.id_col)
        .agg(F.min_by(F.struct("dup_of", "est_jaccard"), "dup_of").alias("__m"))
        .select(store.id_col, "__m.dup_of", "__m.est_jaccard")
    )


def batch(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"),
                F.expr("substring(text, 8)").alias("text"))
        .repartition(8)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--modes", nargs="*", default=["cur", "ckpt", "pers"])
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = create_spark_session(app_name="probe_ab_study",
                                 extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    cat, probe, tmpdir = bench._build_dedup_store(spark, args.sf_dir)
    store = MinHashDedupStore(cat, "dedup.sigs", num_hashes=16, bands=4,
                              shingle_len=6, threshold=0.6)

    def mk(mode):
        if mode == "cur":
            _a, rej = store.probe(batch(spark, args.sf_dir), "text")
            return rej
        return probe_variant(store, batch(spark, args.sf_dir), "text", mode)

    try:
        ref = {tuple(r) for r in mk("cur").collect()}
        for m in args.modes:
            got = {tuple(r) for r in mk(m).collect()}
            assert got == ref, f"variant {m} diverged"
            spark.catalog.clearCache()
        print(json.dumps({"identity": "ok", "rows": len(ref)}), flush=True)

        for m in args.modes:  # JIT warm
            mk(m).write.mode("overwrite").format("noop").save()
            spark.catalog.clearCache()

        times = {m: [] for m in args.modes}
        counts = {}
        for rep in range(args.reps):
            for m in args.modes:
                before = {j["jobId"] for j in _api(spark, "/jobs")}
                spark.sparkContext.setJobDescription(f"{m} rep{rep}")
                t0 = time.perf_counter()
                mk(m).write.mode("overwrite").format("noop").save()
                times[m].append(time.perf_counter() - t0)
                js = [j for j in _api(spark, "/jobs")
                      if j["jobId"] not in before]
                counts[m] = {
                    "jobs": len(js),
                    "stages": sum(len(j["stageIds"]) for j in js),
                    "skipped": sum(j.get("numSkippedStages", 0) for j in js),
                }
                spark.catalog.clearCache()
        out = {
            m: {"min": round(min(s), 3),
                "med": round(statistics.median(s), 3), **counts[m]}
            for m, s in times.items()
        }
        print(json.dumps(out), flush=True)
    finally:
        import shutil
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main()
