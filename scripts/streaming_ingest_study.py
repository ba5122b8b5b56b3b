"""Streaming ingest-bridge study under state growth (VERDICT r08 #5).

The five driver-gated streaming rows prove SEMANTICS; this study
measures the foreachBatch index-ingest bridges as their persisted
stores GROW — the streaming analog of the manifest-dirs curve. The
claim under test is "per-ingest cost is O(batch + collisions), not
O(store)": each bridge runs ~N_BATCHES real micro-batches (a genuine
``writeStream.foreachBatch`` file stream, one file per trigger,
per-batch wall from StreamingQueryProgress.durationMs.triggerExecution)
against a store pre-seeded at the given lake's scale, and the output
is the per-batch duration curve plus the store's final size. Flat
(or explained-by-compaction-spikes) curves = the claim holds; a
rising trend = per-ingest cost scales with accumulated state and the
bridge would stall a 100-TB stream.

Bridges measured (each with auto-compaction on, so the curve includes
the maybe_optimize spikes a real deployment pays):

* ANN  — ``foreach_batch_ann_ingest``: PQ-encode + cell-route + CAS
  append into the IVFADC store (seeded from the lake's embeddings).
* dedup — ``foreach_batch_dedup_ingest``: MinHash + probe against
  EVERY prior signature + append survivors (seeded from documents).
* lexical — ``foreach_batch_text_index_ingest``: postings into term
  hash buckets + exact corpus-stats merge (seeded from documents).

Usage:
  python scripts/streaming_ingest_study.py --lake DIR [--batches 50]
      [--bridges ann dedup lexical]
``--lake`` is typically the kept scale_parity_study / scale_study
lake (~sf1); defaults to $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.queries.catalog import load
from end_to_end_etl_pipeline_spark.session import create_spark_session
from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

KEY_SHIFT = 50_000_000_000  # streamed rows' ids never collide with seeds


def _write_batch_files(df, batch_col: str, out_dir: str, n_batches: int):
    """One parquet FILE per micro-batch (subdir per batch id keeps
    mtime ordering irrelevant — no event-time here) and return the
    glob dir the file stream reads."""
    for b in range(n_batches):
        (
            df.filter(F.col(batch_col) == b)
            .drop(batch_col)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/b={b:03d}")
        )
    return out_dir


def _run_stream(spark, bridge_fn, src_dir: str, schema: str, ck_dir: str):
    """Drive the bridge over a file stream, one FILE per trigger, and
    return [(batch_id, trigger_ms, rows)] from the query's progress
    events (the engine's own per-trigger wall clock)."""
    files = sorted(
        f"{src_dir}/{d}/{f}"
        for d in os.listdir(src_dir)
        if d.startswith("b=")
        for f in os.listdir(f"{src_dir}/{d}")
        if f.endswith(".parquet")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/*")
    )
    q = bridge_fn(stream, ck_dir)
    q.awaitTermination()
    prog = [
        p if isinstance(p, dict) else json.loads(str(p))
        for p in q.recentProgress
    ]
    return [
        (
            p["batchId"],
            p["durationMs"].get("triggerExecution"),
            p["sources"][0]["numInputRows"] if p.get("sources") else 0,
        )
        for p in prog
        if p.get("sources") and p["sources"][0]["numInputRows"]
    ], len(files)


def _curve_stats(curve):
    ms = [m for _, m, _ in curve if m is not None]
    if not ms:
        return {}
    half = len(ms) // 2
    first, second = ms[:half], ms[half:]
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    return {
        "batches": len(ms),
        "median_ms": med(ms),
        "first_half_median_ms": med(first) if first else None,
        "second_half_median_ms": med(second) if second else None,
        "max_ms": max(ms),
        "growth_ratio": round(med(second) / med(first), 2)
        if first and second
        else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lake", default=None)
    ap.add_argument("--batches", type=int, default=50)
    ap.add_argument(
        "--bridges", nargs="*", default=["ann", "dedup", "lexical"]
    )
    args = ap.parse_args()
    lake = args.lake or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n = args.batches

    spark = create_spark_session(app_name="streaming_ingest_study")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_ingest_study_")
    cat = ManifestCatalog(spark, f"file://{work}/lake")
    try:
        if "ann" in args.bridges:
            from end_to_end_etl_pipeline_spark.operators.ivf_store import (
                write_ivfpq_store,
            )
            from end_to_end_etl_pipeline_spark.operators.pq import pq_train
            from end_to_end_etl_pipeline_spark.queries.vectors import (
                _PQ_K,
                _PQ_M,
            )
            from end_to_end_etl_pipeline_spark.streaming.jobs import (
                foreach_batch_ann_ingest,
            )

            emb = load(spark, lake, "embeddings")
            n_seed = emb.count()
            dim = len(emb.first()["embedding"])
            t0 = time.perf_counter()
            cb = pq_train(
                emb, "vec_id", "embedding",
                num_subspaces=_PQ_M, num_centroids=_PQ_K, iters=1,
            )
            write_ivfpq_store(
                cat, emb, "vec_id", "embedding", "label", cb,
                "ann.emb", dim=dim,
            )
            seed_sec = round(time.perf_counter() - t0, 1)
            # streamed batches: perturbed copies with fresh ids, no
            # cell column -> the bridge exercises nearest-centroid
            # routing per batch
            batches = (
                emb.withColumn("b", F.pmod(F.col("vec_id"), F.lit(97)))
                .filter(F.col("b") < n)
                .select(
                    (F.col("vec_id") + KEY_SHIFT).alias("vec_id"),
                    F.transform(
                        "embedding", lambda x: (x * 1.001).cast("float")
                    ).alias("embedding"),
                    F.col("b"),
                )
            )
            src = _write_batch_files(
                batches, "b", f"{work}/ann_in", n
            )
            curve, n_files = _run_stream(
                spark,
                lambda s, ck: foreach_batch_ann_ingest(
                    s, cat, "ann.emb", ck, auto_compact_max_dirs=16
                ),
                src,
                "vec_id long, embedding array<float>",
                f"{work}/ck_ann",
            )
            m = cat.latest_manifest("ann.emb")
            store_rows = sum(int(v) for v in m["cell_counts"].values())
            print(
                json.dumps(
                    {
                        "bridge": "ann",
                        "seed_rows": n_seed,
                        "seed_sec": seed_sec,
                        "final_store_rows": store_rows,
                        "files": n_files,
                        **_curve_stats(curve),
                        "curve_ms": [m_ for _, m_, _ in curve],
                    }
                ),
                flush=True,
            )

        if "dedup" in args.bridges:
            from end_to_end_etl_pipeline_spark.operators.dedup_store import (
                MinHashDedupStore,
            )
            from end_to_end_etl_pipeline_spark.streaming.jobs import (
                foreach_batch_dedup_ingest,
            )

            docs = load(spark, lake, "documents").select("doc_id", "text")
            n_seed = docs.count()
            t0 = time.perf_counter()
            MinHashDedupStore(cat, "dedup.sigs").ingest(docs, "text")
            seed_sec = round(time.perf_counter() - t0, 1)
            # half genuinely new (suffix-salted words shift every
            # shingle), half near-dups of seeds the probe must reject
            batches = (
                docs.withColumn("b", F.pmod(F.col("doc_id"), F.lit(211)))
                .filter(F.col("b") < n)
                .select(
                    (F.col("doc_id") + KEY_SHIFT).alias("doc_id"),
                    F.when(
                        F.col("doc_id") % 2 == 0,
                        F.concat(F.lit("zq"), F.reverse("text")),
                    )
                    .otherwise(F.expr("substring(text, 5)"))
                    .alias("text"),
                    F.col("b"),
                )
            )
            src = _write_batch_files(batches, "b", f"{work}/dd_in", n)
            curve, n_files = _run_stream(
                spark,
                lambda s, ck: foreach_batch_dedup_ingest(
                    s, cat, "dedup.sigs", "text", ck,
                    auto_compact_max_dirs=16,
                ),
                src,
                "doc_id long, text string",
                f"{work}/ck_dd",
            )
            store_rows = cat.read("dedup.sigs").count()
            print(
                json.dumps(
                    {
                        "bridge": "dedup",
                        "seed_rows": n_seed,
                        "seed_sec": seed_sec,
                        "final_store_rows": store_rows,
                        "files": n_files,
                        **_curve_stats(curve),
                        "curve_ms": [m_ for _, m_, _ in curve],
                    }
                ),
                flush=True,
            )

        if "lexical" in args.bridges:
            from end_to_end_etl_pipeline_spark.operators.text_index import (
                write_text_index,
            )
            from end_to_end_etl_pipeline_spark.streaming.jobs import (
                foreach_batch_text_index_ingest,
            )

            docs = load(spark, lake, "documents").select("doc_id", "text")
            n_seed = docs.count()
            t0 = time.perf_counter()
            write_text_index(cat, docs, "doc_id", "text", "lex.idx")
            seed_sec = round(time.perf_counter() - t0, 1)
            batches = (
                docs.withColumn("b", F.pmod(F.col("doc_id"), F.lit(211)))
                .filter(F.col("b") < n)
                .select(
                    (F.col("doc_id") + KEY_SHIFT).alias("doc_id"),
                    "text",
                    F.col("b"),
                )
            )
            src = _write_batch_files(batches, "b", f"{work}/lx_in", n)
            curve, n_files = _run_stream(
                spark,
                lambda s, ck: foreach_batch_text_index_ingest(
                    s, cat, "lex.idx", ck, auto_compact_max_dirs=16
                ),
                src,
                "doc_id long, text string",
                f"{work}/ck_lx",
            )
            store_rows = cat.read("lex.idx").count()
            print(
                json.dumps(
                    {
                        "bridge": "lexical",
                        "seed_rows": n_seed,
                        "seed_sec": seed_sec,
                        "final_store_rows": store_rows,
                        "files": n_files,
                        **_curve_stats(curve),
                        "curve_ms": [m_ for _, m_, _ in curve],
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
