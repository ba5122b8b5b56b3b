"""Bucketed dedup-store crossover study (VERDICT r06 "Next round" #4).

bench.py runs the dedup store in PLAIN mode on the single-SF
assertion that a one-scan columnar read of 5k signature rows beats
band-bucket dir fan-out. A single point is not a curve: this study
measures probe wall time plain vs ``band_buckets=16`` at 1x/10x/30x
corpus (per-copy ciphered documents, the scale_study recipe, so
copies are genuinely distinct under char-6 shingles) and records the
crossover.

What grows where: the plain probe scans the WHOLE signature table
per batch (O(store)); the bucketed probe collects the batch's
touched buckets (one tiny job) and reads only those dirs
(O(store x touched/16) bytes + per-dir listing overhead). Small
stores are listing-dominated → plain wins; big stores are
bytes-dominated → buckets win.

Prints one JSON line per (mode, factor). Run:
    python scripts/dedup_crossover_study.py [--factors 1 10 30]
"""

from __future__ import annotations

import argparse
import json
import shutil
import string
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scripts.scale_study import _derangement  # noqa: E402

from end_to_end_etl_pipeline_spark.operators.dedup_store import (  # noqa: E402
    MinHashDedupStore,
)
from end_to_end_etl_pipeline_spark.queries.catalog import load  # noqa: E402
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402
from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog  # noqa: E402

ALPHABET = string.ascii_lowercase + string.ascii_uppercase + string.digits


def _scaled_docs(spark, sf_dir: str, factor: int):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = None
    for i in range(factor):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i > 0:
            perm = _derangement(ALPHABET, seed=i)
            c = c.withColumn("text", F.translate("text", ALPHABET, "".join(perm)))
        out = c if out is None else out.unionByName(c)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", type=int, nargs="*", default=[1, 10, 30])
    ap.add_argument("--warm", type=int, default=3)
    args = ap.parse_args()

    spark = create_spark_session()
    spark.sparkContext.setLogLevel("ERROR")
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = tempfile.mkdtemp(prefix="dedup_crossover_")
    try:
        for factor in args.factors:
            corpus = _scaled_docs(spark, sf_dir, factor).repartition(
                spark.sparkContext.defaultParallelism
            ).localCheckpoint(eager=True)
            # the probe batch mirrors bench: corpus/50 of the BASE
            # copy, perturbed near-dups the store must catch
            batch = (
                load(spark, sf_dir, "documents")
                .filter(F.col("doc_id") % 50 == 0)
                .select(
                    (F.col("doc_id") + 900_000_000).alias("doc_id"),
                    F.expr("substring(text, 8)").alias("text"),
                )
                .repartition(8)
                .localCheckpoint(eager=True)
            )
            for mode, buckets in (("plain", None), ("bucketed", 16)):
                cat = ManifestCatalog(
                    spark, f"file://{root}/{mode}_{factor}/lake"
                )
                store = MinHashDedupStore(
                    cat, "dedup.sigs", num_hashes=16, bands=4,
                    shingle_len=6, threshold=0.6, band_buckets=buckets,
                )
                t0 = time.time()
                store.ingest(corpus, "text")
                ingest_sec = time.time() - t0
                n_sigs = cat.read("dedup.sigs").count()
                samples = []
                n_rej = None
                for _ in range(args.warm):
                    t0 = time.time()
                    _acc, rejected = store.probe(batch, "text")
                    n_rej = rejected.count()
                    samples.append(time.time() - t0)
                print(json.dumps({
                    "mode": mode, "factor": factor,
                    "store_sigs": n_sigs,
                    "bulk_ingest_sec": round(ingest_sec, 2),
                    "probe_warm_min_sec": round(min(samples), 3),
                    "probe_samples": [round(s, 3) for s in samples],
                    "rejected": n_rej,
                }), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
