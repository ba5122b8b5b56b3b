"""Rebalance→probe loop study (VERDICT r06 "Next round" #3).

``maybe_rebalance`` is pass-capped, but its EFFECT on probe cost
under a concentrated append stream had no number. This study:

1. builds an IVFADC store over the sf embeddings (same params as the
   bench store),
2. appends a 10x stream CONCENTRATED on one hot cell (perturbed
   copies of that cell's own vectors — exactly the "popular topic"
   append pattern that degrades probed-cell pruning),
3. measures the adaptive probe (min_candidates) before: probed cells,
   probed BYTES (the dirs a query actually reads), wall time,
4. runs maybe_rebalance and measures REWRITE bytes vs the
   change-proportional bound (the hot cells' bytes — cold dirs must
   carry forward untouched),
5. re-measures the probe after, and against a BALANCED control store
   built from scratch over the same union (what "no concentration
   ever happened" costs).

Prints one JSON line per phase. Run:
    python scripts/ivf_rebalance_study.py [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from end_to_end_etl_pipeline_spark.operators.ivf_store import (  # noqa: E402
    append_ivfpq_store,
    ivfpq_store_topk,
    maybe_rebalance,
    write_ivfpq_store,
)
from end_to_end_etl_pipeline_spark.operators.pq import pq_train  # noqa: E402
from end_to_end_etl_pipeline_spark.queries.catalog import load  # noqa: E402
from end_to_end_etl_pipeline_spark.queries.vectors import _PQ_K, _PQ_M  # noqa: E402
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402
from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog  # noqa: E402


def _dir_bytes(cat: ManifestCatalog, dirs) -> int:
    total = 0
    for d in dirs:
        for p in cat.fs.listdir(d):
            try:
                st = cat.fs.fs.getFileStatus(cat.fs.path(p))
                if st.isFile():
                    total += int(st.getLen())
            except Exception:
                pass
    return total


def _recall_at_k(cat, table, query_frames, k=10, nprobe=2):
    """Mean recall@k of the FIXED-nprobe probe vs an exact
    brute-force top-k over the whole store — the approximation half
    of the rebalance claim (full-probe parity is exact by
    construction; what concentration and splitting move is how much
    a FIXED probe budget sees)."""
    allrows = cat.read(table)
    m = cat.latest_manifest(table)
    id_col, vec_col = m["ivf_id_col"], m["ivf_vec_col"]

    def _exact_l2_topk(q):
        qv = [float(x) for x in q.first()[vec_col]]
        lit = "array(%s)" % ",".join(f"{x!r}d" for x in qv)
        d = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"), F.expr(lit),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        rows = (
            allrows.select(F.col(id_col).alias("mid"), d.alias("l2"))
            .orderBy(F.col("l2").asc(), F.col("mid").asc())
            .limit(k).collect()
        )
        return {r["mid"] for r in rows}

    recalls = []
    for q in query_frames:
        truth = _exact_l2_topk(q)
        got, _ = ivfpq_store_topk(
            cat, table, q, "vec_id", "embedding",
            k=k, nprobe=nprobe, shortlist_factor=10, exclude_self=False,
        )
        hits = {r["match_id"] for r in got.collect()}
        recalls.append(len(hits & truth) / max(len(truth), 1))
    return round(sum(recalls) / len(recalls), 3)


def _probe(cat, table, query_frames, min_candidates):
    """Average PER-QUERY adaptive-probe cost over single-vector
    probes — a unioned multi-query probe set would hide the win (10
    queries' cells union to most of the store either way; what
    concentration inflates is what ONE query must read)."""
    m = cat.latest_manifest(table)
    bdirs = {int(k): v for k, v in m["bucket_dirs"].items()}
    counts = {int(k): int(v) for k, v in m["cell_counts"].items()}
    walls, bytes_, rows_, cells_ = [], [], [], []
    for q in query_frames:
        t0 = time.time()
        res, probed = ivfpq_store_topk(
            cat, table, q, "vec_id", "embedding",
            k=5, shortlist_factor=5, min_candidates=min_candidates,
            exclude_self=False,
        )
        res.count()
        walls.append(time.time() - t0)
        pc = set(probed)
        cells_.append(len(pc))
        bytes_.append(_dir_bytes(cat, [d for c in pc for d in bdirs.get(c, [])]))
        rows_.append(sum(counts.get(c, 0) for c in pc))
    n = len(query_frames)
    return {
        "per_query_wall_sec": round(sum(walls) / n, 2),
        "per_query_probed_cells": round(sum(cells_) / n, 1),
        "per_query_probed_bytes": int(sum(bytes_) / n),
        "per_query_probed_rows": int(sum(rows_) / n),
        "max_cell_rows": max(counts.values()),
        "n_cells": len(counts),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    spark = create_spark_session()
    spark.sparkContext.setLogLevel("ERROR")
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = tempfile.mkdtemp(prefix="ivf_rebalance_study_")
    try:
        cat = ManifestCatalog(spark, f"file://{root}/lake")
        emb = load(spark, sf_dir, "embeddings")
        dim = len(emb.first()["embedding"])
        n0 = emb.count()
        cb = pq_train(emb, "vec_id", "embedding",
                      num_subspaces=_PQ_M, num_centroids=_PQ_K, iters=1)
        write_ivfpq_store(cat, emb, "vec_id", "embedding", "label", cb,
                          "ann.emb", dim=dim)
        m0 = cat.latest_manifest("ann.emb")
        counts0 = {int(k): int(v) for k, v in m0["cell_counts"].items()}
        hot = max(counts0, key=counts0.get)
        # the query set: vectors FROM the hot cell's blob — the probe
        # that pays for concentration; three single-vector frames so
        # the measurement is per-query
        qpool = emb.join(
            cat.read("ann.emb", buckets=[hot]).select("vec_id"), "vec_id"
        ).limit(3).localCheckpoint(eager=True)
        qids = [r["vec_id"] for r in qpool.select("vec_id").collect()]
        queries = [
            qpool.filter(F.col("vec_id") == i).localCheckpoint(eager=True)
            for i in qids
        ]
        min_cand = max(200, (n0 * args.factor) // 20)

        print(json.dumps({"phase": "base", **_probe(cat, "ann.emb", queries, min_cand),
                          "recall_at_10_nprobe2": _recall_at_k(cat, "ann.emb", queries)}), flush=True)

        # 10x concentrated stream: perturbed copies of the hot cell's
        # vectors (a popular topic keeps routing to the same cell),
        # appended in 5 batches — one crossJoin per batch, not a
        # copy-count-deep union
        hot_rows = cat.read("ann.emb", buckets=[hot]).select(
            "vec_id", "embedding"
        ).localCheckpoint(eager=True)
        n_copies = max(1, args.factor * n0 // max(counts0[hot], 1))
        for b in range(5):
            lo, hi = b * n_copies // 5, (b + 1) * n_copies // 5
            if hi <= lo:
                continue
            copies = spark.range(lo, hi).select(
                (F.col("id") + 1).alias("copy")
            )
            batch = hot_rows.crossJoin(copies).select(
                (F.col("vec_id") + F.col("copy") * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x + F.col("copy") * F.lit(0.0005),
                ).cast("array<float>").alias("embedding"),
            )
            append_ivfpq_store(cat, batch, "ann.emb")
        m1 = cat.latest_manifest("ann.emb")
        print(json.dumps({"phase": "after_append",
                          **_probe(cat, "ann.emb", queries, min_cand),
                          "recall_at_10_nprobe2": _recall_at_k(cat, "ann.emb", queries)}), flush=True)

        # rebalance: split until no cell exceeds ~2x the original max
        pre_dirs = {d for ds in m1["bucket_dirs"].values() for d in ds}
        hot_cells_bytes = _dir_bytes(
            cat,
            [d for c, v in m1["cell_counts"].items()
             if int(v) > 2 * max(counts0.values())
             for d in m1["bucket_dirs"][c]],
        )
        t0 = time.time()
        splits = maybe_rebalance(cat, "ann.emb",
                                 max_cell_rows=2 * max(counts0.values()),
                                 max_passes=8)
        reb_sec = time.time() - t0
        m2 = cat.latest_manifest("ann.emb")
        post_dirs = {d for ds in m2["bucket_dirs"].values() for d in ds}
        rewritten = post_dirs - pre_dirs
        untouched = len(post_dirs & pre_dirs)
        print(json.dumps({
            "phase": "rebalance", "splits": len(splits),
            "rebalance_sec": round(reb_sec, 2),
            "rewrite_bytes": _dir_bytes(cat, rewritten),
            "hot_cells_bytes_bound": hot_cells_bytes,
            "untouched_dirs": untouched,
        }), flush=True)

        print(json.dumps({"phase": "after_rebalance",
                          **_probe(cat, "ann.emb", queries, min_cand),
                          "recall_at_10_nprobe2": _recall_at_k(cat, "ann.emb", queries)}), flush=True)

        # balanced control: retrain cells over the union via k-means-
        # free route — reuse stored rows, assign by fresh 2-level...
        # simplest honest control: write a store whose cells are the
        # REBALANCED assignment from scratch (same rows, same cell
        # count), probing it costs what a never-concentrated layout
        # costs. The after_rebalance row vs this row is the residual.
        allrows = cat.read("ann.emb").select("vec_id", "embedding", "cell")
        cat2 = ManifestCatalog(spark, f"file://{root}/lake2")
        write_ivfpq_store(cat2, allrows, "vec_id", "embedding", "cell",
                          cb, "ann.emb", dim=dim)
        print(json.dumps({"phase": "balanced_control",
                          **_probe(cat2, "ann.emb", queries, min_cand),
                          "recall_at_10_nprobe2": _recall_at_k(cat2, "ann.emb", queries)}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
