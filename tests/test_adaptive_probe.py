"""ivf_probe_adaptive contract: per-query candidate-count floor,
crossing-cell inclusion, and equivalence to brute force when the
floor spans the corpus.  The oracle-gated query
(cosine_topk_ivf_adaptive) proves value parity; these pin the
operator-level selection rule on frames where the cells are skewed
by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    ivf_probe_adaptive,
)


def _skewed_corpus(spark):
    # cell 0: 8 vectors, cell 1: 3, cell 2: 1 — deliberately uneven
    rows = []
    vid = 0
    for lbl, n in [(0, 8), (1, 3), (2, 1)]:
        for i in range(n):
            rows.append((vid, [1.0 + lbl, float(i % 3), 1.0], lbl))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )


def test_adaptive_probe_meets_candidate_floor(spark):
    corpus = _skewed_corpus(spark)
    queries = corpus.filter("vec_id in (0, 8, 11)")
    counts = {r["label"]: r["n"] for r in
              corpus.groupBy("label").agg(F.count("*").alias("n")).collect()}
    prev_cells: dict = {}
    for floor in (1, 4, 9, 12):
        probed = ivf_probe_adaptive(
            queries, corpus, "vec_id", "embedding", "label",
            min_candidates=floor,
        ).collect()
        per_q: dict = {}
        for r in probed:
            per_q.setdefault(r["query_id"], set()).add(r["label"])
        for qid, cells in per_q.items():
            got = sum(counts[c] for c in cells)
            # floor met (or the whole corpus probed)
            assert got >= min(floor, sum(counts.values())), (qid, floor)
            # monotone: a higher floor only ever probes MORE cells,
            # and the smaller floor's cells are a subset
            assert prev_cells.get((qid, "cells"), set()) <= cells
            prev_cells[(qid, "cells")] = cells


def test_adaptive_probe_full_floor_equals_brute_force(spark):
    corpus = _skewed_corpus(spark)
    queries = corpus.filter("vec_id in (0, 8)")
    adaptive = cosine_topk_ivf(
        queries, corpus, "vec_id", "vec_id", "embedding", "label",
        k=3, min_candidates=10_000,
    )
    brute = cosine_topk(
        queries, corpus, "vec_id", "vec_id", "embedding", k=3,
    )
    assert sorted(map(tuple, adaptive.collect())) == sorted(
        map(tuple, brute.collect())
    )


def test_adaptive_probe_small_floor_probes_one_cell(spark):
    corpus = _skewed_corpus(spark)
    queries = corpus.filter("vec_id = 0")
    probed = ivf_probe_adaptive(
        queries, corpus, "vec_id", "embedding", "label", min_candidates=1
    ).collect()
    assert len(probed) == 1  # prev_cum 0 < 1 only for the best cell
