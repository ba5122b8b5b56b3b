"""train_logreg_hashed: the in-engine logistic regression must
actually LEARN the planted signal, not just replay arithmetic — on a
corpus where the label is linearly separable in the hashed feature
space, trained accuracy must clearly beat the majority class, and
the loss must decrease across iterations."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.text_analysis import (
    hashed_doc_features,
    train_logreg_hashed,
)


def _corpus(spark, n=200):
    # planted separable signal: positive docs speak "good", negative
    # docs speak "bad" (disjoint vocabularies -> disjoint buckets
    # almost surely at dim=64)
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        words = (["good", "fine", "great"] if pos else ["bad", "poor", "awful"])
        rows.append((i, " ".join(words * (2 + i % 3)), 1.0 if pos else 0.0))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "y"])
    return spark.createDataFrame(pdf)


def test_logreg_learns_planted_signal(spark):
    docs = _corpus(spark)
    feats = hashed_doc_features(docs, "doc_id", "text", dim=64)
    labels = docs.select("doc_id", "y")
    accs = []
    for iters in (1, 4):
        w = train_logreg_hashed(feats, labels, "doc_id", 64, iters=iters, lr=2.0)
        wdf = spark.createDataFrame(list(enumerate(w)), "bucket int, weight double")
        z = (
            feats.join(labels, "doc_id")
            .join(F.broadcast(wdf), "bucket")
            .groupBy("doc_id")
            .agg(F.any_value("y").alias("y"),
                 F.sum(F.col("x") * F.col("weight")).alias("z"))
        )
        acc = z.select(
            F.avg(((F.col("z") >= 0) == (F.col("y") == 1.0)).cast("double"))
        ).collect()[0][0]
        accs.append(acc)
    assert accs[-1] >= 0.95, accs  # separable: near-perfect after 4 steps
    assert accs[-1] >= accs[0], accs  # more steps never hurt here
    assert any(abs(v) > 0 for v in w)  # weights actually moved


def test_logreg_zero_token_docs_excluded(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", "   "],
                      "y": [1.0, 0.0]})
    )
    feats = hashed_doc_features(docs, "doc_id", "text", dim=8)
    assert feats.select("doc_id").distinct().count() == 1
    w = train_logreg_hashed(
        feats, docs.select("doc_id", "y"), "doc_id", 8, iters=1, lr=1.0
    )
    assert len(w) == 8  # trains on the one featured doc, no crash
