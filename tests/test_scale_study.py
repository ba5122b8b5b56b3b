"""Guards for scripts/scale_study.py's scaled-lake builder.

The study's validity rests on the scaled corpus being genuinely Nx
(not Nx-duplicated): the r05 word-suffix salting bug left char-level
shingles identical across copies, which made MinHash-LSH correctly
flood the verify stage with cross-copy candidates and read as a fake
superlinear scaling result. These tests pin the properties the
cipher-salting fix restored.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from scale_study import (  # noqa: E402
    DIM_TABLES,
    FACT_KEY_SHIFTS,
    KEY_STRIDE,
    _derangement,
    build_scaled,
    build_skewed,
)


def test_cipher_is_a_derangement_over_letters_and_digits():
    """Cross-copy shingle distinctness must hold by construction: the
    cipher alphabet covers digits (an all-digit 6-shingle would pass a
    letters-only cipher unchanged) and maps NO character to itself —
    a plain seeded shuffle can have fixed points."""
    import string

    alphabet = string.ascii_lowercase + string.ascii_uppercase + string.digits
    for seed in range(1, 40):
        perm = _derangement(alphabet, seed=seed)
        assert sorted(perm) == sorted(alphabet)
        assert all(p != a for p, a in zip(perm, alphabet)), seed
from tests.conftest import SF_SMOKE  # noqa: E402

import pytest  # noqa: E402

# r13 (VERDICT r12 #1): scaled-lake study — SPARK_GRAFT_FULL_SUITE only
pytestmark = pytest.mark.full_suite


def test_build_scaled_counts_keys_and_corpus_distinctness(spark, tmp_path):
    out = str(tmp_path / "lake")
    factor = 3
    build_scaled(spark, SF_SMOKE, out, factor)

    # dims copied as-is; facts exactly factor-x with non-colliding keys
    for t in DIM_TABLES:
        assert (
            spark.read.parquet(f"{out}/{t}.parquet").count()
            == spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").count()
        )
    for t, keys in FACT_KEY_SHIFTS.items():
        base = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        scaled = spark.read.parquet(f"{out}/{t}.parquet")
        assert scaled.count() == factor * base.count()
        k = keys[0]
        assert (
            scaled.select(k).distinct().count()
            == factor * base.select(k).distinct().count()
        )

    # referential integrity holds per copy: every scaled lineitem
    # orderkey has its order, every order its customer
    li = spark.read.parquet(f"{out}/lineitem.parquet")
    orders = spark.read.parquet(f"{out}/orders.parquet")
    cust = spark.read.parquet(f"{out}/customer.parquet")
    assert (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey, "left_anti"
        ).count()
        == 0
    )
    assert (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_anti"
        ).count()
        == 0
    )

    # corpus: copies are char-shingle-distinct (the r05 bug class) —
    # zero shared char-6 shingles between a doc and its own copies
    docs = spark.read.parquet(f"{out}/documents.parquet")
    base_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert docs.count() == factor * base_docs.count()
    sh = docs.selectExpr(
        "doc_id % {stride} AS base_id".format(stride=KEY_STRIDE),
        "CAST(doc_id DIV {stride} AS INT) AS copy".format(stride=KEY_STRIDE),
        "explode(transform(sequence(1, greatest(length(text) - 5, 0)),"
        " s -> substring(text, s, 6))) AS shingle",
    ).distinct()
    cross = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.base_id") == F.col("b.base_id"))
            & (F.col("a.copy") < F.col("b.copy"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .limit(1)
        .count()
    )
    assert cross == 0, "copies share char shingles — salting regressed"

    # embeddings: same label clusters, distinct vectors
    emb = spark.read.parquet(f"{out}/embeddings.parquet")
    base_emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert emb.count() == factor * base_emb.count()
    assert (
        emb.select("label").distinct().count()
        == base_emb.select("label").distinct().count()
    )


def test_build_skewed_concentrates_hot_key(spark, tmp_path):
    uniform = str(tmp_path / "uniform")
    skewed = str(tmp_path / "skewed")
    factor = 3
    build_scaled(spark, SF_SMOKE, uniform, factor)
    build_skewed(spark, SF_SMOKE, uniform, skewed, factor)
    orders = spark.read.parquet(f"{skewed}/orders.parquet")
    n = orders.count()
    base_n = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert n == factor * base_n
    top = (
        orders.groupBy("o_custkey")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    # copies 1..factor-1 send half their rows to the hot key
    expected_hot = (factor - 1) * base_n / 2
    assert top["count"] >= 0.9 * expected_hot
    # the hot key still joins customer (it is a copy-0 key)
    cust = spark.read.parquet(f"{skewed}/customer.parquet")
    assert cust.filter(F.col("c_custkey") == top["o_custkey"]).count() == 1


def test_sf10_sampled_near_dup_oracle_degenerates_to_full(spark):
    """The sf10 study's sampled-exact near-dup replay (argmin-shingle
    candidate discovery + restricted signature recompute) must be a
    PURE restriction of the full oracle: with sample_mod=1 (every doc
    sampled) its output must equal the full near_dup_pairs oracle
    verbatim, and with a real modulus it must equal the full oracle
    filtered to pairs touching the sample. Runs at sf0.01 where the
    full oracle is cheap; soundness at sf10 then follows from the
    argmin-shingle argument in the script's module doc, which this
    test pins empirically."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.sf10_parity_study import _sampled_near_dup_sql
    from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY
    from tests.oracle import _df_norm, run_oracle

    sf = "/root/testdata/sf0.01"
    full = run_oracle(REGISTRY["near_dup_pairs"].oracle, sf)
    order = sorted(full.columns)

    everything = run_oracle(_sampled_near_dup_sql(1), sf)
    assert sorted(everything.columns) == order
    assert _df_norm(everything, order) == _df_norm(full, order)

    mod = 7
    sampled = run_oracle(_sampled_near_dup_sql(mod), sf)
    base_a = (full["doc_a"] % 1000000000) % 1000000
    base_b = (full["doc_b"] % 1000000000) % 1000000
    expected = full[(base_a % mod == 0) | (base_b % mod == 0)]
    assert len(sampled) > 0, "vacuous sample — raise the corpus or lower mod"
    assert _df_norm(sampled, order) == _df_norm(expected, order)
