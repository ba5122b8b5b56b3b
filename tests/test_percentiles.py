"""Bit-equality pin for operators/percentiles.exact_percentiles vs the
built-in percentile() aggregate — the r12 replacement of the
single-reducer exact-percentile wall (see the module docstring).

Any divergence here means the driver-side interpolation no longer
replays Spark's Percentile.getPercentile double math and every adopter
(winsorized_price_stats) silently drifts off its oracle — fail loudly.
"""

import random

import pytest
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.percentiles import (
    exact_percentiles,
)
from end_to_end_etl_pipeline_spark.queries.catalog import load


def _builtin(df, col, ps):
    arr = ",".join(repr(p) + "D" for p in ps)
    return list(
        df.agg(F.expr(f"percentile({col}, array({arr}))")).first()[0]
    )


def test_matches_builtin_on_real_tables(spark):
    for sfd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        li = load(spark, sfd, "lineitem").select("l_extendedprice")
        ps = [0.05, 0.5, 0.95]
        mine = exact_percentiles(li, "l_extendedprice", ps)
        ref = _builtin(li, "l_extendedprice", ps)
        assert mine == ref, (sfd, mine, ref)


def test_matches_builtin_fuzz(spark):
    """Tiny frames, duplicate-heavy frames, single rows — every shape
    that can force the bracket out of range must land in the built-in
    fallback and still return the exact value."""
    random.seed(7)
    for _ in range(8):
        nrows = random.choice([1, 2, 3, 10, 101, 1000])
        dup = random.choice([1, 1, 5, 50])
        data = [
            (float(random.randint(0, max(1, nrows // dup))) / 4.0,)
            for _ in range(nrows)
        ]
        df = spark.createDataFrame(data, "v double")
        ps = [0.05, 0.5, 0.95]
        assert exact_percentiles(df, "v", ps) == _builtin(df, "v", ps), (
            nrows,
            dup,
        )


def test_null_handling(spark):
    df = spark.createDataFrame(
        [(None,), (1.0,), (2.0,), (None,), (3.0,)], "v double"
    )
    assert exact_percentiles(df, "v", [0.5]) == _builtin(df, "v", [0.5])
    empty = spark.createDataFrame([(None,)], "v double")
    assert exact_percentiles(empty, "v", [0.5]) == [None]


def test_winsorized_price_stats_still_oracle_green(spark):
    """The adopter query must keep its DuckDB parity after the swap."""
    from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY
    from tests.oracle import compare

    q = REGISTRY["winsorized_price_stats"]
    probs = compare(
        q.spark(spark, "/root/testdata/sf0.01"), q.oracle,
        "/root/testdata/sf0.01",
    )
    assert not probs, probs
