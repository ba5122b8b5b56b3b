"""Differential tests: every registered query with an oracle must match
DuckDB exactly (row count + columns + order-insensitive values) at the
driver's correctness scale factor (sf0.01 — same data volume the
driver compares at, so rounding/boundary divergences that only appear
with more data points trip locally first). This mirrors the driver's
correctness gate.
"""

from __future__ import annotations

import pytest

from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY
from tests.oracle import compare

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_correctness_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_correctness_dir)
    problems = compare(df, q.oracle, sf_correctness_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_driver_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "queries() must be non-empty"
    assert set(os_) <= set(qs)
