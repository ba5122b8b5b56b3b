from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_etl_pipeline_spark.session import create_spark_session

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_CORRECTNESS = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    # managed tables (MetastoreCatalog / bucketing tests) go to a
    # throwaway warehouse, not cwd/spark-warehouse
    s = create_spark_session(
        app_name="tests",
        warehouse_dir=tempfile.mkdtemp(prefix="spark_warehouse_"),
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness_dir():
    return SF_CORRECTNESS


@pytest.fixture(scope="session")
def sf_smoke_dir():
    return SF_SMOKE
