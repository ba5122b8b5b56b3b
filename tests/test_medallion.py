"""Golden-path bronze → silver → gold pipeline test on
reference-shaped fixtures (FIXTURES.md §A; reference flow
``main.py:29-40``).

Covers the semantics SURVEY.md §2.11 pins down:
* NULL-vs-0 officer counts after inner explode + left join (§2.11-7)
* deterministic dedup keep-policy (§2.11-6)
* trim / initcap / to_date / year-arithmetic cleaning
* SCD2 invariants across two loads (one current row per key, changed
  rows expire + re-insert, unchanged keys untouched) (§2.11-5)
* guarded ratio + lag growth in the gold fact (s2g.py:126-141)
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.plans.medallion import MedallionPipeline

OVERVIEW_SCHEMA = (
    "company_name string, company_status string, date_of_creation string, "
    "jurisdiction string"
)
OFFICERS_SCHEMA = (
    "items array<struct<name:string,officer_role:string,appointed_on:string>>"
)
FUND_SCHEMA = (
    "company_number string, quarter_end_date date, total_revenue double, "
    "net_income double, ingestion_date date"
)


def _write_json(base, company, payload):
    d = os.path.join(base, "ingestion_date=2026-01-01", f"company_number={company}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "data.json"), "w") as f:
        json.dump(payload, f, indent=2)


@pytest.fixture
def fixture_dirs(tmp_path):
    ov = str(tmp_path / "raw" / "overview")
    off = str(tmp_path / "raw" / "officers")
    fund = str(tmp_path / "raw" / "fundamentals")

    _write_json(ov, "C001", {
        "company_name": "Alpha Ltd", "company_status": "active",
        "date_of_creation": "2000-01-15", "jurisdiction": "uk",
    })
    _write_json(ov, "C002", {
        "company_name": "  Beta Plc  ", "company_status": "ACTIVE",
        "date_of_creation": "2010-06-01", "jurisdiction": "uk",
    })
    _write_json(ov, "C003", {
        "company_name": "Gamma LLP", "company_status": "dissolved",
        "date_of_creation": None, "jurisdiction": "uk",
    })
    _write_json(ov, "C004", {
        "company_name": "Delta Inc", "company_status": "active",
        "date_of_creation": "2015-03-09", "jurisdiction": "us",
    })
    # duplicate delivery for C001 under a second ingestion date
    d = os.path.join(ov, "ingestion_date=2026-01-02", "company_number=C001")
    os.makedirs(d)
    with open(os.path.join(d, "data.json"), "w") as f:
        json.dump({"company_name": "Alpha Ltd Redelivered",
                   "company_status": "active",
                   "date_of_creation": "2000-01-15", "jurisdiction": "uk"}, f)

    _write_json(off, "C001", {"items": [
        {"name": "Ann", "officer_role": "director", "appointed_on": "2001-01-01"},
        {"name": "Bob", "officer_role": "director", "appointed_on": "2002-01-01"},
        {"name": "Cas", "officer_role": "secretary", "appointed_on": "2003-01-01"},
    ]})
    _write_json(off, "C002", {"items": [
        {"name": "Dee", "officer_role": "director", "appointed_on": "2011-01-01"},
    ]})
    _write_json(off, "C003", {"items": []})  # empty array: explode drops → NULL count
    # C004: no officers file at all → NULL count

    os.makedirs(fund)
    with open(os.path.join(fund, "batch.csv"), "w") as f:
        f.write("company_number,quarter_end_date,total_revenue,net_income,ingestion_date\n")
        for q, (rev, ni) in {
            "2025-03-31": (100.0, 10.0), "2025-06-30": (110.0, 11.0),
            "2025-09-30": (121.0, -5.0), "2025-12-31": (0.0, 1.0),
        }.items():
            f.write(f"C001,{q},{rev},{ni},2026-01-01\n")
        f.write("C002,2025-12-31,50.0,5.0,2026-01-01\n")
    return {"overview": ov, "officers": off, "fundamentals": fund}


def _config(dirs, as_of):
    return {
        "bronze": [
            {
                "table": "bronze.overview",
                "source": {"format": "json", "path": f"{dirs['overview']}/*/*/data.json",
                           "schema": OVERVIEW_SCHEMA},
                "path_key": {"name": "company_number",
                             "pattern": r"/company_number=([0-9A-Z]+)/[^/]+$"},
            },
            {
                "table": "bronze.officers",
                "source": {"format": "json", "path": f"{dirs['officers']}/*/*/data.json",
                           "schema": OFFICERS_SCHEMA},
                "path_key": {"name": "company_number",
                             "pattern": r"/company_number=([0-9A-Z]+)/[^/]+$"},
                "explode": {"key": "company_number", "array_col": "items"},
            },
            {
                "table": "bronze.fundamentals",
                "source": {"format": "csv", "path": dirs["fundamentals"],
                           "schema": FUND_SCHEMA},
            },
        ],
        "silver": [
            {
                "table": "silver.company_master",
                "from": "bronze.overview",
                "business_keys": ["company_number"],
                "derive": {
                    "company_name": "trim(company_name)",
                    "company_status": "initcap(company_status)",
                    "created_date": "to_date(date_of_creation)",
                    "is_active": "initcap(company_status) = 'Active'",
                    "company_age": "year(date'2026-01-01') - year(to_date(date_of_creation))",
                },
                "dedup": {"keys": ["company_number"],
                          "order_by": ["file_path DESC"]},  # latest delivery wins
                "feature_joins": [{
                    "from": "bronze.officers",
                    "group_by": ["company_number"],
                    "aggs": {"officer_count": "count(*)",
                             "distinct_roles": "count(DISTINCT officer_role)"},
                    "on": ["company_number"], "how": "left",
                }],
            },
            {
                "table": "silver.fundamentals",
                "from": "bronze.fundamentals",
                "business_keys": ["company_number", "quarter_end_date"],
                "scd": {"type": 2,
                        "business_keys": ["company_number", "quarter_end_date"],
                        "tracked_columns": ["total_revenue", "net_income"],
                        "as_of": as_of},
            },
        ],
        "gold": [
            {"table": "gold.dim_company", "from": "silver.company_master",
             "kind": "dimension"},
            {"table": "gold.fact_fundamentals", "from": "silver.fundamentals",
             "kind": "fact",
             "lag_growth": {"partition_by": ["company_number"],
                            "order_by": "quarter_end_date",
                            "value_col": "total_revenue", "out_col": "qoq_growth"},
             "derive": {"net_margin":
                        "CASE WHEN total_revenue IS NOT NULL AND total_revenue <> 0 "
                        "THEN net_income / total_revenue END"}},
        ],
    }


@pytest.fixture(params=["parquet", "manifest", "metastore"])
def pipe_factory(request, spark, tmp_path):
    def make():
        if request.param == "manifest":
            from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog

            cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
            return MedallionPipeline(spark, str(tmp_path / "lake"), catalog=cat)
        if request.param == "metastore":
            # the reference's addressing: saveAsTable/spark.table
            # names through the session catalog (3-level names
            # collapse onto it — see MetastoreCatalog docstring)
            from end_to_end_etl_pipeline_spark.sinks.writers import (
                MetastoreCatalog,
            )

            return MedallionPipeline(
                spark, str(tmp_path / "lake"), catalog=MetastoreCatalog(spark)
            )
        return MedallionPipeline(spark, str(tmp_path / "lake"))

    return make


def test_medallion_end_to_end(spark, tmp_path, fixture_dirs, pipe_factory):
    pipe = pipe_factory()
    pipe.run(_config(fixture_dirs, "2026-01-01 00:00:00"))

    # -- silver company_master ---------------------------------------
    master = {r.company_number: r for r in pipe.catalog.read("silver.company_master").collect()}
    assert len(master) == 4  # dedup to one row per company
    assert master["C001"].company_name == "Alpha Ltd Redelivered"  # latest delivery won
    assert master["C002"].company_name == "Beta Plc"  # trimmed
    assert master["C002"].company_status == "Active"  # initcap
    assert master["C002"].is_active is True
    assert master["C003"].is_active is False
    assert master["C003"].created_date is None and master["C003"].company_age is None
    assert master["C001"].company_age == 26
    # NULL-vs-0 (SURVEY §2.11-7): empty items and missing file both NULL
    assert master["C001"].officer_count == 3
    assert master["C001"].distinct_roles == 2
    assert master["C002"].officer_count == 1
    assert master["C003"].officer_count is None
    assert master["C004"].officer_count is None

    # -- second load: one changed quarter, one new quarter ------------
    with open(os.path.join(fixture_dirs["fundamentals"], "batch.csv"), "w") as f:
        f.write("company_number,quarter_end_date,total_revenue,net_income,ingestion_date\n")
        f.write("C001,2025-03-31,100.0,10.0,2026-02-01\n")   # unchanged tracked
        f.write("C001,2025-06-30,115.0,12.0,2026-02-01\n")   # changed → expire+insert
        f.write("C002,2026-03-31,60.0,6.0,2026-02-01\n")     # new key
    pipe.run(_config(fixture_dirs, "2026-02-01 00:00:00"))

    scd = pipe.catalog.read("silver.fundamentals")
    cur = scd.filter(F.col("is_current"))
    # exactly one current row per business key
    assert cur.groupBy("company_number", "quarter_end_date").count() \
              .filter("count > 1").count() == 0
    rows = {(r.company_number, str(r.quarter_end_date)): r for r in cur.collect()}
    assert rows[("C001", "2025-06-30")].total_revenue == 115.0  # new version current
    expired = scd.filter(~F.col("is_current")).collect()
    assert [(r.company_number, str(r.quarter_end_date), r.total_revenue)
            for r in expired] == [("C001", "2025-06-30", 110.0)]
    assert str(expired[0].effective_to) == "2026-02-01 00:00:00"
    # unchanged key kept its original version (no churn)
    assert str(rows[("C001", "2025-03-31")].effective_from) == "2026-01-01 00:00:00"
    assert ("C002", "2026-03-31") in rows  # new key inserted

    # -- gold fact ----------------------------------------------------
    fact = pipe.catalog.read("gold.fact_fundamentals")
    assert "last_updated_ts" not in fact.columns  # technical cols stripped
    assert fact.filter(~F.col("is_current")).count() == 0  # current snapshot only
    f1 = {(r.company_number, str(r.quarter_end_date)): r for r in fact.collect()}
    q2 = f1[("C001", "2025-06-30")]
    assert q2.qoq_growth == pytest.approx((115.0 - 100.0) / 100.0)
    zero_rev = f1[("C001", "2025-12-31")]
    assert zero_rev.net_margin is None  # guarded division at revenue 0
    assert zero_rev.qoq_growth == pytest.approx((0.0 - 121.0) / 121.0)
    assert f1[("C001", "2025-03-31")].qoq_growth is None  # first quarter: no lag


def test_silver_scd1_keeps_unmatched_keys(spark, tmp_path):
    """Regression: an scd type-1 silver spec must UPSERT, not full-
    overwrite — keys absent from the current batch survive."""
    pipe = MedallionPipeline(spark, str(tmp_path / "lake1"))
    spec = {
        "from": "bronze.src", "table": "silver.t",
        "scd": {"type": 1, "business_keys": ["k"], "tracked_columns": ["v"]},
    }
    pipe.catalog.replace_atomic(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), "bronze.src"
    )
    pipe.build_silver(spec)
    pipe.catalog.replace_atomic(
        spark.createDataFrame([(2, "b2"), (3, "c")], "k int, v string"), "bronze.src"
    )
    out = {r.k: r.v for r in pipe.build_silver(spec).collect()}
    assert out == {1: "a", 2: "b2", 3: "c"}  # key 1 survived, 2 updated
    with pytest.raises(ValueError, match="unknown scd type"):
        pipe.build_silver({**spec, "scd": {"type": 9, "business_keys": ["k"],
                                           "tracked_columns": ["v"]}})
