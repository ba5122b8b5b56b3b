"""Source operators (SURVEY.md §2.1, S1-S7).

Every scan takes an *explicit* schema (StructType or DDL string) — the
reference's deliberate stance (no inference pass over 100 TB of files,
no ``_corrupt_record`` drift; reference ``utils/schema.py`` +
``medallion/bronze/ds2b_company_house.py:58-62``). At scale an
inference pass is a full extra read of the dataset, so it is simply not
offered here.

Scan operators return lazy DataFrames; Catalyst pushes filters and
prunes columns into the file scan (verify with
``df.explain("formatted")`` → ``PushedFilters`` / ``ReadSchema``).

S8 (pre-Spark REST extractor): the reference's AWS Glue pythonshell
job (``aws/ ch_ingest_company_overview_raw.py:49-74``) fetches a REST
API and lands raw JSON on S3 *before* Spark ever runs. That lives in
:mod:`end_to_end_etl_pipeline_spark.sources.rest` — an
injectable-transport extractor (retry/backoff, pagination, raw-first
landing at the reference's partitioned layout) whose output these
scans then read (S1/S2), plus a ``mapInPandas`` distributed-fetch
variant for cluster-scale pulls.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    multiline: bool = True,
) -> DataFrame:
    """S1 — multiline JSON scan with explicit schema.

    Capability of reference ``medallion/bronze/ds2b_company_house.py:58-62``
    (4-level glob over per-entity files, ``multiline=true``).
    """
    reader = spark.read.schema(schema)
    if multiline:
        reader = reader.option("multiline", "true")
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """S2 — CSV scan with explicit schema, header, PERMISSIVE.

    Malformed rows become nulls instead of failing the job (reference
    ``medallion/bronze/ds2b_yfinance.py:54-60``).
    """
    return (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .load(path)
    )


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC scan (columnar alternative to parquet for Hive-heritage
    lakes). Schema optional — ORC files are self-describing like
    parquet; pass one to pin column types against drift. Vectorized
    reader + predicate pushdown apply exactly as for parquet."""
    reader = spark.read.format("orc")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan — the engine's default storage (schema travels with
    the file, so no explicit schema required)."""
    return spark.read.parquet(path)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """S3 — catalog table scan by (possibly multi-part) name
    (reference ``medallion/silver/b2s_company_house.py:55-57``)."""
    return spark.table(name)


def with_file_metadata(df: DataFrame, col_name: str = "file_path") -> DataFrame:
    """S4 — file-metadata virtual column: source path per row.

    Uses the ``_metadata`` hidden column (OSS Spark ≥3.2 for file
    sources) rather than ``input_file_name()`` — same choice as the
    reference (``medallion/bronze/ds2b_company_house.py:63``).
    """
    return df.withColumn(col_name, F.col("_metadata.file_path"))


def with_path_key(
    df: DataFrame,
    key_name: str,
    pattern: str = r"/([0-9A-Z]+)/[^/]+$",
    path_col: str = "file_path",
) -> DataFrame:
    """S5 — derive a business key from the directory layout
    (reference ``medallion/bronze/ds2b_company_house.py:64-67``)."""
    return df.withColumn(key_name, F.regexp_extract(F.col(path_col), pattern, 1))


def rows_source(
    spark: SparkSession,
    rows: Iterable,
    schema: StructType | str,
) -> DataFrame:
    """S6/S7 — local-rows source (API-harvested data, seed/reference
    tables; reference ``aws/y_finance_raw_ingestion.ipynb`` cells 3-7).

    Driver-side only by design: seed tables are small. Anything large
    must land as files first.
    """
    return spark.createDataFrame(list(rows), schema=schema)


def values_source(spark: SparkSession, sql_values: str, columns: str) -> DataFrame:
    """S7 — SQL ``VALUES`` literal table: the in-query seed-table
    idiom (``SELECT * FROM VALUES ... AS t(cols)``). Same produce as
    :func:`rows_source`, but addressable from pure SQL — pipelines
    that inline lookup tables in a statement use this path.

    ``values_source(spark, "(1, 'EUR'), (2, 'USD')", "id, code")``
    """
    return spark.sql(f"SELECT * FROM VALUES {sql_values} AS t({columns})")


def read_text_lines(
    spark: SparkSession, path: str, whole: bool = False
) -> DataFrame:
    """Raw text source: one row per line (``value string``), or one
    row per FILE with ``wholetext`` — the landing format for corpus
    dumps that predate any schema (the step before a documents table
    exists). Splits parallelize per file/line range exactly like any
    file scan; downstream parsing is ordinary column work."""
    reader = spark.read
    if whole:
        reader = reader.option("wholetext", "true")
    return reader.text(path)
