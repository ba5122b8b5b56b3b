"""Query registry: every implemented operator exposed as a named query
plus (where SQL-expressible) an equivalent DuckDB oracle.

This is the engine's conformance surface (SURVEY.md §5): the driver
runs each Spark query and its oracle side-by-side at sf=0.01 and
compares row count + schema + order-insensitive value hash.

Determinism rules for oracle-matched queries:
* alias every computed column identically on both sides;
* round double aggregates (sums → 2dp on cent-valued data, ratios →
  6dp) so Spark/DuckDB summation-order ulp differences vanish;
* never use current_date/now in matched queries — anchor literals;
* deterministic tie-breaks on every window ordering.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class EngineQuery:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, EngineQuery] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = EngineQuery(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{table}.parquet"
    nanos_cols = NANOS_TS_COLS.get(table)
    if not nanos_cols:
        return spark.read.parquet(path)
    # Nanosecond-precision parquet timestamps are illegal for Spark's
    # vectorized reader; read them as raw int64 nanos and truncate to
    # microsecond timestamps (exactly what DuckDB/Arrow consumers do).
    # Integer `div` — double division would lose precision at 1e18 ns.
    # Files written with us-precision timestamps read as timestamps
    # directly, so only convert columns that actually come back int64.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


# Import side-effect modules that populate REGISTRY.
from end_to_end_etl_pipeline_spark.queries import core  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import scans  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import scd_queries  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import textdata  # noqa: E402,F401
from end_to_end_etl_pipeline_spark.queries import vectors  # noqa: E402,F401
