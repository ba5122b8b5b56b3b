"""Projection / cleaning operators (SURVEY.md §2.3 P1-P3, P9; §2.8).

All built-in expressions — no UDFs — so every transform stays inside
whole-stage codegen and Catalyst can push/prune/fold freely.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_columns(df: DataFrame, exprs: Mapping[str, object]) -> DataFrame:
    """P1 — add/replace columns from a name→Column/SQL-string mapping.

    The config-driven form of the reference's ubiquitous
    ``withColumn`` chains (``medallion/silver/b2s_company_house.py:67-69``).
    SQL strings go through ``F.expr`` so configs stay plain JSON.
    """
    cols = {k: (F.expr(v) if isinstance(v, str) else v) for k, v in exprs.items()}
    return df.withColumns(cols)


def drop_technical_columns(
    df: DataFrame,
    cols: Sequence[str] = ("file_path", "file_name", "last_updated_ts"),
) -> DataFrame:
    """P3 — strip audit/technical columns before publication
    (reference ``medallion/gold/s2g.py:48-53``, guarded per column)."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def sanitize_column_names(df: DataFrame) -> DataFrame:
    """P9 — bulk header sanitize: lowercase, illegal chars → ``_``
    (reference bronze yfinance notebook ``clean_column_names``)."""
    cleaned = [re.sub(r"[^0-9a-zA-Z]+", "_", c).strip("_").lower() for c in df.columns]
    return df.toDF(*cleaned)


def flatten_exploded(df: DataFrame, key: str, array_col: str) -> DataFrame:
    """P2+P8 — explode a nested array<struct> and flatten: one row per
    element, key + all struct fields (reference
    ``medallion/bronze/ds2b_company_house.py:75-82``).

    Inner-explode semantics (rows with null/empty arrays drop) — the
    reference behavior SURVEY.md §2.11-7 says tests must preserve; use
    ``explode_outer=True`` when the row must survive with nulls.
    """
    exploded = df.withColumn("__elem", F.explode(F.col(array_col)))
    return exploded.select(key, "__elem.*")
