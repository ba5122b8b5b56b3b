"""Local differential harness mirroring the driver's DuckDB-oracle
compare: row count + schema + order-insensitive value equality.

Driver-faithful dtype handling: BOTH result sets are routed through
pandas before normalization, exactly like the driver's compare.  That
is the only way to see the two failure classes that bit round 3:

* DuckDB returns ``sum(<integer>)`` as HUGEINT, which pandas converts
  to float64 — so an uncast oracle sum hashes as ``5.0`` against
  Spark's ``5``.  The normalizer keeps int and float DISTINCT so this
  mismatch fails locally, not just at the gate.
* Timestamps outside pandas' ns range (e.g. the conventional
  ``9999-12-31`` SCD sentinel, max is 2262-04-11) raise
  OutOfBoundsDatetime during the pandas conversion itself.

After sorting columns by name and rows by normalized value, every
cell must match exactly (None==None; floats by repr, since matched
queries round to fixed decimals on both sides). If this passes, any
reasonable value-hash over the pandas frames also matches.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(
    sql: str, sf_dir: str, temp_directory: str | None = None
) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    if temp_directory is not None:
        # scale studies only: an in-memory DuckDB cannot spill without
        # a temp dir — the driver-faithful default (None) is unchanged.
        # DuckDB's SET takes no bound parameters, so escape embedded
        # quotes: a path containing one must not break the statement
        # (r10 ADVICE)
        escaped = temp_directory.replace("'", "''")
        con.execute(f"SET temp_directory = '{escaped}'")
        # DuckDB's default memory_limit (~80% of PHYSICAL RAM) can
        # exceed what is actually FREE next to a live Spark JVM, so
        # it hits a process-level bad_alloc before its own limit ever
        # triggers spilling.  A conservative cap makes it spill
        # instead of dying (scale studies only; same opt-in as the
        # temp dir).
        mem = os.environ.get("SPARK_GRAFT_ORACLE_MEMLIMIT")
        if mem:
            # same escaping as temp_directory above (r11 ADVICE): SET
            # takes no bound parameters, so an env value with an
            # embedded quote must not break the statement
            con.execute(f"SET memory_limit = '{mem.replace(chr(39), chr(39) * 2)}'")
    for t in TABLES:
        # driver testdata ships single-FILE parquet; Spark-built lakes
        # (scale studies) are parquet DIRECTORIES of part files —
        # DuckDB needs a glob for the latter
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    # .df() is the driver-faithful fetch: HUGEINT -> float64,
    # out-of-range timestamps raise here.
    df = con.execute(sql).df()
    con.close()
    return df


def _norm(v):
    # Array-likes first: pd.isna() on them is ambiguous.
    if isinstance(v, (list, tuple, np.ndarray)):
        return (8, tuple(_norm(x) for x in v))
    if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
        return (0, "")
    if isinstance(v, (bool, np.bool_)):
        return (1, str(int(v)))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return (2, "nan")
        return (2, repr(f))
    if isinstance(v, (int, np.integer)):
        return (3, str(int(v)))
    if isinstance(v, datetime.datetime):  # includes pd.Timestamp
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_localize(None)
        return (4, ts.isoformat())
    if isinstance(v, datetime.date):
        # A Spark DATE and the oracle's midnight TIMESTAMP (DuckDB
        # date_trunc returns TIMESTAMP; .df() has no date dtype) are
        # the same value to the driver — proven by r01-r03 green rows
        # (customer_master, medallion_gold_fact, daily_* all pair
        # DATE against date_trunc). Normalize date -> midnight ts.
        return (4, pd.Timestamp(v).isoformat())
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT folded into float: the driver's pandas
        # round-trip keeps Decimals as objects, so a Decimal column
        # hash-mismatches a float oracle.  Queries must cast.
        return (6, str(v))
    return (9, str(v))


def _df_norm(df: pd.DataFrame, col_order: list[str]):
    sub = df[col_order]
    return sorted(
        tuple(_norm(v) for v in row)
        for row in sub.itertuples(index=False, name=None)
    )


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    try:
        o_df = run_oracle(oracle_sql, sf_dir)
    except Exception as exc:  # driver records this as a red row
        return [f"oracle fetch failed (driver-fatal): {exc!r}"]
    try:
        s_df = spark_df.toPandas()
    except Exception as exc:
        return [f"spark->pandas conversion failed (driver-fatal): {exc!r}"]

    s_cols, o_cols = list(s_df.columns), list(o_df.columns)
    if sorted(s_cols) != sorted(o_cols):
        problems.append(
            f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
        )
        return problems
    if len(s_df) != len(o_df):
        problems.append(
            f"row count differs: spark={len(s_df)} oracle={len(o_df)}"
        )

    order = sorted(s_cols)
    s_norm = _df_norm(s_df, order)
    o_norm = _df_norm(o_df, order)
    if s_norm != o_norm:
        diff_i = next(
            (i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b),
            min(len(s_norm), len(o_norm)),
        )
        s_at = s_norm[diff_i] if diff_i < len(s_norm) else "<missing>"
        o_at = o_norm[diff_i] if diff_i < len(o_norm) else "<missing>"
        problems.append(
            f"values differ at sorted row {diff_i} (cols {order}):\n"
            f"  spark ={s_at}\n  oracle={o_at}"
        )
    return problems
