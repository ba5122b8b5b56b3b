"""Local differential harness mirroring the driver's DuckDB-oracle
compare: row count + schema + order-insensitive value equality.

Stricter than a hash compare: after sorting columns by name and rows
by value, every cell must match exactly (None==None; floats exact,
since matched queries round to fixed decimals on both sides). If this
passes, any reasonable value-hash also matches.
"""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, str(int(v)))
    if isinstance(v, float):
        if math.isnan(v):
            return (2, "nan")
        return (2, repr(v))
    if isinstance(v, int):
        return (3, str(v))
    if isinstance(v, datetime.datetime):
        return (4, v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return (5, v.isoformat())
    return (9, str(v))


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    s_rows_raw = spark_df.collect()
    s_cols = spark_df.columns

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows_raw) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows_raw)} oracle={len(o_rows)}")

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    s_norm = sorted(
        tuple(_norm(r[i]) for i in order) for r in (tuple(row) for row in s_rows_raw)
    )
    o_norm = sorted(tuple(_norm(r[i]) for i in o_order) for r in o_rows)
    if s_norm != o_norm:
        diff_i = next(
            (i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b),
            min(len(s_norm), len(o_norm)),
        )
        s_at = s_norm[diff_i] if diff_i < len(s_norm) else "<missing>"
        o_at = o_norm[diff_i] if diff_i < len(o_norm) else "<missing>"
        problems.append(
            f"values differ at sorted row {diff_i}:\n  spark ={s_at}\n  oracle={o_at}"
        )
    return problems
