"""Deduplication operators.

Reference surface: ``dropDuplicates(["company_number"])``
(``medallion/silver/b2s_company_house.py:70``) — nondeterministic about
which row survives (SURVEY.md §2.11-6). The engine's exact-dedup
operator therefore takes an explicit keep-policy (ordering) and
implements it as ``row_number() == 1``, which is deterministic and
still a single hash-shuffle on the key.

Beyond the reference, the training-data-pipeline dedup family
(BASELINE.json north star): content-hash exact dedup, MinHash+LSH and
n-gram-Jaccard near-dup live in ``operators/text_dedup.py`` (they are
text-specific); embedding near-dup in ``operators/similarity.py``.

Scale notes: every variant here is one shuffle on the dedup key (the
theoretical minimum — duplicates must meet somewhere). No collects, no
driver loops. For skewed keys enable AQE skew handling (session
default) or salt upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """P7 (fixed) — one row per key, deterministic keep-policy.

    ``order_by`` decides which duplicate survives (first under the
    ordering). Without it, falls back to Spark's ``dropDuplicates``
    (reference-faithful nondeterminism, cheaper: partial agg map-side).
    """
    if order_by is None:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact_hash(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str,
    hash_col: str = "content_hash",
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exact content dedup: hash the content columns, keep the lowest
    id per hash.

    Plan: ONE shuffle — ``groupBy(hash).agg(min_by(struct(row), id))``.
    Map-side partial aggregation keeps a single surviving row per hash
    per task, so the exchange carries distinct-hash × row-payload (a
    skewed hash with a million copies costs one partial row per map
    task), and no join stage re-reads or re-hashes the source — both
    cheaper than the semi-join-back formulation, which shuffles every
    full row on its left side anyway.

    ``id_col`` must be a unique, NON-NULL row identifier: ``min_by``
    skips NULL ordering keys, so a NULL-id row never wins and an
    all-NULL-id hash group yields no output row.

    ``keep_cols`` limits which columns of the surviving row are
    carried (default: all). The struct inside ``min_by`` references
    every listed column, which BLOCKS Catalyst column pruning — a
    caller that only needs ids must say so here, or the parquet scan
    reads the full schema no matter what it selects afterwards
    (guarded by ``tests/test_plan_quality.py``)."""
    out_cols = list(keep_cols) if keep_cols is not None else list(df.columns)
    if id_col not in out_cols:
        out_cols = [id_col, *out_cols]
    hashed = df.withColumn(
        hash_col,
        F.md5(F.concat_ws("␟", *[F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in content_cols])),
    )
    row = F.struct(*[F.col(c) for c in out_cols])
    won = hashed.groupBy(hash_col).agg(F.min_by(row, F.col(id_col)).alias("__row"))
    return won.select(
        *[F.col(f"__row.{c}").alias(c) for c in out_cols], F.col(hash_col)
    )
