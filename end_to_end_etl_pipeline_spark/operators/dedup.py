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
) -> DataFrame:
    """Exact content dedup: hash the content columns, keep the lowest
    id per hash.

    Plan: ``groupBy(hash).agg(min(id))`` — Catalyst prunes the agg-side
    shuffle to (hash, id) only and map-side partial aggregation
    collapses duplicate hashes before the exchange (a skewed hash with
    a million copies costs one partial row per map task, not one
    reduce-side task holding all copies) — then a semi-join on
    (hash, id) recovers the surviving full rows.

    ``id_col`` must be a unique row identifier. The id leg of the
    semi-join is null-safe so an all-NULL-id hash group survives
    (rather than vanishing); rows sharing (hash, id) — a violated
    uniqueness contract — would all survive."""
    hashed = df.withColumn(
        hash_col,
        F.md5(F.concat_ws("␟", *[F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in content_cols])),
    )
    winners = hashed.groupBy(hash_col).agg(F.min(id_col).alias("__win_id"))
    return hashed.join(
        winners,
        (hashed[hash_col] == winners[hash_col])
        & hashed[id_col].eqNullSafe(winners["__win_id"]),
        "left_semi",
    )
