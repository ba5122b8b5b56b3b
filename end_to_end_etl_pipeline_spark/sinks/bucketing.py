"""Bucketed-table co-location (SURVEY.md §4 'shuffle is the only
inter-node data movement' — this removes it for repeated equi-joins).

``bucketBy`` tables persist their hash partitioning in the catalog;
two tables bucketed on the same keys with the same bucket count
join WITHOUT a shuffle exchange — each task zips matching buckets.
The write costs one shuffle once; every subsequent join on those
keys is exchange-free. This is the batch analogue of the manifest
catalog's ``BucketedSCD2`` pruning: pay partitioning at write time,
harvest it on every read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+optionally sorted) catalog table.
    Sorting within buckets additionally removes the join's sort step
    (sort-merge join reads pre-sorted buckets)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys —
    plans with zero shuffle Exchange operators (verify with
    ``.explain("formatted")``). ``force_sort_merge`` pins the
    bucketed sort-merge strategy even when the planner would rather
    broadcast (useful to demonstrate/benchmark the co-location; in
    production let the planner pick — broadcast beats SMJ when one
    side is dim-sized)."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), list(on), how)
