"""Incremental aggregate maintenance (materialized-view upkeep):
keep a grouped sum/count/avg table current by applying a CDC batch
(:meth:`sinks.manifest.ManifestCatalog.diff_versions` shape) instead
of recomputing over the base table.

Why this matters at 100 TB: a daily full `groupBy` over the fact
table costs a full scan + shuffle of everything; the delta update
costs one aggregation over the CHANGES (usually 0.01% of the base)
plus one key-partitioned join against the much smaller aggregate
state. This is textbook incremental view maintenance for
distributive aggregates — inserts add, deletes subtract, updates are
delete+insert (exactly the update_pre/update_post image pair the CDC
feed emits).

Scope: sum / count / avg (avg is derived from maintained sum+count,
never averaged directly). min/max are NOT delta-maintainable under
deletes (the new extreme may be any surviving row); maintain those by
re-aggregating only the changed groups against the base table
(semi-join on the delta's keys — still proportional to the change
set, not the base).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADD_TYPES = ("insert", "update_post")
_SUB_TYPES = ("delete", "update_pre")


def grouped_agg_state(
    base: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """The maintained state: per group, ``n`` plus ``sum_<c>`` and
    ``nn_<c>`` (non-null count) for each measure — the decomposable
    pieces every derived stat (avg, ratio-of-sums) is computed from
    at read time. The non-null count is what lets the delta path
    reproduce SQL's sum-over-all-NULLs = NULL exactly: without it,
    deleting a group's last non-null row would leave 0.0 where a
    recompute yields NULL."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in sum_cols:
        aggs += [F.sum(c).alias(f"sum_{c}"), F.count(c).alias(f"nn_{c}")]
    return base.groupBy(*keys).agg(*aggs)


def apply_agg_delta(
    state: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    change_col: str = "_change_type",
) -> DataFrame:
    """Merge a CDC batch into the aggregate state.

    One aggregation over the changes (signed: +row for
    insert/update_post, -row for delete/update_pre), then one
    full-outer join on the group keys; groups whose count reaches 0
    drop out, brand-new groups appear. Null-safe key equality keeps
    NULL-keyed groups mergeable. Both inputs shuffle on the same
    keys, so a pre-partitioned state table joins without re-shuffling
    itself at scale."""
    keys = list(keys)
    sign = (
        F.when(F.col(change_col).isin(*_ADD_TYPES), F.lit(1))
        .when(F.col(change_col).isin(*_SUB_TYPES), F.lit(-1))
        .otherwise(F.lit(0))
    )
    d_aggs = [F.sum("__sign").alias("__d_n")]
    for c in sum_cols:
        d_aggs += [
            F.sum(F.col(c) * F.col("__sign")).alias(f"__d_{c}"),
            F.sum(
                F.when(F.col(c).isNotNull(), F.col("__sign")).otherwise(0)
            ).alias(f"__dnn_{c}"),
        ]
    delta = changes.withColumn("__sign", sign).groupBy(*keys).agg(*d_aggs)
    # unique column names on the delta side instead of dataset
    # aliases: state and changes often share lineage (both derive
    # from the same base scan), which trips Spark's ambiguous
    # self-join detection for attribute references
    delta = delta.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        "__d_n",
        *[c2 for c in sum_cols for c2 in (f"__d_{c}", f"__dnn_{c}")],
    )
    joined = state.join(
        delta,
        [F.col(k).eqNullSafe(F.col(f"__dk_{k}")) for k in keys],
        "full_outer",
    )
    key_cols = [F.coalesce(F.col(k), F.col(f"__dk_{k}")).alias(k) for k in keys]
    n = F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("__d_n"), F.lit(0))
    out_cols = []
    for c in sum_cols:
        untouched = F.col("__d_n").isNull()  # group absent from the batch
        nn = F.coalesce(F.col(f"nn_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"__dnn_{c}"), F.lit(0)
        )
        # nn == 0 → every surviving measure is NULL → SQL sum is NULL,
        # which the additive path cannot represent (0.0 ≠ NULL)
        merged = F.when(nn == 0, F.lit(None)).otherwise(
            F.coalesce(F.col(f"sum_{c}"), F.lit(0))
            + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
        )
        out_cols.append(
            F.when(untouched, F.col(f"sum_{c}")).otherwise(merged).alias(f"sum_{c}")
        )
        out_cols.append(
            F.when(untouched, F.col(f"nn_{c}")).otherwise(nn).alias(f"nn_{c}")
        )
    return joined.select(*key_cols, n.alias("n"), *out_cols).filter(F.col("n") > 0)


def refresh_extremes_for_changed_groups(
    state: DataFrame,
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    minmax_cols: Sequence[str],
) -> DataFrame:
    """min/max upkeep: re-aggregate ONLY the groups present in the
    CDC batch (left-semi join of base on the delta's distinct keys —
    cost tracks the change set, not the base) and union with the
    untouched groups' stored extremes (anti join on the same key
    set). The key set carries no broadcast hint: it is
    delta-proportional, and a backfill-sized delta would OOM a forced
    broadcast — AQE promotes both joins to broadcast at runtime
    whenever the set is actually small (the steady-state case).

    ``state`` is the previous extremes table ``(keys, min_*, max_*)``.
    New groups appear via the fresh side; fully-deleted groups vanish
    because the base no longer has their rows; untouched groups never
    leave the anti-join's map side."""
    keys = list(keys)
    out_cols = [f"{m}_{c}" for c in minmax_cols for m in ("min", "max")]
    touched = changes.select(*keys).distinct().alias("t")
    # null-safe key equality: NULL-keyed groups are real groups here
    # (GROUP BY treats NULLs as one group) and must semi/anti-match
    b, s = base.alias("b"), state.alias("s")
    fresh = (
        b.join(
            touched,
            [b[k].eqNullSafe(touched[k]) for k in keys],
            "left_semi",
        )
        .groupBy(*keys)
        .agg(
            *[F.min(c).alias(f"min_{c}") for c in minmax_cols],
            *[F.max(c).alias(f"max_{c}") for c in minmax_cols],
        )
        .select(*keys, *out_cols)
    )
    untouched = s.join(
        touched,
        [s[k].eqNullSafe(touched[k]) for k in keys],
        "left_anti",
    ).select(*keys, *out_cols)
    return fresh.unionByName(untouched)
