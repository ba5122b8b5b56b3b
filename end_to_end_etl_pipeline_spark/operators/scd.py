"""Slowly-changing-dimension engine (SURVEY.md §2.2 K4-K6, §7.1-4).

Capability rebuild of the reference's ``utils/scd/scd.py`` (SCD Type
1/2/3 on Delta MERGE) and the silver yfinance SCD2 choreography
(``medallion/silver/b2s_yfinance.py:114-186``), re-expressed for a
parquet lakehouse with the reference's observed defects fixed:

* **Atomicity** (§2.11-5): the reference runs MERGE-expire then
  append as two transactions; a crash between them loses the new
  version. Here each SCD apply computes the complete next table state
  as ONE DataFrame plan and publishes it with an atomic directory
  swap — readers see old or new state, never between.
* **Zero-width versions** (§2.11-5): validity is timestamp-typed and
  the ``as_of`` is caller-supplied, so same-day re-runs don't produce
  ``effective_from == effective_to`` date collisions.
* **Null-skipping hash** (§2.11-2): change detection uses the
  null-sentinel row hash from ``operators/hashing.py``.
* **SCD1 untracked-column loss** (§2.11-8): SCD1 merges full rows,
  not just tracked columns.

Scale notes. The parquet path rewrites the table per apply — at
100 TB bind these same plans to a MERGE-capable format (Delta/Iceberg,
interface kept identical) or partition the dimension by a stable key
bucket so the rewrite is partition-pruned to buckets containing
changes. The *plan* itself scales either way: one shuffle on the
business key (source ⋈ current), map-side hash compare, union of
disjoint legs — no collects, no driver loops, no second pass over the
source (the reference reads the source twice: MERGE + anti-join).
"""

from __future__ import annotations

import datetime as _dt
import functools
import operator
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.dedup import dedup_by_key
from end_to_end_etl_pipeline_spark.operators.joins import anti_join
from end_to_end_etl_pipeline_spark.operators.hashing import with_row_hash
from end_to_end_etl_pipeline_spark.sinks.writers import ParquetCatalog

SCD_COLS = ("row_hash", "effective_from", "effective_to", "is_current")

# Open-ended validity sentinel for current SCD2 rows.  Deliberately within
# pandas' ns-timestamp range (max 2262-04-11): downstream conformance
# harnesses round-trip results through pandas, and the conventional
# 9999-12-31 sentinel raises OutOfBoundsDatetime there.
MAX_TS = "2200-12-31 23:59:59"


def prepare_scd_source(
    src: DataFrame,
    keys: Sequence[str],
    dedup_order_by: Sequence[Column | str] | None = None,
    check_unique: bool = True,
) -> DataFrame:
    """Guard a merge source batch before any SCD apply.

    * **Null business keys are dropped.** They can never equi-match a
      target row, so each apply would re-insert them as fresh "current"
      rows forever (ADVICE r1). Callers wanting them must quarantine
      upstream (``operators/dq.quarantine_split``).
    * **Duplicate business keys fail fast** (or deterministically dedup
      when ``dedup_order_by`` is given). A dup-key batch multiplies the
      current⟕source join and breaks the one-current-row-per-key
      invariant — the reference's Delta MERGE raises on multi-match
      (``utils/scd/scd.py:55``); a silent engine must not do worse.
      The uniqueness probe is one narrow agg job over (keys) — set
      ``check_unique=False`` to skip it when the source is known-unique
      (e.g. output of an aggregation on the keys).
    """
    keys = list(keys)
    src = src.filter(
        functools.reduce(operator.and_, [F.col(k).isNotNull() for k in keys])
    )
    if dedup_order_by is not None:
        return dedup_by_key(src, keys, dedup_order_by)
    if check_unique:
        dup = (
            src.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                f"SCD source batch has duplicate business keys {keys}; "
                "pass dedup_order_by= for a deterministic keep-policy "
                "or dedup upstream"
            )
    return src


@dataclass
class SCDConfig:
    """Config-driven SCD binding (the reference drives this from JSON,
    ``medallion/silver/config_yfinance.json:5-58``)."""

    table: str
    business_keys: Sequence[str]
    tracked_columns: Sequence[str]
    scd_type: int = 2


class SCDEngine:
    """Catalog-agnostic SCD applier: ``catalog`` is anything with
    exists/read/replace_atomic — the local-dev ``ParquetCatalog`` or
    the object-store-portable ``sinks.manifest.ManifestCatalog``
    (which also offers bucket-pruned SCD2 via ``BucketedSCD2``)."""

    def __init__(self, catalog: ParquetCatalog):
        self.catalog = catalog

    # -- type 1 ---------------------------------------------------------
    def apply_scd1(
        self,
        source: DataFrame,
        table: str,
        keys: Sequence[str],
        dedup_order_by=None,
        check_unique: bool = True,
    ) -> None:
        """K4 — upsert: matched rows take the source's full row (fixes
        §2.11-8), unmatched target rows survive, new keys insert."""
        keys = list(keys)
        source = prepare_scd_source(source, keys, dedup_order_by, check_unique)
        if not self.catalog.exists(table):
            self.catalog.replace_atomic(source, table)
            return
        target = self.catalog.read(table)
        kept = anti_join(target, source, keys)
        self.catalog.replace_atomic(kept.unionByName(source), table)

    # -- type 2 ---------------------------------------------------------
    def apply_scd2(
        self,
        source: DataFrame,
        table: str,
        keys: Sequence[str],
        tracked: Sequence[str],
        as_of: _dt.datetime | str | None = None,
        dedup_order_by=None,
        check_unique: bool = True,
    ) -> None:
        """K5+K2+J2 — expire changed current rows, insert new versions,
        as one atomic publish (merge logic: :func:`scd2_next_state`)."""
        source = prepare_scd_source(source, keys, dedup_order_by, check_unique)
        target = self.catalog.read(table) if self.catalog.exists(table) else None
        self.catalog.replace_atomic(
            scd2_next_state(target, source, keys, tracked, as_of), table
        )

    # -- type 3 ---------------------------------------------------------
    def apply_scd3(
        self,
        source: DataFrame,
        table: str,
        keys: Sequence[str],
        tracked: Sequence[str],
        dedup_order_by=None,
        check_unique: bool = True,
    ) -> None:
        """K6 — previous-value columns: on change, ``previous_<c>`` ←
        old current value; inserts get NULL previous
        (reference ``utils/scd/scd.py:114-143``)."""
        keys = list(keys)
        source = prepare_scd_source(source, keys, dedup_order_by, check_unique)
        src = with_row_hash(source, tracked)
        if not self.catalog.exists(table):
            init = src
            for c in tracked:
                init = init.withColumn(
                    f"previous_{c}", F.lit(None).cast(source.schema[c].dataType)
                )
            self.catalog.replace_atomic(init, table)
            return
        target = self.catalog.read(table)
        tgt_sel = target.select(
            *keys,
            F.col("row_hash").alias("__t_hash"),
            *[F.col(c).alias(f"__t_{c}") for c in tracked],
            *[F.col(f"previous_{c}").alias(f"__t_prev_{c}") for c in tracked],
        )
        merged = src.join(tgt_sel, keys, "left")
        changed = F.col("__t_hash").isNotNull() & (
            F.col("__t_hash") != F.col("row_hash")
        )
        out = merged
        for c in tracked:
            out = out.withColumn(
                f"previous_{c}",
                F.when(changed, F.col(f"__t_{c}")).otherwise(
                    F.when(
                        F.col("__t_hash").isNotNull(), F.col(f"__t_prev_{c}")
                    ).otherwise(F.lit(None).cast(source.schema[c].dataType))
                ),
            )
        drop_cols = (
            ["__t_hash"]
            + [f"__t_{c}" for c in tracked]
            + [f"__t_prev_{c}" for c in tracked]
        )
        out = out.drop(*drop_cols)
        # keys that vanished from the source keep their last state
        kept = anti_join(target, src, keys)
        self.catalog.replace_atomic(kept.unionByName(out), table)


def scd2_next_state(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    as_of: _dt.datetime | str | None = None,
) -> DataFrame:
    """Pure SCD2 merge: given the current versioned table state (or
    ``None`` on first load) and a key-unique source batch, return the
    complete next state as one DataFrame plan.

    Next state = history (non-current, untouched)
               ∪ current-unchanged (source hash equal, or key absent
                 from source)
               ∪ current-expired   (source hash differs → close out)
               ∪ new-versions      (new key, or changed hash)

    Being a pure ``DataFrame → DataFrame`` function (no storage), this
    is directly testable under the DuckDB oracle and bindable to any
    catalog/commit strategy. One shuffle on the business key for each
    join leg; the reference instead runs MERGE-expire + anti-join +
    append as separate passes (``medallion/silver/b2s_yfinance.py:140-186``).
    """
    keys = list(keys)
    as_of_ts = _as_ts(as_of)
    src = with_row_hash(source, tracked).select(
        *keys, *[c for c in source.columns if c not in keys], "row_hash"
    )
    stamped_new = (
        src.withColumn("effective_from", F.lit(as_of_ts).cast("timestamp"))
        .withColumn("effective_to", F.lit(MAX_TS).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    if target is None:
        return stamped_new

    history = target.filter(~F.col("is_current"))
    current = target.filter(F.col("is_current"))

    # ONE full-outer join of current ⟷ source on the business key
    # (r12): the previous form ran two left joins (current→source and
    # source→current) and unioned four filtered branches — Spark could
    # not prove the slightly-differently-projected subtrees identical,
    # so every upstream scan/aggregation was recomputed once per
    # branch (the scd2_transition plan scanned orders SIX times).
    # Here each matched/unmatched row emits its 1-2 output rows
    # (carried-or-expired current version, and/or the new version)
    # from a single array-of-structs explode; both whens live inside
    # ONE expression, the safe Spark-4.1 codegen dedup pattern.
    # Output rows are value-identical to the four-branch form
    # (tests/test_scd.py pins the semantics; every SCD consumer is
    # oracle-verified).
    cols = list(current.columns)
    cur_p = current.select(
        *keys, F.struct(*[F.col(c) for c in cols]).alias("__cur")
    )
    src_p = stamped_new.select(
        *keys, F.struct(*[F.col(c) for c in cols]).alias("__new")
    )
    j = cur_p.join(src_p, keys, "full")
    cur_f, new_f = F.col("__cur"), F.col("__new")
    # Precondition (ADVICE r12): row_hash is NON-NULL by construction
    # on both sides — sha2(concat_ws(...coalesce...)) from
    # hashing.row_hash_col never yields null (the source side is
    # stamped above; the target side was written by this same
    # machinery). A null row_hash would make `changed` null → treated
    # as unchanged (current row passes through, new row suppressed),
    # which differs from the pre-r12 four-branch form (both branches
    # dropped such a row) — unreachable today, documented so a future
    # hand-built target doesn't quietly pick one behavior.
    changed = (
        cur_f.isNotNull()
        & new_f.isNotNull()
        & (cur_f["row_hash"] != new_f["row_hash"])
    )

    def _cur_out() -> F.Column:
        # the current version, expired in place when the source hash
        # differs (unchanged rows — including keys absent from the
        # source — pass through untouched)
        fields = []
        for c in cols:
            if c == "effective_to":
                fields.append(
                    F.when(changed, F.lit(as_of_ts).cast("timestamp"))
                    .otherwise(cur_f[c]).alias(c)
                )
            elif c == "is_current":
                fields.append(
                    F.when(changed, F.lit(False)).otherwise(cur_f[c]).alias(c)
                )
            else:
                fields.append(cur_f[c].alias(c))
        return F.when(cur_f.isNotNull(), F.struct(*fields))

    new_out = F.when(
        new_f.isNotNull() & (cur_f.isNull() | changed),
        F.struct(*[new_f[c].alias(c) for c in cols]),
    )
    merged = j.select(
        F.explode(
            F.filter(
                F.array(_cur_out(), new_out), lambda x: x.isNotNull()
            )
        ).alias("__r")
    ).select("__r.*")
    return history.unionByName(merged)


def scd2_close_keys(
    target: DataFrame,
    delete_keys: DataFrame,
    keys: Sequence[str],
    as_of: _dt.datetime | str | None = None,
) -> DataFrame:
    """Logical member deletion for an SCD2 dimension — the DELETE leg
    of the MERGE (``WHEN MATCHED AND source.deleted THEN`` in Delta
    terms, which the reference's two-pass pipeline cannot express):
    close the CURRENT row of every key in ``delete_keys``
    (effective_to = ``as_of``, is_current = False) with NO
    replacement version.  The dimension remembers the member existed
    — point-in-time joins before ``as_of`` still resolve — but has
    no current row after.  Keys without a current row are no-ops, so
    a replayed delete feed converges (idempotent).  History rows pass
    through untouched.  One join on the business key; pure
    DataFrame → DataFrame like :func:`scd2_next_state`, bindable to
    any catalog."""
    keys = list(keys)
    as_of_ts = _as_ts(as_of)
    k = (
        delete_keys.select(*keys)
        .distinct()
        .withColumn("__close", F.lit(True))
    )
    cond = F.col("is_current") & F.col("__close").isNotNull()
    return (
        target.join(k, keys, "left")
        .withColumn(
            "effective_to",
            F.when(cond, F.lit(as_of_ts).cast("timestamp")).otherwise(
                F.col("effective_to")
            ),
        )
        .withColumn(
            "is_current", F.when(cond, F.lit(False)).otherwise(F.col("is_current"))
        )
        .drop("__close")
    )


def _as_ts(as_of) -> str:
    if as_of is None:
        return _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(as_of, _dt.datetime):
        return as_of.strftime("%Y-%m-%d %H:%M:%S")
    return str(as_of)


def current_snapshot(df: DataFrame) -> DataFrame:
    """P6 — dimension current-state filter (reference
    ``medallion/gold/s2g.py:86-87``, guarded like the ``.py`` variant)."""
    if "is_current" in df.columns:
        return df.filter(F.col("is_current"))
    return df
