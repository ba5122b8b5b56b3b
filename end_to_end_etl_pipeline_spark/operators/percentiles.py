"""Driver-coordinated EXACT percentiles without the single-reducer wall.

Spark's built-in ``percentile()`` is a TypedImperativeAggregate: every
partition builds an OpenHashMap of boxed ``Double -> count`` on the
generic (non-codegen) update path, and the final merge inserts every
distinct value into ONE task's map, then sorts it. On a mostly-unique
column that serializes the whole column through a single reducer —
measured 1.9 s for 600k lineitem prices at sf0.1 (r12 profile), and at
100 TB the merge task simply cannot hold the map.

``exact_percentiles`` computes the SAME interpolated percentiles
(bit-identical — see the parity note below) with the classic
approximate-pre-selection algorithm, THREE distributed jobs total for
any number of percentiles:

1. ``approx_percentile`` brackets around every target rank (rank error
   <= n/accuracy) plus the non-null count — one mergeable-sketch pass,
   no value map.
2. The exact rank below each bracket start — one conditional-count
   pass.
3. The per-value counts inside the UNION of brackets — one
   rank-bounded groupBy (~5·n/accuracy rows per percentile), collected
   bounded to the driver.

The driver walks each bracket's slice of that histogram to the exact
floor/ceil rank values and interpolates with EXACTLY the expression
Spark's ``Percentile.getPercentile`` uses::

    pos = p * (n - 1)
    (higher - pos) * lowerValue + (pos - lower) * higherValue

(same IEEE doubles, same operation order — equality with the built-in
is pinned by ``tests/test_percentiles.py`` on real tables and
duplicate-heavy fuzz frames).

Small inputs (n < accuracy, where the bracket's rank margin thins
out) and any bracket-resolution miss fall back to the built-in
aggregate, which is exact by definition and cheap at the sizes that
get there — so the result is exact by construction in every path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total distinct-value collect cap across all brackets
_COLLECT_CAP = 500_000


def _builtin(df: DataFrame, col: str, ps: list[float]) -> list[float | None]:
    arr = ",".join(repr(p) + "D" for p in ps)
    row = df.agg(F.expr(f"percentile({col}, array({arr}))").alias("p")).first()
    return list(row["p"]) if row["p"] is not None else [None] * len(ps)


def exact_percentiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    accuracy: int = 100_000,
) -> list[float | None]:
    """Exact interpolated percentiles of ``df[col]`` (Spark
    ``percentile()`` semantics, nulls ignored), returned as driver
    floats — intended to be re-injected as literals, which also
    removes the bounds broadcast-join the aggregate form needed."""
    ps = list(ps)
    # bracket half-width in quantile space: the sketch's own rank
    # error is <= n/accuracy, so p±(2/accuracy) clears it by a full
    # error margin whenever n >= 2·accuracy (below that the built-in
    # merge is cheap anyway)
    eps = 2.0 / accuracy
    bounds: list[float] = []
    for p in ps:
        bounds += [max(0.0, p - eps), min(1.0, p + eps)]
    arr = ",".join(repr(b) + "D" for b in bounds)
    first = df.agg(
        F.count(F.col(col)).alias("n"),
        F.expr(f"approx_percentile({col}, array({arr}), {accuracy})").alias("b"),
    ).first()
    n = first["n"]
    if n == 0:
        return [None] * len(ps)
    if n < accuracy or first["b"] is None:
        # below ~accuracy rows the bracket's rank margin (n/accuracy)
        # thins to <1 rank and the built-in merge is cheap anyway
        return _builtin(df, col, ps)
    br = first["b"]

    targets = []  # (i, pos, lower, higher, lo_v, hi_v)
    for i, p in enumerate(ps):
        pos = p * (n - 1)
        targets.append(
            (i, pos, math.floor(pos), math.ceil(pos), br[2 * i], br[2 * i + 1])
        )

    # one pass: exact rank below each bracket start
    counts = df.agg(*[
        F.sum(F.when(F.col(col) < lo_v, 1).otherwise(0)).alias(f"c{i}")
        for i, _pos, _lo, _hi, lo_v, _hi_v in targets
    ]).first()
    # one pass: distinct-value counts inside the UNION of brackets
    in_any = None
    for _i, _pos, _lo, _hi, lo_v, hi_v in targets:
        cond = (F.col(col) >= lo_v) & (F.col(col) <= hi_v)
        in_any = cond if in_any is None else (in_any | cond)
    hist = (
        df.filter(in_any)
        .groupBy(col)
        .count()
        .orderBy(col)
        .limit(_COLLECT_CAP + 1)
        .collect()
    )
    if len(hist) > _COLLECT_CAP:
        return _builtin(df, col, ps)

    out: list[float | None] = [None] * len(ps)
    for i, pos, lower, higher, lo_v, hi_v in targets:
        c = counts[f"c{i}"] or 0
        if c > lower:
            return _builtin(df, col, ps)
        v_lo = v_hi = None
        r = c
        for h in hist:
            v = h[col]
            if v < lo_v or v > hi_v:
                continue  # a different percentile's bracket slice
            top = r + h["count"] - 1
            if r <= lower <= top:
                v_lo = v
            if r <= higher <= top:
                v_hi = v
            r += h["count"]
        if v_lo is None or v_hi is None:
            # bracket missed (sketch error landed inside the
            # interpolation pair) — exact by the built-in instead
            return _builtin(df, col, ps)
        if lower == higher:
            out[i] = v_lo
        else:
            # EXACTLY Spark Percentile.getPercentile's expression
            out[i] = (higher - pos) * v_lo + (pos - lower) * v_hi
    return out
