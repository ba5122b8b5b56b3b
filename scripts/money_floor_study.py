"""Money-tax floor study (VERDICT r10 #5): the r10 kernel study left
one open idea — "k5" two-level aggregation (long partial sums per
(group, input partition), merged in exact decimal) lost to the r10
one-level k6 form on the isolated sum_charge kernel (0.67 s vs
0.46 s, r11 re-measure) but had never been measured END-TO-END on the
two agg-dominated queries at the exact-sum floor (`pricing_summary`,
`promo_revenue_ratio`). The r11 measurement flipped the kernel
verdict end-to-end — pricing_summary 0.539 s (two-level) vs 0.591 s
(one-level) warm, tax vs the unsafe double twin 1.45 vs 1.59;
promo_revenue_ratio 0.669 vs 0.794, tax 1.23 vs 1.47 — with values
identical, so the two-level form NOW SHIPS for those two queries
(queries/core.py). It is also the more scale-robust form: each long
partial is bounded by rows-per-partition x max-charge at ANY total
scale, removing even the decimal(18,0) buffer's theoretical
BigDecimal fallback from the hot path.

This script keeps the file closeable: it re-measures, interleaved in
one session (S,K,D,S,K,D,...):

* S = shipped (now the two-level form, straight from the REGISTRY);
* K = the FROZEN r10 one-level form (scaled-long products summed as
  compact decimal(18,0)) — the historical A/B twin;
* D = the unsafe double twin (MONEY_EXACT=False) — the floor's
  denominator. Never ships.

Value gate: S and K must agree EXACTLY (collected rows compared).

Usage: python scripts/money_floor_study.py [--reps 7]
       [--sf-dir /root/testdata/sf0.1]
Output: one JSON line per query + a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.queries import core
from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY, load
from end_to_end_etl_pipeline_spark.session import create_spark_session


def pricing_summary_onelevel(spark, sf_dir: str):
    """FROZEN r10 shipped form: one groupBy, money sums as compact
    decimal(18,0) over sign-aware scaled-long products, avgs via
    F.avg."""
    li = load(spark, sf_dir, "lineitem")
    price_c2 = core._cents(F.col("l_extendedprice"))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            core._sum_rev(price_c2, 2, scale=100).alias("sum_base_price"),
            core._sum_rev(core._rev(), 2).alias("sum_disc_price"),
            core._sum_rev(core._charge(), 2, scale=1000000).alias(
                "sum_charge"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def promo_revenue_ratio_onelevel(spark, sf_dir: str):
    """FROZEN r10 shipped form: one groupBy, two decimal(18,0) sums,
    one double division."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = core._rev()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias(
                "ship_month"
            )
        )
        .agg(
            F.round(
                F.lit(100.0)
                * core._sum_rev_raw(promo)
                / core._sum_rev_raw(rev),
                6,
            ).alias("promo_pct")
        )
    )


ONELEVEL_TWINS = {
    "pricing_summary": pricing_summary_onelevel,
    "promo_revenue_ratio": promo_revenue_ratio_onelevel,
}


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _time(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = create_spark_session(app_name="money_floor_study")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf_dir}/nation.parquet").count()

    summary: dict[str, dict] = {}
    for name, onelevel in ONELEVEL_TWINS.items():
        shipped = REGISTRY[name].spark
        assert core.MONEY_EXACT is True
        s_rows = _rows(shipped(spark, args.sf_dir))
        k_rows = _rows(onelevel(spark, args.sf_dir))
        values_equal = s_rows == k_rows
        assert values_equal, f"{name}: one-level twin diverges from shipped"

        t_s, t_k, t_d = [], [], []
        for _ in range(args.reps + 1):  # first triple = cold/JIT
            core.MONEY_EXACT = True
            t_s.append(_time(shipped, spark, args.sf_dir))
            t_k.append(_time(onelevel, spark, args.sf_dir))
            core.MONEY_EXACT = False
            t_d.append(_time(shipped, spark, args.sf_dir))
        core.MONEY_EXACT = True
        r = {
            "values_equal": values_equal,
            "shipped_twolevel_warm": round(min(t_s[1:]), 3),
            "onelevel_r10_warm": round(min(t_k[1:]), 3),
            "double_warm": round(min(t_d[1:]), 3),
            "shipped_twolevel_median": round(statistics.median(t_s[1:]), 3),
            "onelevel_r10_median": round(statistics.median(t_k[1:]), 3),
            "double_median": round(statistics.median(t_d[1:]), 3),
            "shipped_tax": round(
                min(t_s[1:]) / max(min(t_d[1:]), 1e-9), 2
            ),
            "onelevel_tax": round(
                min(t_k[1:]) / max(min(t_d[1:]), 1e-9), 2
            ),
        }
        summary[name] = r
        print(json.dumps({"query": name, **r}), flush=True)

    print("MONEY_FLOOR_SUMMARY " + json.dumps(
        {"sf_dir": args.sf_dir, "reps": args.reps, **summary}
    ), flush=True)


if __name__ == "__main__":
    main()
