"""r13 re-adjudication of the pricing_summary try_sum swap (VERDICT
r12 #7): the r12 bench read ×0.905 cold on pricing_summary after the
try_sum+_overflow_guard hardening, while the r12 kernel A/B said
try_sum is free (0.716 vs 0.767 s mins). One borderline signal vs one
controlled signal — re-measure on this round's box with the SHIPPED
query shape (not a reduced kernel): variant `plain` is pricing_summary
with every `try_sum` swapped back to `sum` and the guard replaced by a
pass-through, everything else identical.

Usage: python scripts/trysum_ab_study.py [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY, load  # noqa: E402
from end_to_end_etl_pipeline_spark.queries.core import (  # noqa: E402
    _cents,
    _charge,
    _rev,
)
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402


def pricing_summary_plain(spark, sf_dir):
    """The shipped two-level exact form with plain (non-ANSI) long
    sums and NO overflow guard — the r11 form, value-identical on
    in-bound data."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    part = li.groupBy(
        "l_returnflag", "l_linestatus",
        F.spark_partition_id().alias("__pid"),
    ).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("price2"),
        F.sum(_rev()).alias("rev4"),
        F.sum(_charge()).alias("charge6"),
        F.sum(_cents(F.col("l_discount"))).alias("disc2"),
        F.count("*").alias("n"),
    )

    def dec(colname: str, scale: int):
        return F.sum(F.col(colname).cast("decimal(28,0)")) / scale

    n = F.sum("n")
    return part.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("qty").cast("double"), 2).alias("sum_qty"),
        F.round(dec("price2", 100).cast("decimal(38,6)"), 2)
        .cast("double").alias("sum_base_price"),
        F.round(dec("rev4", 10000).cast("decimal(38,6)"), 2)
        .cast("double").alias("sum_disc_price"),
        F.round(dec("charge6", 1000000).cast("decimal(38,6)"), 2)
        .cast("double").alias("sum_charge"),
        F.round(F.sum("qty") / n, 4).alias("avg_qty"),
        F.round((dec("price2", 100) / n).cast("double"), 4).alias(
            "avg_price"
        ),
        F.round((dec("disc2", 100) / n).cast("double"), 6).alias(
            "avg_disc"
        ),
        n.alias("count_order"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = create_spark_session(app_name="trysum_ab")
    spark.sparkContext.setLogLevel("ERROR")

    shipped = REGISTRY["pricing_summary"].spark

    # value identity first (plain twin must reproduce shipped output)
    a = {tuple(r) for r in shipped(spark, args.sf_dir).collect()}
    b = {tuple(r) for r in pricing_summary_plain(spark, args.sf_dir).collect()}
    if a != b:
        print(json.dumps({"identity": "MISMATCH — timing meaningless",
                          "shipped": sorted(a)[:2], "plain": sorted(b)[:2]}))
        return
    print(json.dumps({"identity": "ok"}), flush=True)

    def canary():
        t0 = time.perf_counter()
        spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()
        return time.perf_counter() - t0

    variants = {"try_sum": lambda: shipped(spark, args.sf_dir),
                "plain": lambda: pricing_summary_plain(spark, args.sf_dir)}
    for mk in variants.values():  # JIT warm
        mk().write.mode("overwrite").format("noop").save()
    times = {m: [] for m in variants}
    cans = []
    for rep in range(args.reps):
        for m, mk in variants.items():
            cans.append(canary())
            spark.sparkContext.setJobDescription(f"{m} rep{rep}")
            t0 = time.perf_counter()
            mk().write.mode("overwrite").format("noop").save()
            times[m].append(time.perf_counter() - t0)
    out = {
        m: {"min": round(min(s), 3), "med": round(statistics.median(s), 3),
            "all": [round(x, 3) for x in s]}
        for m, s in times.items()
    }
    out["canary"] = {"min": round(min(cans), 3), "max": round(max(cans), 3)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
