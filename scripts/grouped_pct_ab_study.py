"""r13 grouped exact percentiles A/B (VERDICT r12 #4): would
order_value_percentiles / price_quantile_sketch benefit from the
bracket algorithm extended per group?

Variant `v2` computes the exact per-group percentiles with
operators.percentiles.grouped_exact_percentiles (3 distributed jobs)
and re-injects them as literals, so the in-plan percentile()
TypedImperativeAggregate — whose per-group value maps merge through
single reducer tasks — disappears; n/avg (and the approx leg for the
sketch query) stay in-plan. Value identity asserted against the
shipped form before timing.

Usage: python scripts/grouped_pct_ab_study.py [--reps 7]
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

from end_to_end_etl_pipeline_spark.operators.percentiles import (  # noqa: E402
    grouped_exact_percentiles,
)
from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY, load  # noqa: E402
from end_to_end_etl_pipeline_spark.session import create_spark_session  # noqa: E402

PS = [0.25, 0.50, 0.75, 0.90, 0.99]


def _lit_map(gcol, exact, i):
    expr = None
    for gv, vals in exact.items():
        expr = (F.when(F.col(gcol) == gv, F.lit(vals[i])) if expr is None
                else expr.when(F.col(gcol) == gv, F.lit(vals[i])))
    return expr


def order_value_percentiles_v2(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    exact = grouped_exact_percentiles(
        orders, "o_orderpriority", "o_totalprice", PS, accuracy=10_000
    )
    if exact is None:
        return REGISTRY["order_value_percentiles"].spark(spark, sf_dir)
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )
    return agg.select(
        "o_orderpriority",
        "n",
        *[
            F.round(_lit_map("o_orderpriority", exact, i), 4).alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p90", "p99"])
        ],
        "avg_price",
    )


def price_quantile_sketch_v2(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    exact = grouped_exact_percentiles(
        o, "o_orderpriority", "o_totalprice", [0.5, 0.95], accuracy=10_000
    )
    if exact is None:
        return REGISTRY["price_quantile_sketch"].spark(spark, sf_dir)
    g = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "approx_percentile(o_totalprice, array(0.5D, 0.95D), 10000)"
        ).alias("__ap"),
    )
    ex = [_lit_map("o_orderpriority", exact, i) for i in range(2)]

    def ok(i: int):
        return (
            F.abs(F.col("__ap")[i] / ex[i] - 1.0) <= 0.02
        ).alias(["p50_ok", "p95_ok"][i])

    return g.select(
        "o_orderpriority",
        "n",
        F.round(ex[0].cast("decimal(20,8)"), 2).cast("double")
        .alias("exact_p50"),
        F.round(ex[1].cast("decimal(20,8)"), 2).cast("double")
        .alias("exact_p95"),
        ok(0),
        ok(1),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = create_spark_session(app_name="grouped_pct_ab")
    spark.sparkContext.setLogLevel("ERROR")

    pairs = {
        "order_value_percentiles": (
            REGISTRY["order_value_percentiles"].spark,
            order_value_percentiles_v2,
        ),
        "price_quantile_sketch": (
            REGISTRY["price_quantile_sketch"].spark,
            price_quantile_sketch_v2,
        ),
    }
    for qname, (cur, v2) in pairs.items():
        a = {tuple(r) for r in cur(spark, args.sf_dir).collect()}
        b = {tuple(r) for r in v2(spark, args.sf_dir).collect()}
        assert a == b, f"{qname} v2 diverged: {sorted(a)[:1]} vs {sorted(b)[:1]}"
    print(json.dumps({"identity": "ok"}), flush=True)

    out = {}
    for qname, (cur, v2) in pairs.items():
        variants = {"cur": cur, "v2": v2}
        for mk in variants.values():  # JIT warm
            mk(spark, args.sf_dir).write.mode("overwrite").format(
                "noop").save()
        times = {m: [] for m in variants}
        for rep in range(args.reps):
            for m, mk in variants.items():
                spark.sparkContext.setJobDescription(f"{qname} {m} rep{rep}")
                t0 = time.perf_counter()
                mk(spark, args.sf_dir).write.mode("overwrite").format(
                    "noop").save()
                times[m].append(time.perf_counter() - t0)
        out[qname] = {
            m: {"min": round(min(s), 3),
                "med": round(statistics.median(s), 3)}
            for m, s in times.items()
        }
        print(qname, out[qname], flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
