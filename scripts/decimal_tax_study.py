"""Decimal exactness-tax study (VERDICT r09 #3): turn the cost of the
r09 product-sum decimal migration into ONE number per query, and test
whether a cheaper exact form exists.

Two parts:

1. PER-QUERY A/B — the 13 migrated queries run in BOTH forms through
   the ``queries.core.MONEY_EXACT`` seam (True = shipped exact decimal
   pipeline, False = the pre-r09 double pipeline), INTERLEAVED in one
   session (D,d,D,d,... per rep) so both legs of every pair share
   machine state and the ratio is drift-immune — the r09 bench's
   failure mode was exactly non-interleaved drift. Timed through the
   noop sink like bench.py. The double leg is a PERF TWIN ONLY: it can
   land a cent off at scale (r09 sf1 sweep) and never ships.

2. KERNEL STUDY — the TPC-H Q1 ``sum_charge`` shape (the widest
   migrated aggregate: sum over price*(1-disc)*(1+tax)) in five forms,
   to adjudicate the r09 VERDICT's "does DECIMAL(16,4) sum cheaper"
   question and the scaled-long-cents idea:

   K1 double        sum(price*(1-d)*(1+t))                   [inexact]
   K2 decimal (r09) sum(dec(12,2)*dec→(16,4)*dec→(20,6))     [exact]
   K3 minimal       product cast down to (11,4) before the
                    tax multiply → (15,6) rows, sum buffer
                    (25,6) instead of (30,6)                  [exact*]
   K4 long cents    per-row 64-bit integer at 1e6 scale,
                    single long sum                           [exact,
                    but OVERFLOWS at 100 TB: per-row ≤1.1e11,
                    int64 holds ≤ 8.4e7 rows/group — sf0.1 Q1
                    groups are 1.5e5 rows (fine here), 100 TB
                    groups are 1.5e11 rows (1.6e22 ≫ 9.2e18).
                    Disqualified at target scale; measured to
                    document what the disqualification costs.]
   K5 two-level     long partial sums per (group, input
                    partition) — groupBy(keys, spark_partition_id())
                    aggregates map-side, ≤4M rows/partition ⇒
                    partial ≤ 4.3e17 < 9.2e18 with 20x headroom
                    at ANY total scale — then decimal-sum the
                    tiny partials. The scale-safe fast path.   [exact]

   (*) K3 exactness: disc_price = (12,2)x(3,2) has exactly 4
   fractional digits and value < 1.1e5, so (11,4) holds it with zero
   rounding; the downcast only narrows the DECLARED precision.

   K1/K2/K3/K5 (and K4 where in-range) must agree to the cent on this
   data; the script asserts K2==K3==K5 exactly and prints K1/K4 drift.

Usage:
  python scripts/decimal_tax_study.py [--reps 5] [--factor 10]
      [--sf-dir /root/testdata/sf0.1] [--skip-scaled] [--lake DIR]

With --factor N (default 10 ≈ sf1) the kernel study and a 5-query A/B
subset also run against a build_scaled lake. Output: one JSON line per
measurement plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.queries import core
from end_to_end_etl_pipeline_spark.queries.catalog import REGISTRY, load
from end_to_end_etl_pipeline_spark.session import create_spark_session

MIGRATED = [
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority",
    "local_supplier_volume",
    "returned_item_revenue",
    "salted_order_revenue",
    "nation_trade_volume",
    "promo_revenue_ratio",
    "nation_market_share",
    "product_profit",
    "top_revenue_supplier",
    "discounted_brand_revenue",
    "nation_pagerank",
]
#: subset re-measured on the scaled lake (the bench-visible ones)
SCALED_SUBSET = [
    "pricing_summary",
    "revenue_by_nation",
    "nation_market_share",
    "local_supplier_volume",
    "promo_revenue_ratio",
]


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].spark(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    return time.perf_counter() - t0


def ab_query(spark, name: str, sf_dir: str, reps: int) -> dict:
    dec, dbl = [], []
    for _ in range(reps + 1):  # +1: first pair is the cold/JIT pair
        core.MONEY_EXACT = True
        dec.append(_run(spark, name, sf_dir))
        core.MONEY_EXACT = False
        dbl.append(_run(spark, name, sf_dir))
    core.MONEY_EXACT = True
    w_dec, w_dbl = min(dec[1:]), min(dbl[1:])
    return {
        "decimal_warm": round(w_dec, 3),
        "double_warm": round(w_dbl, 3),
        "tax": round(w_dec / max(w_dbl, 1e-9), 2),
        "decimal_median": round(statistics.median(dec[1:]), 3),
        "double_median": round(statistics.median(dbl[1:]), 3),
        "cold_pair": [round(dec[0], 3), round(dbl[0], 3)],
    }


# ---------------------------------------------------------------------
# kernel study


def _kernels(sf_dir: str):
    """(name, build_fn) for the Q1 sum_charge shape. Each returns a
    2-col DataFrame (flag-group, charge) so value parity is checkable."""

    def base(spark):
        return load(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_linestatus",
            "l_extendedprice", "l_discount", "l_tax",
        )

    def k1_double(spark):
        c = (
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        )
        return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
            F.round(F.sum(c), 2).cast("double").alias("sum_charge")
        )

    def k2_decimal_r09(spark):
        p = F.col("l_extendedprice").cast("decimal(12,2)")
        d = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast(
            "decimal(3,2)"
        )
        t = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")
        return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
            F.round(F.sum(p * d * t), 2).cast("double").alias("sum_charge")
        )

    def k3_minimal(spark):
        p = F.col("l_extendedprice").cast("decimal(12,2)")
        d = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast(
            "decimal(3,2)"
        )
        t = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")
        # (12,2)x(3,2)=(16,4) holds < 1.1e5 with exactly 4dp → (11,4)
        # is a zero-rounding downcast; x(3,2) then lands (15,6) not
        # (20,6), and the sum buffer (25,6) not (30,6)
        disc_p = (p * d).cast("decimal(11,4)")
        return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
            F.round(F.sum(disc_p * t), 2).cast("double").alias("sum_charge")
        )

    def k6_r10(spark):
        # FROZEN r10 form: truncate-scale with unconditional +0.5
        # (sign-UNSAFE: floors negatives — replaced in r11 by the
        # signum form below; kept as the A/B twin pricing the fix)
        p = (F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        d = 100 - (F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
        t = 100 + (F.col("l_tax") * 100 + F.lit(0.5)).cast("long")
        c6 = p * d * t
        return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
            F.round(
                (F.sum(c6.cast("decimal(18,0)")) / 1000000).cast(
                    "decimal(38,6)"
                ),
                2,
            ).cast("double").alias("sum_charge")
        )

    def k6_shipped(spark):
        # the CURRENT production form, built from the REAL helpers
        # (queries/core.py _charge/_sum_rev) so this kernel can never
        # silently drift from what ships: sign-aware truncate-scaled
        # long products (x*100 + signum(x)*0.5 -> long; signum is a
        # pure JVM double intrinsic, still whole-stage codegen) +
        # compact decimal(18,0) sum
        assert core.MONEY_EXACT is True
        return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
            core._sum_rev(core._charge(), 2, scale=1000000).alias(
                "sum_charge"
            )
        )

    def _cents(spark):
        # exact integer factors: decimal casts round half-up exactly,
        # then scale to integers (price in cents, disc/tax in pct)
        p = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
        d = 100 - (F.col("l_discount").cast("decimal(3,2)") * 100).cast("long")
        t = 100 + (F.col("l_tax").cast("decimal(3,2)") * 100).cast("long")
        return base(spark).select(
            "l_returnflag", "l_linestatus", (p * d * t).alias("c6")
        )

    def k4_long(spark):
        # single long sum at 1e6 scale — overflow-bounded, see module doc
        return _cents(spark).groupBy("l_returnflag", "l_linestatus").agg(
            F.round(
                (F.sum("c6").cast("decimal(38,0)") / 1000000).cast(
                    "decimal(38,6)"
                ),
                2,
            ).cast("double").alias("sum_charge")
        )

    def k5_two_level(spark):
        # long partials per (group, input partition): the inner groupBy
        # key includes spark_partition_id() so partial agg is map-side
        # and each partial sum is bounded by rows-per-partition, then
        # the tiny partial set merges in exact decimal
        part = (
            _cents(spark)
            .groupBy(
                "l_returnflag", "l_linestatus",
                F.spark_partition_id().alias("__pid"),
            )
            .agg(F.sum("c6").alias("__part"))
        )
        return part.groupBy("l_returnflag", "l_linestatus").agg(
            F.round(
                (
                    F.sum(F.col("__part").cast("decimal(28,0)"))
                    / 1000000
                ).cast("decimal(38,6)"),
                2,
            ).cast("double").alias("sum_charge")
        )

    return [
        ("k1_double", k1_double),
        ("k2_decimal_r09", k2_decimal_r09),
        ("k6_shipped", k6_shipped),
        ("k6_r10", k6_r10),
        ("k3_minimal", k3_minimal),
        ("k4_long_cents", k4_long),
        ("k5_two_level", k5_two_level),
    ]


def kernel_study(spark, sf_dir: str, reps: int) -> dict:
    out: dict[str, dict] = {}
    values: dict[str, dict] = {}
    kerns = _kernels(sf_dir)
    times: dict[str, list[float]] = {n: [] for n, _ in kerns}
    for rep in range(reps + 1):
        for n, fn in kerns:  # interleaved: pairs share machine state
            t0 = time.perf_counter()
            fn(spark).write.mode("overwrite").format("noop").save()
            times[n].append(time.perf_counter() - t0)
    for n, fn in kerns:
        values[n] = {
            (r["l_returnflag"], r["l_linestatus"]): r["sum_charge"]
            for r in fn(spark).collect()
        }
        out[n] = {
            "warm": round(min(times[n][1:]), 3),
            "median": round(statistics.median(times[n][1:]), 3),
        }
    # exactness cross-check: every exact form must agree exactly
    for a, b in [("k2_decimal_r09", "k3_minimal"),
                 ("k2_decimal_r09", "k5_two_level"),
                 ("k2_decimal_r09", "k4_long_cents"),
                 ("k2_decimal_r09", "k6_shipped"),
                 ("k2_decimal_r09", "k6_r10")]:
        same = values[a] == values[b]
        out[f"values_{a}_eq_{b}"] = same
        assert same, f"{a} != {b}: exactness violated"
    drift = {
        k: round(values["k1_double"][k] - values["k6_shipped"][k], 2)
        for k in values["k6_shipped"]
        if values["k1_double"][k] != values["k6_shipped"][k]
    }
    out["k1_double_cent_drift_groups"] = len(drift)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--skip-scaled", action="store_true")
    ap.add_argument("--kernel-only", action="store_true",
                    help="skip the 13-query A/B; kernels only")
    ap.add_argument("--lake", default=None,
                    help="reuse an existing build_scaled lake")
    args = ap.parse_args()

    spark = create_spark_session(app_name="decimal_tax_study")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf_dir}/nation.parquet").count()  # warmup

    summary: dict[str, object] = {"sf_dir": args.sf_dir, "reps": args.reps}
    per_q: dict[str, dict] = {}
    if not args.kernel_only:
        for name in MIGRATED:
            r = ab_query(spark, name, args.sf_dir, args.reps)
            per_q[name] = r
            print(json.dumps({"query": name, "sf": "base", **r}), flush=True)
    summary["per_query"] = per_q
    summary["kernels_base"] = kernel_study(spark, args.sf_dir, args.reps)
    print(json.dumps({"kernels": "base", **summary["kernels_base"]}),
          flush=True)

    if not args.skip_scaled:
        from scripts.scale_study import build_scaled

        lake = args.lake or tempfile.mkdtemp(prefix="decimal_tax_")
        if not args.lake:
            t0 = time.perf_counter()
            build_scaled(spark, args.sf_dir, lake, args.factor)
            print(f"built {args.factor}x lake at {lake} in "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        scaled_q: dict[str, dict] = {}
        for name in SCALED_SUBSET:
            r = ab_query(spark, name, lake, max(2, args.reps - 2))
            scaled_q[name] = r
            print(json.dumps({"query": name, "sf": "scaled", **r}),
                  flush=True)
        summary["per_query_scaled"] = scaled_q
        summary["kernels_scaled"] = kernel_study(
            spark, lake, max(2, args.reps - 2))
        print(json.dumps({"kernels": "scaled",
                          **summary["kernels_scaled"]}), flush=True)
        summary["lake"] = lake

    print("DECIMAL_TAX_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
