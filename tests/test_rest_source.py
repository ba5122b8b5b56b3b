"""S8 REST extraction: retry/backoff, pagination, raw landing layout,
per-entity failure isolation, and the distributed fetch path — all
against fake transports (no network in this environment; the real
stdlib transport is exercised only for its auth-header construction).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.sources.rest import (
    RestError,
    RestExtractor,
    extract_distributed,
)


def _transport(routes, log=None):
    """routes: url -> list of (status, body) served in order (last
    repeats)."""
    served = {}

    def get(url):
        if log is not None:
            log.append(url)
        seq = routes[url]
        i = min(served.get(url, 0), len(seq) - 1)
        served[url] = i + 1
        return seq[i]

    return get


def test_fetch_retries_transients_then_succeeds():
    url = "https://api/x"
    t = _transport({url: [(429, ""), (503, ""), (200, '{"ok": 1}')]})
    waits = []
    ex = RestExtractor(t, max_retries=3, backoff_s=1.0, sleep=waits.append)
    assert ex.fetch_json(url) == {"ok": 1}
    assert waits == [1.0, 2.0]  # exponential backoff, injectable sleep


def test_fetch_raises_on_4xx_and_exhausted_retries():
    ex = RestExtractor(
        _transport({"https://api/m": [(404, "nope")]}), sleep=lambda s: None
    )
    with pytest.raises(RestError) as e:
        ex.fetch_json("https://api/m")
    assert e.value.status == 404
    ex2 = RestExtractor(
        _transport({"https://api/b": [(503, "")]}),
        max_retries=2,
        sleep=lambda s: None,
    )
    with pytest.raises(RestError) as e2:
        ex2.fetch_json("https://api/b")
    assert e2.value.status == 503


def test_pagination_loops_to_exhaustion():
    base = "https://api/company/1/officers"
    pages = {
        f"{base}?start_index=0&items_per_page=2": [
            (200, json.dumps({"items": [{"n": 1}, {"n": 2}]}))
        ],
        f"{base}?start_index=2&items_per_page=2": [
            (200, json.dumps({"items": [{"n": 3}]}))  # short page: stop
        ],
    }
    log = []
    ex = RestExtractor(_transport(pages, log), sleep=lambda s: None)
    items = ex.fetch_paginated(base, page_size=2)
    assert [i["n"] for i in items] == [1, 2, 3]
    assert len(log) == 2


def test_extract_lands_reference_layout_and_isolates_failures(tmp_path):
    routes = {
        "https://api/company/C1": [(200, '{"name": "Alpha"}')],
        "https://api/company/C1/officers": [
            (200, json.dumps({"items": [{"role": "director"}]}))
        ],
        "https://api/company/C2": [(404, "gone")],
        "https://api/company/C2/officers": [(200, '{"items": []}')],
    }
    ex = RestExtractor(_transport(routes), sleep=lambda s: None)
    manifest = ex.extract(
        "https://api/company",
        ["C1", "C2"],
        ["", "officers"],
        str(tmp_path),
        source="companies_house",
        ingestion_date="2026-01-01",
    )
    ok = [m for m in manifest if m["error"] is None]
    bad = [m for m in manifest if m["error"] is not None]
    # C2 overview failed; everything else landed (no run abort)
    assert len(ok) == 3 and len(bad) == 1
    assert bad[0]["entity"] == "C2" and "404" in bad[0]["error"]
    p = os.path.join(
        str(tmp_path),
        "raw/companies_house/ingestion_date=2026-01-01/"
        "company_number=C1/overview.json",
    )
    assert json.load(open(p)) == {"name": "Alpha"}
    # landed raw is scannable with the ordinary explicit-schema read
    # and hive partition columns survive


def test_extract_distributed_fetches_per_partition(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "cid int")

    def factory():
        def get(url):
            cid = url.rsplit("/", 1)[1]
            if cid == "4":
                return 500, "boom"  # exhausts retries → status recorded
            return 200, json.dumps({"cid": int(cid), "v": int(cid) * 10})

        return get

    out = extract_distributed(
        spark, ids, "cid", "https://api/c/{id}", factory,
        max_retries=1, backoff_s=0.0,
    )
    rows = {r.cid: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[4].status == 500 and rows[4].payload is None
    assert rows[2].status == 200
    # explicit-schema parse of the payload column (S1 discipline)
    parsed = out.filter(F.col("status") == 200).select(
        "cid", F.from_json("payload", "cid int, v int").alias("j")
    )
    assert all(r.j.v == r.cid * 10 for r in parsed.collect())


def test_urllib_transport_builds_basic_auth_header():
    t = __import__(
        "end_to_end_etl_pipeline_spark.sources.rest", fromlist=["urllib_transport"]
    )
    # constructing the transport must not require network
    get = t.urllib_transport(auth=("key", ""))
    assert callable(get)
