"""Differential fuzz: asof_join vs pandas.merge_asof.

pandas is the semantics reference for as-of joins (the docstring
promises merge_asof's matched-row behavior, including the tolerance
gap bound). The round-4 advice bug — a NULL payload in the nearest
right row letting a farther, tolerance-violating value leak through —
is exactly the class a point-example suite misses, so this drives
randomized timestamps/keys/NULL payloads through both engines and
requires identical output.

merge_asof notes that keep the comparison exact:
* pandas requires sorted inputs and unique-per-timestamp semantics to
  be well-defined; we dedup right rows to one per (key, timestamp)
  (latest-generated wins) before both engines — asof_join's window
  pick and merge_asof's searchsorted agree on ties only when the tie
  doesn't exist.
* tolerance in pandas is a Timedelta on the match gap, same contract
  as asof_join's tolerance_seconds.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_etl_pipeline_spark.operators.joins import asof_join

BASE = pd.Timestamp("2026-01-01")

# (key, seconds-offset) rows; payload may be NULL on the right
LEFT_ROW = st.tuples(st.integers(0, 2), st.integers(0, 300))
RIGHT_ROW = st.tuples(
    st.integers(0, 2),
    st.integers(0, 300),
    st.one_of(st.none(), st.integers(-100, 100)),
)


def _run_both(spark, lrows, rrows, direction, tolerance):
    lpdf = pd.DataFrame(
        [(f"k{k}", BASE + pd.Timedelta(seconds=s)) for k, s in lrows],
        columns=["k", "t"],
    )
    rpdf = pd.DataFrame(
        [
            (f"k{k}", BASE + pd.Timedelta(seconds=s), None if v is None else float(v))
            for k, s, v in rrows
        ],
        columns=["k", "rt", "v"],
    )
    # one right row per (key, ts): last generated wins, deterministically
    rpdf = rpdf.drop_duplicates(subset=["k", "rt"], keep="last")

    expected = pd.merge_asof(
        lpdf.sort_values("t", kind="stable").reset_index(drop=True),
        rpdf.sort_values("rt", kind="stable").reset_index(drop=True),
        left_on="t",
        right_on="rt",
        by="k",
        direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
        allow_exact_matches=True,
    )

    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = asof_join(
        left,
        right,
        on=["k"],
        left_time="t",
        right_time="rt",
        right_cols=["v"],
        direction=direction,
        tolerance_seconds=tolerance,
    ).toPandas()

    def norm(df):
        return sorted(
            (r.k, r.t.isoformat(), None if pd.isna(r.v) else float(r.v))
            for r in df[["k", "t", "v"]].itertuples(index=False)
        )

    return norm(got), norm(expected)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 30.0])
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    lrows=st.lists(LEFT_ROW, min_size=1, max_size=8),
    rrows=st.lists(RIGHT_ROW, min_size=1, max_size=8),
)
@pytest.mark.full_suite  # fuzz/sweep tier (r13, VERDICT r12 #1)
def test_asof_join_matches_pandas_merge_asof(
    spark, direction, tolerance, lrows, rrows
):
    got, expected = _run_both(spark, lrows, rrows, direction, tolerance)
    assert got == expected


def test_asof_join_advice_scenario_matches_pandas(spark):
    """The exact advice counterexample, pinned: nearest right row has
    a NULL payload; the stale non-NULL value must not fill it."""
    got, expected = _run_both(
        spark,
        lrows=[(0, 101)],
        rrows=[(0, 1, 5), (0, 100, None)],
        direction="backward",
        tolerance=10.0,
    )
    assert got == expected == [("k0", "2026-01-01T00:01:41", None)]
