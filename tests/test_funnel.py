"""Funnel / retention / path operators: hand-computable fixtures verifying
the strict-sequence and cohort semantics; cross-engine value parity is
covered by the registry oracles."""

from __future__ import annotations

import datetime as dt

from radar_output_restructure_spark.operators.funnel import (
    event_path_topk,
    funnel,
    retention_cohorts,
)

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(rows, spark):
    return spark.createDataFrame(
        [
            (i, _T0 + dt.timedelta(minutes=m), u, t, 0.0, "{}")
            for i, (u, t, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_funnel_strict_ordering_and_lags(spark):
    rows = [
        # user 1 converts fully: view@0, click@10, purchase@30
        (1, "view", 0), (1, "click", 10), (1, "purchase", 30),
        # user 2: click BEFORE first view -> step2 not reached
        (2, "click", 0), (2, "view", 5), (2, "purchase", 20),
        # user 3: views only
        (3, "view", 0),
        # user 4: no view at all -> not even step1
        (4, "purchase", 0),
    ]
    out = funnel(_ev(rows, spark)).collect()[0]
    assert out["n_step1"] == 3  # users 1,2,3
    assert out["n_step2"] == 1  # user 1 only
    assert out["n_step3"] == 1
    assert out["sum_lag1_us"] == 10 * 60 * 1_000_000
    assert out["sum_lag2_us"] == 20 * 60 * 1_000_000


def test_funnel_picks_first_qualifying_event(spark):
    rows = [
        (1, "view", 0),
        (1, "click", 5),
        (1, "click", 50),  # later click must not win
        (1, "purchase", 7),
    ]
    out = funnel(_ev(rows, spark)).collect()[0]
    assert out["n_step3"] == 1
    assert out["sum_lag1_us"] == 5 * 60 * 1_000_000
    assert out["sum_lag2_us"] == 2 * 60 * 1_000_000  # purchase@7 - click@5


def test_retention_cohorts_week_buckets(spark):
    day = 24 * 60
    rows = [
        (1, "signup", 0),
        (1, "click", 0),        # week 0
        (1, "click", 8 * day),  # week 1
        (1, "click", 20 * day),  # week 2
        (2, "click", 0),  # never signed up -> excluded
        (3, "signup", 7 * day),
        (3, "click", 0),  # pre-signup activity excluded
    ]
    out = retention_cohorts(_ev(rows, spark)).collect()
    got = {(r["cohort_date"].isoformat(), r["week_offset"]): r["n_users"] for r in out}
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_event_path_topk_orders_and_breaks_ties(spark):
    rows = [
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
        (2, "view", 0), (2, "click", 1), (2, "purchase", 2),
        (3, "view", 0), (3, "click", 1), (3, "error", 2),
    ]
    out = event_path_topk(_ev(rows, spark), n=3, k=2).collect()
    assert [(r["path"], r["n_paths"]) for r in out] == [
        ("view>click>purchase", 2),
        ("view>click>error", 1),
    ]
