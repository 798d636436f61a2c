"""Merge-asof operator semantics: backward-inclusive match, tolerance
windows, no-match nulls, tie handling, multi-key isolation."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from radar_output_restructure_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 10:00:00"), x=1),
            Row(k="a", ts=_ts("2024-01-01 10:05:00"), x=2),
            Row(k="a", ts=_ts("2024-01-01 09:00:00"), x=3),  # before any right
            Row(k="b", ts=_ts("2024-01-01 10:00:00"), x=4),  # other key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 09:30:00"), v=10.0),
            Row(k="a", ts=_ts("2024-01-01 10:00:00"), v=20.0),  # exact tie
            Row(k="b", ts=_ts("2024-01-01 09:59:00"), v=30.0),
        ]
    )
    return left, right


def test_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = {r.x: r for r in asof_join(left, right, on="k").collect()}
    # exact-timestamp right row matches (inclusive)
    assert out[1].asof_v == 20.0 and out[1].asof_ts == _ts("2024-01-01 10:00:00")
    assert out[2].asof_v == 20.0  # still latest at 10:05
    assert out[3].asof_v is None and out[3].asof_ts is None  # nothing prior
    assert out[4].asof_v == 30.0  # keys do not leak across


def test_tolerance_window(spark):
    left, right = _frames(spark)
    out = {
        r.x: r
        for r in asof_join(left, right, on="k", tolerance_s=120).collect()
    }
    assert out[1].asof_v == 20.0  # 0 s gap
    assert out[2].asof_v is None  # 5 min > 2 min tolerance -> nulled
    assert out[4].asof_v == 30.0  # 60 s gap within tolerance


def test_left_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k")
    assert out.columns == ["k", "ts", "x", "asof_ts", "asof_v"]
    assert out.count() == 4


def test_right_timestamp_tie_is_deterministic(spark):
    """Several RIGHT rows at the same (key, ts): the carried payload is the
    greatest payload tuple, stable across partitionings (the window order
    includes the payload columns as a tiebreak)."""
    left = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01 10:00:00"), x=1)])
    dup_ts = _ts("2024-01-01 09:30:00")
    rows = [Row(k="a", ts=dup_ts, v=float(v)) for v in (7, 3, 9, 1, 5)]
    for parts in (1, 2, 5):
        right = spark.createDataFrame(rows).repartition(parts)
        got = asof_join(left, right, on="k").collect()[0]
        assert got.asof_v == 9.0, f"parts={parts}: {got}"


def test_forward_inclusive_and_nulls(spark):
    """direction='forward': earliest right row at-or-after each left ts;
    rows with no later right row get nulls; keys stay isolated."""
    left, right = _frames(spark)
    out = {r.x: r for r in asof_join(left, right, on="k", direction="forward").collect()}
    assert out[3].asof_v == 10.0       # 09:00 -> next right at 09:30
    assert out[1].asof_v == 20.0       # 10:00 -> exact tie matches (inclusive)
    assert out[2].asof_v is None       # 10:05 -> nothing after
    assert out[4].asof_v is None       # b: right at 09:59 is BEFORE 10:00


def test_forward_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r.x: r
        for r in asof_join(
            left, right, on="k", direction="forward", tolerance_s=600
        ).collect()
    }
    assert out[3].asof_v is None       # next right is 1800 s away > 600
    assert out[1].asof_v == 20.0       # 0 s gap

def test_direction_validation(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, on="k", direction="nearest")
