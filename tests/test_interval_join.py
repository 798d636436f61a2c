"""Bucketized non-equi interval join (operators/timeseries.interval_join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.timeseries import interval_join


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def frames(spark):
    events = spark.createDataFrame(
        [
            Row(k="u1", ev=1, ts=_ts(0)),
            Row(k="u1", ev=2, ts=_ts(5)),
            Row(k="u1", ev=3, ts=_ts(10)),  # == interval end: excluded
            Row(k="u1", ev=4, ts=_ts(59)),
            Row(k="u2", ev=5, ts=_ts(5)),  # other key
        ]
    )
    ivals = spark.createDataFrame(
        [
            Row(k="u1", iv="a", s=_ts(0), e=_ts(10)),
            Row(k="u1", iv="b", s=_ts(58), e=_ts(59, 30)),
            Row(k="u2", iv="c", s=_ts(0), e=_ts(59)),
        ]
    )
    return events, ivals


def _pairs(df):
    return sorted((r.ev, r.iv) for r in df.select("ev", "iv").collect())


def test_matches_naive_join_with_half_open_ends(spark, frames):
    events, ivals = frames
    got = interval_join(
        events, ivals, keys="k", left_ts="ts", start_col="s", end_col="e",
        bucket_s=600,
    )
    naive = events.alias("l").join(
        ivals.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & (F.col("l.ts") >= F.col("r.s"))
        & (F.col("l.ts") < F.col("r.e")),
    )
    assert _pairs(got) == _pairs(naive)
    # half-open: ev=3 at exactly e is excluded; start instant included
    assert (1, "a") in _pairs(got) and (3, "a") not in _pairs(got)
    assert (4, "b") in _pairs(got)  # interval crossing a bucket boundary
    assert (5, "c") in _pairs(got) and (2, "c") not in _pairs(got)  # keys


@pytest.mark.parametrize("bucket_s", [1, 60, 3600, 86400])
def test_bucket_size_never_changes_results(spark, frames, bucket_s):
    """Output cardinality is bucket-invariant (no duplicates from intervals
    spanning many buckets, no misses from coarse buckets)."""
    events, ivals = frames
    got = interval_join(
        events, ivals, keys="k", left_ts="ts", start_col="s", end_col="e",
        bucket_s=bucket_s,
    )
    assert _pairs(got) == [(1, "a"), (2, "a"), (4, "b"), (5, "c")]
