"""Streaming funnel: per-user conversions match the batch plan across a
micro-batch boundary, tombstones prevent re-conversion, TTL bounds state."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from radar_output_restructure_spark.streaming.windows import (
    streaming_funnel_conversions,
)


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


_SCHEMA = "event_id long, user_id long, ts timestamp, event_type string"

# user 1 converts across the batch split (view+click in batch 1, purchase
# in batch 2); user 2 converts inside batch 1; user 3 never finishes;
# user 4's purchase PRECEDES the click, so strict order must reject it;
# user 2's second purchase must not re-convert a tombstoned user.
_EVENTS = [
    (0, 1, _ts(1), "view"),
    (1, 1, _ts(2), "click"),
    (2, 2, _ts(1), "view"),
    (3, 2, _ts(1, 30), "click"),
    (4, 2, _ts(2), "purchase"),
    (5, 3, _ts(3), "view"),
    (6, 4, _ts(1), "view"),
    (7, 4, _ts(2), "purchase"),
    (8, 4, _ts(3), "click"),
    # -- second half --
    (9, 1, _ts(5), "purchase"),
    (10, 2, _ts(6), "purchase"),
    (11, 3, _ts(7), "click"),
]


def test_streaming_funnel_matches_batch_across_split(spark, tmp_path):
    ev = spark.createDataFrame(_EVENTS, _SCHEMA)
    expected = sorted(
        (r.user_id, r.converted_at, r.lag1_us, r.lag2_us)
        for r in streaming_funnel_conversions(ev).collect()
    )
    assert [u for u, *_ in expected] == [1, 2], expected

    src = str(tmp_path / "ev_stream")
    ev.filter(F.col("event_id") <= 8).coalesce(1).write.parquet(src)
    ev.filter(F.col("event_id") > 8).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    out = streaming_funnel_conversions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.converted_at, r.lag1_us, r.lag2_us)
        for r in spark.sql("select * from funnel_stream").collect()
    )
    assert got == expected
    # exactly one conversion per user: the tombstone swallowed event 10
    assert len(got) == len({u for u, *_ in got})


def test_batch_mode_strict_order_and_lags(spark):
    ev = spark.createDataFrame(_EVENTS, _SCHEMA)
    rows = {r.user_id: r for r in streaming_funnel_conversions(ev).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].lag1_us == 60_000_000  # view 00:01 -> click 00:02
    assert rows[1].lag2_us == 180_000_000  # click 00:02 -> purchase 00:05
    assert rows[2].lag1_us == 30_000_000
    assert rows[2].lag2_us == 30_000_000


def test_streaming_funnel_single_step(spark, tmp_path):
    """A one-step funnel has NO lag columns; the state-output DDL must not
    end in a trailing comma (streams crashed on ParseException while the
    batch branch worked — a mode-parity break)."""
    ev = spark.createDataFrame(_EVENTS, _SCHEMA)
    batch = sorted(
        (r.user_id, r.converted_at)
        for r in streaming_funnel_conversions(ev, steps=("purchase",)).collect()
    )
    assert [u for u, _ in batch] == [1, 2, 4]  # first purchase each

    src = str(tmp_path / "ev1_stream")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src + "/*.parquet")
    q = (
        streaming_funnel_conversions(stream, steps=("purchase",))
        .writeStream.format("memory")
        .queryName("funnel1_out")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.converted_at)
        for r in spark.sql("select * from funnel1_out").collect()
    )
    assert got == batch
