"""Adversarial-input fuzz over the STREAMING stateful operators (r10
verdict item 4): NULL timestamps/users/text, duplicate rows, and exact
timestamp ties must neither crash a stateful query nor diverge from the
batch plan's pinned NULL conventions (NULL ts dropped by sessions, NULL
users are not funnel subjects, NULL text behaves as empty/no-tokens).
Every case runs the SAME input through batch and streaming mode across a
micro-batch split and asserts parity.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from radar_output_restructure_spark.streaming.windows import (
    session_windows,
    streaming_dedup,
    streaming_funnel_conversions,
    streaming_simhash_near_dup_pairs_wide,
)


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _run_stream(spark, tmp_path, df, build, name, split_col, split_at):
    """Write df as two micro-batch files, run `build(stream)` to
    completion, return the memory-sink rows."""
    src = str(tmp_path / f"{name}_src")
    df.filter(F.col(split_col) <= split_at).coalesce(1).write.parquet(src)
    (
        df.filter(F.col(split_col) > split_at)
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    schema = df.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


# ---------------------------------------------------------------------------
# sessions: NULL ts, NULL user, duplicate events, exact ties
# ---------------------------------------------------------------------------


def test_session_windows_fuzz_parity(spark, tmp_path):
    rows = [
        (0, 1, _ts(1)),
        (1, 1, _ts(1)),          # exact duplicate timestamp (tie)
        (2, 1, _ts(1)),          # triplicate
        (3, 1, None),            # NULL ts: dropped by convention
        (4, None, _ts(2)),       # NULL user: its own session key
        (5, None, _ts(2)),       # duplicate on the NULL key
        (6, 2, _ts(1)),
        (7, 2, _ts(59)),         # gap > 30 min: second session
        (8, 1, _ts(58)),
        (9, 2, _ts(59)),         # tie at the session edge
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    batch = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_windows(df, gap_s=1800).collect()
    ]
    # NULL ts row contributes to NO session
    assert sum(n for *_x, n in batch) == 9
    # the NULL user sessionizes as its own key (batch window semantics)
    assert any(u is None and n == 2 for u, _s, _e, n in batch)

    got = _run_stream(
        spark, tmp_path, df,
        lambda s: session_windows(s, gap_s=1800),
        "sess_fuzz", "event_id", 5,
    )
    # streaming append-mode emits only CLOSED sessions (a later event or
    # timeout closes them); every emitted session must match the batch
    # plan's row for the same (user, start) exactly
    batch_by_key = {(u, s): (e, n) for u, s, e, n in batch}
    for r in got:
        key = (r.user_id, r.session_start)
        assert key in batch_by_key, f"streaming invented a session: {r}"
        assert (r.session_end, r.n_events) == batch_by_key[key], r
    # user 1's first session (the 3 ties at minute 1) is closed by the
    # minute-58 event arriving in micro-batch 2
    assert any(r.user_id == 1 and r.n_events == 3 for r in got)


# ---------------------------------------------------------------------------
# funnel: NULL user / NULL type / duplicate steps across the split
# ---------------------------------------------------------------------------


def test_streaming_funnel_fuzz_parity(spark, tmp_path):
    rows = [
        (0, 1, _ts(1), "view"),
        (1, 1, _ts(1), "view"),       # duplicate step at the same instant
        (2, 1, _ts(2), "click"),
        (3, None, _ts(1), "view"),    # NULL user: not a funnel subject
        (4, None, _ts(2), "click"),
        (5, None, _ts(3), "purchase"),
        (6, 1, _ts(2), None),         # NULL type: matches no step
        (7, 2, _ts(1), "view"),
        (8, 2, _ts(1), "click"),      # tie with the view at the same ts
        # -- second micro-batch --
        (9, 1, _ts(5), "purchase"),
        (10, 2, _ts(6), "purchase"),
    ]
    schema = "event_id long, user_id long, ts timestamp, event_type string"
    df = spark.createDataFrame(rows, schema)
    expected = sorted(
        (r.user_id, r.converted_at)
        for r in streaming_funnel_conversions(df).collect()
    )
    assert all(u is not None for u, _c in expected), (
        "NULL users are not funnel subjects"
    )
    got = sorted(
        (r.user_id, r.converted_at)
        for r in _run_stream(
            spark, tmp_path, df,
            streaming_funnel_conversions,
            "funnel_fuzz", "event_id", 8,
        )
    )
    assert got == expected


# ---------------------------------------------------------------------------
# dedup: NULL keys and same-key ties across the split
# ---------------------------------------------------------------------------


def test_streaming_dedup_fuzz(spark, tmp_path):
    rows = [
        (0, 100, _ts(1)),
        (1, 100, _ts(1)),   # same key, same ts (tie): one survivor
        (2, None, _ts(2)),  # NULL key
        (3, None, _ts(2)),  # second NULL key: dedups against the first
        (4, 200, _ts(3)),
        # -- second micro-batch: re-delivery of key 100 within watermark --
        (5, 100, _ts(4)),
    ]
    df = spark.createDataFrame(rows, "event_id long, k long, ts timestamp")
    dedup = lambda s: streaming_dedup(  # noqa: E731
        s.withColumnRenamed("event_id", "arrival"), keys=("k",)
    )
    got = _run_stream(
        spark, tmp_path, df, dedup, "dedup_fuzz", "event_id", 4
    )
    by_key = {}
    for r in got:
        by_key.setdefault(r.k, []).append(r.arrival)
    assert len(by_key.get(100, [])) == 1, "re-delivered key must not re-emit"
    assert len(by_key.get(None, [])) == 1, "NULL keys dedup as one key"
    assert len(by_key.get(200, [])) == 1


# ---------------------------------------------------------------------------
# streaming simhash near-dup: NULL / empty / whitespace text
# ---------------------------------------------------------------------------


def test_streaming_simhash_fuzz_no_crash(spark, tmp_path):
    """NULL/empty/whitespace text through the wide fingerprint pipeline
    into the stateful detector, split across micro-batches: NULL text has
    no tokens (vanishes from the fingerprint frame per the batch
    convention); empty and whitespace-only text fingerprint the ''
    token and may legitimately pair with each other; nothing crashes."""
    from radar_output_restructure_spark.operators.dedup_scale import (
        simhash_wide,
    )

    rows = [
        (0, "common shared prefix doc one two three"),
        (1, "common shared prefix doc one two three"),  # exact dup
        (2, None),     # NULL text
        (3, ""),       # empty
        (4, "   "),    # whitespace-only
        (5, "common shared prefix doc one two four"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = simhash_wide(docs)
    fp_ids = {r.doc for r in fp.select("doc").collect()}
    assert 2 not in fp_ids, "NULL text must produce no fingerprint"
    got = _run_stream(
        spark, tmp_path, fp,
        streaming_simhash_near_dup_pairs_wide,
        "simhash_fuzz", "doc", 3,
    )
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (0, 1) in pairs, "the exact dup must pair"
    assert all(2 not in p for p in pairs), pairs
