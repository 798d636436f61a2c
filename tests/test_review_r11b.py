"""Regression tests for the round-11 /code-review pass over
sources/manifest.py and streaming/windows.py.

1. Manifest segment names are monotonic per instance: a backward clock
   step must not let a later revoke sort before an earlier commit (which
   would replay to 'committed' and silently lose the revocation).
2. maybe_compact lists the ledger prefix ONCE per call (hot path).
3. SchemaFingerprintCache evicts superseded (path, old_mtime) entries on
   rewrite instead of growing monotonically.
4. Streaming funnel drops NULL event times like the batch plan (NaT was
   int64-min garbage microseconds in state).
5. session_windows / streaming_funnel_conversions accept non-bigint keys
   in STREAMING mode too (output schema mirrors the input key type).
6. A late cross-batch event absorbed into an open session extends
   session_start downward (the envelope stays faithful).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from radar_output_restructure_spark.sinks.storage import LocalTargetStorage
from radar_output_restructure_spark.sources.manifest import (
    FileEntry,
    ProcessedFileManifest,
    SchemaFingerprintCache,
)


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


# ---------------------------------------------------------------------------
# 1. monotonic segment names under a backward clock step
# ---------------------------------------------------------------------------


def test_manifest_revoke_survives_backward_clock_step(tmp_path, monkeypatch):
    import radar_output_restructure_spark.sources.manifest as M

    m = ProcessedFileManifest(str(tmp_path / "offsets"))
    f = FileEntry("/in/t/partition=0/t+0+0+0.parquet", 1000)

    real_ns = M.time.time_ns()
    clock = {"now": real_ns}
    monkeypatch.setattr(M.time, "time_ns", lambda: clock["now"])

    m.commit([f])
    clock["now"] = real_ns - 10_000_000_000  # NTP steps the clock back 10 s
    m.revoke([f])
    assert m.load() == {}, (
        "a revoke after a backward clock step replayed BEFORE the commit — "
        "the revocation was silently lost"
    )
    assert m.prune([f]) == [f], "revoked file must be re-extractable"


# ---------------------------------------------------------------------------
# 2. maybe_compact single listing
# ---------------------------------------------------------------------------


def test_maybe_compact_lists_once(tmp_path):
    class Counting(LocalTargetStorage):
        def __init__(self):
            self.walks = 0

        def walk_files(self, root):
            self.walks += 1
            return super().walk_files(root)

    st = Counting()
    m = ProcessedFileManifest(str(tmp_path / "offsets"), st)
    for i in range(4):
        m.commit([FileEntry(f"/in/f{i}", i)])
    st.walks = 0
    assert m.maybe_compact(max_segments=2) is True
    assert st.walks == 1, "maybe_compact + compact must share ONE listing"
    assert len(m._segments()) == 1
    assert set(m.load()) == {f"/in/f{i}" for i in range(4)}


# ---------------------------------------------------------------------------
# 3. fingerprint-cache eviction of superseded mtimes
# ---------------------------------------------------------------------------


def test_fingerprint_cache_evicts_stale_mtimes(tmp_path):
    c = SchemaFingerprintCache(str(tmp_path / "offsets"))
    c.get_many([FileEntry("/in/a", 1)], lambda p: "schema-v1")
    c.get_many([FileEntry("/in/a", 2)], lambda p: "schema-v2")  # modified
    persisted = open(
        os.path.join(str(tmp_path / "offsets"), "schema-fingerprints.cache")
    ).read().splitlines()
    assert len(persisted) == 1, (
        "superseded (path, old_mtime) lines must be evicted on rewrite"
    )
    assert '"m": 2' in persisted[0]
    # the surviving entry still hits
    got = c.get_many([FileEntry("/in/a", 2)], lambda p: "MUST-NOT-RECOMPUTE")
    assert got == {"/in/a": "schema-v2"}


# ---------------------------------------------------------------------------
# 4+5. streaming funnel: NULL ts dropped; string keys work in streaming
# ---------------------------------------------------------------------------


def _run_stream(spark, tmp_path, df, build, name, split_col, split_at):
    src = str(tmp_path / f"{name}_src")
    df.filter(F.col(split_col) <= split_at).coalesce(1).write.parquet(src)
    (
        df.filter(F.col(split_col) > split_at)
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    stream = (
        spark.readStream.schema(df.schema)
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


def test_streaming_funnel_drops_null_ts_and_string_keys(spark, tmp_path):
    from radar_output_restructure_spark.streaming.windows import (
        streaming_funnel_conversions,
    )

    rows = [
        (0, "alice", _ts(1), "view"),
        (1, "alice", None, "view"),      # NULL ts: garbage NaT in state before
        (2, "alice", _ts(2), "click"),
        (3, "bob", None, "purchase"),    # NULL ts only: never converts
        # -- second micro-batch --
        (4, "alice", _ts(5), "purchase"),
    ]
    schema = "event_id long, user_id string, ts timestamp, event_type string"
    df = spark.createDataFrame(rows, schema)
    expected = sorted(
        (r.user_id, r.converted_at, r.lag1_us, r.lag2_us)
        for r in streaming_funnel_conversions(df).collect()
    )
    assert [u for u, *_ in expected] == ["alice"]
    got = sorted(
        (r.user_id, r.converted_at, r.lag1_us, r.lag2_us)
        for r in _run_stream(
            spark, tmp_path, df,
            streaming_funnel_conversions,
            "funnel_nullts", "event_id", 3,
        )
    )
    assert got == expected, (
        "streaming funnel diverged from batch on NULL-ts input (NaT "
        "int64-min garbage) or on a string user key"
    )


def test_streaming_sessions_string_keys(spark, tmp_path):
    from radar_output_restructure_spark.streaming.windows import (
        session_windows,
    )

    rows = [
        (0, "dev-a", _ts(1)),
        (1, "dev-a", _ts(2)),
        (2, "dev-a", _ts(59)),  # closes the first session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    got = _run_stream(
        spark, tmp_path, df,
        lambda s: session_windows(s, gap_s=1800),
        "sess_str", "event_id", 1,
    )
    assert [(r.user_id, r.n_events) for r in got] == [("dev-a", 2)]


# ---------------------------------------------------------------------------
# 6. late cross-batch event extends the open session's start
# ---------------------------------------------------------------------------


def test_late_event_extends_open_session_start(spark, tmp_path):
    from radar_output_restructure_spark.streaming.windows import (
        session_windows,
    )

    rows = [
        (0, 1, _ts(10)),
        (1, 1, _ts(11)),
        # -- second micro-batch: LATE event 5 min before the open start,
        #    then a far-future event that closes the session --
        (2, 1, _ts(5)),
        (3, 1, _ts(59)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = _run_stream(
        spark, tmp_path, df,
        lambda s: session_windows(s, gap_s=600),
        "sess_late", "event_id", 1,
    )
    closed = [r for r in got if r.n_events == 3]
    assert closed, got
    assert closed[0].session_start == _ts(5), (
        "a late absorbed event must extend session_start downward — the "
        "(start, end, n) envelope otherwise misreports the absorbed events"
    )
