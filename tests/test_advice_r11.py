"""Regression tests for the round-10 ADVICE findings (fixed in round 11).

1. path format (medium): a param repeated across segments (e.g.
   '${projectId}/backup-${projectId}/${topic}/${filename}') must produce
   DISTINCT partition columns — the old code reused pf_projectId for both
   and withColumn silently replaced the first segment's rendering with the
   second's, corrupting the output tree
   (plans/path_format.PathFormat.partition_columns).
2. CSV dedup fast path: a truncated/short line in an existing target must
   not raise IndexError when distinct columns index past its fields
   (sinks/writers._dedup_csv_content).
3. streaming lock keeper: the renew-error grace window is measured from the
   ACQUIRE timestamp, not keeper-thread start — stream construction can eat
   most of a short TTL before the keeper runs
   (streaming/stream_restructure._keep_and_release).
4. operators/text._marker_hits dead code is deleted (lang_scores uses the
   single-alternation split).
5. orphaned '+tmp-<uuid>' staging dirs from crashed runs are swept by the
   next successful write_output_tree (sinks/writers._sweep_orphan_stage_dirs).
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from radar_output_restructure_spark.sinks.writers import (
    _dedup_csv_content,
    _sweep_orphan_stage_dirs,
)
from radar_output_restructure_spark.streaming.stream_restructure import (
    _keep_and_release,
)


# ---------------------------------------------------------------------------
# 1. repeated params across path segments
# ---------------------------------------------------------------------------


def _df(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [("P1", "u1", "s1", 1580216400.0)],
        "projectId string, userId string, sourceId string, t double",
    ).select(
        F.struct("projectId", "userId", "sourceId").alias("key"),
        F.struct(F.col("t").alias("time")).alias("value"),
        F.lit("t").alias("topic"),
    )


def _event_time(df):
    from pyspark.sql import functions as F

    return F.timestamp_seconds(F.col("value.time"))


@pytest.mark.parametrize(
    "fmt",
    [
        "${projectId}/backup-${projectId}/${topic}/${filename}",
        "${projectId}/${projectId}/${topic}/${filename}",
    ],
)
def test_repeated_param_segments_get_distinct_columns(spark, fmt):
    from radar_output_restructure_spark.plans.path_format import PathFormat

    pf = PathFormat(fmt=fmt, extension=".csv")
    df = _df(spark)
    with_cols, names = pf.partition_columns(df, _event_time(df))
    assert len(names) == len(set(names)), f"colliding partition names: {names}"
    row = with_cols.select(*names).first()
    rendered = list(row)[:-1]  # drop the time-bin column
    expected_first_two = (
        ["P1", "backup-P1"] if "backup" in fmt else ["P1", "P1"]
    )
    assert rendered == expected_first_two + ["t"], rendered
    # first occurrence keeps the param-derived name the writers reference
    assert names[0] == "pf_projectId"
    assert "pf_topic" in names


# ---------------------------------------------------------------------------
# 2. CSV dedup fast path: short line must not IndexError
# ---------------------------------------------------------------------------


def test_dedup_csv_fast_path_tolerates_short_line():
    old = b"a,b,c\n1,2,3\n1\n"  # truncated second record
    new = b"1,2,9\n"
    out = _dedup_csv_content(old, new, distinct=["a", "c"], ignore=None)
    lines = out.decode().splitlines()
    assert lines[0] == "a,b,c"
    # key(1,3) then key(1,'') then key(1,9): all distinct, keep-last order
    assert lines[1:] == ["1,2,3", "1", "1,2,9"]
    # and a short line that COLLIDES on the padded key deduplicates keep-last
    out2 = _dedup_csv_content(b"a,b,c\n1\n", b"1,2,\n", ["a", "c"], None)
    assert out2.decode().splitlines()[1:] == ["1,2,"]


# ---------------------------------------------------------------------------
# 3. keeper grace window measured from acquire time
# ---------------------------------------------------------------------------


class _FakeQuery:
    def __init__(self):
        self._done = threading.Event()
        self.stopped = False

    def awaitTermination(self, timeout):
        return self._done.wait(timeout)

    def stop(self):
        self.stopped = True
        self._done.set()


class _FakeLock:
    def __init__(self, renew_results):
        self._results = list(renew_results)
        self.events: list[str] = []

    def renew(self):
        self.events.append("renew")
        r = self._results.pop(0) if self._results else True
        if isinstance(r, Exception):
            raise r
        return r

    def close(self):
        self.events.append("close")


def test_keeper_grace_window_starts_at_acquire_time():
    """With the lease stamped one full TTL ago (slow stream construction)
    and renew erroring, the keeper must treat the lease as lost IMMEDIATELY
    — not trust it for a further TTL measured from thread start."""
    query = _FakeQuery()
    lock = _FakeLock([IOError("503")] * 10)
    order: list[str] = []
    real_stop, real_close = query.stop, lock.close
    query.stop = lambda: (order.append("stop"), real_stop())[1]
    lock.close = lambda: (order.append("close"), real_close())[1]
    acquired_at = time.monotonic() - 1.2  # lease older than the 0.9 s TTL
    t = threading.Thread(
        target=_keep_and_release,
        args=(query, lock, 0.9, acquired_at),
        daemon=True,
    )
    start = time.monotonic()
    t.start()
    t.join(timeout=5)
    assert not t.is_alive()
    # the old bug waited a further full TTL (~0.9 s of 0.1 s-retries) before
    # giving up; from-acquire accounting stops on the FIRST failed renew
    assert time.monotonic() - start < 0.8
    assert order == ["stop", "close"]
    assert lock.events.count("renew") == 1


def test_keeper_fresh_acquire_still_tolerates_transient_error():
    query = _FakeQuery()
    lock = _FakeLock([IOError("503"), True])
    t = threading.Thread(
        target=_keep_and_release,
        args=(query, lock, 0.9, time.monotonic()),
        daemon=True,
    )
    t.start()
    time.sleep(0.6)  # error retry is ~0.1 s; recovery renew happens fast
    assert not query.stopped
    assert "close" not in lock.events
    query._done.set()
    t.join(timeout=5)
    assert lock.events[-1] == "close"


# ---------------------------------------------------------------------------
# 4. dead _marker_hits removed
# ---------------------------------------------------------------------------


def test_marker_hits_dead_code_removed():
    from radar_output_restructure_spark.operators import text

    assert not hasattr(text, "_marker_hits")


# ---------------------------------------------------------------------------
# 5. orphan staging-dir sweep
# ---------------------------------------------------------------------------


def test_sweep_orphan_stage_dirs(tmp_path):
    from radar_output_restructure_spark.sinks.storage import (
        LocalTargetStorage,
    )
    from radar_output_restructure_spark.sinks.writers import (
        _STAGE_ORPHAN_MAX_AGE_MS,
    )

    out = tmp_path / "out"
    out.mkdir()
    old_ms = int(time.time() * 1000) - _STAGE_ORPHAN_MAX_AGE_MS - 60_000

    stale = tmp_path / "out+tmp-deadbeef0001"
    stale.mkdir()
    (stale / "part-0000.csv").write_text("x")
    os.utime(stale / "part-0000.csv", (old_ms / 1000, old_ms / 1000))

    stale_empty = tmp_path / "out+tmp-deadbeef0002"
    stale_empty.mkdir()
    os.utime(stale_empty, (old_ms / 1000, old_ms / 1000))

    live = tmp_path / "out+tmp-cafecafe0003"
    live.mkdir()
    (live / "part-0000.csv").write_text("y")  # fresh mtime: a LIVE run

    unrelated = tmp_path / "other+tmp-feedfeed0004"
    unrelated.mkdir()
    os.utime(unrelated, (old_ms / 1000, old_ms / 1000))

    swept = _sweep_orphan_stage_dirs(str(out), LocalTargetStorage())
    assert sorted(os.path.basename(p) for p in swept) == [
        "out+tmp-deadbeef0001",
        "out+tmp-deadbeef0002",
    ]
    assert not stale.exists() and not stale_empty.exists()
    assert live.exists(), "a live run's fresh stage must never be swept"
    assert unrelated.exists(), "only THIS out_dir's staging siblings are swept"


def test_write_output_tree_sweeps_orphans(spark, tmp_path):
    from radar_output_restructure_spark.sinks.writers import (
        _STAGE_ORPHAN_MAX_AGE_MS,
        write_output_tree,
    )

    out = str(tmp_path / "out")
    orphan = tmp_path / "out+tmp-000000000bad"
    orphan.mkdir(parents=True)
    (orphan / "part-junk.csv").write_text("junk")
    old_s = time.time() - _STAGE_ORPHAN_MAX_AGE_MS / 1000 - 60
    os.utime(orphan / "part-junk.csv", (old_s, old_s))

    df = spark.createDataFrame(
        [("p", "t", "20200101_0000", "v")],
        "pf_p string, pf_topic string, pf_bin string, v string",
    )
    finals = write_output_tree(
        df, out, ["pf_p", "pf_topic", "pf_bin"], fmt="csv"
    )
    assert len(finals) == 1 and os.path.exists(finals[0])
    assert not orphan.exists(), "successful write must sweep crashed stages"
