"""T4 legacy CSV offsets migration + S8 end-offset-from-tags hook
(reference accounting/AccountantImpl.kt:38-53,
accounting/OffsetFilePersistence.kt:38-77, source/S3SourceStorage.kt:65-90).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from radar_output_restructure_spark.plans.restructure import (
    RestructureConfig,
    RestructurePlan,
)
from radar_output_restructure_spark.sinks.storage import LocalTargetStorage
from radar_output_restructure_spark.sources.legacy_offsets import (
    OffsetRange,
    OffsetRangeSet,
    legacy_offsets_path,
    migrate_legacy_offsets,
    parse_legacy_offsets_csv,
)
from radar_output_restructure_spark.sources.manifest import (
    FileEntry,
    ProcessedFileManifest,
)

NOW = 1_700_000_000_000


def test_parse_csv_header_quotes_and_default_mtime():
    body = (
        "offsetFrom,offsetTo,partition,topic\n"
        '0,99,0,"t1",2024-01-02T03:04:05Z\n'
        "100,199,1,t1\n"
        "\n"
    )
    rows = parse_legacy_offsets_csv(body, NOW)
    assert rows[0] == OffsetRange("t1", 0, 0, 99, 1704164645000)
    # missing lastModified column -> "now" (reference parseLine default)
    assert rows[1] == OffsetRange("t1", 1, 100, 199, NOW)


def test_range_set_merges_adjacent_and_checks_mtime():
    s = OffsetRangeSet()
    s.add(OffsetRange("t", 0, 0, 49, 1000))
    s.add(OffsetRange("t", 0, 50, 99, 2000))  # adjacent -> one interval
    s.add(OffsetRange("t", 0, 200, 299, 1000))
    assert len(s) == 2
    assert s.contains("t", 0, 10, 80, 1500)  # spans the merged interval
    assert not s.contains("t", 0, 10, 80, 2500)  # modified after -> reprocess
    assert not s.contains("t", 0, 90, 210, 100)  # gap 100..199 not covered
    assert not s.contains("t", 1, 10, 80, 100)  # other partition
    assert s.contains("t", 0, 200, 299, 1000)  # boundary mtime inclusive


@pytest.fixture
def ledger(tmp_path):
    out = str(tmp_path / "out")
    storage = LocalTargetStorage()
    manifest = ProcessedFileManifest(os.path.join(out, "offsets"), storage)
    return out, storage, manifest


def _csv(storage, out, topic, body):
    p = legacy_offsets_path(out, topic)
    storage.makedirs(os.path.dirname(p))
    storage.store_atomic(p, body.encode())
    return p


def test_migrate_commits_covered_and_deletes_csv(ledger):
    out, storage, manifest = ledger
    p = _csv(
        storage, out, "t",
        "offsetFrom,offsetTo,partition,topic\n"
        "0,999,0,t,2024-06-01T00:00:00Z\n",
    )
    old_ms = 1_600_000_000_000  # before the range's lastModified
    new_ms = 1_800_000_000_000  # after -> must reprocess
    files = [
        FileEntry("/in/t/partition=0/t+0+0+499.parquet", old_ms),
        FileEntry("/in/t/partition=0/t+0+500+999.parquet", new_ms),
        FileEntry("/in/t/partition=0/t+0+1000+1499.parquet", old_ms),
    ]
    remaining = migrate_legacy_offsets(manifest, storage, out, "t", files)
    assert [f.path for f in remaining] == [files[1].path, files[2].path]
    assert not storage.exists(p)  # one-shot: CSV removed after merge
    # the covered file is now in the ledger -> future prunes skip it
    assert manifest.prune(files) == [files[1], files[2]]
    # second call is a no-op (CSV gone)
    assert migrate_legacy_offsets(manifest, storage, out, "t", files) == files


def test_migrate_without_csv_is_noop(ledger):
    out, storage, manifest = ledger
    files = [FileEntry("/in/t/partition=0/t+0+0+9.parquet", 1)]
    assert migrate_legacy_offsets(manifest, storage, out, "t", files) == files
    assert manifest.load() == {}


def test_open_ended_filename_uses_end_offset_hook(ledger):
    """S8: a file named without `+to` is only classifiable via the
    endOffset tag; without the hook it conservatively reprocesses."""
    out, storage, manifest = ledger
    _csv(
        storage, out, "t",
        "offsetFrom,offsetTo,partition,topic\n"
        "0,999,0,t,2024-06-01T00:00:00Z\n",
    )
    f = FileEntry("/in/t/partition=0/t+0+100.parquet", 1_600_000_000_000)
    assert migrate_legacy_offsets(manifest, storage, out, "t", [f]) == [f]

    _csv(
        storage, out, "t",
        "offsetFrom,offsetTo,partition,topic\n"
        "0,999,0,t,2024-06-01T00:00:00Z\n",
    )
    remaining = migrate_legacy_offsets(
        manifest, storage, out, "t", [f], end_offset=lambda path: 199
    )
    assert remaining == []
    assert manifest.prune([f]) == []


def test_unmappable_coverage_rewrites_csv_instead_of_deleting(ledger):
    """A `+to`-less file with no tag support can't consume its coverage, so
    the CSV keeps that partition's ranges for a later retry; coverage on
    other partitions is consumed and dropped (the reference deletes only
    after merging EVERY range into its accounting)."""
    out, storage, manifest = ledger
    p = _csv(
        storage, out, "t",
        "offsetFrom,offsetTo,partition,topic\n"
        "0,999,0,t,2024-06-01T00:00:00Z\n"
        "0,499,1,t,2024-06-01T00:00:00Z\n",
    )
    old_ms = 1_600_000_000_000
    open_ended = FileEntry("/in/t/partition=0/t+0+100.parquet", old_ms)
    covered = FileEntry("/in/t/partition=1/t+1+0+499.parquet", old_ms)
    remaining = migrate_legacy_offsets(
        manifest, storage, out, "t", [open_ended, covered]
    )
    assert remaining == [open_ended]  # conservative reprocess
    assert manifest.prune([covered]) == []  # partition-1 coverage consumed
    body = storage.read(p).decode()
    rows = parse_legacy_offsets_csv(body, NOW)
    assert rows == [OffsetRange("t", 0, 0, 999, 1717200000000)]  # p0 kept
    # retry with tags available: now classifiable, CSV finally deleted
    remaining = migrate_legacy_offsets(
        manifest, storage, out, "t", [open_ended], end_offset=lambda _p: 199
    )
    assert remaining == []
    assert not storage.exists(p)


def test_covered_young_file_keeps_coverage_despite_age_filter(spark, tmp_path):
    """P5 x T4: a legacy-covered file younger than minimumFileAge must still
    be classified (age only defers processing) — its coverage commits into
    the manifest instead of being discarded with the CSV, so a later run
    never re-extracts it (r4 ADVICE duplicate-append scenario)."""
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    row = lambda t, st: Row(  # noqa: E731
        key=Row(projectId="p", userId="u", sourceId="s"),
        value=Row(time=t, status=st),
    )
    _fixture_file(spark, input_dir, "t", [row(1580219820.0, "OLD")], 0, 0, 99)

    storage = LocalTargetStorage()
    _csv(
        storage, output_dir, "t",
        "offsetFrom,offsetTo,partition,topic\n"
        "0,99,0,t,2100-01-01T00:00:00Z\n",
    )
    young = RestructurePlan(
        spark,
        RestructureConfig(
            input_dir=input_dir,
            output_dir=output_dir,
            minimum_file_age_s=3600.0,  # the fixture (mtime=now) is too young
        ),
    )
    assert young.run()["t"] == []  # deferred by age...
    assert not storage.exists(legacy_offsets_path(output_dir, "t"))
    # ...but classified: once old enough, the file stays covered
    later = RestructurePlan(
        spark,
        RestructureConfig(input_dir=input_dir, output_dir=output_dir),
    )
    assert later.list_candidate_files("t") == []
    assert later.run()["t"] == []  # never re-extracted


SCHEMA = T.StructType(
    [
        T.StructField(
            "key",
            T.StructType(
                [
                    T.StructField("projectId", T.StringType()),
                    T.StructField("userId", T.StringType()),
                    T.StructField("sourceId", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "value",
            T.StructType(
                [
                    T.StructField("time", T.DoubleType()),
                    T.StructField("status", T.StringType()),
                ]
            ),
        ),
    ]
)


def _fixture_file(spark, input_dir, topic, rows, part, off_from, off_to):
    import glob as _glob
    import shutil as _shutil

    path = os.path.join(input_dir, topic, f"partition={part}")
    os.makedirs(path, exist_ok=True)
    df = spark.createDataFrame(rows, schema=SCHEMA)
    tmp = os.path.join(input_dir, "+tmp", f"{topic}-{part}-{off_from}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part_file = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    fname = os.path.join(path, f"{topic}+{part}+{off_from}+{off_to}.parquet")
    _shutil.move(part_file, fname)
    _shutil.rmtree(tmp)
    return fname


def test_restructure_plan_skips_legacy_covered_files(spark, tmp_path):
    """End-to-end: a legacy CSV covering partition 0 keeps its file out of
    the output; partition 1 (uncovered) processes normally."""
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    row = lambda t, st: Row(  # noqa: E731
        key=Row(projectId="p", userId="u", sourceId="s"),
        value=Row(time=t, status=st),
    )
    f0 = _fixture_file(
        spark, input_dir, "t", [row(1580219820.0, "OLD")], 0, 0, 99
    )
    _fixture_file(spark, input_dir, "t", [row(1580219821.0, "NEW")], 1, 0, 49)

    storage = LocalTargetStorage()
    # lastModified far in the future: the fixture file's real mtime (now) is
    # before it, so the range legitimately covers the file
    _csv(
        storage, output_dir, "t",
        "offsetFrom,offsetTo,partition,topic\n"
        "0,99,0,t,2100-01-01T00:00:00Z\n",
    )
    plan = RestructurePlan(
        spark, RestructureConfig(input_dir=input_dir, output_dir=output_dir)
    )
    written = plan.run()["t"]
    assert written, "uncovered partition-1 file must be processed"
    bodies = "".join(
        storage.read(p).decode() for p in written if p.endswith(".csv")
    )
    assert "NEW" in bodies and "OLD" not in bodies
    assert not storage.exists(legacy_offsets_path(output_dir, "t"))
    # covered file committed: a rerun lists nothing for partition 0
    assert plan.list_candidate_files("t") == []
    assert os.path.exists(f0)  # migration never deletes source data
