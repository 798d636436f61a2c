"""Regression tests for the round-11 /code-review pass over sources/
(avro_io, kafka_tree, storage_index).

1. Jar-less avro decode accepts files whose schemas differ only in
   NON-structural avro attributes (doc/namespace/defaults): the raw-JSON
   comparison crashed a fingerprint group the Spark-typed canon had
   legitimately merged, permanently stalling the topic.
2. Nullable long columns survive the pandas hand-off exactly: default
   inference coerced [None, 2^53+1] to float64, silently corrupting ids.
3. exclude_topics prunes the NATIVE scan driver-side: a post-scan row
   filter still scanned the excluded (schema-drifted) topic's files.
4. A new topic/partition directory under a dirs-only parent is discovered
   by the incremental update on the empty-rescan cadence, not only by the
   hourly full sync.
5. The per-directory cursor cache invalidates on remove(), so a
   remove-then-add at equal set size cannot serve a stale cursor.
"""

from __future__ import annotations

import os

import pytest

from radar_output_restructure_spark.sinks.storage import LocalTargetStorage
from radar_output_restructure_spark.sources import avro_io
from radar_output_restructure_spark.sources.kafka_tree import read_topic_tree
from radar_output_restructure_spark.sources.storage_index import (
    StorageIndexManager,
)


LONG_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": ["null", "long"]},
        {"name": "tag", "type": "string"},
    ],
}

# same structure, different non-structural metadata (doc + field default)
LONG_SCHEMA_DOCUMENTED = {
    "type": "record",
    "name": "r",
    "doc": "added by a later writer version",
    "fields": [
        {"name": "id", "type": ["null", "long"], "default": None},
        {"name": "tag", "type": "string", "doc": "a tag"},
    ],
}


def _write(input_dir, topic, part, off, schema, records):
    d = os.path.join(input_dir, topic, f"partition={part}")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{topic}+{part}+{off}+{off}.avro")
    return avro_io.write_container(path, schema, records)


def test_python_avro_accepts_nonstructural_schema_drift(spark, tmp_path):
    input_dir = str(tmp_path)
    _write(input_dir, "t", 0, 0, LONG_SCHEMA, [{"id": 1, "tag": "a"}])
    _write(
        input_dir, "t", 0, 1, LONG_SCHEMA_DOCUMENTED, [{"id": 2, "tag": "b"}]
    )
    df = read_topic_tree(spark, input_dir, topic="t", file_format="avro")
    assert {r["id"] for r in df.select("id").collect()} == {1, 2}


def test_python_avro_rejects_structural_schema_drift(spark, tmp_path):
    input_dir = str(tmp_path)
    _write(input_dir, "t", 0, 0, LONG_SCHEMA, [{"id": 1, "tag": "a"}])
    drifted = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "other", "type": "int"}],
    }
    _write(input_dir, "t", 0, 1, drifted, [{"other": 5}])
    df = read_topic_tree(spark, input_dir, topic="t", file_format="avro")
    with pytest.raises(Exception, match="differs from the probe"):
        df.collect()


def test_python_avro_nullable_long_exact_above_2_53(spark, tmp_path):
    input_dir = str(tmp_path)
    big = 9007199254740993  # 2^53 + 1: float64 rounds it to ...992
    _write(
        input_dir, "t", 0, 0, LONG_SCHEMA,
        [{"id": None, "tag": "null-row"}, {"id": big, "tag": "big"}],
    )
    rows = {
        r["tag"]: r["id"]
        for r in read_topic_tree(
            spark, input_dir, topic="t", file_format="avro"
        ).collect()
    }
    assert rows["big"] == big, "nullable long corrupted via float64 inference"
    assert rows["null-row"] is None


def test_exclude_topics_prunes_native_scan(spark, tmp_path):
    import glob
    import shutil

    input_dir = str(tmp_path)
    good = spark.createDataFrame([(1, "a")], "id long, tag string")
    # drifted topic: same column name, INCOMPATIBLE type — a post-scan
    # filter still reads these files and fails (or null-fills)
    bad = spark.createDataFrame([(("x",), "b")], "id struct<s:string>, tag string")
    for topic, df in (("t_good", good), ("t_drifted", bad)):
        stage = os.path.join(input_dir, "+stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        d = os.path.join(input_dir, topic, "partition=0")
        os.makedirs(d)
        shutil.move(part, os.path.join(d, f"{topic}+0+0+0.parquet"))
        shutil.rmtree(stage)
    out = read_topic_tree(
        spark, input_dir, file_format="parquet", exclude_topics={"t_drifted"}
    )
    rows = out.select("id", "topic").collect()
    assert [(r["id"], r["topic"]) for r in rows] == [(1, "t_good")]


class _Clock:
    def __init__(self, t0=1000.0):
        self.t = t0

    def __call__(self):
        return self.t


def _touch(*paths):
    for p in paths:
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as fh:
            fh.write("x")


def test_new_topic_dir_discovered_incrementally(tmp_path):
    root = str(tmp_path / "in")
    _touch(os.path.join(root, "t1", "partition=0", "t1+0+0000000001+0000000002.avro"))
    clock = _Clock()
    idx = StorageIndexManager(
        LocalTargetStorage(), root, rescan_s=3600, rescan_empty_s=900,
        clock=clock,
    )
    idx.update()  # initial full sync
    # a NEW topic and a NEW partition dir arrive after the sync
    _touch(
        os.path.join(root, "t2", "partition=0", "t2+0+0000000001+0000000002.avro"),
        os.path.join(root, "t1", "partition=1", "t1+1+0000000001+0000000002.avro"),
    )
    clock.t += 901  # cross the EMPTY cadence, stay well under the full sync
    idx.update()
    found = {p for p, _m, _s in idx.file_status_under(root)}
    assert any("t2+0" in p for p in found), (
        "new topic under the dirs-only root invisible until full sync"
    )
    clock.t += 901  # the new partition dir was discovered last tick; its
    idx.update()  # files index on the next empty-cadence tick
    found = {p for p, _m, _s in idx.file_status_under(root)}
    assert any("partition=1" in p for p in found), (
        "new partition dir under a topic invisible until full sync"
    )


def test_cursor_cache_invalidates_on_remove(tmp_path):
    root = str(tmp_path / "in")
    d = os.path.join(root, "t", "partition=0")
    f1 = os.path.join(d, "t+0+0000000001+0000000002.avro")
    f2 = os.path.join(d, "t+0+0000000003+0000000004.avro")
    _touch(f1, f2)
    clock = _Clock()
    idx = StorageIndexManager(
        LocalTargetStorage(), root, rescan_s=3600, rescan_empty_s=900,
        clock=clock,
    )
    idx.update()
    # remove the LAST file (the cursor), then add an earlier-sorting one:
    # set size is back to 2 — a size-keyed cache must not reuse the stale
    # cursor f2 and skip the new arrival
    idx.remove(f2)
    os.remove(f2)
    f_new = os.path.join(d, "t+0+0000000002+0000000002.avro")
    _touch(f_new)
    clock.t += 1
    idx.update()
    found = {p for p, _m, _s in idx.file_status_under(root)}
    assert f_new in found


def test_cleaner_delete_updates_index(spark, tmp_path):
    """SourceDataCleaner.run_topic removes deleted sources from the live
    storage index instead of leaving stale paths until the full sync."""
    from radar_output_restructure_spark.plans.restructure import (
        RestructureConfig,
        RestructurePlan,
    )

    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    from tests.test_restructure_e2e import SERVER_STATUS_SCHEMA, _write_fixture
    from pyspark.sql import Row

    # two files: the newest committed offset per partition is never removed,
    # so only the first is a delete candidate
    _write_fixture(
        spark, input_dir, "t",
        [Row(key=Row(projectId="p", userId="u", sourceId="s"),
             value=Row(time=60.0, serverStatus="A", ipAddress=None))],
        0, 0, 0, SERVER_STATUS_SCHEMA,
    )
    _write_fixture(
        spark, input_dir, "t",
        [Row(key=Row(projectId="p", userId="u", sourceId="s"),
             value=Row(time=120.0, serverStatus="B", ipAddress=None))],
        0, 1, 1, SERVER_STATUS_SCHEMA,
    )
    cfg = RestructureConfig(
        input_dir=input_dir, output_dir=output_dir, use_storage_index=True
    )
    plan = RestructurePlan(spark, cfg)
    plan.run()
    assert plan.storage_index.file_status_under(input_dir)

    from radar_output_restructure_spark.plans.cleaner import (
        CleanerConfig,
        SourceDataCleaner,
    )

    cleaner = SourceDataCleaner(
        spark, cfg, CleanerConfig(age_days=0.0), plan=plan
    )
    out = cleaner.run()["t"]
    assert out["deleted"], "cleaner should delete the extracted source"
    stale = [
        p
        for p, _m, _s in plan.storage_index.file_status_under(input_dir)
        if p in set(out["deleted"])
    ]
    assert not stale, "deleted sources must leave the live index immediately"
