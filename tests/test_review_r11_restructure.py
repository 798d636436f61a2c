"""Regression tests for the round-11 /code-review pass over
plans/restructure.py (+ the BucketFormat/cleaner contracts it fixed).

1. An `${mp:...}` bucket format works end-to-end: BucketFormat.attach does
   its own broadcast join (bucket.column on the unjoined frame raised
   AnalysisException — the whole mp-bucket branch was dead).
2. A BucketFormat carrying its OWN time_bin_format is not clobbered by the
   plan's configured bin format.
3. The cleaner's verification transform (keep_cols=('source_file',)) keeps
   the SAME dedup survivors as the writer's under ignore_fields dedup —
   source_file must not join the implicit key.
4. run() isolates per-topic failures (log-and-continue, reference
   RestructureWorker semantics) instead of aborting the cycle.
5. lock_dir is pinned absolute like input/output dirs: a relative lock dir
   resolved per-process would never contend across replicas.
6. max_files_per_topic truncates in Kafka-OFFSET order, not path-lexicographic
   order ('+10' sorts before '+9' lexicographically).
7. The no-stored-schema value_schema fallback excludes the derived 'topic'
   path-metadata column from the avro sidecar.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import Row

from radar_output_restructure_spark.plans.path_format import BucketFormat
from radar_output_restructure_spark.plans.restructure import (
    DedupConfig,
    RestructureConfig,
    RestructurePlan,
)
from tests.test_restructure_e2e import (
    SERVER_STATUS_SCHEMA,
    _write_fixture,
)


def _mk_rows(*vals):
    return [
        Row(
            key=Row(projectId="p", userId="u", sourceId="s"),
            value=Row(time=t, serverStatus=st, ipAddress=ip),
        )
        for t, st, ip in vals
    ]


# ---------------------------------------------------------------------------
# 1. mp bucket end-to-end
# ---------------------------------------------------------------------------


def test_mp_bucket_format_routes_output(spark, tmp_path):
    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_fixture(
        spark, input_dir, "t", _mk_rows((60.0, "A", None)), 0, 0, 0,
        SERVER_STATUS_SCHEMA,
    )
    mp_dim = spark.createDataFrame(
        [("p", "u", "org1")], "projectId string, userId string, organization string"
    )
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=output_dir,
        bucket=BucketFormat(fmt="bkt-${mp:organization}"),
        mp_dim=mp_dim,
    )
    finals = RestructurePlan(spark, cfg).run()["t"]
    rel = [os.path.relpath(f, output_dir) for f in finals]
    assert rel == ["bkt-org1/p/u/t/19700101_0000.csv"]


# ---------------------------------------------------------------------------
# 2. bucket's own bin format wins
# ---------------------------------------------------------------------------


def test_bucket_own_time_bin_format_not_clobbered(spark, tmp_path):
    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_fixture(
        spark, input_dir, "t", _mk_rows((60.0, "A", None)), 0, 0, 0,
        SERVER_STATUS_SCHEMA,
    )
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=output_dir,
        bucket=BucketFormat(fmt="arch-${filename}", time_bin_format="yyyyMM"),
    )
    finals = RestructurePlan(spark, cfg).run()["t"]
    rel = [os.path.relpath(f, output_dir) for f in finals]
    # bucket segment renders MONTHLY (its own format); the file keeps the
    # plan's hourly bin
    assert rel == ["arch-197001/p/u/t/19700101_0000.csv"]


# ---------------------------------------------------------------------------
# 3. cleaner-vs-writer dedup survivor parity under ignore_fields
# ---------------------------------------------------------------------------


def test_transform_keep_cols_do_not_change_dedup_survivors(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    # two files, identical record except the ignored ipAddress; keep-last
    # must collapse them to ONE survivor in both the writer's transform and
    # the cleaner's keep_cols=('source_file',) transform
    _write_fixture(
        spark, input_dir, "t", _mk_rows((60.0, "A", "ip-1")), 0, 0, 0,
        SERVER_STATUS_SCHEMA,
    )
    _write_fixture(
        spark, input_dir, "t", _mk_rows((60.0, "A", "ip-2")), 0, 1, 1,
        SERVER_STATUS_SCHEMA,
    )
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=str(tmp_path / "out"),
        dedup=DedupConfig(enable=True, ignore_fields=["value.ipAddress"]),
    )
    plan = RestructurePlan(spark, cfg)
    files = plan.list_candidate_files("t")
    frames = list(plan.attempt_frames("t", files))
    assert len(frames) == 1
    _a, _sup, df, _files = frames[0]
    writer_flat, _ = plan.transform(df, "t")
    cleaner_flat, _ = plan.transform(df, "t", keep_cols=("source_file",))
    assert writer_flat.count() == 1
    assert cleaner_flat.count() == 1, (
        "source_file leaked into the implicit dedup key: the cleaner would "
        "expect rows the writer never wrote and revoke the file forever"
    )
    # and the cleaner's survivor is the same record the writer kept
    w = writer_flat.select("`value.ipAddress`").first()[0]
    c = cleaner_flat.select("`value.ipAddress`").first()[0]
    assert w == c == "ip-2"  # keep-LAST in offset order


# ---------------------------------------------------------------------------
# 4. per-topic error isolation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_threads", [1, 2])
def test_run_isolates_per_topic_failures(spark, tmp_path, num_threads):
    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    for topic in ("t_bad", "t_good"):
        _write_fixture(
            spark, input_dir, topic, _mk_rows((60.0, "A", None)), 0, 0, 0,
            SERVER_STATUS_SCHEMA,
        )
    cfg = RestructureConfig(
        input_dir=input_dir, output_dir=output_dir, num_threads=num_threads
    )
    plan = RestructurePlan(spark, cfg)
    real = plan.run_topic

    def failing(topic):
        if topic == "t_bad":
            raise IOError("transient object-store error")
        return real(topic)

    plan.run_topic = failing
    out = plan.run()
    assert out["t_bad"] == []
    assert len(out["t_good"]) == 1, "healthy topics must still process"
    assert isinstance(plan.last_errors["t_bad"], IOError)


# ---------------------------------------------------------------------------
# 5. lock_dir pinned absolute
# ---------------------------------------------------------------------------


def test_lock_dir_pinned_absolute(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = RestructureConfig(input_dir="in", output_dir="out", lock_dir="locks")
    assert os.path.isabs(cfg.lock_dir)
    assert cfg.lock_dir == str(tmp_path / "locks")
    # schemes pass through
    cfg2 = RestructureConfig(
        input_dir="in", output_dir="out", lock_dir="s3://bucket/locks"
    )
    assert cfg2.lock_dir == "s3://bucket/locks"


# ---------------------------------------------------------------------------
# 6. offset-ordered truncation
# ---------------------------------------------------------------------------


def test_max_files_truncates_in_offset_order(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    _write_fixture(
        spark, input_dir, "t", _mk_rows((60.0, "A", None)), 0, 9, 9,
        SERVER_STATUS_SCHEMA,
    )
    _write_fixture(
        spark, input_dir, "t", _mk_rows((120.0, "B", None)), 0, 10, 10,
        SERVER_STATUS_SCHEMA,
    )
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=str(tmp_path / "out"),
        max_files_per_topic=1,
    )
    plan = RestructurePlan(spark, cfg)
    picked = plan.list_candidate_files("t")
    assert len(picked) == 1
    assert "+0+9+9" in picked[0].path, (
        "lexicographic order puts offset 10 before 9; truncation must use "
        "Kafka offset order"
    )


# ---------------------------------------------------------------------------
# 7. sidecar schema fallback excludes path metadata
# ---------------------------------------------------------------------------


def test_sidecar_fallback_schema_has_no_topic_field(spark, tmp_path):
    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_fixture(
        spark, input_dir, "t", _mk_rows((60.0, "A", None)), 0, 0, 0,
        SERVER_STATUS_SCHEMA,
    )
    plan = RestructurePlan(
        spark, RestructureConfig(input_dir=input_dir, output_dir=output_dir)
    )
    real = plan._fingerprint_groups
    # simulate a legacy flat attempts registry: no stored superset schema
    plan._fingerprint_groups = lambda topic, files: [
        (a, None, g) for a, _s, g in real(topic, files)
    ]
    plan.run_topic("t")
    sidecars = glob.glob(
        os.path.join(output_dir, "**", "schema-*.json"), recursive=True
    )
    assert sidecars
    names = {
        f["name"]
        for f in json.load(open(sidecars[0]))["fields"]
    }
    assert "topic" not in names, (
        "derived path-metadata 'topic' column leaked into the avro sidecar"
    )
