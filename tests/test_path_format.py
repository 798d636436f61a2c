"""Path-format DSL tests (SURVEY G1-G7, U4): plugin segments, per-topic
overrides, mp broadcast enrichment, custom resolvers, validation errors.
Models path/PathFormatterTest.kt:40-152 and FormattedPathFactoryTest.kt."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from radar_output_restructure_spark.functions.timeutil import event_time
from radar_output_restructure_spark.plans.path_format import PathFormat
from radar_output_restructure_spark.plans.restructure import (
    RestructureConfig,
    RestructurePlan,
    TopicConfig,
)
from tests.test_restructure_e2e import SERVER_STATUS_SCHEMA, _write_fixture


def _df(spark):
    return spark.createDataFrame(
        [
            Row(
                key=Row(projectId="P 1!", userId="u/1", sourceId="s#1"),
                value=Row(time=1580219820.03, serverStatus="CONNECTED", ipAddress=None),
                topic="t",
            )
        ],
        SERVER_STATUS_SCHEMA + ", topic string",
    )


def test_default_format_segments(spark):
    df = _df(spark)
    out = PathFormat(extension=".csv").apply(df, event_time(df)).first()
    # sanitize removes [^a-zA-Z0-9_-]; 1580219820.03 -> 2020-01-28T13 UTC
    assert out.output_path == "P1/u1/t/20200128_1300.csv"


def test_time_value_plugins_and_bucket_style_format(spark):
    df = _df(spark)
    fmt = PathFormat(
        fmt="${time:yyyyMM}/${value:serverStatus}/${topic}/${filename}",
        extension=".csv",
    )
    out = fmt.apply(df, event_time(df)).first()
    assert out.output_path == "202001/CONNECTED/t/20200128_1300.csv"


def test_key_plugin_case_insensitive(spark):
    df = _df(spark)
    fmt = PathFormat(fmt="${key:SOURCEID}/${topic}/${filename}", extension="")
    out = fmt.apply(df, event_time(df)).first()
    assert out.output_path == "s1/t/20200128_1300"


def test_mp_dimension_broadcast_join(spark):
    df = _df(spark)
    mp = spark.createDataFrame(
        [("P 1!", "u/1", "org-a", "EXT-9")],
        "projectId string, userId string, organization string, externalId string",
    )
    fmt = PathFormat(
        fmt="${mp:organization}/${mp:externalId}/${topic}/${filename}",
        extension="",
        mp_dim=mp,
    )
    out = fmt.apply(df, event_time(df)).first()
    assert out.output_path == "org-a/EXT-9/t/20200128_1300"


def test_mp_missing_subject_defaults_unknown(spark):
    df = _df(spark)
    mp = spark.createDataFrame(
        [("other", "other", "org-b")],
        "projectId string, userId string, organization string",
    )
    fmt = PathFormat(fmt="${mp:organization}/${topic}/${filename}", extension="", mp_dim=mp)
    assert fmt.apply(df, event_time(df)).first().output_path.startswith("unknown/")


def test_custom_param_plugin(spark):
    df = _df(spark)
    fmt = PathFormat(
        fmt="${shard}/${topic}/${filename}",
        extension="",
        custom_params={"shard": lambda d, ts: F.crc32(F.col("key.userId")) % 4},
    )
    out = fmt.apply(df, event_time(df)).first()
    shard, rest = out.output_path.split("/", 1)
    assert shard.isdigit() and rest == "t/20200128_1300"


def test_format_validation_errors():
    with pytest.raises(ValueError, match="topic"):
        PathFormat(fmt="${projectId}/${filename}")
    with pytest.raises(ValueError, match="filename"):
        PathFormat(fmt="${projectId}/${topic}")


def test_per_topic_path_override_in_pipeline(spark, tmp_path):
    """G7: one topic routes by ${value:serverStatus}, the default elsewhere
    (the reference integration test's two-topic scenario)."""
    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        Row(
            key=Row(projectId="p", userId="u", sourceId="s"),
            value=Row(time=3600.0, serverStatus=st, ipAddress=None),
        )
        for st in ("CONNECTED", "DISCONNECTED")
    ]
    _write_fixture(spark, input_dir, "status", rows, 0, 0, 1, SERVER_STATUS_SCHEMA)
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=output_dir,
        topics={
            "status": TopicConfig(
                path_format="${projectId}/${userId}/${topic}/${value:serverStatus}/${filename}"
            )
        },
    )
    finals = RestructurePlan(spark, cfg).run()["status"]
    rel = sorted(os.path.relpath(f, output_dir) for f in finals)
    assert rel == [
        "p/u/status/CONNECTED/19700101_0100.csv",
        "p/u/status/DISCONNECTED/19700101_0100.csv",
    ]


def test_mp_and_custom_segments_sanitized(spark):
    """External dimension values must never contribute path separators."""
    df = _df(spark)
    mp = spark.createDataFrame(
        [("P 1!", "u/1", "../escape/org")],
        "projectId string, userId string, organization string",
    )
    fmt = PathFormat(fmt="${mp:organization}/${topic}/${filename}", extension="", mp_dim=mp)
    out = fmt.apply(df, event_time(df)).first()
    assert out.output_path == "escapeorg/t/20200128_1300"
    fmt2 = PathFormat(
        fmt="${evil}/${topic}/${filename}", extension="",
        custom_params={"evil": lambda d, ts: F.lit("../../x")},
    )
    assert fmt2.apply(df, event_time(df)).first().output_path == "x/t/20200128_1300"


def test_bucket_format_template_literals_and_params(spark):
    from radar_output_restructure_spark.plans.path_format import BucketFormat

    df = _df(spark)
    bf = BucketFormat(fmt="radar-${projectId}-out")
    row = df.select(bf.column(df, event_time(df)).alias("b")).first()
    assert row.b == "radar-P1-out"  # literal text survives, param sanitized


def test_bucket_format_disabled_regex_falls_back(spark):
    from radar_output_restructure_spark.plans.path_format import BucketFormat

    df = _df(spark)
    bf = BucketFormat(
        fmt="radar-${projectId}-out",
        disabled_formats=["RADAR-P1-.*", "other"],
        default_name="default-bucket",
    )
    row = df.select(bf.column(df, event_time(df)).alias("b")).first()
    # case-insensitive FULL match (Kotlin Regex.matches + IGNORE_CASE)
    assert row.b == "default-bucket"
    bf2 = BucketFormat(
        fmt="radar-${projectId}-out",
        disabled_formats=["P1"],  # substring only -> NOT a full match
        default_name="default-bucket",
    )
    row2 = df.select(bf2.column(df, event_time(df)).alias("b")).first()
    assert row2.b == "radar-P1-out"


def test_bucket_format_constant_no_params(spark):
    from radar_output_restructure_spark.plans.path_format import BucketFormat

    df = _df(spark)
    bf = BucketFormat()  # default: fixed name, no substitutions
    row = df.select(bf.column(df, event_time(df)).alias("b")).first()
    assert row.b == "radar-output-storage"


def test_bucket_routes_pipeline_output(spark, tmp_path):
    from radar_output_restructure_spark.plans.path_format import BucketFormat

    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        Row(key=Row(projectId=p, userId="u", sourceId="s"),
            value=Row(time=3600.0, serverStatus="A", ipAddress=None))
        for p in ("alpha", "beta")
    ]
    _write_fixture(spark, input_dir, "t", rows, 0, 0, 1, SERVER_STATUS_SCHEMA)
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=output_dir,
        bucket=BucketFormat(
            fmt="bkt-${projectId}",
            disabled_formats=["bkt-beta"],
            default_name="fallback",
        ),
    )
    finals = RestructurePlan(spark, cfg).run()["t"]
    rel = sorted(os.path.relpath(f, output_dir) for f in finals)
    assert rel == [
        "bkt-alpha/alpha/u/t/19700101_0100.csv",
        "fallback/beta/u/t/19700101_0100.csv",
    ]


def test_literals_inside_segments_survive(spark):
    """The reference's PathFormatter renders literal text verbatim —
    `${userId}-${sourceId}` keeps the dash, a constant `staging` segment
    stays a directory. Dropping literals and joining bare params with '/'
    would silently rename every output path of a literal-bearing format."""
    df = _df(spark)
    fmt = PathFormat(
        fmt="staging/${projectId}/${userId}-${sourceId}/${topic}/${filename}",
        extension=".csv",
    )
    out = fmt.apply(df, event_time(df)).first()
    assert out.output_path == "staging/P1/u1-s1/t/20200128_1300.csv"

    with_cols, names = fmt.partition_columns(df, event_time(df))
    row = with_cols.select(*names).first()
    assert list(row) == ["staging", "P1", "u1-s1", "t", "20200128_1300"]
    # single-param segments keep their param-derived names (writers
    # reference pf_topic); mixed/literal segments get positional names
    assert "pf_topic" in names and "pf_projectId" in names


def test_literal_prefix_on_filename_segment(spark):
    df = _df(spark)
    fmt = PathFormat(
        fmt="${projectId}/${topic}/log-${filename}", extension=".csv"
    )
    _with, names = fmt.partition_columns(df, event_time(df))
    row = _with.select(names[-1]).first()
    assert row[0] == "log-20200128_1300"


def test_filename_must_be_last_segment():
    with pytest.raises(ValueError, match="LAST path segment"):
        PathFormat(fmt="${filename}/${topic}/${projectId}")


def test_bucket_format_receives_plan_params(spark, tmp_path):
    """A YAML-loaded bucket format using a registered ${param} (or
    ${mp:...}) must see the SAME resolvers the path format gets — config
    constructs BucketFormat bare, so the plan injects its param context."""
    from radar_output_restructure_spark.plans.path_format import BucketFormat
    from radar_output_restructure_spark.plans.restructure import (
        RestructureConfig,
        RestructurePlan,
    )
    from tests.test_restructure_e2e import SERVER_STATUS_SCHEMA, _write_fixture

    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        Row(key=Row(projectId="p1", userId="u", sourceId="s"),
            value=Row(time=3600.0, serverStatus="A", ipAddress=None))
    ]
    _write_fixture(spark, input_dir, "t", rows, 0, 0, 0, SERVER_STATUS_SCHEMA)
    cfg = RestructureConfig(
        input_dir=input_dir,
        output_dir=output_dir,
        bucket=BucketFormat(fmt="zone-${site}"),  # bare, like load_config
        path_params={"site": lambda df, ts: F.lit("eu-1")},
    )
    finals = RestructurePlan(spark, cfg).run()["t"]
    rel = [os.path.relpath(f, output_dir) for f in finals]
    assert rel == ["zone-eu-1/p1/u/t/19700101_0100.csv"]
