"""JSON-lines sink (nesting preserved, keep-first dedup, excludeFields
pruning — SURVEY S11/P3/D4) and zip compression (S13) through the public
RestructurePlan API. Models JsonAvroConverterTest.kt:43-80 and
CompressionFactoryTest round-trips."""

from __future__ import annotations

import gzip
import json
import os
import zipfile

from pyspark.sql import Row

from radar_output_restructure_spark.plans.restructure import (
    DedupConfig,
    RestructureConfig,
    RestructurePlan,
)
from tests.test_restructure_e2e import SERVER_STATUS_SCHEMA, _write_fixture


ROWS = [
    Row(
        key=Row(projectId="p1", userId="u1", sourceId="s1"),
        value=Row(time=3600.0, serverStatus="CONNECTED", ipAddress="10.0.0.1"),
    ),
    Row(
        key=Row(projectId="p1", userId="u1", sourceId="s1"),
        value=Row(time=3601.0, serverStatus="DISCONNECTED", ipAddress=None),
    ),
    # exact duplicate of row 0 -> keep-FIRST drops it in JSON mode
    Row(
        key=Row(projectId="p1", userId="u1", sourceId="s1"),
        value=Row(time=3600.0, serverStatus="CONNECTED", ipAddress="10.0.0.1"),
    ),
]


def _run(spark, tmp_path, **cfg_kw):
    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_fixture(spark, input_dir, "t", ROWS, 0, 0, 2, SERVER_STATUS_SCHEMA)
    cfg = RestructureConfig(input_dir=input_dir, output_dir=output_dir, **cfg_kw)
    return RestructurePlan(spark, cfg).run()["t"]


def test_json_lines_nested_with_nulls(spark, tmp_path):
    finals = _run(spark, tmp_path, output_format="json")
    assert [os.path.basename(f) for f in finals] == ["19700101_0100.json"]
    lines = open(finals[0]).read().splitlines()
    assert len(lines) == 3
    rec = json.loads(lines[0])
    # nesting preserved, field order = schema order, null explicit
    assert rec == {
        "key": {"projectId": "p1", "userId": "u1", "sourceId": "s1"},
        "value": {"time": 3600.0, "serverStatus": "CONNECTED", "ipAddress": "10.0.0.1"},
    }
    assert json.loads(lines[1])["value"]["ipAddress"] is None
    assert '"ipAddress":null' in lines[1]


def test_json_dedup_keep_first(spark, tmp_path):
    finals = _run(
        spark, tmp_path, output_format="json", dedup=DedupConfig(enable=True)
    )
    lines = open(finals[0]).read().splitlines()
    assert len(lines) == 2  # duplicate line dropped, first occurrence kept
    assert json.loads(lines[0])["value"]["serverStatus"] == "CONNECTED"
    assert json.loads(lines[1])["value"]["serverStatus"] == "DISCONNECTED"


def test_json_exclude_fields_nested_prune(spark, tmp_path):
    finals = _run(
        spark,
        tmp_path,
        output_format="json",
        exclude_fields={"value.ipAddress", "key.sourceId"},
    )
    rec = json.loads(open(finals[0]).read().splitlines()[0])
    assert "ipAddress" not in rec["value"]
    assert "sourceId" not in rec["key"]
    assert rec["value"]["serverStatus"] == "CONNECTED"


def test_gzip_csv_roundtrip_and_append(spark, tmp_path):
    finals = _run(spark, tmp_path, compression="gzip")
    assert finals[0].endswith("19700101_0100.csv.gz")
    body = gzip.open(finals[0]).read().decode().splitlines()
    assert body[0].startswith("key.projectId")
    assert len(body) == 4  # header + 3 rows


def test_zip_csv_single_entry_archive(spark, tmp_path):
    finals = _run(spark, tmp_path, compression="zip")
    assert finals[0].endswith("19700101_0100.csv.zip")
    with zipfile.ZipFile(finals[0]) as zf:
        names = zf.namelist()
        assert names == ["19700101_0100.csv"]  # single entry, archive name base
        body = zf.read(names[0]).decode().splitlines()
    assert len(body) == 4 and body[0].startswith("key.projectId")


def test_zip_json_append_across_runs(spark, tmp_path):
    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_fixture(spark, input_dir, "t", ROWS[:1], 0, 0, 0, SERVER_STATUS_SCHEMA)
    cfg = RestructureConfig(
        input_dir=input_dir, output_dir=output_dir, output_format="json",
        compression="zip",
    )
    RestructurePlan(spark, cfg).run()
    _write_fixture(spark, input_dir, "t", ROWS[1:2], 0, 1, 1, SERVER_STATUS_SCHEMA)
    finals = RestructurePlan(spark, cfg).run()["t"]
    with zipfile.ZipFile(finals[0]) as zf:
        body = zf.read(zf.namelist()[0]).decode().splitlines()
    assert len(body) == 2  # old content kept, new row appended


def test_legacy_partitionby_writer_paths(spark, tmp_path):
    """The alternative native-writer path (partitionBy + finalize) stays
    correct: exact names, header, append across two invocations."""
    from pyspark.sql import functions as F

    from radar_output_restructure_spark.sinks.writers import write_output_tree

    df = spark.createDataFrame(
        [("p", "u", "t", "19700101_0100", 1, "a"), ("p", "u", "t", "19700101_0100", 2, "b")],
        "pf_p string, pf_u string, pf_topic string, pf_bin string, __pos long, v string",
    )
    out = str(tmp_path / "out")
    finals = write_output_tree(
        df, out, ["pf_p", "pf_u", "pf_topic", "pf_bin"], fmt="csv", order_col="__pos"
    )
    assert [os.path.relpath(f, out) for f in finals] == ["p/u/t/19700101_0100.csv"]
    assert open(finals[0]).read().splitlines() == ["v", "a", "b"]
    # second invocation appends without duplicating the header
    write_output_tree(
        df.withColumn("v", F.upper("v")), out,
        ["pf_p", "pf_u", "pf_topic", "pf_bin"], fmt="csv", order_col="__pos",
    )
    assert open(finals[0]).read().splitlines() == ["v", "a", "b", "A", "B"]


def test_finalize_unescapes_hive_partition_values(spark, tmp_path):
    """partitionBy Hive-escapes special chars in directory names (':' ->
    '%3A', '%' -> '%25'); finalize must undo that so output names carry
    the RAW partition values, exactly like the direct writer (and like the
    cleaner's expectation paths, which are built from the column values)."""
    from radar_output_restructure_spark.sinks.writers import write_output_tree

    df = spark.createDataFrame(
        [("p", "u 1", "t", "12:30_50%", 1, "a")],
        "pf_p string, pf_u string, pf_topic string, pf_bin string, __pos long, v string",
    )
    out = str(tmp_path / "out")
    finals = write_output_tree(
        df, out, ["pf_p", "pf_u", "pf_topic", "pf_bin"], fmt="csv", order_col="__pos"
    )
    assert [os.path.relpath(f, out) for f in finals] == [
        "p/u 1/t/12:30_50%.csv"
    ]
    assert open(finals[0]).read().splitlines() == ["v", "a"]


def test_hadoop_target_storage_roundtrip(spark, tmp_path):
    """HadoopTargetStorage against the local FileSystem (file:// scheme) —
    the same code path serves s3a:// / abfs:// through Hadoop config."""
    from radar_output_restructure_spark.sinks.storage import HadoopTargetStorage

    st = HadoopTargetStorage(spark)
    root = str(tmp_path / "hstore")
    st.makedirs(root + "/sub")
    p = root + "/sub/a.txt"
    assert not st.exists(p)
    st.store_atomic(p, b"hello\x00world")
    assert st.exists(p)
    assert st.read(p) == b"hello\x00world"
    st.store_atomic(p, b"replaced")  # overwrite-rename path
    assert st.read(p) == b"replaced"
    files = st.walk_files(root)
    assert len(files) == 1 and files[0].endswith("/sub/a.txt")
    st.delete(root)
    assert not st.exists(p)
    assert st.walk_files(root) == []


def test_hadoop_storage_streaming_writer_and_error_discard(spark, tmp_path):
    """store_atomic_writer on the Hadoop backend (file:// = the rename-atomic
    branch): streamed chunks publish atomically; an exception mid-write
    leaves the previous content intact and no tmp litter. Completes the
    backend matrix next to the Local and S3 variants of this test."""
    import os as _os

    import pytest as _pytest

    from radar_output_restructure_spark.sinks.storage import HadoopTargetStorage

    st = HadoopTargetStorage(spark)
    root = str(tmp_path / "hstream")
    st.makedirs(root)
    p = root + "/f.bin"
    with st.store_atomic_writer(p) as fh:
        fh.write(b"part1-")
        fh.write(b"part2")
    assert st.read(p) == b"part1-part2"
    # chunked read round-trip
    assert b"".join(st.open_read_chunks(p, 4)) == b"part1-part2"
    with _pytest.raises(RuntimeError):
        with st.store_atomic_writer(p) as fh:
            fh.write(b"partial")
            raise RuntimeError("mid-write crash")
    assert st.read(p) == b"part1-part2"
    # no tmp litter (Hadoop's local FS adds .crc checksum sidecars — fine)
    visible = [n for n in _os.listdir(root) if not n.startswith(".")]
    assert visible == ["f.bin"]


def test_write_output_tree_with_hadoop_storage(spark, tmp_path):
    """The native-writer finalize runs through a driver-side Hadoop storage
    backend (the object-store path, exercised here on file://)."""
    from pyspark.sql import Row

    from radar_output_restructure_spark.sinks.storage import HadoopTargetStorage
    from radar_output_restructure_spark.sinks.writers import write_output_tree

    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [Row(pf_p="p", pf_u="u", pf_topic="t", pf_bin="19700101_0100",
             a=str(i), __pos=i) for i in range(5)]
    )
    finals = write_output_tree(
        df, out, ["pf_p", "pf_u", "pf_topic", "pf_bin"], fmt="csv",
        order_col="__pos", storage=HadoopTargetStorage(spark),
    )
    assert len(finals) == 1
    lines = open(finals[0]).read().splitlines()
    assert lines[0] == "a" and lines[1:] == ["0", "1", "2", "3", "4"]


def test_direct_writer_rejects_driver_only_storage(spark, tmp_path):
    import pytest as _pytest

    from radar_output_restructure_spark.sinks.storage import HadoopTargetStorage
    from radar_output_restructure_spark.sinks.writers import (
        write_output_tree_direct,
    )

    df = spark.range(1).selectExpr("'x' as pf_bin", "cast(id as string) as a")
    with _pytest.raises(ValueError, match="executor_safe"):
        write_output_tree_direct(
            df, str(tmp_path), ["pf_bin"], storage=HadoopTargetStorage(spark)
        )


def test_parquet_sink_typed_roundtrip(spark, tmp_path):
    """Parquet output (beyond-reference typed sink): exact-named
    .parquet files in the same tree, columns TYPED (double/string, not
    rendered strings), dotted names preserved, sidecar written, rerun
    no-op."""
    finals = _run(spark, tmp_path, output_format="parquet")
    assert [os.path.basename(f) for f in finals] == ["19700101_0100.parquet"]
    back = spark.read.parquet(finals[0])
    assert set(back.columns) == {
        "key.projectId", "key.userId", "key.sourceId",
        "value.time", "value.serverStatus", "value.ipAddress",
    }
    assert dict(back.dtypes)["`value.time`".strip("`")] == "double"
    rows = sorted(
        back.select("`value.time`", "`value.serverStatus`").collect()
    )
    assert [tuple(r) for r in rows] == [
        (3600.0, "CONNECTED"),
        (3600.0, "CONNECTED"),
        (3601.0, "DISCONNECTED"),
    ]
    out_dir = os.path.dirname(finals[0])
    assert os.path.exists(os.path.join(out_dir, "schema-t.json"))
    # rerun: manifest makes it a no-op
    cfg = RestructureConfig(
        input_dir=str(tmp_path / "in"),
        output_dir=str(tmp_path / "out"),
        output_format="parquet",
    )
    assert RestructurePlan(spark, cfg).run()["t"] == []


def test_parquet_sink_append_across_runs(spark, tmp_path):
    """Late data appends into the existing parquet bin by row-group merge:
    total rows grow, the file stays one valid parquet object."""
    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_fixture(
        spark, input_dir, "t", ROWS[:2], 0, 0, 1, SERVER_STATUS_SCHEMA
    )
    cfg = RestructureConfig(
        input_dir=input_dir, output_dir=output_dir, output_format="parquet"
    )
    finals = RestructurePlan(spark, cfg).run()["t"]
    assert spark.read.parquet(finals[0]).count() == 2
    late = [
        Row(
            key=Row(projectId="p1", userId="u1", sourceId="s1"),
            value=Row(time=3650.0, serverStatus="UNKNOWN", ipAddress=None),
        )
    ]
    _write_fixture(
        spark, input_dir, "t", late, 0, 2, 2, SERVER_STATUS_SCHEMA
    )
    finals2 = RestructurePlan(spark, cfg).run()["t"]
    assert finals2 == finals
    back = spark.read.parquet(finals[0])
    assert back.count() == 3
    assert (
        back.filter(back["`value.serverStatus`"] == "UNKNOWN").count() == 1
    )


def test_parquet_rejects_zip(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="parquet codec"):
        _run(spark, tmp_path, output_format="parquet", compression="zip")


def test_csv_line_sql_matches_column_quote_minimal(spark):
    """The writer's one-string SQL line renderer (b6b365c) must stay
    bit-identical to the Column-algebra QUOTE_MINIMAL form it replaced:
    quote iff the cell contains ',', '\"', CR or LF; quotes double inside;
    NULL renders as the empty cell."""
    from pyspark.sql import functions as F

    vals = [
        "plain", 'has"quote', "has,comma", "has\nnewline", "has\rcr",
        "", None, 'mix,"\n\rall', "`tick`", "tab\there", 'a,b"c\nd',
    ]
    name = "key.we`ird"
    df = spark.createDataFrame([(v,) for v in vals], "c string").withColumnRenamed(
        "c", name
    )
    cellc = F.coalesce(F.col(f"`{name.replace('`', '``')}`"), F.lit(""))
    needs = (
        cellc.contains(",") | cellc.contains('"')
        | cellc.contains("\n") | cellc.contains("\r")
    )
    old = F.when(
        needs,
        F.concat(F.lit('"'), F.replace(cellc, F.lit('"'), F.lit('""')), F.lit('"')),
    ).otherwise(cellc)
    q = name.replace("`", "``")
    cell = f"coalesce(`{q}`, '')"
    needs_sql = (
        f"contains({cell}, ',') OR contains({cell}, '\"') "
        f"OR contains({cell}, '\\n') OR contains({cell}, '\\r')"
    )
    quoted = f"concat('\"', replace({cell}, '\"', '\"\"'), '\"')"
    sql = f"CASE WHEN {needs_sql} THEN {quoted} ELSE {cell} END"
    rows = df.select(old.alias("o"), F.expr(sql).alias("n")).collect()
    assert all(r.o == r.n for r in rows), [
        (r.o, r.n) for r in rows if r.o != r.n
    ]
