"""Native S3 backend (VERDICT r2 item 3): the six-method TargetStorage
contract over a real S3 API (moto server mode — a separate HTTP endpoint,
so pickled storage instances in executor worker PROCESSES hit it too,
exactly like a real bucket). Skip-marked when boto3/moto are absent.

The headline test runs `write_output_tree_direct` end-to-end against the
bucket: exact-name objects PUT from executor tasks with no driver-side
finalize pass — the reference's per-file overwrite-PUT model
(target/S3TargetStorage.kt:47-154)."""

from __future__ import annotations

import gzip
import zipfile

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from radar_output_restructure_spark.sinks.s3_storage import (  # noqa: E402
    S3TargetStorage,
    parse_s3_url,
)

BUCKET = "test-output"


@pytest.fixture(scope="module")
def s3_endpoint():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    boto3.client(
        "s3",
        endpoint_url=endpoint,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
        region_name="us-east-1",
    ).create_bucket(Bucket=BUCKET)
    yield endpoint
    server.stop()


@pytest.fixture
def storage(s3_endpoint):
    return S3TargetStorage(
        endpoint_url=s3_endpoint,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
        region_name="us-east-1",
    )


def _url(key: str) -> str:
    return f"s3://{BUCKET}/{key}"


def test_parse_s3_url():
    assert parse_s3_url("s3://b/a/c.txt") == ("b", "a/c.txt")
    assert parse_s3_url("s3a://b/x") == ("b", "x")
    assert parse_s3_url("s3://b") == ("b", "")
    with pytest.raises(ValueError):
        parse_s3_url("file:///tmp/x")


def test_six_method_contract(storage):
    p = _url("contract/sub/a.txt")
    assert not storage.exists(p)
    storage.store_atomic(p, b"hello\x00world")
    assert storage.exists(p)
    assert storage.read(p) == b"hello\x00world"
    storage.store_atomic(p, b"replaced")  # overwrite PUT
    assert storage.read(p) == b"replaced"
    storage.store_atomic(_url("contract/sub2/b.txt"), b"bb")
    files = storage.walk_files(_url("contract"))
    assert sorted(files) == [_url("contract/sub/a.txt"), _url("contract/sub2/b.txt")]
    status = storage.walk_file_status(_url("contract"))
    assert {(f, s) for f, _m, s in status} == {
        (_url("contract/sub/a.txt"), 8),
        (_url("contract/sub2/b.txt"), 2),
    }
    assert storage.list_dirs(_url("contract")) == ["sub", "sub2"]
    assert storage.mtime_ms(p) > 0
    storage.delete(p)  # single object
    assert not storage.exists(p)
    storage.delete(_url("contract"))  # prefix delete
    assert storage.walk_files(_url("contract")) == []


def test_streaming_read_and_ranged_seek(storage):
    p = _url("stream/data.bin")
    body = bytes(range(256)) * 4096  # 1 MiB
    storage.store_atomic(p, body)
    assert b"".join(storage.open_read_chunks(p, 64 << 10)) == body
    with storage.open_seekable(p) as fh:
        fh.seek(-16, 2)
        assert fh.read() == body[-16:]
        fh.seek(1000)
        assert fh.read(8) == body[1000:1008]


def test_store_atomic_writer_discards_on_error(storage):
    p = _url("atomic/f.bin")
    storage.store_atomic(p, b"published")
    with pytest.raises(RuntimeError):
        with storage.store_atomic_writer(p) as fh:
            fh.write(b"partial")
            raise RuntimeError("mid-write crash")
    assert storage.read(p) == b"published"  # old object intact, no partial


def test_store_payload_append_modes_on_s3(storage):
    from radar_output_restructure_spark.sinks.writers import _store_payload

    plain = _url("append/f.csv")
    _store_payload(plain, b"a,b\n1,2\n", None, storage)
    _store_payload(plain, b"3,4\n", None, storage)
    assert storage.read(plain) == b"a,b\n1,2\n3,4\n"

    gz = _url("append/f.csv.gz")
    _store_payload(gz, b"x\n", "gzip", storage)
    _store_payload(gz, b"y\n", "gzip", storage)
    assert gzip.decompress(storage.read(gz)) == b"x\ny\n"

    zp = _url("append/f.csv.zip")
    _store_payload(zp, b"x\n", "zip", storage)
    _store_payload(zp, b"y\n", "zip", storage)
    import io

    with zipfile.ZipFile(io.BytesIO(storage.read(zp))) as zf:
        assert zf.namelist() == ["f.csv"]
        assert zf.read("f.csv") == b"x\ny\n"


def test_direct_writer_end_to_end_on_s3(spark, storage):
    """The direct exact-name writer PUTs final objects straight from
    executor worker processes (storage pickles; client rebuilt per process).
    No finalize pass, no local filesystem involvement."""
    from pyspark.sql import Row

    from radar_output_restructure_spark.sinks.writers import (
        write_output_tree_direct,
    )

    rows = [
        Row(pf_p="p1", pf_u=f"u{i % 2}", pf_topic="t", pf_bin="19700101_0100",
            a=str(i), __pos=i)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows).repartition(4)
    finals = write_output_tree_direct(
        df,
        _url("direct/out"),
        ["pf_p", "pf_u", "pf_topic", "pf_bin"],
        fmt="csv",
        order_col="__pos",
        storage=storage,
    )
    assert finals == [
        _url("direct/out/p1/u0/t/19700101_0100.csv"),
        _url("direct/out/p1/u1/t/19700101_0100.csv"),
    ]
    u0 = storage.read(finals[0]).decode().splitlines()
    assert u0 == ["a", "0", "2", "4"]
    # append run: a second write appends below the existing header
    write_output_tree_direct(
        df, _url("direct/out"), ["pf_p", "pf_u", "pf_topic", "pf_bin"],
        fmt="csv", order_col="__pos", storage=storage,
    )
    u0 = storage.read(finals[0]).decode().splitlines()
    assert u0 == ["a", "0", "2", "4", "0", "2", "4"]


def test_restructure_pipeline_to_s3_target(spark, tmp_path, storage):
    """Full RestructurePlan run with a local Kafka-tree source and an
    s3:// output root: the plan routes through the executor-safe backend
    end-to-end (listing, ledger, data objects, sidecars)."""
    from radar_output_restructure_spark.plans.restructure import (
        RestructureConfig,
        RestructurePlan,
    )
    from tests.test_restructure_e2e import (
        ROWS_P0,
        SERVER_STATUS_SCHEMA,
        _write_fixture,
    )

    input_dir = str(tmp_path / "in")
    _write_fixture(
        spark, input_dir, "srv", ROWS_P0, 0, 0, 1, SERVER_STATUS_SCHEMA
    )
    out_root = _url("pipeline/output")
    cfg = RestructureConfig(input_dir=input_dir, output_dir=out_root)
    finals = RestructurePlan(spark, cfg, target_storage=storage).run()["srv"]
    assert finals and all(f.startswith(out_root) for f in finals)
    body = storage.read(finals[0]).decode()
    assert body.startswith("key.projectId,")
    sidecars = [
        f for f in storage.walk_files(out_root) if "schema-srv.json" in f
    ]
    assert sidecars, "schema sidecar missing on S3 target"


def test_s3_kwargs_from_hadoop_conf(spark):
    """fs.s3a.* translation: existing s3a deployments keep endpoint/account."""
    from radar_output_restructure_spark.sinks.s3_storage import (
        s3_kwargs_from_hadoop_conf,
    )

    conf = spark._jsc.hadoopConfiguration()
    keys = {
        "fs.s3a.endpoint": "minio.local:9000",
        "fs.s3a.connection.ssl.enabled": "false",
        "fs.s3a.access.key": "AK",
        "fs.s3a.secret.key": "SK",
        "fs.s3a.path.style.access": "true",
        "fs.s3a.endpoint.region": "eu-west-1",
    }
    old = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        kwargs, path_style, translatable = s3_kwargs_from_hadoop_conf(spark)
        assert kwargs["endpoint_url"] == "http://minio.local:9000"
        assert kwargs["aws_access_key_id"] == "AK"
        assert kwargs["aws_secret_access_key"] == "SK"
        assert kwargs["region_name"] == "eu-west-1"
        assert path_style and translatable

        conf.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider",
        )
        _kw, _ps, translatable = s3_kwargs_from_hadoop_conf(spark)
        assert not translatable  # exotic provider -> stay on Hadoop connector
    finally:
        conf.unset("fs.s3a.aws.credentials.provider")
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_list_entries_start_after_pushdown(storage):
    """S9: list_entries is ONE non-recursive LIST with server-side
    StartAfter — the request shape the incremental storage index issues
    per poll (reference source/StorageIndexManager.kt:55-64)."""
    base = "idx/t/partition=0"
    for name in ("t+0+0+9.parquet", "t+0+10+19.parquet", "t+0+20+29.parquet"):
        storage.store_atomic(_url(f"{base}/{name}"), b"x")
    storage.store_atomic(_url("idx/t/partition=1/t+1+0+9.parquet"), b"x")

    dirs, files = storage.list_entries(_url("idx/t"))
    assert dirs == ["partition=0", "partition=1"] and files == []

    dirs, files = storage.list_entries(_url(base))
    assert dirs == [] and [f[0] for f in files] == [
        "t+0+0+9.parquet",
        "t+0+10+19.parquet",
        "t+0+20+29.parquet",
    ]
    assert all(m > 0 and s == 1 for _n, m, s in files)

    _dirs, files = storage.list_entries(_url(base), start_after="t+0+10+19.parquet")
    assert [f[0] for f in files] == ["t+0+20+29.parquet"]

    _dirs, files = storage.list_entries(_url(base), start_after="t+0+20+29.parquet")
    assert files == []


def test_storage_index_over_s3(storage):
    """The full incremental index driving a real S3 listing API."""
    from radar_output_restructure_spark.sources.storage_index import (
        StorageIndexManager,
    )

    root = _url("idxmgr")
    storage.store_atomic(f"{root}/t/partition=0/t+0+0+9.parquet", b"x")
    idx = StorageIndexManager(storage, root)
    idx.update()
    assert [p.rsplit("/", 1)[-1] for p, _m, _s in idx.file_status_under(root)] == [
        "t+0+0+9.parquet"
    ]
    storage.store_atomic(f"{root}/t/partition=0/t+0+10+19.parquet", b"x")
    idx.update()  # steady state: cursor listing picks up the new object
    assert sorted(
        p.rsplit("/", 1)[-1] for p, _m, _s in idx.file_status_under(root)
    ) == ["t+0+0+9.parquet", "t+0+10+19.parquet"]


def test_object_tags_end_offset(storage):
    """S8: `endOffset` object tag lookup (source/S3SourceStorage.kt:65-90).
    Files uploaded by the Kafka S3 sink without `+to` in the name carry the
    range end as a tag; the migration/coverage path reads it via
    object_tags."""
    p = _url("tags/t+0+100.parquet")
    storage.store_atomic(p, b"x")
    assert storage.object_tags(p) == {}
    bucket, key = parse_s3_url(p)
    storage.client.put_object_tagging(
        Bucket=bucket,
        Key=key,
        Tagging={"TagSet": [{"Key": "endOffset", "Value": "199"}]},
    )
    assert storage.object_tags(p) == {"endOffset": "199"}
