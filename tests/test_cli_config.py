"""YAML config loader + CLI entry tests (reference restructure.yml shape,
Application.kt lifecycle)."""

from __future__ import annotations

import os

from radar_output_restructure_spark.config import load_config

SAMPLE_YAML = """
service:
  enable: false
  interval: 30
compression:
  type: gzip
format:
  type: csv
  deduplication:
    enable: true
    distinctFields: [key.sourceId, value.time]
  excludeFields: [value.ipAddress]
worker:
  enable: true
  numThreads: 2
  maxFilesPerTopic: 7
  minimumFileAge: 0
cleaner:
  enable: true
  interval: 1260
  age: 3
paths:
  inputs: [/testIn]
  output: /out
  bucket:
    format: radar-${projectId}
    disabledFormats: [".*-disabled"]
    defaultName: radar-default
  properties:
    format: ${projectId}/${userId}/${topic}/${filename}
    timeBinFormat: yyyyMMdd_HH'00'
topics:
  skip_me:
    exclude: true
  special:
    pathProperties:
      format: ${projectId}/${userId}/${topic}/${value:serverStatus}/${filename}
    deduplication:
      enable: false
    excludeFields: [value.debug]
redis:
  uri: redis://ignored:6379
"""


def test_load_reference_shaped_yaml(tmp_path):
    p = tmp_path / "restructure.yml"
    p.write_text(SAMPLE_YAML)
    cfg = load_config(str(p))
    assert cfg.inputs == ["/testIn"]
    r = cfg.restructure
    assert r.output_dir == "/out"
    assert r.output_format == "csv" and r.compression == "gzip"
    assert r.dedup.enable and r.dedup.distinct_fields == ["key.sourceId", "value.time"]
    assert r.exclude_fields == {"value.ipAddress"}
    assert r.max_files_per_topic == 7 and r.minimum_file_age_s == 0
    assert r.topics["skip_me"].exclude
    sp = r.topics["special"]
    assert sp.path_format.endswith("${value:serverStatus}/${filename}")
    assert sp.dedup is not None and not sp.dedup.enable
    assert sp.exclude_fields == {"value.debug"}
    assert cfg.cleaner.age_days == 3
    assert cfg.service.cleaner_enable and cfg.service.cleaner_interval_s == 1260
    assert not cfg.service.enable and cfg.service.interval_s == 30
    assert r.bucket is not None
    assert r.bucket.fmt == "radar-${projectId}"
    assert r.bucket.disabled_formats == [".*-disabled"]
    assert r.bucket.default_name == "radar-default"


def test_cli_end_to_end(tmp_path, spark):
    """`python -m` main() against a fixture tree (single batch run)."""
    from pyspark.sql import Row

    from radar_output_restructure_spark import __main__ as cli
    from tests.test_restructure_e2e import SERVER_STATUS_SCHEMA, _write_fixture

    input_dir, output_dir = str(tmp_path / "in"), str(tmp_path / "out")
    rows = [
        Row(key=Row(projectId="p", userId="u", sourceId="s"),
            value=Row(time=3600.0, serverStatus="CONNECTED", ipAddress="10.0.0.1"))
    ]
    _write_fixture(spark, input_dir, "t", rows, 0, 0, 0, SERVER_STATUS_SCHEMA)
    cfgfile = tmp_path / "c.yml"
    cfgfile.write_text(
        f"""
format:
  type: csv
worker:
  minimumFileAge: 0
paths:
  inputs: [{input_dir}]
  output: {output_dir}
"""
    )
    # main() creates its own session via getOrCreate -> reuses the test one,
    # but must not stop it (other tests need it); guard with a no-op stop.
    stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = cli.main([str(cfgfile)])
    finally:
        spark.stop = stop
    assert rc == 0
    target = os.path.join(output_dir, "p", "u", "t", "19700101_0100.csv")
    assert os.path.exists(target)


def test_end_offset_tags_and_lock_prefix_mapping(tmp_path):
    """source.s3.endOffsetFromTags -> S8 opt-in; redis.lockPrefix -> T5
    lock directory (the reference's lock key prefix reinterpreted as the
    shared lock dir; redis.uri itself is a documented dropped concept)."""
    from radar_output_restructure_spark.config import load_config

    cfg_file = tmp_path / "restructure.yml"
    cfg_file.write_text(
        """
paths:
  inputs: [/data/in]
  output: /data/out
source:
  s3:
    endOffsetFromTags: true
redis:
  uri: redis://localhost:6379
  lockPrefix: /data/locks
"""
    )
    cfg = load_config(str(cfg_file))
    assert cfg.restructure.end_offset_from_tags is True
    assert cfg.restructure.lock_dir == "/data/locks"

    plain = tmp_path / "plain.yml"
    plain.write_text("paths:\n  output: /data/out\n")
    cfg2 = load_config(str(plain))
    assert cfg2.restructure.end_offset_from_tags is False
    assert cfg2.restructure.lock_dir is None


def test_storage_index_yaml_mapping(tmp_path):
    """source.index (reference config/StorageIndexConfig.kt, README:140-143)
    enables the S9 incremental listing index with the reference's interval
    keys; absence keeps the plain re-walking listing."""
    from radar_output_restructure_spark.config import load_config

    cfg_file = tmp_path / "restructure.yml"
    cfg_file.write_text(
        """
paths:
  inputs: [/data/in]
  output: /data/out
source:
  index:
    fullSyncInterval: 1800
    emptyDirectorySyncInterval: 300
"""
    )
    cfg = load_config(str(cfg_file))
    assert cfg.restructure.use_storage_index is True
    assert cfg.restructure.index_rescan_s == 1800.0
    assert cfg.restructure.index_rescan_empty_s == 300.0

    plain = tmp_path / "plain.yml"
    plain.write_text("paths:\n  output: /data/out\n")
    assert load_config(str(plain)).restructure.use_storage_index is False


def test_plugin_factory_loaded_from_yaml(tmp_path, spark, monkeypatch):
    """U1/U5 plugin loading (reference PathConfig.createFactory +
    Plugin#init): paths.factory names a Python callable that receives the
    properties dict and returns `${param}` resolvers; paths.pathParams maps
    single params to resolvers. Both end up as working path segments."""
    import sys

    from pyspark.sql import functions as F  # noqa: F401

    from radar_output_restructure_spark.config import load_config
    from radar_output_restructure_spark.plans.path_format import PathFormat

    plug_dir = tmp_path / "plugmods"
    plug_dir.mkdir()
    (plug_dir / "my_path_plugin.py").write_text(
        "from pyspark.sql import functions as F\n"
        "def build(props):\n"
        "    site = props.get('site', 'fallback')\n"
        "    return {'site': lambda df, ts: F.lit(site)}\n"
        "def shard(df, ts):\n"
        "    return (F.col('key.userId').cast('string'))\n"
    )
    monkeypatch.syspath_prepend(str(plug_dir))
    sys.modules.pop("my_path_plugin", None)

    cfg_file = tmp_path / "restructure.yml"
    cfg_file.write_text(
        """
paths:
  output: /data/out
  factory: my_path_plugin:build
  pathParams:
    shard: my_path_plugin.shard
  properties:
    format: "${projectId}/${site}/${shard}/${topic}/${filename}"
    site: lab-7
"""
    )
    cfg = load_config(str(cfg_file))
    assert set(cfg.restructure.path_params) == {"site", "shard"}

    # the loaded resolvers compile and evaluate inside the path DSL
    pf = PathFormat(
        fmt="${projectId}/${site}/${shard}/${topic}/${filename}",
        custom_params=cfg.restructure.path_params,
    )
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(key=Row(projectId="p", userId="u9", sourceId="s"), topic="t")]
    )
    out = pf.apply(df, event_ts=F.lit(0).cast("timestamp")).collect()[0]
    assert out.output_path.startswith("p/lab-7/u9/t/")


def test_compression_none_case_insensitive(tmp_path):
    """YAML `type: NONE` must mean no compression, not the literal codec
    string "none" (a KeyError at write time)."""
    p = tmp_path / "c.yml"
    p.write_text(
        "paths:\n  inputs: [/in]\n  output: /out\n"
        "compression:\n  type: NONE\n"
    )
    assert load_config(str(p)).restructure.compression is None
    p.write_text(
        "paths:\n  inputs: [/in]\n  output: /out\n"
        "compression:\n  type: GZIP\n"
    )
    assert load_config(str(p)).restructure.compression == "gzip"


def test_mp_properties_wired_from_paths_properties(tmp_path):
    """The reference MP plugin's documented channel: managementPortalUrl
    (+ client id/secret) inside paths.properties must reach
    RestructureConfig.mp_properties, or every ${mp:...} format crashes at
    transform time with 'no mp_dim DataFrame supplied'."""
    p = tmp_path / "c.yml"
    p.write_text(
        "paths:\n"
        "  inputs: [/in]\n"
        "  output: /out\n"
        "  properties:\n"
        "    format: ${projectId}/${mp:organization}/${topic}/${filename}\n"
        "    managementPortalUrl: http://mp.example\n"
        "    managementPortalClientId: cid\n"
        "    managementPortalClientSecret: sec\n"
    )
    cfg = load_config(str(p)).restructure
    assert cfg.mp_properties is not None
    assert cfg.mp_properties["managementPortalUrl"] == "http://mp.example"
    # and absence keeps it None
    p.write_text("paths:\n  inputs: [/in]\n  output: /out\n")
    assert load_config(str(p)).restructure.mp_properties is None
