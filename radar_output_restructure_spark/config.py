"""YAML configuration loader accepting the reference's `restructure.yml`
shape (config/RestructureConfig.kt:60-65, restructure.yml in the reference
repo), so an existing deployment's config ports over unchanged where the
concept survives the engine swap:

* paths.inputs / paths.output         -> input dirs + output dir
* format.type / deduplication /
  excludeFields                       -> output_format, DedupConfig, excludes
* compression.type                    -> gzip | zip | None
* worker.maxFilesPerTopic /
  minimumFileAge / enable             -> listing limits
* worker.numThreads                   -> concurrent topic processing
* topics.<name>.*                     -> per-topic TopicConfig (exclude,
                                         excludeFromDelete, pathProperties.
                                         format, deduplication, excludeFields)
* paths.properties.format /
  timeBinFormat                       -> the `${...}` path DSL
* cleaner.enable / interval / age     -> CleanerConfig + service scheduling
* service.enable / interval           -> polling loop (streaming/service.py)
* source.s3.endOffsetFromTags /
  source.azure.endOffsetFromMetadata  -> end_offset_from_tags (S8)
* redis.lockPrefix                    -> lock_dir (T5: the key prefix maps to
                                         the shared lock DIRECTORY; the lock
                                         backend is O_EXCL files, not Redis)

Plugin loading (reference `paths: factory:` + `Plugin#init(properties)`,
config/PathConfig.kt createFactory, README.md:278-291): `paths.factory`
names a PYTHON callable by dotted path (`pkg.mod:attr` or `pkg.mod.attr`);
it is called with the `paths.properties` dict and returns a mapping of
`${param}` name -> resolver `(df, event_ts) -> Column`, merged into the
path DSL exactly like programmatic `path_params`. `paths.pathParams`
maps individual `${param}` names straight to resolver callables by dotted
path — the per-plugin form. Both run inside Catalyst like every built-in
segment (the Spark-first equivalent of a RecordPathFactory JAR).

Dropped concepts (documented, not errors): `redis.uri` (the file manifest
replaces Redis offsets; locks are lock files under redis.lockPrefix
reinterpreted as a directory), `worker.cacheSize`/`cacheOffsetsSize`
(Spark manages memory), `source.s3|azure` credentials (storage access is
Hadoop filesystem configuration — s3a:// / abfs:// URIs in paths.inputs).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from radar_output_restructure_spark.plans.cleaner import CleanerConfig
from radar_output_restructure_spark.plans.path_format import BucketFormat
from radar_output_restructure_spark.plans.restructure import (
    DedupConfig,
    RestructureConfig,
    TopicConfig,
)


@dataclass
class ServiceConfig:
    """config/ServiceConfig.kt + CleanerConfig.kt scheduling knobs."""

    enable: bool = False
    interval_s: float = 300.0
    cleaner_enable: bool = False
    cleaner_interval_s: float = 1260.0
    worker_enable: bool = True


@dataclass
class AppConfig:
    inputs: list[str] = field(default_factory=list)
    restructure: RestructureConfig = field(default_factory=RestructureConfig)
    cleaner: CleanerConfig = field(default_factory=CleanerConfig)
    service: ServiceConfig = field(default_factory=ServiceConfig)

    def for_input(self, input_dir: str) -> RestructureConfig:
        """The per-input plan config (the reference iterates inputs too)."""
        import copy

        cfg = copy.copy(self.restructure)
        cfg.input_dir = input_dir
        return cfg


def load_plugin(spec: str):
    """Resolve `pkg.mod:attr` (or `pkg.mod.attr`) to the named object —
    the Python analog of the reference's plugin-JAR class loading
    (config/PathConfig.kt createFactory)."""
    import importlib

    mod, _, attr = str(spec).partition(":")
    if not attr:
        mod, _, attr = str(spec).rpartition(".")
    if not mod:
        raise ValueError(f"plugin spec {spec!r} must name module and attribute")
    return getattr(importlib.import_module(mod), attr)


def _path_params(paths: dict, path_props: dict) -> dict:
    """U1/U5: `${param}` resolvers loaded from YAML. `paths.factory` is
    called with the properties dict (the reference's Plugin#init contract)
    and returns {param: resolver}; `paths.pathParams` maps params directly
    to resolver callables."""
    params: dict = {}
    if paths.get("factory"):
        factory = load_plugin(paths["factory"])
        params.update(factory(dict(path_props)))
    for name, spec in (paths.get("pathParams") or {}).items():
        params[str(name)] = load_plugin(spec)
    return params


def _dedup(d: dict | None, default: DedupConfig | None = None) -> DedupConfig | None:
    if not d:
        return default
    return DedupConfig(
        enable=bool(d.get("enable", False)),
        distinct_fields=list(d["distinctFields"]) if d.get("distinctFields") else None,
        ignore_fields=list(d["ignoreFields"]) if d.get("ignoreFields") else None,
    )


def load_config(path: str) -> AppConfig:
    import yaml

    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}

    fmt = raw.get("format") or {}
    comp = (raw.get("compression") or {}).get("type", "none")
    # lowercase BEFORE the none-check: YAML `type: NONE` must mean no
    # compression, not the literal codec string "none" (a KeyError at
    # write time)
    comp = str(comp).lower() if comp is not None else None
    comp = None if comp in (None, "none") else comp
    worker = raw.get("worker") or {}
    paths = raw.get("paths") or {}
    source = raw.get("source") or {}
    redis = raw.get("redis") or {}
    tag_offsets = bool(
        (source.get("s3") or {}).get("endOffsetFromTags", False)
        or (source.get("azure") or {}).get("endOffsetFromMetadata", False)
    )
    path_props = paths.get("properties") or {}
    svc = raw.get("service") or {}
    cln = raw.get("cleaner") or {}

    topics: dict[str, TopicConfig] = {}
    for name, t in (raw.get("topics") or {}).items():
        t = t or {}
        topics[name] = TopicConfig(
            exclude=bool(t.get("exclude", False)),
            exclude_from_delete=bool(t.get("excludeFromDelete", False)),
            path_format=(t.get("pathProperties") or {}).get("format"),
            dedup=_dedup(t.get("deduplication")),
            exclude_fields=set(t.get("excludeFields") or ()),
        )

    bucket_raw = paths.get("bucket")
    bucket = None
    if bucket_raw:
        # paths.bucket (config/BucketFormatterConfig.kt + PathConfig.kt:26)
        bucket = BucketFormat(
            fmt=str(bucket_raw.get("format", "radar-output-storage")),
            disabled_formats=[
                str(r) for r in (bucket_raw.get("disabledFormats") or [])
            ],
            default_name=str(bucket_raw.get("defaultName", "radar-output-storage")),
        )

    from radar_output_restructure_spark.operators.timebin import (
        DEFAULT_BIN_FORMAT,
    )
    from radar_output_restructure_spark.plans.path_format import (
        DEFAULT_FORMAT,
    )

    # the reference MP plugin's documented property channel
    # (path/MPPathFormatterPlugin.kt:26-28): presence of the URL in
    # paths.properties activates `${mp:...}` resolution via REST
    mp_properties = (
        dict(path_props) if path_props.get("managementPortalUrl") else None
    )

    restructure = RestructureConfig(
        output_dir=str(paths.get("output", "output")),
        bucket=bucket,
        path_format=path_props.get("format", DEFAULT_FORMAT),
        time_bin_format=path_props.get("timeBinFormat", DEFAULT_BIN_FORMAT),
        mp_properties=mp_properties,
        output_format=str(fmt.get("type", "csv")).lower(),
        compression=comp,
        exclude_fields=set(fmt.get("excludeFields") or ()),
        dedup=_dedup(fmt.get("deduplication"), DedupConfig()) or DedupConfig(),
        path_params=_path_params(paths, path_props),
        topics=topics,
        max_files_per_topic=worker.get("maxFilesPerTopic"),
        minimum_file_age_s=float(worker.get("minimumFileAge", 60)),
        num_threads=int(worker.get("numThreads", 1)),
        end_offset_from_tags=tag_offsets,
        lock_dir=str(redis["lockPrefix"]) if redis.get("lockPrefix") else None,
        # source.index (config/StorageIndexConfig.kt, README.md:140-143):
        # presence of the block enables the incremental listing index
        use_storage_index="index" in source,
        index_rescan_s=float(
            (source.get("index") or {}).get("fullSyncInterval", 3600)
        ),
        index_rescan_empty_s=float(
            (source.get("index") or {}).get("emptyDirectorySyncInterval", 900)
        ),
    )
    return AppConfig(
        inputs=[str(p) for p in (paths.get("inputs") or [])],
        restructure=restructure,
        cleaner=CleanerConfig(age_days=float(cln.get("age", 7))),
        service=ServiceConfig(
            enable=bool(svc.get("enable", False)),
            interval_s=float(svc.get("interval", 300)),
            cleaner_enable=bool(cln.get("enable", False)),
            cleaner_interval_s=float(cln.get("interval", 1260)),
            worker_enable=bool(worker.get("enable", True)),
        ),
    )


def apply_env(cfg: AppConfig, env: dict[str, str] | None = None) -> AppConfig:
    """RestructureConfig.kt:36-58 withEnv analog for the surviving knobs."""
    env = os.environ if env is None else env
    if env.get("RADAR_OUTPUT_DIR"):
        cfg.restructure.output_dir = env["RADAR_OUTPUT_DIR"]
    if env.get("RADAR_INPUT_DIRS"):
        cfg.inputs = env["RADAR_INPUT_DIRS"].split(",")
    return cfg
