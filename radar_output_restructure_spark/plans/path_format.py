"""Path-format mini-DSL: `${...}` strings compiled to Catalyst Columns.

The reference routes every record to an output file via a format string,
default `${projectId}/${userId}/${topic}/${filename}`
(config/PathFormatterConfig.kt:30-33), resolved by plugins
(path/PathFormatterPlugin.kt:8-106):

* fixed:  projectId userId sourceId topic filename attempt extension
          (path/FixedPathFormatterPlugin.kt) — ids sanitized with
          `[^a-zA-Z0-9_-]+` removal and unknown-defaults
* time:   `${time:yyyyMM}` arbitrary date patterns (TimePathFormatterPlugin.kt)
* key:/value:  dotted struct lookup, e.g. `${value:serverStatus}`
          (KeyPathFormatterPlugin.kt, ValuePathFormatterPlugin.kt)
* mp:     ManagementPortal enrichment (`${mp:organization}` etc.) — a
          dimension lookup keyed by (projectId, userId)
          (MPPathFormatterPlugin.kt:30-157)

Spark-first: each `${param}` compiles to ONE Column expression; the whole path
is `concat_ws('/')`. The mp plugin becomes a broadcast hash join against a
small dimension DataFrame supplied by the caller (the REST fetch is
driver-side and out of scope of the plan itself). Everything stays inside
whole-stage codegen; there is no per-record Python.

A missing `${topic}` or `${filename}` in the format is a config error, like
PathFormatter.kt:52-60.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from radar_output_restructure_spark.functions.sanitize import (
    UNKNOWN_PROJECT,
    UNKNOWN_SOURCE,
    UNKNOWN_USER,
    sanitize_id,
)
from radar_output_restructure_spark.functions.timeutil import _find_field
from radar_output_restructure_spark.operators.timebin import (
    DEFAULT_BIN_FORMAT,
    time_bin,
    time_segment,
)

DEFAULT_FORMAT = "${projectId}/${userId}/${topic}/${filename}"
_PARAM_RE = re.compile(r"\$\{([^}]+)\}")


@dataclass
class PathFormat:
    """Compiled path format.

    Parameters
    ----------
    fmt: the `${...}` format string (segments joined by `/`).
    time_bin_format: the `filename` time-bin pattern (`timeBinFormat` config).
    extension: output extension including compression suffix (e.g `.csv.gz`).
    mp_dim: optional dimension DataFrame with columns (projectId, userId, ...)
        for `${mp:<attr>}` segments; broadcast-joined.
    """

    fmt: str = DEFAULT_FORMAT
    time_bin_format: str = DEFAULT_BIN_FORMAT
    extension: str = ".csv"
    mp_dim: DataFrame | None = None
    # U1/U4 plugin surface (path/PathFormatterPlugin.kt:8-106, README.md:278-291
    # custom RecordPathFactory): user-registered `${name}` resolvers. Each
    # callable gets (df, event_ts) and returns the segment Column — the
    # Spark-first equivalent of a plugin class, still fully inside Catalyst.
    custom_params: dict = field(default_factory=dict)
    # PathFormatter.kt checkMinimalDistinction: the bucket formatter reuses
    # this compiler without the topic/filename requirement
    # (FormattedPathFactory.kt:89-93 toBucketFormatter).
    require_distinction: bool = True
    _params: list[str] = field(init=False)

    def __post_init__(self) -> None:
        self._params = _PARAM_RE.findall(self.fmt)
        for parts in self._parsed_segments()[:-1]:
            if any(
                kind == "param"
                and value in ("filename", "attempt", "extension")
                for kind, value in parts
            ):
                raise ValueError(
                    "${filename}/${attempt}/${extension} must live in the "
                    "LAST path segment — they name the output FILE"
                )
        if not self.require_distinction:
            return
        if "topic" not in self._params:
            raise ValueError("path format must contain ${topic}")  # PathFormatter.kt:52-60
        for parts in self._parsed_segments():
            params = [v for k, v in parts if k == "param"]
            if "topic" in params and len(params) > 1:
                # partition_columns names a multi-param segment pf_seg<i>,
                # but the writers address the topic column as pf_topic —
                # fail HERE with a clear message instead of at write time
                # with an unresolved-column error. (Literal text alongside
                # a lone ${topic} is fine: the segment keeps the pf_topic
                # name.)
                raise ValueError(
                    "${topic} must not share a path segment with another "
                    "${param} — the writers need a dedicated topic column"
                )
        if "filename" not in self._params and not (
            "attempt" in self._params and "extension" in self._params
        ):
            raise ValueError("path format must contain ${filename} or ${attempt}+${extension}")

    def _parsed_segments(
        self,
    ) -> list[list[tuple[str, str]]]:
        """The format split into `/`-separated PATH SEGMENTS, each a list of
        ('lit', text) | ('param', name) pieces. Literal text inside a
        segment survives verbatim (the reference's PathFormatter.format
        semantics — `${userId}-${sourceId}` keeps the dash, a constant
        `staging` segment stays a directory); dropping literals and joining
        bare params with '/' would silently rename every output path."""
        segments: list[list[tuple[str, str]]] = []
        for seg in self.fmt.split("/"):
            parts: list[tuple[str, str]] = []
            pos = 0
            for m in _PARAM_RE.finditer(seg):
                if m.start() > pos:
                    parts.append(("lit", seg[pos : m.start()]))
                parts.append(("param", m.group(1)))
                pos = m.end()
            if pos < len(seg) or not parts:
                parts.append(("lit", seg[pos:]))
            segments.append(parts)
        return segments

    def needs_mp_join(self) -> bool:
        return any(p.startswith("mp:") for p in self._params)

    def _segment(self, df: DataFrame, param: str, event_ts: Column, attempt: Column) -> Column:
        if param == "projectId":
            return sanitize_id(F.col("key.projectId"), UNKNOWN_PROJECT)
        if param == "userId":
            return sanitize_id(F.col("key.userId"), UNKNOWN_USER)
        if param == "sourceId":
            return sanitize_id(F.col("key.sourceId"), UNKNOWN_SOURCE)
        if param == "topic":
            return F.col("topic")
        if param == "filename":
            suffix = F.when(attempt > 0, F.concat(F.lit("_"), attempt.cast("string"))).otherwise(
                F.lit("")
            )
            return F.concat(
                time_bin(event_ts, self.time_bin_format), suffix, F.lit(self.extension)
            )
        if param == "attempt":
            return F.when(attempt > 0, F.concat(F.lit("_"), attempt.cast("string"))).otherwise(
                F.lit("")
            )
        if param == "extension":
            return F.lit(self.extension)
        if param.startswith("time:"):
            return time_segment(event_ts, param[5:])
        if param.startswith("key:") or param.startswith("value:"):
            struct, dotted = param.split(":", 1)
            path = _resolve_dotted(df, struct, dotted)
            return sanitize_id(F.col(path), f"unknown-{dotted}")
        if param.startswith("mp:"):
            # resolved post-join: the broadcast join materializes mp_<attr>.
            # sanitized like every id segment — dimension values are external
            # data and must never contribute path separators
            return sanitize_id(F.col(f"mp_{param[3:]}"), "unknown")
        if param in self.custom_params:
            return sanitize_id(
                self.custom_params[param](df, event_ts).cast("string"), "unknown"
            )
        raise ValueError(f"unknown path parameter ${{{param}}}")

    def apply(
        self,
        df: DataFrame,
        event_ts: Column,
        attempt: Column | None = None,
        out_col: str = "output_path",
    ) -> DataFrame:
        """Attach segment columns `_seg0.._segN` and the joined `out_col`."""
        attempt = attempt if attempt is not None else F.lit(0)
        df = self._with_mp_join(df)
        segs = [
            F.concat(
                *[
                    F.lit(v) if k == "lit" else self._segment(df, v, event_ts, attempt)
                    for k, v in parts
                ]
            )
            for parts in self._parsed_segments()
        ]
        return df.withColumn(out_col, F.concat_ws("/", *segs)).drop(
            *self._mp_cols()
        )

    def template_column(
        self, df: DataFrame, event_ts: Column, attempt: Column | None = None
    ) -> Column:
        """Render the WHOLE format string — literal text plus `${...}`
        substitutions — as one Column (the reference's PathFormatter.format
        string semantics, where literals survive verbatim)."""
        attempt = attempt if attempt is not None else F.lit(0)
        cols: list[Column] = []
        pos = 0
        for m in _PARAM_RE.finditer(self.fmt):
            if m.start() > pos:
                cols.append(F.lit(self.fmt[pos : m.start()]))
            cols.append(self._segment(df, m.group(1), event_ts, attempt))
            pos = m.end()
        if pos < len(self.fmt) or not cols:
            cols.append(F.lit(self.fmt[pos:]))
        return F.concat(*cols)

    def _mp_cols(self) -> list[str]:
        """Names the mp join adds — dropped again once segments are computed
        (MP values route files; they are not record content)."""
        if not self.needs_mp_join() or self.mp_dim is None:
            return []
        return [
            f"mp_{c}"
            for c in self.mp_dim.columns
            if c not in ("projectId", "userId")
        ]

    def _with_mp_join(self, df: DataFrame) -> DataFrame:
        """Broadcast-join the `${mp:...}` dimension frame (as `mp_<attr>`
        columns) when the format uses it — shared by `apply` and
        `partition_columns`."""
        if not self.needs_mp_join():
            return df
        if self.mp_dim is None:
            raise ValueError("${mp:...} used but no mp_dim DataFrame supplied")
        dim = self.mp_dim
        renamed = dim.select(
            F.col("projectId").alias("__mp_p"),
            F.col("userId").alias("__mp_u"),
            *[
                F.col(c).alias(f"mp_{c}")
                for c in dim.columns
                if c not in ("projectId", "userId")
            ],
        )
        return df.join(
            F.broadcast(renamed),
            (F.col("key.projectId") == F.col("__mp_p"))
            & (F.col("key.userId") == F.col("__mp_u")),
            "left",
        ).drop("__mp_p", "__mp_u")

    def partition_columns(
        self, df: DataFrame, event_ts: Column, prefix: str = "pf_"
    ) -> tuple[DataFrame, list[str]]:
        """Attach one named column per non-file PATH SEGMENT plus the time
        bin — the groupBy/partitionBy key set for the partitioned writer.
        Literal text inside a segment is preserved (see _parsed_segments);
        a single-param segment keeps its param-derived name (pf_topic et
        al., which the writers reference), a mixed or literal segment gets
        a positional pf_seg<i> name."""
        names: list[str] = []
        #: (name, column) per segment, applied in ONE select at the end —
        #: the per-segment withColumn chain re-analyzed the whole scan tree
        #: once per path level (segments never reference each other, only
        #: scan/mp columns, so deferral is order-safe)
        pending: list[tuple[str, Column]] = []
        attempt = F.lit(0)
        df = self._with_mp_join(df)
        segments = self._parsed_segments()
        for i, parts in enumerate(segments):
            params = [v for k, v in parts if k == "param"]
            if any(
                p in ("filename", "attempt", "extension") for p in params
            ):
                # the FILE segment: the writer owns bin + attempt +
                # extension; any literal prefix/suffix folds into pf_bin
                continue
            if len(parts) == 1 and parts[0][0] == "param":
                name = prefix + re.sub(r"[^A-Za-z0-9_]", "_", parts[0][1])
                col = self._segment(df, parts[0][1], event_ts, attempt)
            else:
                if len(params) == 1:
                    # a mixed literal+param segment (e.g. "logs-${topic}")
                    # keeps the param-derived NAME: the writers hard-code
                    # topic_col="pf_topic", so a positional pf_seg<i> here
                    # would fail the write with an unresolved-column error
                    # even though require_distinction accepted the format
                    name = prefix + re.sub(r"[^A-Za-z0-9_]", "_", params[0])
                else:
                    name = f"{prefix}seg{i}"
                col = F.concat(
                    *[
                        F.lit(v)
                        if k == "lit"
                        else self._segment(df, v, event_ts, attempt)
                        for k, v in parts
                    ]
                )
            # A param repeated across segments (e.g. '${projectId}/
            # backup-${projectId}/${topic}') must not reuse its name:
            # withColumn would silently REPLACE the earlier segment's
            # column and both path levels would render the second
            # segment's value. First occurrence keeps the param-derived
            # name (the one the writers hard-code); later collisions get
            # the positional fallback.
            if name in names:
                name = f"{prefix}seg{i}"
            pending.append((name, col))
            names.append(name)
        # the bin column renders the file segment with ${filename} -> the
        # time bin and writer-owned ${attempt}/${extension} -> nothing,
        # literals (e.g. a "logs-" prefix) verbatim
        file_parts = segments[-1]
        is_file_segment = any(
            k == "param" and v in ("filename", "attempt", "extension")
            for k, v in file_parts
        )
        bin_pieces = []
        if is_file_segment:
            for k, v in file_parts:
                if k == "lit":
                    bin_pieces.append(F.lit(v))
                elif v == "filename":
                    bin_pieces.append(
                        time_bin(event_ts, self.time_bin_format)
                    )
                elif v in ("attempt", "extension"):
                    continue
                else:
                    bin_pieces.append(self._segment(df, v, event_ts, attempt))
        if not bin_pieces:
            # no file segment (require_distinction=False callers): the time
            # bin alone names the file, exactly as before
            bin_pieces = [time_bin(event_ts, self.time_bin_format)]
        # Same collision rule as the segment loop (r12 ADVICE): a path
        # param that sanitizes to 'bin' (e.g. ${bin} or ${key:bin}) already
        # claimed the pf_bin name above; emitting a second pf_bin column in
        # the single-select path would be an AMBIGUOUS_REFERENCE at the
        # downstream groupBy/write (the old withColumn chain silently
        # replaced in place, which was equally wrong — the bin must keep
        # its own column).
        bin_name = prefix + "bin"
        if bin_name in names:
            j = len(segments) - 1
            while f"{prefix}seg{j}" in names:
                j += 1
            bin_name = f"{prefix}seg{j}"
        pending.append(
            (
                bin_name,
                bin_pieces[0]
                if len(bin_pieces) == 1
                else F.concat(*bin_pieces),
            )
        )
        names.append(bin_name)
        if any(n in df.columns for n, _c in pending):
            # a scan that already carries a pf_ name keeps the old
            # replace-in-place semantics via the withColumn chain
            for n, c in pending:
                df = df.withColumn(n, c)
        else:
            df = df.select("*", *[c.alias(n) for n, c in pending])
        return df.drop(*self._mp_cols()), names


@dataclass
class BucketFormat:
    """G6 per-record target-bucket selection (FormattedPathFactory.kt:51-60,
    config/BucketFormatterConfig.kt).

    Renders `fmt` with the same `${...}` plugin language as the path format;
    a rendered name that matches any regex in `disabled_formats` (full match,
    case-insensitive — Kotlin `Regex.matches` with IGNORE_CASE) falls back to
    `default_name`. On an object store the bucket picks the target
    bucket/container; on a local tree it is the first path segment. The whole
    thing is one Column expression — regex dispatch happens JVM-side via
    `rlike`, no per-record Python.
    """

    fmt: str = "radar-output-storage"
    disabled_formats: list[str] = field(default_factory=list)
    default_name: str = "radar-output-storage"
    # None = "not set here": the plan injects its configured bin format only
    # then, so a YAML bucket carrying its OWN format (e.g. monthly archive
    # roots under an hourly pipeline) is never silently clobbered
    time_bin_format: str | None = None
    mp_dim: DataFrame | None = None
    custom_params: dict = field(default_factory=dict)

    def _formatter(self) -> PathFormat:
        return PathFormat(
            fmt=self.fmt,
            time_bin_format=self.time_bin_format or DEFAULT_BIN_FORMAT,
            extension="",
            mp_dim=self.mp_dim,
            custom_params=self.custom_params,
            require_distinction=False,
        )

    def _dispatch(self, raw: Column) -> Column:
        cond = None
        for rx in self.disabled_formats:
            c = raw.rlike(f"(?i)^(?:{rx})$")
            cond = c if cond is None else (cond | c)
        if cond is not None:
            raw = F.when(cond, F.lit(self.default_name)).otherwise(raw)
        return raw

    def column(self, df: DataFrame, event_ts: Column) -> Column:
        """Rendered bucket Column for formats WITHOUT `${mp:...}` segments.
        An mp-bearing format references `mp_<attr>` columns that only a
        dimension join materializes — use `attach` for those."""
        return self._dispatch(self._formatter().template_column(df, event_ts))

    def attach(
        self, df: DataFrame, event_ts: Column, out_col: str = "pf_bucket"
    ) -> DataFrame:
        """Broadcast-join the `${mp:...}` dimension when the format needs
        it, attach the rendered (and disabled-format-dispatched) bucket
        column, and drop the join's mp_<attr> helper columns — the entry
        point the restructure plan uses, valid for every format."""
        pf = self._formatter()
        joined = pf._with_mp_join(df)
        raw = self._dispatch(pf.template_column(joined, event_ts))
        return joined.withColumn(out_col, raw).drop(*pf._mp_cols())


def _resolve_dotted(df: DataFrame, struct: str, dotted: str) -> str:
    """Case-insensitive resolution of `struct:dot.ted.path`."""
    parts = dotted.split(".")
    path = _find_field(df.schema, struct, parts[0])
    if path is None:
        raise ValueError(f"field {struct}.{dotted} not found")
    # deeper levels: trust the schema (resolution errors surface at analysis)
    return ".".join([path, *parts[1:]])
