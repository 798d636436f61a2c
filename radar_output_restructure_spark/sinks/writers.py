"""Exact-name output-tree writer with schema sidecars (SURVEY §2.1 S10-S13).

The reference writes one file per record-group at an exact path
(`<project>/<user>/<topic>/<timebin>[_N].csv[.gz]`) plus a write-once
`schema-<topic>.json` sidecar (worker/FileCacheStore.kt:131-151), appending to
existing files across runs (worker/FileCache.kt:82-125).

Spark's native writer controls directories, not file names, so the engine:

1. repartitions by the path-segment columns (one shuffle; all rows of an
   output file land in one task — map-side combine keeps this cheap, AQE
   splits skewed groups across... no: correctness needs co-location, so skew
   is handled by the attempt/segment granularity, which is naturally bounded
   per user-hour),
2. `write.partitionBy(segments)` into a temp dir — a normal distributed
   Spark job; every executor writes its groups in parallel,
3. a driver-side finalize pass renames `seg=val/part-*.csv` to the exact
   reference tree, concatenates with pre-existing target files (append
   semantics incl. late data, SURVEY ST3), and drops sidecars.

Steps 1-2 scale to any size; step 3 touches one small rename per output file
(metadata-only on object stores that support server-side copy). CSV headers,
gzip, and JSON-lines come from the native writer.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _avro_schema_json(schema: T.StructType, topic: str) -> str:
    """Render a StructType as an Avro-record schema JSON (the sidecar body).

    Inverse of spark-avro's mapping for the types the engine emits.
    """

    def avro_type(dt: T.DataType) -> object:
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": "record",
                "fields": [
                    {"name": f.name, "type": _nullable(avro_type(f.dataType), f.nullable)}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": avro_type(dt.elementType)}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": avro_type(dt.valueType)}
        mapping = {
            T.StringType: "string",
            T.LongType: "long",
            T.IntegerType: "int",
            T.DoubleType: "double",
            T.FloatType: "float",
            T.BooleanType: "boolean",
            T.BinaryType: "bytes",
            T.TimestampType: {"type": "long", "logicalType": "timestamp-micros"},
            T.DateType: {"type": "int", "logicalType": "date"},
        }
        for klass, name in mapping.items():
            if isinstance(dt, klass):
                return name
        return "string"

    def _nullable(t: object, nullable: bool) -> object:
        return ["null", t] if nullable else t

    top = {
        "type": "record",
        "name": topic,
        "fields": [
            {"name": f.name, "type": _nullable(avro_type(f.dataType), f.nullable)}
            for f in schema.fields
        ],
    }
    return json.dumps(top, indent=2)


def _concat_into(dst: str, parts: list[str], gzipped: bool, has_header: bool) -> None:
    """Append part files into dst (skipping their headers when dst exists)."""
    opener = gzip.open if gzipped else open
    exists = os.path.exists(dst)
    mode = "ab"
    with opener(dst, mode) as out:  # type: ignore[arg-type]
        skip_header = exists and has_header
        for part in parts:
            with opener(part, "rb") as src:  # type: ignore[arg-type]
                data = src.read()
            if skip_header and data:
                nl = data.find(b"\n")
                data = data[nl + 1 :] if nl >= 0 else b""
            out.write(data)
            skip_header = has_header  # subsequent parts always drop the header
    # normalize: gzip append produces multi-member files; both gzip and the
    # reference's decompress-on-append accept them.


def write_output_tree(
    df: DataFrame,
    out_dir: str,
    partition_cols: list[str],
    fmt: str = "csv",
    compression: str | None = None,
    extension: str | None = None,
    topic_col: str = "pf_topic",
    value_schema: T.StructType | None = None,
    tmp_dir: str | None = None,
    order_col: str | None = None,
) -> list[str]:
    """Write `df` as the reference's output tree; returns final file paths.

    `partition_cols`: ordered path segments; the last is the time-bin that
    becomes the file name. Local-filesystem finalize (object-store variants
    swap os.* for the storage client's server-side copy).
    """
    if extension is None:
        extension = {"csv": ".csv", "json": ".json"}[fmt] + (
            ".gz" if compression == "gzip" else ""
        )
    tmp = tmp_dir or (out_dir.rstrip("/") + "+tmp")
    shutil.rmtree(tmp, ignore_errors=True)

    shuffled = df.repartition(*[df[c] for c in partition_cols])
    if order_col is not None:
        # restore record order inside each output file AFTER the shuffle
        # (reference dedup output order, CsvAvroConverterFactory.kt:56-63).
        # Sort key leads with the partition columns so FileFormatWriter sees
        # its required ordering satisfied and does not add its own
        # (order-destroying) sort on them.
        shuffled = shuffled.sortWithinPartitions(*partition_cols, order_col).drop(order_col)
    writer = shuffled.write.mode("overwrite").partitionBy(*partition_cols)
    if fmt == "csv":
        # escape='"' => RFC4180 doubled quotes, matching the reference's opencsv
        writer = (
            writer.option("header", True)
            .option("nullValue", "")
            .option("emptyValue", "")
            .option("escape", '"')
        )
    if compression:
        writer = writer.option("compression", compression)
    getattr(writer, fmt)(tmp)

    gzipped = compression == "gzip"
    has_header = fmt == "csv"
    finals: list[str] = []
    seen_topics: set[str] = set()
    # walk partition dirs: tmp/<c0>=<v0>/.../<cn>=<vn>/part-*
    for dirpath, dirnames, filenames in os.walk(tmp):
        parts = sorted(
            os.path.join(dirpath, f)
            for f in filenames
            if f.startswith("part-") and not f.endswith(".crc")
        )
        if not parts:
            continue
        rel = os.path.relpath(dirpath, tmp)
        segs = [kv.split("=", 1)[1] for kv in rel.split(os.sep)]
        *dir_segs, bin_seg = segs
        final_dir = os.path.join(out_dir, *dir_segs)
        os.makedirs(final_dir, exist_ok=True)
        final = os.path.join(final_dir, bin_seg + extension)
        _concat_into(final, parts, gzipped, has_header)
        finals.append(final)
        # schema sidecar, write-once per output dir (FileCacheStore.kt:131-151)
        topic = None
        for col, seg in zip(partition_cols, segs):
            if col == topic_col:
                topic = seg
        if topic and value_schema is not None:
            sidecar = os.path.join(final_dir, f"schema-{topic}.json")
            if not os.path.exists(sidecar):
                with open(sidecar, "w") as fh:
                    fh.write(_avro_schema_json(value_schema, topic))
            seen_topics.add(topic)
    shutil.rmtree(tmp, ignore_errors=True)
    return sorted(finals)
