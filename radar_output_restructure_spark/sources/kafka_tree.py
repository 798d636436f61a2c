"""Kafka-sink topic-tree source (SURVEY §2.1 S1-S7).

Physical layout (reference accounting/TopicPartitionOffsetRange.kt:65-76,
util/AvroTopicLister.kt:14-31): one directory per topic, files named

    <input>/<topic>/partition=<p>/<topic>+<p>+<offsetFrom>[+<offsetTo>].<ext>

The reference walks the tree with coroutines and an in-memory storage index;
on Spark the listing is the driver-side file index and the per-record work is
one declarative scan:

* `read_topic_tree` loads every file of a topic (or all topics) in one
  `spark.read` — Catalyst prunes columns and pushes filters into the scan.
* `with_file_metadata` attaches topic / kafka partition / offset range parsed
  from `_metadata.file_path` (the hidden file-source metadata column — no
  extra I/O), replacing the reference's filename parser.
* Storage backends (local/S3A/ABFS, reference source/S3SourceStorage.kt,
  AzureSourceStorage.kt) collapse into the Hadoop FileSystem URL scheme;
  retries and listing pagination are Hadoop-connector config, not engine code.

Format: "avro" on a real cluster (spark-avro on the classpath); local tests
use parquet fixtures with identical tree semantics. The reader is
format-agnostic — semantics live in the path parsing, not the codec.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# <topic>+<partition>+<offsetFrom>[+<offsetTo>].<ext>[.<compression>]
FILENAME_RE = r"([^/+]+)\+(\d+)\+(\d+)(?:\+(\d+))?\.[A-Za-z0-9.]+$"


def parse_offset_filename(name: str) -> tuple[str, int, int, int | None] | None:
    """Driver-side parse of one filename (reference
    TopicPartitionOffsetRange.kt:65-76: split on [+.], drop extension)."""
    m = re.search(FILENAME_RE, name)
    if not m:
        return None
    topic, part, off_from, off_to = m.groups()
    return topic, int(part), int(off_from), int(off_to) if off_to else None


def with_file_metadata(df: DataFrame) -> DataFrame:
    """Attach topic / kafka_partition / offset_from / offset_to / source_file /
    file_modified from the file-source `_metadata` column.

    `_metadata` is produced by the scan itself (no second listing), so at
    100 TB this costs nothing beyond the existing file index.
    """
    path = F.col("_metadata.file_path")
    # local URIs come back as file:/x or file:///x — normalize to a plain path
    # so driver-side os.* paths compare equal; object-store schemes pass through
    normalized = F.regexp_replace(path, "^file:/+", "/")
    return (
        df.withColumn("source_file", normalized)
        .withColumn("file_modified", F.col("_metadata.file_modification_time"))
        .withColumn("topic", F.regexp_extract(path, FILENAME_RE, 1))
        .withColumn("kafka_partition", F.regexp_extract(path, FILENAME_RE, 2).cast("int"))
        .withColumn("offset_from", F.regexp_extract(path, FILENAME_RE, 3).cast("long"))
        .withColumn(
            "offset_to",
            F.nullif(F.regexp_extract(path, FILENAME_RE, 4), F.lit("")).cast("long"),
        )
    )


def read_topic_tree(
    spark: SparkSession,
    input_dir: str,
    topic: str | None = None,
    file_format: str = "parquet",
    exclude_topics: set[str] | None = None,
    paths: list[str] | None = None,
) -> DataFrame:
    """Load a Kafka-sink tree. One scan for all topics when schemas align;
    per-topic calls when they don't (the reference always processes per-topic,
    worker/RadarKafkaRestructure.kt:81-106).

    `+tmp` directories (reference util/AvroTopicLister.kt:28) are skipped
    naturally: the glob only descends into `partition=*` directories.

    `paths`: load exactly these files (the manifest-pruned candidate list) —
    partition pruning at the source instead of a post-scan filter.
    """
    if paths is not None:
        df = spark.read.format(file_format).load(paths)
    else:
        pattern = f"{input_dir}/{topic or '*'}/partition=*/"
        df = spark.read.format(file_format).load(pattern)
    # partition=N discovery column may shadow the parsed kafka partition
    if "partition" in df.columns:
        df = df.drop("partition")
    df = with_file_metadata(df.select("*", "_metadata"))
    if exclude_topics:
        df = df.filter(~F.col("topic").isin(*sorted(exclude_topics)))
    return df.drop("_metadata")
