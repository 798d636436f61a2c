"""SparkSession factory tuned for this engine.

Local test runs use ``local[N]``; the same config block is what we would ship
to a 1000-executor cluster (AQE on, UTC session time, Arrow for the few
Pandas-UDF paths). Shuffle partitions default to the local core count — on a
real cluster AQE coalescing makes the static number far less important.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "radar-output-restructure-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # Parquet scans: keep file-split sizing explicit so huge inputs split
        # and tiny test inputs don't over-parallelize.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # the driver-generated testdata uses TIMESTAMP(NANOS); Spark reads it
        # as long with this flag, and sources/tables.py converts to timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def avro_supported(spark: SparkSession) -> bool:
    """True when the spark-avro DataSource jar is on the classpath.

    Avro works EITHER way: with the jar, `read_topic_tree` uses the native
    DataSource; without it (pip pyspark), the distributed pure-Python
    container reader in sources/avro_io.py takes over. This predicate only
    reports which path is active."""
    from radar_output_restructure_spark.sources.kafka_tree import (
        has_native_avro,
    )

    return has_native_avro(spark)
