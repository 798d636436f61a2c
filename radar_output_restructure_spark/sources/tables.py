"""Loaders for the driver testdata tables (/root/testdata/sf*/*.parquet).

The generator writes TIMESTAMP(NANOS) columns, which Spark's parquet reader
rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` — then they arrive
as long nanos. `load_table` sets the flag (runtime-settable SQL conf),
inspects the file footer with pyarrow, and converts every timestamp[ns]
column back to a proper TimestampType via integer division (`DIV 1000`
— float division would lose precision above 2^53). DuckDB reads the same
columns natively as microsecond timestamps, so both engines see identical
values.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_ts_columns(path: str) -> set[str]:
    import pyarrow as pa

    schema = pq.read_schema(path)
    out = set()
    for field in schema:
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
            out.add(field.name)
    return out


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load one testdata table.

    `spread=True`: repartition up to the cluster's default parallelism when
    the scan would yield fewer partitions — small single-file tables feeding
    CPU-heavy expressions (shingling, hashing) otherwise run on one core. At
    real scale the scan already has >= cores partitions and this is a no-op,
    so the extra shuffle only ever moves data that fits on one core anyway.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col in sorted(_nanos_ts_columns(path)):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
    # Micro-precision parquet timestamps without the UTC-adjusted flag arrive
    # as TIMESTAMP_NTZ; normalize to TimestampType so every consumer sees one
    # timestamp kind regardless of how the generator wrote the column. The
    # session timezone is UTC (session.py), so the cast maps wall-clock values
    # to the same epoch instants DuckDB sees reading the file natively.
    import pyspark.sql.types as T

    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    if spread:
        target = spark.sparkContext.defaultParallelism
        if _scan_partitions(spark, df, path) < target:
            df = df.repartition(target)
    return df


#: (session id, path, mtime_ns) -> scan partition count. getNumPartitions
#: builds a full RDD conversion plan each call; the count only changes when
#: the file or the session conf does, so cache it per (session, file).
_SCAN_PARTS: dict[tuple[int, str, int], int] = {}


def _scan_partitions(spark: SparkSession, df: DataFrame, path: str) -> int:
    key = (id(spark._jsparkSession), path, os.stat(path).st_mtime_ns)
    if key not in _SCAN_PARTS:
        _SCAN_PARTS[key] = df.rdd.getNumPartitions()
    return _SCAN_PARTS[key]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def dataset_fingerprint(sf_dir: str, names: tuple[str, ...]) -> str:
    """12-hex fingerprint of the named tables' on-disk state (relative
    file names + sizes + mtimes). Cache keys derived from it (persisted
    IVF indexes, bucketed table materializations) can never silently
    reuse artifacts built from different data at the same path."""
    import hashlib

    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    for name in names:
        src = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
        h.update(name.encode())
        if os.path.isdir(src):
            for root, _dirs, files in sorted(os.walk(src)):
                for fn in sorted(files):
                    st = os.stat(os.path.join(root, fn))
                    h.update(
                        f"{os.path.relpath(os.path.join(root, fn), src)}"
                        f":{st.st_size}:{st.st_mtime_ns};".encode()
                    )
        elif os.path.exists(src):
            st = os.stat(src)
            h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]
