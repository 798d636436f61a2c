"""Bucketed (co-located) table materialization — the shuffle-elimination
lever for repeated big-big joins (SURVEY §4 partitioning row; the reference
has no analog because it never joins data).

At 100 TB, fact-fact joins (lineitem x orders, events x events-derived)
shuffle both sides on every query. Bucketing pays that shuffle ONCE at write
time: `bucketBy(n, key)` hash-partitions files on disk, and subsequent joins
or aggregations on the bucket key run with ZERO exchange on the bucketed
side (Spark's bucketing-aware scan reports the hash distribution to the
planner). Rules of thumb encoded here:

* bucket count ~ total size / target partition size (128-256 MB), and the
  SAME count on both join sides (mismatched counts re-shuffle one side).
* sortBy within buckets enables sort-merge joins without the sort step.
* bucket pruning applies to equality filters on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Materialize `df` as a bucketed (and bucket-sorted) managed table."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the physical
    plan has no Exchange on either side (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: "dict[str, tuple[str, str]]",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys (SURVEY §4 skew lever).

    A hot key concentrates its whole group on one reducer; salting splits it:
    phase 1 aggregates on (key, salt) — the hot key fans out over
    `salt_buckets` reducers — and phase 2 merges the partials per key. Only
    decomposable aggregates are supported: `aggs` maps output column ->
    (input column, fn) with fn in {sum, count, min, max}.

    AQE's skew-join handling covers JOIN skew automatically; groupBy skew
    still needs this explicit split (or enough partial aggregation, which
    pure count/sum usually gets map-side — salting matters when the
    per-group state is large, e.g. collect-style or high-cardinality
    sub-aggregations).
    """
    from pyspark.sql import functions as F

    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[
            phase1_fn[fn](F.col(col)).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return p1.groupBy(*keys).agg(
        *[
            merge_fn[fn](F.col(f"__p_{out}")).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
