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


# Salted two-stage aggregation (the groupBy-skew lever) lives in
# operators/skew.salted_agg: salt_col=None gives the seeded-rand() salt for
# associative aggs (the variant that used to live here, folded in per the
# r7 verdict item 7); a value-derived salt_col additionally splits
# COUNT(DISTINCT) exactly. AQE's skew handling covers JOIN skew; groupBy
# skew still needs the explicit split.
