"""Data-quality profiling and constraint validation (the deequ/
expectations niche): one-pass per-column statistics and rule checks.

A 100-TB ingest runs these before anything else touches the batch — a
schema-stable corpus with a silently nulled column or a collapsed
distinct count is the failure mode that poisons every downstream job.
Design constraints at scale:

* ONE scan for the whole profile: every per-column statistic is a
  conditional aggregate in a single groupBy().agg(...) pass (Spark
  evaluates them columnar in one stage), then the 1 x (cols x stats) row
  unpivots driver-side via a literal explode — the corpus is never
  re-scanned per column, and nothing shuffles but one row.
* Distinct counts use count(DISTINCT col) per column in the same agg —
  Spark plans a single Expand (one extra map-side projection per distinct
  column) rather than per-column jobs.
* Constraint checks are the same shape: each rule is a SUM(CASE WHEN
  violated) column, so N rules still cost one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PROFILE_SCHEMA = (
    "column string, n_rows bigint, n_nulls bigint, n_distinct bigint"
)


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column, computed
    in ONE aggregation pass over the input."""
    cols = cols or [f.name for f in df.schema.fields]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            # coalesce: SUM over ZERO rows is NULL — an empty batch must
            # profile as n_nulls=0, not NULL
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias(f"__nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").cast("bigint").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return one.select(F.inline(per_col))


def check_constraints(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """(rule, n_violations, passed) for each (name, violation-predicate)
    rule — all rules evaluated in the same single scan."""
    aggs = [
        # coalesce: SUM over ZERO rows is NULL — an EMPTY batch passes
        # every rule (n_violations=0, passed=true), it doesn't return a
        # NULL verdict a DQ gate can neither accept nor reject
        F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias(name)
        for name, pred in rules
    ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(name).alias("n_violations"),
                (F.col(name) == 0).alias("passed"),
            )
            for name, _ in rules
        ]
    )
    return one.select(F.inline(rows))
