"""Distributed global rank: exactness on heavy ties + no global window."""

import pytest
from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.ranking import global_rank


def test_global_rank_matches_window(spark):
    # skewed, tie-heavy keys: many rows share score, unique id breaks ties
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 7).alias("score")
    )
    got = {
        r.id: r.rank
        for r in global_rank(
            df, [F.col("score").desc(), F.col("id").asc()]
        ).collect()
    }
    ref = {
        r.id: r.rank
        for r in df.withColumn(
            "rank",
            F.expr(
                "row_number() OVER (ORDER BY score DESC, id ASC)"
            ).cast("bigint"),
        ).collect()
    }
    assert got == ref
    assert sorted(got.values()) == list(range(1, 5001))


def test_global_rank_plan_is_distributed(spark):
    """The point of the operator: NO window over an empty partition spec
    (the single-partition global sort). Since the r11 exactness fix the
    range-sorted frame is localCheckpoint-ed (the sampler re-draws
    boundaries per action, so both passes must read ONE materialization);
    the rank plan therefore reads the checkpoint RDD, and the range
    exchange lives in the checkpointed upstream plan."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 3 % 11).alias("score")
    )
    ranked = global_rank(df, [F.col("score").asc(), F.col("id").asc()])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "mapinpandas" in plan.lower()
    assert "window" not in plan.lower()
    assert "singlepartition" not in plan.lower()
    # (AQE coalesces a 100-row range shuffle to one partition, so the
    # multi-partition property is asserted by the 200k-row exactness test
    # in test_review_r11_lakehouse.py, not here)


def test_global_rank_empty_and_single_row(spark):
    df = spark.range(1).select(F.col("id"))
    rows = global_rank(df, [F.col("id").asc()]).collect()
    assert len(rows) == 1 and rows[0].rank == 1
    empty = spark.range(0).select(F.col("id"))
    assert global_rank(empty, [F.col("id").asc()]).count() == 0
