"""Single-scan profiling / constraint operators."""

from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.profile import (
    check_constraints,
    profile_columns,
)


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "id bigint, tag string",
    )
    rows = {r.column: r for r in profile_columns(df).collect()}
    assert rows["id"].n_rows == 4
    assert rows["id"].n_nulls == 1 and rows["id"].n_distinct == 3
    assert rows["tag"].n_nulls == 1 and rows["tag"].n_distinct == 2


def test_profile_single_scan_plan(spark):
    """All columns profile in ONE aggregation pass — exactly one scan of
    the input in the physical plan."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("a"), (F.col("id") % 5).alias("b")
    )
    plan = (
        profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.lower().count("range (0, 100") == 1


def test_check_constraints(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, -5), (3, 7)], "id bigint, v bigint"
    )
    out = {
        r.rule: (r.n_violations, r.passed)
        for r in check_constraints(
            df,
            [
                ("v_positive", F.col("v") < 0),
                ("id_not_null", F.col("id").isNull()),
            ],
        ).collect()
    }
    assert out == {"v_positive": (1, False), "id_not_null": (0, True)}
