"""Regression tests for the round-11 /code-review pass over the lakehouse
operators (ranking, profile, skew, compaction, zorder).

1. global_rank materializes its range-sorted frame ONCE: the range sampler
   re-draws boundaries per action, so the count job and the rank job saw
   different partitionings — duplicated/gapped ranks at real row counts.
2. profile_columns / check_constraints return 0/True on an EMPTY batch
   (SUM over zero rows is NULL; a DQ gate can't act on passed=NULL).
3. salted_agg rejects count_distinct over two different columns: one salt
   can be a pure function of at most one of them.
4. compaction_bins uses integer division for bin ids: double division is
   exact only below 2^53 cumulative bytes.
5. zorder validates bits <= 16 and bucket_bits <= 2*bits instead of
   silently colliding z-values / diverging on negative shifts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.compaction import (
    compaction_bins,
    compaction_bins_sql,
)
from radar_output_restructure_spark.operators.profile import (
    check_constraints,
    profile_columns,
)
from radar_output_restructure_spark.operators.ranking import global_rank
from radar_output_restructure_spark.operators.skew import salted_agg
from radar_output_restructure_spark.operators.zorder import (
    spread_bits_sql,
    z_order_stats,
    z_order_stats_sql,
)


# ---------------------------------------------------------------------------
# 1. global_rank exactness at row counts where the sampler re-draws
# ---------------------------------------------------------------------------


def test_global_rank_exact_at_scale(spark):
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 1_000_003).alias("key"),
        F.col("id"),
    )
    ranked = global_rank(df, [F.col("key"), F.col("id")])
    got = ranked.select("rank").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("rank").alias("n_distinct"),
        F.min("rank").alias("mn"),
        F.max("rank").alias("mx"),
    ).first()
    assert (got["n"], got["n_distinct"], got["mn"], got["mx"]) == (
        n, n, 1, n,
    ), "ranks must be a permutation of 1..n (no dups, no gaps)"
    # and rank order IS key order (spot-check the extremes + a window
    # cross-check on a sample small enough for the single-partition window)
    sample = ranked.filter(F.col("rank") <= 1000)
    from pyspark.sql.window import Window

    w = Window.orderBy("key", "id")
    bad = (
        sample.withColumn("expect", F.row_number().over(w))
        .filter(F.col("rank") != F.col("expect"))
        .count()
    )
    assert bad == 0


def test_global_rank_guards(spark):
    df = spark.createDataFrame([(1, "a")], "`event type` long, rank string")
    with pytest.raises(ValueError, match="collides"):
        global_rank(df, [F.col("`event type`")], rank_col="rank")
    # exotic column names survive the StructType output schema
    out = global_rank(df, [F.col("`event type`")], rank_col="r").collect()
    assert out[0]["r"] == 1


# ---------------------------------------------------------------------------
# 2. empty-batch DQ verdicts
# ---------------------------------------------------------------------------


def test_profile_and_constraints_on_empty_batch(spark):
    empty = spark.createDataFrame([], "a long, b string")
    prof = {r["column"]: r for r in profile_columns(empty).collect()}
    assert prof["a"]["n_rows"] == 0
    assert prof["a"]["n_nulls"] == 0, "SUM-over-zero-rows NULL leaked out"
    checks = check_constraints(
        empty, [("a_nonnull", F.col("a").isNull())]
    ).collect()
    assert checks[0]["n_violations"] == 0
    assert checks[0]["passed"] is True, "an empty batch passes every rule"


# ---------------------------------------------------------------------------
# 3. multi-column count_distinct rejected
# ---------------------------------------------------------------------------


def test_salted_agg_rejects_two_distinct_columns(spark):
    df = spark.createDataFrame(
        [("k", 1, 2)], "k string, u1 long, u2 long"
    )
    with pytest.raises(ValueError, match="single column"):
        salted_agg(
            df,
            ["k"],
            [
                ("count_distinct", F.col("u1"), "a"),
                ("count_distinct", F.col("u2"), "b"),
            ],
            salt_col=F.col("u1"),
        )
    # single distinct column still works
    out = salted_agg(
        df, ["k"], [("count_distinct", F.col("u1"), "a")],
        salt_col=F.col("u1"),
    ).collect()
    assert out[0]["a"] == 1


# ---------------------------------------------------------------------------
# 4. integer-division bin ids beyond 2^53
# ---------------------------------------------------------------------------


def test_compaction_bins_exact_beyond_double_precision(spark):
    import duckdb

    big = 9007199254740995  # 2^53 + 3: not representable as double
    target = 3
    rows = [("g", 1, big), ("g", 2, 10)]
    df = spark.createDataFrame(rows, "g string, k long, size long")
    got = {
        r["first_key"]: r["bin"]
        for r in compaction_bins(df, "g", "k", "size", target).collect()
    }
    # the SECOND file starts at cumulative offset `big`
    expected_bin = big // target
    assert got[2] == expected_bin, (
        "double division truncated the bin id below the exact quotient"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE files AS SELECT * FROM (VALUES "
                f"('g', 1, {big}), ('g', 2, 10)) t(g, k, size)")
    oracle = {
        r[4]: r[1]
        for r in con.execute(
            compaction_bins_sql("files", "g", "k", "size", target)
        ).fetchall()
    }
    assert oracle[2] == expected_bin


# ---------------------------------------------------------------------------
# 5. zorder parameter guards
# ---------------------------------------------------------------------------


def test_zorder_guards(spark):
    with pytest.raises(ValueError, match="1..16"):
        spread_bits_sql("x", bits=20)
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="bucket_bits"):
        z_order_stats(df, "x", "y", bucket_bits=8, bits=3)
    with pytest.raises(ValueError, match="bucket_bits"):
        z_order_stats_sql("t", "x", "y", bucket_bits=8, bits=3)
