"""Bucketed co-located join: the write-once-shuffle-never pattern. Asserts
the physical plan property (no Exchange between two same-bucketed scans),
not just the result."""

from __future__ import annotations

import contextlib
import io

from radar_output_restructure_spark.operators.bucketing import bucketed_join, write_bucketed
from radar_output_restructure_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", "l_orderkey", num_buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", "l_orderkey", num_buckets=8,
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-bcast
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan.replace("ReusedExchange", "")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # correctness: same count as the plain (shuffling) join
        li2 = load_table(spark, sf_dir, "lineitem")
        o2 = load_table(spark, sf_dir, "orders")
        expect = li2.join(o2, li2.l_orderkey == o2.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_agg_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "b_li_agg", "l_orderkey", num_buckets=8)
    try:
        agg = spark.table("b_li_agg").groupBy("l_orderkey").count()
        plan = _plan(agg)
        assert "Exchange" not in plan.replace("ReusedExchange", "")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_salted_agg_rand_salt_matches_direct(spark, sf_dir):
    """The salt_col=None (seeded-rand) path of skew.salted_agg — the former
    bucketing.salted_agg variant, folded in per the r7 verdict item 7 —
    recombines associative aggs exactly."""
    from pyspark.sql import functions as F

    from radar_output_restructure_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    # simulate skew: collapse most rows onto one key
    skewed = ev.withColumn("k", (F.col("user_id") % 3 == 0).cast("int"))
    direct = {
        (r.k): (r.n, r.total)
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("long")).alias("total"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total)
        for r in salted_agg(
            skewed.withColumn("cents", F.round(F.col("value") * 100).cast("long")),
            ["k"],
            [("count", F.col("k"), "n"), ("sum", F.col("cents"), "total")],
            num_salts=8,
        ).collect()
    }
    assert salted == direct

    # a rand() salt cannot split COUNT(DISTINCT): refuse, don't over-count
    import pytest

    with pytest.raises(ValueError, match="count_distinct"):
        salted_agg(skewed, ["k"], [("count_distinct", F.col("user_id"), "u")])


def test_bucketed_join_sales_query_plan(spark, sf_dir):
    """The REGISTRY query (queries.bucketed_join_sales) must ride the
    bucketed layout: the join sees no Exchange below it (only the final
    small aggregation may shuffle)."""
    from radar_output_restructure_spark.queries import QUERIES

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["bucketed_join_sales"](spark, sf_dir)
        plan = _plan(df)
        join_at = plan.find("SortMergeJoin")
        if join_at < 0:
            join_at = plan.find("ShuffledHashJoin")
        assert join_at >= 0
        # formatted plans list operators leaves-first: any Exchange feeding
        # the join would appear BEFORE it in the operator tree section
        tree = plan[: plan.index("(1) ")] if "(1) " in plan else plan
        join_line = next(
            ln for ln in tree.splitlines() if "MergeJoin" in ln or "HashJoin" in ln
        )
        join_depth = len(join_line) - len(join_line.lstrip())
        below = tree[tree.index(join_line) :].splitlines()[1:]
        for ln in below:
            depth = len(ln) - len(ln.lstrip())
            if ln.strip() and depth <= join_depth:
                break
            assert "Exchange" not in ln, f"shuffle below the bucketed join: {ln}"
        assert {r.o_orderpriority for r in df.collect()} and df.count() == 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
