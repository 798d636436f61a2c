"""Z-order keys, salted aggregation, compaction planning."""

from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.zorder import (
    z_value_sql,
    z_order_stats,
)


def _ref_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_sql_matches_bitwise_reference():
    import random

    import duckdb

    con = duckdb.connect()
    random.seed(3)
    for bits in (8, 16):
        for _ in range(100):
            x = random.randrange(1 << bits)
            y = random.randrange(1 << bits)
            got = con.execute(
                f"SELECT {z_value_sql(str(x), str(y), bits)}"
            ).fetchone()[0]
            assert got == _ref_morton(x, y, bits), (bits, x, y)


def test_z_order_stats_buckets_are_rectangles(spark):
    """Every z-bucket of a dense 2-D grid covers a tight axis-aligned
    rectangle — the property that makes min/max file stats prune on
    EITHER dimension."""
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    rows = z_order_stats(df, "x", "y", bucket_bits=4, bits=8).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.n_rows == 256 * 256 // 16
        # a 2^12-z-cell bucket of a dense 8-bit grid is a 64x64 rectangle
        assert r.max_x - r.min_x == 63 and r.max_y - r.min_y == 63


def test_salted_agg_matches_plain(spark):
    from radar_output_restructure_spark.operators.skew import salted_agg

    # one giant hot key + several small ones
    df = spark.range(20000).select(
        F.when(F.col("id") < 18000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 5).cast("string")))
        .alias("k"),
        (F.col("id") % 997).alias("u"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    got = {
        r.k: (r.n, r.nd, r.s)
        for r in salted_agg(
            df,
            keys=["k"],
            aggs=[
                ("count", F.lit(1), "n"),
                ("count_distinct", F.col("u"), "nd"),
                ("sum", F.col("v").cast("long"), "s"),
            ],
            salt_col=F.col("u"),
            num_salts=8,
        ).collect()
    }
    ref = {
        r.k: (r.n, r.nd, r.s)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("u").alias("nd"),
            F.sum(F.col("v").cast("long")).alias("s"),
        )
        .collect()
    }
    assert got == ref


def test_salted_agg_rejects_unknown_kind(spark):
    import pytest

    from radar_output_restructure_spark.operators.skew import salted_agg

    df = spark.range(4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_agg(
            df,
            keys=["k"],
            aggs=[("median", F.col("k"), "m")],
            salt_col=F.col("k"),
        )


def test_compaction_bins_cut_rule(spark):
    from radar_output_restructure_spark.operators.compaction import (
        compaction_bins,
    )

    # group g: sizes 60,60,60 with target 100 -> cum_before 0,60,120 ->
    # bins 0,0,1 (greedy cut AFTER the target is crossed)
    rows = [("g", i, 60) for i in range(3)] + [("h", 0, 250)]
    df = spark.createDataFrame(rows, "grp string, fid int, sz int")
    out = {
        (r.grp, r.bin): (r.n_files, r.bin_bytes, r.first_key, r.last_key)
        for r in compaction_bins(df, "grp", "fid", "sz", 100).collect()
    }
    assert out == {
        ("g", 0): (2, 120, 0, 1),
        ("g", 1): (1, 60, 2, 2),
        ("h", 0): (1, 250, 0, 0),
    }
