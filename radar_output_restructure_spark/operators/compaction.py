"""Small-file compaction planning — the lakehouse maintenance operator
that turns a listing of many small files (or documents) into target-sized
output groups.

At 100 TB the failure mode is millions of kilobyte files per partition
(streaming sinks and per-topic appenders produce exactly this; the
reference's writer caches exist to fight it, SURVEY §2 O1). A compactor
never rewrites blindly — it first PLANS: order each partition's files
deterministically, walk the cumulative size, and cut a new output group
every `target` bytes. The plan is what gets audited and executed.

The cut rule is cumulative-prefix binning: a file starting at cumulative
offset c goes to bin floor(c / target). It is a one-pass streaming rule
(the same greedy cut a single-threaded compactor makes walking the
listing in order), expressible as a window cumsum — so the plan for a
billion-file listing is one partitioned window, no driver loop. Exact in
both engines: the cumsum is a BIGINT window sum and the bin id is BIGINT
integer division (Spark `div`, DuckDB `//`) — no float path anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_bins(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    target: int,
) -> DataFrame:
    """(group, bin, n_files, bin_bytes, first/last order key) compaction
    plan: per `group_col`, files ordered by `order_col` are packed
    greedily into bins of ~`target` cumulative `size_col`.

    `order_col` MUST be unique within each group (a file path / id):
    the cumulative cut depends entirely on walk order, and rows tying on
    the key would bin nondeterministically — differently per run and
    differently from the oracle (same rule as ranking.global_rank's
    strict-total-order requirement).

    ONE shuffle (window partition on the group key; the groupBy(group,
    bin) that follows re-uses the same partitioning, so AQE coalesces it
    without a second exchange). Per-group window sort is the scale
    constraint — a group is one topic-partition's listing, bounded by
    retention, not by corpus size; a skewed giant group is exactly the
    group that NEEDS compaction and still sorts on one task, which is why
    real compactors shard pathological partitions by date first.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum(size_col).over(w) - F.col(size_col)).cast("long")
    # `div` (integer division), NOT `/`: long/long is DOUBLE division in
    # both engines, exact only below 2^53 cumulative bytes (~9 PB of
    # group size sounds remote until one group is a whole un-sharded
    # table); a 1-ulp-low quotient truncates into the wrong bin silently
    staged = df.select(
        F.col(group_col),
        F.col(order_col),
        F.col(size_col),
        cum_before.alias("__cum_before"),
    ).select(
        group_col,
        order_col,
        size_col,
        F.expr(f"__cum_before div {int(target)}").cast("long").alias("bin"),
    )
    return staged.groupBy(group_col, "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(size_col).cast("long").alias("bin_bytes"),
        F.min(order_col).alias("first_key"),
        F.max(order_col).alias("last_key"),
    )


def compaction_bins_sql(
    table_expr: str,
    group_col: str,
    order_col: str,
    size_col: str,
    target: int,
) -> str:
    """DuckDB oracle: the identical cumulative-prefix cut rule."""
    return f"""
    WITH c AS (
      SELECT {group_col}, {order_col}, {size_col},
             CAST(sum({size_col}) OVER (
               PARTITION BY {group_col} ORDER BY {order_col}
               ROWS UNBOUNDED PRECEDING
             ) - {size_col} AS BIGINT) AS cum_before
      FROM {table_expr}
    )
    SELECT {group_col}, CAST(
             cum_before // {target} AS BIGINT
           ) AS bin,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum({size_col}) AS BIGINT) AS bin_bytes,
           min({order_col}) AS first_key,
           max({order_col}) AS last_key
    FROM c
    GROUP BY 1, 2
    """
