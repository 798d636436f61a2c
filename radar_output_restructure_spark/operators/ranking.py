"""Distributed global ranking — exact total-order row_number WITHOUT the
single-partition window.

`row_number() OVER (ORDER BY ...)` with no PARTITION BY is the classic
scale-killer: Spark plans it as a global sort into ONE partition and
windows the whole corpus on one task. The distributed equivalent is the
two-pass range-sort ranking every external-sort system uses:

1. `repartitionByRange` on the order keys (range partitioner: every key in
   partition i sorts before every key in partition i+1) + sort within
   partitions — the normal PARALLEL distributed sort — MATERIALIZED once
   (localCheckpoint), because the range sampler re-draws boundaries per
   action and the two passes below must see the same physical partitions;
2. count rows per partition (a JVM-side groupBy over
   `spark_partition_id()`, ~numPartitions rows collected to the driver —
   one reduce over the checkpointed partitions);
3. a second map-only pass adds each partition's cumulative offset to its
   local 0-based position.

The output is exact and unique whenever the order keys form a strict
total order (callers append a unique tiebreaker column), and it does NOT
depend on where the sampled range boundaries fall — boundaries only move
work between tasks, never a row's global position. Cost: the one range
shuffle any distributed sort pays, plus a metadata-sized count job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """Append a 1-based exact global rank under ORDER BY `order_cols`.

    `order_cols` must define a strict total order (include a unique id as
    the last key). All input columns pass through unchanged.
    """
    import numpy as np
    from pyspark.sql import types as T

    if rank_col in df.columns:
        raise ValueError(
            f"rank_col {rank_col!r} collides with an existing column"
        )
    # MATERIALIZE the range-sorted frame before the count: the count and
    # the rank pass are two separate actions, and repartitionByRange
    # RE-SAMPLES its boundaries per action (the sampler seed derives from
    # the execution's rdd id — measured: the same plan run twice split
    # 500k rows (238696, 261304) then (249299, 250701)). Offsets from
    # job 1 applied to job 2's different partitioning would duplicate and
    # gap ranks. The checkpoint pins one physical partitioning both jobs
    # read; it is the price of exactness, and it replaces the sort's own
    # shuffle files rather than adding a second copy of the data.
    sorted_df = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # numPartitions rows — metadata, not data; pid order IS key order
    # under a range partitioner
    sizes = {r["__pid"]: r["count"] for r in sorted_df.groupBy("__pid").count().collect()}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    out_schema = T.StructType(
        [f for f in sorted_df.schema.fields if f.name != "__pid"]
        + [T.StructField(rank_col, T.LongType())]
    )

    def add_rank(batches):
        # mapInPandas feeds ONE partition's batches in order, so the
        # running position is the partition-local 0-based row index
        pos = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf.drop(columns=["__pid"]).copy()
            out[rank_col] = np.arange(
                base + pos + 1, base + pos + 1 + len(pdf), dtype=np.int64
            )
            pos += len(pdf)
            yield out

    return sorted_df.mapInPandas(add_rank, out_schema)
