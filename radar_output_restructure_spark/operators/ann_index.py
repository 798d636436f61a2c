"""Persisted, cell-partitioned IVF index — the serving-side half of the ANN
story (the in-session operators in `similarity.py` are the build/query
half).

At 100 TB the corpus is indexed ONCE: every vector is assigned its home
coarse cell and the corpus is written `partitionBy(cell)` so each cell is
its own parquet directory. A probe then reads ONLY the `nprobe` cell
directories its queries hash to — Spark's partition pruning turns the cell
filter into a file-listing predicate, so a 16-cell index probed at
nprobe=4 scans 1/4 of the data and a 65k-cell production geometry scans
per-mille of it. Tests assert the pruning on the physical plan
(PartitionFilters + file counts), not just the result.

No reference analog (the reference never indexes embeddings); the design
is the standard FAISS/SCANN deployment shape re-expressed as parquet
layout + Catalyst partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.similarity import (
    _codebook_affinities,
    _seq_sq_sum,
    cosine,
    ivf_cells,
)
from math import sqrt as math_sqrt


def write_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize `corpus` as a cell-partitioned parquet index.

    Home-cell assignment is FUSED into the write scan (one Arrow pass that
    carries the vector through, `ivf_cells` arithmetic exactly) — deriving
    cells as a separate frame and joining back on vec_id would shuffle the
    full corpus for a join of two copies of the same scan. The only
    exchange in the job is the partitionBy write fan-out itself.
    """
    import numpy as np
    import pandas as pd

    cent_rows = sorted(
        centroids.select(
            F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid")
        ).collect(),
        key=lambda r: r.cell,
    )
    cells_arr = np.array([row.cell for row in cent_rows])
    cent_lists = [[float(x) for x in row.centroid] for row in cent_rows]
    cents = np.array(cent_lists, dtype=np.float64)
    cnorms = np.array([math_sqrt(_seq_sq_sum(c)) for c in cent_lists])
    id_type = corpus.schema[id_col].dataType.simpleString()
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    cell_type = centroids.schema[id_col].dataType.simpleString()

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            aff = _codebook_affinities(x, cents, cnorms)
            home = np.argsort(-aff, axis=1, kind="stable")[:, 0]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "embedding": pdf["__v"],
                    "cell": cells_arr[home],
                }
            )

    indexed = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v")
    ).mapInPandas(
        assign,
        f"vec_id {id_type}, embedding {vec_type}, cell {cell_type}",
    )
    indexed.write.mode(mode).partitionBy("cell").parquet(path)


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat top-k against a PERSISTED index: identical semantics to
    `cosine_topk_ivf` (probe the query's `nprobe` nearest cells, exact
    rounded cosine inside them, (sim desc, id asc) ranking), but candidate
    generation is a partition-pruned scan of only the probed cell
    directories — the dominant cost at scale is proportional to the probed
    fraction, not the corpus.
    """
    query_cells = ivf_cells(
        queries, centroids, id_col, vec_col, nprobe=nprobe
    ).select(F.col("vec_id").alias("query_id"), "cell")
    probe_rows = query_cells.collect()  # queries are driver-small by contract
    needed = sorted({r.cell for r in probe_rows})

    idx = spark.read.parquet(path).filter(F.col("cell").isin(needed))
    qc = spark.createDataFrame(probe_rows, query_cells.schema)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    sims = (
        idx.join(F.broadcast(qc), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def append_ivf_index(
    corpus_delta: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally ingest a delta batch into an existing persisted index.

    At 100 TB the index is never rebuilt for a daily arrival: the delta is
    assigned against the SAME frozen centroids (identical `ivf_cells`
    arithmetic, fused into the write scan) and appended as new parquet
    files inside the matching `cell=` directories — dynamic partition
    append, touching only the cells the delta hashes to. Probes see the
    union immediately and results are bit-identical to a full rebuild,
    because home-cell assignment is a pure per-vector function of the
    frozen centroids (order/batching cannot change it). Re-clustering
    (centroid drift as the distribution shifts) is a separate, deliberate
    rebuild — the FAISS/SCANN operational split re-expressed as parquet
    layout.
    """
    write_ivf_index(
        corpus_delta, centroids, path, id_col, vec_col, mode="append"
    )


def compact_ivf_index(
    spark: SparkSession,
    path: str,
    max_files_per_cell: int = 1,
) -> dict:
    """Rewrite cells whose parquet-file count exceeds `max_files_per_cell`
    back to one file each — the maintenance half of `append_ivf_index`.

    Daily appends land each delta as its own file inside every touched
    `cell=` directory, so after D days a probe of one cell opens O(D)
    small files; footer/open overhead starts to dominate the pruned scan
    the layout exists to provide. Compaction is Spark-native and
    storage-agnostic (works over file://, s3a://, abfs:// alike):

    * census via the `_metadata.file_path` column — cell + file path only,
      so column pruning keeps the scan at parquet-footer cost;
    * only CROWDED cells are re-read (partition-pruned scan) and
      `repartition("cell")` hash-routes each cell to exactly one task =
      one output file;
    * the write uses per-writer dynamic partitionOverwriteMode, replacing
      only the cell directories present in the rewritten frame — quiet
      cells are never listed, read, or touched, so the cost is
      O(crowded cells), not O(index).

    Probe results are unchanged by construction (same rows, same cells).
    Returns {"cells_compacted", "files_before", "files_after"} for the
    caller's maintenance accounting.
    """
    census = (
        spark.read.parquet(path)
        .select("cell", F.col("_metadata.file_path").alias("__f"))
        .groupBy("cell")
        .agg(F.countDistinct("__f").alias("n_files"))
        .filter(F.col("n_files") > max_files_per_cell)
        .collect()  # driver-small: one row per crowded cell
    )
    if not census:
        return {"cells_compacted": 0, "files_before": 0, "files_after": 0}
    crowded = sorted(r.cell for r in census)
    files_before = sum(r.n_files for r in census)
    # Spark refuses to overwrite a path it is concurrently reading from, so
    # the rewritten cells are materialized on the executors first
    # (localCheckpoint cuts the lineage back to the source files); the
    # footprint is bounded by the crowded-cell volume, not the index.
    rewritten = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(crowded))
        .repartition("cell")
        .localCheckpoint()
    )
    (
        rewritten.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell")
        .parquet(path)
    )
    return {
        "cells_compacted": len(crowded),
        "files_before": files_before,
        "files_after": len(crowded),
    }
