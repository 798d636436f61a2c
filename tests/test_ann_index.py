"""Persisted cell-partitioned IVF index: asserts the partition-pruning
physical-plan property (the probe reads ONLY the probed cell directories)
plus exact parity with the in-session IVF-flat operator."""

from __future__ import annotations

import contextlib
import glob
import io
import os

from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.ann_index import (
    probe_ivf_index,
    write_ivf_index,
)
from radar_output_restructure_spark.operators.similarity import cosine_topk_ivf
from radar_output_restructure_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_ivf_index_prunes_and_matches(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16)
    queries = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf_index")

    write_ivf_index(emb, centroids, path)
    cell_dirs = sorted(glob.glob(os.path.join(path, "cell=*")))
    assert len(cell_dirs) > 4, cell_dirs  # corpus spreads over many cells

    probed = probe_ivf_index(
        spark, path, queries, centroids, k=5, nprobe=4
    )
    plan = _plan(probed)
    # the cell filter must reach the scan as a partition (not data) filter
    assert "PartitionFilters" in plan
    assert "cell IN" in plan or "cell#" in plan.split("PartitionFilters", 1)[1][:400]

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim) for r in probed.collect()
    }
    expect = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in cosine_topk_ivf(
            emb, queries, centroids, k=5, nprobe=4
        ).collect()
    }
    assert got == expect

    # pruning is physical: 5 queries x nprobe=4 probe at most 20 distinct
    # cells, and any unprobed cell's directory is never listed in the scan
    probed_cells = {
        r.cell
        for r in spark.read.parquet(path)
        .join(
            probed.select("neighbor_id"),
            F.col("vec_id") == F.col("neighbor_id"),
            "leftsemi",
        )
        .select("cell")
        .distinct()
        .collect()
    }
    unprobed = [
        d
        for d in cell_dirs
        if d.rsplit("cell=", 1)[1] not in {str(c) for c in probed_cells}
    ]
    if unprobed:  # at least one cell escaped the probe set
        marker = f"cell={unprobed[0].rsplit('cell=', 1)[1]}"
        scan_section = plan.split("PartitionFilters", 1)[1]
        assert marker not in scan_section
