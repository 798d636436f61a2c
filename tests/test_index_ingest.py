"""Streaming IVF index upkeep: exactly-once drop ingestion across restarts,
epoch-replay skip via the ingest ledger, and optional auto-compaction."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from radar_output_restructure_spark.operators.ann_index import (
    probe_ivf_index,
    write_ivf_index,
)
from radar_output_restructure_spark.sources.tables import load_table
from radar_output_restructure_spark.streaming.index_ingest import (
    make_batch_ingestor,
    streaming_ivf_ingest,
)


def _drop(df, src_dir: str, name: str) -> None:
    """Write `df` as a single parquet FILE named `name` inside `src_dir`
    (the file source reads files, not nested dirs)."""
    tmp = src_dir + "/.tmp_" + name
    df.coalesce(1).write.parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, name))
    shutil.rmtree(tmp)


def _content(spark, path):
    return {(r.vec_id, r.cell) for r in spark.read.parquet(path).collect()}


def test_streaming_ingest_exactly_once_across_restarts(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16)
    queries = emb.filter(F.col("vec_id") < 5)
    index = str(tmp_path / "index")
    src = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    write_ivf_index(emb.filter(F.col("vec_id") < 150), centroids, index)
    _drop(emb.filter("vec_id >= 150 and vec_id < 300"), src, "d1.parquet")
    _drop(emb.filter("vec_id >= 300 and vec_id < 450"), src, "d2.parquet")

    q = streaming_ivf_ingest(
        spark, src, index, centroids, ckpt, schema=emb.schema
    )
    q.awaitTermination(120)
    expect_450 = str(tmp_path / "full450")
    write_ivf_index(emb.filter(F.col("vec_id") < 450), centroids, expect_450)
    assert _content(spark, index) == _content(spark, expect_450)

    # restart over the same dir with one NEW drop: only the new file is
    # ingested (checkpoint carries the processed-file set), no duplicates
    _drop(emb.filter("vec_id >= 450"), src, "d3.parquet")
    q2 = streaming_ivf_ingest(
        spark, src, index, centroids, ckpt, schema=emb.schema
    )
    q2.awaitTermination(120)
    expect_all = str(tmp_path / "full_all")
    write_ivf_index(emb, centroids, expect_all)
    assert _content(spark, index) == _content(spark, expect_all)

    # and the probe agrees with the full rebuild exactly
    probe = lambda p: {  # noqa: E731
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in probe_ivf_index(
            spark, p, queries, centroids, k=5, nprobe=4
        ).collect()
    }
    assert probe(index) == probe(expect_all)

    # idle restart: nothing new -> index untouched
    before = _content(spark, index)
    q3 = streaming_ivf_ingest(
        spark, src, index, centroids, ckpt, schema=emb.schema
    )
    q3.awaitTermination(120)
    assert _content(spark, index) == before


def test_batch_ingestor_replay_skip_and_autocompact(spark, sf_dir, tmp_path):
    """A replayed epoch (same batch_id) appends exactly once, and the
    auto-compact option keeps every cell at one file."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16)
    index = str(tmp_path / "index")
    write_ivf_index(emb.filter(F.col("vec_id") < 150), centroids, index)

    ingest = make_batch_ingestor(
        spark, index, centroids, compact_max_files_per_cell=1
    )
    delta = emb.filter("vec_id >= 150 and vec_id < 300")
    ingest(delta, 7)
    after_first = _content(spark, index)
    ingest(delta, 7)  # replay of the SAME epoch: ledger skips it
    assert _content(spark, index) == after_first
    assert len(after_first) == emb.filter("vec_id < 300").count()

    ingest(emb.filter("vec_id >= 300"), 8)  # next epoch still lands
    assert len(_content(spark, index)) == emb.count()
    # auto-compaction ran after each commit: one file per cell
    for d in glob.glob(os.path.join(index, "cell=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d


def test_streaming_ingest_starts_on_empty_drop_dir(spark, sf_dir, tmp_path):
    """A fresh upkeep job started before the first drop arrives must drain
    zero files and exit cleanly (schema falls back to the index layout)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 16)
    index = str(tmp_path / "index")
    src = str(tmp_path / "drops")
    os.makedirs(src)
    write_ivf_index(emb, centroids, index)
    before = _content(spark, index)
    q = streaming_ivf_ingest(
        spark, src, index, centroids, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert _content(spark, index) == before
