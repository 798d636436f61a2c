"""Streaming ingestion into the persisted IVF index (ANN serving upkeep).

Embedding deltas arriving as parquet drops become index appends without a
rebuild: the Structured Streaming file source tracks which source files each
micro-batch covered (its checkpoint IS the processed-file ledger, exactly as
in streaming/stream_restructure.py), and every batch runs
`append_ivf_index` — home-cell assignment against the FROZEN centroids, new
files inside existing `cell=` directories, probe-identical to a rebuild.

Exactly-once contract (same write-then-commit shape as the batch manifest,
sources/manifest.py): foreachBatch replays a failed epoch with the SAME
batch_id, so the sink keeps a tiny `_ingest_ledger.json` holding the max
committed epoch id next to the index (written through the storage backend —
works over file:// and s3:// alike; epoch ids are strictly increasing, so
one integer suffices) and a replayed epoch at or below it is skipped. Parquet's v1 committer publishes a job's files only at job
commit, so the residual window is append-commit-vs-ledger-write — the same
window the reference accepts between file upload and offset commit
(worker/FileCache.kt:185 — accountant.process after the write).

Optional auto-compaction bounds small-file growth: after every committed
append, cells holding more than `compact_max_files_per_cell` files are
rewritten to one file each (content-preserving, idempotent — safe to run
after the ledger commit).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from radar_output_restructure_spark.operators.ann_index import (
    append_ivf_index,
    compact_ivf_index,
)
from radar_output_restructure_spark.sinks.storage import storage_for

LEDGER_NAME = "_ingest_ledger.json"


def make_batch_ingestor(
    spark: SparkSession,
    index_path: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_max_files_per_cell: int | None = None,
):
    """The foreachBatch sink: append-then-commit with epoch-replay skip.

    Exposed separately from `streaming_ivf_ingest` so the replay contract is
    directly testable: calling the returned function twice with the same
    batch_id appends exactly once.
    """
    storage = storage_for(index_path, spark)
    ledger = index_path.rstrip("/") + "/" + LEDGER_NAME

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Structured Streaming epoch ids are strictly increasing within a
        # checkpoint and only the LAST epoch can replay, so the ledger is
        # O(1): a single max committed id. (Corollary: the ledger and the
        # checkpoint share fate — pairing a fresh checkpoint with an
        # existing index+ledger restarts ids at 0 and would skip real
        # batches; start a new index or clear the ledger with the
        # checkpoint.)
        max_committed: int = (
            json.loads(storage.read(ledger))["max_committed_batch_id"]
            if storage.exists(ledger)
            else -1
        )
        if batch_id <= max_committed:
            return  # replayed epoch already fully committed
        append_ivf_index(
            batch_df.select(F.col(id_col), F.col(vec_col)),
            centroids,
            index_path,
            id_col=id_col,
            vec_col=vec_col,
        )
        storage.store_atomic(
            ledger,
            json.dumps({"max_committed_batch_id": batch_id}).encode(),
        )
        if compact_max_files_per_cell is not None:
            compact_ivf_index(
                spark, index_path, max_files_per_cell=compact_max_files_per_cell
            )

    return process_batch


def streaming_ivf_ingest(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    centroids: DataFrame,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    processing_interval: str | None = None,
    max_files_per_trigger: int = 1000,
    compact_max_files_per_cell: int | None = None,
) -> StreamingQuery:
    """Start the index-upkeep stream over a directory of embedding drops.

    `Trigger.AvailableNow` drains what exists and stops (cron-style upkeep);
    `processing_interval` keeps a resident poller. Either way the checkpoint
    carries the processed-file set across restarts, so re-running over the
    same directory ingests only new drops.
    """
    if schema is None:
        try:
            schema = spark.read.parquet(source_dir).schema
        except Exception:
            # no drops yet (fresh upkeep job started before the first
            # arrival): derive the schema from the index itself — appends
            # must match its layout anyway — under the caller's column names
            idx_schema = spark.read.parquet(index_path).schema
            schema = T.StructType(
                [
                    T.StructField(id_col, idx_schema["vec_id"].dataType),
                    T.StructField(vec_col, idx_schema["embedding"].dataType),
                ]
            )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            make_batch_ingestor(
                spark,
                index_path,
                centroids,
                id_col=id_col,
                vec_col=vec_col,
                compact_max_files_per_cell=compact_max_files_per_cell,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_interval:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()
