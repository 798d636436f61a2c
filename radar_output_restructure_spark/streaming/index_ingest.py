"""Streaming ingestion into the persisted IVF index (ANN serving upkeep).

Embedding deltas arriving as parquet drops become index appends without a
rebuild: the Structured Streaming file source tracks which source files each
micro-batch covered (its checkpoint IS the processed-file ledger, exactly as
in streaming/stream_restructure.py), and every batch appends the delta under
home-cell assignment against the FROZEN centroids — new files inside
existing `cell=` directories, probe-identical to a rebuild.

Exactly-once contract — two cooperating mechanisms:

* **Replay skip**: foreachBatch replays a failed epoch with the SAME
  batch_id, so the sink keeps a tiny `_ingest_ledger.json` holding the max
  committed epoch id next to the index (written through the storage
  backend — file:// and s3:// alike; epoch ids are strictly increasing, so
  one integer suffices) and a replayed epoch at or below it is skipped.
* **Idempotent append**: the residual window (append's job commit lands,
  crash before the ledger write, epoch replays) is closed by staging each
  epoch under `_epoch_staging/` and publishing an intent manifest — the
  exact destination file names, tagged `e{batch_id}-…` — BEFORE any file
  is moved into a `cell=` directory. A replay of an uncommitted epoch
  first deletes exactly the files its intent named, then re-appends; a
  replay of a committed epoch only clears leftover staging. Either way
  every vector lands exactly once, so `probe_ivf_index` stays
  rebuild-identical across any crash point. (The reference accepts the
  weaker at-least-once window between file upload and offset commit —
  worker/FileCache.kt:185, accountant.process after the write; the ledger
  + intent pair here is the batch manifest's write-then-commit shape,
  sources/manifest.py, extended with an undo log.)

Single-writer contract — the ledger is keyed by the owning run: epoch ids
only mean anything within ONE checkpoint lineage, so the ledger records a
`run_id` (the checkpoint location) and any batch arriving under a different
run_id fails loudly instead of silently skipping real batches. This covers
the footguns: a fresh checkpoint pointed at an existing index (batch ids
restart at 0, every early batch would have been "already committed"), a
second concurrent ingestor with its own checkpoint (interleaved epoch ids),
a run_id=None batch harness over a stream-owned ledger (its commit would
bump max_committed under the owner and erase the owner stamp), and an
UNOWNED ledger with committed epochs probed at or below max_committed (the
silent-skip case; a continuing lineage arriving ABOVE the ledger proceeds
and stamps ownership — the legacy-format upgrade path). Remediation is
deliberate by design: rebuild the index, or point the new run at a clean
source dir and delete `_ingest_ledger.json`.

Optional auto-compaction bounds small-file growth: after every committed
append, cells holding more than `compact_max_files_per_cell` files are
rewritten to one file each (content-preserving, idempotent, and its swap
manifest records the explicit old-file list — safe to run after the ledger
commit, and any pending swap is completed before the next epoch appends).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from radar_output_restructure_spark.operators.ann_index import (
    _checked_rename,
    _data_files,
    _hadoop_fs,
    _publish_json,
    _read_json,
    compact_ivf_index,
    recover_pending_swap,
    write_ivf_index,
)
from radar_output_restructure_spark.sinks.storage import storage_for

LEDGER_NAME = "_ingest_ledger.json"
EPOCH_STAGING_DIR = "_epoch_staging"
EPOCH_INTENT_NAME = "_EPOCH_INTENT.json"


def _read_ledger(storage, ledger_path: str) -> dict:
    if not storage.exists(ledger_path):
        return {"max_committed_batch_id": -1, "run_id": None}
    state = json.loads(storage.read(ledger_path))
    state.setdefault("run_id", None)
    return state


def _recover_epoch_staging(
    spark: SparkSession, index_path: str, max_committed: int
) -> None:
    """Undo (or just clean up) whatever a crashed epoch append left behind.

    Intent present + its epoch UNcommitted: the crash hit mid-move or
    before the ledger write — delete exactly the destination files the
    intent named (never a directory listing: committed epochs' files are
    untouchable) and drop staging so the replay re-appends from scratch.
    Intent present + epoch committed: the crash hit after the ledger write,
    before cleanup — the moves all happened (the ledger is written last),
    so only staging needs dropping. No intent: staging is pre-publish
    garbage.
    """
    fs, jvm = _hadoop_fs(spark, index_path)
    staging = f"{index_path}/{EPOCH_STAGING_DIR}"
    jstaging = jvm.org.apache.hadoop.fs.Path(staging)
    if not fs.exists(jstaging):
        return
    jintent = jvm.org.apache.hadoop.fs.Path(f"{staging}/{EPOCH_INTENT_NAME}")
    if fs.exists(jintent):
        intent = _read_json(fs, jvm, f"{staging}/{EPOCH_INTENT_NAME}")
        if intent["batch_id"] > max_committed:
            for cell, dest_names in intent["moves"].items():
                for name in dest_names:
                    p = jvm.org.apache.hadoop.fs.Path(
                        f"{index_path}/cell={cell}/{name}"
                    )
                    if fs.exists(p):
                        fs.delete(p, False)
    fs.delete(jstaging, True)


def _append_epoch(
    spark: SparkSession,
    batch_df: DataFrame,
    centroids: DataFrame,
    index_path: str,
    batch_id: int,
    id_col: str,
    vec_col: str,
) -> None:
    """Stage the epoch's cell-assigned files, publish the intent, move in.

    The intent manifest (exact destination names, `e{batch_id}-` tagged so
    epochs never collide) is published via tmp+rename BEFORE the first
    move, so _recover_epoch_staging can always undo a partial epoch
    without listing or touching any other epoch's files.
    """
    staging = f"{index_path}/{EPOCH_STAGING_DIR}"
    write_ivf_index(
        batch_df, centroids, staging, id_col, vec_col, mode="overwrite"
    )
    fs, jvm = _hadoop_fs(spark, index_path)
    jstaging = jvm.org.apache.hadoop.fs.Path(staging)
    cells = [
        st.getPath().getName().split("=", 1)[1]
        for st in fs.listStatus(jstaging)
        if st.isDirectory() and st.getPath().getName().startswith("cell=")
    ]
    moves = {
        cell: {
            name: f"e{batch_id}-{name}"
            for name in _data_files(fs, jvm, f"{staging}/cell={cell}")
        }
        for cell in cells
    }
    intent = {
        "batch_id": batch_id,
        "moves": {c: sorted(m.values()) for c, m in moves.items()},
    }
    _publish_json(fs, jvm, f"{staging}/{EPOCH_INTENT_NAME}", intent)
    for cell, m in moves.items():
        dest_dir = jvm.org.apache.hadoop.fs.Path(f"{index_path}/cell={cell}")
        if not fs.exists(dest_dir):
            fs.mkdirs(dest_dir)
        for src_name, dest_name in m.items():
            _checked_rename(
                fs,
                jvm,
                f"{staging}/cell={cell}/{src_name}",
                f"{index_path}/cell={cell}/{dest_name}",
            )


def make_batch_ingestor(
    spark: SparkSession,
    index_path: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_max_files_per_cell: int | None = None,
    run_id: str | None = None,
):
    """The foreachBatch sink: recover, append idempotently, then commit.

    Exposed separately from `streaming_ivf_ingest` so the replay contract
    is directly testable: calling the returned function twice with the
    same batch_id appends exactly once, and a partial first attempt (crash
    at any point) is undone before the retry re-appends.

    `run_id` is the ownership key for the single-writer contract — the
    streaming entry point passes its checkpoint location. A ledger owned
    by ANYONE else raises instead of misinterpreting its epoch ids: a
    different named run, and equally a run_id=None batch harness over an
    owned ledger (its commit would bump max_committed under the owner and
    erase the owner stamp — silent epoch skips for the owning stream). An
    UNOWNED ledger that already holds committed epochs (a None harness's,
    or the pre-ownership format) raises exactly when the replay-skip rule
    would bite — `batch_id <= max_committed`, i.e. a fresh checkpoint
    restarting at 0 — while a continuing lineage (`batch_id` beyond the
    ledger, e.g. the same stream resuming over its own pre-ownership
    ledger) proceeds and stamps ownership at its first commit.
    """
    storage = storage_for(index_path, spark)
    ledger = index_path.rstrip("/") + "/" + LEDGER_NAME

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _read_ledger(storage, ledger)
        owner = state["run_id"]
        max_committed: int = state["max_committed_batch_id"]
        if owner is not None and run_id != owner:
            # Covers both a DIFFERENT named run and a run_id=None harness:
            # a None-harness commit over an owned ledger would bump
            # max_committed and erase the owner, making the owning stream
            # silently skip its next epochs (or fail its ownership check).
            raise RuntimeError(
                f"ingest ledger {ledger} is owned by run {owner!r} but "
                f"this ingestor runs as {run_id!r}: epoch ids from "
                "different checkpoints are not comparable, so proceeding "
                "would silently skip or duplicate batches. Reuse the "
                "original checkpoint, or rebuild the index (or point the "
                "new run at a clean source dir) and delete the ledger to "
                "transfer ownership."
            )
        if run_id is not None and owner is None and batch_id <= max_committed:
            # An UNOWNED ledger with committed epochs (run_id=None harness
            # or pre-ownership format): its epoch ids came from some other
            # lineage, so the replay-skip rule below must not be trusted
            # with them. Raise exactly when it would bite — a batch id at
            # or under max_committed (a fresh checkpoint restarting at 0).
            # A CONTINUING lineage (batch_id > max_committed, e.g. the
            # same stream resuming over its own pre-ownership ledger)
            # proceeds and stamps ownership at commit.
            raise RuntimeError(
                f"ingest ledger {ledger} holds committed epochs up to "
                f"{max_committed} but no owning run, and this ingestor "
                f"({run_id!r}) arrived with batch {batch_id}: adopting the "
                "ledger would silently skip this run's early batches. "
                "Rebuild the index (or point this run at a clean source "
                "dir) and delete the ledger to transfer ownership."
            )
        # Undo any partial epoch and finish any published compaction swap
        # BEFORE appending — recovery must never run with this epoch's
        # fresh files already in the cell dirs (r8 review: a post-publish
        # swap recovery that ran after the append deleted committed rows).
        _recover_epoch_staging(spark, index_path, max_committed)
        recover_pending_swap(spark, index_path)
        if batch_id <= max_committed:
            return  # replayed epoch already fully committed
        _append_epoch(
            spark,
            batch_df.select(F.col(id_col), F.col(vec_col)),
            centroids,
            index_path,
            batch_id,
            id_col,
            vec_col,
        )
        storage.store_atomic(
            ledger,
            json.dumps(
                {
                    "max_committed_batch_id": batch_id,
                    # never erase an owner (a None harness can only get
                    # here over an unowned ledger, but keep it structural)
                    "run_id": run_id if run_id is not None else owner,
                }
            ).encode(),
        )
        # post-commit cleanup of the epoch's staging (crash here is benign:
        # recovery sees a committed intent and just re-drops staging)
        fs, jvm = _hadoop_fs(spark, index_path)
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{index_path}/{EPOCH_STAGING_DIR}"),
            True,
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
    same directory ingests only new drops. The checkpoint location doubles
    as the ledger's ownership key: a second ingestor (fresh checkpoint or a
    concurrent replica) against the same index fails loudly on its first
    batch instead of silently skipping epochs.
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
                run_id=checkpoint_dir,
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
