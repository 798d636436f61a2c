"""snapshot_delta_dedup: all three classifications, min-id survivor rule."""

from __future__ import annotations

from radar_output_restructure_spark.operators.dedup_scale import (
    snapshot_delta_dedup,
)


def test_snapshot_delta_all_statuses(spark):
    hist = spark.createDataFrame(
        [(1, "old content"), (2, "shared content")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "shared content"),   # digest already in history
            (11, "fresh content"),    # genuinely new, canonical
            (12, "fresh content"),    # batch-internal duplicate of 11
            (13, "unique content"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in snapshot_delta_dedup(batch, hist).collect()}
    assert out == {
        10: "dup_of_history",
        11: "new",
        12: "dup_in_batch",
        13: "new",
    }


def test_snapshot_delta_history_beats_batch_dup(spark):
    """A digest both in history AND repeated in the batch is history-dup
    for every batch row (history is the stronger claim)."""
    hist = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "x"), (11, "x")], "doc_id long, text string"
    )
    out = {r.doc_id: r.status for r in snapshot_delta_dedup(batch, hist).collect()}
    assert out == {10: "dup_of_history", 11: "dup_of_history"}
