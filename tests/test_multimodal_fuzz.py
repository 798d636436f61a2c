"""Malformed-payload fuzz over the multimodal operators (r10 verdict item
4): truncated/garbage/NULL WAV/BMP/PNG/GIF/JPEG/MP4 bytes must produce
NULL features (extractors) or drop the payload (fingerprint/frame
expanders) — NEVER crash an executor task. Only well-formed fixtures were
exercised before this suite.
"""

from __future__ import annotations

import pytest

from radar_output_restructure_spark.operators.multimodal import (
    audio_features,
    audio_fingerprint_features,
    audio_frame_rms,
    gif_frame_features,
    image_dhash_features,
    image_features,
    resize_images,
    video_metadata,
)
from tests.test_text_ops import (
    _make_bmp,
    _make_gif,
    _make_jpeg_gray,
    _make_mp4,
    _make_png,
    _make_wav,
)


def _good_gif():
    import numpy as np

    idx = np.zeros((4, 4), dtype=np.uint8)
    idx[:2, :2] = 1
    return _make_gif(idx, [(255, 0, 0), (0, 255, 0)])


def _payloads(valid: bytes):
    """[(doc_id, payload)]: one valid payload + the adversarial set."""
    return [
        (0, valid),
        (1, None),
        (2, b""),
        (3, b"\x00" * 64),  # garbage
        (4, valid[: max(4, len(valid) // 3)]),  # truncated mid-structure
        (5, valid[:2] + b"\xff" * 32),  # right magic, corrupt body
    ]


def _df(spark, valid: bytes):
    return spark.createDataFrame(
        _payloads(valid), "doc_id long, payload binary"
    )


def test_audio_features_malformed_yield_null_rows(spark):
    df = _df(spark, _make_wav(440.0, seconds=0.05))
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5}, "one row per input doc, always"
    assert rows[0]["sample_rate"] == 8000
    for bad in (1, 2, 3):
        assert rows[bad]["sample_rate"] is None
        assert rows[bad]["rms"] is None


def test_image_features_malformed_yield_null_rows(spark):
    df = _df(spark, _make_bmp(3, 2, (10, 20, 30)))
    rows = {r["doc_id"]: r for r in image_features(df).collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    assert rows[0]["width"] == 3
    for bad in (1, 2, 3):
        assert rows[bad]["width"] is None


def test_video_metadata_malformed_yield_null_rows(spark):
    df = _df(spark, _make_mp4())
    rows = {r["doc_id"]: r for r in video_metadata(df).collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    assert rows[0]["brand"] is not None
    assert rows[3]["brand"] is None


@pytest.mark.parametrize(
    "make_valid",
    [
        lambda: _make_bmp(8, 8, (1, 2, 3)),
        lambda: _make_png(
            __import__("numpy").zeros((8, 8, 3), dtype="uint8"), 3, [0] * 8
        ),
        _good_gif,
        lambda: _make_jpeg_gray(
            __import__("numpy").full((8, 8), 128, dtype="uint8")
        ),
    ],
    ids=["bmp", "png", "gif", "jpeg"],
)
def test_image_dhash_drops_malformed(spark, make_valid):
    df = _df(spark, make_valid())
    out = image_dhash_features(df).collect()
    ids = {r["doc_id"] for r in out}
    assert 0 in ids, "the valid payload must fingerprint"
    assert ids <= {0}, f"malformed payloads leaked fingerprints: {ids}"


def test_audio_fingerprint_and_frames_drop_malformed(spark):
    df = _df(spark, _make_wav(300.0, seconds=0.05))
    fp_ids = {r["doc_id"] for r in audio_fingerprint_features(df).collect()}
    assert fp_ids == {0}
    rms_ids = {r["doc_id"] for r in audio_frame_rms(df).collect()}
    assert rms_ids == {0}


def test_gif_frames_and_resize_drop_malformed(spark):
    df = _df(spark, _good_gif())
    gif_ids = {r["doc_id"] for r in gif_frame_features(df).collect()}
    assert gif_ids == {0}
    rs_ids = {r["doc_id"] for r in resize_images(df, 4, 4).collect()}
    assert rs_ids == {0}


def test_all_malformed_batch_yields_empty_not_crash(spark):
    df = spark.createDataFrame(
        [(1, None), (2, b"junk")], "doc_id long, payload binary"
    )
    assert image_dhash_features(df).count() == 0
    assert gif_frame_features(df).count() == 0
    assert audio_fingerprint_features(df).count() == 0
    # extractors keep the rows with NULL features
    assert audio_features(df).count() == 2
