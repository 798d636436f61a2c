"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
`mapInPandas` signature, partition behavior — is real and tested. Decoding:

* WAV (RIFF PCM) and uncompressed 24-bit BMP decode for REAL in pure
  stdlib+numpy (`decode_wav`, `decode_bmp`) — audio duration/RMS/peak and
  image dimensions/brightness come from actual samples/pixels.
* JPEG/PNG/MP4 (`decode_image` on non-BMP magic) raise NotImplementedError:
  those codecs genuinely require PIL/libvips/ffmpeg, which are not in this
  container; the real impl drops into the same mapInPandas batch loop.
* `extract_features` computes deterministic byte-level features (length,
  md5 digest, ascii ratio) — codec-independent profiling.

At 100 TB: binary payloads stay columnar through Arrow; mapInPandas streams
record batches (never materializes a partition), and feature extraction is
embarrassingly parallel map-only work. Batch size is controlled by
spark.sql.execution.arrow.maxRecordsPerBatch to bound executor memory.
"""

from __future__ import annotations

import hashlib
import io
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text column,
    metadata = deterministic typed struct (what an image ingester would fill)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.length(F.col(text_col)) % 640 + 1).alias("width"),
        (F.length(F.col(text_col)) % 480 + 1).alias("height"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_wav(payload: bytes) -> dict:
    """Decode a RIFF/WAVE PCM payload with the stdlib `wave` module: real
    sample data, no external libs. Returns rate/channels/duration plus
    RMS and peak amplitude over the (normalized) samples."""
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported sample width: {width}")
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        samples -= 128.0  # 8-bit WAV is unsigned
    full_scale = float(2 ** (8 * width - 1))
    norm = samples / full_scale
    return {
        "sample_rate": rate,
        "channels": channels,
        "duration_s": round(n_frames / rate, 6) if rate else 0.0,
        "rms": round(float(np.sqrt((norm**2).mean())), 6) if len(norm) else 0.0,
        "peak": round(float(np.abs(norm).max()), 6) if len(norm) else 0.0,
    }


def decode_bmp(payload: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER) by hand: real
    pixels, no external libs. Returns dimensions and per-channel means."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    flipped = height > 0  # positive height = bottom-up storage
    h = abs(height)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)[:, : width * 3]
    px = rows.reshape(h, width, 3)[:, :, ::-1]  # BGR -> RGB
    if flipped:
        px = px[::-1]
    means = px.reshape(-1, 3).mean(axis=0)
    return {
        "width": width,
        "height": h,
        "mean_r": round(float(means[0]), 6),
        "mean_g": round(float(means[1]), 6),
        "mean_b": round(float(means[2]), 6),
    }


def decode_image(payload: bytes) -> dict:
    """Dispatch on magic bytes. BMP decodes for real; JPEG/PNG/GIF require
    PIL/libvips (not in this container) and raise NotImplementedError —
    the real implementation slots into the same mapInPandas batch loop."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "JPEG/PNG/GIF decoding requires PIL/libvips (not in container); "
        "BMP and WAV decode natively"
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, channels int, duration_s double, "
    "rms double, peak double"
)
IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double"
)


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched WAV feature extraction (real sample decoding)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_wav(bytes(b)) for b in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, "payload").mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


def image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched BMP feature extraction (real pixel decoding)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image(bytes(b)) for b in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, "payload").mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


FEATURE_SCHEMA = "doc_id long, n_bytes long, digest string, ascii_ratio double"


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; one pass, no shuffle. The feature set is a deterministic
    stand-in for embedding/EXIF extraction.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def ascii_ratio(b: bytes) -> float:
            if not b:
                return 0.0
            arr = np.frombuffer(b, dtype=np.uint8)
            return round(float((arr < 128).mean()), 6)

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len),
                    "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "ascii_ratio": payloads.map(lambda b: ascii_ratio(bytes(b))),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, FEATURE_SCHEMA)
