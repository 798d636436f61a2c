"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
`mapInPandas` signature, partition behavior — is real and tested; the actual
codec work (JPEG decode, resample, frame sampling) is stubbed because the
media libraries are not in this container:

* `decode_image` raises NotImplementedError (the real impl would call
  PIL/libvips inside the same mapInPandas batch loop).
* `extract_features` computes deterministic byte-level features (length,
  md5 digest, simple byte histogram entropy proxy) — the real pipeline shape
  with a fake feature extractor.

At 100 TB: binary payloads stay columnar through Arrow; mapInPandas streams
record batches (never materializes a partition), and feature extraction is
embarrassingly parallel map-only work. Batch size is controlled by
spark.sql.execution.arrow.maxRecordsPerBatch to bound executor memory.
"""

from __future__ import annotations

import hashlib
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


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real implementation: PIL.Image.open(io.BytesIO(payload)). The media
    libraries are not available in this container."""
    raise NotImplementedError("image decoding requires PIL/libvips (not in container)")


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
