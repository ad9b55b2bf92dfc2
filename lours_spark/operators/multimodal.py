"""Multimodal (image/audio/video) binary-column plumbing.

Design for 100 TB media pipelines: media lives in opaque ``binary``
columns (or object-store paths read via ``binaryFile``) with typed
metadata columns alongside; all per-item compute runs through
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects.

The actual decoders (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so ``decode_image``/``sample_frames`` raise
``NotImplementedError`` behind a clearly-marked seam, while
``extract_features`` computes deterministic byte-level features through
the real UDF plumbing (schema, batching, partitioning are all genuine).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def decode_image(payload: bytes) -> "object":
    """STUB: decode an encoded image to HxWxC. Needs PIL/cv2 — not
    installed here; the seam exists so a real cluster image plugs in."""
    raise NotImplementedError(
        "image decoding requires PIL/cv2 on the executors; "
        "wire your decoder in here"
    )


def sample_frames(payload: bytes, every_n: int = 30) -> "list[object]":
    """STUB: sample frames from a video payload (ffmpeg seam)."""
    raise NotImplementedError("video decoding requires ffmpeg on the executors")


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "payload"
) -> DataFrame:
    """Deterministic byte-level features via ``mapInPandas`` — the real
    Arrow batch path a decoder-backed extractor would use (swap the
    body of ``featurize`` for ``decode_image`` + model inference)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(featurize, FEATURE_SCHEMA)
