"""Multimodal (image/audio/video) binary-column plumbing.

Design for 100 TB media pipelines: media lives in opaque ``binary``
columns (or object-store paths read via ``binaryFile``) with typed
metadata columns alongside; all per-item compute runs through
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects. For multi-MB payloads, size
``spark.sql.execution.arrow.maxRecordsPerBatch`` so one Arrow batch
fits executor memory (the operators stream batch-by-batch and hold no
more than one batch of pixels at a time).

Decoder availability: the heavyweight codecs (PIL/cv2/ffmpeg) are NOT
in this container, but netpbm (PPM/PGM) is a real image format with a
spec simple enough to decode in pure numpy — so the decode path below
runs for REAL on real bytes, no dependencies. Every operator takes a
``decoder`` argument —

- ``"auto"``: use PIL when importable; otherwise decode binary
  PPM/PGM (P6/P5) payloads with the pure-numpy decoder and raise with
  instructions for any other format (the seam a real cluster image
  plugs into);
- ``"ppm"``: the pure-numpy netpbm decoder only (P6 → H×W×3,
  P5 → H×W×1; maxval ≤ 255 and 16-bit big-endian both handled);
- ``"fake"``: a clearly-marked deterministic fake — dimensions sniffed
  from the real PNG/JPEG/BMP header (``io/folder._sniff_size``), pixels
  generated from an md5-seeded byte pattern — for plumbing tests of
  formats whose codecs are absent;
- any callable ``bytes -> np.ndarray(H, W, C) uint8`` for custom
  codecs.

``resize_images`` needs no codec at all: nearest-neighbor resampling
of an (H, W, C) array is pure numpy indexing and runs for real here.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic FAKE decoder (testing/plumbing only): real header
    sniff for dimensions, md5-seeded tiled bytes for pixels."""
    from lours_spark.io.folder import _sniff_size

    try:
        w, h = _sniff_size(payload)
    except Exception:
        w, h = 8, 8
    w = max(1, min(int(w), 64))
    h = max(1, min(int(h), 64))
    seed = np.frombuffer(hashlib.md5(payload).digest(), dtype=np.uint8)
    n = h * w * 3
    return np.tile(seed, n // len(seed) + 1)[:n].reshape(h, w, 3)


def ppm_decode(payload: bytes) -> np.ndarray:
    """Pure-numpy binary netpbm decoder — a REAL, dependency-free
    decode path. P6 (RGB) → (H, W, 3) uint8, P5 (grayscale) →
    (H, W, 1) uint8. Handles the spec's whitespace/comment header
    grammar and both maxval ranges (≤255 one byte per sample, ≤65535
    two bytes big-endian, scaled down to uint8).

    >>> img = ppm_decode(b"P6\\n# comment\\n2 1\\n255\\n" +
    ...                  bytes([255, 0, 0, 0, 255, 0]))
    >>> img.shape, img[0, 1].tolist()
    ((1, 2, 3), [0, 255, 0])
    """
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload (magic {magic!r})")
    # header: magic, width, height, maxval — tokens separated by
    # whitespace, '#' comments run to end of line; pixel data starts
    # after the single whitespace byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        b = payload[pos : pos + 1]
        if b == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif b.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = tokens
    channels = 3 if magic == b"P6" else 1
    n = w * h * channels
    if maxval < 256:
        arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    else:
        wide = np.frombuffer(payload, dtype=">u2", count=n, offset=pos)
        arr = (wide.astype(np.uint32) * 255 // maxval).astype(np.uint8)
    return arr.reshape(h, w, channels)


def _auto_decode(payload: bytes) -> np.ndarray:
    """No-PIL ``auto`` fallback: real decode for netpbm, loud seam for
    everything else."""
    if payload[:2] in (b"P6", b"P5"):
        return ppm_decode(payload)
    raise NotImplementedError(
        "decoding this image format requires PIL/cv2 on the executors — "
        "install one there, or pass decoder=<callable> / "
        'decoder="fake" for plumbing tests (PPM/PGM decode for real '
        "without any dependency)"
    )


def _resolve_decoder(decoder):
    if callable(decoder):
        return decoder
    if decoder == "fake":
        return _fake_decode
    if decoder == "ppm":
        return ppm_decode
    if decoder == "auto":
        try:
            from PIL import Image  # type: ignore
            import io

            return lambda payload: np.asarray(
                Image.open(io.BytesIO(payload)).convert("RGB")
            )
        except ImportError:
            return _auto_decode
    raise ValueError(f"unknown decoder {decoder!r}")


#: decoded image rows: dimensions + raw RGB bytes (C-order H×W×C)
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    decoder="auto",
) -> DataFrame:
    """Decode encoded image payloads to raw pixel rows (``IMAGE_SCHEMA``)
    via ``mapInPandas`` — one Arrow batch of payloads in, one batch of
    pixel buffers out, zero Python-row round trips."""
    decode = _resolve_decoder(decoder)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, cs, px = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                arr = np.ascontiguousarray(decode(bytes(payload)))
                ids.append(int(i))
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                cs.append(arr.shape[2] if arr.ndim == 3 else 1)
                px.append(arr.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "height": pd.array(hs, dtype="int32"),
                    "width": pd.array(ws, dtype="int32"),
                    "channels": pd.array(cs, dtype="int32"),
                    "pixels": px,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(kernel, IMAGE_SCHEMA)


def resize_images(
    decoded: DataFrame, target_height: int, target_width: int
) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel rows — REAL compute
    (pure numpy fancy indexing, no codec), same ``IMAGE_SCHEMA`` out.
    The standard normalize-before-embedding step, runnable as-is at
    cluster scale."""
    th, tw = int(target_height), int(target_width)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for h, w, c, buf in zip(
                pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
            ):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
                    int(h), int(w), int(c)
                )
                rows = (np.arange(th) * h // th).astype(np.int64)
                cols = (np.arange(tw) * w // tw).astype(np.int64)
                out.append(arr[rows][:, cols].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "height": pd.array([th] * len(pdf), dtype="int32"),
                    "width": pd.array([tw] * len(pdf), dtype="int32"),
                    "channels": pdf["channels"].astype("int32"),
                    "pixels": out,
                }
            )

    return decoded.mapInPandas(kernel, IMAGE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    frame_bytes: int | None = None,
) -> DataFrame:
    """Sample every ``every_n``-th frame of video payloads — one input
    row fans out to many frame rows (the mapInPandas generator shape a
    real ffmpeg demuxer plugs into; its per-frame yield replaces the
    fixed-stride splitter below).

    ``frame_bytes`` set: payloads are treated as concatenated
    fixed-size frames (the deterministic fake container used in tests).
    ``frame_bytes`` None: requires ffmpeg — raises here.
    """
    if frame_bytes is None:
        raise NotImplementedError(
            "video decoding requires ffmpeg on the executors; pass "
            "frame_bytes=<int> for the fixed-stride plumbing path"
        )
    step, fb = int(every_n), int(frame_bytes)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, hashes = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload)
                n_frames = len(raw) // fb
                for k in range(0, n_frames, step):
                    frame = raw[k * fb : (k + 1) * fb]
                    ids.append(int(i))
                    idxs.append(k)
                    sizes.append(len(frame))
                    hashes.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "n_bytes": pd.array(sizes, dtype="int64"),
                    "frame_hash": hashes,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(kernel, FRAME_SCHEMA)


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
    body of ``featurize`` for ``decode_images`` + model inference)."""

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
