"""Multimodal binary plumbing: decode → resize → frame-sample pipeline.

Decoders (PIL/ffmpeg) are absent in this container, so the decode step
runs the clearly-marked deterministic fake — everything around it
(Arrow batching, schemas, fan-out shapes, the REAL numpy resize) is the
production path.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest


def _png(width: int, height: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\rIHDR"
        + struct.pack(">II", width, height)
        + b"\x08\x02\x00\x00\x00" * 3
    )


@pytest.fixture
def payloads(spark):
    rows = [(i, _png(8 + i, 6 + i) + bytes([i]) * 32) for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_images_fake_seam(spark, payloads):
    from lours_spark.operators.multimodal import decode_images

    out = {r["doc_id"]: r for r in
           decode_images(payloads, decoder="fake").collect()}
    assert len(out) == 6
    for i, r in out.items():
        assert (r["width"], r["height"]) == (8 + i, 6 + i)
        assert r["channels"] == 3
        assert len(r["pixels"]) == r["width"] * r["height"] * 3
    # deterministic: same payload → same pixels
    again = {r["doc_id"]: r["pixels"] for r in
             decode_images(payloads, decoder="fake").collect()}
    assert all(bytes(again[i]) == bytes(out[i]["pixels"]) for i in out)


def test_decode_images_auto_raises_without_pil(spark, payloads):
    from lours_spark.operators.multimodal import decode_images

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available — auto seam resolves for real")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_images(payloads, decoder="auto")


def test_resize_images_real_nearest_neighbor(spark, payloads):
    from lours_spark.operators.multimodal import decode_images, resize_images

    decoded = decode_images(payloads, decoder="fake")
    resized = resize_images(decoded, 4, 5)
    rows = resized.collect()
    assert len(rows) == 6
    for r in rows:
        assert (r["height"], r["width"], r["channels"]) == (4, 5, 3)
        assert len(r["pixels"]) == 4 * 5 * 3
    # verify the nearest-neighbor math against local numpy on one row
    src = {r["doc_id"]: r for r in decoded.collect()}[0]
    arr = np.frombuffer(bytes(src["pixels"]), dtype=np.uint8).reshape(
        src["height"], src["width"], 3
    )
    ridx = (np.arange(4) * src["height"] // 4)
    cidx = (np.arange(5) * src["width"] // 5)
    expected = arr[ridx][:, cidx].tobytes()
    got = bytes({r["doc_id"]: r for r in rows}[0]["pixels"])
    assert got == expected


def test_sample_video_frames_fan_out(spark):
    from lours_spark.operators.multimodal import sample_video_frames

    frames = [bytes([i] * 16) for i in range(10)]
    df = spark.createDataFrame(
        [(1, b"".join(frames))], "doc_id long, payload binary"
    )
    out = sample_video_frames(df, every_n=3, frame_bytes=16).collect()
    assert [r["frame_index"] for r in sorted(out, key=lambda r: r["frame_index"])] == [0, 3, 6, 9]
    for r in out:
        assert r["n_bytes"] == 16
        assert r["frame_hash"] == hashlib.md5(frames[r["frame_index"]]).hexdigest()
    # ffmpeg seam raises without the fixed-stride fallback
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_video_frames(df, every_n=3)
