"""Tests for the MJPEG-AVI container codec (functions/avi_codec.py) and
its wiring as the REAL video frame-sampling path of
operators/multimodal.sample_frames — video frames land in the image
dedup family end to end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from drugbankner_spark.functions import avi_codec as A
from drugbankner_spark.functions import jpeg_codec as J


def _video(n=6, w=16, h=16, fps=10):
    frames = []
    for i in range(n):
        px = bytes(((x * 20 + i * 40) % 256) for _ in range(h)
                   for x in range(w))
        frames.append(J.encode_jpeg(px, w, h, 1, quality=90))
    return A.encode_avi(frames, w, h, fps=fps), frames


def test_riff_structure_is_conforming():
    data, _ = _video()
    # any RIFF reader's view of our writer
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", data, 4)
    assert riff_size == len(data) - 8
    # hdrl list precedes movi list; idx1 present (avih flags HASINDEX)
    assert data.find(b"hdrl") < data.find(b"movi") < data.find(b"idx1")


def test_info_and_frame_extraction():
    data, frames = _video(n=6, fps=10)
    info = A.avi_info(data)
    assert (info["width"], info["height"]) == (16, 16)
    assert info["fps"] == 10.0 and info["n_frames"] == 6
    out = A.decode_avi_frames(data)
    assert [i for i, _, _ in out] == list(range(6))
    assert [t for _, t, _ in out] == [0, 100, 200, 300, 400, 500]
    # extracted payloads are byte-identical to what went in
    assert [p for _, _, p in out] == frames


def test_frames_decode_as_baseline_jpeg():
    data, _ = _video(n=3)
    for _, _, payload in A.decode_avi_frames(data):
        d = J.decode_jpeg(payload)
        assert (d["width"], d["height"], d["channels"]) == (16, 16, 1)


def test_even_sampling():
    data, _ = _video(n=10)
    picked = A.sample_avi_frames(data, 4)
    assert [i for i, _, _ in picked] == [0, 2, 5, 7]
    # asking for more than exist returns all
    assert len(A.sample_avi_frames(data, 99)) == 10


def test_rejects_non_avi_and_foreign_codecs():
    assert not A.is_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="not an AVI"):
        A.decode_avi_frames(b"\x00" * 20)
    # forge an h264 fourcc into the strh: must refuse, not mis-decode
    data, _ = _video()
    forged = data.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(ValueError, match="external libraries"):
        A.decode_avi_frames(forged)


def test_sample_frames_avi_end_to_end(spark):
    # the Spark fan-out: one AVI row → n frame rows, each frame a real
    # JPEG that image_hashes can consume — video joins the dedup family
    from drugbankner_spark.operators.multimodal import (
        image_hashes,
        sample_frames,
    )

    data, _ = _video(n=8, fps=20)
    media = spark.createDataFrame(
        [(7, bytearray(data), "video/x-msvideo", len(data))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    frames = sample_frames(media, n_frames=4).collect()
    assert len(frames) == 4
    assert [r["frame_idx"] for r in frames] == [0, 2, 4, 6]
    assert [r["frame_ts_ms"] for r in frames] == [0, 100, 200, 300]
    # frames → perceptual hashes (frame_idx becomes the media id)
    as_media = spark.createDataFrame(
        [(r["frame_idx"], r["frame_payload"], "image/jpeg",
          len(r["frame_payload"])) for r in frames],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    hashes = image_hashes(as_media).collect()
    assert len(hashes) == 4
    assert all(isinstance(r["ahash"], int) for r in hashes)
