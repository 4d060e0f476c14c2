"""BMP codec (functions/bmp_codec.py) + its Spark paths."""

from __future__ import annotations

import os
import random
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drugbankner_spark.functions import bmp_codec as B  # noqa: E402


def test_roundtrip_fuzz_24_and_8_bit():
    rng = random.Random(4)
    for w, h, ch in [(5, 3, 3), (7, 2, 1), (1, 1, 3), (16, 9, 1),
                     (13, 5, 3), (4, 4, 1)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        data = B.encode_bmp(px, w, h, ch)
        assert B.is_bmp(data)
        d = B.decode_bmp(data)
        assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
        assert d["pixels"] == px  # row padding + BGR flip both undone


def test_top_down_rows_supported():
    # negative height = top-down; decoded pixels must equal bottom-up's
    px = bytes(range(5 * 3 * 3))
    data = bytearray(B.encode_bmp(px, 5, 3, 3))
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    # flip the stored row order to keep the image identical
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    row_bytes = (5 * 3 + 3) & ~3
    rows = [bytes(data[pixel_off + i * row_bytes:
                       pixel_off + (i + 1) * row_bytes])
            for i in range(3)]
    data[pixel_off:] = b"".join(reversed(rows))
    assert B.decode_bmp(bytes(data))["pixels"] == px


def test_unsupported_forms_raise():
    with pytest.raises(ValueError, match="signature"):
        B.decode_bmp(bytes(100))
    data = bytearray(B.encode_bmp(bytes(12), 2, 2, 3))
    struct.pack_into("<I", data, 30, 1)  # RLE8 compression
    with pytest.raises(ValueError, match="compression"):
        B.decode_bmp(bytes(data))


def test_spark_paths(spark):
    from drugbankner_spark.operators import multimodal as MM

    px = bytes((x * 17 + y * 3) % 256 for y in range(8) for x in range(9))
    payload = B.encode_bmp(px, 9, 8, 1)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image/bmp", len(payload))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    [meta] = MM.container_metadata(media).collect()
    assert meta["format"] == "bmp" and meta["codec"] == "bi_rgb8"
    assert (meta["width"], meta["height"], meta["channels"]) == (9, 8, 1)
    [feat] = MM.decode_media(media).collect()
    assert feat["feature"][:3] == [9.0, 8.0, 1.0]
    [hashes] = MM.image_hashes(media).collect()
    assert isinstance(hashes["ahash"], int)


def test_pnm_roundtrip_and_spark_paths(spark):
    import random

    from drugbankner_spark.functions import pnm_codec as P
    from drugbankner_spark.operators import multimodal as MM

    rng = random.Random(6)
    for w, h, ch, asc in [(5, 3, 1, False), (5, 3, 3, False),
                          (4, 2, 1, True), (4, 2, 3, True)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        d = P.decode_pnm(P.encode_pnm(px, w, h, ch, ascii_format=asc))
        assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
        assert d["pixels"] == px
    # comment lines in the header are skipped
    commented = b"P5\n# a comment\n3 2\n255\n" + bytes(6)
    assert P.decode_pnm(commented)["width"] == 3

    px = bytes((x * 31 + y * 7) % 256 for y in range(8) for x in range(9))
    payload = P.encode_pnm(px, 9, 8, 1)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image/x-portable-graymap", len(payload))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    [meta] = MM.container_metadata(media).collect()
    assert meta["format"] == "pnm" and meta["codec"] == "p5"
    assert (meta["width"], meta["height"], meta["channels"]) == (9, 8, 1)
    [feat] = MM.decode_media(media).collect()
    assert feat["feature"][:3] == [9.0, 8.0, 1.0]
    [hashes] = MM.image_hashes(media).collect()
    assert isinstance(hashes["ahash"], int)
