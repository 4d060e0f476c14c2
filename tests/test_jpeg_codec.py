"""Tests for the baseline JPEG codec (functions/jpeg_codec.py) and its
wiring as a REAL decode/resize/hash path of operators/multimodal.py.

JPEG is lossy, so round-trips assert PSNR and structure, not byte
equality. The pieces that CAN be checked independently of our own
encoder are: the DCT basis (orthonormality — decode inverts encode by
construction of the math, not by shared code), the canonical Huffman
assignment (prefix-free, spec counts), the magnitude coder (T.81 F.1.2
table values), and the emitted marker structure (a conforming baseline
reader's view of our stream)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from drugbankner_spark.functions import jpeg_codec as J


def _gradient(w, h):
    return bytes(((x * 255) // max(w - 1, 1)) for _ in range(h)
                 for x in range(w))


def _psnr(a: bytes, b: bytes) -> float:
    x = np.frombuffer(a, np.uint8).astype(float)
    y = np.frombuffer(b, np.uint8).astype(float)
    mse = ((x - y) ** 2).mean()
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


def test_dct_matrix_is_orthonormal():
    # decoder IDCT = C.T @ X @ C inverts encoder DCT exactly iff C is
    # orthonormal — checked against numpy, independent of codec code
    assert np.allclose(J._C @ J._C.T, np.eye(8), atol=1e-12)


def test_huffman_tables_are_canonical_and_prefix_free():
    for spec in (J._DC_LUMA_SPEC, J._AC_LUMA_SPEC,
                 J._DC_CHROMA_SPEC, J._AC_CHROMA_SPEC):
        codes = J._huff_codes(spec)
        assert len(codes) == sum(spec[0])  # every symbol assigned
        seen = set()
        for code, length in codes.values():
            bits = format(code, f"0{length}b")
            # prefix-free: no code is a prefix of another
            for other in seen:
                assert not bits.startswith(other)
                assert not other.startswith(bits)
            seen.add(bits)


def test_magnitude_coding_matches_spec_table():
    # T.81 table F.1: category (SSSS) and amplitude encoding
    assert J._magnitude(0) == (0, 0)
    assert J._magnitude(1) == (1, 1)
    assert J._magnitude(-1) == (1, 0)
    assert J._magnitude(3) == (2, 3)
    assert J._magnitude(-3) == (2, 0)
    assert J._magnitude(-2) == (2, 1)
    assert J._magnitude(255) == (8, 255)
    # _extend is the decoder inverse
    for v in [-255, -128, -3, -1, 1, 2, 127, 255]:
        n, bits = J._magnitude(v)
        assert J._extend(bits, n) == v


def test_marker_structure_is_conforming_baseline():
    data = J.encode_jpeg(_gradient(16, 16), 16, 16, 1)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # walk the marker segments like any baseline reader
    pos, seen = 2, []
    while pos < len(data) - 2:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        seen.append(marker)
        pos += 2
        if marker == 0xDA:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        pos += seglen
    assert 0xE0 in seen          # JFIF APP0
    assert 0xDB in seen          # DQT
    assert 0xC0 in seen          # SOF0 = BASELINE
    assert seen.count(0xC4) == 2  # gray: DC + AC Huffman tables
    assert seen[-1] == 0xDA      # SOS starts entropy data


def test_gray_roundtrip_psnr():
    px = _gradient(40, 24)
    out = J.decode_jpeg(J.encode_jpeg(px, 40, 24, 1, quality=90))
    assert (out["width"], out["height"], out["channels"]) == (40, 24, 1)
    assert _psnr(px, out["samples"]) > 40


def test_rgb_roundtrip_psnr():
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 4, (16, 16, 3)) * 60 + 20).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img.tobytes(), 16, 16, 3, quality=90))
    assert out["channels"] == 3
    assert _psnr(img.tobytes(), out["samples"]) > 25


def test_solid_color_is_exact():
    solid = bytes([77]) * 64
    out = J.decode_jpeg(J.encode_jpeg(solid, 8, 8, 1, quality=95))
    assert out["samples"] == solid


def test_non_multiple_of_8_sizes():
    for (w, h) in [(1, 1), (7, 5), (9, 17)]:
        px = bytes(((x * 13 + y * 7) % 256) for y in range(h)
                   for x in range(w))
        out = J.decode_jpeg(J.encode_jpeg(px, w, h, 1, quality=95))
        assert (out["width"], out["height"]) == (w, h)
        assert len(out["samples"]) == w * h
        assert _psnr(px, out["samples"]) > 35


def test_quality_knob_changes_size_and_error():
    px = bytes(((x * 31 + y * 17) % 256) for y in range(32)
               for x in range(32))
    lo = J.encode_jpeg(px, 32, 32, 1, quality=20)
    hi = J.encode_jpeg(px, 32, 32, 1, quality=95)
    assert len(lo) < len(hi)
    p_lo = _psnr(px, J.decode_jpeg(lo)["samples"])
    p_hi = _psnr(px, J.decode_jpeg(hi)["samples"])
    assert p_hi > p_lo


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"\x89PNG\r\n")
    assert not J.is_jpeg(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):  # valid SOI then junk marker body
        J.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x04\x00\x00")


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError, match="channels"):
        J.encode_jpeg(b"\x00" * 8, 2, 2, 2)
    with pytest.raises(ValueError, match="mismatch"):
        J.encode_jpeg(b"\x00" * 3, 2, 2, 1)


def test_decode_media_jpeg_path_end_to_end(spark):
    # the Spark wiring: JPEG payloads flow through the same mapInPandas
    # decode as PNG/WAV, features from REAL decoded samples
    from drugbankner_spark.operators.multimodal import decode_media

    px = _gradient(16, 8)
    payload = J.encode_jpeg(px, 16, 8, 1, quality=95)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image/jpeg", len(payload))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    row = decode_media(media).collect()[0]
    w, h, ch, mean, mn, mx = row["feature"]
    assert (w, h, ch) == (16.0, 8.0, 1.0)
    true_mean = np.frombuffer(px, np.uint8).mean()
    assert abs(mean - true_mean) < 3.0  # lossy, but close


def test_resize_jpeg_emits_real_jpeg(spark):
    from drugbankner_spark.operators.multimodal import resize_images

    payload = J.encode_jpeg(_gradient(32, 32), 32, 32, 1, quality=95)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image/jpeg", len(payload))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    row = resize_images(media, width=8, height=8).collect()[0]
    out = J.decode_jpeg(bytes(row["payload"]))
    assert (out["width"], out["height"]) == (8, 8)


def test_image_hashes_jpeg_close_to_png_of_same_image(spark):
    # perceptual hashes over the SAME image through the two codecs must
    # nearly agree (JPEG is lossy → allow a few flipped bits): images
    # entering the dedup family are format-robust
    from drugbankner_spark.functions import png_codec as png
    from drugbankner_spark.operators.multimodal import image_hashes

    px = bytes(((x // 4) * 32 + (y // 4) * 8) % 256 for y in range(32)
               for x in range(32))
    p_png = png.encode_png(px, 32, 32, 1)
    p_jpg = J.encode_jpeg(px, 32, 32, 1, quality=95)
    media = spark.createDataFrame(
        [(1, bytearray(p_png), "image/png", len(p_png)),
         (2, bytearray(p_jpg), "image/jpeg", len(p_jpg))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    got = {r["media_id"]: (r["ahash"], r["dhash"])
           for r in image_hashes(media).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(got[1][0], got[2][0]) <= 6
    assert hamming(got[1][1], got[2][1]) <= 6
