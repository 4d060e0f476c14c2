"""Tests for the pure-stdlib PNG codec (functions/png_codec.py) and its
wiring as the REAL decode/resize path of operators/multimodal.py.

The decoder is verified against HAND-COMPUTED filter reconstructions
(RFC 2083 §6), not just round-trips through our own encoder — the
filter math (Sub/Up/Average/Paeth) is checked independently."""

from __future__ import annotations

import struct
import zlib

import pytest

from drugbankner_spark.functions import png_codec as png


def _build_png(width, height, color_type, raw_scanlines, plte=None,
               bit_depth=8, interlace=0, trns=None):
    """Hand-assemble a PNG from an explicit filtered scanline stream."""
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    out = png.PNG_SIGNATURE + png._chunk(b"IHDR", ihdr)
    if plte is not None:
        out += png._chunk(b"PLTE", plte)
    if trns is not None:
        out += png._chunk(b"tRNS", trns)
    out += png._chunk(b"IDAT", zlib.compress(bytes(raw_scanlines)))
    return out + png._chunk(b"IEND", b"")


def test_decode_all_filter_types_hand_computed_gray():
    # 3x4 grayscale exercising filters Sub, Up, Average, Paeth with
    # expected pixels computed by hand from the spec's reconstruction
    # functions — independent of our encoder.
    raw = bytes(
        [1, 10, 5, 5]      # Sub:     10, 15, 20
        + [2, 1, 1, 1]     # Up:      11, 16, 21
        + [3, 2, 2, 2]     # Average:  7, 13, 19
        + [4, 3, 3, 3]     # Paeth:   10, 16, 22
    )
    img = png.decode_png(_build_png(3, 4, 0, raw))
    assert (img["width"], img["height"], img["channels"]) == (3, 4, 1)
    assert list(img["pixels"]) == [
        10, 15, 20,
        11, 16, 21,
        7, 13, 19,
        10, 16, 22,
    ]


def test_decode_rgb_sub_and_up_filters():
    # 2x2 RGB: Sub works at bpp=3 stride (left neighbor is 3 bytes back)
    raw = bytes(
        [1, 100, 110, 120, 10, 10, 10]   # Sub
        + [2, 5, 5, 5, 6, 6, 6]          # Up
    )
    img = png.decode_png(_build_png(2, 2, 2, raw))
    assert img["channels"] == 3
    assert list(img["pixels"]) == [
        100, 110, 120, 110, 120, 130,
        105, 115, 125, 116, 126, 136,
    ]


def test_decode_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0])
    raw = bytes([0, 0, 1])  # filter 0, indices [0, 1]
    img = png.decode_png(_build_png(2, 1, 3, raw, plte=plte))
    assert img["channels"] == 3
    assert list(img["pixels"]) == [255, 0, 0, 0, 255, 0]


def test_decode_sub_byte_gray_depths():
    # 2-bit gray, 5 px: values 0,1,2,3,0 pack to 00 01 10 11 | 00......
    img = png.decode_png(
        _build_png(5, 1, 0, bytes([0, 0b00011011, 0b00000000]), bit_depth=2)
    )
    assert img["channels"] == 1
    assert list(img["pixels"]) == [0, 85, 170, 255, 0]  # scaled ×85
    # 4-bit gray, 2 px: 0xF, 0x0 → 255, 0 (scaled ×17)
    img = png.decode_png(_build_png(2, 1, 0, bytes([0, 0xF0]), bit_depth=4))
    assert list(img["pixels"]) == [255, 0]
    # two rows exercise the packed-row filter stride (Up filter on row 2)
    img = png.decode_png(
        _build_png(2, 2, 0, bytes([0, 0xF0, 2, 0x0F]), bit_depth=4)
    )
    assert list(img["pixels"]) == [255, 0, 255, 255]  # 0xF0 + 0x0F = 0xFF


def test_decode_1bit_palette_with_trns_alpha():
    plte = bytes([10, 20, 30, 200, 210, 220])
    # 3 px indices [1,0,1] → bits 101 padded → 0b10100000
    data = _build_png(
        3, 1, 3, bytes([0, 0b10100000]), plte=plte, bit_depth=1,
        trns=bytes([128]),  # palette idx 0 alpha=128; idx 1 defaults 255
    )
    img = png.decode_png(data)
    assert img["channels"] == 4
    assert list(img["pixels"]) == [
        200, 210, 220, 255,
        10, 20, 30, 128,
        200, 210, 220, 255,
    ]


def test_decode_rejects_corruption_and_unsupported():
    raw = bytes([0, 7, 7])
    good = _build_png(2, 1, 0, raw)
    # flip one IDAT byte → CRC must catch it
    idat_at = good.find(b"IDAT") + 4
    bad = bytearray(good)
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"GIF89a not a png")
    with pytest.raises(ValueError, match="bit depth"):
        # 16-bit PALETTE is invalid per spec and unsupported here
        png.decode_png(
            _build_png(2, 1, 3, raw, plte=bytes(6), bit_depth=16)
        )
    with pytest.raises(ValueError, match="interlace"):
        # Adam7 is supported at 8-bit only; sub-byte interlace raises
        png.decode_png(_build_png(2, 1, 0, raw, bit_depth=4, interlace=1))
    with pytest.raises(ValueError, match="interlace"):
        png.decode_png(_build_png(2, 1, 0, raw, interlace=9))
    with pytest.raises(ValueError, match="palette index"):
        png.decode_png(
            _build_png(2, 1, 3, raw, plte=bytes([1, 2, 3]))  # idx 7 > 0
        )


def _adam7_interleave(pixels, width, height, bpp):
    """Test-side FORWARD interlacer (independent of the decoder's
    inverse): emit the concatenated filter-0 scanlines of each pass."""
    out = bytearray()
    for x0, y0, dx, dy in png._ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for py in range(ph):
            out.append(0)  # filter type 0
            for px in range(pw):
                src = ((y0 + py * dy) * width + (x0 + px * dx)) * bpp
                out.extend(pixels[src:src + bpp])
    return bytes(out)


@pytest.mark.parametrize("w,h,ch,ctype", [
    (8, 8, 1, 0), (3, 2, 1, 0), (5, 7, 3, 2), (9, 4, 4, 6),
])
def test_adam7_interlaced_decode(w, h, ch, ctype):
    # forward-interleave a known image in the test, decode with the
    # codec's inverse — must reproduce the original for exact multiples
    # of 8, partial passes, and multi-channel types
    pixels = bytes((i * 31 + 7) % 256 for i in range(w * h * ch))
    data = _build_png(
        w, h, ctype, _adam7_interleave(pixels, w, h, ch), interlace=1
    )
    img = png.decode_png(data)
    assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
    assert img["pixels"] == pixels


def test_decode_16bit_gray_lossless_samples():
    # filter 0 row: samples 0x0102, 0x0304
    img = png.decode_png(
        _build_png(2, 1, 0, bytes([0, 1, 2, 3, 4]), bit_depth=16)
    )
    assert img["bit_depth"] == 16
    assert list(img["samples16"]) == [0x0102, 0x0304]
    assert list(img["pixels"]) == [1, 3]  # 8-bit high-byte view
    # Sub filter at the 2-byte stride: second sample adds byte-wise
    img = png.decode_png(
        _build_png(2, 1, 0, bytes([1, 1, 2, 3, 4]), bit_depth=16)
    )
    assert list(img["samples16"]) == [0x0102, 0x0406]
    s = png.png_stats(_build_png(2, 1, 0, bytes([0, 1, 2, 3, 4]),
                                 bit_depth=16))
    assert s["min"] == 0x0102 and s["max"] == 0x0304
    with pytest.raises(ValueError, match="8-bit only"):
        png.resize_png(
            _build_png(2, 1, 0, bytes([0, 1, 2, 3, 4]), bit_depth=16), 1, 1
        )


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_encode_decode_roundtrip(channels):
    w, h = 5, 3
    pixels = bytes(
        (i * 37 + c * 11) % 256
        for i in range(w * h) for c in range(channels)
    )
    data = png.encode_png(pixels, w, h, channels)
    img = png.decode_png(data)
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert img["pixels"] == pixels


def test_resize_nearest_up_and_down():
    # 2x2 gray → 4x4: each source pixel becomes a 2x2 block
    up = png.resize_nearest(bytes([1, 2, 3, 4]), 2, 2, 1, 4, 4)
    assert list(up) == [
        1, 1, 2, 2,
        1, 1, 2, 2,
        3, 3, 4, 4,
        3, 3, 4, 4,
    ]
    # 4x4 → 2x2 picks rows/cols 0 and 2
    src = bytes(range(16))
    down = png.resize_nearest(src, 4, 4, 1, 2, 2)
    assert list(down) == [0, 2, 8, 10]


def test_resize_png_full_path():
    pixels = bytes(range(16))
    out = png.resize_png(png.encode_png(pixels, 4, 4, 1), 2, 2)
    img = png.decode_png(out)
    assert (img["width"], img["height"]) == (2, 2)
    assert list(img["pixels"]) == [0, 2, 8, 10]


def test_png_stats():
    s = png.png_stats(png.encode_png(bytes([0, 10, 20, 30]), 2, 2, 1))
    assert s == {
        "width": 2, "height": 2, "channels": 1,
        "mean": 15.0, "min": 0, "max": 30,
    }


# --- Spark wiring: the REAL (non-fake) E4 paths over PNG payloads -------


def _png_media_df(spark):
    rows = [
        (1, png.encode_png(bytes([0, 10, 20, 30]), 2, 2, 1), "image/png"),
        (2, png.encode_png(bytes(range(48)), 4, 4, 3), "image/png"),
    ]
    return spark.createDataFrame(
        [(i, bytearray(p), m, len(p)) for i, p, m in rows],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )


def test_decode_media_real_path_png(spark):
    from drugbankner_spark.operators.multimodal import decode_media

    out = {r["media_id"]: r["feature"]
           for r in decode_media(_png_media_df(spark)).collect()}
    assert out[1] == [2.0, 2.0, 1.0, 15.0, 0.0, 30.0]
    assert out[2][:3] == [4.0, 4.0, 3.0]
    assert out[2][4] == 0.0 and out[2][5] == 47.0


def test_resize_images_real_path_png(spark):
    from drugbankner_spark.operators.multimodal import resize_images

    out = {r["media_id"]: r for r in
           resize_images(_png_media_df(spark), width=2, height=2).collect()}
    img = png.decode_png(bytes(out[2]["payload"]))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    # nearest-neighbor of the 4x4 RGB ramp picks pixels (0,0),(0,2),(2,0),(2,2)
    assert list(img["pixels"]) == (
        list(range(0, 3)) + list(range(6, 9))
        + list(range(24, 27)) + list(range(30, 33))
    )


def test_decode_media_unsupported_format_still_raises(spark):
    # JPEG became a REAL path in round 5 — an honestly-unsupported
    # format (MP3-ish) must still raise, and a corrupt JPEG errors
    # rather than silently passing
    from drugbankner_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04\x00 mp3-ish"), "audio/mpeg", 11)],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    with pytest.raises(Exception, match="NotImplementedError|MP3"):
        decode_media(df).collect()
    truncated = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff jpeg-ish"), "image/jpeg", 12)],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    with pytest.raises(Exception, match="jpeg"):
        decode_media(truncated).collect()


# --- Perceptual hashing over real decoded pixels ------------------------


def _gradient_png(w, h, shift=0, noise_at=None):
    """Deterministic grayscale gradient image; optional single-cell
    perturbation (noise_at=(x, y)) for near-dup fixtures."""
    px = bytearray(((x * 255) // (w - 1) + shift) % 256
                   for y in range(h) for x in range(w))
    if noise_at:
        x, y = noise_at
        px[y * w + x] = (px[y * w + x] + 8) % 256
    return png.encode_png(bytes(px), w, h, 1)


def test_image_hashes_near_and_far(spark):
    from drugbankner_spark.operators.multimodal import (
        image_hashes,
        image_near_dup_pairs,
    )

    a = _gradient_png(32, 32)
    b = _gradient_png(32, 32, noise_at=(5, 5))       # near-dup of a
    c = _gradient_png(16, 16)                        # same image, smaller
    # inverted gradient: structurally different
    d = png.encode_png(
        bytes(255 - ((x * 255) // 31) for _ in range(32) for x in range(32)),
        32, 32, 1,
    )
    media = spark.createDataFrame(
        [(1, bytearray(a), "image/png", len(a)),
         (2, bytearray(b), "image/png", len(b)),
         (3, bytearray(c), "image/png", len(c)),
         (4, bytearray(d), "image/png", len(d))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    hashes = image_hashes(media)
    rows = {r["media_id"]: (r["ahash"], r["dhash"]) for r in hashes.collect()}
    ham = lambda x, y: bin((x ^ y) & (2**64 - 1)).count("1")  # noqa: E731
    # single-cell noise: tiny hamming; resize: dHash gradient survives;
    # inversion: far from everything
    assert ham(rows[1][1], rows[2][1]) <= 3
    assert ham(rows[1][1], rows[3][1]) <= 3
    assert ham(rows[1][1], rows[4][1]) > 16

    pairs = {(r["id_a"], r["id_b"])
             for r in image_near_dup_pairs(hashes).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_image_near_dup_pairs_rejects_bad_threshold(spark):
    from drugbankner_spark.operators.multimodal import (
        image_hashes,
        image_near_dup_pairs,
    )

    a = _gradient_png(8, 8)
    media = spark.createDataFrame(
        [(1, bytearray(a), "image/png", len(a))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        image_near_dup_pairs(image_hashes(media), max_hamming=9)
