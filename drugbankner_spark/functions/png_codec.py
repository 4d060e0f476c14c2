"""Pure-stdlib PNG codec (zlib + struct) — the real decode path for E4.

The container has no PIL/ffmpeg, but PNG needs neither: the format is
DEFLATE-compressed scanlines behind five per-row byte filters (RFC 2083).
This module implements a correct, dependency-free subset:

- decode: color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA) at bit depth 8; gray and palette additionally at 1/2/4 bits
  (losslessly unpacked — gray scaled to 0..255, palette expanded);
  16-bit samples for the non-palette types (returned as a ``samples16``
  int sequence — lossless); palette transparency (tRNS) expands to
  RGBA; non-interlaced; CRC-checked chunks.
- encode: 8-bit gray / RGB / RGBA, filter type 0 rows.
- resize: nearest-neighbor resampling over the decoded pixel buffer
  (8-bit buffers; re-encode 16-bit data at 8 bits first).

Adam7-interlaced images decode for the 8-bit color types (each of the
seven passes is unfiltered independently and scattered into place);
interlace combined with non-8-bit depths — vanishingly rare — raises
``ValueError`` with the limit named; honest errors, not wrong pixels.

Executor-side usage: called from Arrow-batched ``mapInPandas`` in
operators/multimodal.py, so the per-image Python cost is amortized over
Arrow batches and parallelized across partitions; at 100 TB the decode
is embarrassingly parallel and shuffles nothing.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_SIGNATURE


def _chunks(data: bytes):
    """Yield (type, payload) for each chunk, verifying length + CRC32."""
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ValueError("PNG: truncated chunk " + ctype.decode("latin1"))
        payload = data[pos + 8:end]
        (crc,) = struct.unpack(">I", data[end:end + 4])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError("PNG: CRC mismatch in " + ctype.decode("latin1"))
        yield ctype, payload
        pos = end + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG: missing IEND")


#: Adam7 pass layout: (x0, y0, dx, dy) per pass.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _deinterlace_adam7(
    raw: bytes, width: int, height: int, bpp: int
) -> bytearray:
    """Decode the concatenated per-pass filtered scanlines of an Adam7
    image (8-bit samples): each non-empty pass unfilters as its own
    sub-image, then scatters into the final buffer at the pass grid."""
    out = bytearray(width * height * bpp)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        n = ph * (1 + pw * bpp)
        sub = _unfilter(raw[pos:pos + n], pw, ph, bpp)
        pos += n
        for py in range(ph):
            for px in range(pw):
                src = (py * pw + px) * bpp
                dst = ((y0 + py * dy) * width + (x0 + px * dx)) * bpp
                out[dst:dst + bpp] = sub[src:src + bpp]
    if pos != len(raw):
        raise ValueError(
            f"PNG: Adam7 stream is {len(raw)} bytes, consumed {pos}"
        )
    return out


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(
    raw: bytes, width: int, height: int, bpp: int, row_bytes: int | None = None
) -> bytearray:
    """Reverse the per-scanline filters. ``raw`` is the inflated IDAT
    stream: height rows of (1 filter byte + row_bytes sample bytes).
    ``bpp`` is the FILTER stride in whole bytes (1 for sub-byte depths,
    per the spec); ``row_bytes`` defaults to width*bpp (8-bit case)."""
    rb = width * bpp if row_bytes is None else row_bytes
    expected = height * (rb + 1)
    if len(raw) != expected:
        raise ValueError(
            f"PNG: inflated data is {len(raw)} bytes, expected {expected}"
        )
    out = bytearray(height * rb)
    prev_off = -rb
    pos = 0
    for y in range(height):
        ft = raw[pos]
        row = bytearray(raw[pos + 1:pos + 1 + rb])
        pos += rb + 1
        off = y * rb
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, rb):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            if y:
                up = out[prev_off:prev_off + rb]
                for i in range(rb):
                    row[i] = (row[i] + up[i]) & 0xFF
        elif ft == 3:  # Average
            up = out[prev_off:prev_off + rb] if y else bytes(rb)
            for i in range(rb):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + up[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            up = out[prev_off:prev_off + rb] if y else bytes(rb)
            for i in range(rb):
                left = row[i - bpp] if i >= bpp else 0
                ul = up[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, up[i], ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft} on row {y}")
        out[off:off + rb] = row
        prev_off = off
    return out


def decode_png(data: bytes) -> dict:
    """Decode a PNG into raw interleaved 8-bit samples.

    Returns ``{"width", "height", "channels", "pixels"}`` where
    ``pixels`` is ``bytes`` of length width*height*channels (palette
    images are expanded to RGB). Raises ``ValueError`` on anything
    outside the supported subset — never returns wrong pixels.
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("PNG: bad signature")
    width = height = None
    bit_depth = color_type = interlace = None
    plte: bytes | None = None
    trns: bytes | None = None
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if comp != 0 or filt != 0:
                raise ValueError("PNG: nonstandard compression/filter method")
        elif ctype == b"PLTE":
            plte = payload
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"IDAT":
            idat.extend(payload)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    if interlace == 1 and bit_depth != 8:
        raise ValueError(
            "PNG: Adam7 interlace supported for 8-bit depths only"
        )
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: color type {color_type} not supported")
    if bit_depth != 8 and not (
        (bit_depth in (1, 2, 4) and color_type in (0, 3))
        or (bit_depth == 16 and color_type != 3)
    ):
        raise ValueError(
            f"PNG: bit depth {bit_depth} with color type {color_type} not "
            "supported (8-bit all types; 1/2/4-bit gray+palette; 16-bit "
            "non-palette)"
        )
    if width == 0 or height == 0:
        raise ValueError("PNG: zero-sized image")
    raw = zlib.decompress(bytes(idat))
    if bit_depth == 16:
        # filters run on bytes with a channels*2 stride (spec §6.2);
        # samples come back as big-endian u16 — returned losslessly as
        # ints, alongside an 8-bit high-byte view in ``pixels`` for the
        # byte-buffer consumers (stats use samples16)
        ch = _CHANNELS[color_type]
        unf = _unfilter(raw, width, height, ch * 2)
        n = width * height * ch
        samples16 = struct.unpack(f">{n}H", bytes(unf))
        return {
            "width": width,
            "height": height,
            "channels": ch,
            "bit_depth": 16,
            "pixels": bytes(unf[::2]),  # high bytes (8-bit view)
            "samples16": samples16,
        }
    if bit_depth == 8:
        bpp = _CHANNELS[color_type]
        if interlace == 1:
            pixels = _deinterlace_adam7(raw, width, height, bpp)
        else:
            pixels = _unfilter(raw, width, height, bpp)
    else:
        # sub-byte depths: filters run on PACKED row bytes with a
        # one-byte stride (spec §6.2), then unpack to one byte/pixel
        row_bytes = (width * bit_depth + 7) // 8
        packed = _unfilter(raw, width, height, 1, row_bytes)
        pixels = bytearray(width * height)
        mask = (1 << bit_depth) - 1
        scale = 255 // mask if color_type == 0 else 1  # gray → 0..255
        for y in range(height):
            base = y * row_bytes
            for x in range(width):
                bit_off = x * bit_depth
                b = packed[base + (bit_off >> 3)]
                val = (b >> (8 - bit_depth - (bit_off & 7))) & mask
                pixels[y * width + x] = val * scale
    channels = _CHANNELS[color_type]
    if color_type == 3:  # palette → RGB (RGBA when tRNS present)
        if plte is None or len(plte) % 3:
            raise ValueError("PNG: palette image without valid PLTE")
        n_ent = len(plte) // 3
        out_ch = 4 if trns is not None else 3
        expanded = bytearray(width * height * out_ch)
        for i, idx in enumerate(pixels):
            if idx >= n_ent:
                raise ValueError(f"PNG: palette index {idx} out of range")
            o = out_ch * i
            expanded[o:o + 3] = plte[3 * idx:3 * idx + 3]
            if out_ch == 4:
                expanded[o + 3] = trns[idx] if idx < len(trns) else 255
        pixels, channels = expanded, out_ch
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": 8,  # sub-byte gray/palette are expanded to 8-bit
        "pixels": bytes(pixels),
    }


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes, width: int, height: int, channels: int = 1
) -> bytes:
    """Encode raw interleaved 8-bit samples as a PNG (filter 0 rows —
    valid, if not maximally compressed; decoders don't care)."""
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"encode_png: {channels} channels unsupported (1/3/4)")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"encode_png: {len(pixels)} bytes != {width}x{height}x{channels}"
        )
    rb = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * rb:(y + 1) * rb])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    new_width: int,
    new_height: int,
) -> bytes:
    """Nearest-neighbor resample of a raw interleaved sample buffer."""
    if new_width <= 0 or new_height <= 0:
        raise ValueError("resize_nearest: target dimensions must be positive")
    out = bytearray(new_width * new_height * channels)
    for ny in range(new_height):
        sy = min(ny * height // new_height, height - 1)
        src_row = sy * width * channels
        dst_row = ny * new_width * channels
        for nx in range(new_width):
            sx = min(nx * width // new_width, width - 1)
            s = src_row + sx * channels
            d = dst_row + nx * channels
            out[d:d + channels] = pixels[s:s + channels]
    return bytes(out)


def resize_png(data: bytes, new_width: int, new_height: int) -> bytes:
    """Decode → nearest-neighbor resize → re-encode. The full real-path
    image resize used by operators/multimodal.resize_images for PNGs."""
    img = decode_png(data)
    if img.get("bit_depth") == 16:
        raise ValueError(
            "resize_png: 16-bit images decode losslessly (samples16) but "
            "re-encoding is 8-bit only — convert explicitly first"
        )
    out = resize_nearest(
        img["pixels"], img["width"], img["height"], img["channels"],
        new_width, new_height,
    )
    return encode_png(out, new_width, new_height, img["channels"])


def png_stats(data: bytes) -> dict:
    """Decoded-pixel summary: dims, channels, mean/min/max sample value.
    The feature-extraction real path for decode_media on PNG inputs.
    16-bit images report stats over the LOSSLESS 16-bit samples."""
    img = decode_png(data)
    px = img.get("samples16") or img["pixels"]
    return {
        "width": img["width"],
        "height": img["height"],
        "channels": img["channels"],
        "mean": sum(px) / len(px),
        "min": min(px),
        "max": max(px),
    }
