"""Pure-stdlib BMP (Windows DIB) codec — the simplest real E4 image
path: uncompressed BI_RGB at 24-bit true color and 8-bit palette,
bottom-up or top-down rows, 4-byte row padding. Decode + encode (for
fixtures and re-emission).

Executor-side usage: called from Arrow-batched ``mapInPandas`` —
embarrassingly parallel, shuffles nothing.
"""

from __future__ import annotations

import struct


def is_bmp(data: bytes) -> bool:
    return len(data) > 54 and data[:2] == b"BM"


def decode_bmp(data: bytes) -> dict:
    """(width, height, channels, pixels) — pixels are interleaved RGB
    (or single-channel for 8-bit grayscale palettes), row-major
    TOP-DOWN regardless of the file's row order."""
    if not is_bmp(data):
        raise ValueError("bmp: bad signature")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("bmp: pre-BITMAPINFOHEADER files unsupported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise ValueError(f"bmp: compression {compression} unsupported")
    if bpp not in (8, 24):
        raise ValueError(f"bmp: {bpp}-bit unsupported (8/24 only)")
    top_down = height < 0
    height = abs(height)
    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_size
        palette = [
            data[pal_off + 4 * i:pal_off + 4 * i + 3][::-1]  # BGRx → RGB
            for i in range(n_colors)
        ]
    row_bytes = (width * bpp // 8 + 3) & ~3
    rows = []
    for y in range(height):
        off = pixel_off + y * row_bytes
        raw = data[off:off + width * bpp // 8]
        if bpp == 24:
            # BGR → RGB
            row = bytearray()
            for x in range(width):
                b, g, r = raw[3 * x:3 * x + 3]
                row += bytes((r, g, b))
            rows.append(bytes(row))
        else:
            rows.append(raw)
    if not top_down:
        rows.reverse()
    px = b"".join(rows)
    if bpp == 8:
        # grayscale palettes collapse to 1 channel; color palettes expand
        if all(p[0] == p[1] == p[2] for p in palette):
            pixels = bytes(palette[i][0] for i in px)
            return {"width": width, "height": height, "channels": 1,
                    "pixels": pixels}
        pixels = b"".join(palette[i] for i in px)
        return {"width": width, "height": height, "channels": 3,
                "pixels": pixels}
    return {"width": width, "height": height, "channels": 3, "pixels": px}


def encode_bmp(
    pixels: bytes, width: int, height: int, channels: int = 3
) -> bytes:
    """24-bit (RGB in) or 8-bit grayscale BI_RGB BMP, bottom-up rows."""
    if channels == 3:
        row_raw = width * 3
        row_bytes = (row_raw + 3) & ~3
        body = bytearray()
        for y in range(height - 1, -1, -1):
            row = bytearray()
            for x in range(width):
                r, g, b = pixels[(y * width + x) * 3:(y * width + x) * 3 + 3]
                row += bytes((b, g, r))
            row += bytes(row_bytes - row_raw)
            body += row
        palette = b""
        bpp = 24
    elif channels == 1:
        row_bytes = (width + 3) & ~3
        body = bytearray()
        for y in range(height - 1, -1, -1):
            row = pixels[y * width:(y + 1) * width]
            body += row + bytes(row_bytes - width)
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
        bpp = 8
    else:
        raise ValueError("encode_bmp: channels must be 1 or 3")
    pixel_off = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(body),
        2835, 2835, 256 if bpp == 8 else 0, 0,
    )
    head = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off
    )
    return head + info + palette + bytes(body)
