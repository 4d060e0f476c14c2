"""Pure-stdlib Netpbm codec (PGM P2/P5, PPM P3/P6) — the classic
vision-dataset formats (raw grayscale/RGB with a whitespace header).
Decode + encode; wired into operators/multimodal.py so PNM images join
the metadata probe, decode features, and perceptual-hash dedup family.

Executor-side usage: called from Arrow-batched ``mapInPandas`` —
embarrassingly parallel, shuffles nothing.
"""

from __future__ import annotations

_MAGICS = {b"P2": ("ascii", 1), b"P3": ("ascii", 3),
           b"P5": ("raw", 1), b"P6": ("raw", 3)}


def is_pnm(data: bytes) -> bool:
    return data[:2] in _MAGICS and len(data) > 7


def _tokens(data: bytes, start: int, n: int):
    """First ``n`` whitespace-separated tokens after ``start``,
    skipping '#' comment lines; returns (tokens, pos_after)."""
    toks: list[bytes] = []
    pos = start
    while len(toks) < n and pos < len(data):
        c = data[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
        else:
            end = pos
            while end < len(data) and not data[end:end + 1].isspace():
                end += 1
            toks.append(data[pos:end])
            pos = end
    return toks, pos


def decode_pnm(data: bytes) -> dict:
    """(width, height, channels, maxval, pixels) — pixels are raw
    interleaved samples (8-bit; maxval ≤ 255 supported)."""
    magic = data[:2]
    if magic not in _MAGICS:
        raise ValueError("pnm: bad magic")
    mode, channels = _MAGICS[magic]
    (w_tok, h_tok, max_tok), pos = _tokens(data, 2, 3)
    width, height, maxval = int(w_tok), int(h_tok), int(max_tok)
    if maxval > 255:
        raise ValueError("pnm: 16-bit maxval unsupported")
    n = width * height * channels
    if mode == "raw":
        # exactly ONE whitespace byte separates header from raster
        raster = data[pos + 1:pos + 1 + n]
        if len(raster) < n:
            raise ValueError("pnm: truncated raster")
        pixels = bytes(raster)
    else:
        toks, _ = _tokens(data, pos, n)
        if len(toks) < n:
            raise ValueError("pnm: truncated ASCII raster")
        pixels = bytes(int(t) for t in toks)
    return {"width": width, "height": height, "channels": channels,
            "maxval": maxval, "pixels": pixels}


def encode_pnm(
    pixels: bytes, width: int, height: int, channels: int = 1,
    ascii_format: bool = False,
) -> bytes:
    if channels not in (1, 3):
        raise ValueError("encode_pnm: channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("encode_pnm: pixel buffer size mismatch")
    if ascii_format:
        magic = b"P2" if channels == 1 else b"P3"
        body = b"\n".join(
            b" ".join(str(v).encode() for v in pixels[i:i + width * channels])
            for i in range(0, len(pixels), width * channels)
        )
        return magic + f"\n{width} {height}\n255\n".encode() + body + b"\n"
    magic = b"P5" if channels == 1 else b"P6"
    return magic + f"\n{width} {height}\n255\n".encode() + pixels
