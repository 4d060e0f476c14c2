"""Pure-stdlib GIF (87a/89a) codec — a REAL animated-image path for E4.

GIF needs no external libraries either: LZW over palette indices plus a
block container. This module implements:

- decode: header/logical-screen parse, global+local color tables, full
  LZW decompression (12-bit cap, CLEAR/END codes, KwKwK case, late
  code-size growth), interlace passes, Graphic Control Extension
  (per-frame delay, transparency index), multi-frame animations.
- encode: real LZW compression (dictionary reset at 4096), optional
  interlace, multi-frame with per-frame delays — valid files any
  decoder opens; used for fixtures and for re-emitting sampled frames
  as STANDALONE single-frame GIFs (the video-frame-sampling story).

The encoder/decoder code-size discipline is the classic non-early-
change pairing: the encoder grows at ``next_code == (1<<size)+1``, one
code later than the decoder's ``next_code == 1<<size`` — the offset
exists because the decoder materializes each dictionary entry one code
behind the encoder.

Executor-side usage: called from Arrow-batched ``mapInPandas`` —
embarrassingly parallel, shuffles nothing.
"""

from __future__ import annotations

import struct

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------------- LZW

def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # truncated stream: return what decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError("gif: corrupt LZW stream (code gap)")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table.append(prev + (entry[0],))
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        if len(out) >= n_expected:
            return out[:n_expected]


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = (int(k),)
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------- decode

def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos:pos + n])
        pos += n


def _deinterlace(rows: list[list[int]]) -> list[list[int]]:
    h = len(rows)
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out: list[list[int] | None] = [None] * h
    for src_i, y in enumerate(order):
        out[y] = rows[src_i]
    return out  # type: ignore[return-value]


def decode_gif(data: bytes) -> dict:
    """Full parse: (width, height, n_frames, loop, frames=[{left, top,
    width, height, delay_ms, transparent_idx, indices, palette}]).
    ``indices`` are palette indices row-major; ``palette`` is the
    effective (local-or-global) table as an RGB byte string."""
    if not is_gif(data):
        raise ValueError("gif: bad signature")
    width, height, packed, _bg, _aspect = struct.unpack_from(
        "<HHBBB", data, 6
    )
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    frames = []
    delay_ms = 0
    transparent = -1
    loop = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                blk, pos = _sub_blocks(data, pos)
                gc_packed, delay_cs, tr = struct.unpack_from("<BHB", blk, 0)
                delay_ms = delay_cs * 10
                transparent = tr if gc_packed & 1 else -1
            elif label == 0xFF:  # application ext (NETSCAPE loop count)
                blk, pos = _sub_blocks(data, pos)
                if blk[:11] == b"NETSCAPE2.0" and len(blk) >= 14:
                    loop = struct.unpack_from("<H", blk, 12)[0]
            else:
                _, pos = _sub_blocks(data, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = data[pos:pos + 3 * n]
            pos += 3 * n
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(min_code, lzw, w * h)
        if len(idx) < w * h:
            idx = idx + [0] * (w * h - len(idx))
        rows = [idx[y * w:(y + 1) * w] for y in range(h)]
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        frames.append({
            "left": left, "top": top, "width": w, "height": h,
            "delay_ms": delay_ms, "transparent_idx": transparent,
            "indices": [px for row in rows for px in row],
            "palette": palette,
        })
        delay_ms = 0
        transparent = -1
    return {
        "width": width, "height": height, "n_frames": len(frames),
        "loop": loop, "frames": frames,
    }


def gif_frame_rgb(frame: dict) -> bytes:
    """One decoded frame as interleaved RGB bytes via its palette."""
    pal = frame["palette"]
    out = bytearray()
    for i in frame["indices"]:
        out += pal[3 * i:3 * i + 3]
    return bytes(out)


# ----------------------------------------------------------------- encode

def _color_table_bits(n_colors: int) -> int:
    bits = 1
    while (2 << (bits - 1)) < n_colors:
        bits += 1
    return bits


def encode_gif(
    frames: list[list[int]],
    width: int,
    height: int,
    palette: bytes,
    delays_ms: list[int] | None = None,
    interlace: bool = False,
    loop: int = 0,
) -> bytes:
    """Encode palette-index frames (each row-major, full canvas) as a
    GIF89a. The palette is an RGB byte string (≤256 colors, padded to a
    power of two)."""
    n_colors = len(palette) // 3
    bits = _color_table_bits(max(n_colors, 2))
    table_size = 2 << (bits - 1)
    pal = palette + bytes(3 * (table_size - n_colors))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += pal
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"
    delays = delays_ms or [0] * len(frames)
    min_code = max(2, bits)
    for idx, (frame, delay) in enumerate(zip(frames, delays)):
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0, delay // 10, 0
        ) + b"\x00"
        ipacked = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, width, height, ipacked
        )
        rows = [frame[y * width:(y + 1) * width] for y in range(height)]
        if interlace:
            order = [y for start, step in _INTERLACE_PASSES
                     for y in range(start, height, step)]
            rows = [rows[y] for y in order]
        flat = [px for row in rows for px in row]
        lzw = _lzw_encode(min_code, flat)
        out.append(min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def sample_gif_frames(data: bytes, n: int) -> list[tuple[int, int, bytes]]:
    """≤n evenly spaced frames as (frame_idx, ts_ms, standalone
    single-frame GIF) — the GIF twin of avi_codec.sample_avi_frames;
    each payload re-decodes independently."""
    g = decode_gif(data)
    frames = g["frames"]
    if not frames:
        return []
    n = min(n, len(frames))
    step = len(frames) / n
    ts = []
    t = 0
    for f in frames:
        ts.append(t)
        t += f["delay_ms"]
    out = []
    for i in range(n):
        fi = int(i * step)
        f = frames[fi]
        standalone = encode_gif(
            [f["indices"]], f["width"], f["height"], f["palette"],
            delays_ms=[f["delay_ms"]],
        )
        out.append((fi, ts[fi], standalone))
    return out
