"""Pure-stdlib MP4 / ISO-BMFF (ISO/IEC 14496-12) box parser — E4
container-metadata support for compressed video/audio files.

Decoding H.264/AAC sample data genuinely needs codec libraries and
keeps the honest ``NotImplementedError`` path in
operators/multimodal.py. The *container* layer, though, is a plain
length-prefixed box tree, so everything a curation pipeline filters on
— duration, track count, per-track media type and codec fourcc, sample
counts, resolution — parses with struct alone:

- box walk: (size, fourcc) headers with 64-bit ``largesize`` support,
  recursion into the standard container boxes, unknown boxes skipped by
  size (forward-compatible by construction).
- extracted metadata: ``ftyp`` major brand, ``mvhd``
  timescale/duration (v0 + v1), per-``trak`` ``tkhd`` id +
  width/height, ``mdhd`` timescale/duration, ``hdlr`` handler type,
  ``stsd`` first sample-entry fourcc, ``stsz`` sample count.
- fixture encode: a minimal but structurally complete
  ftyp+moov(+mdat) file for round-trip tests.

Executor-side usage: called from Arrow-batched ``mapInPandas`` —
embarrassingly parallel, shuffles nothing.
"""

from __future__ import annotations

import struct

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex",
    b"moof", b"traf", b"udta",
}

_BRANDS = {
    b"isom", b"iso2", b"iso4", b"iso5", b"iso6", b"mp41", b"mp42",
    b"avc1", b"M4A ", b"M4V ", b"qt  ", b"3gp4", b"3gp5", b"dash",
    b"heic", b"mif1",
}


def is_mp4(data: bytes) -> bool:
    """True when the payload starts with a well-formed ``ftyp`` box and
    a known major brand — the standard ISO-BMFF sniff."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return False
    size = struct.unpack_from(">I", data, 0)[0]
    return 8 <= size <= len(data) and data[8:12] in _BRANDS


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, body_start, body_end) for each top-level box in
    [start, end). Tolerates size-0 ("to end of file") and 64-bit
    largesize boxes; stops (rather than raises) on a malformed header so
    a truncated download still yields its leading metadata."""
    end = len(data) if end is None else end
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", data, off)[0]
        fourcc = data[off + 4:off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                return
            size = struct.unpack_from(">Q", data, off + 8)[0]
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off or off + size > end:
            return
        yield fourcc, body, off + size
        off += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in walk_boxes(data, start, end):
        if fc == fourcc:
            return b, e
    return None


def _fullbox_u32s(data: bytes, off: int, n_v0: int, n_v1: int):
    """Read a full-box header; return (version, values) where values are
    u32s for version 0 and u64s where the spec widens them in v1."""
    version = data[off]
    if version == 0:
        vals = struct.unpack_from(f">{n_v0}I", data, off + 4)
    else:
        vals = struct.unpack_from(f">{n_v1}Q", data, off + 4)
    return version, vals


def mp4_info(data: bytes) -> dict:
    """Container-level metadata for an ISO-BMFF payload.

    ``duration_ms`` comes from ``mvhd`` (movie timescale); each track
    reports its ``hdlr`` type (vide/soun/...), first ``stsd`` codec
    fourcc, ``mdhd`` duration in its own timescale, ``stsz`` sample
    count, and ``tkhd`` display width/height (16.16 fixed point).
    """
    out: dict = {"valid": False, "brand": None, "duration_ms": 0,
                 "tracks": []}
    if not is_mp4(data):
        return out
    out["brand"] = data[8:12].decode("latin-1")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        return out
    out["valid"] = True
    mvhd = _find(data, moov[0], moov[1], b"mvhd")
    if mvhd is not None:
        # mvhd v0: ctime, mtime, timescale, duration (u32 each); v1
        # widens ctime/mtime/duration to u64 but timescale stays u32.
        version = data[mvhd[0]]
        if version == 0:
            _, _, timescale, duration = struct.unpack_from(
                ">4I", data, mvhd[0] + 4)
        else:
            _, _, timescale, duration = struct.unpack_from(
                ">QQIQ", data, mvhd[0] + 4)
        if timescale:
            out["duration_ms"] = int(round(duration * 1000 / timescale))
    for fc, b, e in walk_boxes(data, moov[0], moov[1]):
        if fc != b"trak":
            continue
        track: dict = {"track_id": None, "handler": None, "codec": None,
                       "duration_ms": 0, "n_samples": 0,
                       "width": 0, "height": 0}
        tkhd = _find(data, b, e, b"tkhd")
        if tkhd is not None:
            version = data[tkhd[0]]
            if version == 0:
                track["track_id"] = struct.unpack_from(
                    ">I", data, tkhd[0] + 12)[0]
                dims_off = tkhd[0] + 4 + 4 * 4 + 4 + 4 * 2 + 2 * 2 + 2 + 2 + 36
            else:
                track["track_id"] = struct.unpack_from(
                    ">I", data, tkhd[0] + 20)[0]
                dims_off = tkhd[0] + 4 + 8 * 2 + 4 + 4 + 8 + 4 * 2 + 2 * 2 + 2 + 2 + 36
            if dims_off + 8 <= tkhd[1]:
                w, h = struct.unpack_from(">II", data, dims_off)
                track["width"], track["height"] = w >> 16, h >> 16
        mdia = _find(data, b, e, b"mdia")
        if mdia is not None:
            mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
            if mdhd is not None:
                version = data[mdhd[0]]
                if version == 0:
                    _, _, ts, dur = struct.unpack_from(
                        ">4I", data, mdhd[0] + 4)
                else:
                    _, _, ts, dur = struct.unpack_from(
                        ">QQIQ", data, mdhd[0] + 4)
                if ts:
                    track["duration_ms"] = int(round(dur * 1000 / ts))
            hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                track["handler"] = data[hdlr[0] + 8:hdlr[0] + 12].decode(
                    "latin-1")
            minf = _find(data, mdia[0], mdia[1], b"minf")
            if minf is not None:
                stbl = _find(data, minf[0], minf[1], b"stbl")
                if stbl is not None:
                    stsd = _find(data, stbl[0], stbl[1], b"stsd")
                    if stsd is not None and stsd[0] + 16 <= stsd[1]:
                        # full box (4) + entry_count (4) + first entry's
                        # size (4) then fourcc
                        track["codec"] = data[
                            stsd[0] + 12:stsd[0] + 16].decode("latin-1")
                    stsz = _find(data, stbl[0], stbl[1], b"stsz")
                    if stsz is not None and stsz[0] + 12 <= stsz[1]:
                        track["n_samples"] = struct.unpack_from(
                            ">I", data, stsz[0] + 8)[0]
        out["tracks"].append(track)
    return out


# ---------------------------------------------------------------- fixtures

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + payload)


def encode_mp4(
    duration_ms: int = 2000,
    timescale: int = 1000,
    handler: bytes = b"vide",
    codec: bytes = b"avc1",
    width: int = 640,
    height: int = 360,
    n_samples: int = 48,
    mdat: bytes = b"",
    mvhd_v1: bool = False,
) -> bytes:
    """A minimal structurally complete single-track MP4 for fixtures —
    parsers see real boxes; there is no decodable sample data."""
    duration = duration_ms * timescale // 1000
    if mvhd_v1:
        mvhd = _full(b"mvhd", 1, struct.pack(
            ">QQIQ", 0, 0, timescale, duration) + bytes(80))
    else:
        mvhd = _full(b"mvhd", 0, struct.pack(
            ">4I", 0, 0, timescale, duration) + bytes(80))
    tkhd = _full(b"tkhd", 0, struct.pack(
        ">IIII", 0, 0, 1, 0) + struct.pack(">I", duration) + bytes(8)
        + struct.pack(">hhhh", 0, 0, 0, 0) + bytes(36)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, struct.pack(
        ">4I", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, bytes(4) + handler + bytes(12) + b"h\x00")
    entry = _box(codec, bytes(78))  # opaque sample entry body
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
    stsz = _full(b"stsz", 0, struct.pack(">II", 0, n_samples)
                 + struct.pack(f">{n_samples}I", *([100] * n_samples)))
    stts = _full(b"stts", 0, struct.pack(
        ">III", 1, n_samples, max(1, duration // max(1, n_samples))))
    stbl = _box(b"stbl", stsd + stts + stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2"
                + codec)
    out = ftyp + moov
    if mdat:
        out += _box(b"mdat", mdat)
    return out
