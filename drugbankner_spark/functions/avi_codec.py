"""MJPEG-AVI video container codec (E4) — pure stdlib RIFF parsing.

Rounds 1-4 treated "video containers" as needing ffmpeg. Compressed
codecs (H.264 etc.) do — but the CONTAINER layer is just RIFF (the same
chunk grammar as WAV, functions/wav_codec.py), and the classic
Motion-JPEG flavor stores each frame as a standalone baseline JPEG,
which functions/jpeg_codec.py now decodes. So MJPEG-AVI frame
extraction is fully implementable here: parse RIFF → walk the 'movi'
LIST → collect '##dc'/'##db' stream chunks → each payload is a JPEG.

Writer + reader both live here so tests can synthesize real videos:

- ``encode_avi(frames, width, height, fps)`` — minimal but conforming
  AVI: RIFF('AVI ') → LIST('hdrl') [avih + LIST('strl')[strh('vids',
  'MJPG') + strf(BITMAPINFOHEADER)]] → LIST('movi')['00dc' chunks] →
  'idx1' index. Frames are JPEG byte strings (from encode_jpeg).
- ``decode_avi_frames(data)`` — yields (frame_idx, ts_ms, jpeg_bytes);
  timestamps from the header's rate/scale.
- ``avi_info(data)`` — (width, height, fps, n_frames) without touching
  frame payloads.

Anything that is not RIFF/AVI, or whose streams are not MJPEG/DIB,
raises — compressed codecs stay honestly out of scope.
"""

from __future__ import annotations

import struct


def is_avi(data: bytes) -> bool:
    return (
        len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"AVI "
    )


def _chunks(data: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a chunk run;
    chunks are word-aligned (odd sizes padded), exactly as in WAV."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def encode_avi(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Write an MJPEG AVI from JPEG frame payloads."""
    if not frames:
        raise ValueError("encode_avi: at least one frame required")
    us_per_frame = 1_000_000 // fps

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    max_bytes = max(len(f) for f in frames)
    # avih: MainAVIHeader (14 DWORDs)
    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    # strh: AVIStreamHeader for a 'vids' MJPG stream
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        max_bytes, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    # strf: BITMAPINFOHEADER, biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_payload)
    # idx1: one entry per frame (offset relative to 'movi' fourcc)
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off,
                                       len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse(data: bytes):
    if not is_avi(data):
        raise ValueError("not an AVI stream")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    us_per_frame = 40_000
    width = height = n_frames = 0
    handler = b""
    frames: list[tuple[int, int]] = []  # (start, size)
    for fourcc, p, size in _chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        kind = data[p:p + 4]
        if kind == b"hdrl":
            for f2, p2, s2 in _chunks(data, p + 4, p + size):
                if f2 == b"avih":
                    vals = struct.unpack_from("<14I", data, p2)
                    us_per_frame = vals[0] or us_per_frame
                    n_frames = vals[4]
                    width, height = vals[8], vals[9]
                elif f2 == b"LIST" and data[p2:p2 + 4] == b"strl":
                    for f3, p3, s3 in _chunks(data, p2 + 4, p2 + s2):
                        if f3 == b"strh":
                            typ, hdl = struct.unpack_from(
                                "<4s4s", data, p3)
                            if typ == b"vids":
                                handler = hdl
        elif kind == b"movi":
            for f2, p2, s2 in _chunks(data, p + 4, p + size):
                # '##dc' compressed / '##db' uncompressed video chunk
                if f2[2:4] in (b"dc", b"db"):
                    frames.append((p2, s2))
    if not width or not frames:
        raise ValueError("avi: no video stream found")
    if handler not in (b"MJPG", b"mjpg", b"DIB ", b"\x00\x00\x00\x00"):
        raise ValueError(
            f"avi: codec {handler!r} needs external libraries; only "
            "MJPG (Motion-JPEG) and uncompressed DIB are supported"
        )
    return us_per_frame, width, height, n_frames, frames


def avi_info(data: bytes) -> dict:
    us_per_frame, width, height, n_frames, frames = _parse(data)
    return {
        "width": width,
        "height": height,
        "fps": round(1_000_000 / us_per_frame, 3),
        "n_frames": n_frames or len(frames),
    }


def decode_avi_frames(data: bytes) -> list[tuple[int, int, bytes]]:
    """All video frames as (frame_idx, ts_ms, payload). For MJPG
    streams each payload is a standalone baseline JPEG (decode with
    functions/jpeg_codec.decode_jpeg)."""
    us_per_frame, _, _, _, frames = _parse(data)
    return [
        (i, (i * us_per_frame) // 1000, data[p:p + s])
        for i, (p, s) in enumerate(frames)
    ]


def sample_avi_frames(
    data: bytes, n: int
) -> list[tuple[int, int, bytes]]:
    """Evenly-spaced subset of ≤n frames — the video twin of
    wav_codec.segment_wav's time slicing."""
    all_frames = decode_avi_frames(data)
    if len(all_frames) <= n:
        return all_frames
    step = len(all_frames) / n
    picked = []
    for i in range(n):
        idx = int(i * step)
        picked.append(all_frames[idx])
    return picked
