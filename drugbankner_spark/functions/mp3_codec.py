"""Pure-stdlib MPEG-audio (MP3) stream parser — metadata-grade E4 support.

Full MP3 *decode* (polyphase filterbank + IMDCT + Huffman spectral data)
genuinely needs a codec library and keeps the honest
``NotImplementedError`` path in operators/multimodal.py. But the MPEG
audio *framing* layer (ISO/IEC 11172-3 §2.4.1) is plain bit-packed
headers, so everything a data pipeline needs short of samples —
duration, bitrate, sample rate, channel mode, frame count, CBR/VBR,
ID3v1/ID3v2 tag detection — parses with stdlib ints alone. That is what
this module implements:

- frame-header parse: MPEG version 1/2/2.5 × Layer I/II/III, bitrate
  and sample-rate tables, padding, channel mode; per-frame byte length
  and samples-per-frame so a full-stream walk yields exact duration.
- stream walk: skips a leading ID3v2 tag (syncsafe size), resyncs past
  junk bytes to the first valid header, validates each frame by
  CONSECUTIVENESS (the next frame must also parse — the standard
  defense against 0xFFE byte coincidences), ignores a truncated tail,
  and detects a trailing 128-byte ID3v1 tag.
- fixture encode: structurally valid CBR/VBR silence streams plus
  minimal ID3v2/ID3v1 tags for round-trip tests.

Executor-side usage: called from Arrow-batched ``mapInPandas`` —
embarrassingly parallel, shuffles nothing.
"""

from __future__ import annotations

import struct

# bitrate_kbps[version_group][layer_index][bitrate_code]; version_group
# 0 = MPEG1, 1 = MPEG2/2.5 (which share a table); layer_index 0 = Layer
# I, 1 = Layer II, 2 = Layer III. Code 0 is "free format" and 15 is
# invalid — both None here.
_BITRATES = (
    (
        (None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
         416, 448, None),
        (None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
         320, 384, None),
        (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
         256, 320, None),
    ),
    (
        (None, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
         224, 256, None),
        (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
         160, None),
        (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
         160, None),
    ),
)

# sample_rate_hz[version][code]; version keys follow the 2-bit header
# field: 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1 (1 is reserved).
_SAMPLE_RATES = {
    3: (44100, 48000, 32000, None),
    2: (22050, 24000, 16000, None),
    0: (11025, 12000, 8000, None),
}

_VERSION_NAMES = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}
_MODE_CHANNELS = (2, 2, 2, 1)  # stereo, joint, dual, mono


def parse_frame_header(data: bytes, offset: int = 0) -> dict | None:
    """Parse one 4-byte MPEG audio frame header at ``offset``.

    Returns None unless the 11-bit sync plus every table field is valid
    (reserved version/layer, bad bitrate/sample-rate codes and
    free-format all reject). The returned dict carries everything needed
    to step the stream: ``frame_bytes`` (header included) and
    ``samples`` per frame.
    """
    if offset + 4 > len(data):
        return None
    hdr = struct.unpack_from(">I", data, offset)[0]
    if (hdr >> 21) & 0x7FF != 0x7FF:
        return None
    version = (hdr >> 19) & 0x3
    layer_code = (hdr >> 17) & 0x3
    if version == 1 or layer_code == 0:
        return None  # reserved
    layer = 4 - layer_code  # code 3→Layer I, 2→II, 1→III
    bitrate_code = (hdr >> 12) & 0xF
    sr_code = (hdr >> 10) & 0x3
    rates = _SAMPLE_RATES[version]
    sample_rate = rates[sr_code]
    bitrate = _BITRATES[0 if version == 3 else 1][layer - 1][bitrate_code]
    if sample_rate is None or bitrate is None:
        return None
    padding = (hdr >> 9) & 0x1
    mode = (hdr >> 6) & 0x3
    bps = bitrate * 1000
    if layer == 1:
        frame_bytes = (12 * bps // sample_rate + padding) * 4
        samples = 384
    elif layer == 2:
        frame_bytes = 144 * bps // sample_rate + padding
        samples = 1152
    else:  # Layer III: MPEG2/2.5 halve both slots and samples
        if version == 3:
            frame_bytes = 144 * bps // sample_rate + padding
            samples = 1152
        else:
            frame_bytes = 72 * bps // sample_rate + padding
            samples = 576
    return {
        "version": _VERSION_NAMES[version],
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": sample_rate,
        "channels": _MODE_CHANNELS[mode],
        "padding": padding,
        "frame_bytes": frame_bytes,
        "samples": samples,
    }


def id3v2_size(data: bytes) -> int:
    """Total byte length of a leading ID3v2 tag (0 if absent).

    The size field is syncsafe (4×7 bits, ID3v2 §3.1) and EXCLUDES the
    10-byte header; a footer flag (bit 4) adds another 10.
    """
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        return 0  # not syncsafe → not a valid tag header
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


def has_id3v1(data: bytes) -> bool:
    return len(data) >= 128 and data[-128:-125] == b"TAG"


def is_mp3(data: bytes) -> bool:
    """True if the payload looks like an MPEG audio stream: a leading
    ID3v2 tag, or two consecutive valid frame headers near the start.
    Two-frame validation keeps random binaries with a stray 0xFFE from
    sniffing as audio."""
    start = id3v2_size(data)
    if start:
        return True
    limit = min(len(data), 4096)
    for off in range(limit):
        h = parse_frame_header(data, off)
        if h is not None:
            nxt = off + h["frame_bytes"]
            if nxt + 4 <= len(data):
                return parse_frame_header(data, nxt) is not None
            return nxt <= len(data)  # one complete frame fills the payload
    return False


def mp3_info(data: bytes) -> dict:
    """Walk every frame and return stream-level metadata.

    Exact duration = Σ samples_per_frame / sample_rate over parsed
    frames — correct for VBR streams where the header-bitrate shortcut
    (file_size / bitrate) is wrong. Junk before the first frame is
    skipped by resync scan; a truncated final frame is ignored;
    ``valid`` is False when no frame parses at all.
    """
    start = id3v2_size(data)
    end = len(data) - 128 if has_id3v1(data) else len(data)
    off = start
    first = None
    while off < end:
        h = parse_frame_header(data, off)
        if h is not None:
            nxt = off + h["frame_bytes"]
            if nxt >= end or parse_frame_header(data, nxt) is not None:
                first = h
                break
        off += 1
    if first is None:
        return {
            "valid": False, "n_frames": 0, "duration_ms": 0,
            "id3v2_bytes": start, "id3v1": has_id3v1(data),
        }
    n_frames = 0
    duration = 0.0
    audio_bytes = 0
    bitrates = set()
    while off + 4 <= end:
        h = parse_frame_header(data, off)
        if h is None:
            break  # stream desynced mid-file: stop rather than guess
        if off + h["frame_bytes"] > end:
            break  # truncated tail frame
        n_frames += 1
        duration += h["samples"] / h["sample_rate"]
        audio_bytes += h["frame_bytes"]
        bitrates.add(h["bitrate_kbps"])
        off += h["frame_bytes"]
    return {
        "valid": True,
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "bitrate_kbps": first["bitrate_kbps"],
        # frame-walk average — the number a VBR stream actually plays
        # at; equals the header bitrate (± padding) for CBR streams
        "avg_bitrate_kbps": (
            round(audio_bytes * 8 / duration / 1000, 3) if duration else 0.0
        ),
        "vbr": len(bitrates) > 1,
        "n_frames": n_frames,
        "duration_ms": int(round(duration * 1000)),
        "id3v2_bytes": start,
        "id3v1": has_id3v1(data),
    }


def segment_mp3(data: bytes, n_segments: int) -> list[tuple[int, bytes]]:
    """Time-sliced (ts_ms, payload) segments split on FRAME boundaries —
    the MP3 twin of wav_codec.segment_wav. Each segment is a
    structurally valid standalone MPEG stream (contiguous whole frames;
    note Layer III's bit reservoir can reference up to ~511 bytes of
    prior frames, so a decoder may soften the first fraction of a
    segment — framing, duration and parsing stay exact). ID3 tags are
    dropped; returns [] when no frames parse."""
    info = mp3_info(data)
    if not info["valid"] or info["n_frames"] == 0:
        return []
    # re-walk to collect frame offsets (mp3_info validated the stream).
    # The resync uses mp3_info's SAME consecutiveness test (next frame
    # parses, or this frame fills the stream) — a lone 0xFFE coincidence
    # in junk prefix must not start the walk at a different offset than
    # mp3_info did (ADVICE r05).
    start = id3v2_size(data)
    end = len(data) - 128 if has_id3v1(data) else len(data)
    off = start
    while off < end:
        h = parse_frame_header(data, off)
        if h is not None:
            nxt = off + h["frame_bytes"]
            if nxt >= end or parse_frame_header(data, nxt) is not None:
                break
        off += 1
    frames: list[tuple[int, int]] = []  # (offset, frame_bytes)
    t_ms: list[float] = []
    t = 0.0
    while off + 4 <= end:
        h = parse_frame_header(data, off)
        if h is None or off + h["frame_bytes"] > end:
            break
        frames.append((off, h["frame_bytes"]))
        t_ms.append(t)
        t += h["samples"] * 1000.0 / h["sample_rate"]
        off += h["frame_bytes"]
    n = min(n_segments, len(frames))
    per = len(frames) / n
    out = []
    for i in range(n):
        lo, hi = int(i * per), int((i + 1) * per) if i + 1 < n else len(frames)
        seg = data[frames[lo][0]:frames[hi - 1][0] + frames[hi - 1][1]]
        out.append((int(round(t_ms[lo])), seg))
    return out


# ---------------------------------------------------------------- fixtures

_BITRATE_CODE = {}
for _vg in (0, 1):
    for _li in (0, 1, 2):
        for _code, _kbps in enumerate(_BITRATES[_vg][_li]):
            if _kbps is not None:
                _BITRATE_CODE[(_vg, _li, _kbps)] = _code


def encode_frame(
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    version: int = 3,
    layer: int = 3,
    padding: int = 0,
    mono: bool = False,
) -> bytes:
    """One structurally valid frame (header + zeroed payload) for
    fixtures — a decoder sees silence-shaped garbage, a parser sees a
    correct stream."""
    sr_code = _SAMPLE_RATES[version].index(sample_rate)
    vg = 0 if version == 3 else 1
    bitrate_code = _BITRATE_CODE[(vg, layer - 1, bitrate_kbps)]
    layer_code = 4 - layer
    mode = 3 if mono else 0
    hdr = (
        (0x7FF << 21) | (version << 19) | (layer_code << 17) | (1 << 16)
        | (bitrate_code << 12) | (sr_code << 10) | (padding << 9)
        | (mode << 6)
    )
    head = struct.pack(">I", hdr)
    info = parse_frame_header(head)
    return head + bytes(info["frame_bytes"] - 4)


def encode_mp3(
    n_frames: int = 10,
    bitrate_kbps: int | list[int] = 128,
    sample_rate: int = 44100,
    version: int = 3,
    id3v2_payload: bytes | None = None,
    id3v1: bool = False,
) -> bytes:
    """A structurally valid MPEG stream: optional ID3v2 tag, n CBR or
    per-frame-bitrate (VBR) Layer III frames, optional ID3v1 trailer."""
    rates = (
        list(bitrate_kbps)
        if isinstance(bitrate_kbps, (list, tuple))
        else [bitrate_kbps] * n_frames
    )
    out = bytearray()
    if id3v2_payload is not None:
        out += encode_id3v2(id3v2_payload)
    for kbps in rates:
        out += encode_frame(kbps, sample_rate, version)
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


def encode_id3v2(payload: bytes) -> bytes:
    """Minimal ID3v2.3 tag wrapping ``payload`` (syncsafe size)."""
    n = len(payload)
    if n >= 1 << 28:
        raise ValueError("ID3v2 payload too large for syncsafe size")
    size = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    return b"ID3\x03\x00\x00" + size + payload
