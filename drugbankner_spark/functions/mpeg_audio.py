"""MPEG-1 Layer I/II audio SAMPLE decoder (round 6 — closing the
audio-decode stub the way JPEG/GIF fell in round 5).

What is spec-real here (ISO/IEC 11172-3, all from closed forms or
small well-known tables):

- the bitstream layers end-to-end: header/CRC skip, Layer I 4-bit
  allocation + 6-bit scalefactors + 12×32 sample slots; Layer II
  allocation tables (B.2a-d structure), scfsi, per-part scalefactors,
  granule sample grouping (3/5/9-level base-n codes);
- requantization: q of n levels → (2q + 1 - n)/n, the spec mapping
  for n = 2^nb - 1 written in its closed algebraic form;
- the scalefactor table: SF[i] = 2·2^(-i/3) (ISO table B.1 is exactly
  this geometric sequence);
- the synthesis filterbank STRUCTURE: the 1024-value V FIFO, the
  64×32 matrixing N[i,k] = cos((16+i)(2k+1)π/64), the U selection,
  the 512-tap windowed 16-term sum (ISO §2.4.3.2 / figure A.2).

What is honestly NOT normative: the 512 prototype-window
coefficients (ISO Table B.3) are a printed table with no generating
formula — they cannot be reproduced from first principles. This
module instead uses the CLOSED-FORM exact-PR prototype for the same
evenly-stacked cosine modulation: w[n] = sin(πn/64) on the first 64
taps (zero beyond) — the Princen-Bradley even-stacked TDAC window.
Through the UNCHANGED spec synthesis machinery this reconstructs the
matched analysis PERFECTLY (round-trip error at float precision,
~300 dB SNR, 33-sample latency — tested), so decode(encode(x)) error
is exactly the quantization error and nothing else. A stream from an
external ISO encoder would decode with correct framing, correct
subband amplitudes, and a shorter (non-normative) reconstruction
lowpass than the 512-tap ISO window. Layer III (Huffman + IMDCT +
bit reservoir) and AAC remain honestly out of scope in
operators/multimodal.py.

Reference behavior parity target: the reference repo has no audio
path at all (this is E4 engine extension surface, SURVEY §2.12).
Executor-side usage: Arrow-batched mapInPandas — embarrassingly
parallel, shuffles nothing.
"""

from __future__ import annotations

import math

import numpy as np

from drugbankner_spark.functions.mp3_codec import (
    has_id3v1,
    id3v2_size,
    parse_frame_header,
)

#: ISO table B.1: scalefactor i → 2·2^(-i/3), i ∈ [0, 62].
SCALEFACTORS = tuple(2.0 * 2.0 ** (-i / 3.0) for i in range(63))

#: Layer II quantization classes: levels → (bits_per_code, grouped).
#: Grouped classes pack 3 samples into one base-n code (ISO §2.4.3.4).
_L2_CLASSES = {
    3: (5, True), 5: (7, True), 7: (3, False), 9: (10, True),
    15: (4, False), 31: (5, False), 63: (6, False), 127: (7, False),
    255: (8, False), 511: (9, False), 1023: (10, False),
    2047: (11, False), 4095: (12, False), 8191: (13, False),
    16383: (14, False), 32767: (15, False), 65535: (16, False),
}

# Layer II bit-allocation tables, ISO table B.2a-d structure: one
# (allocation_field_bits, (levels per allocation code, 0 = silent))
# entry per subband. The high-rate tables' characteristic 65535 jump at
# the tail of the short lists is preserved.
_B2A_SB0 = (0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
            16383, 32767, 65535)
_B2A_SB3 = (0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
            8191, 65535)
_B2A_SB11 = (0, 3, 5, 7, 9, 15, 31, 65535)
_B2A_SB23 = (0, 3, 5, 65535)
_B2CD = (0, 3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
         16383)

_TABLE_B2A = tuple(
    [(4, _B2A_SB0)] * 3 + [(4, _B2A_SB3)] * 8
    + [(3, _B2A_SB11)] * 12 + [(2, _B2A_SB23)] * 4
)  # sblimit 27
_TABLE_B2B = tuple(
    [(4, _B2A_SB0)] * 3 + [(4, _B2A_SB3)] * 8
    + [(3, _B2A_SB11)] * 12 + [(2, _B2A_SB23)] * 7
)  # sblimit 30
_TABLE_B2C = tuple([(4, _B2CD)] * 8)    # sblimit 8
_TABLE_B2D = tuple([(4, _B2CD)] * 12)   # sblimit 12


def layer2_alloc_table(sample_rate: int, bitrate_kbps: int,
                       channels: int) -> tuple:
    """Select the Layer II allocation table (ISO §2.4.2.5 selection
    rules over per-channel bitrate and sample rate)."""
    per_ch = bitrate_kbps // channels
    if sample_rate == 48000:
        return _TABLE_B2A if per_ch >= 56 else _TABLE_B2C
    if per_ch >= 96:
        return _TABLE_B2A
    if per_ch >= 56:
        return _TABLE_B2B
    if per_ch >= 48:  # 48 kbps/ch at 32/44.1 kHz
        return _TABLE_B2C if sample_rate == 44100 else _TABLE_B2D
    return _TABLE_B2C if sample_rate == 44100 else _TABLE_B2D


class _BitstreamError(ValueError):
    """A frame's payload ran out mid-field (corrupt/truncated frame)."""


class _BitReader:
    """MSB-first bit reader over bytes, bounded by ``limit_bits`` —
    reading past the frame boundary raises :class:`_BitstreamError`
    (the decode loop bins the frame instead of mis-decoding)."""

    def __init__(self, data: bytes, offset_bits: int = 0,
                 limit_bits: int | None = None):
        self.data = data
        self.pos = offset_bits
        self.limit = (len(data) * 8) if limit_bits is None else limit_bits

    def read(self, n: int) -> int:
        if self.pos + n > self.limit:
            raise _BitstreamError(
                f"bitstream overrun at bit {self.pos}+{n} > {self.limit}"
            )
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self) -> bytes:
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _requant(q: int, levels: int) -> float:
    """Spec requantization in closed form: code q of n levels →
    (2q + 1 - n)/n ∈ (-1, 1), symmetric, zero exactly representable
    for odd n."""
    return (2 * q + 1 - levels) / levels


def _quant(x: float, levels: int) -> int:
    """Inverse of :func:`_requant` (fixture encoder): nearest code."""
    q = int(round((x * levels - 1 + levels) / 2.0))
    return max(0, min(levels - 1, q))


# ---------------------------------------------------------------- filterbank

_N_SYNTH = np.array([
    [math.cos((16 + i) * (2 * k + 1) * math.pi / 64.0) for k in range(32)]
    for i in range(64)
])
_N_ANAL = np.array([
    [math.cos((2 * k + 1) * (i - 16) * math.pi / 64.0) for i in range(64)]
    for k in range(32)
])


def _tdac_windows() -> tuple[np.ndarray, np.ndarray]:
    """(analysis C, synthesis D): the closed-form exact-PR pair for the
    MPEG evenly-stacked modulation — sin(πn/64) on the first 64 taps,
    zero beyond; the synthesis side carries the loop's exact -1/16
    gain. Verified perfect reconstruction (error at float epsilon)
    with 33 samples of latency."""
    n = np.arange(64)
    w = np.sin(np.pi * n / 64.0)
    c = np.zeros(512)
    # analysis scaled 1/16 so a full-scale input's subband samples peak
    # ~1.4 — inside the scalefactor table's 2.0 ceiling (unscaled they
    # hit ~22 and the quantizer clips); synthesis carries the matching
    # ×16 and the loop's exact -1/16, i.e. -1 net
    c[:64] = w / 16.0
    d = np.zeros(512)
    d[:64] = -w
    return c, d


def analysis_filterbank(pcm: np.ndarray, c_window=None) -> np.ndarray:
    """ISO §C.1.3-shape analysis: 512-sample sliding window, windowed
    partial sums, 32×64 cosine matrixing → (n_blocks, 32) subband
    samples (one block per 32 input samples)."""
    c = _C_WINDOW if c_window is None else c_window
    x = np.asarray(pcm, dtype=np.float64)
    n_blocks = len(x) // 32
    out = np.zeros((n_blocks, 32))
    buf = np.zeros(512)
    for t in range(n_blocks):
        buf = np.roll(buf, 32)
        # newest 32 samples enter reversed (FIFO semantics)
        buf[:32] = x[t * 32:(t + 1) * 32][::-1]
        z = buf * c
        y = z.reshape(8, 64).sum(axis=0)
        out[t] = _N_ANAL @ y
    return out


def synthesis_filterbank(subbands: np.ndarray, d_window=None) -> np.ndarray:
    """ISO §2.4.3.2 synthesis: per 32-sample block, shift the V FIFO by
    64, matrix the subband samples in, build U by the spec's alternating
    V-block selection, window by D, and sum 16 partials per output
    sample."""
    d = _D_WINDOW if d_window is None else d_window
    sb = np.asarray(subbands, dtype=np.float64)
    n_blocks = sb.shape[0]
    v = np.zeros(1024)
    out = np.zeros(n_blocks * 32)
    u = np.zeros(512)
    for t in range(n_blocks):
        v = np.roll(v, 64)
        v[:64] = _N_SYNTH @ sb[t]
        for i in range(8):
            u[i * 64:i * 64 + 32] = v[i * 128:i * 128 + 32]
            u[i * 64 + 32:i * 64 + 64] = v[i * 128 + 96:i * 128 + 128]
        w = u * d
        out[t * 32:(t + 1) * 32] = w.reshape(16, 32).sum(axis=0)
    return out


_C_WINDOW, _D_WINDOW = None, None


def _ensure_windows() -> None:
    global _C_WINDOW, _D_WINDOW
    if _C_WINDOW is None:
        _C_WINDOW, _D_WINDOW = _tdac_windows()


# ---------------------------------------------------------------- decode

def _decode_layer1_frame(br: _BitReader, channels: int) -> np.ndarray:
    """One Layer I frame → (12, 32, channels) requantized subband
    samples."""
    alloc = [[0] * 32 for _ in range(channels)]
    for sb in range(32):
        for ch in range(channels):
            a = br.read(4)
            alloc[ch][sb] = 0 if a == 0 else a + 1  # nb bits, 2..15
    scf = [[0] * 32 for _ in range(channels)]
    for sb in range(32):
        for ch in range(channels):
            if alloc[ch][sb]:
                scf[ch][sb] = br.read(6)
    out = np.zeros((12, 32, channels))
    for s in range(12):
        for sb in range(32):
            for ch in range(channels):
                nb = alloc[ch][sb]
                if nb:
                    q = br.read(nb)
                    levels = (1 << nb) - 1
                    out[s, sb, ch] = (
                        _requant(min(q, levels - 1), levels)
                        * SCALEFACTORS[scf[ch][sb]]
                    )
    return out


def _decode_layer2_frame(
    br: _BitReader, channels: int, table: tuple
) -> np.ndarray:
    """One Layer II frame → (36, 32, channels) requantized subband
    samples (12 granules × 3 samples)."""
    sblimit = len(table)
    alloc = [[0] * sblimit for _ in range(channels)]
    for sb in range(sblimit):
        bits, levels_tab = table[sb]
        for ch in range(channels):
            alloc[ch][sb] = levels_tab[br.read(bits)]
    scfsi = [[0] * sblimit for _ in range(channels)]
    for sb in range(sblimit):
        for ch in range(channels):
            if alloc[ch][sb]:
                scfsi[ch][sb] = br.read(2)
    scf = [[(0, 0, 0)] * sblimit for _ in range(channels)]
    for sb in range(sblimit):
        for ch in range(channels):
            if not alloc[ch][sb]:
                continue
            mode = scfsi[ch][sb]
            if mode == 0:
                s = (br.read(6), br.read(6), br.read(6))
            elif mode == 1:
                a, b = br.read(6), br.read(6)
                s = (a, a, b)
            elif mode == 2:
                a = br.read(6)
                s = (a, a, a)
            else:
                a, b = br.read(6), br.read(6)
                s = (a, b, b)
            scf[ch][sb] = s
    out = np.zeros((36, 32, channels))
    for gr in range(12):
        for sb in range(sblimit):
            for ch in range(channels):
                levels = alloc[ch][sb]
                if not levels:
                    continue
                bits, grouped = _L2_CLASSES[levels]
                part = gr // 4  # which scalefactor third
                factor = SCALEFACTORS[scf[ch][sb][part]]
                if grouped:
                    code = br.read(bits)
                    for k in range(3):
                        q = code % levels
                        code //= levels
                        out[gr * 3 + k, sb, ch] = (
                            _requant(q, levels) * factor
                        )
                else:
                    for k in range(3):
                        q = br.read(bits)
                        out[gr * 3 + k, sb, ch] = (
                            _requant(min(q, levels - 1), levels) * factor
                        )
    return out


def decode_mpeg_audio(data: bytes, max_frames: int | None = None) -> dict:
    """Decode an MPEG-1 Layer I/II stream to PCM.

    Returns {valid, layer, sample_rate, channels, n_samples, samples}
    with ``samples`` a float64 array (n_samples, channels) in [-1, 1].
    Layer III frames raise NotImplementedError (honest stub — Huffman
    spectral decode is out of scope); junk-prefixed streams resync with
    the mp3_codec consecutive-header rule; a truncated tail frame is
    ignored.
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
        return {"valid": False, "layer": 0, "sample_rate": 0,
                "channels": 0, "n_samples": 0,
                "samples": np.zeros((0, 1))}
    if first["layer"] == 3:
        raise NotImplementedError(
            "mpeg_audio: Layer III sample decode (Huffman + IMDCT + bit "
            "reservoir) is out of scope; Layers I/II decode here"
        )
    _ensure_windows()
    channels = first["channels"]
    per_ch_blocks: list[np.ndarray] = []
    n_frames = 0
    while off + 4 <= end:
        h = parse_frame_header(data, off)
        if h is None or off + h["frame_bytes"] > end:
            break
        if h["layer"] != first["layer"] or h["channels"] != channels:
            break  # layer/mode switch mid-stream: stop, don't guess
        protected = (data[off + 1] & 0x1) == 0
        body_bits = (off + 4 + (2 if protected else 0)) * 8
        br = _BitReader(
            data, body_bits, limit_bits=(off + h["frame_bytes"]) * 8
        )
        try:
            if h["layer"] == 1:
                sb = _decode_layer1_frame(br, channels)
            else:
                table = layer2_alloc_table(
                    h["sample_rate"], h["bitrate_kbps"], channels
                )
                sb = _decode_layer2_frame(br, channels, table)
        except _BitstreamError:
            break  # corrupt frame payload: bin the tail, keep the rest
        per_ch_blocks.append(sb)
        n_frames += 1
        off += h["frame_bytes"]
        if max_frames is not None and n_frames >= max_frames:
            break
    if not per_ch_blocks:
        return {"valid": False, "layer": first["layer"],
                "sample_rate": first["sample_rate"], "channels": channels,
                "n_samples": 0, "samples": np.zeros((0, channels))}
    blocks = np.concatenate(per_ch_blocks, axis=0)  # (B, 32, ch)
    pcm = np.stack(
        [synthesis_filterbank(blocks[:, :, ch]) for ch in range(channels)],
        axis=1,
    )
    return {
        "valid": True,
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "channels": channels,
        "n_frames": n_frames,
        "n_samples": pcm.shape[0],
        "samples": pcm,
    }


# ---------------------------------------------------------------- fixtures

def _frame_header_bytes(
    layer: int, bitrate_kbps: int, sample_rate: int, channels: int,
    padding: int = 0,
) -> bytes:
    from drugbankner_spark.functions.mp3_codec import _BITRATE_CODE

    sr_codes = {44100: 0, 48000: 1, 32000: 2}
    layer_code = 4 - layer
    b = _BITRATE_CODE[(0, layer - 1, bitrate_kbps)]
    hdr = (0x7FF << 21) | (3 << 19) | (layer_code << 17) | (1 << 16)
    hdr |= (b << 12) | (sr_codes[sample_rate] << 10) | (padding << 9)
    hdr |= (0 if channels == 2 else 3) << 6
    return hdr.to_bytes(4, "big")


def encode_layer1(
    pcm: np.ndarray, sample_rate: int = 44100, bitrate_kbps: int = 448,
    nb: int | None = None,
) -> bytes:
    """Fixture encoder: PCM (shape (n,) mono or (n, 2) stereo) → CBR
    Layer I stream (uniform ``nb``-bit allocation, per-subband
    scalefactors). ``nb=None`` picks the largest width the frame's bit
    budget can carry. Analysis filterbank is the matched pair of the
    decoder's synthesis, so decode(encode(x)) ≈ x up to quantization
    (round-trip SNR tested)."""
    _ensure_windows()
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    frame_samples = 384
    n_frames = x.shape[0] // frame_samples
    hdr = _frame_header_bytes(1, bitrate_kbps, sample_rate, channels)
    frame_bytes = (12 * bitrate_kbps * 1000 // sample_rate) * 4
    budget = (frame_bytes * 8 - 32
              - channels * 32 * 4 - channels * 32 * 6)
    nb_max = min(15, budget // (12 * 32 * channels))
    if nb is None:
        nb = nb_max
    if not 2 <= nb <= nb_max:
        raise ValueError(
            f"encode_layer1: nb={nb} exceeds the frame budget "
            f"(max {nb_max} at {bitrate_kbps} kbps, {channels}ch)"
        )
    levels = (1 << nb) - 1
    # analyze ONCE per channel over the whole signal (the filterbank
    # FIFO carries state across frame boundaries), slice blocks after
    sb_all = np.stack(
        [analysis_filterbank(x[: n_frames * frame_samples, ch])
         for ch in range(channels)], axis=2,
    )  # (blocks, 32, ch)
    out = bytearray()
    for f in range(n_frames):
        sb = sb_all[f * 12:(f + 1) * 12]  # (12, 32, ch)
        bw = _BitWriter()
        for _ in range(32 * channels):
            bw.write(nb - 1, 4)  # alloc code = nb-1 → nb bits
        scf_idx = [[0] * 32 for _ in range(channels)]
        for band in range(32):
            for ch in range(channels):
                peak = float(np.max(np.abs(sb[:, band, ch]))) or 1e-12
                idx = 0
                while idx < 62 and SCALEFACTORS[idx + 1] >= peak:
                    idx += 1
                scf_idx[ch][band] = idx
                bw.write(idx, 6)
        for s in range(12):
            for band in range(32):
                for ch in range(channels):
                    v = sb[s, band, ch] / SCALEFACTORS[scf_idx[ch][band]]
                    bw.write(_quant(v, levels), nb)
        body = bw.to_bytes()
        frame = hdr + body
        frame = frame.ljust(frame_bytes, b"\x00")[:frame_bytes]
        out += frame
    return bytes(out)


def encode_layer2(
    pcm: np.ndarray, sample_rate: int = 44100, bitrate_kbps: int = 384,
) -> bytes:
    """Fixture encoder: mono PCM → CBR Layer II stream exercising the
    FULL bitstream surface: the B.2a allocation table, per-subband
    allocation chosen from the table's own level lists (grouped 3/5/9
    classes included for quiet bands), scfsi modes, and base-n grouped
    sample codes."""
    _ensure_windows()
    x = np.asarray(pcm, dtype=np.float64)
    frame_samples = 1152
    n_frames = len(x) // frame_samples
    table = layer2_alloc_table(sample_rate, bitrate_kbps, 1)
    sblimit = len(table)
    hdr = _frame_header_bytes(2, bitrate_kbps, sample_rate, 1)
    frame_bytes = 144 * bitrate_kbps * 1000 // sample_rate
    # analyze ONCE (FIFO state crosses frame boundaries), slice after
    sb_all = analysis_filterbank(x[: n_frames * frame_samples])
    out = bytearray()
    for f in range(n_frames):
        sb = sb_all[f * 36:(f + 1) * 36]  # (36, 32)
        bw = _BitWriter()
        # allocation: loud bands want the table's largest class, quiet
        # bands a small grouped class, silent bands 0 — then a greedy
        # reduction loop walks the most expensive bands down until the
        # frame's bit budget holds (a real encoder's allocation shape)
        alloc_code = []
        for band in range(sblimit):
            _, levels_tab = table[band]
            peak = float(np.max(np.abs(sb[:, band])))
            if peak < 1e-9:
                alloc_code.append(0)
            elif peak < 1e-4:
                alloc_code.append(1)  # smallest class (3 or 5 levels)
            else:
                alloc_code.append(len(levels_tab) - 1)

        def sample_bits(code: int, band: int) -> int:
            if not code:
                return 0
            levels = table[band][1][code]
            bits, grouped = _L2_CLASSES[levels]
            return 12 * (bits if grouped else 3 * bits)

        fixed = 32 + sum(table[b][0] for b in range(sblimit))
        fixed += sum(2 + 18 for b in range(sblimit) if alloc_code[b])
        budget = frame_bytes * 8
        while fixed + sum(
            sample_bits(alloc_code[b], b) for b in range(sblimit)
        ) > budget:
            costly = max(
                (b for b in range(sblimit) if alloc_code[b] > 1),
                key=lambda b: sample_bits(alloc_code[b], b),
                default=None,
            )
            if costly is None:  # pragma: no cover - tiny bitrates
                raise ValueError("encode_layer2: budget too small")
            alloc_code[costly] -= 1
        for band in range(sblimit):
            bw.write(alloc_code[band], table[band][0])
        for band in range(sblimit):
            if alloc_code[band]:
                bw.write(0, 2)  # scfsi mode 0: three scalefactors
        scf_idx = []
        for band in range(sblimit):
            if not alloc_code[band]:
                scf_idx.append((0, 0, 0))
                continue
            idxs = []
            for part in range(3):
                seg_sb = sb[part * 12:(part + 1) * 12, band]
                peak = float(np.max(np.abs(seg_sb))) or 1e-12
                idx = 0
                while idx < 62 and SCALEFACTORS[idx + 1] >= peak:
                    idx += 1
                idxs.append(idx)
                bw.write(idx, 6)
            scf_idx.append(tuple(idxs))
        for gr in range(12):
            for band in range(sblimit):
                code = alloc_code[band]
                if not code:
                    continue
                levels = table[band][1][code]
                bits, grouped = _L2_CLASSES[levels]
                part = gr // 4
                factor = SCALEFACTORS[scf_idx[band][part]]
                qs = [
                    _quant(sb[gr * 3 + k, band] / factor, levels)
                    for k in range(3)
                ]
                if grouped:
                    bw.write(
                        qs[0] + levels * (qs[1] + levels * qs[2]), bits
                    )
                else:
                    for q in qs:
                        bw.write(q, bits)
        frame = (hdr + bw.to_bytes()).ljust(frame_bytes, b"\x00")
        out += frame[:frame_bytes]
    return bytes(out)
