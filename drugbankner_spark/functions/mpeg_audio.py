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


# ------------------------------------------------------------- Layer III
#
# VERDICT r06 next #8. Everything ANALYTIC in ISO 11172-3's Layer III
# chain is implemented for real below: side-info bitstream parsing, the
# scalefactor decoder (slen table, scfsi sharing, long/short/mixed
# layouts), the bit reservoir (main_data_begin back-references), the
# requantizer (global_gain / subblock_gain / scalefac_scale / pretab),
# alias reduction (the 8 published butterfly coefficients), the 36/12-
# point IMDCT with all four block-type windows + overlap-add +
# frequency inversion, feeding the SAME exact-PR polyphase synthesis
# filterbank Layers I/II use. The documented scope cut — the one block
# that cannot be reproduced here — is the spectral HUFFMAN CODE TABLES
# (ISO 11172-3 Annex B, Table B.7: 34 big-value tables plus the two
# count1 quadruple tables, thousands of arbitrary codeword constants).
# They are pure lookup data with no generating formula; transcribing
# them from memory risks silently corrupt audio, and this environment
# has no network access to the spec. Consequently: frames whose
# granules carry ZERO spectral bits (part2_3_length == the scalefactor
# part2 length — the standard encoding of digital silence) decode END
# TO END through the real chain; a granule with spectral bits raises
# NotImplementedError naming exactly the missing tables.

#: scalefac_compress → (slen1, slen2) (ISO 11172-3 §2.4.2.7).
_L3_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2),
            (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
            (4, 2), (4, 3)]

#: preflag pretab (one entry per long scalefactor band).
_L3_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
              1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]

#: alias-reduction butterfly coefficients ci (ISO 11172-3 §2.4.3.4.10.1).
_L3_CI = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)

#: scfsi band → long scalefactor-band range (granule-1 sharing groups).
_L3_SCFSI_BANDS = ((0, 6), (6, 11), (11, 16), (16, 21))


def _parse_layer3_side_info(br: _BitReader, channels: int) -> dict:
    """MPEG-1 Layer III side info (17 bytes mono / 32 stereo):
    {main_data_begin, scfsi[ch][4], granules[2][ch]{...}}.

    Region counts under window switching follow the deployed-decoder
    convention (region0 = 8 for pure short blocks else 7, region1 =
    "the rest") — they partition the big-values Huffman regions, so
    they only matter once the spectral tables exist."""
    si = {"main_data_begin": br.read(9)}
    br.read(5 if channels == 1 else 3)  # private_bits
    si["scfsi"] = [[br.read(1) for _ in range(4)] for _ in range(channels)]
    granules: list[list[dict]] = []
    for _gr in range(2):
        chs = []
        for _ch in range(channels):
            g = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
                "window_switching": br.read(1),
            }
            if g["window_switching"]:
                g["block_type"] = br.read(2)
                g["mixed_block_flag"] = br.read(1)
                g["table_select"] = [br.read(5) for _ in range(2)]
                g["subblock_gain"] = [br.read(3) for _ in range(3)]
                g["region0_count"] = (
                    8 if (g["block_type"] == 2
                          and not g["mixed_block_flag"]) else 7
                )
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block_flag"] = 0
                g["table_select"] = [br.read(5) for _ in range(3)]
                g["region0_count"] = br.read(4)
                g["region1_count"] = br.read(3)
                g["subblock_gain"] = [0, 0, 0]
            g["preflag"] = br.read(1)
            g["scalefac_scale"] = br.read(1)
            g["count1table_select"] = br.read(1)
            chs.append(g)
        granules.append(chs)
    si["granules"] = granules
    return si


def _l3_part2_length(g: dict) -> int:
    """Scalefactor bit count for one granule/channel."""
    s1, s2 = _L3_SLEN[g["scalefac_compress"]]
    if g["window_switching"] and g["block_type"] == 2:
        if g["mixed_block_flag"]:
            return 17 * s1 + 18 * s2
        return 18 * s1 + 18 * s2
    return 11 * s1 + 10 * s2


def _read_layer3_scalefacs(
    br: _BitReader, g: dict, gr_index: int,
    scfsi_ch: list[int], gr0_scf: dict | None,
) -> dict:
    """{'long': [21 ints], 'short': [12 × [3 ints]]} for one
    granule/channel. Granule 1 long bands inside a set scfsi group are
    COPIED from granule 0 and consume no bits (ISO §2.4.2.7 scfsi);
    sharing never applies to short/mixed granules."""
    s1, s2 = _L3_SLEN[g["scalefac_compress"]]
    long_sf = [0] * 21
    short_sf = [[0, 0, 0] for _ in range(12)]
    if g["window_switching"] and g["block_type"] == 2:
        if g["mixed_block_flag"]:
            for sfb in range(8):
                long_sf[sfb] = br.read(s1)
            for sfb in range(3, 6):
                for win in range(3):
                    short_sf[sfb][win] = br.read(s1)
            for sfb in range(6, 12):
                for win in range(3):
                    short_sf[sfb][win] = br.read(s2)
        else:
            for sfb in range(6):
                for win in range(3):
                    short_sf[sfb][win] = br.read(s1)
            for sfb in range(6, 12):
                for win in range(3):
                    short_sf[sfb][win] = br.read(s2)
        return {"long": long_sf, "short": short_sf}
    for band, (lo, hi) in enumerate(_L3_SCFSI_BANDS):
        share = (gr_index == 1 and scfsi_ch[band] == 1
                 and gr0_scf is not None)
        for sfb in range(lo, hi):
            slen = s1 if sfb < 11 else s2
            if share:
                long_sf[sfb] = gr0_scf["long"][sfb]
            else:
                long_sf[sfb] = br.read(slen)
    return {"long": long_sf, "short": short_sf}


def _l3_long_window() -> np.ndarray:
    i = np.arange(36)
    return np.sin(np.pi / 36.0 * (i + 0.5))


def _l3_short_window() -> np.ndarray:
    i = np.arange(12)
    return np.sin(np.pi / 12.0 * (i + 0.5))


def _l3_window(block_type: int) -> np.ndarray:
    """The four Layer III synthesis windows (ISO §2.4.3.4.10.3)."""
    w = np.zeros(36)
    i = np.arange(36)
    if block_type == 0:                      # normal
        return _l3_long_window()
    if block_type == 1:                      # start
        w[:18] = np.sin(np.pi / 36.0 * (i[:18] + 0.5))
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12.0 * (np.arange(6) + 6 + 0.5))
        return w
    if block_type == 3:                      # stop
        w[6:12] = np.sin(np.pi / 12.0 * (np.arange(6) + 0.5))
        w[12:18] = 1.0
        w[18:] = np.sin(np.pi / 36.0 * (i[18:] + 0.5))
        return w
    raise ValueError("block_type 2 uses the 12-point short window")


def _imdct(X: np.ndarray) -> np.ndarray:
    """n/2-point → n-point IMDCT:
    x[i] = Σ_k X[k] cos(π/(2n) (2i+1+n/2)(2k+1))."""
    half = len(X)
    n = 2 * half
    i = np.arange(n)[:, None]
    k = np.arange(half)[None, :]
    return (X[None, :] * np.cos(
        np.pi / (2.0 * n) * (2 * i + 1 + half) * (2 * k + 1)
    )).sum(axis=1)


def _mdct(x: np.ndarray) -> np.ndarray:
    """Forward twin of :func:`_imdct` (test/fixture side):
    X[k] = Σ_i x[i] cos(π/(2n) (2i+1+n/2)(2k+1))."""
    n = len(x)
    half = n // 2
    i = np.arange(n)[:, None]
    k = np.arange(half)[None, :]
    return (x[:, None] * np.cos(
        np.pi / (2.0 * n) * (2 * i + 1 + half) * (2 * k + 1)
    )).sum(axis=0)


def _l3_imdct_block(xr18: np.ndarray, block_type: int) -> np.ndarray:
    """One subband's 18 spectral lines → 36 windowed time samples.
    Short blocks run three 12-point IMDCTs, each short-windowed,
    overlapped at 6-sample offsets into the 36-slot frame
    (ISO §2.4.3.4.10.2/.3)."""
    if block_type == 2:
        out = np.zeros(36)
        sw = _l3_short_window()
        for win in range(3):
            y = _imdct(xr18[win::3]) * sw
            out[6 + 6 * win: 18 + 6 * win] += y
        return out
    return _imdct(xr18) * _l3_window(block_type)


def _l3_alias_reduce(xr: np.ndarray) -> np.ndarray:
    """Butterflies across each adjacent-subband boundary (long blocks
    only): 8 cs/ca pairs from the published ci list."""
    ci = np.asarray(_L3_CI)
    cs = 1.0 / np.sqrt(1.0 + ci * ci)
    ca = ci / np.sqrt(1.0 + ci * ci)
    out = xr.copy()
    for sb in range(1, 32):
        for j in range(8):
            lo = sb * 18 - 1 - j
            hi = sb * 18 + j
            a, b = out[lo], out[hi]
            out[lo] = a * cs[j] - b * ca[j]
            out[hi] = b * cs[j] + a * ca[j]
    return out


def _l3_requantize_long(
    is_vals: np.ndarray, g: dict, long_sf: list[int], sfb_of: np.ndarray
) -> np.ndarray:
    """xr[i] = sign·|is|^(4/3) · 2^((global_gain−210)/4)
    · 2^(−(scalefac_scale+1)/2 · (scalefac + preflag·pretab))."""
    gain = 2.0 ** ((g["global_gain"] - 210) / 4.0)
    mult = 0.5 * (g["scalefac_scale"] + 1)
    sf = np.array([
        long_sf[b] + g["preflag"] * _L3_PRETAB[b] for b in sfb_of
    ])
    mag = np.abs(is_vals).astype(float) ** (4.0 / 3.0)
    return np.sign(is_vals) * mag * gain * 2.0 ** (-mult * sf)


def layer3_stream_info(data: bytes, max_frames: int | None = None) -> list[dict]:
    """Parse a Layer III stream's side info + scalefactors per frame:
    [{offset, main_data_begin, granules: [[{side info…, scalefacs,
    spectral_bits}]]}]. Maintains the bit reservoir, so a granule whose
    part2 lives in a PREVIOUS frame's main data reads the right bytes
    (main_data_begin back-reference). Frames whose reservoir reach
    exceeds what has been buffered are skipped (a seek/cut artifact),
    matching deployed-decoder behavior."""
    from drugbankner_spark.functions.mp3_codec import (
        has_id3v1,
        id3v2_size,
        parse_frame_header,
    )

    start = id3v2_size(data)
    end = len(data) - 128 if has_id3v1(data) else len(data)
    off = start
    out: list[dict] = []
    reservoir = b""
    while off + 4 <= end:
        h = parse_frame_header(data, off)
        if h is None or h["layer"] != 3 or off + h["frame_bytes"] > end:
            if out:
                break
            off += 1
            continue
        channels = h["channels"]
        protected = (data[off + 1] & 0x1) == 0
        si_start = off + 4 + (2 if protected else 0)
        si_bytes = (17 if channels == 1 else 32)
        br = _BitReader(data, si_start * 8,
                        limit_bits=(si_start + si_bytes) * 8)
        try:
            si = _parse_layer3_side_info(br, channels)
        except _BitstreamError:
            break
        main = data[si_start + si_bytes: off + h["frame_bytes"]]
        begin = si["main_data_begin"]
        frame_entry = None
        if begin <= len(reservoir):
            buf = (reservoir[len(reservoir) - begin:] if begin else b"") \
                + main
            mbr = _BitReader(buf, 0)
            granules = []
            try:
                for gr in range(2):
                    chs = []
                    for ch in range(channels):
                        g = dict(si["granules"][gr][ch])
                        p23_start = mbr.pos
                        gr0 = granules[0][ch]["scalefacs"] if gr else None
                        g["scalefacs"] = _read_layer3_scalefacs(
                            mbr, g, gr, si["scfsi"][ch], gr0
                        )
                        part2 = mbr.pos - p23_start
                        g["spectral_bits"] = g["part2_3_length"] - part2
                        # spectral region: skip without decoding (the
                        # Huffman tables are the documented cut)
                        if g["spectral_bits"] > 0:
                            mbr.read(g["spectral_bits"])
                        chs.append(g)
                    granules.append(chs)
                frame_entry = {
                    "offset": off,
                    "channels": channels,
                    "sample_rate": h["sample_rate"],
                    "main_data_begin": begin,
                    "granules": granules,
                }
            except _BitstreamError:
                frame_entry = None
        if frame_entry is not None:
            out.append(frame_entry)
        reservoir = (reservoir + main)[-2048:]
        off += h["frame_bytes"]
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


def _decode_layer3_stream(
    data: bytes, start: int, end: int, first: dict,
    max_frames: int | None,
) -> tuple[list[np.ndarray], int]:
    """Layer III decode loop: per frame, reservoir-resolved side info +
    scalefactors through :func:`layer3_stream_info`'s logic, then the
    real requantize → alias-reduce → IMDCT/overlap-add → frequency-
    inversion chain per granule. Granules carrying spectral Huffman
    bits raise NotImplementedError (see the section comment); silence
    granules (zero spectral bits) flow through every stage."""
    channels = first["channels"]
    frames = layer3_stream_info(data[start:end], max_frames)
    overlap = np.zeros((channels, 32, 18))
    blocks: list[np.ndarray] = []
    n_frames = 0
    for fr in frames:
        if fr["channels"] != channels:
            break
        for gr_chs in fr["granules"]:
            sb_out = np.zeros((18, 32, channels))
            for ch, g in enumerate(gr_chs):
                if g["spectral_bits"] > 0:
                    raise NotImplementedError(
                        "mpeg_audio: Layer III spectral decode needs the "
                        "ISO 11172-3 Annex B Huffman code tables (34 "
                        "big-value + 2 count1 tables of arbitrary "
                        "codeword constants) — transcribing them from "
                        "memory risks silent corruption and the spec is "
                        "unreachable here; side info, scalefactors, bit "
                        "reservoir, requantizer, alias reduction, IMDCT "
                        "and synthesis are real (silence frames decode "
                        "end to end)"
                    )
                # zero spectrum through the real chain
                xr = np.zeros(576)
                sfb_of = np.zeros(576, dtype=int)
                xr = _l3_requantize_long(
                    xr, g, g["scalefacs"]["long"], sfb_of
                )
                if g["block_type"] != 2:
                    xr = _l3_alias_reduce(xr)
                for sb in range(32):
                    y = _l3_imdct_block(
                        xr[sb * 18:(sb + 1) * 18], g["block_type"]
                    )
                    out18 = y[:18] + overlap[ch, sb]
                    overlap[ch, sb] = y[18:]
                    if sb % 2 == 1:          # frequency inversion
                        out18[1::2] = -out18[1::2]
                    sb_out[:, sb, ch] = out18
            blocks.append(sb_out)
        n_frames += 1
    return blocks, n_frames


def encode_layer3_silence(
    n_frames: int = 2,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    channels: int = 1,
    scalefac_compress: int = 0,
    reservoir_backref: int = 0,
    planted_scalefac_bits: int = 0,
) -> bytes:
    """Fixture encoder for Layer III SILENCE: every granule carries
    exactly its scalefactor bits (part2_3_length == part2 length) and
    zero spectral bits — the standard encoding of digital silence, and
    the case the in-engine decoder handles end to end.

    ``reservoir_backref`` > 0 exercises the bit reservoir: each frame
    after the first sets main_data_begin to that byte count and its
    main data (the scalefactor bits) is written into the PREVIOUS
    frame's free space; ``planted_scalefac_bits`` fills the scalefactor
    fields with a known pattern so tests can verify the back-reference
    read the right bytes."""
    from drugbankner_spark.functions.mp3_codec import parse_frame_header

    hdr = _frame_header_bytes(3, bitrate_kbps, sample_rate, channels)
    frame_bytes = parse_frame_header(hdr)["frame_bytes"]
    si_bytes = 17 if channels == 1 else 32

    def side_info(main_data_begin: int, part2: int) -> bytes:
        w = _BitWriter()
        w.write(main_data_begin, 9)
        w.write(0, 5 if channels == 1 else 3)        # private
        for _ch in range(channels):
            w.write(0, 4)                             # scfsi
        for _gr in range(2):
            for _ch in range(channels):
                w.write(part2, 12)                    # part2_3_length
                w.write(0, 9)                         # big_values
                w.write(210, 8)                       # global_gain
                w.write(scalefac_compress, 4)
                w.write(0, 1)                         # window_switching
                w.write(0, 15)                        # table_select ×3
                w.write(0, 4)                         # region0
                w.write(0, 3)                         # region1
                w.write(0, 1)                         # preflag
                w.write(0, 1)                         # scalefac_scale
                w.write(0, 1)                         # count1table_select
        return w.to_bytes()

    s1, s2 = _L3_SLEN[scalefac_compress]
    part2 = 11 * s1 + 10 * s2
    main_bits_per_frame = part2 * 2 * channels

    def main_data() -> bytes:
        w = _BitWriter()
        for _ in range(2 * channels):
            for sfb in range(21):
                slen = s1 if sfb < 11 else s2
                if slen:
                    w.write(
                        planted_scalefac_bits & ((1 << slen) - 1), slen
                    )
        return w.to_bytes()

    md = main_data()
    frames = bytearray()
    for i in range(n_frames):
        body = bytearray(hdr)
        begin = reservoir_backref if (reservoir_backref and i > 0) else 0
        body += side_info(begin, part2)
        if begin == 0:
            body += md
        body += b"\x00" * (frame_bytes - len(body))
        if reservoir_backref and i + 1 < n_frames and main_bits_per_frame:
            # write the NEXT frame's main data into this frame's tail
            body[-reservoir_backref:] = (
                md + b"\x00" * (reservoir_backref - len(md))
            )[:reservoir_backref]
        assert len(body) == frame_bytes
        frames += body
    return bytes(frames)


def decode_mpeg_audio(data: bytes, max_frames: int | None = None) -> dict:
    """Decode an MPEG-1 Layer I/II stream to PCM.

    Returns {valid, layer, sample_rate, channels, n_samples, samples}
    with ``samples`` a float64 array (n_samples, channels) in [-1, 1].
    Layer III decodes through the real side-info/scalefactor/reservoir/
    IMDCT/synthesis chain for granules with no spectral Huffman bits
    (silence); granules carrying spectral data raise
    NotImplementedError naming the missing Annex B code tables (the
    documented cut — see the Layer III section comment). Junk-prefixed
    streams resync with the mp3_codec consecutive-header rule; a
    truncated tail frame is ignored.
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
    _ensure_windows()
    channels = first["channels"]
    if first["layer"] == 3:
        l3_blocks, l3_frames = _decode_layer3_stream(
            data, off, end, first, max_frames
        )
        if not l3_blocks:
            return {"valid": False, "layer": 3,
                    "sample_rate": first["sample_rate"],
                    "channels": channels, "n_samples": 0,
                    "samples": np.zeros((0, channels))}
        l3 = np.concatenate(l3_blocks, axis=0)  # (B, 32, ch)
        pcm = np.stack(
            [synthesis_filterbank(l3[:, :, ch]) for ch in range(channels)],
            axis=1,
        )
        return {
            "valid": True, "layer": 3,
            "sample_rate": first["sample_rate"], "channels": channels,
            "n_frames": l3_frames, "n_samples": pcm.shape[0],
            "samples": pcm,
        }
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
