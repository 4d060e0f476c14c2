"""MPEG-1 Layer I/II sample decoder (round 6): filterbank perfect
reconstruction, encode→decode round-trips, bitstream tolerance, and
the Spark wiring through decode_media / audio_features."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drugbankner_spark.functions import mp3_codec as mp3  # noqa: E402
from drugbankner_spark.functions import mpeg_audio as MA  # noqa: E402

SR = 44100


def _tone(n, freqs=(440, 2000), amps=(0.6, 0.25)):
    t = np.arange(n)
    return sum(a * np.sin(2 * np.pi * f * t / SR)
               for f, a in zip(freqs, amps))


def _snr_db(data: bytes, x: np.ndarray, ch: int = 0) -> float:
    d = MA.decode_mpeg_audio(data)
    assert d["valid"]
    y = d["samples"][:, ch]
    m = min(len(x), len(y) - 33) - 2048
    a, b = x[2048:m], y[2048 + 33:m + 33]
    mse = float(np.mean((a - b) ** 2))
    return 10 * math.log10(float(np.mean(a ** 2)) / mse)


def test_filterbank_perfect_reconstruction():
    # the TDAC sine prototype reconstructs EXACTLY (float precision)
    # through the unchanged spec synthesis structure, 33-sample latency
    MA._ensure_windows()
    x = _tone(12000) + 0.05 * np.cos(2 * np.pi * 11000 * np.arange(12000) / SR)
    y = MA.synthesis_filterbank(MA.analysis_filterbank(x))
    m = len(x) - 2048
    err = float(np.max(np.abs(x[2048:m] - y[2048 + 33:m + 33])))
    assert err < 1e-10


def test_layer1_roundtrip_tone():
    x = _tone(SR // 4)
    data = MA.encode_layer1(x)
    assert mp3.is_mp3(data)
    info = mp3.mp3_info(data)
    assert info["layer"] == 1 and info["sample_rate"] == SR
    assert _snr_db(data, x) > 50


def test_layer2_roundtrip_tone():
    x = _tone(SR // 4)
    data = MA.encode_layer2(x)
    assert mp3.mp3_info(data)["layer"] == 2
    assert _snr_db(data, x) > 50


def test_layer1_roundtrip_noise():
    rng = np.random.RandomState(7)
    x = rng.uniform(-0.5, 0.5, SR // 4)
    assert _snr_db(MA.encode_layer1(x), x) > 45


def test_layer2_roundtrip_bandlimited_noise():
    # full-band noise caps at ~8 dB BY SPEC (subbands >= sblimit are
    # not transmitted); band-limit below the cutoff to measure the
    # codec itself
    MA._ensure_windows()
    rng = np.random.RandomState(11)
    raw = rng.uniform(-0.5, 0.5, SR // 4 + 64)
    sb = MA.analysis_filterbank(raw)
    sb[:, 27:] = 0.0
    x = MA.synthesis_filterbank(sb)[33:33 + SR // 4]
    assert _snr_db(MA.encode_layer2(x), x) > 20


def test_layer1_stereo_roundtrip():
    x = _tone(SR // 8)
    xs = np.stack([x, np.roll(x, 100)], axis=1)
    data = MA.encode_layer1(xs)
    d = MA.decode_mpeg_audio(data)
    assert d["channels"] == 2
    # stereo halves the per-channel bit budget → lower but real SNR
    assert _snr_db(data, xs[:, 0], 0) > 20
    assert _snr_db(data, xs[:, 1], 1) > 20


def test_layer2_exercises_grouped_classes():
    # a quiet band forces the small grouped classes (3/5 levels,
    # base-n codes) — craft a signal with one loud and one barely
    # audible component
    t = np.arange(SR // 4)
    x = 0.6 * np.sin(2 * np.pi * 300 * t / SR) \
        + 5e-5 * np.sin(2 * np.pi * 6000 * t / SR)
    data = MA.encode_layer2(x)
    # decode works and the loud band round-trips
    assert _snr_db(data, x) > 30


def test_decode_tolerates_corrupt_tail_and_junk_prefix():
    x = _tone(SR // 8)
    data = MA.encode_layer1(x)
    # junk prefix with a fake lone sync: resync must skip it
    j = bytes(10) + b"\xff\xfb\x90\x00" + bytes(46) + data
    d = MA.decode_mpeg_audio(j)
    assert d["valid"] and d["n_frames"] == mp3.mp3_info(data)["n_frames"]
    # truncated tail frame: decoded frames drop by one, no raise
    d2 = MA.decode_mpeg_audio(data[:-50])
    assert d2["valid"] and d2["n_frames"] == d["n_frames"] - 1


def test_layer3_silence_decodes_end_to_end():
    # round 7 (VERDICT r06 next #8): silence frames — zero spectral
    # bits — run the REAL side-info/scalefactor/IMDCT/synthesis chain.
    data = MA.encode_layer3_silence(n_frames=3)
    d = MA.decode_mpeg_audio(data)
    assert d["valid"] and d["layer"] == 3 and d["n_frames"] == 3
    assert d["n_samples"] == 3 * 1152
    assert float(abs(d["samples"]).max()) == 0.0
    # the legacy all-zero-payload frame-walk fixture is also silence
    d2 = MA.decode_mpeg_audio(mp3.encode_mp3(n_frames=2))
    assert d2["valid"] and d2["layer"] == 3 and d2["n_samples"] == 2 * 1152


def test_layer3_spectral_bits_raise_naming_the_cut():
    # A granule carrying spectral Huffman bits names the missing
    # Annex B code tables — the documented scope cut.
    from drugbankner_spark.functions.mpeg_audio import (
        _BitWriter,
        _frame_header_bytes,
    )
    from drugbankner_spark.functions.mp3_codec import parse_frame_header

    hdr = _frame_header_bytes(3, 128, 44100, 1)
    frame_bytes = parse_frame_header(hdr)["frame_bytes"]
    w = _BitWriter()
    w.write(0, 9)         # main_data_begin
    w.write(0, 5)         # private
    w.write(0, 4)         # scfsi
    for _ in range(2):
        w.write(10, 12)   # part2_3_length: 10 SPECTRAL bits (part2=0)
        w.write(0, 9); w.write(210, 8); w.write(0, 4); w.write(0, 1)
        w.write(0, 15); w.write(0, 4); w.write(0, 3)
        w.write(0, 1); w.write(0, 1); w.write(0, 1)
    body = hdr + w.to_bytes()
    frame = body + b"\x00" * (frame_bytes - len(body))
    with pytest.raises(NotImplementedError, match="Annex B Huffman"):
        MA.decode_mpeg_audio(frame * 2)


def test_layer3_side_info_and_scalefactors_bit_exact():
    # slen table: scalefac_compress=11 -> (3, 1); planted pattern 0b101
    # reads back 5 on slen1 bands (0-10) and 1 on slen2 bands (11-20).
    data = MA.encode_layer3_silence(
        n_frames=2, scalefac_compress=11, planted_scalefac_bits=0b101
    )
    info = MA.layer3_stream_info(data)
    assert len(info) == 2
    g = info[0]["granules"][0][0]
    assert g["global_gain"] == 210 and g["big_values"] == 0
    assert g["spectral_bits"] == 0
    assert g["scalefacs"]["long"][:11] == [5] * 11
    assert g["scalefacs"]["long"][11:21] == [1] * 10
    assert g["part2_3_length"] == 11 * 3 + 10 * 1


def test_layer3_bit_reservoir_backreference():
    # Frame 1's scalefactor bits live in frame 0's free space
    # (main_data_begin=32): the reservoir must hand back the planted
    # pattern, not this frame's own bytes (which are zeros).
    data = MA.encode_layer3_silence(
        n_frames=3, scalefac_compress=11, planted_scalefac_bits=0b111,
        reservoir_backref=32,
    )
    info = MA.layer3_stream_info(data)
    assert len(info) == 3
    assert info[1]["main_data_begin"] == 32
    assert info[1]["granules"][0][0]["scalefacs"]["long"][0] == 7
    # a stream CUT mid-reservoir (first frame missing) skips the frame
    # whose back-reference now dangles instead of mis-decoding
    h = MA.layer3_stream_info(data)[1]["offset"]
    cut = data[417:]                      # drop frame 0 (417 bytes CBR)
    info_cut = MA.layer3_stream_info(cut)
    assert all(f["main_data_begin"] == 0 or f["offset"] > 0
               for f in info_cut)
    assert len(info_cut) == 1             # only the begin=0 head frame
    assert h >= 0


def test_layer3_tdac_perfect_reconstruction():
    # The 36-point MDCT/IMDCT pair with the type-0 sine window is a
    # Princen-Bradley TDAC: 18-hop overlap-add reconstructs the input
    # exactly up to the standard N/4 factor.
    import numpy as np

    rng = np.random.default_rng(42)
    x = rng.standard_normal(18 * 8)
    w = MA._l3_long_window()
    recon = np.zeros(len(x))
    prev_tail = np.zeros(18)
    for b in range(len(x) // 18 - 1):
        y = MA._imdct(MA._mdct(x[b * 18: b * 18 + 36] * w)) * w
        recon[b * 18:(b + 1) * 18] = prev_tail + y[:18]
        prev_tail = y[18:]
    want = (36 / 4.0) * x[18: 18 * 6]
    assert np.abs(recon[18: 18 * 6] - want).max() < 1e-9


def test_layer3_windows_and_alias_coefficients():
    import numpy as np

    # start/stop windows splice the long and short shapes with a flat
    # top; short window is the 12-point sine
    w1, w3 = MA._l3_window(1), MA._l3_window(3)
    assert np.allclose(w1[18:24], 1.0) and np.allclose(w3[12:18], 1.0)
    assert np.allclose(w1[:18], MA._l3_long_window()[:18])
    assert np.allclose(w3[18:], MA._l3_long_window()[18:])
    assert np.allclose(w1[30:], 0.0) and np.allclose(w3[:6], 0.0)
    # alias reduction is ENERGY-PRESERVING (each butterfly is a
    # rotation: cs^2 + ca^2 = 1)
    rng = np.random.default_rng(7)
    xr = rng.standard_normal(576)
    out = MA._l3_alias_reduce(xr)
    assert abs((out ** 2).sum() - (xr ** 2).sum()) < 1e-9
    assert not np.allclose(out, xr)
    # short-block IMDCT: three 12-point windows overlap into 36 slots,
    # first and last 6 stay zero
    y = MA._l3_imdct_block(rng.standard_normal(18), 2)
    assert y.shape == (36,)
    assert np.allclose(y[:6], 0.0) and np.allclose(y[30:], 0.0)


def test_layer3_requantizer_formula():
    import numpy as np

    g = {"global_gain": 214, "scalefac_scale": 0, "preflag": 1}
    is_vals = np.array([8, -8, 0])
    # band 0: pretab 0, scalefac 2 -> 2^(-0.5*2)=1/2; gain 2^1=2
    sfb_of = np.array([0, 0, 0])
    xr = MA._l3_requantize_long(is_vals, g, [2] + [0] * 20, sfb_of)
    want = 8.0 ** (4.0 / 3.0) * 2.0 * 0.5
    assert np.allclose(xr, [want, -want, 0.0])
    # pretab band 17 adds 3 under preflag: factor 2^(-0.5*3)
    xr2 = MA._l3_requantize_long(
        np.array([1]), g, [0] * 21, np.array([17])
    )
    assert np.allclose(xr2, [2.0 * 2.0 ** (-1.5)])


def test_bitreader_bounds():
    br = MA._BitReader(b"\xff", 0, limit_bits=8)
    assert br.read(8) == 0xFF
    with pytest.raises(MA._BitstreamError):
        br.read(1)


def test_requant_quant_inverse():
    for levels in (3, 5, 7, 9, 15, 255, 65535):
        for q in (0, 1, levels // 2, levels - 1):
            v = MA._requant(q, levels)
            assert -1.0 < v < 1.0
            assert MA._quant(v, levels) == q


def test_nonaudio_invalid():
    d = MA.decode_mpeg_audio(bytes(64))
    assert not d["valid"] and d["n_samples"] == 0


def test_alloc_table_selection():
    assert len(MA.layer2_alloc_table(48000, 384, 1)) == 27
    assert len(MA.layer2_alloc_table(44100, 128, 2)) == 30  # 64/ch
    assert len(MA.layer2_alloc_table(48000, 48, 1)) == 8
    assert len(MA.layer2_alloc_table(32000, 32, 1)) == 12


def test_decode_media_and_audio_features_mpeg(spark):
    from pyspark.sql import functions as F

    from drugbankner_spark.operators.multimodal import (
        audio_features,
        decode_media,
    )

    tone880 = 0.5 * np.sin(2 * np.pi * 880 * np.arange(SR // 8) / SR)
    payloads = [
        (1, bytearray(MA.encode_layer1(tone880))),
        (2, bytearray(MA.encode_layer2(tone880))),
    ]
    media = spark.createDataFrame(
        payloads, "media_id long, payload binary"
    ).withColumn("mime_type", F.lit("audio/mpeg")).withColumn(
        "n_bytes", F.octet_length("payload")
    )
    feats = {r["media_id"]: r["feature"]
             for r in decode_media(media).collect()}
    assert feats[1][2] == 1.0 and feats[2][2] == 2.0  # layer
    assert feats[1][1] == float(SR)
    assert feats[1][4] > 0.2  # rms of a 0.5-amp tone ≈ 0.35
    au = {r["media_id"]: r for r in audio_features(media).collect()}
    for mid in (1, 2):
        # dominant bin within one FFT bin of 880 Hz (resolution ~86 Hz)
        assert abs(au[mid]["dominant_hz"] - 880) < 90, au[mid]
        assert au[mid]["sample_rate"] == SR


def test_driver_fixture_is_current():
    # The frozen _MPEG_DECODE_FIXTURE in __spark_entry__ must equal
    # what the real encoder+decoder produce today — codec drift fails
    # here before it fails the driver hash check.
    import numpy as np

    import __spark_entry__ as entrymod
    from drugbankner_spark.functions import mpeg_audio as MA

    sr = 44100
    rows = []
    for m in range(120):
        f = 200.0 + (m % 40) * 37.0
        t = np.arange(1152 * 2)
        x = 0.5 * np.sin(2 * np.pi * f * t / sr)
        sel = m % 3
        if sel == 2:
            stream = MA.encode_layer3_silence(n_frames=2)
        else:
            stream = (MA.encode_layer1 if sel == 0
                      else MA.encode_layer2)(x)
        d = MA.decode_mpeg_audio(stream)
        mono = d["samples"][:, 0]
        rows.append((m, d["layer"], d["sample_rate"], d["n_samples"],
                     round(float(np.sqrt(np.mean(mono ** 2))), 6)))
    want = ",\n                ".join(
        f"({m}, {lay}, {srr}, {ns}, {rms!r})"
        for m, lay, srr, ns, rms in rows
    )
    assert entrymod._MPEG_DECODE_FIXTURE == want
