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


def test_layer3_raises_honestly():
    data = mp3.encode_mp3(n_frames=3)  # layer III silence fixture
    with pytest.raises(NotImplementedError):
        MA.decode_mpeg_audio(data)


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
    for m in range(80):
        f = 200.0 + (m % 40) * 37.0
        t = np.arange(1152 * 2)
        x = 0.5 * np.sin(2 * np.pi * f * t / sr)
        enc = MA.encode_layer1 if m % 2 == 0 else MA.encode_layer2
        d = MA.decode_mpeg_audio(enc(x))
        mono = d["samples"][:, 0]
        rows.append((m, d["layer"], d["sample_rate"], d["n_samples"],
                     round(float(np.sqrt(np.mean(mono ** 2))), 6)))
    want = ",\n                ".join(
        f"({m}, {lay}, {srr}, {ns}, {rms!r})"
        for m, lay, srr, ns, rms in rows
    )
    assert entrymod._MPEG_DECODE_FIXTURE == want
