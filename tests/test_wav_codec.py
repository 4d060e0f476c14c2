"""Tests for the pure-stdlib WAV codec (functions/wav_codec.py) and its
wiring as the REAL audio decode / frame-sample path of
operators/multimodal.py. Fixtures are hand-assembled RIFF bytes with
hand-computed expected statistics — independent of our encoder where it
matters (8-bit and float32 decode paths never touch encode_wav)."""

from __future__ import annotations

import math
import struct

import pytest

from drugbankner_spark.functions import wav_codec as wav


def _riff(fmt_payload: bytes, data_payload: bytes) -> bytes:
    riff_len = 4 + 8 + len(fmt_payload) + 8 + len(data_payload)
    return (
        b"RIFF" + struct.pack("<I", riff_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
        + b"data" + struct.pack("<I", len(data_payload)) + data_payload
    )


def _fmt(audio_format, channels, rate, bits) -> bytes:
    block = channels * max(bits // 8, 1)
    return struct.pack(
        "<HHIIHH", audio_format, channels, rate, rate * block, block, bits
    )


def test_decode_8bit_unsigned_hand_computed():
    # samples 128, 255, 0, 128 → normalized 0, 127/128, -1, 0
    data = _riff(_fmt(1, 1, 8000, 8), bytes([128, 255, 0, 128]))
    out = wav.decode_wav(data)
    assert (out["channels"], out["sample_rate"], out["bits"]) == (1, 8000, 8)
    assert out["n_frames"] == 4
    assert out["peak"] == 1.0
    want_rms = math.sqrt(((127 / 128) ** 2 + 1.0) / 4)
    assert abs(out["rms"] - want_rms) < 1e-12


def test_decode_16bit_stereo_duration():
    # 2 channels × 4 frames at 4 Hz → 1 second
    body = struct.pack("<8h", 0, 0, 16384, -16384, 32767, -32768, 0, 0)
    out = wav.decode_wav(_riff(_fmt(1, 2, 4, 16), body))
    assert out["channels"] == 2 and out["n_frames"] == 4
    assert out["duration_sec"] == 1.0
    assert out["peak"] == 1.0  # -32768 / 32768


def test_decode_float32():
    body = struct.pack("<4f", 0.0, 0.5, -0.25, 0.0)
    out = wav.decode_wav(_riff(_fmt(3, 1, 1000, 32), body))
    assert out["bits"] == 32 and out["peak"] == 0.5
    assert abs(out["rms"] - math.sqrt((0.25 + 0.0625) / 4)) < 1e-12


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        wav.decode_wav(b"ID3\x03 not a wav at all")
    # sample-width outside the subset (24-bit) → named error, not junk
    with pytest.raises(ValueError, match="unsupported format"):
        wav.decode_wav(_riff(_fmt(1, 1, 8000, 24), b"\x00" * 6))
    with pytest.raises(ValueError, match="missing fmt"):
        wav.decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_encode_decode_roundtrip():
    samples = [math.sin(i / 5.0) * 0.8 for i in range(100)]
    out = wav.decode_wav(wav.encode_wav(samples, 16_000, 1))
    assert out["n_frames"] == 100 and out["sample_rate"] == 16_000
    want_rms = math.sqrt(sum(s * s for s in samples) / 100)
    assert abs(out["rms"] - want_rms) < 1e-3  # 16-bit quantization


def test_segment_wav_timestamps_and_losslessness():
    samples = [((i % 20) - 10) / 16.0 for i in range(400)]
    data = wav.encode_wav(samples, 1000, 1)  # 400 ms at 1 kHz
    segs = wav.segment_wav(data, 4)
    assert [ts for ts, _ in segs] == [0, 100, 200, 300]
    # each segment is a valid standalone WAV; frames concatenate to 400
    assert sum(wav.decode_wav(s)["n_frames"] for _, s in segs) == 400


# --- Spark wiring --------------------------------------------------------


def _wav_media_df(spark):
    tone = wav.encode_wav(
        [math.sin(i / 3.0) * 0.5 for i in range(160)], 16_000, 1
    )
    return spark.createDataFrame(
        [(7, bytearray(tone), "audio/wav", len(tone))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )


def test_decode_media_real_path_wav(spark):
    from drugbankner_spark.operators.multimodal import decode_media

    out = {r["media_id"]: r["feature"]
           for r in decode_media(_wav_media_df(spark)).collect()}
    channels, rate, bits, n_frames, rms, peak = out[7]
    assert (channels, rate, bits, n_frames) == (1.0, 16000.0, 16.0, 160.0)
    assert 0.3 < rms < 0.4 and peak <= 0.5


def test_sample_frames_real_path_wav(spark):
    from drugbankner_spark.operators.multimodal import sample_frames

    rows = sample_frames(_wav_media_df(spark), n_frames=4).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    # true timestamps: 160 frames / 16 kHz = 10 ms total, 2.5 ms per
    # segment, rounded (banker's) at the ms boundary
    assert [r["frame_ts_ms"] for r in rows] == [0, 2, 5, 8]
    for r in rows:
        seg = wav.decode_wav(bytes(r["frame_payload"]))
        assert seg["sample_rate"] == 16_000 and seg["n_frames"] == 40


def test_sample_frames_video_still_raises(spark):
    from drugbankner_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x00\x18ftypmp42 fake"), "video/mp4", 13)],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_frames(df).collect()


def test_audio_features_detects_tone_frequency(spark):
    # a pure 1 kHz tone at 16 kHz: dominant bin and spectral centroid
    # must land on ~1000 Hz (fft bin width = 16000/512 = 31.25 Hz)
    from drugbankner_spark.operators.multimodal import audio_features

    sr, f0 = 16_000, 1000.0
    tone = wav.encode_wav(
        [0.8 * math.sin(2 * math.pi * f0 * i / sr) for i in range(2048)],
        sr, 1,
    )
    low = wav.encode_wav(
        [0.5 * math.sin(2 * math.pi * 250.0 * i / sr) for i in range(2048)],
        sr, 1,
    )
    media = spark.createDataFrame(
        [(1, bytearray(tone), "audio/wav", len(tone)),
         (2, bytearray(low), "audio/wav", len(low))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    assert abs(out[1]["dominant_hz"] - f0) < 32
    assert abs(out[2]["dominant_hz"] - 250.0) < 32
    assert abs(out[1]["spectral_centroid_hz"] - f0) < 100
    assert out[1]["sample_rate"] == sr
    assert abs(out[1]["duration_sec"] - 2048 / sr) < 1e-9
    assert 0.5 < out[1]["rms"] < 0.6  # sine rms = amp/sqrt(2) ≈ 0.566


def test_audio_features_non_wav_raises(spark):
    from drugbankner_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        [(1, bytearray(b"ID3\x04 mp3-ish bytes"), "audio/mpeg", 16)],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    import pytest as _pytest
    with _pytest.raises(Exception, match="NotImplementedError|WAV only"):
        audio_features(df).collect()
