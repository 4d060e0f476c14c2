"""MPEG-audio framing parser (functions/mp3_codec.py).

Header fields and frame lengths are hand-computed from the ISO/IEC
11172-3 tables, then stream-level behavior (ID3 skip, resync, VBR
duration, truncation) is checked on synthesized structurally-valid
streams.
"""

from drugbankner_spark.functions import mp3_codec as mp3


def test_hand_computed_header():
    # 0xFF 0xFB 0x90 0x00: MPEG1 Layer III, 128 kbps, 44100 Hz, no
    # padding, stereo → 144*128000/44100 = 417 bytes, 1152 samples.
    h = mp3.parse_frame_header(b"\xff\xfb\x90\x00")
    assert h == {
        "version": "MPEG1", "layer": 3, "bitrate_kbps": 128,
        "sample_rate": 44100, "channels": 2, "padding": 0,
        "frame_bytes": 417, "samples": 1152,
    }


def test_padding_adds_one_byte():
    plain = mp3.parse_frame_header(mp3.encode_frame(padding=0))
    padded = mp3.parse_frame_header(mp3.encode_frame(padding=1))
    assert padded["frame_bytes"] == plain["frame_bytes"] + 1


def test_mpeg2_layer3_halves_samples():
    h = mp3.parse_frame_header(mp3.encode_frame(64, 22050, version=2))
    assert h["version"] == "MPEG2"
    assert h["samples"] == 576
    assert h["frame_bytes"] == 72 * 64000 // 22050


def test_reserved_fields_reject():
    assert mp3.parse_frame_header(b"\xff\xeb\x90\x00") is None  # ver=reserved
    assert mp3.parse_frame_header(b"\xff\xf9\x90\x00") is None  # layer=0
    assert mp3.parse_frame_header(b"\xff\xfb\xf0\x00") is None  # bitrate=15
    assert mp3.parse_frame_header(b"\xff\xfb\x9c\x00") is None  # srate=3
    assert mp3.parse_frame_header(b"\x00\x00\x00\x00") is None  # no sync


def test_cbr_stream_duration_exact():
    data = mp3.encode_mp3(n_frames=10)
    info = mp3.mp3_info(data)
    assert info["valid"] and not info["vbr"]
    assert info["n_frames"] == 10
    assert info["duration_ms"] == round(10 * 1152 / 44100 * 1000)
    assert info["bitrate_kbps"] == 128 and info["sample_rate"] == 44100


def test_vbr_stream_sums_per_frame():
    data = mp3.encode_mp3(bitrate_kbps=[128, 160, 192, 320], n_frames=4)
    info = mp3.mp3_info(data)
    assert info["vbr"] and info["n_frames"] == 4
    # all frames are MPEG1 L3 at 44100 → same samples regardless of rate
    assert info["duration_ms"] == round(4 * 1152 / 44100 * 1000)
    # frame-walk average sits strictly between the rate extremes and
    # near the arithmetic mean (equal-duration frames)
    assert 128 < info["avg_bitrate_kbps"] < 320
    assert abs(info["avg_bitrate_kbps"] - 200) < 5


def test_cbr_avg_matches_header_bitrate():
    info = mp3.mp3_info(mp3.encode_mp3(n_frames=20))
    # integer frame sizes floor the per-frame byte count, so the walk
    # average sits just under the nominal 128 kbps
    assert abs(info["avg_bitrate_kbps"] - 128) < 1


def test_id3v2_skipped_and_sized():
    data = mp3.encode_mp3(n_frames=3, id3v2_payload=b"\x01" * 300)
    info = mp3.mp3_info(data)
    assert info["id3v2_bytes"] == 310  # 10-byte header + payload
    assert info["n_frames"] == 3


def test_id3v2_syncsafe_size_roundtrip():
    # 200-byte payload crosses the 7-bit boundary (needs two size bytes)
    tag = mp3.encode_id3v2(bytes(200))
    assert mp3.id3v2_size(tag) == 210


def test_id3v1_trailer_excluded_from_walk():
    data = mp3.encode_mp3(n_frames=2, id3v1=True)
    info = mp3.mp3_info(data)
    assert info["id3v1"] and info["n_frames"] == 2


def test_resync_past_leading_junk():
    data = b"\x00junkjunk\xff" + mp3.encode_mp3(n_frames=3)
    assert mp3.mp3_info(data)["n_frames"] == 3


def test_truncated_tail_frame_ignored():
    data = mp3.encode_mp3(n_frames=3)[:-50]
    assert mp3.mp3_info(data)["n_frames"] == 2


def test_sniff_rejects_lone_sync_bytes():
    # a stray 0xFFFB in random bytes must not sniff as audio: the frame
    # that follows it fails the consecutive-header check
    fake = bytes(100) + b"\xff\xfb\x90\x00" + bytes(1000)
    assert not mp3.is_mp3(fake)
    assert not mp3.is_mp3(bytes(500))
    assert mp3.is_mp3(mp3.encode_mp3(n_frames=2))
    assert mp3.is_mp3(mp3.encode_id3v2(b"only-a-tag"))


def test_no_frames_reports_invalid():
    info = mp3.mp3_info(bytes(64))
    assert not info["valid"] and info["n_frames"] == 0


def test_segments_are_standalone_streams():
    data = mp3.encode_mp3(n_frames=10, id3v2_payload=b"t" * 20, id3v1=True)
    segs = mp3.segment_mp3(data, 4)
    assert len(segs) == 4
    # segments tile the frame sequence: 10 frames → 2,3,2,3 (int cuts)
    frame_counts = [mp3.mp3_info(seg)["n_frames"] for _, seg in segs]
    assert sum(frame_counts) == 10 and min(frame_counts) >= 2
    # timestamps are the true start of each segment's first frame
    ms_per_frame = 1152 / 44100 * 1000
    starts = [0, 2, 5, 7]  # cumulative frame index at each cut
    assert [ts for ts, _ in segs] == [round(s * ms_per_frame) for s in starts]
    # each segment parses standalone and drops the tags
    for _, seg in segs:
        info = mp3.mp3_info(seg)
        assert info["valid"] and info["id3v2_bytes"] == 0 and not info["id3v1"]


def test_segment_fewer_frames_than_requested():
    data = mp3.encode_mp3(n_frames=2)
    segs = mp3.segment_mp3(data, 8)
    assert len(segs) == 2
    assert mp3.segment_mp3(bytes(64), 4) == []


def test_segment_resync_matches_mp3_info_on_junk_prefix():
    # ADVICE r05: a lone 0xFFE coincidence in the junk prefix must not
    # make segment_mp3's re-walk start earlier than mp3_info's walk —
    # both use the same consecutive-header resync now.
    real = mp3.encode_mp3(n_frames=10)
    junk = bytes(10) + b"\xff\xfb\x90\x00" + bytes(46)  # fake lone sync
    data = junk + real
    info = mp3.mp3_info(data)
    assert info["valid"] and info["n_frames"] == 10
    segs = mp3.segment_mp3(data, 4)
    assert segs[0][0] == 0  # first segment starts at the REAL stream
    assert sum(mp3.mp3_info(s)["n_frames"] for _, s in segs) == 10
