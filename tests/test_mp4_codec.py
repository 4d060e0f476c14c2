"""ISO-BMFF container parser (functions/mp4_codec.py).

Round-trips minimal structurally complete files through the fixture
encoder, plus malformed/edge-case box trees.
"""

import struct

from drugbankner_spark.functions import mp4_codec as mp4


def test_roundtrip_video_track():
    data = mp4.encode_mp4(
        duration_ms=2000, width=640, height=360, n_samples=48,
    )
    assert mp4.is_mp4(data)
    info = mp4.mp4_info(data)
    assert info["valid"] and info["brand"] == "isom"
    assert info["duration_ms"] == 2000
    (t,) = info["tracks"]
    assert t["track_id"] == 1
    assert t["handler"] == "vide" and t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (640, 360)
    assert t["n_samples"] == 48 and t["duration_ms"] == 2000


def test_audio_track_and_mdat():
    data = mp4.encode_mp4(
        handler=b"soun", codec=b"mp4a", width=0, height=0,
        duration_ms=1500, mdat=b"\x00" * 256,
    )
    info = mp4.mp4_info(data)
    (t,) = info["tracks"]
    assert t["handler"] == "soun" and t["codec"] == "mp4a"
    assert info["duration_ms"] == 1500


def test_mvhd_version1_u64_fields():
    info = mp4.mp4_info(mp4.encode_mp4(duration_ms=3500, mvhd_v1=True))
    assert info["duration_ms"] == 3500


def test_unknown_boxes_skipped_by_size():
    data = mp4.encode_mp4()
    # splice an unknown box between ftyp and moov
    ftyp_len = struct.unpack_from(">I", data, 0)[0]
    unknown = struct.pack(">I", 8 + 5) + b"xyzw" + b"hello"
    spliced = data[:ftyp_len] + unknown + data[ftyp_len:]
    info = mp4.mp4_info(spliced)
    assert info["valid"] and info["duration_ms"] == 2000


def test_largesize_box_header():
    data = mp4.encode_mp4()
    ftyp_len = struct.unpack_from(">I", data, 0)[0]
    moov = data[ftyp_len:]
    # rewrite moov with a 64-bit largesize header (size field = 1)
    large = (
        struct.pack(">I", 1) + b"moov"
        + struct.pack(">Q", len(moov) + 8) + moov[8:]
    )
    info = mp4.mp4_info(data[:ftyp_len] + large)
    assert info["valid"] and info["duration_ms"] == 2000


def test_truncated_file_yields_leading_metadata():
    data = mp4.encode_mp4(mdat=bytes(1000))
    # cut inside mdat: moov already parsed in full
    info = mp4.mp4_info(data[:-500])
    assert info["valid"] and info["duration_ms"] == 2000


def test_sniff_rejects_non_bmff():
    assert not mp4.is_mp4(bytes(100))
    assert not mp4.is_mp4(b"\x00\x00\x00\x08ftyp")  # no brand bytes
    junk = struct.pack(">I", 16) + b"ftyp" + b"zzzz" + bytes(4)
    assert not mp4.is_mp4(junk)  # unknown brand


def test_fuzz_random_unknown_boxes_never_crash():
    import random

    rng = random.Random(5)
    base = mp4.encode_mp4()
    for _ in range(50):
        # splice random well-formed unknown boxes at random box joints
        # and random byte corruption in the tail — the parser must
        # never raise, and with the moov intact must keep its metadata
        data = base
        for _ in range(rng.randrange(3)):
            body = bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
            fourcc = bytes(rng.choice(b"abcdwxyz") for _ in range(4))
            box = struct.pack(">I", 8 + len(body)) + fourcc + body
            data = data + box  # after moov: metadata must survive
        info = mp4.mp4_info(data)
        assert info["valid"] and info["duration_ms"] == 2000
        # random truncations parse without raising
        cut = rng.randrange(len(data))
        mp4.mp4_info(data[:cut])


def test_jpeg_dims_fuzz_sizes():
    import random

    from drugbankner_spark.functions.jpeg_codec import (
        encode_jpeg,
        jpeg_dims,
    )

    rng = random.Random(9)
    for _ in range(10):
        w, h = rng.randrange(1, 70), rng.randrange(1, 40)
        ch = rng.choice([1, 3])
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        assert jpeg_dims(encode_jpeg(px, w, h, ch)) == (w, h, ch)


def test_zero_size_box_means_to_end():
    body = b"payload-to-end-of-file"
    box = struct.pack(">I", 0) + b"free" + body
    out = list(mp4.walk_boxes(box))
    assert out == [(b"free", 8, len(box))]
