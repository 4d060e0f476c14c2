"""GIF codec (functions/gif_codec.py): LZW round-trip fuzz, full-file
round-trips (animation, interlace), an externally-authored fixture, and
the Spark-side paths through operators/multimodal.py."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drugbankner_spark.functions import gif_codec as G  # noqa: E402

PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
W, H = 13, 9
F1 = [(x + y) % 4 for y in range(H) for x in range(W)]
F2 = [(x * y) % 4 for y in range(H) for x in range(W)]


def test_lzw_roundtrip_fuzz():
    rng = random.Random(7)
    for mcs in (2, 3, 4, 8):
        nsym = 1 << mcs
        for _ in range(25):
            seq = [rng.randrange(nsym) for _ in range(rng.randrange(3000))]
            assert G._lzw_decode(mcs, G._lzw_encode(mcs, seq), len(seq)) \
                == seq


def test_lzw_dictionary_reset_at_4096():
    seq = [1, 2, 3] * 5000  # repetitive enough to fill the 12-bit table
    assert G._lzw_decode(4, G._lzw_encode(4, seq), len(seq)) == seq


def test_gif_animation_roundtrip():
    data = G.encode_gif([F1, F2], W, H, PAL4, delays_ms=[100, 250], loop=3)
    assert G.is_gif(data)
    g = G.decode_gif(data)
    assert (g["width"], g["height"], g["n_frames"], g["loop"]) == (W, H, 2, 3)
    assert g["frames"][0]["indices"] == F1
    assert g["frames"][1]["indices"] == F2
    assert [f["delay_ms"] for f in g["frames"]] == [100, 250]


def test_interlace_roundtrip():
    g = G.decode_gif(G.encode_gif([F1], W, H, PAL4, interlace=True))
    assert g["frames"][0]["indices"] == F1


def test_decodes_external_canonical_gif():
    # the famous 43-byte 1x1 transparent GIF — authored by neither the
    # encoder nor this repo, so decode is validated against the spec,
    # not against our own writer
    data = bytes([
        0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00,
        0x80, 0x00, 0x00, 0x00, 0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x21,
        0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00, 0x2C, 0x00, 0x00,
        0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00, 0x02, 0x02, 0x44,
        0x01, 0x00, 0x3B,
    ])
    g = G.decode_gif(data)
    assert (g["width"], g["height"], g["n_frames"]) == (1, 1, 1)
    assert g["frames"][0]["indices"] == [0]
    assert g["frames"][0]["transparent_idx"] == 0


def test_frame_rgb_and_sampling():
    data = G.encode_gif([F1, F2], W, H, PAL4, delays_ms=[100, 250])
    g = G.decode_gif(data)
    rgb = G.gif_frame_rgb(g["frames"][0])
    assert len(rgb) == W * H * 3 and rgb[:3] == bytes([255, 0, 0])
    segs = G.sample_gif_frames(data, 5)
    assert [(fi, ts) for fi, ts, _ in segs] == [(0, 0), (1, 100)]
    for _, _, payload in segs:
        assert G.decode_gif(payload)["n_frames"] == 1  # standalone
    assert G.decode_gif(segs[1][2])["frames"][0]["indices"] == F2


def test_spark_paths_metadata_decode_hash_frames(spark):
    from drugbankner_spark.operators import multimodal as MM

    anim = G.encode_gif([F1, F2], W, H, PAL4, delays_ms=[100, 250])
    media = spark.createDataFrame(
        [(1, bytearray(anim), "image/gif", len(anim))],
        "media_id long, payload binary, mime_type string, n_bytes long",
    )
    [meta] = MM.container_metadata(media).collect()
    assert meta["format"] == "gif" and meta["codec"] == "gif-lzw"
    assert (meta["width"], meta["height"]) == (W, H)
    assert meta["n_frames"] == 2 and meta["duration_ms"] == 350
    [feat] = MM.decode_media(media).collect()
    assert feat["feature"][:3] == [float(W), float(H), 3.0]
    [hashes] = MM.image_hashes(media).collect()
    assert isinstance(hashes["ahash"], int)  # decoded via the real path
    frames = MM.sample_frames(media, n_frames=4, fake=False).collect()
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in frames] == \
        [(0, 0), (1, 100)]
