"""TAR-shard / WebDataset source (sources/tar_source.py) — member
fan-out, sample regrouping, and composition into the multimodal
operators."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from drugbankner_spark.functions import png_codec as png  # noqa: E402
from drugbankner_spark.sources import tar_source as TS  # noqa: E402


def _shard(gz: bool = False) -> bytes:
    img1 = png.encode_png(bytes(range(0, 48)), 4, 4, 3)
    img2 = png.encode_png(bytes(range(100, 148)), 4, 4, 3)
    return TS.encode_tar([
        ("000/0001.png", img1),
        ("000/0001.txt", b"a red square"),
        ("000/0001.meta.json", b'{"source": "cam"}'),
        ("000/0002.png", img2),
        ("000/0002.txt", b"a blue square"),
    ], gzip=gz)


def test_split_key_first_dot():
    assert TS._split_key("a/b/0001.seg.json") == ("a/b/0001", "seg.json")
    assert TS._split_key("0001.png") == ("0001", "png")
    assert TS._split_key("noext") == ("noext", "")


def test_member_fanout_and_gzip(spark):
    for gz in (False, True):
        archives = spark.createDataFrame(
            [("mem://s0.tar", bytearray(_shard(gz)))],
            "path string, content binary",
        )
        rows = TS.tar_members(archives).collect()
        assert [r["member"] for r in rows] == [
            "000/0001.png", "000/0001.txt", "000/0001.meta.json",
            "000/0002.png", "000/0002.txt",
        ]
        assert all(r["n_bytes"] == len(bytes(r["payload"])) for r in rows)


def test_webdataset_sample_regrouping(spark):
    archives = spark.createDataFrame(
        [("mem://s0.tar", bytearray(_shard()))],
        "path string, content binary",
    )
    samples = {r["key"]: r for r in
               TS.webdataset_samples(archives).collect()}
    assert set(samples) == {"000/0001", "000/0002"}
    s1 = samples["000/0001"]
    assert set(s1["parts"].keys()) == {"png", "txt", "meta.json"}
    assert bytes(s1["parts"]["txt"]) == b"a red square"
    assert s1["n_parts"] == 3
    assert samples["000/0002"]["n_parts"] == 2


def test_webdataset_into_multimodal(spark):
    from drugbankner_spark.operators import multimodal as MM

    archives = spark.createDataFrame(
        [("mem://s0.tar", bytearray(_shard()))],
        "path string, content binary",
    )
    samples = TS.webdataset_samples(archives)
    media = samples.select(
        F.xxhash64("key").alias("media_id"),
        TS.sample_part(samples, "png", "payload"),
        F.lit("image/png").alias("mime_type"),
        F.length(TS.sample_part(samples, "png")).cast("long")
        .alias("n_bytes"),
    )
    metas = MM.container_metadata(media).collect()
    assert len(metas) == 2
    assert all(m["format"] == "png"
               and (m["width"], m["height"]) == (4, 4) for m in metas)
    hashes = MM.image_hashes(media).collect()
    assert len(hashes) == 2  # shard images flow into the dedup family


def test_cross_shard_image_dedup(spark):
    # two shards, each carrying a copy of the SAME image under
    # different keys plus one distinct image — the full multimodal
    # dedup story: shards → samples → hashes → banded near-dup pairs
    from drugbankner_spark.operators import multimodal as MM

    shared = png.encode_png(
        bytes((x * 7 + y * 13) % 256 for y in range(16) for x in range(16)),
        16, 16, 1,
    )
    other = png.encode_png(
        bytes((255 - x * 11) % 256 for y in range(16) for x in range(16)),
        16, 16, 1,
    )
    s0 = TS.encode_tar([("a.png", shared), ("b.png", other)])
    s1 = TS.encode_tar([("c.png", shared)])
    archives = spark.createDataFrame(
        [("mem://s0.tar", bytearray(s0)), ("mem://s1.tar", bytearray(s1))],
        "path string, content binary",
    )
    samples = TS.webdataset_samples(archives)
    media = samples.select(
        F.xxhash64("archive", "key").alias("media_id"),
        TS.sample_part(samples, "png", "payload"),
    )
    hashes = MM.image_hashes(media)
    pairs = MM.image_near_dup_pairs(hashes).collect()
    # exactly the cross-shard duplicate pair surfaces
    assert len(pairs) == 1
    ids = {r["media_id"]: r["key"] for r in samples.select(
        F.xxhash64("archive", "key").alias("media_id"), "key").collect()}
    [p] = pairs
    assert {ids[p["id_a"]], ids[p["id_b"]]} == {"a", "c"}


def test_export_shards_roundtrip_and_determinism(spark):
    from drugbankner_spark.sources.tar_source import (
        export_webdataset_shards,
    )

    archives = spark.createDataFrame(
        [("mem://s0.tar", bytearray(_shard()))],
        "path string, content binary",
    )
    samples = TS.webdataset_samples(archives)
    shards = export_webdataset_shards(samples, n_shards=2)
    out = shards.collect()
    assert sum(r["n_samples"] for r in out) == 2
    assert all(r["n_bytes"] == len(bytes(r["tar_payload"])) for r in out)
    # re-ingest: the exported shards reproduce the original samples
    back = TS.webdataset_samples(spark.createDataFrame(
        [(f"mem://out{r['shard_id']}.tar", bytearray(r["tar_payload"]))
         for r in out],
        "path string, content binary",
    ))
    def flat(df):
        return sorted(
            (r["key"], ext, bytes(r["parts"][ext]))
            for r in df.collect() for ext in r["parts"]
        )
    assert flat(back) == flat(samples)
    # bit-reproducible: same shard bytes from any input partitioning
    again = {r["shard_id"]: bytes(r["tar_payload"])
             for r in export_webdataset_shards(
                 samples.repartition(7), n_shards=2).collect()}
    assert {r["shard_id"]: bytes(r["tar_payload"]) for r in out} == again


def test_zip_members_fanout(spark):
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("d/a.txt", b"alpha")
        zf.writestr("d/b.bin", bytes(range(64)))
        zf.writestr("empty_dir/", b"")
    archives = spark.createDataFrame(
        [("mem://a.zip", bytearray(buf.getvalue()))],
        "path string, content binary",
    )
    rows = {r["member"]: bytes(r["payload"])
            for r in TS.zip_members(archives).collect()}
    assert rows == {"d/a.txt": b"alpha", "d/b.bin": bytes(range(64))}


def test_zip_members_tolerates_corrupt_archives(spark):
    # ADVICE r05: a corrupt archive is skipped (binned), never allowed
    # to kill the scan task — same tolerance policy as the tar/WARC
    # walkers.
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ok.txt", b"fine")
    good = buf.getvalue()
    archives = spark.createDataFrame(
        [("mem://bad.zip", bytearray(b"PK\x03\x04" + bytes(40))),
         ("mem://junk.zip", bytearray(b"not a zip at all")),
         ("mem://good.zip", bytearray(good))],
        "path string, content binary",
    )
    rows = TS.zip_members(archives).collect()
    assert [(r["archive"], r["member"], bytes(r["payload"]))
            for r in rows] == [("mem://good.zip", "ok.txt", b"fine")]
