"""E4: multimodal (binary) columns (SURVEY.md §2.12).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side plumbing — schema, binaryFile source, Arrow batch shape,
partition sizing — is real and tested. The decode paths are REAL for
PNG (functions/png_codec.py: zlib + struct, CRC-checked chunks, all
five scanline filters), baseline JPEG (functions/jpeg_codec.py: DCT +
Annex-K Huffman entropy coding, round 5), GIF including animations
(functions/gif_codec.py: full LZW + interlace, round 5 late), and WAV
audio (functions/wav_codec.py: RIFF/PCM via struct); frame sampling is
real for WAV (time-sliced standalone segments), MJPEG-AVI, MP3
(frame-boundary splits) and animated GIF (standalone re-encoded
frames). For compressed audio/video the
CONTAINER layers are real too — MPEG-audio framing
(functions/mp3_codec.py: exact VBR-correct duration, ID3 handling) and
ISO-BMFF box trees (functions/mp4_codec.py: mvhd/trak/stsd) parse with
stdlib struct via ``container_metadata`` — while SAMPLE decode for
those formats genuinely needs external codec libraries and keeps the
honest ``NotImplementedError`` + deterministic-fake pair.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
payloads fits executor memory, and carry metadata in separate columns so
filters prune without touching bytes (Parquet column pruning means a
metadata-only query never reads the blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drugbankner_spark.caching import shared_persist
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


def read_binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """S-family: the binaryFile source for real media directories —
    (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(path)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque payload so
    the binary plumbing is exercised end-to-end on the harness tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata extraction without decoding: byte length + content digest.
    Pure column ops — never leaves the JVM."""
    return media.select(
        "media_id", "mime_type", "n_bytes",
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
    )


def container_metadata(media: DataFrame) -> DataFrame:
    """Format-sniffing CONTAINER metadata over Arrow batches — the probe
    a curation pipeline filters on before paying any decode cost.

    Parses header/framing layers only (all in-repo, pure stdlib):
    PNG IHDR; JPEG SOF marker walk (functions/jpeg_codec.jpeg_dims —
    never touches entropy data); WAV RIFF/fmt; MJPEG-AVI headers;
    MPEG-audio frame walk (functions/mp3_codec — exact VBR-correct
    duration, ID3 detection, no sample decode); ISO-BMFF box tree
    (functions/mp4_codec — mvhd/trak/stsd, no sample decode). Unknown
    payloads classify as format='unknown' and corrupt files behind a
    valid magic as format='corrupt' rather than raising: a metadata
    probe bins problem files, it doesn't die on them. Zero shuffle —
    a pure 1→1 mapInPandas scan."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_tracks", T.LongType()),
        T.StructField("bitrate_kbps", T.LongType()),
        T.StructField("vbr", T.BooleanType()),
        T.StructField("codec", T.StringType()),
    ])
    cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        from drugbankner_spark.functions import avi_codec as avi
        from drugbankner_spark.functions import bmp_codec as bmp
        from drugbankner_spark.functions import gif_codec as gif
        from drugbankner_spark.functions import pnm_codec as pnm
        from drugbankner_spark.functions import jpeg_codec as jpeg
        from drugbankner_spark.functions import mp3_codec as mp3
        from drugbankner_spark.functions import mp4_codec as mp4
        from drugbankner_spark.functions import png_codec as png
        from drugbankner_spark.functions import wav_codec as wav
        from drugbankner_spark.functions.png_codec import _CHANNELS

        def row(mid, **kw):
            base = {
                "media_id": int(mid), "format": "unknown", "width": 0,
                "height": 0, "channels": 0, "sample_rate": 0,
                "duration_ms": 0, "n_frames": 0, "n_tracks": 0,
                "bitrate_kbps": 0, "vbr": False, "codec": "",
            }
            base.update(kw)
            return base

        def classify(mid, data):
            if png.is_png(data) and len(data) >= 26:
                w, h = _struct.unpack_from(">II", data, 16)
                return row(
                    mid, format="png", width=w, height=h,
                    channels=_CHANNELS.get(data[25], 0), codec="png",
                )
            if jpeg.is_jpeg(data):
                w, h, ch = jpeg.jpeg_dims(data)
                return row(
                    mid, format="jpeg", width=w, height=h,
                    channels=ch, codec="jpeg",
                )
            if gif.is_gif(data):
                g = gif.decode_gif(data)
                return row(
                    mid, format="gif", width=g["width"],
                    height=g["height"], channels=3,
                    n_frames=g["n_frames"],
                    duration_ms=sum(f["delay_ms"] for f in g["frames"]),
                    n_tracks=1, codec="gif-lzw",
                )
            if bmp.is_bmp(data):
                w, hh = _struct.unpack_from("<ii", data, 18)
                bpp = _struct.unpack_from("<H", data, 28)[0]
                return row(
                    mid, format="bmp", width=w, height=abs(hh),
                    channels=3 if bpp == 24 else 1,
                    codec=f"bi_rgb{bpp}",
                )
            if pnm.is_pnm(data):
                d = pnm.decode_pnm(data)
                return row(
                    mid, format="pnm", width=d["width"],
                    height=d["height"], channels=d["channels"],
                    codec=data[:2].decode("latin-1").lower(),
                )
            if wav.is_wav(data):
                a = wav.decode_wav(data)
                dur = (
                    a["n_frames"] * 1000 // a["sample_rate"]
                    if a["sample_rate"] else 0
                )
                return row(
                    mid, format="wav", channels=a["channels"],
                    sample_rate=a["sample_rate"],
                    duration_ms=dur, n_frames=a["n_frames"],
                    n_tracks=1, codec=f"pcm{a['bits']}",
                )
            if avi.is_avi(data):
                info = avi.avi_info(data)
                fps = info["fps"] or 0
                return row(
                    mid, format="avi", width=info["width"],
                    height=info["height"], n_frames=info["n_frames"],
                    duration_ms=int(info["n_frames"] * 1000 / fps)
                    if fps else 0,
                    n_tracks=1, codec="mjpg",
                )
            if mp3.is_mp3(data):
                info = mp3.mp3_info(data)
                return row(
                    mid, format="mp3",
                    channels=info.get("channels", 0),
                    sample_rate=info.get("sample_rate", 0),
                    duration_ms=info["duration_ms"],
                    n_frames=info["n_frames"], n_tracks=1,
                    bitrate_kbps=info.get("bitrate_kbps", 0),
                    vbr=bool(info.get("vbr", False)),
                    codec=f"{info.get('version', '')}-L"
                    f"{info.get('layer', '')}" if info["valid"] else "",
                )
            if mp4.is_mp4(data):
                info = mp4.mp4_info(data)
                vids = [
                    t for t in info["tracks"] if t["handler"] == "vide"
                ]
                lead = vids[0] if vids else (
                    info["tracks"][0] if info["tracks"] else None
                )
                return row(
                    mid, format="mp4",
                    width=lead["width"] if lead else 0,
                    height=lead["height"] if lead else 0,
                    duration_ms=info["duration_ms"],
                    n_frames=lead["n_samples"] if lead else 0,
                    n_tracks=len(info["tracks"]),
                    codec=(lead["codec"] or "") if lead else "",
                )
            return row(mid)

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                try:
                    rows.append(classify(mid, data))
                except Exception:
                    # a corrupt file behind a valid magic must BIN, not
                    # kill the probe — crawls are full of truncated and
                    # damaged media
                    rows.append(row(mid, format="corrupt"))
            yield pd.DataFrame(
                [[r[c] for c in cols] for r in rows], columns=cols,
            )

    return media.mapInPandas(run, out_schema)


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode / feature-extract over Arrow batches (mapInPandas).

    REAL paths: PNG, baseline JPEG, GIF (first frame) and BMP payloads
    decode via the in-repo codecs — feature = [width, height, channels,
    mean, min, max] over decoded samples; WAV payloads decode via the
    stdlib RIFF/PCM codec — feature = [channels, sample_rate, bits,
    n_frames, rms, peak]. Other formats need codecs absent from this
    container and raise
    ``NotImplementedError``; ``fake=True`` swaps in a deterministic
    stand-in (byte histogram head) with the REAL batch shape and schema
    so the plumbing is testable for any mime type."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from drugbankner_spark.functions import bmp_codec as bmp
        from drugbankner_spark.functions import gif_codec as gif
        from drugbankner_spark.functions import jpeg_codec as jpeg
        from drugbankner_spark.functions import mp3_codec as mp3
        from drugbankner_spark.functions import mpeg_audio as mpa
        from drugbankner_spark.functions import png_codec as png
        from drugbankner_spark.functions import pnm_codec as pnm
        from drugbankner_spark.functions import wav_codec as wav

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if fake:
                    head = data[:8]
                    rows.append((int(mid), [float(b) for b in head]))
                elif jpeg.is_jpeg(data):
                    s = jpeg.jpeg_stats(data)
                    rows.append((int(mid), [
                        float(s["width"]), float(s["height"]),
                        float(s["channels"]), float(s["mean"]),
                        float(s["min"]), float(s["max"]),
                    ]))
                elif png.is_png(data):
                    s = png.png_stats(data)
                    rows.append((int(mid), [
                        float(s["width"]), float(s["height"]),
                        float(s["channels"]), float(s["mean"]),
                        float(s["min"]), float(s["max"]),
                    ]))
                elif wav.is_wav(data):
                    a = wav.decode_wav(data)
                    rows.append((int(mid), [
                        float(a["channels"]), float(a["sample_rate"]),
                        float(a["bits"]), float(a["n_frames"]),
                        float(a["rms"]), float(a["peak"]),
                    ]))
                elif gif.is_gif(data):
                    f = gif.decode_gif(data)["frames"][0]
                    rgb = gif.gif_frame_rgb(f)
                    rows.append((int(mid), [
                        float(f["width"]), float(f["height"]), 3.0,
                        float(sum(rgb)) / len(rgb),
                        float(min(rgb)), float(max(rgb)),
                    ]))
                elif bmp.is_bmp(data):
                    d = bmp.decode_bmp(data)
                    px = d["pixels"]
                    rows.append((int(mid), [
                        float(d["width"]), float(d["height"]),
                        float(d["channels"]),
                        float(sum(px)) / len(px),
                        float(min(px)), float(max(px)),
                    ]))
                elif pnm.is_pnm(data):
                    d = pnm.decode_pnm(data)
                    px = d["pixels"]
                    rows.append((int(mid), [
                        float(d["width"]), float(d["height"]),
                        float(d["channels"]),
                        float(sum(px)) / len(px),
                        float(min(px)), float(max(px)),
                    ]))
                elif mp3.is_mp3(data):
                    # REAL MPEG-1 sample decode (round 6; round 7 adds
                    # the Layer III silence path — granules with
                    # spectral Huffman bits raise from mpeg_audio with
                    # the precise Annex-B-tables message)
                    a = mpa.decode_mpeg_audio(data)
                    if not a["valid"]:
                        raise NotImplementedError(
                            "media decode: MP3-tagged payload with no "
                            "decodable MPEG frames"
                        )
                    mono = (a["samples"].mean(axis=1)
                            if a["n_samples"] else np.zeros(1))
                    rows.append((int(mid), [
                        float(a["channels"]), float(a["sample_rate"]),
                        float(a["layer"]), float(a["n_samples"]),
                        float(np.sqrt(np.mean(mono ** 2))),
                        float(np.abs(mono).max()),
                    ]))
                else:
                    raise NotImplementedError(
                        "media decode: PNG, baseline JPEG, GIF, BMP, PNM, "
                        "WAV and MPEG-1 audio decode with the in-repo "
                        "codecs (Layer III up to silence frames); AAC / "
                        "compressed video need libraries not present in "
                        "this environment (pass fake=True for the test "
                        "path)"
                    )
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.mapInPandas(run, out_schema)


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """1→1 image resize over Arrow batches.

    REAL paths: PNG and baseline-JPEG payloads go decode →
    nearest-neighbor → re-encode via the in-repo codecs, emitting a real
    image of the target size in the source format. Other formats raise
    ``NotImplementedError`` (no codec libraries here);
    ``fake=True`` emits a deterministic ``width*height``-byte payload
    (truncate/cycle the source bytes) with the REAL output schema —
    (media_id, payload, width, height) — so partitioning, batch shape,
    and downstream joins are testable for any mime type."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])
    n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drugbankner_spark.functions import jpeg_codec as jpeg
        from drugbankner_spark.functions import png_codec as png

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                src = bytes(payload) or b"\x00"
                if fake:
                    out = (src * (n // len(src) + 1))[:n]
                elif png.is_png(src):
                    out = png.resize_png(src, width, height)
                elif jpeg.is_jpeg(src):
                    d = jpeg.decode_jpeg(src)
                    out = jpeg.encode_jpeg(
                        png.resize_nearest(
                            d["samples"], d["width"], d["height"],
                            d["channels"], width, height,
                        ),
                        width, height, d["channels"],
                    )
                else:
                    raise NotImplementedError(
                        "image resize: PNG and baseline JPEG decode with "
                        "the in-repo codecs; other formats need PIL (pass "
                        "fake=True for the test path)"
                    )
                rows.append((int(mid), out, width, height))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    return media.mapInPandas(run, out_schema)


def image_hashes(media: DataFrame) -> DataFrame:
    """Perceptual image hashes for multimodal dedup: 64-bit aHash
    (average hash — each 8×8 cell vs the global mean) and dHash
    (horizontal gradient over a 9×8 grid), computed from REAL decoded
    PNG pixels (stdlib codec → integer luminance → nearest-neighbor
    downscale). Robust to re-encoding and mild resizing — the standard
    first-pass signal for near-duplicate image detection. Output:
    (media_id, ahash, dhash) as signed 64-bit longs.

    Non-PNG/JPEG payloads raise (codec availability, as decode_media);
    hashing is Arrow-batched and shuffles nothing."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drugbankner_spark.functions import bmp_codec as bmp
        from drugbankner_spark.functions import gif_codec as gif
        from drugbankner_spark.functions import jpeg_codec as jpeg
        from drugbankner_spark.functions import png_codec as png
        from drugbankner_spark.functions import pnm_codec as pnm

        def gray(img):
            px, ch = img["pixels"], img["channels"]
            if ch == 1:
                return px
            if ch == 2:  # gray+alpha
                return px[::2]
            # integer BT.601 luminance — deterministic, no floats
            return bytes(
                (299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]) // 1000
                for i in range(0, len(px), ch)
            )

        def to_i64(bits):
            v = 0
            for b in bits:
                v = (v << 1) | b
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if png.is_png(data):
                    img = png.decode_png(data)
                elif jpeg.is_jpeg(data):
                    d = jpeg.decode_jpeg(data)
                    img = {"pixels": d["samples"],
                           "channels": d["channels"],
                           "width": d["width"], "height": d["height"]}
                elif gif.is_gif(data):
                    f = gif.decode_gif(data)["frames"][0]
                    img = {"pixels": gif.gif_frame_rgb(f), "channels": 3,
                           "width": f["width"], "height": f["height"]}
                elif bmp.is_bmp(data):
                    img = bmp.decode_bmp(data)
                elif pnm.is_pnm(data):
                    img = pnm.decode_pnm(data)
                else:
                    raise NotImplementedError(
                        "image_hashes: PNG, baseline JPEG, GIF and BMP "
                        "decode with the in-repo codecs; other formats "
                        "need image libraries absent here"
                    )
                g = gray(img)
                w, h = img["width"], img["height"]
                g9 = png.resize_nearest(g, w, h, 1, 9, 8)
                cells = [g9[r * 9 + c] for r in range(8) for c in range(8)]
                mean = sum(cells) // 64
                ahash = to_i64([1 if v > mean else 0 for v in cells])
                dhash = to_i64([
                    1 if g9[r * 9 + c] > g9[r * 9 + c + 1] else 0
                    for r in range(8) for c in range(8)
                ])
                rows.append((int(mid), ahash, dhash))
            yield pd.DataFrame(rows, columns=["media_id", "ahash", "dhash"])

    return media.mapInPandas(run, out_schema)


def image_near_dup_pairs(
    hashes: DataFrame,
    hash_col: str = "dhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes: split each
    64-bit hash into 4 × 16-bit bands — by pigeonhole, two hashes within
    hamming distance 3 share at least one band exactly — equi-join on
    (band, value), then verify with the true popcount. JVM-only after
    hash extraction; one band shuffle, never all-pairs (the SimHash/
    MinHash banding argument applied to images)."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            "max_hamming must be in [0, 3] for 4-band pigeonhole recall"
        )
    h = F.col(hash_col)
    banded = hashes.select(
        F.col("media_id"),
        h.alias("_h"),
        F.posexplode(
            F.array(*[
                F.shiftright(h, 16 * b).bitwiseAND(F.lit(0xFFFF))
                for b in range(4)
            ])
        ).alias("band", "band_val"),
    )
    banded = shared_persist(banded)  # both self-join sides
    a = banded.select(
        F.col("media_id").alias("id_a"), F.col("_h").alias("_ha"),
        "band", "band_val",
    )
    b = banded.select(
        F.col("media_id").alias("id_b"), F.col("_h").alias("_hb"),
        "band", "band_val",
    )
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def audio_features(media: DataFrame, n_fft: int = 512) -> DataFrame:
    """Real spectral feature extraction for WAV and MPEG-1 Layer I/II
    payloads: decode via the stdlib RIFF/PCM codec or the in-repo
    subband decoder (functions/mpeg_audio.py, round 6), then numpy FFT
    over the (channel-averaged) samples — dominant frequency, spectral
    centroid, rms, duration. The audio analogue of decode_media's PNG
    stats, and the feature column a downstream audio near-dup /
    quality stage consumes. Arrow-batched; numpy is vectorized per
    payload; shuffles nothing. Layer III / AAC payloads raise (codec
    availability, as everywhere in E4)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("dominant_hz", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as np

        from drugbankner_spark.functions import mp3_codec as mp3
        from drugbankner_spark.functions import mpeg_audio as mpa
        from drugbankner_spark.functions import wav_codec as wav

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if wav.is_wav(data):
                    meta = wav.decode_wav(data)
                    # re-extract samples as a numpy array (decode_wav
                    # returns stats; here we need the waveform)
                    fmt = body = None
                    for cid, pl in wav._chunks(data):
                        if cid == b"fmt ":
                            fmt = _struct.unpack("<HHIIHH", pl[:16])
                        elif cid == b"data":
                            body = pl
                    ch, rate = fmt[1], fmt[2]
                    if fmt[0] == 1 and fmt[5] == 16:
                        x = np.frombuffer(
                            body[:len(body) // 2 * 2], dtype="<i2"
                        ).astype(np.float64) / 32768.0
                    elif fmt[0] == 3 and fmt[5] == 32:
                        x = np.frombuffer(
                            body[:len(body) // 4 * 4], dtype="<f4"
                        ).astype(np.float64)
                    elif fmt[0] == 1 and fmt[5] == 8:
                        x = (np.frombuffer(body, dtype=np.uint8)
                             .astype(np.float64) - 128.0) / 128.0
                    else:
                        x = None
                    if x is None or x.size == 0:
                        raise NotImplementedError(
                            "audio_features: unsupported PCM layout"
                        )
                    if ch > 1:
                        x = (x[:x.size // ch * ch]
                             .reshape(-1, ch).mean(axis=1))
                    duration = meta["duration_sec"]
                    rms = meta["rms"]  # all-samples rms (pre-downmix)
                elif mp3.is_mp3(data):
                    # REAL MPEG-1 subband decode (round 6; Layer III
                    # silence path round 7 — spectral granules raise
                    # from mpeg_audio)
                    a = mpa.decode_mpeg_audio(data)
                    if not a["valid"] or a["n_samples"] == 0:
                        raise NotImplementedError(
                            "audio_features: empty MPEG stream"
                        )
                    x = a["samples"].mean(axis=1)
                    rate = a["sample_rate"]
                    duration = a["n_samples"] / rate
                    rms = float(np.sqrt(np.mean(x ** 2))) if x.size else 0.0
                else:
                    raise NotImplementedError(
                        "audio_features: WAV and MPEG-1 Layer I/II "
                        "decode in-repo; Layer III / AAC need codec "
                        "libraries absent here"
                    )
                seg = x[:n_fft] if x.size >= n_fft else x
                spec = np.abs(np.fft.rfft(seg, n=n_fft))
                freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
                spec[0] = 0.0  # ignore DC for dominance/centroid
                power = spec.sum()
                dom = float(freqs[int(spec.argmax())])
                cen = float((freqs * spec).sum() / power) if power > 0 else 0.0
                rows.append((
                    int(mid), rate, round(duration, 6),
                    round(rms, 6), round(dom, 3), round(cen, 3),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "duration_sec", "rms",
                         "dominant_hz", "spectral_centroid_hz"],
            )

    return media.mapInPandas(run, out_schema)


def png_roundtrip_digest(media: DataFrame, width: int = 32) -> DataFrame:
    """Oracle-checkable REAL-codec demonstration: pack each payload's
    bytes into a ``width``-wide 8-bit grayscale image, encode it as a
    real PNG (stdlib codec), decode it back, strip the padding, and
    report the SHA-256 of the recovered bytes. An engine-independent
    oracle computes the digest of the ORIGINAL bytes — a hash match
    proves the PNG encode→decode round-trip is lossless on real data
    without the oracle ever touching a PNG. Runs as Arrow-batched
    mapInPandas: embarrassingly parallel, shuffles nothing."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("decoded_sha256", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from drugbankner_spark.functions import png_codec as png

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                h = max(1, -(-len(data) // width))  # ceil, ≥1 for empty
                padded = data + b"\x00" * (width * h - len(data))
                img = png.decode_png(png.encode_png(padded, width, h, 1))
                recovered = img["pixels"][:len(data)]
                rows.append((
                    int(mid), width, h, len(data),
                    hashlib.sha256(recovered).hexdigest(),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes",
                         "decoded_sha256"],
            )

    return media.mapInPandas(run, out_schema)


def gif_roundtrip_digest(media: DataFrame, width: int = 32) -> DataFrame:
    """The GIF twin of ``png_roundtrip_digest``: payload bytes become
    palette indices over a 256-entry grayscale table, encode through
    the REAL LZW writer, decode back, digest the recovered bytes. The
    format-blind oracle digests the ORIGINAL bytes — a hash match
    proves the full GIF (LZW + container) round-trip is lossless."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("decoded_sha256", T.StringType()),
    ])
    palette = bytes(v for i in range(256) for v in (i, i, i))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from drugbankner_spark.functions import gif_codec as gif

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                h = max(1, -(-len(data) // width))
                padded = list(data) + [0] * (width * h - len(data))
                g = gif.decode_gif(
                    gif.encode_gif([padded], width, h, palette)
                )
                recovered = bytes(g["frames"][0]["indices"][:len(data)])
                rows.append((
                    int(mid), width, h, len(data),
                    hashlib.sha256(recovered).hexdigest(),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes",
                         "decoded_sha256"],
            )

    return media.mapInPandas(run, out_schema)


def bmp_roundtrip_digest(media: DataFrame, width: int = 32) -> DataFrame:
    """The BMP twin of ``png_roundtrip_digest``: payload bytes become
    8-bit grayscale rows (bottom-up, 4-byte padded), encode → decode →
    digest the recovered bytes against the format-blind oracle."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("decoded_sha256", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from drugbankner_spark.functions import bmp_codec as bmp

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                h = max(1, -(-len(data) // width))
                padded = data + b"\x00" * (width * h - len(data))
                d = bmp.decode_bmp(bmp.encode_bmp(padded, width, h, 1))
                recovered = d["pixels"][:len(data)]
                rows.append((
                    int(mid), width, h, len(data),
                    hashlib.sha256(recovered).hexdigest(),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes",
                         "decoded_sha256"],
            )

    return media.mapInPandas(run, out_schema)


def sample_frames(
    media: DataFrame, n_frames: int = 4, fake: bool = False
) -> DataFrame:
    """1→N frame sampling over Arrow batches (the row fan-out shape:
    one input payload → up to ``n_frames`` output rows with frame index
    + timestamp).

    REAL paths: WAV payloads are time-sliced into equal-duration
    standalone WAV segments with true millisecond timestamps (stdlib
    RIFF/PCM codec); MJPEG-AVI VIDEO payloads (round 5,
    functions/avi_codec.py) yield ≤n evenly-spaced frames, each a
    standalone baseline JPEG with its true container timestamp —
    decodable downstream by decode_media/image_hashes, so video frames
    flow straight into the image dedup family; MP3 payloads (round 5
    late, functions/mp3_codec.py) split on FRAME boundaries into ≤n
    structurally valid standalone MPEG streams with exact frame-walk
    timestamps. Compressed video codecs (H.264 etc.) genuinely need
    ffmpeg and raise
    ``NotImplementedError``; ``fake=True`` slices any payload into n
    equal byte chunks — deterministic, so downstream dedup/similarity
    over frames is testable end to end."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drugbankner_spark.functions import avi_codec as avi
        from drugbankner_spark.functions import gif_codec as gif
        from drugbankner_spark.functions import mp3_codec as mp3
        from drugbankner_spark.functions import wav_codec as wav

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                src = bytes(payload) or b"\x00"
                if fake:
                    step = max(len(src) // n_frames, 1)
                    for i in range(n_frames):
                        rows.append(
                            (int(mid), i, i * 1000,
                             src[i * step:(i + 1) * step])
                        )
                elif wav.is_wav(src):
                    for i, (ts_ms, seg) in enumerate(
                        wav.segment_wav(src, n_frames)
                    ):
                        rows.append((int(mid), i, ts_ms, seg))
                elif avi.is_avi(src):
                    for fi, ts_ms, frame in avi.sample_avi_frames(
                        src, n_frames
                    ):
                        rows.append((int(mid), fi, ts_ms, frame))
                elif mp3.is_mp3(src):
                    for i, (ts_ms, seg) in enumerate(
                        mp3.segment_mp3(src, n_frames)
                    ):
                        rows.append((int(mid), i, ts_ms, seg))
                elif gif.is_gif(src):
                    for fi, ts_ms, frame in gif.sample_gif_frames(
                        src, n_frames
                    ):
                        rows.append((int(mid), fi, ts_ms, frame))
                else:
                    raise NotImplementedError(
                        "frame sampling: WAV audio segments + MJPEG-AVI "
                        "video frames via the in-repo codecs; compressed "
                        "video requires ffmpeg (pass fake=True for the "
                        "test path)"
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_ts_ms", "frame_payload"],
            )

    return media.mapInPandas(run, out_schema)
