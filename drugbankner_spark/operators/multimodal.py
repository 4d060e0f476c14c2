"""E4: multimodal (binary) columns (SURVEY.md §2.12).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side plumbing — schema, binaryFile source, Arrow batch shape,
partition sizing — is real and tested; the actual decode is STUBBED
(``NotImplementedError`` real path + a deterministic fake) because no
image/audio libraries exist in this container.

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


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode / feature-extract over Arrow batches (mapInPandas). The real
    path needs PIL/ffmpeg — absent here, so it raises NotImplementedError
    per batch; ``fake=True`` swaps in a deterministic stand-in (byte
    histogram head) with the REAL batch shape and schema so the plumbing
    is testable."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this environment; pass fake=True for the test path"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                head = payload[:8]
                rows.append((int(mid), [float(b) for b in head]))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.mapInPandas(run, out_schema)


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """1→1 image resize over Arrow batches. Real path = PIL (absent here
    → NotImplementedError per batch); ``fake=True`` emits a deterministic
    ``width*height``-byte payload (truncate/cycle the source bytes) with
    the REAL output schema — (media_id, payload, width, height) — so
    partitioning, batch shape, and downstream joins are testable."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])
    n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL; pass fake=True for the "
                    "test path"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                src = bytes(payload) or b"\x00"
                out = (src * (n // len(src) + 1))[:n]
                rows.append((int(mid), out, width, height))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    return media.mapInPandas(run, out_schema)


def sample_frames(
    media: DataFrame, n_frames: int = 4, fake: bool = False
) -> DataFrame:
    """1→N video frame sampling over Arrow batches (the row fan-out shape:
    one input payload → ``n_frames`` output rows with frame index +
    timestamp). Real path = ffmpeg (absent → NotImplementedError);
    ``fake=True`` slices the payload into n equal chunks as stand-in
    frames — deterministic, so downstream dedup/similarity over frames is
    testable end to end."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg; pass fake=True for "
                    "the test path"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                src = bytes(payload) or b"\x00"
                step = max(len(src) // n_frames, 1)
                for i in range(n_frames):
                    rows.append(
                        (int(mid), i, i * 1000, src[i * step:(i + 1) * step])
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_ts_ms", "frame_payload"],
            )

    return media.mapInPandas(run, out_schema)
