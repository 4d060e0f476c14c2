"""TAR-shard / WebDataset source (S-family, round 5 late).

Large multimodal training corpora ship as tar shards in the WebDataset
convention: each sample is a group of adjacent members sharing a key —
``000123.jpg`` + ``000123.txt`` + ``000123.json`` — and a dataset is
thousands of such shards. That layout is ALREADY the right shape for
Spark: one shard = one ``binaryFile`` row = one task, zero shuffle
until something joins samples across shards.

- ``tar_members``: 1→N member fan-out per archive (stdlib tarfile over
  a BytesIO; plain, gzip and bzip2 tars via ``r:*`` sniffing).
- ``webdataset_samples``: members regroup into one row per SAMPLE with
  an extension→payload map — grouping happens INSIDE the kernel (an
  archive is already local to its task), so no shuffle is added.
- ``encode_tar``: fixture writer.

Image/audio payloads flow straight into operators/multimodal.py
(container_metadata, image_hashes, decode_media); text members into the
E1/E3 document families.
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TAR_MEMBER_SCHEMA = T.StructType([
    T.StructField("archive", T.StringType()),
    T.StructField("member", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

WEBDATASET_SCHEMA = T.StructType([
    T.StructField("archive", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("parts", T.MapType(T.StringType(), T.BinaryType())),
    T.StructField("n_parts", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])


def _iter_members(data: bytes):
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for info in tf:
            if not info.isfile():
                continue
            f = tf.extractfile(info)
            if f is None:
                continue
            yield info.name, f.read()


def tar_members(archives: DataFrame) -> DataFrame:
    """1→N member fan-out over (path, content) rows — the output of
    ``spark.read.format('binaryFile')``."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for name, payload in _iter_members(bytes(content)):
                    rows.append((path, name, len(payload), payload))
            yield pd.DataFrame(
                rows, columns=["archive", "member", "n_bytes", "payload"],
            )

    return archives.select("path", "content").mapInPandas(
        run, TAR_MEMBER_SCHEMA
    )


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset key split: basename up to the FIRST dot is the sample
    key, the rest is the extension ('a/b/0001.seg.json' → ('a/b/0001',
    'seg.json'))."""
    slash = name.rfind("/")
    dot = name.find(".", slash + 1)
    if dot < 0:
        return name, ""
    return name[:dot], name[dot + 1:]


def webdataset_samples(archives: DataFrame) -> DataFrame:
    """One row per SAMPLE: (archive, key, parts ext→bytes, n_parts,
    n_bytes). Regrouping is per-archive inside the kernel — members of
    a sample live in the same shard by the WebDataset contract, so this
    adds no shuffle at any scale."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                samples: dict[str, dict[str, bytes]] = {}
                order: list[str] = []
                for name, payload in _iter_members(bytes(content)):
                    key, ext = _split_key(name)
                    if key not in samples:
                        samples[key] = {}
                        order.append(key)
                    samples[key][ext] = payload
                for key in order:
                    parts = samples[key]
                    rows.append((
                        path, key, parts, len(parts),
                        sum(len(v) for v in parts.values()),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["archive", "key", "parts", "n_parts", "n_bytes"],
            )

    return archives.select("path", "content").mapInPandas(
        run, WEBDATASET_SCHEMA
    )


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan → sample regrouping; one task per shard."""
    return webdataset_samples(
        spark.read.format("binaryFile").load(path)
    )


def sample_part(df: DataFrame, ext: str, alias: str | None = None):
    """Column accessor: ``parts['jpg']`` with a stable alias — feed
    straight into multimodal operators via
    ``df.select(col('key'), sample_part(df, 'jpg', 'payload'))``."""
    from pyspark.sql import functions as F

    return F.col("parts").getItem(ext).alias(alias or ext)


def export_webdataset_shards(
    samples: DataFrame,
    n_shards: int = 16,
    key_col: str = "key",
    parts_col: str = "parts",
) -> DataFrame:
    """The WRITE direction: sample rows → tar-shard BYTES, one row per
    shard — (shard_id, n_samples, n_bytes, tar_payload). Shard
    assignment is a deterministic key hash (stable across
    partitionings and reruns); members are emitted in sorted
    (key, extension) order, so shard bytes are bit-reproducible.
    Sink the payload column wherever the deployment wants the shards —
    a parquet of blobs, or a foreachPartition copy to object storage.
    Plan: one shuffle on shard_id; each shard builds locally in an
    Arrow kernel."""
    import pandas as pd

    from pyspark.sql import functions as F

    out_schema = T.StructType([
        T.StructField("shard_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("tar_payload", T.BinaryType()),
    ])

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        members: list[tuple[str, bytes]] = []
        keys = set()
        for key, parts in sorted(
            zip(pdf[key_col], pdf[parts_col]), key=lambda kv: kv[0]
        ):
            keys.add(key)
            for ext in sorted(parts):
                name = f"{key}.{ext}" if ext else key
                members.append((name, bytes(parts[ext])))
        payload = encode_tar(members)
        sid = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            [(sid, len(keys), len(payload), payload)],
            columns=["shard_id", "n_samples", "n_bytes", "tar_payload"],
        )

    keyed = samples.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )
    return keyed.groupBy("_shard").applyInPandas(build, out_schema)


def zip_members(archives: DataFrame) -> DataFrame:
    """The zip twin of :func:`tar_members` (same output schema) — some
    public corpora ship zip archives rather than tar shards; stdlib
    zipfile over the same binaryFile rows, one archive per task."""
    import io as _io
    import zipfile

    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                # tolerant like the tar/WARC/MP3 walkers: a corrupt
                # archive (or one unreadable member) is skipped, never
                # allowed to kill the whole scan task (ADVICE r05)
                try:
                    zf = zipfile.ZipFile(_io.BytesIO(bytes(content)))
                except (zipfile.BadZipFile, ValueError, OSError):
                    continue
                with zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        try:
                            payload = zf.read(info)
                        except (zipfile.BadZipFile, zipfile.LargeZipFile,
                                NotImplementedError, ValueError, OSError):
                            continue
                        rows.append(
                            (path, info.filename, len(payload), payload)
                        )
            yield pd.DataFrame(
                rows, columns=["archive", "member", "n_bytes", "payload"],
            )

    return archives.select("path", "content").mapInPandas(
        run, TAR_MEMBER_SCHEMA
    )


# ---------------------------------------------------------------- fixtures

def encode_tar(members: list[tuple[str, bytes]], gzip: bool = False) -> bytes:
    buf = io.BytesIO()
    mode = "w:gz" if gzip else "w"
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()
