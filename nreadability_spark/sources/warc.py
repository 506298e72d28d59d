"""WARC source: read web-crawl archives into the transcripts/documents
shape the engine consumes.

Real crawls arrive as WARC files (ISO 28500 — the Common Crawl /
Internet Archive format): concatenated records, each a header block
(``WARC/1.0`` + named fields + ``Content-Length``) and a body, where
``response`` records wrap an HTTP message whose body is the page. This
module implements, dependency-free:

- ``build_warc_record`` / ``build_warc``: a deterministic writer for
  valid uncompressed WARC/1.0 (per-record gzip members are the common
  at-rest variant; the record grammar is identical, so a production
  reader only adds a gzip member splitter);
- ``parse_warc``: a record walker (headers -> Content-Length-delimited
  body -> HTTP status/headers/payload split) that is total — malformed
  tails are skipped, never a crash;
- ``read_warc``: the Spark reader — ``binaryFile`` scan (one task per
  WARC file, the natural split of real crawls, which ship as ~1 GB
  files) -> Arrow-batched ``mapInPandas`` parse -> typed rows.

The ``extract_warc_pages`` query proves the path end-to-end: documents
rendered into WARC, read back through this reader, and extracted —
the result must equal the ``extract_doc_pages`` golden byte-for-byte
(same pages, different transport).
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_VERSION = b"WARC/1.0"

WARC_ROW_SCHEMA = T.StructType(
    [
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


def build_warc_record(
    target_uri: str,
    html: str,
    record_id: str,
    warc_date: str = "2026-01-01T00:00:00Z",
    http_status: str = "200 OK",
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    body = html.encode("utf-8")
    http_block = (
        f"HTTP/1.1 {http_status}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("ascii") + body
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:synth:{record_id}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http_block)}\r\n"
        "\r\n"
    ).encode("ascii")
    return header + http_block + b"\r\n\r\n"


def _gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (zlib writes mtime=0 — no wall
    clock in the output, unlike ``gzip.compress``)."""
    c = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return c.compress(data) + c.flush()


def build_warc(records, compress: bool = False) -> bytes:
    """records: iterable of (target_uri, html, record_id) tuples.
    ``compress=True`` writes the at-rest form real crawls use: one gzip
    MEMBER per record (members concatenate legally, and a reader can
    seek to any record boundary without decompressing the whole file)."""
    recs = (build_warc_record(u, h, r) for u, h, r in records)
    if compress:
        return b"".join(_gzip_member(r) for r in recs)
    return b"".join(recs)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plaintext records;
    stops at the first corrupt member (total — yields the good prefix)."""
    out = []
    while data[:2] == b"\x1f\x8b":
        obj = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = obj.decompress(data)
        except zlib.error:
            break
        if not chunk and not obj.unused_data:
            break  # no forward progress on malformed input
        out.append(chunk)
        data = obj.unused_data
    return b"".join(out)


_STATUS_RE = re.compile(rb"HTTP/\d\.\d (\d{3})")


def parse_warc(data: bytes):
    """Yield dict rows for each well-formed record; skip malformed
    tails (total — a corrupt archive yields its good prefix). Sniffs
    the at-rest gzip-member form and inflates it first."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    i, n = 0, len(data)
    while i < n:
        start = data.find(WARC_VERSION, i)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers = {}
        for line in data[start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            i = head_end + 4
            continue
        body = data[head_end + 4 : head_end + 4 + length]
        i = head_end + 4 + length

        status = None
        content_type = None
        payload = body
        if headers.get(b"content-type", b"").startswith(b"application/http"):
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                http_head = body[:http_end]
                payload = body[http_end + 4 :]
                m = _STATUS_RE.match(http_head)
                status = int(m.group(1)) if m else None
                for line in http_head.split(b"\r\n")[1:]:
                    k, _, v = line.partition(b":")
                    if _ and k.strip().lower() == b"content-type":
                        content_type = v.strip().decode("latin-1")
        yield {
            "warc_type": headers.get(b"warc-type", b"").decode("latin-1"),
            "target_uri": headers.get(b"warc-target-uri", b"").decode("latin-1"),
            "warc_date": headers.get(b"warc-date", b"").decode("latin-1"),
            "record_id": headers.get(b"warc-record-id", b"").decode("latin-1"),
            "http_status": status,
            "content_type": content_type,
            "payload": payload.decode("utf-8", "replace"),
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files -> one row per record. ``binaryFile`` gives one task
    per file — the natural parallelism of a crawl at rest (real crawls
    ship as many ~1 GB WARCs; a 100 TB crawl is ~100k files)."""
    files = spark.read.format("binaryFile").load(path)

    def batches(it):
        import pandas as pd

        cols = list(WARC_ROW_SCHEMA.names)
        for pdf in it:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc(bytes(content)):
                    rows.append([rec[c] for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return files.select("content").mapInPandas(batches, schema=WARC_ROW_SCHEMA)
