"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data table carries image/audio/video as opaque
``binary`` columns. This module implements the Spark-side plumbing —
schema, Arrow-batched ``mapInPandas`` decode stage, partition-friendly
metadata extraction — with the actual media decode STUBBED (no
image/audio libraries in this sandbox):

- ``decode_stub=True`` (default): a clearly-marked deterministic fake
  decoder derives metadata (format/width/height) from the md5 of the
  payload bytes — so the full pipeline (binary column -> mapInPandas ->
  typed struct) runs and is testable, and the values are reproducible
  by the SQL oracle.
- ``decode_stub=False``: raises ``NotImplementedError`` at the exact
  call site where ``PIL.Image.open`` / ``soundfile.read`` would run on
  a real cluster.

The batch iterator shape (``Iterator[pd.DataFrame] ->
Iterator[pd.DataFrame]``) is the real production signature: one Arrow
batch in, one out, no per-row Python dispatch; memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (binary payloads are
large — same tuning as the HTML extraction UDF).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql import functions as F

FORMATS = ("jpeg", "png", "webp")

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real media decode: metadata derived
    from md5(payload). Same arithmetic as the SQL oracle (h60 mod)."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    fmt = FORMATS[h % len(FORMATS)]
    width = 64 + (h // 7) % 1024
    height = 64 + (h // 11) % 1024
    return fmt, width, height


def decode_metadata(df: DataFrame, payload_col: str = "payload", decode_stub: bool = True) -> DataFrame:
    """binary payload column -> typed metadata rows via mapInPandas."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                if decode_stub:
                    fmt, width, height = _fake_decode(data)
                else:
                    # real cluster path: PIL/soundfile/av decode here
                    raise NotImplementedError(
                        "media decode requires image/audio libraries not "
                        "present in this sandbox; run with decode_stub=True"
                    )
                rows.append((int(doc_id), len(data), fmt, width, height))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "format", "width", "height"]
            )

    return df.select("doc_id", payload_col).mapInPandas(batches, schema=META_SCHEMA)


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents' text bytes treated as an opaque binary payload, pushed
    through the decode stage. (On a real table the payload column is
    already binary; encode() here just materializes that shape.)"""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return decode_metadata(payloads).orderBy("doc_id")


def multimodal_metadata_sql() -> str:
    # mirrors _fake_decode: md5 of the UTF-8 bytes of text
    h = "CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)"
    fmt = f"['jpeg','png','webp'][({h} % 3) + 1]"
    return f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       {fmt} AS format,
       64 + ({h} // 7) % 1024 AS width,
       64 + ({h} // 11) % 1024 AS height
FROM documents
ORDER BY doc_id
"""


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.LongType()),
    ]
)


def _fake_frame_offsets(payload: bytes) -> list[int]:
    """Deterministic stand-in for video frame sampling: k sample
    offsets derived from md5(payload), clamped into the payload."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    n_bytes = max(len(payload), 1)
    n_frames = 1 + h % 4
    return [((h // (k + 1)) % n_bytes) for k in range(n_frames)]


def sample_frames(df: DataFrame, payload_col: str = "payload", decode_stub: bool = True) -> DataFrame:
    """binary payload -> one row per sampled frame offset. The real
    implementation seeks keyframes with a container parser (av/ffmpeg);
    the stub derives deterministic offsets so the distributed plumbing
    (batch iterator, explode shape, schema) is real and testable."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, idxs, offs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                if not decode_stub:
                    raise NotImplementedError(
                        "frame sampling requires a media container parser not "
                        "present in this sandbox; run with decode_stub=True"
                    )
                for k, off in enumerate(_fake_frame_offsets(data)):
                    ids.append(int(doc_id))
                    idxs.append(k)
                    offs.append(off)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "byte_offset": offs})

    return df.select("doc_id", payload_col).mapInPandas(batches, schema=FRAME_SCHEMA)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return sample_frames(payloads).orderBy("doc_id", "frame_idx")


def multimodal_frames_sql() -> str:
    h = "CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)"
    nb = "greatest(octet_length(encode(text)), 1)"
    return f"""
WITH base AS (
  SELECT doc_id, {h} AS h, {nb} AS n_bytes, 1 + ({h} % 4) AS n_frames
  FROM documents
)
SELECT doc_id,
       CAST(unnest(range(n_frames)) AS INT) AS frame_idx,
       unnest([ (h // (k + 1)) % n_bytes FOR k IN range(n_frames) ]) AS byte_offset
FROM base
ORDER BY doc_id, frame_idx
"""


QUERIES = {
    "multimodal_decode_meta": multimodal_metadata,
    "multimodal_frame_sample": multimodal_frames,
}
ORACLES = {
    "multimodal_decode_meta": multimodal_metadata_sql(),
    "multimodal_frame_sample": multimodal_frames_sql(),
}
