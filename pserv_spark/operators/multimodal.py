"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata extracted by Arrow-batched Python stages (``mapInPandas``
— the pattern a real decode/resize/frame-sample pipeline uses at scale:
one Python worker per partition, whole Arrow batches across the
boundary, never per-row UDF calls).

The container has no image/audio libraries, so the *decode* step is a
deterministic stand-in (`SURVEY` build notes; the instructions require
the Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — to be real and tested):

- payload        = the document text bytes (deterministic fake media).
- ``decode_stub``= raises ``NotImplementedError`` if a real codec is
  requested; the metadata path parses bytes directly.
- ``mm_decode_meta``  — per-asset byte length + header prefix (the
  magic-bytes sniff a real pipeline does before decode).
- ``mm_frame_sample`` — fixed-size "frames" (16-byte strides) sampled
  every 4th frame with an md5 content digest each — the video
  frame-sampling shape (seek → sample → hash/embed).

Both carry exact DuckDB oracles: the fake media is deterministic, so
the oracle recomputes the same bytes SQL-side (ascii text ⇒ byte
offsets == char offsets).

At 100 TB: payloads stay columnar in Parquet; the Arrow boundary moves
one batch at a time (``spark.sql.execution.arrow.maxRecordsPerBatch``
caps peak memory); metadata-only queries never touch Python because
the header columns are materialized once at ingest.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

FRAME_BYTES = 16
FRAME_STRIDE = 4
HEADER_BYTES = 8


def decode_stub(payload: bytes, codec: str = "raw") -> bytes:
    """Decode stand-in. ``raw`` passes bytes through; any real codec
    (jpeg/png/wav/h264/...) is unavailable in this environment."""
    if codec == "raw":
        return payload
    raise NotImplementedError(
        f"codec {codec!r} requires an image/audio library not present in "
        "this container; plug a real decoder in here"
    )


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents as (doc_id, payload binary) — deterministic fake media."""
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload"))


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset metadata via an Arrow-batched decode-sniff stage."""
    assets = _assets(spark, sf_dir)

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: decode_stub(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "header_hex": payloads.map(lambda b: b[:HEADER_BYTES].hex()),
                }
            )

    return assets.mapInPandas(sniff, "doc_id long, n_bytes long, header_hex string")


_DECODE_META_ORACLE = (
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    f"lower(hex(encode(substr(text, 1, {HEADER_BYTES})))) AS header_hex "
    "FROM documents"
)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every ``FRAME_STRIDE``-th 16-byte frame, digest each.

    Output cardinality varies per row (one row per sampled frame) —
    exactly the explode shape a video pipeline produces, expressed as
    a ``mapInPandas`` so frame extraction happens batch-wise in Arrow.
    """
    assets = _assets(spark, sf_dir)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = decode_stub(bytes(payload))
                n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = data[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_md5.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return assets.mapInPandas(frames, "doc_id long, frame_idx long, frame_md5 string")


_FRAME_SAMPLE_ORACLE = (
    "WITH idx AS (SELECT doc_id, text, "
    f"unnest(generate_series(0, (length(text) + {FRAME_BYTES} - 1) // {FRAME_BYTES} - 1, "
    f"{FRAME_STRIDE})) AS frame_idx FROM documents) "
    "SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, "
    f"md5(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5 "
    "FROM idx"
)


QUERIES = {
    "mm_decode_meta": mm_decode_meta,
    "mm_frame_sample": mm_frame_sample,
}

ORACLES = {
    "mm_decode_meta": _DECODE_META_ORACLE,
    "mm_frame_sample": _FRAME_SAMPLE_ORACLE,
}
