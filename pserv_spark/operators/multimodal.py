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
the oracle recomputes the same bytes SQL-side.  All oracle byte work
goes through ``hex(encode(text))`` — two hex chars per byte — so the
parity is BYTE-true even for multi-byte UTF-8 content (the round-7
hostile-text audit caught the earlier char-offset oracles assuming
ascii).  Content digests are defined as ``md5(lowercase hex of the
bytes)`` rather than md5 of the raw bytes: the same pure function of
the payload, but computable in any SQL oracle (DuckDB's md5 only
accepts VARCHAR).

At 100 TB: payloads stay columnar in Parquet; the Arrow boundary moves
one batch at a time (``spark.sql.execution.arrow.maxRecordsPerBatch``
caps peak memory); metadata-only queries never touch Python because
the header columns are materialized once at ingest.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ._oracle import DUCK_HASH32

FRAME_BYTES = 16
FRAME_STRIDE = 4
HEADER_BYTES = 8


def _duck_byte_sum(hx_expr: str) -> str:
    """DuckDB: sum of the byte values encoded in an UPPERCASE hex
    string (two chars per byte) — the byte-true luma the Python lane
    computes with ``sum(data)``."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, length({hx_expr}) // 2), "
        f"j -> CAST((strpos('0123456789ABCDEF', substr({hx_expr}, 2*j - 1, 1)) - 1) * 16 "
        f"+ strpos('0123456789ABCDEF', substr({hx_expr}, 2*j, 1)) - 1 AS BIGINT))), "
        "(a, b) -> a + b)"
    )


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
    """Documents as (doc_id, payload binary) — deterministic fake media.

    NULL payloads are excluded at this boundary (mirrored by ``WHERE
    text IS NOT NULL`` in every mm oracle): an asset without bytes is
    malformed input for every decode/feature lane — the Arrow batch
    loops would crash on ``bytes(None)`` — the same canonical-view
    contract ``catalog.v_emb`` applies to NULL vectors."""
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )


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
    # header = first 8 BYTES (hex slice), not first 8 chars: multi-byte
    # text diverges otherwise (hostile-text audit, round 7)
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    f"lower(substr(hex(encode(text)), 1, {2 * HEADER_BYTES})) AS header_hex "
    "FROM documents WHERE text IS NOT NULL"
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
                    # digest = md5 of the frame's lowercase hex (module
                    # doc: byte-pure AND SQL-oracle-computable)
                    out_md5.append(hashlib.md5(frame.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return assets.mapInPandas(frames, "doc_id long, frame_idx long, frame_md5 string")


_FRAME_SAMPLE_ORACLE = (
    # byte-true framing over the hex encoding; digest = md5(lower hex)
    # per the module contract
    "WITH b AS (SELECT doc_id, hex(encode(text)) AS hx "
    "FROM documents WHERE text IS NOT NULL), "
    "idx AS (SELECT doc_id, hx, frame_idx FROM b, "
    f"unnest(generate_series(0, (length(hx) // 2 + {FRAME_BYTES} - 1) // {FRAME_BYTES} - 1, "
    f"{FRAME_STRIDE})) AS t(frame_idx)) "
    "SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, "
    f"md5(lower(substr(hx, frame_idx * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES}))) AS frame_md5 "
    "FROM idx"
)


N_FEAT_BINS = 16
RESIZE_MAX_SIDE = 256


def mm_feature_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake feature extraction: binary payload → fixed-dim
    dense vector (the embed step of an image/audio pipeline, with the
    neural net swapped for a byte-class histogram).  The Spark-side
    shape is the real one — ``mapInPandas`` emitting
    ``array<double>`` — so swapping in a real model touches only the
    Python body.  Fractions are emitted unrounded: exact IEEE quotients
    are bit-identical across engines (SURVEY §4.5 rule 2)."""
    assets = _assets(spark, sf_dir)

    # A zero-byte asset has no feature distribution (0/0) — excluded at
    # the operator boundary, both sides (hostile-text audit, round 7).
    assets = assets.where(F.length("payload") > 0)

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                data = decode_stub(bytes(payload))
                hist = [0] * N_FEAT_BINS
                for b in data:
                    hist[b >> 4] += 1
                n = float(len(data))
                feats.append([c / n for c in hist])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feat": feats})

    # The Arrow-batched UDF keeps the real array<double> embed shape;
    # the public result explodes to (doc_id, bin, frac) rows — array
    # output columns cross the driver hash as numpy arrays vs lists
    # (round-2 finding), primitive rows do not.
    vec = assets.mapInPandas(embed, "doc_id long, feat array<double>")
    return vec.select("doc_id", F.posexplode("feat").alias("bin", "frac"))


_FEATURE_EMBED_ORACLE = (
    # bin = BYTE high nibble == the byte's first hex digit; zero-byte
    # assets excluded per the operator contract
    "WITH codes AS (SELECT doc_id, length(hx) // 2 AS n, "
    "list_transform(generate_series(1, length(hx) // 2), "
    "j -> strpos('0123456789ABCDEF', substr(hx, 2*j - 1, 1)) - 1) AS bins "
    "FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents "
    "WHERE text IS NOT NULL AND octet_length(encode(text)) > 0) s) "
    f"SELECT doc_id, CAST(b AS INT) AS bin, "
    "len(list_filter(bins, x -> x = b)) / CAST(n AS DOUBLE) AS frac "
    f"FROM codes CROSS JOIN (SELECT unnest(generate_series(0, {N_FEAT_BINS - 1})) AS b) g"
)


def mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving thumbnail geometry per asset (the resize
    planning step; the pixel work itself would live in the same Arrow
    batch loop).  Source dims derive deterministically from
    (doc_id, n_bytes); output dims use integer-only arithmetic
    (``w·max_side // longest_side``) so both engines agree exactly."""
    assets = _assets(spark, sf_dir)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(lambda b: len(decode_stub(bytes(b))))
            src_w = 320 + (pdf["doc_id"] * 7) % 1600
            src_h = 240 + (n_bytes * 13) % 840
            longest = src_w.combine(src_h, max)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": src_w,
                    "src_h": src_h,
                    "out_w": (src_w * RESIZE_MAX_SIDE) // longest,
                    "out_h": (src_h * RESIZE_MAX_SIDE) // longest,
                }
            )

    return assets.mapInPandas(
        resize, "doc_id long, src_w long, src_h long, out_w long, out_h long"
    )


_RESIZE_META_ORACLE = (
    "WITH dims AS (SELECT doc_id, "
    "320 + (doc_id * 7) % 1600 AS src_w, "
    "240 + (octet_length(encode(text)) * 13) % 840 AS src_h FROM documents WHERE text IS NOT NULL) "
    "SELECT doc_id, src_w, src_h, "
    f"(src_w * {RESIZE_MAX_SIDE}) // greatest(src_w, src_h) AS out_w, "
    f"(src_h * {RESIZE_MAX_SIDE}) // greatest(src_w, src_h) AS out_h "
    "FROM dims"
)


#: Audio stand-in parameters: fake PCM16 mono at a source rate derived
#: from the asset, resampled to 16 kHz (the ASR-standard target).
AUDIO_TARGET_HZ = 16_000


def mm_audio_resample_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resampling plan per asset (the sample-rate-conversion
    bookkeeping an ingest pipeline runs before feature extraction; the
    DSP itself would sit in the same Arrow loop, see module doc).

    The payload is treated as PCM16 mono (n_samples = n_bytes // 2) at
    a deterministic source rate; output length uses the resampler's
    integer formula ``floor(n · target / source)`` so both engines
    agree exactly, and ``drift_us`` is the truncation-induced duration
    error in integer microseconds.
    """
    assets = _assets(spark, sf_dir)

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(lambda b: len(decode_stub(bytes(b))))
            n_samples = n_bytes // 2
            src_hz = 8000 + (pdf["doc_id"] * 441) % 40000
            out_samples = (n_samples * AUDIO_TARGET_HZ) // src_hz
            dur_us = (n_samples * 1_000_000) // src_hz
            out_us = (out_samples * 1_000_000) // AUDIO_TARGET_HZ
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_hz": src_hz,
                    "n_samples": n_samples,
                    "out_samples": out_samples,
                    "drift_us": dur_us - out_us,
                }
            )

    return assets.mapInPandas(
        plan,
        "doc_id long, src_hz long, n_samples long, out_samples long, drift_us long",
    )


_AUDIO_RESAMPLE_ORACLE = (
    "WITH a AS (SELECT doc_id, octet_length(encode(text)) // 2 AS n_samples, "
    "8000 + (doc_id * 441) % 40000 AS src_hz FROM documents WHERE text IS NOT NULL) "
    "SELECT doc_id, src_hz, n_samples, "
    f"(n_samples * {AUDIO_TARGET_HZ}) // src_hz AS out_samples, "
    "(n_samples * 1000000) // src_hz "
    f"- (((n_samples * {AUDIO_TARGET_HZ}) // src_hz) * 1000000) // {AUDIO_TARGET_HZ} "
    "AS drift_us FROM a"
)


#: Perceptual-hash parameters: 32-bit hash, byte 4-grams, 4 bands of
#: 8 bits, Hamming radius 3 (< n_bands ⇒ banding is lossless by
#: pigeonhole: any pair within radius shares at least one full band).
PHASH_BITS = 32
PHASH_GRAM = 4
PHASH_BANDS = 4
PHASH_RADIUS = 3


def phash32(payload: bytes) -> int:
    """SimHash-style 32-bit perceptual hash over byte 4-grams: each
    gram votes ±1 per bit position from its md5; bit = sign of the
    vote sum.  On real media this runs on decoded pixel/PCM blocks —
    here the deterministic fake payload (ascii text bytes) keeps the
    DuckDB oracle able to recompute it SQL-side."""
    votes = [0] * PHASH_BITS
    for i in range(len(payload) - PHASH_GRAM + 1):
        # gram key = lowercase hex of the 4 bytes (module doc: byte-pure
        # and VARCHAR-md5-computable in the oracle)
        gram_hex = payload[i : i + PHASH_GRAM].hex().encode()
        h = int(hashlib.md5(gram_hex).hexdigest()[:8], 16)
        for b in range(PHASH_BITS):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(PHASH_BITS) if votes[b] > 0)


def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate asset pairs by perceptual-hash Hamming distance.

    Pipeline: Arrow-batched ``mapInPandas`` computes the 32-bit phash
    per asset (the only Python stage — one pass over the payload
    column); LSH banding turns the all-pairs Hamming search into an
    equi-join on (band, band_value) — at 100 TB the shuffle carries
    only (doc_id, 4 band keys), never payloads, and radius < bands
    makes the banding exact, not approximate.  Residual check is
    JVM-side ``bit_count(h1 ^ h2)``."""
    # Assets shorter than one gram have no content to hash (phash would
    # degenerate to 0 and spuriously pair every such asset — hostile-
    # text audit, round 7): excluded from candidacy, both sides.
    assets = (
        _assets(spark, sf_dir)
        .where(F.col("doc_id") % 5 == 0)
        .where(F.length("payload") >= PHASH_GRAM)
    )

    def hasher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [phash32(bytes(p)) for p in pdf["payload"]],
                }
            )

    hashed = assets.mapInPandas(hasher, "doc_id long, phash long")
    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright("phash", 8 * k)
                        .bitwiseAND(255)
                        .alias("bval"),
                    )
                    for k in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", "bk.band", "bk.bval")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b.hint("merge"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.phash").alias("h1"),
            F.col("b.phash").alias("h2"),
        )
        .distinct()
    )
    return cand.select(
        "d1",
        "d2",
        F.expr("CAST(bit_count(h1 ^ h2) AS INT)").alias("hamming"),
    ).where(F.col("hamming") <= PHASH_RADIUS)


#: Oracle recomputes the phash from the text bytes entirely in SQL
#: (ascii payload ⇒ byte grams == char grams), then brute-forces all
#: pairs — the naive form the banded plan must reproduce exactly.
_PHASH_ORACLE = (
    # NB the position column must NOT be named `i` — DUCK_HASH32's
    # hex-fold lambda uses `i` and would capture/shadow it (observed:
    # every gram hashed the lambda index instead of its position).
    "WITH src AS ("
    "  SELECT doc_id, hex(encode(text)) AS hx FROM documents"
    "  WHERE doc_id % 5 = 0 AND text IS NOT NULL"
    f"  AND octet_length(encode(text)) >= {PHASH_GRAM}"
    "), grams AS ("
    "  SELECT doc_id, "
    + DUCK_HASH32.format(expr=f"lower(substr(hx, 2*gp - 1, {2 * PHASH_GRAM}))")
    + " AS h"
    "  FROM src, unnest(generate_series(1,"
    f"   length(hx) // 2 - {PHASH_GRAM - 1})) AS t(gp)"
    "), votes AS ("
    "  SELECT doc_id, b,"
    "    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v"
    f"  FROM grams, unnest(generate_series(0, {PHASH_BITS - 1})) AS u(b)"
    "  GROUP BY doc_id, b"
    "), ph AS ("
    "  SELECT doc_id,"
    "    CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)"
    "      AS BIGINT) AS phash"
    "  FROM votes GROUP BY doc_id"
    ") SELECT a.doc_id AS d1, b.doc_id AS d2,"
    "    CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming"
    "  FROM ph a JOIN ph b ON a.doc_id < b.doc_id"
    f"  WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_RADIUS}"
)


SCENE_CUT_THRESHOLD = 100  # |Δ frame luma| that counts as a cut


def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the fake frame stream: a per-frame
    intensity proxy ("luma" = byte sum) is extracted batch-wise in
    Arrow, then cuts are |Δluma| > threshold between consecutive
    frames — the LAG-over-(asset, frame) shape a real shot-boundary
    detector has, with the decoder swapped for the byte proxy.
    Output per asset: frame count + cut count (exact integers).

    Scale: Python touches each payload once; the window partitions by
    asset (frames of one asset are one partition's rows — no global
    ordering anywhere)."""
    assets = _assets(spark, sf_dir)

    def lumas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            od, oi, ol = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = decode_stub(bytes(payload))
                n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(n_frames):
                    od.append(doc_id)
                    oi.append(i)
                    ol.append(sum(data[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]))
            yield pd.DataFrame({"doc_id": od, "frame_idx": oi, "luma": ol})

    f = assets.mapInPandas(lumas, "doc_id long, frame_idx long, luma long")
    win = Window.partitionBy("doc_id").orderBy("frame_idx")
    cuts = f.withColumn("prev", F.lag("luma").over(win)).select(
        "doc_id",
        F.when(
            F.col("prev").isNotNull()
            & (F.abs(F.col("luma") - F.col("prev")) > SCENE_CUT_THRESHOLD),
            1,
        )
        .otherwise(0)
        .alias("is_cut"),
    )
    return cuts.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.sum("is_cut").cast("long").alias("n_cuts"),
    )


_SCENE_CUT_ORACLE = (
    # byte-true frames via the hex encoding (shared shape with
    # _FRAMES_CTE below; inline because that constant is defined later)
    "WITH b AS (SELECT doc_id, hex(encode(text)) AS hx "
    "FROM documents WHERE text IS NOT NULL), "
    "idx AS (SELECT doc_id, "
    f"substr(hx, frame_idx * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES}) AS fhx, "
    "frame_idx FROM b, "
    f"unnest(generate_series(0, (length(hx) // 2 + {FRAME_BYTES} - 1) // {FRAME_BYTES} - 1)) "
    "AS t(frame_idx)), "
    "f AS (SELECT doc_id, frame_idx, " + _duck_byte_sum("fhx") + " AS luma FROM idx), "
    "lagd AS (SELECT doc_id, luma, "
    "LAG(luma) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev FROM f) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames, "
    "CAST(SUM(CASE WHEN prev IS NOT NULL AND ABS(luma - prev) > "
    f"{SCENE_CUT_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts "
    "FROM lagd GROUP BY doc_id"
)




def mm_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diverse keyframe selection — 3 greedy k-center picks per asset
    on the per-frame intensity feature (thumbnail/preview selection,
    and the dedup-before-embed frame subsampling step of a video
    pipeline).  Pick 1 = brightest frame; each next pick maximizes the
    minimum feature distance to the already-picked set; all ties break
    on the lowest frame index, so selection is a total order.

    The frame features come through the same Arrow-batched
    ``mapInPandas`` lane as ``mm_scene_cuts``; the greedy selection
    itself is fully declarative — three per-asset window argmaxes, no
    iteration state outside the plan.  At scale each asset's frames
    are one partition's rows; nothing global ever sorts."""
    assets = _assets(spark, sf_dir)

    def lumas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            od, oi, ol = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = decode_stub(bytes(payload))
                n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(n_frames):
                    od.append(doc_id)
                    oi.append(i)
                    ol.append(sum(data[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]))
            yield pd.DataFrame({"doc_id": od, "frame_idx": oi, "luma": ol})

    fr = assets.mapInPandas(lumas, "doc_id long, frame_idx long, luma long")

    def _argmax(df: DataFrame, order_col, out_prefix: str) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy(order_col.desc(), "frame_idx")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                "doc_id",
                F.col("frame_idx").alias(f"{out_prefix}_idx"),
                F.col("luma").alias(f"{out_prefix}_luma"),
            )
        )

    p1 = _argmax(fr, F.col("luma"), "p1")
    c2 = fr.join(p1, "doc_id").where(F.col("frame_idx") != F.col("p1_idx"))
    p2 = _argmax(
        c2.withColumn("d", F.abs(F.col("luma") - F.col("p1_luma"))), F.col("d"), "p2"
    )
    c3 = (
        fr.join(p1, "doc_id")
        .join(p2, "doc_id")
        .where(
            (F.col("frame_idx") != F.col("p1_idx"))
            & (F.col("frame_idx") != F.col("p2_idx"))
        )
        .withColumn(
            "d",
            F.least(
                F.abs(F.col("luma") - F.col("p1_luma")),
                F.abs(F.col("luma") - F.col("p2_luma")),
            ),
        )
    )
    p3 = _argmax(c3, F.col("d"), "p3")
    out = None
    for rank, p, pref in ((1, p1, "p1"), (2, p2, "p2"), (3, p3, "p3")):
        sel = p.select(
            "doc_id",
            F.lit(rank).alias("pick_rank"),
            F.col(f"{pref}_idx").alias("frame_idx"),
            F.col(f"{pref}_luma").alias("luma"),
        )
        out = sel if out is None else out.unionByName(sel)
    return out


_FRAMES_CTE = (
    "b AS (SELECT doc_id, hex(encode(text)) AS hx "
    "FROM documents WHERE text IS NOT NULL), "
    "idx AS (SELECT doc_id, "
    f"substr(hx, frame_idx * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES}) AS fhx, "
    "frame_idx FROM b, "
    f"unnest(generate_series(0, (length(hx) // 2 + {FRAME_BYTES} - 1) // {FRAME_BYTES} - 1)) "
    "AS t(frame_idx)), "
    "fr AS (SELECT doc_id, frame_idx, " + _duck_byte_sum("fhx") + " AS luma FROM idx)"
)

_KEYFRAME_ORACLE = (
    "WITH " + _FRAMES_CTE + ", "
    "p1 AS (SELECT doc_id, frame_idx AS i1, luma AS l1 FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY luma DESC, frame_idx) AS rn "
    "FROM fr) t WHERE rn = 1), "
    "p2 AS (SELECT doc_id, frame_idx AS i2, luma AS l2 FROM ("
    "SELECT fr.*, ROW_NUMBER() OVER (PARTITION BY fr.doc_id "
    "ORDER BY ABS(fr.luma - p1.l1) DESC, fr.frame_idx) AS rn "
    "FROM fr JOIN p1 USING (doc_id) WHERE fr.frame_idx != p1.i1) t WHERE rn = 1), "
    "p3 AS (SELECT doc_id, frame_idx AS i3, luma AS l3 FROM ("
    "SELECT fr.*, ROW_NUMBER() OVER (PARTITION BY fr.doc_id "
    "ORDER BY LEAST(ABS(fr.luma - p1.l1), ABS(fr.luma - p2.l2)) DESC, fr.frame_idx) AS rn "
    "FROM fr JOIN p1 USING (doc_id) JOIN p2 USING (doc_id) "
    "WHERE fr.frame_idx != p1.i1 AND fr.frame_idx != p2.i2) t WHERE rn = 1) "
    "SELECT doc_id, 1 AS pick_rank, i1 AS frame_idx, l1 AS luma FROM p1 "
    "UNION ALL SELECT doc_id, 2, i2, l2 FROM p2 "
    "UNION ALL SELECT doc_id, 3, i3, l3 FROM p3"
)


QUERIES = {
    "mm_audio_resample_meta": mm_audio_resample_meta,
    "mm_phash_near_dup": mm_phash_near_dup,
    "mm_scene_cuts": mm_scene_cuts,
    "mm_keyframe_select": mm_keyframe_select,
    "mm_decode_meta": mm_decode_meta,
    "mm_frame_sample": mm_frame_sample,
    "mm_feature_embed": mm_feature_embed,
    "mm_resize_meta": mm_resize_meta,
}

ORACLES = {
    "mm_audio_resample_meta": _AUDIO_RESAMPLE_ORACLE,
    "mm_phash_near_dup": _PHASH_ORACLE,
    "mm_scene_cuts": _SCENE_CUT_ORACLE,
    "mm_keyframe_select": _KEYFRAME_ORACLE,
    "mm_decode_meta": _DECODE_META_ORACLE,
    "mm_frame_sample": _FRAME_SAMPLE_ORACLE,
    "mm_feature_embed": _FEATURE_EMBED_ORACLE,
    "mm_resize_meta": _RESIZE_META_ORACLE,
}
