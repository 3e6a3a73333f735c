"""Approximate-nearest-neighbor search over the embedding column.

The exact brute-force baseline is the corpus query ``vec_knn`` (cross
join + cosine + windowed top-k).  These operators are the scale paths:

- ``ann_ivf_topk`` — IVF (inverted-file) search: a deterministic coarse
  quantizer (the first ``IVF_K`` vectors by ``vec_id`` act as seed
  centroids), candidates assigned to their nearest centroid cell,
  queries probe their ``IVF_NPROBE`` nearest cells only.  The expensive
  distance computation runs on |cell| × nprobe candidates instead of N.
- ``ann_lsh_topk`` — sign-random-projection LSH, multi-table: 8 hash
  tables × 4 fixed ±1 hyperplanes each (deterministically generated
  from md5, embedded as literals).  A vector lands in one bucket per
  table; candidates are the union across tables (single-table sign-LSH
  has near-zero recall on zero-centered data — for a pair at cosine
  0.37 the 8-bit-bucket collision probability is ≈0.62⁸ ≈ 2%, measured
  as recall 0.0 on this corpus; 8×4-bit tables lift candidate recall
  to 1-(1-0.62⁴)⁸).  Search is an equi-join on (table, bucket) keys.

Both are fully deterministic, so the DuckDB oracle re-implements the
*same algorithm* and the match is exact — the approximation is part of
the declared semantics, not noise.  Ranking follows SURVEY §4.5 rule 4:
``ROUND(sim, 6)`` inside every ORDER BY, unique tiebreaker column.

At 100 TB: centroid/hyperplane tables are O(K) → broadcast joins; the
candidate join is an equi-join on cell/bucket id (shuffle-bounded);
AQE handles cell-size skew (hot cells split by skew-join handling).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions import cosine, dot
from ._oracle import inline_views

IVF_K = 8
IVF_NPROBE = 2
TOP_K = 5

LSH_TABLES = 8
LSH_BITS = 4
EMB_DIM = 64


def _hyperplanes() -> list[list[float]]:
    """±1 hyperplanes from md5 — deterministic, engine-independent.
    ``LSH_TABLES * LSH_BITS`` planes; table t owns planes
    [t*LSH_BITS, (t+1)*LSH_BITS)."""
    planes = []
    for p in range(LSH_TABLES * LSH_BITS):
        row = []
        for d in range(EMB_DIM):
            h = hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


HYPERPLANES = _hyperplanes()


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.v_emb(spark, sf_dir)


_COS6 = lambda a, b: F.round(cosine(a, b), 6)  # noqa: E731


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 cosine search: queries vec_id<10, candidates vec_id≥10."""
    emb = _emb(spark, sf_dir)
    cents = emb.where(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cemb")
    )
    # Assignment: each candidate to its nearest centroid (broadcast the
    # K-row centroid table — no shuffle of the big side).
    cand = emb.where(F.col("vec_id") >= 10)
    asg_sim = _COS6(F.col("emb"), F.col("cemb"))
    asg = (
        cand.join(F.broadcast(cents))
        .withColumn("csim", asg_sim)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("csim").desc(), F.col("cent_id")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cand_emb"), "cent_id")
    )
    # Probing: each query inspects its NPROBE nearest cells.
    qs = emb.where(F.col("vec_id") < 10)
    probes = (
        qs.join(F.broadcast(cents))
        .withColumn("csim", asg_sim)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("csim").desc(), F.col("cent_id")
                )
            ),
        )
        .where(F.col("rn") <= IVF_NPROBE)
        .select(F.col("vec_id").alias("qid"), F.col("emb").alias("q_emb"), "cent_id")
    )
    # Search inside probed cells only (equi-join on cent_id).
    sim = _COS6(F.col("q_emb"), F.col("cand_emb"))
    return (
        probes.join(asg, "cent_id")
        .withColumn("cos_sim", sim)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
            ),
        )
        .where(F.col("rn") <= TOP_K)
        .select("qid", "cid", "cos_sim")
    )


def _ivf_oracle() -> str:
    cos = (
        "ROUND(list_dot_product({a}, {b}) / "
        "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b}))), 6)"
    )
    return (
        f"WITH cents AS (SELECT vec_id AS cent_id, emb AS cemb FROM v_emb WHERE vec_id < {IVF_K}), "
        "asg AS (SELECT cid, cand_emb, cent_id FROM ("
        "SELECT c.vec_id AS cid, c.emb AS cand_emb, cents.cent_id, "
        "ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY "
        + cos.format(a="c.emb", b="cents.cemb")
        + " DESC, cents.cent_id) AS rn "
        "FROM v_emb c CROSS JOIN cents WHERE c.vec_id >= 10) t WHERE rn = 1), "
        "probes AS (SELECT qid, q_emb, cent_id FROM ("
        "SELECT q.vec_id AS qid, q.emb AS q_emb, cents.cent_id, "
        "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
        + cos.format(a="q.emb", b="cents.cemb")
        + " DESC, cents.cent_id) AS rn "
        f"FROM v_emb q CROSS JOIN cents WHERE q.vec_id < 10) t WHERE rn <= {IVF_NPROBE}) "
        "SELECT qid, cid, cos_sim FROM ("
        "SELECT probes.qid, asg.cid, "
        + cos.format(a="probes.q_emb", b="asg.cand_emb")
        + " AS cos_sim, "
        "ROW_NUMBER() OVER (PARTITION BY probes.qid ORDER BY "
        + cos.format(a="probes.q_emb", b="asg.cand_emb")
        + f" DESC, asg.cid) AS rn FROM probes JOIN asg ON probes.cent_id = asg.cent_id) t "
        f"WHERE rn <= {TOP_K}"
    )


def _table_keys() -> F.Column:
    """Array of per-table bucket keys ``"t:bits"`` for one vector."""
    keys = []
    for t in range(LSH_TABLES):
        bits = F.lit(0)
        for b in range(LSH_BITS):
            plane = HYPERPLANES[t * LSH_BITS + b]
            plane_arr = F.array(*[F.lit(v) for v in plane])
            bits = bits + (dot(F.col("emb"), plane_arr) > 0).cast("long") * (1 << b)
        keys.append(F.concat(F.lit(f"{t}:"), bits.cast("string")))
    return F.array(*keys)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH top-5 cosine search (same query/candidate split).

    Each vector explodes into one (table, bucket) key per hash table;
    candidate generation is an equi-join on the key, deduplicated to
    distinct (query, candidate) pairs before scoring.
    """
    emb = _emb(spark, sf_dir)
    bucketed = emb.select(
        "vec_id", "emb", F.explode(_table_keys()).alias("bucket")
    )
    qs = bucketed.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("q_emb"), "bucket"
    )
    cand = bucketed.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cand_emb"), "bucket"
    )
    pairs = (
        qs.join(cand, "bucket")
        .select("qid", "q_emb", "cid", "cand_emb")
        .distinct()  # a pair may collide in several tables
    )
    sim = _COS6(F.col("q_emb"), F.col("cand_emb"))
    return (
        pairs.withColumn("cos_sim", sim)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
            ),
        )
        .where(F.col("rn") <= TOP_K)
        .select("qid", "cid", "cos_sim")
    )


def _lsh_oracle() -> str:
    table_keys = []
    for t in range(LSH_TABLES):
        bit_terms = []
        for b in range(LSH_BITS):
            plane = HYPERPLANES[t * LSH_BITS + b]
            arr = "[" + ", ".join(f"{v:.1f}" for v in plane) + "]"
            bit_terms.append(
                f"(CASE WHEN list_dot_product(emb, {arr}) > 0 THEN {1 << b} ELSE 0 END)"
            )
        table_keys.append(f"concat('{t}:', CAST({' + '.join(bit_terms)} AS VARCHAR))")
    keys = ", ".join(table_keys)
    cos = (
        "ROUND(list_dot_product(q_emb, cand_emb) / "
        "(SQRT(list_dot_product(q_emb, q_emb)) * SQRT(list_dot_product(cand_emb, cand_emb))), 6)"
    )
    return (
        f"WITH bucketed AS (SELECT vec_id, emb, unnest([{keys}]) AS bucket FROM v_emb), "
        "qs AS (SELECT vec_id AS qid, emb AS q_emb, bucket FROM bucketed WHERE vec_id < 10), "
        "cand AS (SELECT vec_id AS cid, emb AS cand_emb, bucket FROM bucketed WHERE vec_id >= 10), "
        "pairs AS (SELECT DISTINCT qid, q_emb, cid, cand_emb FROM qs JOIN cand USING (bucket)) "
        "SELECT qid, cid, cos_sim FROM ("
        f"SELECT qid, cid, {cos} AS cos_sim, "
        f"ROW_NUMBER() OVER (PARTITION BY qid ORDER BY {cos} DESC, cid) AS rn "
        "FROM pairs) t "
        f"WHERE rn <= {TOP_K}"
    )


def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector scalar quantization of embeddings to uint8 codes —
    the storage-compression half of an IVF/PQ-style index (4 B float →
    1 B code = 4× smaller candidate payloads before the distance pass).

    Deterministic affine quantizer: ``code = floor((x - min) / scale)``
    with ``scale = (max - min)/255`` — pure IEEE-double arithmetic, so
    the DuckDB oracle reproduces it bit-exactly.  Narrow row output
    (bounds + code checksum + first code) keeps the driver compare on
    scalars per SURVEY §4.5 (doubles rounded to 6)."""
    emb = _emb(spark, sf_dir)
    mn = F.array_min("emb")
    mx = F.array_max("emb")
    scale = F.greatest((mx - mn) / F.lit(255.0), F.lit(1e-12))
    codes = F.transform(
        "emb", lambda x: F.least(F.lit(255), F.floor((x - mn) / scale)).cast("int")
    )
    return emb.select(
        "vec_id",
        F.round(mn, 6).alias("q_min"),
        F.round(mx, 6).alias("q_max"),
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, x: a + x).alias("code_sum"),
        F.element_at(codes, 1).alias("code0"),
    )


_QUANT_ORACLE = (
    "SELECT vec_id, ROUND(list_min(emb), 6) AS q_min, ROUND(list_max(emb), 6) AS q_max, "
    "CAST(list_sum(list_transform(emb, x -> CAST(LEAST(255, FLOOR((x - list_min(emb)) / "
    "GREATEST((list_max(emb) - list_min(emb)) / 255.0, 1e-12))) AS INT))) AS BIGINT) AS code_sum, "
    "CAST(LEAST(255, FLOOR((emb[1] - list_min(emb)) / "
    "GREATEST((list_max(emb) - list_min(emb)) / 255.0, 1e-12))) AS INT) AS code0 "
    "FROM v_emb"
)


QUERIES = {
    "ann_ivf_topk": ann_ivf_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "vec_quantize_int8": vec_quantize_int8,
}

ORACLES = {
    "ann_ivf_topk": inline_views(_ivf_oracle()),
    "ann_lsh_topk": inline_views(_lsh_oracle()),
    "vec_quantize_int8": inline_views(_QUANT_ORACLE),
}
