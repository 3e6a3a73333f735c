"""Approximate-nearest-neighbor search over the embedding column.

The exact brute-force baseline is the corpus query ``vec_knn`` (cross
join + cosine + windowed top-k).  These operators are the scale paths:

- ``ann_ivf_topk`` — IVF (inverted-file) search: a deterministic coarse
  quantizer (the first ``IVF_K`` vectors by ``vec_id`` act as seed
  centroids), candidates assigned to their nearest centroid cell,
  queries probe their ``IVF_NPROBE`` nearest cells only.  The expensive
  distance computation runs on |cell| × nprobe candidates instead of N.
- ``ann_lsh_topk`` — sign-random-projection LSH: 8 fixed ±1 hyperplanes
  (deterministically generated from md5, embedded as literals) bucket
  each vector by the sign pattern of its projections; search is an
  equi-join on bucket id.

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

LSH_PLANES = 8
EMB_DIM = 64


def _hyperplanes() -> list[list[float]]:
    """±1 hyperplanes from md5 — deterministic, engine-independent."""
    planes = []
    for p in range(LSH_PLANES):
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


def _bucket_col() -> F.Column:
    """LSH bucket id: bit b = sign(dot(emb, hyperplane_b))."""
    bit_terms = []
    for b, plane in enumerate(HYPERPLANES):
        plane_arr = F.array(*[F.lit(v) for v in plane])
        bit = (dot(F.col("emb"), plane_arr) > 0).cast("long")
        bit_terms.append(bit * (1 << b))
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-5 cosine search (same query/candidate split).

    Candidate generation is an equi-join on the 8-bit bucket id; a
    query only scores candidates whose sign pattern matches its own.
    """
    emb = _emb(spark, sf_dir)
    bucketed = emb.withColumn("bucket", _bucket_col())
    qs = bucketed.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("q_emb"), "bucket"
    )
    cand = bucketed.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("emb").alias("cand_emb"), "bucket"
    )
    sim = _COS6(F.col("q_emb"), F.col("cand_emb"))
    return (
        qs.join(cand, "bucket")
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


def _lsh_oracle() -> str:
    terms = []
    for b, plane in enumerate(HYPERPLANES):
        arr = "[" + ", ".join(f"{v:.1f}" for v in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(emb, {arr}) > 0 THEN {1 << b} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    cos = (
        "ROUND(list_dot_product(q_emb, cand_emb) / "
        "(SQRT(list_dot_product(q_emb, q_emb)) * SQRT(list_dot_product(cand_emb, cand_emb))), 6)"
    )
    return (
        f"WITH bucketed AS (SELECT vec_id, emb, {bucket} AS bucket FROM v_emb), "
        "qs AS (SELECT vec_id AS qid, emb AS q_emb, bucket FROM bucketed WHERE vec_id < 10), "
        "cand AS (SELECT vec_id AS cid, emb AS cand_emb, bucket FROM bucketed WHERE vec_id >= 10) "
        "SELECT qid, cid, cos_sim FROM ("
        f"SELECT qid, cid, {cos} AS cos_sim, "
        f"ROW_NUMBER() OVER (PARTITION BY qid ORDER BY {cos} DESC, cid) AS rn "
        "FROM qs JOIN cand ON qs.bucket = cand.bucket) t "
        f"WHERE rn <= {TOP_K}"
    )


QUERIES = {
    "ann_ivf_topk": ann_ivf_topk,
    "ann_lsh_topk": ann_lsh_topk,
}

ORACLES = {
    "ann_ivf_topk": inline_views(_ivf_oracle()),
    "ann_lsh_topk": inline_views(_lsh_oracle()),
}
