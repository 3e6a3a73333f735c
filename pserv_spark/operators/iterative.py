"""Iterative distributed algorithms (driver-coordinated fixpoint loops).

`dedup.dedup_cluster_cc` established the shape: per-iteration work is a
shuffle-bounded DataFrame plan, the driver holds only O(small) loop
state, and the DuckDB oracle re-derives the same fixpoint independently.
Two more members:

- ``cluster_kmeans_lloyd`` — distributed Lloyd's k-means over the
  embedding table (k=4, 2 iterations, deterministic lowest-vec_id
  init).  This is the *training* step behind ``similarity.ann_ivf_topk``
  (which quantizes queries against fixed centroids): each iteration is
  one broadcast of k·d centroid doubles + one scan (assign via
  broadcast cross-join + per-vector top-1) + one agg (per-dimension
  averages) — no shuffle ever carries the vectors themselves beyond
  the one groupBy(cid).  Centroid coordinates are ROUNDed to 6 dp
  between iterations on BOTH engines, which quantizes away
  partial-aggregation-order float noise and keeps the oracle exact
  (SURVEY §4.5 rules 2/4/5); assignment ties break on
  ``(round(dist², 6), cid)``, a total order.
- ``graph_triangle_count`` — triangle counting over the near-dup pair
  graph (the classic two-join MapReduce formulation on the d1<d2
  oriented edge list).  Counting triangles distinguishes genuine
  mutual-duplicate clusters from chains the pair-join alone can't
  tell apart.  Emits a single global-count row.

At 100 TB: k-means assignment is embarrassingly parallel (centroids
broadcast), the centroid update is a map-side-combinable average; the
driver round-trip per iteration carries k·d doubles.  Triangle counting
shuffles the edge list twice on its join keys — the standard bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..catalog import load_tables
from ._oracle import inline_views
from .dedup import _NGRAM_ORACLE, dedup_ngram_jaccard

_K = 4
_ITERS = 2
_DIM = 64

_DIST2 = (
    "aggregate(zip_with(emb, cvec, (x, y) -> (x - y) * (x - y)), "
    "0D, (a, b) -> a + b)"
)


def _assign(emb: DataFrame, cdf: DataFrame) -> DataFrame:
    """Nearest-centroid assignment with a total tie order."""
    scored = emb.crossJoin(F.broadcast(cdf)).withColumn("dist2", F.expr(_DIST2))
    w = Window.partitionBy("vec_id").orderBy(F.round("dist2", 6), "cid")
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)


def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.v_emb(spark, sf_dir).select("vec_id", "emb")
    init = emb.orderBy("vec_id").limit(_K).collect()
    cents = [(i + 1, list(r.emb)) for i, r in enumerate(init)]
    schema = "cid int, cvec array<double>"
    avgs = [
        F.round(F.avg(F.element_at("emb", i + 1)), 6).alias(f"c{i}")
        for i in range(_DIM)
    ]
    for _ in range(_ITERS):
        assigned = _assign(emb, spark.createDataFrame(cents, schema))
        rows = assigned.groupBy("cid").agg(*avgs).collect()
        cents = sorted((r["cid"], [r[f"c{i}"] for i in range(_DIM)]) for r in rows)
    final = _assign(emb, spark.createDataFrame(cents, schema))
    return final.select(
        "vec_id",
        F.col("cid").alias("cluster"),
        F.round("dist2", 6).alias("d2"),
    )


def _duck_dist2(e: str, c: str) -> str:
    """Sequential left fold — the same +/× order Spark's aggregate()
    runs, so both engines produce the identical IEEE result."""
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {_DIM}), "
        f"i -> ({e}.emb[i] - {c}.cvec[i]) * ({e}.emb[i] - {c}.cvec[i]))), "
        "(a, b) -> a + b)"
    )


def _duck_assign(name: str, cn: str) -> str:
    return (
        f"{name} AS (SELECT vec_id, cid, d2 FROM ("
        "SELECT vec_id, cid, d2, ROW_NUMBER() OVER (PARTITION BY vec_id "
        "ORDER BY ROUND(d2, 6), cid) AS rn FROM ("
        f"SELECT e.vec_id, c.cid, {_duck_dist2('e', 'c')} AS d2 "
        f"FROM v_emb e CROSS JOIN {cn} c) s) t WHERE rn = 1)"
    )


def _duck_update(name: str, an: str) -> str:
    return (
        f"{name} AS (SELECT cid, list(v ORDER BY i) AS cvec FROM ("
        f"SELECT a.cid, g.i AS i, ROUND(AVG(e.emb[g.i]), 6) AS v "
        f"FROM {an} a JOIN v_emb e USING (vec_id), "
        f"generate_series(1, {_DIM}) g(i) "
        "GROUP BY a.cid, g.i) s GROUP BY cid)"
    )


def _kmeans_oracle() -> str:
    ctes = [
        "c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid, "
        f"emb AS cvec FROM (SELECT vec_id, emb FROM v_emb ORDER BY vec_id LIMIT {_K}) q)"
    ]
    for it in range(_ITERS):
        ctes.append(_duck_assign(f"a{it}", f"c{it}"))
        ctes.append(_duck_update(f"c{it + 1}", f"a{it}"))
    ctes.append(_duck_assign("afinal", f"c{_ITERS}"))
    return inline_views(
        "WITH "
        + ", ".join(ctes)
        + " SELECT vec_id, cid AS cluster, ROUND(d2, 6) AS d2 FROM afinal"
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir).select("d1", "d2").localCheckpoint()
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = e1.join(e2, F.col("e1.d2") == F.col("e2.d1")).join(
        e3,
        (F.col("e3.d1") == F.col("e1.d1")) & (F.col("e3.d2") == F.col("e2.d2")),
    )
    return tri.agg(F.count("*").cast("long").alias("n_triangles"))


_TRIANGLE_ORACLE = (
    "WITH pairs AS MATERIALIZED (SELECT d1, d2 FROM (" + _NGRAM_ORACLE + ")) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
    "FROM pairs e1 JOIN pairs e2 ON e1.d2 = e2.d1 "
    "JOIN pairs e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2"
)


_PR_DAMP = 0.85
_PR_ITERS = 3


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank (3 synchronous iterations, d=0.85) over the
    undirected part↔supplier co-purchase graph from ``lineitem``.

    Each node is 'p<partkey>' or 's<suppkey>'; every distinct
    (part, supplier) line item contributes both edge directions, so no
    node dangles.  One iteration = one equi-join of the rank vector
    against the static edge list + one aggregation — the textbook
    Pregel step as pure DataFrame ops, lazily composed (no driver-side
    state at all; contrast ``cluster_kmeans_lloyd``, which must round-
    trip k·d centroids).  The edge list and degree table are computed
    once and reused across iterations.

    Determinism (SURVEY §4.5 + the kmeans precedent): per-edge
    contributions are ROUNDed at 15 dp then summed as DECIMAL(20,15)
    (exact, order-independent); each new rank is re-quantized at
    10 dp on both engines, so float noise can never accumulate across
    iterations.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    pk = F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
    sk = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    half = li.select(pk.alias("src"), sk.alias("dst")).distinct()
    edges = half.unionAll(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.localCheckpoint()  # reused every iteration; cut lineage
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    n_nodes = deg.count()  # driver scalar; every node appears as src
    base = 0.15 / float(n_nodes)

    rank = deg.select("src", F.lit(1.0 / float(n_nodes)).alias("rank"))
    contrib_sum = F.sum(
        F.round(F.col("rank") / F.col("outdeg"), 15).cast("decimal(20,15)")
    )
    for _ in range(_PR_ITERS):
        contribs = edges.join(rank, "src").join(deg, "src")
        rank = contribs.groupBy(F.col("dst").alias("src")).agg(
            F.round(
                F.lit(base) + F.lit(_PR_DAMP) * contrib_sum.cast("double"),
                10,
            ).alias("rank")
        )
    return rank.select(F.col("src").alias("node"), "rank")


def _pagerank_oracle() -> str:
    prelude = (
        "WITH half AS (SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src, "
        "'s' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem), "
        "edges AS (SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half), "
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg), "
        "r0 AS (SELECT src, 1.0 / (SELECT CAST(n AS DOUBLE) FROM n) AS rank FROM deg)"
    )
    step = (
        ", r{next} AS (SELECT e.dst AS src, "
        "ROUND(0.15 / (SELECT CAST(n AS DOUBLE) FROM n) + "
        f"{_PR_DAMP} * CAST(SUM(CAST(ROUND(r.rank / d.outdeg, 15) AS DECIMAL(20,15))) AS DOUBLE), 10) AS rank "
        "FROM edges e JOIN r{cur} r ON e.src = r.src JOIN deg d ON d.src = e.src "
        "GROUP BY e.dst)"
    )
    sql = prelude
    for it in range(_PR_ITERS):
        sql += step.format(cur=it, next=it + 1)
    return sql + f" SELECT src AS node, rank FROM r{_PR_ITERS}"


QUERIES = {
    "cluster_kmeans_lloyd": cluster_kmeans_lloyd,
    "graph_triangle_count": graph_triangle_count,
    "graph_pagerank": graph_pagerank,
}

ORACLES = {
    "cluster_kmeans_lloyd": _kmeans_oracle(),
    "graph_triangle_count": _TRIANGLE_ORACLE,
    "graph_pagerank": _pagerank_oracle(),
}
