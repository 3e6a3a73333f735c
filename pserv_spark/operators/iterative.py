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
    """Round-10 (VERDICT r9 #7, guide §5 "the driver should do almost
    no data work"): the Lloyd loop is composed LAZILY — the centroid
    relation of each iteration is the k-row aggregate of the previous
    assignment, broadcast in-plan — instead of collect()ing k·d
    centroids to the driver and re-literalizing them per iteration.
    One action now runs the whole fixpoint as a single job graph
    (the old form paid 1 + _ITERS driver round-trips per invocation,
    and every consumer — dedup_semantic_clustered, ml_silhouette_eval
    — paid them again at operator-construction time).

    Results are identical: the per-iteration centroid is the same
    ROUND(AVG(·), 6) aggregate (the 6-dp quantization that absorbs
    partial-aggregation float noise absorbs it equally in-plan), and
    the collected path re-entered those exact doubles as literals —
    computing downstream of them in-plan consumes the same values.
    Init keeps the deterministic lowest-vec_id seeding (row_number
    over the 4-row TakeOrdered result — limit-bounded, not a global
    window hazard)."""
    emb = catalog.v_emb(spark, sf_dir).select("vec_id", "emb")
    cents = (
        emb.orderBy("vec_id")
        .limit(_K)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).cast("int").alias("cid"),
            F.col("emb").alias("cvec"),
        )
    )
    avgs = [
        F.round(F.avg(F.element_at("emb", i + 1)), 6).alias(f"c{i}")
        for i in range(_DIM)
    ]
    for _ in range(_ITERS):
        assigned = _assign(emb, cents)
        cents = (
            assigned.groupBy("cid")
            .agg(*avgs)
            .select(
                "cid",
                F.array(*[F.col(f"c{i}") for i in range(_DIM)]).alias("cvec"),
            )
        )
    final = _assign(emb, cents)
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
    # Round-10 (guide §2.3 "narrower types"): nodes travel as LONGs —
    # part p ↦ 2p (even), supplier s ↦ 2s+1 (odd) — through the
    # distinct, the checkpointed edge list, and every per-iteration
    # join/aggregation; the 'p<k>'/'s<k>' STRING label is formatted
    # once on the final node-sized output.  The encoding is a
    # bijection onto the same node set, so degrees, n_nodes, every
    # ROUND(rank/outdeg, 15) decimal addend and hence every rank are
    # bit-identical — only the shuffle key width changes (8-byte long
    # vs variable-width string), on the relation that grows with data.
    pk = (F.col("l_partkey") * 2).alias("src")
    sk = (F.col("l_suppkey") * 2 + 1).alias("dst")
    half = li.select(pk, sk).distinct()
    edges = half.unionAll(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.localCheckpoint()  # reused every iteration; cut lineage
    # The degree table is consumed once per iteration (the msgs join)
    # plus the seed rank — checkpoint it too (node-sized) so each
    # consumer reads the materialized relation instead of re-running
    # the groupBy over the edge list (r9; the count() below was
    # already paying the first materialization).
    deg = edges.groupBy("src").agg(
        F.count("*").cast("long").alias("outdeg")
    ).localCheckpoint()
    n_nodes = deg.count()  # driver scalar; every node appears as src
    if n_nodes == 0:
        # pruned-to-empty edge list: no nodes, no ranks (the oracle's
        # final CTE joins against the same empty edge list)
        return spark.createDataFrame([], "node string, rank double")
    base = 0.15 / float(n_nodes)

    rank = deg.select("src", F.lit(1.0 / float(n_nodes)).alias("rank"))
    # Round-9 optimization (guide §2.3: shuffle fewer bytes / §3): the
    # per-edge message rank/outdeg is precomputed on the NODE-sized
    # relation (rank ⋈ deg — runtime-broadcastable by AQE), so each
    # iteration joins the edge list ONCE instead of twice.
    #
    # Round-10 (measured: the DECIMAL(20,15) sum was ~40% of the
    # operator — 9.7 s vs 5.8 s same-session A/B at sf0.1): the
    # per-edge message travels as a LONG count of 1e-15 units and the
    # edge-sized aggregation is a plain long sum.  Exactness chain:
    # (a) msgq recovers the integer k with ROUND(msg·1e15) — the
    #     double msg is within 0.5 ulp of k·1e-15, so msg·1e15 is
    #     within k·2.2e-16 ≤ 0.22 of k (k ≤ 1e15), and HALF_UP lands
    #     on k exactly — the same integer the decimal cast carried;
    # (b) the LONG sum cannot overflow at ANY corpus scale: each dst
    #     receives at most one message per distinct src, so
    #     Σ msgq ≤ Σ_src rank(src)·1e15 ≈ 1e15 ≪ 2^63 (the bound is
    #     the total rank mass, not the in-degree);
    # (c) SUM(msgq)/1e15 in doubles equals CAST(decimal-sum AS DOUBLE)
    #     bit-for-bit: both are the correctly-rounded nearest double
    #     of the exact rational K·10⁻¹⁵ (K ≤ 1e15 is double-exact and
    #     1e15 is a power-of-10 integer below 2^53, so the one IEEE
    #     division is exact-operand, correctly rounded).
    # Every rank is therefore bit-identical to the decimal form; the
    # DuckDB oracle keeps the decimal formulation as an independent
    # derivation.
    for _ in range(_PR_ITERS):
        msgs = (
            rank.join(deg, "src")
            .select(
                "src",
                F.round(
                    F.round(F.col("rank") / F.col("outdeg"), 15) * F.lit(1e15)
                )
                .cast("long")
                .alias("msgq"),
            )
        )
        rank = (
            edges.join(msgs, "src")
            .groupBy(F.col("dst").alias("src"))
            .agg(
                F.round(
                    F.lit(base)
                    + F.lit(_PR_DAMP)
                    * (F.sum("msgq").cast("double") / F.lit(1e15)),
                    10,
                ).alias("rank")
            )
        )
    node = F.when(
        F.col("src") % 2 == 0,
        F.concat(F.lit("p"), F.expr("CAST(src DIV 2 AS STRING)")),
    ).otherwise(
        F.concat(F.lit("s"), F.expr("CAST((src - 1) DIV 2 AS STRING)"))
    )
    return rank.select(node.alias("node"), "rank")


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


_PCA_ITERS = 3


def _pca_sql(dims_clause: str, elem: str) -> str:
    """Top-principal-component power iteration, fully in SQL CTEs (no
    driver state — the pagerank pattern, not the kmeans one).

    Stage 1 builds the mean-centered Gram matrix M = Σ (x−μ)(x−μ)ᵀ:
    a per-vector (i, j) fan-out with map-side partial aggregation —
    4096 groups regardless of row count, so at 100 TB the shuffle
    carries only dim² partials.  Stage 2 runs ``_PCA_ITERS`` synchronous
    power steps on the 4096-row M relation (metadata-sized joins).

    Determinism: μ is ROUNDed at 6 dp (kmeans precedent); every
    cross-row/cross-term SUM is floor-quantized to integer units first
    (Stetson/DFT pattern), so M, each matvec, and each norm are exact
    BIGINTs; per-step loadings are re-quantized via ROUND(·, 9).  The
    eigenvector sign is pinned by the deterministic v₀ = 1/8 ⋅ 𝟙.
    """
    ctes = [
        f"dims AS ({dims_clause})",
        f"x AS (SELECT vec_id, i, {elem} AS xi FROM v_emb CROSS JOIN dims)",
        # Exact-integer mean: a ROUND(AVG(double),6) mean is NOT safe
        # here — with 64 dims one average landing within an ulp of a
        # 6-dp boundary flips μ between engines (observed at sf0.01);
        # the quantized SUM/COUNT quotient is deterministic.
        "mu AS (SELECT i,"
        " CAST(SUM(CAST(FLOOR(xi * 1000000.0) AS BIGINT)) AS BIGINT) AS sq,"
        " CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY i)",
        # CAST to DOUBLE before every division: a bare BIGINT /
        # 1000000.0 literal is DECIMAL division in Spark (the literal
        # parses as DECIMAL) with engine-specific rounding — observed
        # to flip the sf0.001 result while sf0.01/0.1 happened to agree.
        "cx AS (SELECT vec_id, x.i,"
        " xi - CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS c"
        " FROM x JOIN mu ON x.i = mu.i)",
        "m AS (SELECT a.i, b.i AS j,"
        " CAST(SUM(CAST(FLOOR(a.c * b.c * 1000000.0) AS BIGINT)) AS BIGINT) AS mq"
        " FROM cx a JOIN cx b ON a.vec_id = b.vec_id GROUP BY a.i, b.i)",
        # v₀ = 1/8 ⋅ 𝟙 at integer 1e6 scale.  The matvec is pure
        # BIGINT (mq·vq — no float constants an optimizer could fold
        # differently: mixed x/c1*col*c1 forms diverged by 1 in FLOOR
        # between engines before this).  Scales: mq 1e6 · vq 1e6 ⇒ wq
        # 1e12; safe to ~10⁵ vectors — rescale the quanta with N beyond.
        "v0 AS (SELECT i, CAST(125000 AS BIGINT) AS vq FROM dims)",
    ]
    for k in range(1, _PCA_ITERS + 1):
        ctes.append(
            f"w{k} AS (SELECT m.i, CAST(SUM(m.mq * v.vq) AS BIGINT) AS wq"
            f" FROM m JOIN v{k - 1} v ON m.j = v.i GROUP BY m.i)"
        )
        ctes.append(
            f"n{k} AS (SELECT CAST(SUM(CAST(FLOOR((CAST(wq AS DOUBLE) / 1000000000000.0)"
            " * (CAST(wq AS DOUBLE) / 1000000000000.0) * 1000.0) AS BIGINT)) AS BIGINT) AS n2q"
            f" FROM w{k})"
        )
        # FLOOR-quantize back to 1e6-scale integers, never ROUND
        # (§4.5 rule 2); sqrt is IEEE-correctly-rounded in both engines.
        ctes.append(
            f"v{k} AS (SELECT i, CAST(FLOOR(CAST(wq AS DOUBLE) / 1000000000000.0"
            f" / sqrt(CAST(n2q AS DOUBLE) / 1000.0) * 1000000.0) AS BIGINT) AS vq"
            f" FROM w{k} CROSS JOIN n{k})"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT i AS dim_idx, CAST(vq AS DOUBLE) / 1000000.0 AS loading,"
        f" CAST(CAST(FLOOR(sqrt(CAST(n2q AS DOUBLE) / 1000.0) * 1000000.0) AS BIGINT) AS DOUBLE)"
        " / 1000000.0 AS lambda1"
        f" FROM v{_PCA_ITERS} CROSS JOIN n{_PCA_ITERS}"
    )


def vec_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-PC extraction (mean-centered Gram + 3 power
    steps) over the embedding table."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _pca_sql(
            f"SELECT explode(sequence(1, {_DIM})) AS i",
            "element_at(emb, i)",
        )
    )


def _pca_oracle() -> str:
    return inline_views(
        _pca_sql(
            f"SELECT unnest(generate_series(1, {_DIM})) AS i",
            "emb[i]",
        )
    )


_BFS_ITERS = 3
_BFS_SEED = "p1"


def _bfs_sql(vchar: str) -> str:
    """Synchronous-frontier BFS distances (≤ _BFS_ITERS hops) from a
    seed node over the part↔supplier co-purchase graph — the Pregel
    shortest-path step as pure relational algebra, all-integer (no
    float determinism concerns at all).  Each iteration is one
    equi-join of the current distance relation against the static edge
    list + one MIN aggregation; the edge list is the same one
    ``graph_pagerank`` uses.
    """
    ctes = [
        f"half AS (SELECT DISTINCT 'p' || CAST(l_partkey AS {vchar}) AS src,"
        f" 's' || CAST(l_suppkey AS {vchar}) AS dst FROM lineitem)",
        "edges AS (SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half)",
        f"d0 AS (SELECT '{_BFS_SEED}' AS node, 0 AS dist)",
    ]
    for k in range(1, _BFS_ITERS + 1):
        ctes.append(
            f"d{k} AS (SELECT node, CAST(MIN(dist) AS INT) AS dist FROM ("
            f"SELECT node, dist FROM d{k - 1}"
            " UNION ALL"
            f" SELECT e.dst AS node, d.dist + 1 AS dist"
            f" FROM edges e JOIN d{k - 1} d ON e.src = d.node"
            ") u GROUP BY node)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, dist FROM d{_BFS_ITERS}"
    )


def graph_bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances (≤3) from part node 'p1'."""
    load_tables(spark, sf_dir)
    return spark.sql(_bfs_sql("STRING"))


_KC_K = 8


def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 2-approx
    farthest-point traversal) over the embedding table — the diverse-
    subset selection step of a training-data pipeline (pick k points
    maximally spread out; every point is within the selection radius
    of some pick).

    Per iteration: ONE scan computing each vector's distance to the
    (broadcast) selected set, then a TakeOrdered(1) argmax under the
    total order (round(d², 6) DESC, vec_id) — the kmeans determinism
    discipline.  Driver state is k rows.  Returns the k picks with
    their selection distance (the coreset radius sequence, which is
    non-increasing — asserted in tests).
    """
    emb = catalog.v_emb(spark, sf_dir).select("vec_id", "emb")
    head = emb.orderBy("vec_id").limit(1).collect()
    if not head:
        # pruned-to-empty vector table: no seed point, empty coreset
        # (the oracle's p0 CTE is empty, so every pk is too)
        return spark.createDataFrame([], "step int, vec_id bigint, sel_d2 double")
    first = head[0]
    picks = [(0, int(first.vec_id), list(first.emb), 0.0)]
    schema = "cid int, cvec array<double>"
    for step in range(1, _KC_K):
        cdf = spark.createDataFrame(
            [(p[0], p[2]) for p in picks], schema
        )
        dmin = (
            emb.crossJoin(F.broadcast(cdf))
            .withColumn("d2", F.round(F.expr(_DIST2), 6))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("dmin"))
        )
        far = (
            dmin.join(emb, "vec_id")
            .orderBy(F.col("dmin").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        picks.append((step, int(far.vec_id), list(far.emb), float(far.dmin)))
    return spark.createDataFrame(
        [(s, v, d) for s, v, _, d in picks],
        "step int, vec_id bigint, sel_d2 double",
    )


def _kcenter_oracle() -> str:
    """Unrolled greedy traversal; the fold in ``_duck_dist2`` mirrors
    Spark's aggregate() order exactly (kmeans precedent)."""
    d2 = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {_DIM}), "
        "i -> (e.emb[i] - s.emb[i]) * (e.emb[i] - s.emb[i]))), "
        "(a, b) -> a + b)"
    )
    ctes = [
        "p0 AS (SELECT 0 AS step, vec_id, emb, 0.0 AS sel_d2"
        " FROM v_emb ORDER BY vec_id LIMIT 1)"
    ]
    for k in range(1, _KC_K):
        prev = " UNION ALL ".join(f"SELECT * FROM p{j}" for j in range(k))
        ctes.append(
            f"p{k} AS (SELECT {k} AS step, e.vec_id, e.emb, dmin AS sel_d2 FROM ("
            f"SELECT e.vec_id, MIN(ROUND({d2}, 6)) AS dmin"
            f" FROM v_emb e CROSS JOIN ({prev}) s GROUP BY e.vec_id) q"
            " JOIN v_emb e ON q.vec_id = e.vec_id"
            " ORDER BY dmin DESC, e.vec_id LIMIT 1)"
        )
    allp = " UNION ALL ".join(f"SELECT * FROM p{j}" for j in range(_KC_K))
    return inline_views(
        "WITH " + ", ".join(ctes)
        + f" SELECT step, vec_id, sel_d2 FROM ({allp}) f"
    )


def _linkpred_sql() -> str:
    """Common-neighbors / Jaccard link prediction on the bipartite
    part↔supplier graph: part pairs never directly connected but
    sharing suppliers are candidate 'future edges' (the classic
    Liben-Nowell & Kleinberg scores).

    Shape: one self-join of the (supplier → part) adjacency on the
    supplier key — pair fan-out is Σ_s deg(s)², the standard bound —
    then a keyed count and a broadcast-sized degree join.  The part
    universe is capped (l_partkey < 300) the way a production run
    would shard the candidate space.  cn and degrees are exact
    integers; Jaccard is one exact-operand division (unrounded,
    §4.5 rule 2)."""
    return (
        "WITH adj AS ("
        "  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem"
        "  WHERE l_partkey < 300"
        "), deg AS ("
        "  SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY p"
        "), pairs AS ("
        "  SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS cn"
        "  FROM adj a JOIN adj b ON a.s = b.s AND a.p < b.p"
        "  GROUP BY a.p, b.p"
        ") SELECT p1, p2, cn,"
        "    CAST(cn AS DOUBLE) / (d1.d + d2.d - cn) AS jaccard"
        "  FROM pairs JOIN deg d1 ON pairs.p1 = d1.p"
        "  JOIN deg d2 ON pairs.p2 = d2.p"
        "  WHERE cn >= 2"
    )


def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor + Jaccard link-prediction scores for part
    pairs sharing ≥2 suppliers."""
    load_tables(spark, sf_dir)
    return spark.sql(_linkpred_sql())


SEMDEDUP_TAU = 0.3


def dedup_semantic_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    embeddings first (k-means — reused from ``cluster_kmeans_lloyd``),
    then mine near-duplicate pairs ONLY within clusters and drop the
    higher-id member of each qualifying pair.

    The clustering is the scale move: the quadratic pair search runs
    on N²/k cluster-local blocks instead of the full N² (and a real
    run shards each cluster further).  Output: one row per dropped
    vector with its cluster, duplicate-pair count, and max similarity.
    Cosines are ROUND(·, 6) (the validated ``dedup_embedding_cosine``
    equivalence); the oracle replays the full pipeline including the
    unrolled k-means fixpoint.
    """
    # The assignment feeds BOTH sides of the pair self-join below;
    # since round 10 the Lloyd loop is a lazy plan (no driver
    # round-trips), so without materialization the whole k-means chain
    # would execute twice inside this operator's single action
    # (measured: 14.8 s vs 4.4 s at sf0.1).  localCheckpoint = the
    # eager-build contract (encode_sets/edges precedent) — node-sized
    # (vec_id, cluster) rows, recomputed from parquet per invocation.
    clusters = (
        cluster_kmeans_lloyd(spark, sf_dir)
        .select("vec_id", "cluster")
        .localCheckpoint()
    )
    # Round-9 optimization (guide §1.2 "per-task work"): the L2 norm is
    # hoisted out of the pair loop — computed once per VECTOR before
    # the cluster self-join instead of once per PAIR on both sides
    # (each pair evaluated three 64-element folds; now it is one fold
    # per pair plus one per vector).  sqrt-before-join is the same IEEE
    # operation on the same value, so every cos6 is bit-identical.
    nrm = F.sqrt(
        F.expr("aggregate(zip_with(emb, emb, (x, y) -> x * y), 0D, (a, b) -> a + b)")
    )
    emb = (
        catalog.v_emb(spark, sf_dir)
        .select("vec_id", "emb", nrm.alias("nrm"))
        .join(clusters, "vec_id")
    )
    a = emb.select(
        F.col("cluster"),
        F.col("vec_id").alias("id1"),
        F.col("emb").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    b = emb.select(
        F.col("cluster"),
        F.col("vec_id").alias("id2"),
        F.col("emb").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    # Round-10 measured NEGATIVE result (kept deliberately, the r9
    # ann_lsh discipline): switching this dot to the unrolled 64-term
    # element_at chain — the functions/vector.py rule for pair sites —
    # took the operator 3.3 s → 10.9 s at sf0.1 (same-session A/B,
    # fold vs unrolled, both with the checkpointed assignment).  The
    # rule's winning precedent was a BroadcastNestedLoopJoin CONDITION
    # (interpreted per pair, no codegen); here the cosine is a
    # post-equi-join projection/filter where the 64-term tree bloats
    # the generated stage instead of replacing interpretation.  The
    # fold stays.
    cos = F.round(
        F.expr(
            "aggregate(zip_with(e1, e2, (x, y) -> x * y), 0D, (a, b) -> a + b)"
        )
        / (F.col("n1") * F.col("n2")),
        6,
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("id1") < F.col("id2"))
        .withColumn("cos6", cos)
        .where(F.col("cos6") >= SEMDEDUP_TAU)
    )
    return pairs.groupBy("cluster", F.col("id2").alias("dropped_id")).agg(
        F.count("*").cast("long").alias("n_dup_pairs"),
        F.max("cos6").alias("max_cos"),
    )


def _semdedup_oracle() -> str:
    cos = (
        "ROUND(list_dot_product(a.emb, b.emb) / "
        "(SQRT(list_dot_product(a.emb, a.emb)) * "
        "SQRT(list_dot_product(b.emb, b.emb))), 6)"
    )
    kmeans = _kmeans_oracle()  # already inline_views-wrapped
    # reuse its full CTE chain (incl. the v_emb prelude); afinal holds
    # (vec_id, cid) — swap the final SELECT for the pair mining.
    body = kmeans[: kmeans.rindex(" SELECT vec_id")]
    return (
        body
        + ", pairs AS (SELECT fa.cid AS cluster, a.vec_id AS id1, b.vec_id AS id2, "
        + cos
        + " AS cos6 FROM afinal fa JOIN afinal fb ON fa.cid = fb.cid"
        " AND fa.vec_id < fb.vec_id"
        " JOIN v_emb a ON a.vec_id = fa.vec_id"
        " JOIN v_emb b ON b.vec_id = fb.vec_id"
        f" WHERE {cos} >= {SEMDEDUP_TAU})"
        " SELECT cluster, id2 AS dropped_id,"
        " CAST(COUNT(*) AS BIGINT) AS n_dup_pairs, MAX(cos6) AS max_cos"
        " FROM pairs GROUP BY cluster, id2"
    )


def _degree_dist_sql(vchar: str) -> str:
    """Degree distribution of the part↔supplier graph in log₂ bins —
    the first profiling pass on any production graph (skew tells you
    whether PageRank/CC need salting).  Two keyed aggregations, all
    integers."""
    return (
        f"WITH half AS (SELECT DISTINCT 'p' || CAST(l_partkey AS {vchar}) AS src,"
        f" 's' || CAST(l_suppkey AS {vchar}) AS dst FROM lineitem),"
        " edges AS (SELECT src, dst FROM half UNION ALL SELECT dst, src FROM half),"
        " deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src)"
        " SELECT CAST(FLOOR(ln(CAST(d AS DOUBLE)) / ln(2.0)) AS BIGINT) AS log2_bin,"
        "  CAST(COUNT(*) AS BIGINT) AS n_nodes,"
        "  CAST(MIN(d) AS BIGINT) AS min_deg,"
        "  CAST(MAX(d) AS BIGINT) AS max_deg"
        " FROM deg GROUP BY 1"
    )


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-binned degree histogram of the co-purchase graph."""
    load_tables(spark, sf_dir)
    return spark.sql(_degree_dist_sql("STRING"))



_SIL_N = 200  # eval slice — the quadratic part is the measurement


def ml_silhouette_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette score of the k-means clustering — the clustering-
    quality eval completing the measurement triad (ANN recall, LSH
    dedup precision/recall, cluster cohesion/separation): per point,
    s = (b − a) / max(a, b) with a = mean distance to own cluster and
    b = the nearest other cluster's mean distance; reported per
    cluster.

    Determinism: per-pair Euclidean distances are identical doubles in
    both engines (sequential-fold dot, IEEE-exact sqrt), then
    FLOOR-quantized to 1e-6 units so every mean is an exact integer
    quotient; per-point s is likewise quantized before the cluster
    mean (§4.5).  Quadratic on a bounded sample BY DESIGN — offline
    eval, while the assignments come from the deployed operator.
    """
    # Same consumer-side materialization as dedup_semantic_clustered:
    # pts (= emb ⋈ asg) feeds both sides of the pairwise cross join, so
    # the lazy k-means chain would otherwise run twice in one action.
    asg = (
        cluster_kmeans_lloyd(spark, sf_dir)
        .select("vec_id", "cluster")
        .localCheckpoint()
    )
    emb = catalog.v_emb(spark, sf_dir).where(F.col("vec_id") < _SIL_N)
    pts = emb.join(asg, "vec_id").select("vec_id", "emb", "cluster")
    i = pts.select(
        F.col("vec_id").alias("i"), F.col("emb").alias("iv"),
        F.col("cluster").alias("ic"),
    )
    j = pts.select(
        F.col("vec_id").alias("j"), F.col("emb").alias("jv"),
        F.col("cluster").alias("jc"),
    )
    diff = F.zip_with("iv", "jv", lambda a, b: (a - b) * (a - b))
    dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))
    pair = (
        i.crossJoin(j)
        .where(F.col("i") != F.col("j"))
        .select(
            "i", "ic", "jc",
            F.floor(dist * 1_000_000).cast("long").alias("d_q6"),
        )
    )
    per_grp = pair.groupBy("i", "ic", "jc").agg(
        (F.sum("d_q6").cast("double") / F.count("*") / 1_000_000).alias("mean_d")
    )
    a = per_grp.where(F.col("ic") == F.col("jc")).select(
        "i", F.col("ic").alias("cluster"), F.col("mean_d").alias("a")
    )
    b = (
        per_grp.where(F.col("ic") != F.col("jc"))
        .groupBy("i")
        .agg(F.min("mean_d").alias("b"))
    )
    s_q6 = F.floor(
        (F.col("b") - F.col("a")) / F.greatest("a", "b") * 1_000_000
    ).cast("long")
    sil = a.join(b, "i").select("i", "cluster", s_q6.alias("s_q6"))
    return sil.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_pts"),
        (F.sum("s_q6").cast("double") / F.count("*") / 1_000_000).alias(
            "mean_silhouette"
        ),
    )


def _silhouette_oracle() -> str:
    ctes = [
        "c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid, "
        f"emb AS cvec FROM (SELECT vec_id, emb FROM v_emb ORDER BY vec_id LIMIT {_K}) q)"
    ]
    for it in range(_ITERS):
        ctes.append(_duck_assign(f"a{it}", f"c{it}"))
        ctes.append(_duck_update(f"c{it + 1}", f"a{it}"))
    ctes.append(_duck_assign("afinal", f"c{_ITERS}"))
    fold = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {_DIM}), "
        "n -> (pi.emb[n] - pj.emb[n]) * (pi.emb[n] - pj.emb[n]))), "
        "(x, y) -> x + y))"
    )
    ctes.append(
        f"pts AS (SELECT e.vec_id, e.emb, a.cid AS cluster FROM v_emb e "
        f"JOIN afinal a USING (vec_id) WHERE e.vec_id < {_SIL_N})"
    )
    ctes.append(
        "pair AS (SELECT pi.vec_id AS i, pi.cluster AS ic, pj.cluster AS jc, "
        f"CAST(FLOOR({fold} * 1000000) AS BIGINT) AS d_q6 "
        "FROM pts pi CROSS JOIN pts pj WHERE pi.vec_id != pj.vec_id)"
    )
    ctes.append(
        "pg AS (SELECT i, ic, jc, CAST(SUM(d_q6) AS DOUBLE) / COUNT(*) / 1000000 "
        "AS mean_d FROM pair GROUP BY i, ic, jc)"
    )
    ctes.append("aa AS (SELECT i, ic AS cluster, mean_d AS a FROM pg WHERE ic = jc)")
    ctes.append("bb AS (SELECT i, MIN(mean_d) AS b FROM pg WHERE ic != jc GROUP BY i)")
    ctes.append(
        "sil AS (SELECT aa.i, aa.cluster, CAST(FLOOR((bb.b - aa.a) / "
        "GREATEST(aa.a, bb.b) * 1000000) AS BIGINT) AS s_q6 "
        "FROM aa JOIN bb ON aa.i = bb.i)"
    )
    return inline_views(
        "WITH " + ", ".join(ctes) + " "
        "SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_pts, "
        "CAST(SUM(s_q6) AS DOUBLE) / COUNT(*) / 1000000 AS mean_silhouette "
        "FROM sil GROUP BY cluster"
    )

QUERIES = {
    "ml_silhouette_eval": ml_silhouette_eval,
    "cluster_kmeans_lloyd": cluster_kmeans_lloyd,
    "graph_triangle_count": graph_triangle_count,
    "graph_pagerank": graph_pagerank,
    "vec_pca_power": vec_pca_power,
    "graph_bfs_frontier": graph_bfs_frontier,
    "graph_common_neighbors": graph_common_neighbors,
    "sample_coreset_kcenter": sample_coreset_kcenter,
    "graph_degree_distribution": graph_degree_distribution,
    "dedup_semantic_clustered": dedup_semantic_clustered,
}

ORACLES = {
    "ml_silhouette_eval": _silhouette_oracle(),
    "cluster_kmeans_lloyd": _kmeans_oracle(),
    "graph_triangle_count": _TRIANGLE_ORACLE,
    "graph_pagerank": _pagerank_oracle(),
    "vec_pca_power": _pca_oracle(),
    "graph_bfs_frontier": _bfs_sql("VARCHAR"),
    "graph_common_neighbors": _linkpred_sql(),
    "sample_coreset_kcenter": _kcenter_oracle(),
    "graph_degree_distribution": _degree_dist_sql("VARCHAR"),
    "dedup_semantic_clustered": _semdedup_oracle(),
}
