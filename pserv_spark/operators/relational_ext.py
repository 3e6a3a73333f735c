"""Advanced relational surface beyond the validated 73-query corpus.

Constructs a MySQL/Qserv user would reach for that need first-class
Spark support (reference delegates all query power to its SQL engine —
SURVEY §2.1/§3.1; no file:line cite possible, reference mount empty):

- ``cte_recursive`` — WITH RECURSIVE (Spark 4.x); iterative series
  generation without a driver-side loop.
- ``join_lateral_topk`` — correlated LATERAL subquery (top-2 orders
  per customer).  Catalyst decorrelates to a ranked join, so this
  stays a shuffle-bounded plan at scale rather than N correlated
  probes.
- ``subquery_scalar_corr`` — TPC-H Q17-shaped correlated scalar
  subqueries.  The avg-threshold predicate is rearranged division-free
  (``2·qty·cnt < sum``) over DECIMAL so the oracle comparison is exact
  (SURVEY §4.5 rule 1/2).
- ``unpivot_metrics`` — ``DataFrame.unpivot`` (wide→long melt), the
  feature-table normalization step of a training pipeline.
- ``agg_regr`` — least-squares regression aggregates
  (REGR_SLOPE/INTERCEPT/R2), rounded per §4.5 (noisy-float family,
  same policy as agg_stats/agg_corr).
- ``join_q3_toprevenue`` — TPC-H Q3 shape: star join → decimal
  revenue agg → global top-k with unique tiebreaker
  (TakeOrderedAndProject, no global sort).
- ``fn_higher_order`` — lambda battery over array columns
  (transform/filter/aggregate/exists/forall): JVM-side array
  processing without a Python UDF.
- ``lightcurve_structfn`` — per-object structure function
  SF²(Δt) = ⟨(Δflux)²⟩ binned by time lag: the LSST variability
  statistic over ForcedSource-shaped series (events stands in).
  Decimal pair sums keep the oracle exact; the bounded-lag predicate
  (< 1 day) is what keeps the self-join linear-ish at scale (pairs
  within a time horizon, not all O(n²) pairs).

All exact-oracle (driver t2 check); validated at sf0.01 and sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ._oracle import inline_views

# ---------------------------------------------------------------- SQL-level
# These three are SQL-surface constructs (recursion, LATERAL, correlated
# scalar subqueries); the SQL string IS the operator under test, and both
# engines accept the same dialect.

_RECURSIVE_SQL = (
    "WITH RECURSIVE t(n, fact) AS ("
    "SELECT 1, CAST(1 AS BIGINT) UNION ALL "
    "SELECT n+1, fact*(n+1) FROM t WHERE n < 15) "
    "SELECT n, fact FROM t"
)

_LATERAL_SQL = """
  SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
  FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
  WHERE c.c_custkey < 30"""

_Q17_SQL = """
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM lineitem l
  WHERE CAST(2*l.l_quantity AS DECIMAL(18,2)) *
        (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,2)))
           FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)
  GROUP BY l_returnflag"""


def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


def subquery_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_Q17_SQL)


# ------------------------------------------------------------ DataFrame-API


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    wide = o.where(F.col("o_orderkey") < 100).select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_custkey").cast("double").alias("cust"),
    )
    return wide.unpivot("o_orderkey", ["price", "cust"], "metric", "val")


def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("icept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


def join_q3_toprevenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    ).cast("double")
    return (
        t["orders"]
        .where(F.col("o_orderstatus") != "F")
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    emb = F.col("emb")
    return (
        spark.table("v_emb")
        .where(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.round(
                F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x * x), 6
            ).alias("sumsq"),
            F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
            F.round(
                F.element_at(F.transform(emb, lambda x: x * 2.0), 1), 6
            ).alias("first_doubled"),
            F.exists(emb, lambda x: x > 3.0).alias("has_big"),
            F.forall(emb, lambda x: x > -10.0).alias("all_gt"),
        )
    )


def lightcurve_structfn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SF²(Δt) per object: self-join bounded to a 1-day lag horizon.
    At 100 TB the equi-key (user_id) carries the shuffle and the lag
    bound caps per-key pair fan-out; partial aggregation collapses
    pairs map-side before the final (user, lag) exchange."""
    load_tables(spark, sf_dir)
    a = spark.table("v_events").where(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 200)
    ).alias("a")
    b = spark.table("v_events").where(F.col("event_type") == "purchase").alias("b")
    hour_us = 3_600_000_000
    lag = F.floor((F.col("b.ts_us") - F.col("a.ts_us")) / hour_us).cast("long")
    dv = F.col("b.value") - F.col("a.value")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts_us") > F.col("a.ts_us"))
            & (F.col("b.ts_us") - F.col("a.ts_us") < 24 * hour_us),
        )
        .groupBy(F.col("a.user_id").alias("user_id"), lag.alias("lag_hours"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            (
                F.sum((dv * dv).cast("decimal(24,8)")).cast("double") / F.count("*")
            ).alias("sf2"),
        )
    )


def lightcurve_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase-dispersion periodogram (Stellingwerf PDM, the classic
    variable-star period search the reference's ForcedSource time
    series feeds — public repo: python/desc/pserv/, forced-photometry
    light curves, SURVEY §1.1): fold each series at every candidate
    period, bin by phase, and score the period by the pooled within-bin
    scatter Σ_b (Σv² − (Σv)²/n_b) — low scatter ⇒ good period.

    Scale path: candidate periods are exploded *before* the shuffle, so
    the whole periodogram is ONE partial-aggregated groupBy per pass
    (rows × n_periods map-side, collapsed to users × periods × 8 bins);
    no self-join, no window.  Determinism: phases are integer µs
    arithmetic; per-bin sums are DECIMAL; the per-bin scatter (one
    double division) is FLOOR-quantized at 1e-6 into a BIGINT before
    the cross-bin SUM — floor of the same IEEE product is bit-identical
    in both engines, where a double→DECIMAL cast rounds the true binary
    value in Java but the shortest decimal representation in DuckDB and
    flips one ulp on exact 6dp half-boundaries (round-7 knife-edge
    audit; same §4.5 technique as the PSI/AUC ops)."""
    load_tables(spark, sf_dir)
    hour_us = 3_600_000_000
    ev = (
        spark.table("v_events")
        .where((F.col("event_type") == "purchase") & (F.col("user_id") < 100))
        .select(
            "user_id",
            "ts_us",
            "value",
            F.explode(F.array(*[F.lit(h) for h in (1, 6, 24)])).alias("period_h"),
        )
    )
    p_us = F.col("period_h").cast("long") * hour_us
    bins = (
        ev.withColumn(
            "bin",
            F.expr(
                f"((ts_us % (CAST(period_h AS BIGINT) * {hour_us})) * 8) "
                f"DIV (CAST(period_h AS BIGINT) * {hour_us})"
            ),
        )
        .groupBy("user_id", "period_h", "bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(24,6)")).alias("s"),
            F.sum((F.col("value") * F.col("value")).cast("decimal(24,6)")).alias("s2"),
        )
    )
    scatter = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    )
    # scatter is mathematically >= 0 but the double cancellation
    # s2 − s²/n can dip slightly negative for large-magnitude sums, so
    # clamp at 0 on BOTH sides (ADVICE r7 #2); ·1e6 summed per
    # (user, period) stays far inside BIGINT for any series length
    scatter_q = F.floor(
        F.greatest(scatter, F.lit(0.0)) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    return (
        bins.groupBy("user_id", "period_h")
        .agg(
            (F.sum(scatter_q).cast("double") / F.lit(1000000.0)).alias("dispersion"),
            F.sum("n").cast("long").alias("n_obs"),
        )
    )


def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates (distribution-shape QA over a flux-like
    column).  Spark and DuckDB agree on the skewness/kurtosis
    definitions; 3-digit rounding absorbs the one-pass vs two-pass
    accumulation noise (the 4th digit flips at sf0.001)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_extendedprice"), 3).alias("sk"),
        F.round(F.kurtosis("l_extendedprice"), 3).alias("ku"),
    )


def fn_datetime_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar battery past the corpus fn_date: quarter, last_day,
    ISO week, day-of-year, add_months (month-end clamped both
    engines)."""
    o = load_tables(spark, sf_dir)["orders"]
    d = F.col("o_orderdate").cast("date")
    return o.where(F.col("o_orderkey") < 200).select(
        "o_orderkey",
        d.cast("timestamp").alias("d"),
        F.quarter(d).alias("qtr"),
        F.last_day(d).cast("timestamp").alias("eom"),
        F.weekofyear(d).alias("wk"),
        F.dayofyear(d).alias("doy"),
        F.add_months(d, 3).cast("timestamp").alias("plus3m"),
    )


def agg_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregation *of* an aggregation (per-customer
    order counts → histogram of those counts).  Two shuffles by
    construction; the second input is already dimension-sized."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").cast("long").alias("n_cust")
    )


def join_theta_band_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for the pure theta band join: bin both sides at the
    band width (±5 → width-10 bins), explode each probe row to its ≤2
    candidate bins, equi-join on bin, exact residual.  Same result set
    as the corpus ``join_theta_band`` (its oracle is reused verbatim) —
    but the plan is a shuffle-bounded hash join instead of the O(N·M)
    broadcast-nested-loop the naive form costs at 100 TB.  1-D twin of
    the zone crossmatch (SURVEY §4.3)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].where(F.col("c_custkey") % 10 == 0)
    s = t["supplier"].withColumn("bin", F.floor(F.col("s_acctbal") / 10))
    cb = c.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor((F.col("c_acctbal") - 5) / 10),
                F.floor((F.col("c_acctbal") + 5) / 10),
            )
        ),
    )
    return (
        cb.alias("c")
        .join(s.alias("s"), "bin")
        .where(
            F.col("c.c_acctbal").between(
                F.col("s.s_acctbal") - 5, F.col("s.s_acctbal") + 5
            )
        )
        .select("c.c_custkey", "s.s_suppkey")
    )


QUERIES = {
    "cte_recursive": cte_recursive,
    "join_lateral_topk": join_lateral_topk,
    "subquery_scalar_corr": subquery_scalar_corr,
    "unpivot_metrics": unpivot_metrics,
    "agg_regr": agg_regr,
    "join_q3_toprevenue": join_q3_toprevenue,
    "fn_higher_order": fn_higher_order,
    "lightcurve_structfn": lightcurve_structfn,
    "lightcurve_periodogram": lightcurve_periodogram,
    "agg_skew_kurt": agg_skew_kurt,
    "fn_datetime_extras": fn_datetime_extras,
    "agg_count_distribution": agg_count_distribution,
    "join_theta_band_binned": join_theta_band_binned,
}

ORACLES = {
    "cte_recursive": _RECURSIVE_SQL,
    "join_lateral_topk": _LATERAL_SQL,
    "subquery_scalar_corr": _Q17_SQL,
    "unpivot_metrics": (
        "SELECT o_orderkey, 'price' AS metric, CAST(o_totalprice AS DOUBLE) AS val "
        "FROM orders WHERE o_orderkey < 100 UNION ALL "
        "SELECT o_orderkey, 'cust', CAST(o_custkey AS DOUBLE) "
        "FROM orders WHERE o_orderkey < 100"
    ),
    "agg_regr": (
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(regr_slope(l_extendedprice, l_quantity),4) AS slope, "
        "ROUND(regr_intercept(l_extendedprice, l_quantity),4) AS icept, "
        "ROUND(regr_r2(l_extendedprice, l_quantity),6) AS r2 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "join_q3_toprevenue": (
        "SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority, "
        "CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) "
        "AS DOUBLE) AS revenue "
        "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderstatus <> 'F' AND l.l_shipdate > o.o_orderdate "
        "GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority "
        "ORDER BY revenue DESC, o_orderkey LIMIT 10"
    ),
    "fn_higher_order": inline_views(
        "SELECT vec_id, "
        "ROUND(list_aggregate(list_transform(emb, x -> x*x), 'sum'), 6) AS sumsq, "
        "CAST(len(list_filter(emb, x -> x > 0)) AS INT) AS n_pos, "
        "ROUND(emb[1]*2.0, 6) AS first_doubled, "
        "len(list_filter(emb, x -> x > 3.0)) > 0 AS has_big, "
        "len(list_filter(emb, x -> NOT (x > -10.0))) = 0 AS all_gt "
        "FROM v_emb WHERE vec_id < 100"
    ),
    "lightcurve_structfn": inline_views(
        "SELECT a.user_id, "
        "CAST(FLOOR((b.ts_us - a.ts_us)/3600000000) AS BIGINT) AS lag_hours, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(CAST((b.value-a.value)*(b.value-a.value) AS DECIMAL(24,8))) "
        "AS DOUBLE)/COUNT(*) AS sf2 "
        "FROM v_events a JOIN v_events b "
        "ON a.user_id = b.user_id AND a.event_type='purchase' "
        "AND b.event_type='purchase' "
        "AND b.ts_us > a.ts_us AND b.ts_us - a.ts_us < 86400000000 "
        "WHERE a.user_id < 200 "
        "GROUP BY a.user_id, CAST(FLOOR((b.ts_us - a.ts_us)/3600000000) AS BIGINT)"
    ),
    "lightcurve_periodogram": inline_views(
        "WITH ev AS (SELECT user_id, ts_us, value, p.period_h "
        "FROM v_events CROSS JOIN (SELECT UNNEST([1, 6, 24]) AS period_h) p "
        "WHERE event_type = 'purchase' AND user_id < 100), "
        "bins AS (SELECT user_id, period_h, "
        "((ts_us % (CAST(period_h AS BIGINT) * 3600000000)) * 8) "
        "// (CAST(period_h AS BIGINT) * 3600000000) AS bin, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "SUM(CAST(value AS DECIMAL(24,6))) AS s, "
        "SUM(CAST(value * value AS DECIMAL(24,6))) AS s2 "
        "FROM ev GROUP BY user_id, period_h, bin) "
        "SELECT user_id, CAST(period_h AS INT) AS period_h, "
        "CAST(SUM(CAST(FLOOR(GREATEST(CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 0) "
        "* 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS dispersion, "
        "CAST(SUM(n) AS BIGINT) AS n_obs "
        "FROM bins GROUP BY user_id, period_h"
    ),
    "agg_skew_kurt": (
        "SELECT l_returnflag, ROUND(skewness(l_extendedprice),3) AS sk, "
        "ROUND(kurtosis(l_extendedprice),3) AS ku "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "fn_datetime_extras": (
        "SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d, "
        "CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr, "
        "CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom, "
        "CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS wk, "
        "CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT) AS doy, "
        "CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m "
        "FROM orders WHERE o_orderkey < 200"
    ),
    "agg_count_distribution": (
        "SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_cust FROM ("
        "SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_custkey) t GROUP BY n_orders"
    ),
    # Identical result contract as the naive corpus form — reuse its oracle.
    "join_theta_band_binned": (
        "SELECT c.c_custkey, s.s_suppkey FROM customer c JOIN supplier s "
        "ON c.c_acctbal BETWEEN s.s_acctbal - 5 AND s.s_acctbal + 5 "
        "WHERE c.c_custkey % 10 = 0"
    ),
}
