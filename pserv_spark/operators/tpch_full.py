"""Remaining TPC-H query shapes (Q4 Q6 Q7 Q8 Q9 Q10 Q11 Q12 Q14 Q15
Q16 Q19 Q20 analogs), completing decision-support coverage.

With ``tpch_shapes`` (Q2/Q18/Q21/Q22), ``relational_ext`` (Q3/Q13/Q17)
and the corpus (Q1/Q5), every TPC-H query shape now has a
driver-checkable analog.  Adaptations to the driver schema: no
``partsupp`` → lineitem is the part↔supplier bridge (Q11/Q16/Q20
aggregate it directly); no ``l_commitdate``/``l_receiptdate`` →
ship-vs-order-date lag stands in (Q4/Q12); no ``p_container`` →
``p_size`` bands drive Q19's OR-of-ANDs.

Determinism (SURVEY §4.5): every money sum is
``SUM(CAST(expr AS DECIMAL))``; scalar thresholds are computed as
``CAST(SUM(DECIMAL) AS DOUBLE)`` then compared — never a raw double
SUM, never a ROUND of an exact quotient.  Top-k orderings carry a
unique key tiebreaker.

Scale notes are per-function; the common theme: every shape here
reduces to shuffles on a single key (orderkey / partkey / suppkey)
with partial aggregation map-side, and the dimension joins
(part/supplier/nation/region) are broadcast-sized at any SF that
matches TPC-H's fixed-cardinality dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables

_D182 = "decimal(18,2)"
_D184 = "decimal(18,4)"


def _revenue(col_price="l_extendedprice", col_disc="l_discount"):
    return (F.col(col_price) * (1 - F.col(col_disc))).cast(_D184)


def agg_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: single-table predicate + decimal sum.  At 100 TB this is the
    pure scan-throughput query: all three predicates push down to
    parquet row-group stats, no shuffle at all (single-stage partial →
    one-row final)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_D184))
            .cast("double")
            .alias("revenue")
        )
    )


def join_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: EXISTS → left_semi with an inequality residual (shipped
    >30 days after order).  Both sides shuffle on orderkey; the date
    filter prunes orders before the join."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


def join_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bidirectional nation-pair volume by ship year.  nation is a
    25-row broadcast on both legs; the only real shuffles are
    lineitem⋈orders (orderkey) and orders⋈customer (custkey)."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


def join_q8_marketshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_2's share of ASIA-customer STANDARD-part revenue per
    order year.  The share is DOUBLE(decimal)/DOUBLE(decimal) — an
    exact quotient, emitted unrounded (§4.5 rule 2)."""
    t = load_tables(spark, sf_dir)
    vol = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].where(F.col("p_type") == "STANDARD")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(
                t["nation"]
                .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
                .where(F.col("r_name") == "ASIA")
                .select(F.col("n_nationkey").alias("c_nk"))
            ),
            F.col("c_nationkey") == F.col("c_nk"),
            "left_semi",
        )
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("s_nk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("s_nk"),
        )
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _revenue().alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(F.lit(0).cast(_D184)))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


def join_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit by supplier nation × year for '%red%' parts;
    p_retailprice*l_quantity proxies the missing ps_supplycost.  The
    per-row profit is cast to DECIMAL before SUM so partial-agg order
    can't move the result."""
    t = load_tables(spark, sf_dir)
    profit = (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"]
                .where(F.col("p_name").like("%red%"))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("p_retailprice") * F.col("l_quantity")
            )
            .cast(_D184)
            .alias("amount"),
        )
    )
    return profit.groupBy("nation", "o_year").agg(
        F.sum("amount").cast("double").alias("sum_profit")
    )


def join_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: revenue lost to returns per customer, top 20.  ORDER BY
    carries c_custkey as the unique tiebreaker (§4.5 rule 4); the limit
    plans as TakeOrderedAndProject — no global sort materialization."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def agg_q11_important(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose traded value exceeds a fraction of the grand
    total (lineitem stands in for partsupp).  Two aggregations over one
    shuffle-on-partkey pass + a 1-row broadcast threshold.  The
    threshold is relative (1.2x the mean per-part value) so the
    selectivity is scale-invariant — TPC-H's own Q11 scales its
    fraction by 1/SF for the same reason."""
    t = load_tables(spark, sf_dir)
    per_part = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(_D182)).cast("double").alias("value"))
    )
    total = per_part.agg(
        (F.sum("value").cast("double") / F.count("*") * F.lit(1.2)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value").cast("double") > F.col("threshold"))
        .select("l_partkey", "value")
    )


def agg_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: ship-lag class × priority-class counts (ship-vs-order lag
    stands in for the missing commit/receipt dates).  Single
    orderkey-shuffle join, then a tiny two-row aggregate."""
    t = load_tables(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(
                F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")) > 60,
                F.lit("late"),
            )
            .otherwise(F.lit("ontime"))
            .alias("ship_class"),
            F.when(hi, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum("is_high").cast("long").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).cast("long").alias("low_line_count"),
        )
    )


def agg_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for 1996 shipments.  part is broadcast;
    the share is 100*DOUBLE(decimal)/DOUBLE(decimal), unrounded."""
    t = load_tables(spark, sf_dir)
    joined = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(F.col("p_type"), _revenue().alias("volume"))
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(
                    F.lit(0).cast(_D184)
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("promo_revenue_pct")
    )


def join_q15_topsupplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) achieving the max quarterly revenue.  The max
    is a 1-row broadcast; equality compares DECIMAL sums (exact, no
    float ties).  One shuffle on suppkey, reused by both branches."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
    )
    best = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def agg_q16_suppcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: distinct supplier count per (brand, type, size) for
    non-excluded parts, via the lineitem bridge.  COUNT(DISTINCT) over
    a partkey-shuffled join; part is broadcast."""
    t = load_tables(spark, sf_dir)
    parts = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(parts.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def join_q19_disc_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-ANDs brand/size/quantity predicate join.  The
    composite predicate stays inside the broadcast-hash-join residual;
    Catalyst pushes the per-branch part filters into the build side."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    p = F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size"))
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    branch1 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(1, 15))
    )
    branch2 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(10, 25))
        & (F.col("l_quantity").between(10, 25))
    )
    branch3 = (
        (F.col("p_brand") == "Brand#4")
        & (F.col("p_size").between(25, 50))
        & (F.col("l_quantity").between(20, 35))
    )
    return j.where(branch1 | branch2 | branch3).agg(
        F.sum(_revenue()).cast("double").alias("revenue")
    )


def join_q20_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: suppliers who moved >30% of a part's total 1996 volume
    (lineitem stands in for partsupp availability).  Both aggregates
    share the (partkey) shuffle; the per-part total is broadcast back
    (small: one row per part)."""
    t = load_tables(spark, sf_dir)
    li96 = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    per_ps = li96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(_D182)).cast(_D182).alias("qty")
    )
    per_part = li96.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast(_D182)).cast("double") * F.lit(0.3)).alias(
            "threshold"
        )
    )
    return (
        per_ps.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
        .where(F.col("qty").cast("double") > F.col("threshold"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


QUERIES = {
    "agg_q6_forecast": agg_q6_forecast,
    "join_q4_priority": join_q4_priority,
    "join_q7_volume": join_q7_volume,
    "join_q8_marketshare": join_q8_marketshare,
    "join_q9_profit": join_q9_profit,
    "join_q10_returned": join_q10_returned,
    "agg_q11_important": agg_q11_important,
    "agg_q12_shipmode": agg_q12_shipmode,
    "agg_q14_promo": agg_q14_promo,
    "join_q15_topsupplier": join_q15_topsupplier,
    "agg_q16_suppcnt": agg_q16_suppcnt,
    "join_q19_disc_revenue": join_q19_disc_revenue,
    "join_q20_excess": join_q20_excess,
}

ORACLES = {
    "agg_q6_forecast": (
        "SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
    ),
    "join_q4_priority": (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count FROM orders o "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01' "
        "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY) "
        "GROUP BY o_orderpriority"
    ),
    "join_q7_volume": (
        "SELECT supp_nation, cust_nation, l_year, "
        "CAST(SUM(volume) AS DOUBLE) AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year, "
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume "
        "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
        "WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) t "
        "GROUP BY supp_nation, cust_nation, l_year"
    ),
    "join_q8_marketshare": (
        "SELECT o_year, "
        "CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
        "/ CAST(SUM(volume) AS DOUBLE) AS mkt_share FROM ("
        "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year, "
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume, "
        "n2.n_name AS supp_nation "
        "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n2 ON s.s_nationkey = n2.n_nationkey "
        "WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD') "
        "AND c.c_nationkey IN (SELECT n_nationkey FROM nation n JOIN region r "
        "ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'ASIA')) t "
        "GROUP BY o_year"
    ),
    "join_q9_profit": (
        "SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit FROM ("
        "SELECT n.n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year, "
        "CAST(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE p.p_name LIKE '%red%') t "
        "GROUP BY nation, o_year"
    ),
    "join_q10_returned": (
        "SELECT c_custkey, c_name, c_acctbal, n_name, "
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE l.l_returnflag = 'R' AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1996-04-01' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    "agg_q11_important": (
        "WITH per_part AS (SELECT l_partkey, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value "
        "FROM lineitem GROUP BY l_partkey) "
        "SELECT l_partkey, value FROM per_part "
        "WHERE CAST(value AS DOUBLE) > "
        "(SELECT CAST(SUM(value) AS DOUBLE) / COUNT(*) * 1.2 FROM per_part)"
    ),
    "agg_q12_shipmode": (
        "SELECT ship_class, "
        "CAST(SUM(is_high) AS BIGINT) AS high_line_count, "
        "CAST(SUM(1 - is_high) AS BIGINT) AS low_line_count FROM ("
        "SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60 "
        "THEN 'late' ELSE 'ontime' END AS ship_class, "
        "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_high "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) t "
        "GROUP BY ship_class"
    ),
    "agg_q14_promo": (
        "SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume "
        "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
        "/ CAST(SUM(volume) AS DOUBLE) AS promo_revenue_pct FROM ("
        "SELECT p_type, CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01') t"
    ),
    "join_q15_topsupplier": (
        "WITH rev AS (SELECT l_suppkey, "
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01' "
        "GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue FROM rev JOIN supplier "
        "ON s_suppkey = l_suppkey "
        "WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)"
    ),
    "agg_q16_suppcnt": (
        "SELECT p_brand, p_type, p_size, "
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%' "
        "AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34) "
        "GROUP BY p_brand, p_type, p_size"
    ),
    "join_q19_disc_revenue": (
        "SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15) "
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 25) "
        "OR (p_brand = 'Brand#4' AND p_size BETWEEN 25 AND 50 AND l_quantity BETWEEN 20 AND 35)"
    ),
    "join_q20_excess": (
        "WITH li96 AS (SELECT * FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'), "
        "per_ps AS (SELECT l_partkey, l_suppkey, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS qty "
        "FROM li96 GROUP BY l_partkey, l_suppkey), "
        "per_part AS (SELECT l_partkey AS pk, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.3 AS threshold "
        "FROM li96 GROUP BY l_partkey) "
        "SELECT DISTINCT s_suppkey, s_name FROM per_ps "
        "JOIN per_part ON l_partkey = pk "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "WHERE CAST(qty AS DOUBLE) > threshold"
    ),
}
