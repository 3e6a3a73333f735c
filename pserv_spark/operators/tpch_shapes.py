"""Deep-nesting relational shapes (TPC-H Q2/Q18/Q21/Q22 analogs).

The corpus (SURVEY Appendix A) covers every join/agg primitive once;
these four add the *composition* patterns a Qserv-style catalog workload
leans on — correlated scalar minima, HAVING-driven semijoins, stacked
EXISTS/NOT-EXISTS, and scalar-subquery thresholds — each written as an
idiomatic DataFrame program (semi/anti joins, groupBy+join-back for the
decorrelated minimum) rather than a SQL string, so Catalyst's
decorrelation path and the hand-decorrelated plan are both exercised.

Adaptations to the driver schema (no partsupp/receiptdate in the test
tables): lineitem is the part↔supplier bridge for Q2; l_shipdate stands
in for Q21's receipt/commit comparison.

Determinism notes (SURVEY §4.5): the Q22 threshold is computed as
``CAST(SUM(DECIMAL)/COUNT AS DOUBLE)`` on BOTH engines — a raw double
AVG differs in final ulps between partial-agg orders and could flip
membership of a customer sitting exactly at the mean.  Q2's equality
compares *stored* doubles (no arithmetic), which is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def join_q18_bigqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds a threshold,
    rejoined to customer detail.  The HAVING subquery decorrelates to a
    semijoin on o_orderkey; at scale both aggregations are partial →
    shuffle-on-orderkey, and the second pass reuses the same key."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_orderkey")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(big, F.col("o_orderkey") == big.l_orderkey, "left_semi")
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "o_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
    )


def join_q21_lastship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: per supplier, count the finished-order lineitems where
    at least one OTHER supplier participated in the order (EXISTS →
    left_semi) but none of them shipped later (NOT EXISTS with an
    inequality residual → left_anti).  Both subqueries share the
    orderkey equi-key, so all three passes shuffle on the same column —
    no extra exchange at 100 TB beyond the first."""
    t = load_tables(spark, sf_dir)
    l1 = (
        t["lineitem"]
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .alias("l1")
    )
    l2 = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate").alias("l2")
    l3 = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    waiting = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        waiting.join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


def subquery_q22_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers above the positive-balance mean with no
    high-value order (every customer in the synthetic data has *some*
    order, so the classic no-orders predicate would be vacuous), rolled
    up by a derived country code.  Threshold via decimal-sum / count
    (deterministic across engines); the NOT EXISTS is a left_anti
    against the filtered orders."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    thresh = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    return (
        c.join(thresh)  # 1-row broadcast cross join carries the scalar
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].where(F.col("o_totalprice") > 300000),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .select((F.col("c_nationkey") % 10).cast("int").alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


def subquery_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each part, the supplier(s) whose lineitem price is
    the minimum for that part (lineitem is the part↔supplier bridge in
    this schema).  Hand-decorrelated: min-per-part groupBy, then an
    equi-join back on (partkey, price) — equality on stored doubles, no
    arithmetic.  Both sides shuffle on l_partkey only."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(F.col("l_partkey") < 200).alias("li")
    minp = (
        t["lineitem"]
        .where(F.col("l_partkey") < 200)
        .groupBy(F.col("l_partkey").alias("mk"))
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    return (
        li.join(
            minp,
            (F.col("li.l_partkey") == F.col("mk"))
            & (F.col("li.l_extendedprice") == F.col("min_price")),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("li.l_suppkey"))
        .select(
            F.col("li.l_partkey").alias("p_partkey"),
            F.col("s_suppkey"),
            F.col("li.l_extendedprice").alias("price"),
        )
    )


QUERIES = {
    "join_q18_bigqty": join_q18_bigqty,
    "join_q21_lastship": join_q21_lastship,
    "subquery_q22_balance": subquery_q22_balance,
    "subquery_q2_mincost": subquery_q2_mincost,
}

ORACLES = {
    "join_q18_bigqty": (
        "SELECT c_name, o_orderkey, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty "
        "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderkey IN "
        "(SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 100) "
        "GROUP BY c_name, o_orderkey"
    ),
    "join_q21_lastship": (
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
        "FROM supplier s JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l1.l_orderkey "
        "AND o.o_orderstatus = 'F') "
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate) "
        "GROUP BY s_name"
    ),
    "subquery_q22_balance": (
        "SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust, "
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal "
        "FROM (SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal "
        "FROM customer c "
        "WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) "
        "/ COUNT(*) FROM customer WHERE c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000)) t "
        "GROUP BY cntrycode"
    ),
    "subquery_q2_mincost": (
        "SELECT l.l_partkey AS p_partkey, s.s_suppkey, l.l_extendedprice AS price "
        "FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "WHERE l.l_partkey < 200 AND l.l_extendedprice = "
        "(SELECT MIN(l2.l_extendedprice) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"
    ),
}
