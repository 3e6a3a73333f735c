"""Join queries (corpus section B) — DataFrame API re-expressions.

Physical-strategy notes (verified via .explain, tests/test_plans.py):
equi-joins plan as broadcast-hash (small side < threshold) or
sort-merge; EXISTS/IN shapes use the dedicated semi/anti join types
rather than joining + dropping columns — at scale that's the
difference between shuffling the key set and shuffling whole rows.
The pure theta joins (band/cross) are dimension-scale by declaration;
big-big spatial joins route through the zoned path
(operators/zonematch.py, SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o, c = t["orders"].alias("o"), t["customer"].alias("c")
    return (
        o.join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
        .where(F.col("c.c_custkey") < 50)
        .select("o.o_orderkey", "c.c_name", "o.o_totalprice")
    )


def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, p = t["lineitem"], F.broadcast(t["part"])
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def join_multiway_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship 6-table star join (Object ⋈ ForcedSource ⋈ CcdVisit
    shape, SURVEY §2.2): fact table joined to size-aware-broadcast
    dims, then an exact DECIMAL revenue aggregation.

    Join order is scale-first: the two fact tables meet on their
    shared key (lineitem ⋈ orders on orderkey — the join that must be
    a co-partitioned shuffle at 100 TB), and every dimension arrives
    via ``catalog.dim``, which broadcast-hints only tables whose
    on-disk size fits the threshold.  At sf0.1 that broadcasts
    orders/customer/supplier/nation/region (plan: one shuffle total,
    ~1.6× faster than the unhinted form); at 100 TB orders and
    customer outgrow the threshold and the same code degrades to
    properly co-keyed shuffle joins.
    """
    from ..catalog import dim

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].alias("l")
    o = dim(spark, sf_dir, "orders").alias("o")
    c = dim(spark, sf_dir, "customer").alias("c")
    s = dim(spark, sf_dir, "supplier").alias("s")
    n = dim(spark, sf_dir, "nation").alias("n")
    r = dim(spark, sf_dir, "region").alias("r")
    revenue = (F.col("l.l_extendedprice") * (1 - F.col("l.l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(c, F.col("c.c_custkey") == F.col("o.o_custkey"))
        .join(
            s,
            (F.col("l.l_suppkey") == F.col("s.s_suppkey"))
            & (F.col("c.c_nationkey") == F.col("s.s_nationkey")),
        )
        .join(n, F.col("s.s_nationkey") == F.col("n.n_nationkey"))
        .join(r, F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .where(F.col("r.r_name") == "ASIA")
        .groupBy("n.n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c, o = t["customer"].alias("c"), t["orders"].alias("o")
    return (
        c.join(o, F.col("o.o_custkey") == F.col("c.c_custkey"), "left")
        .groupBy("c.c_custkey")
        .agg(F.count("o.o_orderkey").cast("long").alias("n_orders"))
    )


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    s, n = t["supplier"].alias("s"), t["nation"].alias("n")
    return (
        s.join(n, F.col("s.s_nationkey") == F.col("n.n_nationkey"), "right")
        .groupBy("n.n_name")
        .agg(F.count("s.s_suppkey").cast("long").alias("n_supp"))
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = (
        t["customer"]
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").cast("long").alias("nc"))
        .alias("c")
    )
    s = (
        t["supplier"]
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").cast("long").alias("ns"))
        .alias("s")
    )
    return c.join(s, F.col("c.k") == F.col("s.k"), "full").select(
        F.coalesce(F.col("c.k"), F.col("s.k")).alias("nationkey"),
        F.col("c.nc").alias("n_cust"),
        F.col("s.ns").alias("n_supp"),
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big_orders = t["orders"].where(F.col("o_totalprice") > 400000)
    return t["customer"].join(
        big_orders, t["customer"].c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey")


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["customer"].join(
        t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def join_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    keys = t["nation"].where(F.col("n_regionkey") == 2).select("n_nationkey")
    return t["supplier"].join(
        keys, t["supplier"].s_nationkey == keys.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")


def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].where(F.col("c_custkey") % 10 == 0).alias("c")
    s = t["supplier"].alias("s")
    return c.join(
        s,
        F.col("c.c_acctbal").between(
            F.col("s.s_acctbal") - 5, F.col("s.s_acctbal") + 5
        ),
    ).select("c.c_custkey", "s.s_suppkey")


def join_equi_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].where(F.col("c_custkey") % 20 == 0).alias("c")
    s = t["supplier"].alias("s")
    return c.join(
        s,
        (F.col("c.c_nationkey") == F.col("s.s_nationkey"))
        & (F.col("c.c_acctbal") > F.col("s.s_acctbal")),
    ).select("c.c_custkey", "s.s_suppkey")


def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o, li = t["orders"].alias("o"), t["lineitem"].alias("l")
    return (
        o.join(
            li,
            (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
            & F.col("l.l_shipdate").between(
                F.col("o.o_orderdate"),
                F.expr("o_orderdate + INTERVAL 60 DAY"),
            ),
        )
        .groupBy("o.o_orderkey")
        .agg(F.count("*").cast("long").alias("n_shipped"))
    )


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    r1, r2 = t["region"].alias("r1"), t["region"].alias("r2")
    return r1.crossJoin(r2).select(
        F.col("r1.r_name").alias("a"), F.col("r2.r_name").alias("b")
    )


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest signup at or before each purchase).  Spark
    has no native ASOF join operator; the equi-key + inequality +
    MAX-per-group composition is the declared equivalent (the DuckDB
    oracle uses a real ASOF JOIN — equivalence validated, SURVEY §2.2)."""
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    s = ev.where(F.col("event_type") == "signup").alias("s")
    return (
        p.join(
            s,
            (F.col("s.user_id") == F.col("p.user_id"))
            & (F.col("s.ts_us") <= F.col("p.ts_us")),
        )
        .groupBy("p.event_id", "p.user_id")
        .agg(F.max("s.ts_us").alias("last_signup_us"))
    )


def join_self_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    l1, l2 = t["lineitem"].alias("l1"), t["lineitem"].alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
        )
        .where(F.col("l1.l_orderkey") < 300)
        .select(
            "l1.l_orderkey",
            "l1.l_linenumber",
            F.col("l2.l_linenumber").alias("other_line"),
        )
    )


QUERIES = {
    "join_inner": join_inner,
    "join_broadcast_dim": join_broadcast_dim,
    "join_multiway_q5": join_multiway_q5,
    "join_left_outer": join_left_outer,
    "join_right_outer": join_right_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_in_subquery": join_in_subquery,
    "join_theta_band": join_theta_band,
    "join_equi_residual": join_equi_residual,
    "join_interval": join_interval,
    "join_cross": join_cross,
    "join_asof": join_asof,
    "join_self_lineitem": join_self_lineitem,
}
