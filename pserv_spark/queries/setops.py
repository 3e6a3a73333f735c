"""Sort / limit / top-k / set operations (corpus section E) — DataFrame API.

``orderBy().limit()`` plans as TakeOrderedAndProject (per-partition
top-k + driver merge — no global sort even at 100 TB).  Set-op
semantics: ``unionAll`` is bag union; ``union().distinct()`` /
``intersect`` / ``subtract`` are the distinct SQL forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


def sort_multi_key_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.select("l_orderkey", "l_linenumber", "l_shipdate")
        # NULLS LAST pinned: a NULL ship date must not claim top-25
        # slots on one engine only (Spark ASC defaults nulls first)
        .orderBy(
            F.asc_nulls_last("l_shipdate"), "l_orderkey", "l_linenumber"
        )
        .limit(25)
    )


def _keys(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return c, s


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _keys(spark, sf_dir)
    return c.unionAll(s)


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _keys(spark, sf_dir)
    return c.union(s).distinct()


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = (
        t["customer"]
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("k"))
    )
    s = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n = t["nation"].select(F.col("n_nationkey").alias("k"))
    s = t["supplier"].select(F.col("s_nationkey").alias("k"))
    return n.subtract(s)  # EXCEPT DISTINCT semantics


def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    return c.select("c_mktsegment", "c_nationkey").dropDuplicates()


QUERIES = {
    "topk_global": topk_global,
    "sort_multi_key_limit": sort_multi_key_limit,
    "set_union_all": set_union_all,
    "set_union_distinct": set_union_distinct,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "distinct_rows": distinct_rows,
}
