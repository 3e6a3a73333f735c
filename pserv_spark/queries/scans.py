"""Scan / projection / filter queries (corpus section A) — DataFrame API.

Each program is the idiomatic re-expression of the validated Spark SQL
in ``pserv_spark.corpus``; tests/test_dataframe_parity.py holds them
order-insensitively equal to the SQL forms, which keeps "DataFrame-API
vs SQL semantic drift" (SURVEY §7 watch list) a tested invariant.

Catalyst collapses these to a single vectorized parquet scan with the
projection pruned into ``ReadSchema`` and supported predicates pushed
to the reader (asserted by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.where(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.where(
        ((F.col("o_orderstatus") == "F") | F.col("o_orderpriority").like("1-%"))
        & F.col("o_totalprice").between(1000, 50000)
        & F.col("o_custkey").isin(*range(1, 11))
        & ~(F.col("o_orderstatus") == "P")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


def filter_null_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    tax_or_null = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.where(F.col("l_orderkey") < 200).select(
        "l_orderkey",
        "l_linenumber",
        tax_or_null.alias("tax_or_null"),
        F.coalesce(tax_or_null, F.lit(-1.0)).alias("tax_filled"),
        F.col("l_tax").isNull().alias("is_null"),
        F.col("l_tax").isNotNull().alias("not_null"),
    )


def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.where(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
    )


QUERIES = {
    "scan_project": scan_project,
    "filter_compound": filter_compound,
    "filter_null_logic": filter_null_logic,
    "case_when": case_when,
}
