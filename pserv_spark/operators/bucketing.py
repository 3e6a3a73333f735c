"""Bucketed (pre-shuffled) table layout — the shuffle-free big-big join.

The reference delegates join locality to MySQL indexes (SURVEY §2.1);
Qserv proper co-locates Object/ForcedSource by chunk so the light-curve
join never moves data.  Spark's native equivalent is bucketing: both
sides written with ``bucketBy(N, key)`` hash-place rows so bucket i of
the fact lines up with bucket i of the dimension — a sort-merge join
then needs NO Exchange on either side (tests/test_plans.py asserts the
join-input exchange count is 0).

At 100 TB this is the difference between re-shuffling the fact table on
every query and shuffling it once at ingest: bucket count is chosen at
write time (here 8; thousands on a real cluster), and any join or
aggregation keyed on the bucket column reuses the layout for free.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables

N_BUCKETS = 8


def _bucket_dir(sf_dir: str) -> str:
    slug = re.sub(r"\W+", "_", sf_dir.strip("/"))
    return os.path.join(tempfile.gettempdir(), f"pserv_bkt_{slug}")


def _write_bucketed(df: DataFrame, path: str, table: str, key: str) -> None:
    (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )


def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority over bucket-co-located lineitem⋈orders.

    Writes both sides bucketed by the join key (the once-at-ingest
    cost), then joins the bucketed tables — identical result to the
    plain join, which is exactly what the oracle runs on the base
    parquet.
    """
    t = load_tables(spark, sf_dir)
    base = _bucket_dir(sf_dir)
    _write_bucketed(
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        os.path.join(base, "li"),
        "pserv_bkt_li",
        "l_orderkey",
    )
    _write_bucketed(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        os.path.join(base, "ord"),
        "pserv_bkt_ord",
        "o_orderkey",
    )
    li = spark.table("pserv_bkt_li")
    od = spark.table("pserv_bkt_ord")
    revenue = F.sum(
        F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")
    ).cast("double")
    return (
        li.hint("merge")
        .join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(revenue.alias("revenue"))
    )


_BUCKETED_ORACLE = (
    "SELECT o_orderpriority, "
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) "
    "AS DOUBLE) AS revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "GROUP BY o_orderpriority"
)


QUERIES = {"join_bucketed_colocated": join_bucketed_colocated}
ORACLES = {"join_bucketed_colocated": _BUCKETED_ORACLE}
