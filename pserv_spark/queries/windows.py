"""Window-function queries (corpus section D) — DataFrame API.

Every ordering carries a unique tiebreaker (SURVEY §4.5 rule 4); the
RANGE frame runs over numeric epoch-µs, not INTERVAL, for oracle
parity.  Window state is per-partition; at scale the partition keys
(user_id, o_custkey) shard the state across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables


def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    # explicit null placement: Spark ASC defaults NULLS FIRST where
    # DuckDB defaults NULLS LAST — pin it so NULL priorities rank last
    w = Window.orderBy(F.asc_nulls_last("o_orderpriority"))
    return o.where(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    w = Window.partitionBy("user_id").orderBy("ts_us")
    return ev.where(F.col("user_id") < 20).select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    w = Window.partitionBy("user_id").orderBy("ts_us")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    return ev.where(F.col("user_id") < 20).select(
        "event_id",
        "user_id",
        F.round(
            F.sum(F.col("value").cast("decimal(14,2)")).over(running).cast("double"), 2
        ).alias("running"),
        F.count("*").over(last3).cast("long").alias("n_last3"),
    )


def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.where(F.col("user_id") < 30).select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_last_hour"),
    )


def win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.orderBy(F.asc_nulls_last("o_totalprice"), F.asc("o_orderkey"))
    return o.where(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.where(F.col("user_id") < 20).select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
    )


QUERIES = {
    "win_topk_per_group": win_topk_per_group,
    "win_rank_dense": win_rank_dense,
    "win_lag_lead": win_lag_lead,
    "win_running_sum": win_running_sum,
    "win_range_frame": win_range_frame,
    "win_ntile_pctrank": win_ntile_pctrank,
    "win_first_last": win_first_last,
}
