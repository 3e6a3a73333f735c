"""Events / sessionization / funnel queries (corpus section H) —
DataFrame API over the canonical ``v_events`` view (ns→µs conversion
lives in the catalog, never re-derived here — SURVEY §7 watch list).

``sessionize`` is the classic gap-flag + running-sum composition; the
streaming-native equivalent (``session_window`` with watermark) lives
in streaming/jobs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables

SESSION_GAP_US = 1_800_000_000  # 30 minutes


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.table("v_events")


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us")
    prev = F.lag("ts_us").over(w)
    flagged = ev.select(
        "user_id",
        "ts_us",
        F.when(
            (F.col("ts_us") - prev > SESSION_GAP_US) | prev.isNull(), 1
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    run = Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.select(
        "user_id", "ts_us", F.sum("new_sess").over(run).alias("sess_id")
    )
    return sess.groupBy("user_id", F.col("sess_id").cast("long").alias("sess_id")).agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
    )


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.date_trunc("day", "ts").cast("timestamp").alias("day"), "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(14,2)")).cast("double"), 2).alias(
            "total_value"
        ),
    )


def window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bucket = F.floor(F.col("ts_us") / 21_600_000_000.0).cast("long")
    return ev.groupBy(bucket.alias("bucket_6h"), "event_type").agg(
        F.count("*").cast("long").alias("n")
    )


def udf_zscore_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-window z-score (the declarative twin of the applyInPandas
    implementation in operators/udfs.py — same oracle)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(
        F.stddev_samp("value").over(w), F.lit(0.0)
    )
    return ev.where(F.col("user_id") < 30).select(
        "event_id", "user_id", F.round(z, 6).alias("z")
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias(
            "t_purchase"
        ),
    )
    return per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.count("t_signup").cast("long").alias("n_signed"),
        F.count(F.when(F.col("t_purchase") > F.col("t_signup"), True))
        .cast("long")
        .alias("n_converted"),
    )


def lightcurve_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-object time-series variability (the ForcedSource light-curve
    aggregation shape: mean / σ / amplitude per object)."""
    ev = _events(spark, sf_dir)
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            (F.sum(F.col("value").cast("decimal(14,2)")).cast("double") / F.count("*")).alias(
                "mean_v"
            ),
            F.round(F.stddev_samp("value"), 6).alias("sd_v"),
            F.round(F.max("value") - F.min("value"), 2).alias("amplitude"),
        )
        .where(F.col("n_obs") >= 3)
    )


def phase_fold_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hour = F.floor((F.col("ts_us") % 86_400_000_000) / 3_600_000_000.0).cast("long")
    return ev.groupBy("event_type", hour.alias("hour_of_day")).agg(
        F.count("*").cast("long").alias("n")
    )


QUERIES = {
    "sessionize": sessionize,
    "window_tumbling": window_tumbling,
    "window_hopping": window_hopping,
    "udf_zscore_analog": udf_zscore_analog,
    "funnel_conversion": funnel_conversion,
    "lightcurve_stats": lightcurve_stats,
    "phase_fold_binning": phase_fold_binning,
}
