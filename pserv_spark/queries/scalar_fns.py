"""Scalar-function queries (corpus section F) — DataFrame API for the
forms where the API genuinely differs from SQL (arrays, explode, JSON,
hashing, casts).  The pure dialect batteries (fn_string / fn_regex /
fn_math / fn_date) stay on their validated ``spark.sql`` forms via the
registry fallback — re-expressing twelve function calls as twelve
identical ``F.xxx`` calls adds translation risk and nothing else
(SURVEY §7: "prefer spark.sql where the API adds no value").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def fn_cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.where(F.col("doc_id") < 100).select(
        "doc_id",
        F.col("n_chars").cast("double").alias("dc"),
        F.col("doc_id").cast("string").alias("sid"),
        F.col("lang").try_cast("int").alias("bad_cast"),
        (F.col("n_chars") > 200).cast("int").alias("flag"),
    )


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    return ev.where(F.col("user_id") == 0).select(
        "event_id",
        # floor-through-double (r9): representation-insensitive and
        # hostile-safe — see corpus.py fn_json.
        F.floor(F.get_json_object("props", "$.k").try_cast("double"))
        .cast("int")
        .alias("k"),
    )


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    uniq = F.array_distinct(toks)
    return docs.where(F.col("doc_id") < 100).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(uniq).alias("n_uniq"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(F.array_sort(uniq), 1).alias("first_token"),
    )


def fn_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy(F.col("w").alias("word"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


def fn_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.where(F.col("doc_id") < 50).select("doc_id", F.md5("text").alias("h"))


QUERIES = {
    "fn_cast_try": fn_cast_try,
    "fn_json": fn_json,
    "fn_array": fn_array,
    "fn_explode_wordcount": fn_explode_wordcount,
    "fn_hash_md5": fn_hash_md5,
}
