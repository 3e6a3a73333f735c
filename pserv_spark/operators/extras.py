"""Remaining declared-surface operators (SURVEY §2.2 loose ends).

- ``fn_map_props`` — MapType surface: ``from_json`` the ``props`` JSON
  into ``map<string,int>``, then map functions (keys, lookup).  Exact
  oracle via DuckDB's json functions.
- ``agg_approx_distinct`` — HyperLogLog++ ``approx_count_distinct``.
  Declared **rows-only** (SURVEY §2.2): HLL estimates are
  engine-specific, so no oracle entry — the driver records the weaker
  check, which is the honest contract for a sketch.  The exact twin
  (``agg_distinct``) is the corpus query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def fn_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    m = F.from_json("props", "map<string,int>")
    return ev.where(F.col("user_id") < 40).select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
        F.element_at(m, F.lit("k")).alias("k_val"),
    )


_MAP_ORACLE = (
    "WITH v_events AS (SELECT event_id, user_id, props FROM events) "
    "SELECT event_id, array_to_string(list_sort(json_keys(props)), ',') AS keys, "
    "CAST(json_extract(props, '$.k') AS INT) AS k_val "
    "FROM v_events WHERE user_id < 40"
)


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey").cast("long").alias("approx_supp")
    )


QUERIES = {
    "fn_map_props": fn_map_props,
    "agg_approx_distinct": agg_approx_distinct,
}

# agg_approx_distinct intentionally absent: rows-only by declaration.
ORACLES = {
    "fn_map_props": _MAP_ORACLE,
}
