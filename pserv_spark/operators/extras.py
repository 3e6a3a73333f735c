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


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery (AND/OR/XOR/shifts/popcount) — bit-packed flag
    columns are the cheapest filter representation at scale."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a, b = F.col("l_orderkey"), F.col("l_partkey")
    return li.where(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        a.bitwiseAND(b).alias("band"),
        a.bitwiseOR(b).alias("bor"),
        a.bitwiseXOR(b).alias("bxor"),
        F.shiftleft("l_linenumber", 3).cast("long").alias("shl"),
        F.shiftright("l_suppkey", 1).cast("long").alias("shr"),
        F.bit_count("l_suppkey").cast("int").alias("pop"),
    )


_BITWISE_ORACLE = (
    "SELECT l_orderkey, l_linenumber, "
    "l_orderkey & l_partkey AS band, l_orderkey | l_partkey AS bor, "
    "xor(l_orderkey, l_partkey) AS bxor, "
    "CAST(l_linenumber << 3 AS BIGINT) AS shl, "
    "CAST(l_suppkey >> 1 AS BIGINT) AS shr, "
    "CAST(bit_count(l_suppkey) AS INT) AS pop "
    "FROM lineitem WHERE l_orderkey < 100"
)


def source_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator source (``spark.range``): rows from no input files —
    the spine/driver-table primitive (DuckDB ``generate_series``).
    Range is a leaf the planner can split into N partitions with no
    scan, so derived tables cost nothing at any scale."""
    del sf_dir  # source op: no input data
    return spark.range(0, 500).select(
        "id",
        ((F.col("id") * F.col("id")) % 97).alias("sq_mod"),
        F.expr("id DIV 7").alias("bucket7"),
    )


_SERIES_ORACLE = (
    "SELECT i AS id, (i * i) % 97 AS sq_mod, i // 7 AS bucket7 "
    "FROM generate_series(0, 499) t(i)"
)


QUERIES = {
    "fn_map_props": fn_map_props,
    "agg_approx_distinct": agg_approx_distinct,
    "fn_bitwise": fn_bitwise,
    "source_generate_series": source_generate_series,
}

# agg_approx_distinct intentionally absent: rows-only by declaration.
ORACLES = {
    "fn_map_props": _MAP_ORACLE,
    "fn_bitwise": _BITWISE_ORACLE,
    "source_generate_series": _SERIES_ORACLE,
}
