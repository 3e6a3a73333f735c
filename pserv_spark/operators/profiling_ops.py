"""Dataset profiling operators.

The reference's workflow leans on ad-hoc sanity queries after each bulk
load (row counts, min/max ranges per column — the practice-server use
case, SURVEY §2.1 `DbConnection.apply`).  These make that a first-class
operator pair, the way a 100 TB ingestion pipeline gates a new drop
before training on it:

- ``profile_table_stats`` — one-pass column profile of ``orders``:
  per column row count, null count, exact distinct count, and a
  canonical min/max rendering.  Implemented as a SINGLE aggregation
  over one scan (all metrics as agg expressions) followed by a
  ``stack`` unpivot — never one scan per column.  At 100 TB the exact
  ``COUNT(DISTINCT)`` would swap to ``approx_count_distinct`` (the
  expand-operator cost is the one non-linear piece); kept exact here
  for the oracle gate.
- ``profile_value_counts`` — top-5 most frequent values for the
  low-cardinality string columns (frequency table / enum drift check).
  Group-by per column then a per-column top-k window with a total
  (count DESC, value ASC) ordering — deterministic under ties.

Min/max renderings are normalized before casting to string so both
engines print identically: DECIMAL(18,2) for doubles (Java
``Double.toString`` would use scientific notation where DuckDB does
not), DATE for timestamps, plain CAST for integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables

#: column -> rendering class for min/max normalization.
_PROFILE_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def _spark_repr(agg: str, col: str, kind: str) -> str:
    if kind == "num":
        return f"CAST(CAST({agg}({col}) AS DECIMAL(18,2)) AS STRING)"
    if kind == "date":
        return f"CAST(CAST({agg}({col}) AS DATE) AS STRING)"
    return f"CAST({agg}({col}) AS STRING)"


def _duck_repr(agg: str, col: str, kind: str) -> str:
    if kind == "num":
        return f"CAST(CAST({agg}({col}) AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "date":
        return f"CAST(CAST({agg}({col}) AS DATE) AS VARCHAR)"
    return f"CAST({agg}({col}) AS VARCHAR)"


def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan column profile of the orders table (see module doc)."""
    orders = load_tables(spark, sf_dir)["orders"]
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs.append((F.count("*") - F.count(c)).cast("long").alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"nd_{c}"))
        aggs.append(F.expr(_spark_repr("MIN", c, kind)).alias(f"mn_{c}"))
        aggs.append(F.expr(_spark_repr("MAX", c, kind)).alias(f"mx_{c}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_repr, max_repr)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_repr", "max_repr")


_TABLE_STATS_ORACLE = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
    f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
    f"{_duck_repr('MIN', c, kind)} AS min_repr, "
    f"{_duck_repr('MAX', c, kind)} AS max_repr FROM orders"
    for c, kind in _PROFILE_COLS
)

_VC_COLS = ("o_orderstatus", "o_orderpriority")


def profile_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 frequency table for the enum-like orders columns."""
    orders = load_tables(spark, sf_dir)["orders"]
    counted = None
    for c in _VC_COLS:
        part = (
            orders.groupBy(F.col(c).alias("value"))
            .agg(F.count("*").cast("long").alias("n"))
            .select(F.lit(c).alias("col_name"), "value", "n")
        )
        counted = part if counted is None else counted.unionAll(part)
    w = Window.partitionBy("col_name").orderBy(F.col("n").desc(), F.col("value"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
    )


_VALUE_COUNTS_ORACLE = (
    "WITH counted AS ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, {c} AS value, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY {c}"
        for c in _VC_COLS
    )
    + ") SELECT col_name, value, n, CAST(ROW_NUMBER() OVER "
    "(PARTITION BY col_name ORDER BY n DESC, value) AS BIGINT) AS rank "
    "FROM counted QUALIFY rank <= 5"
)


QUERIES = {
    "profile_table_stats": profile_table_stats,
    "profile_value_counts": profile_value_counts,
}

ORACLES = {
    "profile_table_stats": _TABLE_STATS_ORACLE,
    "profile_value_counts": _VALUE_COUNTS_ORACLE,
}
