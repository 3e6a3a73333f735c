"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pserv_spark``; this module only adapts it to
the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pserv_spark.registry import build_queries, build_oracles

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (join_multiway_q5 — the 6-table star join that
    mirrors Pserv's Object ⋈ ForcedSource ⋈ CcdVisit light-curve join
    shape, SURVEY §2.2) on sf0.001."""
    return build_queries()["join_multiway_q5"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (canonical views inlined as
    CTEs — the driver pre-registers only the ten raw tables)."""
    return build_oracles()
