"""User-facing connection API — the reference's surface, Spark-first.

The reference exposes a thin DB layer (public repo
python/desc/pserv/Pserv.py, SURVEY §2.1): a kwargs-keyed pool of
``DbConnection`` objects with ``apply(query, cursorFunc)`` /
``run_script(script)``, plus the bulk-load helpers
(``create_csv_file_from_fits`` / ``load_csv`` / ``create_table``).  A
reference user drives everything through exactly these calls, so this
module mirrors them 1:1 on a SparkSession:

=====================================  ====================================
reference (MySQL)                      this engine (Spark)
=====================================  ====================================
``DbConnection(**db_info)``            ``connect(sf_dir=...)`` (pooled)
``conn.apply(sql, cursorFunc)``        ``conn.apply(sql, cursor_func)``
``conn.run_script(path)``              ``conn.run_script(path)``
``create_table(conn, name, ddl)``      ``conn.create_table(name, schema)``
``create_csv_file_from_fits(...)``     ``conn.export_csv(query, path, ...)``
``conn.load_csv(table, csv)``          ``conn.load_csv(table, csv, schema)``
=====================================  ====================================

The "query capabilities" of the reference are those of the engine it
fronts (SURVEY §0); here the engine is Spark SQL/Catalyst, so ``apply``
accepts anything Spark SQL parses — including every query in the
validated corpus.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .catalog import DEFAULT_SF_DIR, load_tables
from .session import get_session
from .sources import export_csv as _export_csv
from .sources import load_csv as _load_csv

_POOL: dict[tuple[str, str], "Connection"] = {}


def connect(
    spark: SparkSession | None = None, sf_dir: str = DEFAULT_SF_DIR
) -> "Connection":
    """Pooled connection factory (the reference pools MySQLdb
    connections keyed by connection kwargs; the key here is the
    session's app id + data directory)."""
    spark = spark or get_session()
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _POOL:
        _POOL[key] = Connection(spark, sf_dir)
    return _POOL[key]


class Connection:
    """``DbConnection`` analog bound to one SparkSession + dataset."""

    def __init__(self, spark: SparkSession | None = None, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark or get_session()
        self.sf_dir = sf_dir
        load_tables(self.spark, sf_dir)

    # ------------------------------------------------------------ querying

    def apply(
        self,
        query: str,
        cursor_func: Callable[[Iterator[tuple]], Any] | None = None,
    ):
        """Execute SQL; optionally map the result rows like the
        reference's ``cursorFunc`` maps a DB cursor.

        Without ``cursor_func`` the lazy DataFrame is returned (the
        Spark-native improvement over an eager cursor); with it, rows
        are collected and passed as an iterator of tuples.
        """
        df = self.spark.sql(query)
        if cursor_func is None:
            return df
        return cursor_func(iter(tuple(r) for r in df.collect()))

    def run_script(self, path: str) -> list[DataFrame]:
        """Execute a ;-separated SQL script file, statement by
        statement (``run_script`` analog).  Lines starting with ``--``
        are comments."""
        with open(path) as fh:
            text = fh.read()
        lines = [l for l in text.splitlines() if not l.lstrip().startswith("--")]
        results = []
        for stmt in "\n".join(lines).split(";"):
            if stmt.strip():
                results.append(self.spark.sql(stmt))
        return results

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # ---------------------------------------------------------------- DDL

    def create_table(self, name: str, schema: T.StructType) -> DataFrame:
        """Register an empty table with a declared schema (the
        ``sql/create_*.sql`` + ``create_table`` path: schemas are
        declared, never inferred — SURVEY §1.1)."""
        df = self.spark.createDataFrame([], schema)
        df.createOrReplaceTempView(name)
        return df

    # --------------------------------------------------------------- bulk

    def export_csv(
        self,
        query_or_df: str | DataFrame,
        csv_path: str,
        column_mapping: dict[str, str] | None = None,
    ) -> None:
        """``create_csv_file_from_fits`` analog: result set → CSV with
        ``\\N`` null sentinels + column mapping."""
        df = (
            self.spark.sql(query_or_df)
            if isinstance(query_or_df, str)
            else query_or_df
        )
        _export_csv(df, csv_path, mapping=column_mapping)

    def load_csv(
        self,
        table_name: str,
        csv_path: str,
        schema: T.StructType,
        column_mapping: dict[str, str] | None = None,
    ) -> DataFrame:
        """``LOAD DATA LOCAL INFILE`` analog: declared-schema CSV load
        registered under ``table_name``."""
        df = _load_csv(self.spark, csv_path, schema, mapping=column_mapping)
        df.createOrReplaceTempView(table_name)
        return df
