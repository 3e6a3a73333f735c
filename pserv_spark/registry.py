"""Query registry — the single source for ``__spark_entry__.queries()``.

Resolution order per query id:

1. A DataFrame program from ``pserv_spark.queries`` (idiomatic
   DataFrame-API re-expression; differentially tested against the SQL
   form).
2. The validated Spark SQL string from ``pserv_spark.corpus`` run on
   the catalog views (SURVEY §7: "prefer spark.sql on the registered
   views where the API adds no value — it is exactly what was
   validated").

Extension operators (dedup/LSH, ANN, text analysis, ingestion,
streaming) register additional entries + oracles via their modules'
``QUERIES`` / ``ORACLES`` dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import corpus
from .catalog import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]


def _sql_runner(name: str) -> QueryFn:
    sql = corpus.SPARK_SQL[name]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return spark.sql(sql)

    run.__name__ = f"q_{name}"
    run.__doc__ = f"Corpus query {name!r} (SURVEY.md Appendix A), SQL form."
    return run


def build_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {name: _sql_runner(name) for name in corpus.QUERY_NAMES}

    # DataFrame-API re-expressions override the SQL fallback.
    from .queries import DATAFRAME_QUERIES

    out.update(DATAFRAME_QUERIES)

    # Extension operator surface (adds new ids, never overrides corpus ids).
    from .operators import EXTENSION_QUERIES

    for name, fn in EXTENSION_QUERIES.items():
        if name in corpus.QUERY_NAMES:
            raise ValueError(f"extension query {name!r} collides with corpus id")
        out[name] = fn
    return out


def build_oracles() -> dict[str, str]:
    out = dict(corpus.ORACLE_SQL)

    from .operators import EXTENSION_ORACLES

    out.update(EXTENSION_ORACLES)
    return out
