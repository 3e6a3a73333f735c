"""Differential DuckDB-oracle tests for the full corpus at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01); sf0.001 keeps
the suite fast enough for the inner loop.  scripts/check_corpus.py runs
the same comparison at any sf.
"""

from __future__ import annotations

import pytest

from pserv_spark.registry import build_queries, build_oracles
from pserv_spark.testing import compare_df_to_duckdb

QUERIES = build_queries()
ORACLES = build_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_smoke, name):
    df = QUERIES[name](spark, sf_smoke)
    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible op): must at least run.
        assert df.count() >= 0
        return
    res = compare_df_to_duckdb(name, df, ORACLES[name], sf_smoke)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:2]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]


def test_registry_consistency():
    # Every oracle key must have a query; corpus queries all registered.
    from pserv_spark import corpus

    for name in ORACLES:
        assert name in QUERIES, f"oracle {name!r} without query"
    for name in corpus.QUERY_NAMES:
        assert name in QUERIES
