"""Pruned-to-nothing robustness: at 100 TB an EMPTY scan is a normal
execution state (partition pruning, tight predicates, tenant slices),
so operators must return the oracle answer on 0-row base tables — not
crash on schema inference, NULL driver scalars, or empty manifests.
scripts/audit_empty_input.py sweeps all 313 ids at round close
(EMPTYINPUT.json); these tests pin the mechanism and the specific
regression classes the round-6 sweep found and fixed.
"""

from __future__ import annotations

import importlib.util
import tempfile
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "audit_empty_input",
    Path(__file__).resolve().parent.parent / "scripts" / "audit_empty_input.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


@pytest.fixture(scope="module")
def empty_tier(sf_smoke) -> str:
    tmp = tempfile.mkdtemp(prefix="pserv_empty_pin_")
    _MOD.build_empty_tier(sf_smoke, tmp)
    return tmp


def test_empty_tier_mirrors_schemas_as_single_files(spark, sf_smoke, empty_tier):
    """Single parquet FILES (DuckDB and Spark take the same literal
    path) with zero rows and the source schema."""
    import pyarrow.parquet as pq

    for t in _MOD.TABLES:
        src = pq.read_schema(f"{sf_smoke}/{t}.parquet")
        dst = Path(empty_tier) / f"{t}.parquet"
        assert dst.is_file()
        assert pq.read_schema(dst).equals(src)
        assert spark.read.parquet(str(dst)).count() == 0


def test_allowlist_entries_are_registered_and_reasoned():
    from pserv_spark.registry import build_queries

    names = set(build_queries())
    for name, reason in _MOD.EMPTY_ALLOWED.items():
        assert name in names, f"stale EMPTY_ALLOWED entry: {name}"
        assert len(reason) > 20, f"{name}: reason too thin to review"


def test_materialized_store_roundtrip_survives_empty_input(spark, empty_tier):
    """The round-6 sweep's biggest find: ops that write an intermediate
    parquet store and read it back crashed on inference when the input
    pruned to zero rows (Spark writes no part files).  Pin one per
    store family: rollup serve, purge rewrite, snapshot time travel."""
    from pserv_spark.operators.rollup import rollup_serve_monthly
    from pserv_spark.operators.lifecycle_ops import purge_erasure_rewrite
    from pserv_spark.operators.pipeline_ops import layout_snapshot_timetravel

    assert rollup_serve_monthly(spark, empty_tier).count() == 0
    assert purge_erasure_rewrite(spark, empty_tier).count() == 0
    # snapshot time travel: the two as-of GLOBAL aggregates still emit
    # their summary rows (count 0) over the empty manifests
    rows = layout_snapshot_timetravel(spark, empty_tier).collect()
    assert sorted((r.version, r.n_rows) for r in rows) == [(1, 0), (2, 0)]


def test_driver_scalar_ops_survive_empty_input(spark, empty_tier):
    """Ops seeding iteration from a collected scalar must degrade to an
    empty result, not divide by zero / index past an empty list."""
    from pserv_spark.operators.iterative import (
        graph_pagerank,
        sample_coreset_kcenter,
    )

    assert graph_pagerank(spark, empty_tier).count() == 0
    assert sample_coreset_kcenter(spark, empty_tier).count() == 0


def test_kmv_set_algebra_rows_survive_missing_side(spark, empty_tier):
    """The sketch sides are global aggregates, not filters: the union /
    intersection estimate rows must exist (NULL estimates) even when an
    event type — or the whole input — was pruned away."""
    from pserv_spark.operators.sketches import sketch_kmv_distinct

    rows = {r.set_expr: r for r in sketch_kmv_distinct(spark, empty_tier).collect()}
    assert set(rows) == {"click|view", "click&view"}
    assert all(r.n_exact == 0 and r.estimate is None for r in rows.values())


def test_stream_sink_reader_handles_absent_and_empty_sinks(spark):
    """Zero micro-batches (dir never created) and empty dynamic-
    partition writes (dir with no part files) both read back as an
    empty frame of the declared schema."""
    from pserv_spark.streaming.jobs import _read_sink

    schema = "k long, v string"
    missing = tempfile.mkdtemp(prefix="pserv_sink_") + "/never_created"
    assert _read_sink(spark, missing, schema).count() == 0
    empty_dir = tempfile.mkdtemp(prefix="pserv_sink_empty_")
    assert _read_sink(spark, empty_dir, schema).count() == 0
    assert _read_sink(spark, empty_dir, schema).columns == ["k", "v"]
