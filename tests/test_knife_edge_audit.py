"""Numeric knife-edge robustness: rounding boundaries and sign flips.

scripts/audit_knife_edge.py sweeps all 313 ids against a tier whose
measures are planted ON the exactly-representable rounding boundaries
(n + 0.5, odd eighths, exact integers, negatives, zeros) at round
close (KNIFEEDGE.json); these tests pin the tier builder and the one
fix the first round-7 sweep produced: `lightcurve_periodogram`'s
cross-engine divergence when a per-bin scatter lands within one ulp of
an exact 6-decimal half-boundary.  A double->DECIMAL cast rounds the
true binary value in Java but the shortest decimal representation in
DuckDB; the fix (relational_ext.py) FLOOR-quantizes the same IEEE
double on both sides instead — floor of an identical double is
bit-identical everywhere.  VERDICT r7 "What's wrong" #1 asked for this
regression test so the only SURVEY §4.5 fix without a dedicated pin
gets one.
"""

from __future__ import annotations

import importlib.util
import tempfile
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "audit_knife_edge",
    Path(__file__).resolve().parent.parent / "scripts" / "audit_knife_edge.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


@pytest.fixture(scope="module")
def knife_tier(sf_smoke) -> str:
    tmp = tempfile.mkdtemp(prefix="pserv_knife_pin_")
    changed = _MOD.build_knife_tier(sf_smoke, tmp)
    # the builder must actually plant boundaries in every targeted table
    assert changed["events"] > 0
    assert changed["lineitem"] > 0
    assert changed["orders"] > 0
    return tmp


def test_tier_plants_every_boundary_class(spark, knife_tier):
    ev = spark.read.parquet(f"{knife_tier}/events.parquet")
    vals = {
        r.k: r.n
        for r in ev.where("value IS NOT NULL")
        .selectExpr("event_id % 8 AS k")
        .groupBy("k")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    # every planted class is populated at sf0.001
    assert all(vals.get(k, 0) > 0 for k in (0, 1, 2, 3))
    halves = ev.where("event_id % 8 = 0 AND value IS NOT NULL").selectExpr(
        "min(value - floor(value)) AS lo", "max(value - floor(value)) AS hi"
    ).collect()[0]
    assert halves.lo == 0.5 and halves.hi == 0.5  # exact .5, bit-true
    negs = ev.where("event_id % 8 = 2 AND value > 0").count()
    assert negs == 0


def test_allowlist_entries_are_registered_and_reasoned():
    from pserv_spark.registry import build_queries

    names = set(build_queries())
    for name, reason in _MOD.KNIFE_ALLOWED.items():
        assert name in names, f"stale KNIFE_ALLOWED entry: {name}"
        assert len(reason) > 20, f"{name}: reason too thin to review"


def test_periodogram_matches_oracle_on_knife_tier(spark, knife_tier):
    """Round-7 regression: planted x.5 / x.125 event values drive
    per-bin scatters onto exact 6dp half-boundaries, where the old
    double->DECIMAL(21,6) cast flipped one ulp between engines.  The
    floor-quantized dispersion must hash-match DuckDB exactly."""
    from pserv_spark.registry import build_oracles, build_queries
    from pserv_spark.testing import compare_df_to_duckdb

    df = build_queries()["lightcurve_periodogram"](spark, knife_tier)
    res = compare_df_to_duckdb(
        "lightcurve_periodogram",
        df,
        build_oracles()["lightcurve_periodogram"],
        knife_tier,
    )
    assert res.ok, f"{res.detail} {res.mismatches[:2]}"
    assert res.spark_rows > 0


def test_dispersion_is_never_negative(spark, knife_tier):
    """ADVICE r7 #2: the double cancellation s2 - s^2/n can dip below
    zero; the clamp must keep every dispersion (a pooled variance)
    non-negative even on the hostile tier."""
    from pserv_spark.registry import build_queries

    df = build_queries()["lightcurve_periodogram"](spark, knife_tier)
    assert df.where("dispersion < 0").count() == 0
