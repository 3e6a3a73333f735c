"""The driver hashes result values at full float precision, and its
session's parallelism is not ours — so every query's result multiset
must be identical under a different execution layout (shuffle fan-out,
scan splits, AQE coalescing).  scripts/audit_determinism.py runs all
313 ids under two layouts at round close (DETERMINISM.json); these
tests pin the cheap pieces so a layout-sensitive query fails CI, not
just the round-end audit.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "audit_determinism",
    Path(__file__).resolve().parent.parent / "scripts" / "audit_determinism.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_fingerprint_is_layout_and_order_insensitive(spark):
    """Same multiset, different row order / partition count / column
    order → same fingerprint; different values → different."""
    rows = [(i % 5, float(i) * 0.1) for i in range(100)]
    a = spark.createDataFrame(rows, "k int, v double").repartition(16)
    b = spark.createDataFrame(list(reversed(rows)), "k int, v double").coalesce(1)
    c = b.select("v", "k")  # column order must not matter (driver sorts)
    fp = _MOD.result_fingerprint
    assert fp(a) == fp(b) == fp(c)
    d = spark.createDataFrame(rows[:-1] + [(0, 9.9)], "k int, v double")
    assert fp(d) != fp(a)


def test_variant_confs_are_runtime_settable_and_restored(spark):
    """Every pass-B override must be settable on a live session (the
    audit flips them mid-process) and must actually change the value."""
    for key, value in _MOD.VARIANT_CONFS.items():
        before = spark.conf.get(key)
        assert before != value, f"{key}: variant equals the default — no variance"
        spark.conf.set(key, value)
        assert spark.conf.get(key) == value
        spark.conf.set(key, before)
        assert spark.conf.get(key) == before


def test_float_aggregate_hash_stable_across_layouts(spark, sf_smoke):
    """Live spot-pin on the flagship float-heavy aggregation: Q1's
    SUM(double) columns must hash identically when the shuffle hashes
    rows into 7 partitions over 512x smaller scan splits — i.e. the
    output is rounded/stabilized enough that partial-sum reassociation
    cannot reach the driver's repr()-precision hash."""
    from pserv_spark.registry import build_queries

    q = build_queries()["agg_groupby_q1"]
    fp = _MOD.result_fingerprint
    base = fp(q(spark, sf_smoke))
    saved = {k: spark.conf.get(k) for k in _MOD.VARIANT_CONFS}
    try:
        for k, v in _MOD.VARIANT_CONFS.items():
            spark.conf.set(k, v)
        variant = fp(q(spark, sf_smoke))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert base == variant
