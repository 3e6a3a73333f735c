"""Structural pins for the scaling-curve probe (round 6).

scripts/scale_curve.py measures warm-time growth across the three
testdata tiers at round close; these tests pin the cheap invariants —
every probed op is registered with a real driving table, superlinear
declarations carry reviewable reasons, and the declared set stays the
documented quadratic-baseline family (an op silently joining it would
hide a scale regression).
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "scale_curve",
    Path(__file__).resolve().parent.parent / "scripts" / "scale_curve.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_probed_ops_are_registered_with_real_tables():
    from pserv_spark.registry import build_queries

    qs = build_queries()
    unknown = sorted(set(_MOD.DRIVING_TABLE) - set(qs))
    assert not unknown, f"probed ops not in the registry: {unknown}"
    for sf_dir in _MOD.TIERS:
        for table in set(_MOD.DRIVING_TABLE.values()):
            assert Path(f"{sf_dir}/{table}.parquet").exists(), (sf_dir, table)


def test_superlinear_declarations_are_probed_and_reviewable():
    stray = sorted(set(_MOD.SUPERLINEAR_DECLARED) - set(_MOD.DRIVING_TABLE))
    assert not stray, f"declared ops not probed: {stray}"
    for name, reason in _MOD.SUPERLINEAR_DECLARED.items():
        assert len(reason) > 30, f"{name}: reason too thin to review"
    # The declared set is exactly the documented quadratic-baseline /
    # dense-output family; growing it needs a written case here.
    assert set(_MOD.SUPERLINEAR_DECLARED) == {
        "vec_cosine_pairs",
        "dedup_embedding_cosine",
        "dedup_jaccard",
    }


def test_committed_artifact_is_complete_and_clean():
    """VERDICT r8 #1: a partial or truncated sweep must never ship as
    the committed gate artifact — rounds 7 and 8 each ended with a
    stale/clobbered gate file at HEAD.  The committed SCALECURVE.json
    must cover exactly the probe's DRIVING_TABLE op set and record
    zero violations; a subset re-run writes SCALECURVE.partial.json
    and can never satisfy this pin."""
    import json

    artifact = json.loads(
        (Path(__file__).resolve().parent.parent / "SCALECURVE.json").read_text()
    )
    assert set(artifact["ops"]) == set(_MOD.DRIVING_TABLE), (
        sorted(set(_MOD.DRIVING_TABLE) - set(artifact["ops"]))[:5],
        sorted(set(artifact["ops"]) - set(_MOD.DRIVING_TABLE))[:5],
    )
    assert artifact["violations"] == 0
