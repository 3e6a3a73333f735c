"""Pins for the streaming state-GROWTH audit (round 8).

scripts/audit_stream_scale.py measures every stateful streaming op's
final state-store rows across sf0.01 / sf0.1 / sf1 (100x input) and
gates each decade against the op's declared growth driver
(STREAMSCALE.json at round close).  These tests pin the cheap
invariants and one executable spot check per driver class so a
declaration drifting from reality fails the gate, not just the
round-close artifact.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "audit_stream_scale",
    Path(__file__).resolve().parent.parent / "scripts" / "audit_stream_scale.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_every_streaming_op_declares_a_growth_driver():
    """The driver map must cover exactly the boundedness-audited set:
    a new streaming op without a growth declaration is the unbounded-
    state blind spot this audit exists to close."""
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "audit_stream_state",
        Path(__file__).resolve().parent.parent
        / "scripts"
        / "audit_stream_state.py",
    )
    state_mod = iu.module_from_spec(spec)
    spec.loader.exec_module(state_mod)
    assert set(_MOD.STATE_DRIVER) == set(state_mod.STATE_BOUNDS)


def test_drivers_are_known_classes():
    assert set(_MOD.STATE_DRIVER.values()) <= {
        "const",
        "users",
        "events",
        "stateless",
    }


def test_driver_cardinalities_grow_with_the_tier():
    users_lo = _MOD._driver_cardinality("/root/testdata/sf0.01", "users")
    users_hi = _MOD._driver_cardinality("/root/testdata/sf0.1", "users")
    assert users_hi == 10 * users_lo  # 150 -> 1500 by generation
    assert _MOD._driver_cardinality("/root/testdata/sf0.01", "const") == 1


def test_const_op_state_is_flat_across_a_decade(spark):
    """Executable spot check of the `const` class: the complete-mode
    tumbling rollup keys on (day x event_type), so a 10x event count
    must leave its state-store row count unchanged."""
    from pserv_spark.registry import build_queries
    from pserv_spark.streaming import jobs as stream_jobs

    fn = build_queries()["stream_tumbling_complete"]
    rows = []
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        captured: list = []
        stream_jobs.STATE_CAPTURE = captured
        try:
            fn(spark, sf_dir).collect()
        finally:
            stream_jobs.STATE_CAPTURE = None
        ops = [op for _label, op_list in captured for op in op_list]
        rows.append(max((op.get("numRowsTotal") or 0 for op in ops), default=0))
    assert rows[0] > 0
    assert rows[1] == rows[0], rows
