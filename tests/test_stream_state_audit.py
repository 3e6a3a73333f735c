"""Every stateful streaming op must declare why its state is bounded.

At 100 TB the failure mode of a stateful stream is unbounded state
growth (no watermark eviction, no key-cardinality bound) — invisible
to finite correctness runs by construction.
scripts/audit_stream_state.py keeps the per-op declaration + the
captured state-store metrics (STREAMSTATE.json); these tests pin the
cheap structural properties so a new streaming id or a dropped
watermark fails CI, not just the round-end audit.  The full audit
(executes all 16 jobs) runs at round close.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "audit_stream_state",
    Path(__file__).resolve().parent.parent / "scripts" / "audit_stream_state.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_every_registered_stream_has_a_state_declaration():
    from pserv_spark.registry import build_queries

    streams = {n for n in build_queries() if n.startswith("stream_")}
    undeclared = sorted(streams - set(_MOD.STATE_BOUNDS))
    stale = sorted(set(_MOD.STATE_BOUNDS) - streams)
    assert not undeclared, (
        "streaming ids with no state-boundedness declaration — add them "
        f"to scripts/audit_stream_state.py STATE_BOUNDS with why: {undeclared}"
    )
    assert not stale, f"STATE_BOUNDS entries with no registered stream: {stale}"


def test_state_declarations_carry_class_and_reason():
    for name, (klass, reason) in _MOD.STATE_BOUNDS.items():
        assert klass in {"watermark", "keys", "stateless"}, (name, klass)
        assert len(reason) > 20, f"{name}: reason too thin to review"


def test_state_capture_hook_reports_eviction_and_statelessness(spark, sf_smoke):
    """Live spot-pins for the three declaration classes: a watermarked
    agg actually evicts, a stream-static join actually holds no state,
    and a complete-mode agg holds key-count rows."""
    from pserv_spark.streaming import jobs as stream_jobs

    def run(fn):
        captured: list[tuple[str, list]] = []
        stream_jobs.STATE_CAPTURE = captured
        try:
            fn(spark, sf_smoke).collect()
        finally:
            stream_jobs.STATE_CAPTURE = None
        return [op for _label, ops in captured for op in ops]

    # stream-static join: declared stateless, reports no state operator.
    assert run(stream_jobs.stream_static_join) == []

    # watermarked tumbling agg: closed windows are REMOVED from state.
    wm_ops = run(stream_jobs.stream_tumbling_watermark)
    assert wm_ops and sum(op["numRowsRemoved"] for op in wm_ops) > 0

    # complete-mode agg: state rows == emitted group count (keys-bounded).
    agg = stream_jobs.stream_tumbling_complete(spark, sf_smoke)
    n_groups = agg.count()
    cm_ops = run(stream_jobs.stream_tumbling_complete)
    assert cm_ops and cm_ops[-1]["numRowsTotal"] == n_groups
