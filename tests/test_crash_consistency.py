"""Crash-consistency pins for the manifest-snapshot layout family.

scripts/audit_crash_consistency.py kills the snapshot writer in every
distinct phase (mid-data-write, pre-manifest-commit, mid-manifest-
publish, speculative-task leftovers, commit-protocol temporaries) and
checks that manifest reads, vacuum, and publish recovery each honor
their contract (CRASHCONSISTENCY.json at round close).  These tests
run the full scenario suite at sf0.001 inside pytest so a regression
in any layout op fails the gate, not just the round-close artifact.
"""

from __future__ import annotations

import importlib.util
import tempfile
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "audit_crash_consistency",
    Path(__file__).resolve().parent.parent
    / "scripts"
    / "audit_crash_consistency.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


@pytest.fixture(scope="module")
def scenarios(spark, sf_smoke):
    import shutil

    scratch = tempfile.mkdtemp(prefix="pserv_crash_pin_")
    try:
        yield _MOD.run_scenarios(spark, sf_smoke, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_snapshot_reads_survive_all_five_corpses(scenarios):
    s = scenarios["snapshot_reads_unaffected"]
    assert s["ok"], s
    # the fixture is non-degenerate: both versions carry rows
    assert s["pre"]["v1"]["n_rows"] > 0
    assert s["pre"]["v2"]["n_rows"] > s["pre"]["v1"]["n_rows"]


def test_naive_directory_read_is_not_silently_correct(scenarios):
    """The measured reason the manifest is the contract: a plain
    directory scan either fails on the torn file or counts the
    orphan — it must never silently return the committed answer."""
    s = scenarios["naive_reader_diverges"]
    assert s["ok"], s


def test_vacuum_removes_exactly_the_debris(scenarios):
    s = scenarios["vacuum_removes_exactly_debris"]
    assert s["ok"], s
    assert len(s["removed"]) == 3  # d1 orphan, d2 torn, d3 hidden temp
    assert s["survivors_intact"]


def test_reads_after_vacuum_match_pre_debris(scenarios):
    assert scenarios["post_vacuum_reads_identical"]["ok"]


def test_publish_recovery(scenarios):
    s = scenarios["publish_recovery_resumes"]
    assert s["sentinel_less_dir_replaced"], s
    assert s["complete_peer_respected"], s


def test_sink_replay_converges_after_mid_run_kill(spark, sf_smoke):
    """Round 9 (VERDICT r8 #7): one executable pin of the streaming-
    sink replay contract inside pytest — the CDC merge sink is killed
    AFTER publishing micro-batch 1 but BEFORE its checkpoint commit
    (the exactly-once-by-idempotence case: the restart replays batch 1
    and must not double-apply), then restarted from the same
    checkpoint; the served store must equal the clean run's rows.  The
    full 5-phase matrix over all four sinks runs in
    scripts/audit_crash_consistency.py (CRASHCONSISTENCY.json)."""
    fault_scenarios = [
        s for s in _MOD.SINK_SCENARIOS if s == ("stream_cdc_apply", "after_publish", 1)
    ]
    assert fault_scenarios, "pinned scenario dropped from SINK_SCENARIOS"
    orig = _MOD.SINK_SCENARIOS
    _MOD.SINK_SCENARIOS = fault_scenarios
    try:
        out = _MOD.run_stream_sink_scenarios(spark, sf_smoke)
    finally:
        _MOD.SINK_SCENARIOS = orig
    (row,) = out.values()
    assert row.get("crash_injected"), row
    assert row.get("converged"), row
    assert row["ok"], row


def test_sink_scenarios_cover_all_four_sinks_and_both_phases():
    ops = {s[0] for s in _MOD.SINK_SCENARIOS}
    assert ops == {
        "stream_cdc_apply",
        "stream_rollup_upsert",
        "stream_topk_maintain",
        "stream_jdbc_sink",
    }
    assert {s[1] for s in _MOD.SINK_SCENARIOS} == {
        "before_publish",
        "after_publish",
    }
    assert len(_MOD.SINK_SCENARIOS) >= 4
