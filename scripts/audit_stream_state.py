#!/usr/bin/env python
"""Streaming state-boundedness audit — the stateful 100 TB gate.

A stateful streaming operator's failure mode at scale is UNBOUNDED
STATE GROWTH: with no watermark eviction and no key-cardinality bound,
the state store grows with the stream and eventually OOMs/stalls every
executor holding it — and a finite correctness run can never see it,
because bounded input means bounded state by construction.  This audit
makes boundedness a DECLARED, CHECKED property, the streaming
counterpart of scripts/audit_driver_collects.py:

- Runs every streaming id with ``streaming.jobs.STATE_CAPTURE`` set and
  records each job's state-operator metrics (numRowsTotal /
  numRowsUpdated / numRowsRemoved from the last progress event).
- Every op carries a written boundedness class + reason below.  A
  stateful op with no declaration, or a declared-stateless op that
  reports state operators, is a violation.
- Classes: ``watermark`` (state evicted by event-time watermark —
  bounded by the lateness window), ``keys`` (state = one row per
  group key; bounded because the keyspace is, or documented with the
  upgrade path when it grows with the corpus), ``stateless`` (no state
  operator expected — e.g. stream-static joins, foreachBatch-only
  pipelines).

Run:  python scripts/audit_stream_state.py [sf_dir]
Writes STREAMSTATE.json (committed) and exits 1 on undeclared /
misdeclared state.  Derby note: includes stream_jdbc_sink — do not run
concurrently with driver_sim / plan_lint / pytest (single-JVM lock).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

#: op id -> (class, why the state is bounded at ANY corpus scale).
STATE_BOUNDS: dict[str, tuple[str, str]] = {
    "stream_tumbling_complete": (
        "keys",
        "complete-mode tumbling agg: one state row per (day x event_type) "
        "window — time-linear in DAYS (~365/yr x |types|), metadata-sized",
    ),
    "stream_hopping_complete": (
        "keys",
        "hopping windows overlap 2x: state = 2 x days x |types| — same "
        "metadata-sized class as tumbling",
    ),
    "stream_dedup_keys": (
        "keys",
        "dropDuplicates on (user_id, event_type) with NO watermark: state "
        "= |distinct keys|, which this schema bounds (users x types). If "
        "the keyspace grew with the corpus (e.g. event_id), the upgrade "
        "path is dropDuplicatesWithinWatermark — time-scoped dedup state",
    ),
    "stream_session_window": (
        "watermark",
        "1h watermark evicts closed sessions; state = open sessions only",
    ),
    "stream_stateful_counts": (
        "keys",
        "applyInPandasWithState per-user running count, "
        "GroupStateTimeout.NoTimeout: state = |users| longs (8B each; "
        "1B users ~ 8 GB sharded over the cluster's state stores). For "
        "an unbounded keyspace the upgrade path is a "
        "ProcessingTimeTimeout TTL evicting idle keys",
    ),
    "stream_tumbling_watermark": (
        "watermark",
        "1h watermark on the windowed agg evicts closed windows",
    ),
    "stream_static_join": (
        "stateless",
        "stream-static join keeps NO stream state (the static side is a "
        "batch relation re-read per micro-batch)",
    ),
    "stream_stream_join": (
        "watermark",
        "both sides watermarked 1h: join state evicted past the lateness "
        "window on each side",
    ),
    "stream_rollup_upsert": (
        "keys",
        "complete-mode daily rollup feeding foreachBatch: state = days x "
        "|types| (the parquet store is partition-surgically overwritten, "
        "but the AGG state itself is the metadata-sized rollup)",
    ),
    "stream_topk_maintain": (
        "keys",
        "complete-mode per-user counts feeding a k-row publish: state = "
        "|users| rows. The k-row STORE rewrite is the scalable part; for "
        "an unbounded keyspace the upgrade path is a count-min/space-"
        "saving sketch maintained in applyInPandasWithState",
    ),
    "stream_late_drop_audit": (
        "watermark",
        "1h watermark — the op EXISTS to pin eviction/drop semantics",
    ),
    "stream_checkpoint_resume": (
        "keys",
        "update-mode agg keyed by cohort = user_id % 10: exactly 10 state "
        "rows at any scale",
    ),
    "stream_cdc_apply": (
        "stateless",
        "append-mode foreachBatch MERGE: per-batch reduce + bucketed "
        "parquet overwrite; no streaming state operator (the store is "
        "the sink, compacted per batch, not executor state)",
    ),
    "stream_psi_monitor": (
        "keys",
        "complete-mode agg on (day x 10 value-bins): days x 10 rows",
    ),
    "stream_jdbc_sink": (
        "keys",
        "complete-mode per-event_type agg: |types| rows (single digits)",
    ),
    "stream_fitslike_tail": (
        "keys",
        "complete-mode agg over the FITS tail's band column: |bands| rows",
    ),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session
    from pserv_spark.streaming import jobs as stream_jobs

    spark = get_session("audit_stream_state")
    spark.sparkContext.setLogLevel("ERROR")

    queries = build_queries()
    report: dict[str, dict] = {}
    violations = 0
    for name, (klass, reason) in STATE_BOUNDS.items():
        captured: list[tuple[str, list]] = []
        stream_jobs.STATE_CAPTURE = captured
        try:
            queries[name](spark, sf_dir).collect()
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": repr(e)[:160]}
            violations += 1
            continue
        finally:
            stream_jobs.STATE_CAPTURE = None
        ops = [op for _label, ops in captured for op in ops]
        metrics = [
            {
                k: op.get(k)
                for k in ("operatorName", "numRowsTotal", "numRowsUpdated", "numRowsRemoved")
            }
            for op in ops
        ]
        row = {"class": klass, "reason": reason, "state_operators": metrics}
        if klass == "stateless" and ops:
            row["verdict"] = "VIOLATION: declared stateless but reports state"
            violations += 1
        elif klass != "stateless" and not captured:
            row["verdict"] = "VIOLATION: no progress captured (hook not wired?)"
            violations += 1
        elif klass != "stateless" and not ops:
            # Bounded-but-stateless plans are fine (e.g. the engine fused
            # the agg); record it so a silent shape change is visible.
            row["verdict"] = "ok (no state operator reported)"
        else:
            row["verdict"] = "ok"
        report[name] = row

    registered_streams = [n for n in queries if n.startswith("stream_")]
    undeclared = sorted(set(registered_streams) - set(STATE_BOUNDS))
    if undeclared:
        report["_undeclared"] = {
            "verdict": f"VIOLATION: streaming ids with no state declaration: {undeclared}"
        }
        violations += len(undeclared)

    out = {"violations": violations, "n_ops": len(STATE_BOUNDS), "ops": report}
    (REPO / "STREAMSTATE.json").write_text(json.dumps(out, indent=1, sort_keys=True))
    print(json.dumps(out, indent=1, sort_keys=True))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
