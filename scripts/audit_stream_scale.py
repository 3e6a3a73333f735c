#!/usr/bin/env python
"""Streaming STATE-GROWTH curves across data decades — the measured
version of STREAMSTATE.json's boundedness declarations.

audit_stream_state.py checks each streaming op's state rows once and
carries a WRITTEN reason why that state stays bounded at any corpus
scale.  This audit measures the claim: every stateful op runs at
sf0.01, sf0.1 and (when built by scripts/make_sf1.py) sf1 — a 100×
span of input data — and the final state-store row count is gated
against the op's DECLARED growth driver:

- ``const``  — state keyed by a schema-bounded set (event types,
  cohorts, value bins, days of the fixed time span, FITS bands,
  windows in flight under a watermark): rows must stay flat while
  input grows 100×.
- ``users``  — state keyed by user (per-user running counts, dedup
  keys, open sessions): rows may grow with DISTINCT user_id, which
  the tier replication grows 10× per decade — still metadata-sized
  at any scale (state ∝ entities, not observations).
- ``events`` — join buffers bounded by the watermark horizon: rows
  may grow with events-per-horizon (stream density), the documented
  cost of a range join at 10× density.
- ``stateless`` — zero state operators at every tier.

The gate per decade segment: rows_hi ≤ 1.5 × driver_ratio × rows_lo
+ 8 (absolute slack keeps single-digit counts out of the ratio
noise).  A `const` op whose state follows the data 10× is exactly the
unbounded-state bug this exists to catch one decade before a cluster
sees it.

Round 9 (VERDICT r8 #6) additionally gates state BYTES per row: the
store-reported memoryUsedBytes / numRowsTotal must stay roughly flat
across tiers (cap 2× + 1 KiB slack) — row counts alone miss per-row
payload bloat, e.g. a list-accumulating buffer whose row count is
constant while each row's value follows the input.

Run:  python scripts/audit_stream_scale.py
Writes STREAMSCALE.json; exit 1 on any violated segment.
Derby note: includes stream_jdbc_sink — never run concurrently with
driver_sim / plan_lint / pytest (single-JVM lock).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TIERS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SF1 = str(REPO / ".testdata" / "sf1")
TIER_NAMES = ["sf0.01", "sf0.1", "sf1"]

#: op id -> declared growth driver for its state rows.
STATE_DRIVER: dict[str, str] = {
    "stream_cdc_apply": "stateless",
    "stream_checkpoint_resume": "const",  # 10 cohorts by construction
    "stream_dedup_keys": "users",  # (user_id, event_type) keys
    "stream_fitslike_tail": "const",  # |bands| = 10
    "stream_hopping_complete": "const",  # 2 x days x |types|, span fixed
    "stream_jdbc_sink": "const",  # |event types| = 5
    "stream_late_drop_audit": "const",  # windows in flight under 1h wm
    "stream_psi_monitor": "const",  # days x 10 value bins
    "stream_rollup_upsert": "const",  # days x types
    "stream_session_window": "users",  # open sessions per active user
    "stream_stateful_counts": "users",  # one GroupState row per user
    "stream_static_join": "stateless",
    "stream_stream_join": "events",  # both-side buffers per wm horizon
    "stream_topk_maintain": "users",  # per-user counts feed the top-k
    "stream_tumbling_complete": "const",  # days x types
    "stream_tumbling_watermark": "const",  # in-flight windows under wm
}


def _driver_cardinality(sf_dir: str, driver: str) -> int:
    import pyarrow.parquet as pq

    if driver in ("const", "stateless"):
        return 1
    pf = pq.ParquetFile(f"{sf_dir}/events.parquet")
    if driver == "events":
        return pf.metadata.num_rows
    import duckdb

    return duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]


def main() -> int:
    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session
    from pserv_spark.streaming import jobs as stream_jobs

    tiers = list(TIERS)
    if Path(SF1, "events.parquet").exists():
        tiers.append(SF1)
    tier_names = TIER_NAMES[: len(tiers)]

    spark = get_session("audit_stream_scale")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    report: dict[str, dict] = {}
    violations = 0
    t_start = time.time()
    for name, driver in STATE_DRIVER.items():
        rows_per_tier: list[int] = []
        rows_sum_per_tier: list[int] = []
        bytes_per_tier: list[int] = []
        err = None
        for sf_dir in tiers:
            captured: list[tuple[str, list]] = []
            stream_jobs.STATE_CAPTURE = captured
            try:
                queries[name](spark, sf_dir).collect()
            except Exception as e:  # noqa: BLE001
                err = repr(e)[:160]
                break
            finally:
                stream_jobs.STATE_CAPTURE = None
            ops = [op for _label, op_list in captured for op in op_list]
            rows_per_tier.append(
                max((op.get("numRowsTotal") or 0 for op in ops), default=0)
            )
            rows_sum_per_tier.append(sum(op.get("numRowsTotal") or 0 for op in ops))
            bytes_per_tier.append(sum(op.get("memoryUsedBytes") or 0 for op in ops))
        if err is not None:
            report[name] = {"err": err}
            violations += 1
            continue
        # Bytes-per-state-row across tiers (VERDICT r8 #6): row counts
        # miss per-row state BLOAT (e.g. a list-accumulating buffer
        # whose rows stay flat while each row's payload follows the
        # data).  Store-reported memoryUsedBytes / total rows must stay
        # roughly constant per op as input grows 10x per decade.
        bpr = [
            round(b / r, 1) if r else None
            for b, r in zip(bytes_per_tier, rows_sum_per_tier)
        ]
        row: dict = {
            "driver": driver,
            "state_rows": dict(zip(tier_names, rows_per_tier)),
            "state_bytes": dict(zip(tier_names, bytes_per_tier)),
            "bytes_per_row": dict(zip(tier_names, bpr)),
        }
        bad = []
        for hi in range(1, len(bpr)):
            lo_v, hi_v = bpr[hi - 1], bpr[hi]
            if lo_v is None or hi_v is None:
                continue
            cap_b = 2.0 * lo_v + 1024  # 2x ratio + absolute slack for
            # store overhead on single-digit row counts
            if hi_v > cap_b:
                bad.append(
                    f"{tier_names[hi - 1]}->{tier_names[hi]}: "
                    f"bytes/row {lo_v}->{hi_v} vs cap {cap_b:.0f} "
                    "(per-row state bloat)"
                )
        if driver == "stateless":
            bad += [f"{t}: {r} state rows" for t, r in zip(tier_names, rows_per_tier) if r]
        else:
            for hi in range(1, len(rows_per_tier)):
                d_ratio = _driver_cardinality(tiers[hi], driver) / max(
                    _driver_cardinality(tiers[hi - 1], driver), 1
                )
                cap = 1.5 * d_ratio * rows_per_tier[hi - 1] + 8
                if rows_per_tier[hi] > cap:
                    bad.append(
                        f"{tier_names[hi - 1]}->{tier_names[hi]}: "
                        f"{rows_per_tier[hi - 1]}->{rows_per_tier[hi]} rows "
                        f"vs cap {cap:.0f} (driver x{d_ratio:.1f})"
                    )
        if bad:
            row["verdict"] = "VIOLATION: " + "; ".join(bad)
            violations += 1
        else:
            row["verdict"] = "ok"
        report[name] = row
        print(f"{name:28s} {driver:9s} {rows_per_tier} {row['verdict'][:40]}")

    out = {
        "tiers": tier_names,
        "n_ops": len(report),
        "violations": violations,
        "elapsed_s": round(time.time() - t_start, 1),
        "ops": report,
    }
    import os

    target = REPO / "STREAMSCALE.json"
    tmp = target.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(out, indent=1, sort_keys=True))
    os.replace(tmp, target)
    print(json.dumps({"n_ops": len(report), "violations": violations}))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
