#!/usr/bin/env python
"""Temporal-edge robustness sweep — negative epochs, leap days, year
boundaries, far-future timestamps.

Every synthetic events row is post-1970, so every window/bucket
expression in the repo (``ts_us // width``, day spines, weekday
extraction, sessionize gaps) has only ever seen POSITIVE epoch
microseconds.  Real survey data is the opposite: astronomical epochs
reach back before 1970 (negative epoch — where floor division and
truncating division DISAGREE), calendars carry leap days, and
forward-looking tables carry far-future timestamps.

This audit builds a mirror tier that deterministically rewrites ~25%
of event timestamps onto the hostile calendar — same wall-clock time
of day, relocated date — plus matching shifts of a slice of order/ship
dates, then runs EVERY registered id against it with the same DuckDB
oracle on the same files:

- event_id % 16 == 0 -> year 1950 (negative epoch, pre-Unix)
- event_id % 16 == 1 -> 1969-12-31 (the day before epoch zero:
  ``ts_us // day`` = -1 under floor division, 0 under truncation)
- event_id % 16 == 2 -> 2024-02-29 (leap day)
- event_id % 16 == 3 -> 2199-12-31 (far future, still inside the
  pandas-nanosecond range so Arrow lanes stay valid)
- o_orderdate / l_shipdate: key % 16 == 0 -> shifted to 1950 (keeps
  the l_shipdate >= o_orderdate invariant by shifting both sides of
  an order when selected).

Ids that raise, or disagree with the oracle, fail unless allowlisted
with a written reason.  Writes TEMPORALEDGE.json; exit 1 on
unexplained failures.

Usage: python scripts/audit_temporal_edge.py [schema_sf_dir]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: id -> why a divergence on the temporal-edge tier is accepted.
_PRE_EPOCH_WATERMARK = (
    "Spark initializes the event-time watermark at epoch 0 "
    "(EventTimeWatermarkExec), so a PRE-1970 event time is below the "
    "watermark from the very first micro-batch and every watermarked "
    "stateful operator (windowed agg holdback, session windows, "
    "stream-stream join buffers, late-data drop) treats it as "
    "structurally late and drops it.  This is a Spark platform "
    "contract, not an engine defect: a production stream carrying "
    "pre-1970 event times must offset its epoch before the watermark "
    "(batch ops and non-watermarked complete-mode streams handle "
    "negative epochs exactly — verified by this audit).  The drop "
    "behavior itself is pinned on controlled input by "
    "tests/test_streaming.py and the stream_late_drop_audit oracle."
)
TEMPORAL_ALLOWED: dict[str, str] = {
    "stream_tumbling_watermark": _PRE_EPOCH_WATERMARK,
    "stream_session_window": _PRE_EPOCH_WATERMARK,
    "stream_stream_join": _PRE_EPOCH_WATERMARK,
    "stream_late_drop_audit": _PRE_EPOCH_WATERMARK,
}


def _relocate(ts, year: int, month: int | None = None, day: int | None = None):
    """Move a timestamp to (year[, month, day]) keeping time-of-day."""
    if ts is None:
        return None
    return ts.replace(year=year, month=month or ts.month, day=day or ts.day)


def build_temporal_tier(schema_sf_dir: str, dst: str) -> dict[str, int]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    changed: dict[str, int] = {}
    shifted_orders: set[int] = set()
    for t in TABLES:
        tbl = pq.read_table(f"{schema_sf_dir}/{t}.parquet")
        cols = {f.name: tbl.column(f.name) for f in tbl.schema}
        n_chg = 0
        if t == "events":
            ids = cols["event_id"].to_pylist()
            ts = cols["ts"].to_pylist()
            new = []
            for i, v in zip(ids, ts):
                k = i % 16
                if v is None:
                    new.append(v)
                elif k == 0:
                    new.append(_relocate(v, 1950))
                elif k == 1:
                    new.append(_relocate(v, 1969, 12, 31))
                elif k == 2:
                    new.append(_relocate(v, 2024, 2, 29))
                elif k == 3:
                    new.append(_relocate(v, 2199, 12, 31))
                else:
                    new.append(v)
            n_chg = sum(1 for a, b in zip(ts, new) if a != b)
            cols["ts"] = pa.array(new, type=tbl.schema.field("ts").type)
        elif t == "orders":
            keys = cols["o_orderkey"].to_pylist()
            od = cols["o_orderdate"].to_pylist()
            shifted_orders = {k for k in keys if k % 16 == 0}
            new = [
                _relocate(v, 1950) if (k in shifted_orders and v is not None) else v
                for k, v in zip(keys, od)
            ]
            n_chg = sum(1 for a, b in zip(od, new) if a != b)
            cols["o_orderdate"] = pa.array(new, type=tbl.schema.field("o_orderdate").type)
        elif t == "lineitem":
            keys = cols["l_orderkey"].to_pylist()
            sd = cols["l_shipdate"].to_pylist()
            # same orders as above so ship >= order still holds
            new = [
                _relocate(v, 1950) if (k % 16 == 0 and v is not None) else v
                for k, v in zip(keys, sd)
            ]
            n_chg = sum(1 for a, b in zip(sd, new) if a != b)
            cols["l_shipdate"] = pa.array(new, type=tbl.schema.field("l_shipdate").type)
        out = pa.table(cols, schema=tbl.schema)
        pq.write_table(out, f"{dst}/{t}.parquet")
        changed[t] = n_chg
    return changed


def main() -> int:
    schema_sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pserv_spark.registry import build_oracles, build_queries
    from pserv_spark.session import get_session
    from pserv_spark.testing import compare_df_to_duckdb

    spark = get_session("audit_temporal_edge")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = build_queries(), build_oracles()

    tmp = tempfile.mkdtemp(prefix="pserv_temporal_tier_")
    changed = build_temporal_tier(schema_sf_dir, tmp)

    report: dict[str, dict] = {}
    failures: list[str] = []
    t0 = time.time()
    for name, fn in queries.items():
        t = time.time()
        try:
            df = fn(spark, tmp)
            if name in oracles:
                res = compare_df_to_duckdb(name, df, oracles[name], tmp)
                ok, rows, detail = res.ok, res.spark_rows, res.detail
            else:
                rows, detail = df.count(), "rows-only"
                ok = True
        except Exception as e:  # noqa: BLE001
            ok, rows = False, None
            detail = f"EXCEPTION {type(e).__name__}: {e}"[:200]
        entry: dict = {"ok": ok, "rows": rows}
        if not ok:
            if name in TEMPORAL_ALLOWED:
                entry["allowed"] = TEMPORAL_ALLOWED[name]
            else:
                failures.append(name)
                entry["detail"] = detail
        report[name] = entry
        status = "ok " if ok else ("ALLOW" if name in TEMPORAL_ALLOWED else "FAIL")
        print(f"{status:5s} {name:28s} rows={rows!s:8s} {time.time() - t:.2f}s", flush=True)

    out = {
        "schema_sf_dir": schema_sf_dir,
        "changed_cells": changed,
        "n_ids": len(queries),
        "n_ok": sum(1 for v in report.values() if v["ok"]),
        "n_allowed": sum(1 for v in report.values() if "allowed" in v),
        "failures": failures,
        "elapsed_s": round(time.time() - t0, 1),
        "ids": report,
    }
    with open(REPO / "TEMPORALEDGE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("n_ids", "n_ok", "n_allowed", "failures")}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
