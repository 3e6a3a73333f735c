#!/usr/bin/env python
"""Registry-wide scan-pruning audit — the column-pruning 100 TB gate.

A scan that reads every column of a wide table for a narrow projection
ships the whole table across the scan boundary: harmless at test scale,
a multiplicative I/O tax on every query at 100 TB (the brief's own
example of a wrong plan).  This audit walks EVERY registry query's
formatted plan, extracts each parquet scan's per-scan ReadSchema, and
flags any scan on a WIDE base table (>= 6 columns) that reads the FULL
schema — unless the op is allowlisted below with a written reason why
whole-row reads are the operator's actual semantics (row-level ingest /
rewrite / set ops on entire tuples).

Column pruning is Catalyst's job; this audit pins that we never write a
plan shape that defeats it.  Per-scan PushedFilters are also recorded
(informational) so filter-pushdown regressions are visible in the
artifact diff.

Run:  python scripts/audit_scan_pruning.py [sf_dir]
Writes SCANPRUNE.json (committed) and exits 1 on non-allowlisted
full-width scans.  Derby note: includes the jdbc ops — do not run
concurrently with driver_sim / plan_lint / pytest (single-JVM lock).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

#: Tables this wide get the full-width-scan check.
WIDE = 6

#: op id -> why reading the full row is this operator's semantics.
FULL_SCAN_ALLOWED: dict[str, str] = {
    "profile_table_stats": (
        "per-column profiler: null/distinct/min/max for EVERY orders "
        "column in one pass — full-width read IS the operator"
    ),
}


def scan_blocks(plan: str) -> list[dict]:
    """Parse '(N) Scan parquet' sections of a formatted explain."""
    out = []
    for m in re.finditer(
        r"\(\d+\) Scan parquet ?\n(.*?)(?=\n\(\d+\)|\n\n|\Z)", plan, flags=re.S
    ):
        body = m.group(1)
        loc = re.search(r"Location: \S+ \[([^\]]*)", body)
        nout = re.search(r"Output \[(\d+)\]", body)
        pushed = re.search(r"PushedFilters: \[([^\]]*)", body)
        path = loc.group(1) if loc else ""
        table = Path(path.split(",")[0]).name.replace(".parquet", "") if path else "?"
        out.append(
            {
                "table": table,
                "n_read": int(nout.group(1)) if nout else -1,
                "pushed": bool(pushed and pushed.group(1).strip()),
            }
        )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session

    spark = get_session("audit_scan_pruning")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    widths = {
        p.name.replace(".parquet", ""): len(spark.read.parquet(str(p)).columns)
        for p in Path(sf_dir).glob("*.parquet")
    }

    report: dict[str, dict] = {}
    violations = 0
    n_scans = 0
    for name, fn in build_queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": repr(e)[:160]}
            continue
        rows = []
        for s in scan_blocks(plan):
            full = widths.get(s["table"])
            if full is None:
                continue  # fixture/temp paths: not a base-table scan
            n_scans += 1
            entry = {
                "table": s["table"],
                "read": s["n_read"],
                "width": full,
                "pushed": s["pushed"],
            }
            if full >= WIDE and s["n_read"] >= full:
                if name in FULL_SCAN_ALLOWED:
                    entry["verdict"] = f"allowed: {FULL_SCAN_ALLOWED[name]}"
                else:
                    entry["verdict"] = "VIOLATION: full-width scan of a wide table"
                    violations += 1
            rows.append(entry)
        flagged = [r for r in rows if "verdict" in r]
        if flagged:
            report[name] = {"scans": flagged}

    stale = sorted(set(FULL_SCAN_ALLOWED) - set(report))
    out = {
        "violations": violations,
        "n_base_table_scans": n_scans,
        "stale_allowlist": stale,
        "flagged": report,
    }
    (REPO / "SCANPRUNE.json").write_text(json.dumps(out, indent=1, sort_keys=True))
    print(json.dumps(out, indent=1, sort_keys=True))
    return 1 if violations or stale else 0


if __name__ == "__main__":
    sys.exit(main())
