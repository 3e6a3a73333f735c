#!/usr/bin/env python
"""NULL-injection robustness sweep — the "hostile data" audit.

The synthetic tiers are fully populated, so the standing oracle sweeps
never exercise NULL propagation: a 100 TB production feed has NULLs in
measure and attribute columns as a matter of course, and an operator
whose aggregation, filter, string pipeline, or vector arithmetic
mishandles them would pass every existing gate.  This audit builds a
mirror tier with a deterministic ~1/16 of the values NULLed in the
designated columns, then runs EVERY registered id against it with the
same DuckDB oracle on the same files — both engines see identical
NULLs, so any divergence is a real semantic difference, not noise.

Injection policy (documented, deliberate):

- MEASURE and free-attribute columns only (amounts, quantities, text,
  categorical labels, embedding vectors), plus the TIME columns
  (events.ts, o_orderdate, l_shipdate).  Never surrogate/join keys —
  a NULL key row is malformed input for this schema, and equality
  joins/groupings drop or group NULLs identically in both engines
  anyway.  NULL event timestamps are excluded at the canonical
  ``v_events`` boundary (a time-less event has no window/watermark/
  as-of placement, and its ORDER BY placement differs per engine
  default); the order/ship dates flow through range predicates, which
  drop NULLs identically in both engines.
- Deterministic mask: a row's value in column ``c`` is NULLed iff
  ``md5(f"{first_column_value}|{c}")`` starts with '0' (~6.25%).  The
  first column of every table is its never-nulled key, so the mask is
  stable across runs, engines, and partitionings.
- GROUP WIPEOUT (round 7, after ADVICE r6 found the blind spot): the
  per-row mask can never NULL *every* row of one grouping key, so an
  operator that mishandles a key whose entire group lost its values
  (e.g. a user all of whose events are time-less) passed the round-6
  sweep by luck.  A second deterministic mask now NULLs the target
  column on EVERY row of ~6.25% of grouping keys
  (``md5(f"{group_value}|wipe|{c}")`` starts with '0'): whole users
  lose all timestamps, whole orders lose every ship date, whole
  customers lose every order date.

Ids that raise, or disagree with the oracle, fail unless allowlisted
with a written reason.  Writes NULLINPUT.json; exit 1 on unexplained
failures.

Usage: python scripts/audit_null_input.py [schema_sf_dir]
"""

from __future__ import annotations

import hashlib
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

#: table -> columns that receive injected NULLs (measures / attributes;
#: never the leading key column, join keys, or window-order timestamps).
NULL_COLS: dict[str, list[str]] = {
    "customer": ["c_acctbal", "c_mktsegment"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice", "p_brand"],
    "orders": ["o_totalprice", "o_orderpriority", "o_orderdate"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    "events": ["value", "props", "ts"],
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding", "label"],
}

#: table -> (grouping column, target columns wiped for ~6.25% of the
#: grouping keys).  The group column itself is never nulled.
WIPEOUT_COLS: dict[str, tuple[str, list[str]]] = {
    "events": ("user_id", ["ts", "value"]),
    "lineitem": ("l_orderkey", ["l_shipdate"]),
    "orders": ("o_custkey", ["o_orderdate"]),
    "documents": ("source", ["text"]),
    "embeddings": ("label", ["embedding"]),
}

#: id -> why a divergence under injected NULLs is accepted (engine
#: semantics or a declared data contract), with the evidence.
NULL_ALLOWED: dict[str, str] = {}


def _null_mask(keys, col: str) -> list[bool]:
    return [
        hashlib.md5(f"{k}|{col}".encode()).hexdigest()[0] == "0" for k in keys
    ]


def _wipe_mask(group_vals, col: str) -> list[bool]:
    wiped = {
        g
        for g in set(group_vals)
        if hashlib.md5(f"{g}|wipe|{col}".encode()).hexdigest()[0] == "0"
    }
    return [g in wiped for g in group_vals]


def build_null_tier(schema_sf_dir: str, dst: str) -> dict[str, int]:
    """Write single-file parquet mirrors with NULLs injected; returns
    per-table injected-cell counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    injected: dict[str, int] = {}
    for t in TABLES:
        tbl = pq.read_table(f"{schema_sf_dir}/{t}.parquet")
        keys = tbl.column(0).to_pylist()
        group_col, wipe_targets = WIPEOUT_COLS.get(t, (None, []))
        group_vals = tbl.column(group_col).to_pylist() if group_col else None
        cols, n_inj = {}, 0
        for field in tbl.schema:
            col = tbl.column(field.name)
            row_mask = (
                _null_mask(keys, field.name)
                if field.name in NULL_COLS.get(t, ())
                else None
            )
            wipe = (
                _wipe_mask(group_vals, field.name)
                if field.name in wipe_targets
                else None
            )
            if row_mask is None and wipe is None:
                cols[field.name] = col
                continue
            if row_mask is None:
                mask = wipe
            elif wipe is None:
                mask = row_mask
            else:
                mask = [a or b for a, b in zip(row_mask, wipe)]
            vals = col.to_pylist()
            vals = [None if m else v for v, m in zip(vals, mask)]
            n_inj += sum(mask)
            cols[field.name] = pa.array(vals, type=field.type)
        out = pa.table(cols, schema=tbl.schema)
        pq.write_table(out, f"{dst}/{t}.parquet")
        injected[t] = n_inj
    return injected


def main() -> int:
    schema_sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pserv_spark.registry import build_oracles, build_queries
    from pserv_spark.session import get_session
    from pserv_spark.testing import compare_df_to_duckdb

    spark = get_session("audit_null_input")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = build_queries(), build_oracles()

    tmp = tempfile.mkdtemp(prefix="pserv_null_tier_")
    injected = build_null_tier(schema_sf_dir, tmp)

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
            if name in NULL_ALLOWED:
                entry["allowed"] = NULL_ALLOWED[name]
            else:
                failures.append(name)
                entry["detail"] = detail
        report[name] = entry
        status = "ok " if ok else ("ALLOW" if name in NULL_ALLOWED else "FAIL")
        print(f"{status:5s} {name:28s} rows={rows!s:8s} {time.time() - t:.2f}s", flush=True)

    out = {
        "schema_sf_dir": schema_sf_dir,
        "null_cols": NULL_COLS,
        "injected_cells": injected,
        "n_ids": len(queries),
        "n_ok": sum(1 for v in report.values() if v["ok"]),
        "n_allowed": sum(1 for v in report.values() if "allowed" in v),
        "failures": failures,
        "elapsed_s": round(time.time() - t0, 1),
        "ids": report,
    }
    with open(REPO / "NULLINPUT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("n_ids", "n_ok", "n_allowed", "failures")}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
