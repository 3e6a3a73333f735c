#!/usr/bin/env python
"""Numeric knife-edge robustness sweep — rounding boundaries and
sign flips.

The repo's determinism discipline (SURVEY §4.5) rests on floor
quantization and decimal partials precisely BECAUSE values sitting on
a rounding boundary (x.5 at the rounding digit, x.xx5 cents) are where
HALF_UP (Spark's ROUND), round-half-even (Python/numpy), and DuckDB's
half-away-from-zero disagree — but the uniform synthetic measures
essentially never LAND on those boundaries, so the discipline has been
proven by construction, not by data.  This audit plants the boundaries
deliberately and re-runs every id:

- events.value:  event_id % 8 == 0 -> exact integer + 0.5 (the 2dp/
  percentile/mean knife-edge); % 8 == 1 -> exact x.125 (odd eighth —
  a third-decimal '5' that IS exactly representable, so the cent
  HALF_UP boundary is unambiguous); % 8 == 2 -> NEGATIVE value (ops
  assuming positive measures must not silently corrupt); % 8 == 3 ->
  exact 0.0.
- lineitem.l_extendedprice: l_linenumber % 4 == 0 -> exact INTEGER
  dollars (x.00 — sums/avgs/Benford digits stressed; NOT a fractional
  boundary, because a boundary price multiplied by any binary-inexact
  2-decimal (1-discount) lands the PRODUCT within 1e-13 of a 4th-
  decimal half: the engine's double product and the oracle's exact
  decimal product then legitimately round apart — same representation
  ambiguity as x.005, resolved by the cents-at-ingest contract);
  l_discount: % 4 == 1 -> 0.05 (the BETWEEN 0.05 AND 0.07 predicate
  edge of the TPC-H shapes — both engines compare the same stored
  double against the same literal double).
- orders.o_totalprice: o_orderkey % 8 == 0 -> x.5 exactly (Benford /
  leading-digit and round() paths).

Only EXACTLY-REPRESENTABLE boundaries are planted (n + 0.5, odd
eighths n + 0.125): for those, the true stored value sits ON the
boundary and every correct HALF_UP path must agree.  A decimal-string
boundary like x.005 is deliberately NOT planted: its stored double is
x.00499…, and "round the true value" (this engine: floor(x·100+0.5))
legitimately differs from "round the shortest decimal representation"
(DuckDB's double→DECIMAL cast) — a representation ambiguity the data
contract resolves by quantizing money to cents AT INGEST, not a bug
either engine can fix (verified empirically: planting x.005 flips one
cent per row between the two correct-by-their-own-rules engines).
Ids that raise or diverge fail unless allowlisted with a written
reason.  Writes KNIFEEDGE.json; exit 1 on unexplained failures.

Usage: python scripts/audit_knife_edge.py [schema_sf_dir]
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

#: id -> why a divergence on the knife-edge tier is accepted.
KNIFE_ALLOWED: dict[str, str] = {}


def build_knife_tier(schema_sf_dir: str, dst: str) -> dict[str, int]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    changed: dict[str, int] = {}
    for t in TABLES:
        tbl = pq.read_table(f"{schema_sf_dir}/{t}.parquet")
        cols = {f.name: tbl.column(f.name) for f in tbl.schema}
        n_chg = 0

        def put(name, vals):
            nonlocal n_chg
            old = cols[name].to_pylist()
            n_chg += sum(1 for a, b in zip(old, vals) if a != b)
            cols[name] = pa.array(vals, type=tbl.schema.field(name).type)

        if t == "events":
            ids = cols["event_id"].to_pylist()
            vv = cols["value"].to_pylist()
            new = []
            for i, v in zip(ids, vv):
                k = i % 8
                if v is None:
                    new.append(v)
                elif k == 0:
                    new.append(float(int(v)) + 0.5)
                elif k == 1:
                    new.append(float(int(v)) + 0.125)  # exact odd eighth
                elif k == 2:
                    new.append(-abs(v))
                elif k == 3:
                    new.append(0.0)
                else:
                    new.append(v)
            put("value", new)
        elif t == "lineitem":
            ln = cols["l_linenumber"].to_pylist()
            ep = cols["l_extendedprice"].to_pylist()
            put(
                "l_extendedprice",
                [
                    float(int(v)) if (v is not None and n % 4 == 0) else v
                    for n, v in zip(ln, ep)
                ],
            )
            dc = cols["l_discount"].to_pylist()
            put(
                "l_discount",
                [
                    0.05 if (v is not None and n % 4 == 1) else v
                    for n, v in zip(ln, dc)
                ],
            )
        elif t == "orders":
            keys = cols["o_orderkey"].to_pylist()
            tp = cols["o_totalprice"].to_pylist()
            put(
                "o_totalprice",
                [
                    (float(int(v)) + 0.5)
                    if (v is not None and k % 8 == 0)
                    else v
                    for k, v in zip(keys, tp)
                ],
            )
        out = pa.table(cols, schema=tbl.schema)
        pq.write_table(out, f"{dst}/{t}.parquet")
        changed[t] = n_chg
    return changed


def main() -> int:
    schema_sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pserv_spark.registry import build_oracles, build_queries
    from pserv_spark.session import get_session
    from pserv_spark.testing import compare_df_to_duckdb

    spark = get_session("audit_knife_edge")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = build_queries(), build_oracles()

    tmp = tempfile.mkdtemp(prefix="pserv_knife_tier_")
    changed = build_knife_tier(schema_sf_dir, tmp)

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
            if name in KNIFE_ALLOWED:
                entry["allowed"] = KNIFE_ALLOWED[name]
            else:
                failures.append(name)
                entry["detail"] = detail
        report[name] = entry
        status = "ok " if ok else ("ALLOW" if name in KNIFE_ALLOWED else "FAIL")
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
    with open(REPO / "KNIFEEDGE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("n_ids", "n_ok", "n_allowed", "failures")}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
