#!/usr/bin/env python
"""Tie-amplification + key-skew robustness sweep.

Every standing tier is near-tie-free: measures are continuous doubles,
timestamps are distinct, vectors are dense random floats.  So an
operator whose ORDER BY under-specifies the row (a top-k that sorts by
price alone, a window ordered by a non-unique timestamp, a knn that
breaks equal cosines arbitrarily) passes every sweep — determinism
included, because with no ties both engines and both layouts happen to
agree.  Production data is the opposite: prices cluster at round
numbers, timestamps collide at batch boundaries, quantized embeddings
duplicate.

This audit builds a mirror tier that MAXIMIZES ties and key skew with
deterministic transforms, then subjects every registered id to BOTH
checks on it:

- ORACLE: the id's DuckDB oracle on the same files — catches semantic
  divergence (e.g. tie members chosen differently by the two engines
  when the query's keys genuinely pin a winner).
- LAYOUT: the determinism audit's pass-A/pass-B hash comparison
  (shuffle fan-out 32 vs 7, AQE coalesce off, 256 KiB scan splits) —
  catches results that only LOOK deterministic because one layout's
  arbitrary arrival order was stable.

Transforms (all deterministic, applied to sf0.001 mirrors):

- events:   user_id -> user_id % 8 (hot keys: giant sessions/groups),
            ts -> floor to the hour (massive window-ORDER-BY ties),
            value -> round(value) (measure ties).  event_id untouched —
            it is the documented tie-break column.
- lineitem: l_extendedprice -> round to 100s, l_discount -> round to
            0.05s, l_shipdate -> first of month.  Keys untouched.
- orders:   o_totalprice -> round to 1000s (global top-k tie pileup).
- customer: c_acctbal -> round to 100s.   part: p_retailprice -> 10s.
- documents: text -> the 8 alphabetically-first distinct words (the
            corpus vocabulary is small, so ~57% of docs collapse onto a
            duplicate — the dedup/minhash family sees real collision
            pressure), n_chars kept consistent with the new text.
- embeddings: components quantized to 1 decimal (duplicate vectors ->
            exactly-tied cosines/distances in the knn/ann family).

Ids that raise, or diverge under either check, fail unless allowlisted
with a written reason.  Writes TIESSKEW.json; exit 1 on unexplained
failures.

Usage: python scripts/audit_ties_skew.py [schema_sf_dir]
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

#: Pass-B layout overrides (same set as audit_determinism.py).
VARIANT_CONFS: dict[str, str] = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.files.maxPartitionBytes": "262144",
    "spark.sql.files.openCostInBytes": "0",
}

#: id -> why a divergence on the ties tier is accepted, with evidence.
TIES_ALLOWED: dict[str, str] = {}


def build_ties_tier(schema_sf_dir: str, dst: str) -> dict[str, int]:
    """Write single-file parquet mirrors with ties amplified; returns
    per-table changed-cell counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def _round_to(vals, step):
        return [None if v is None else round(v / step) * step for v in vals]

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
            put("user_id", [v % 8 for v in cols["user_id"].to_pylist()])
            put(
                "ts",
                [
                    None if v is None else v.replace(minute=0, second=0, microsecond=0)
                    for v in cols["ts"].to_pylist()
                ],
            )
            put(
                "value",
                [None if v is None else float(round(v)) for v in cols["value"].to_pylist()],
            )
        elif t == "lineitem":
            put("l_extendedprice", _round_to(cols["l_extendedprice"].to_pylist(), 100.0))
            put(
                "l_discount",
                [
                    None if v is None else round(round(v / 0.05) * 0.05, 2)
                    for v in cols["l_discount"].to_pylist()
                ],
            )
            put(
                "l_shipdate",
                [None if v is None else v.replace(day=1) for v in cols["l_shipdate"].to_pylist()],
            )
        elif t == "orders":
            put("o_totalprice", _round_to(cols["o_totalprice"].to_pylist(), 1000.0))
        elif t == "customer":
            put("c_acctbal", _round_to(cols["c_acctbal"].to_pylist(), 100.0))
        elif t == "part":
            put("p_retailprice", _round_to(cols["p_retailprice"].to_pylist(), 10.0))
        elif t == "documents":
            txt = [
                None if v is None else " ".join(sorted(set(v.split()))[:8])
                for v in cols["text"].to_pylist()
            ]
            put("text", txt)
            put("n_chars", [None if v is None else len(v) for v in txt])
        elif t == "embeddings":
            put(
                "embedding",
                [
                    None if v is None else [round(x, 1) for x in v]
                    for v in cols["embedding"].to_pylist()
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

    sys.path.insert(0, str(REPO / "scripts"))
    from audit_determinism import result_fingerprint

    spark = get_session("audit_ties_skew")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = build_queries(), build_oracles()

    tmp = tempfile.mkdtemp(prefix="pserv_ties_tier_")
    changed = build_ties_tier(schema_sf_dir, tmp)

    report: dict[str, dict] = {}
    failures: list[str] = []
    t0 = time.time()
    base_confs = {k: spark.conf.get(k) for k in VARIANT_CONFS}
    for name, fn in queries.items():
        t = time.time()
        entry: dict = {}
        try:
            df = fn(spark, tmp)
            if name in oracles:
                res = compare_df_to_duckdb(name, df, oracles[name], tmp)
                ok, rows, detail = res.ok, res.spark_rows, res.detail
                fp_a = result_fingerprint(fn(spark, tmp))
            else:
                rows, detail = df.count(), "rows-only"
                ok, fp_a = True, (rows, "rows-only")
            for k, v in VARIANT_CONFS.items():
                spark.conf.set(k, v)
            try:
                if name in oracles:
                    fp_b = result_fingerprint(fn(spark, tmp))
                else:
                    fp_b = (queries[name](spark, tmp).count(), "rows-only")
            finally:
                for k, v in base_confs.items():
                    spark.conf.set(k, v)
            stable = fp_a == fp_b
            if not stable:
                ok = False
                detail = f"layout-unstable: A={fp_a[0]} rows, B={fp_b[0]} rows"
            entry["stable"] = stable
        except Exception as e:  # noqa: BLE001
            ok, rows = False, None
            detail = f"EXCEPTION {type(e).__name__}: {e}"[:200]
        entry.update({"ok": ok, "rows": rows})
        if not ok:
            if name in TIES_ALLOWED:
                entry["allowed"] = TIES_ALLOWED[name]
            else:
                failures.append(name)
                entry["detail"] = detail
        report[name] = entry
        status = "ok " if ok else ("ALLOW" if name in TIES_ALLOWED else "FAIL")
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
    with open(REPO / "TIESSKEW.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("n_ids", "n_ok", "n_allowed", "failures")}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
