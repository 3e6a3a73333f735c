#!/usr/bin/env python
"""Hash-stability audit across execution-layout variance — the
"different cluster, same answer" check.

The driver's correctness gate hashes result values at full float
precision (``repr(v)``), and nothing guarantees the driver's session
uses this repo's shuffle fan-out.  The three-tier oracle sweep varies
the DATA but never the EXECUTION LAYOUT: every pass runs with the same
``spark.sql.shuffle.partitions`` and the same scan splits, so a result
that depends on partial-aggregation order (float sum reassociation), on
arbitrary tie-breaks in a window's ORDER BY, or on scan-split-dependent
ids (``monotonically_increasing_id``) would pass every sweep here and
still flip its hash on a cluster with different parallelism.

This audit runs EVERY registered id twice in one process:

- pass A: the session defaults (shuffle.partitions=32, AQE coalesce on,
  default scan splits) — the exact configuration the sweeps use;
- pass B: shuffle.partitions=7, AQE partition coalescing off, and
  ``spark.sql.files.maxPartitionBytes`` forced down to 256 KiB with
  zero file-open cost, so scans split into many more input partitions
  and every shuffle hashes rows into a different, non-power-of-two
  layout.

Each pass canonicalizes the result with the SAME multiset
canonicalization the driver-parity harness uses
(``pserv_spark.testing._canon_rows``: columns sorted by name, rows
sorted, cells stringified at full precision) and hashes it.  An id is
``stable`` iff both hashes match.  Declared rows-only ids compare row
counts only (their driver check is rows-only too).

Writes DETERMINISM.json; exit 1 if any id is unstable.

Usage: python scripts/audit_determinism.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

#: Pass-B execution-layout overrides.  All runtime-settable SQL confs:
#: a different shuffle fan-out, no runtime re-coalescing, and scan
#: splits ~512x smaller than the default 128 MiB target.
VARIANT_CONFS: dict[str, str] = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.files.maxPartitionBytes": "262144",
    "spark.sql.files.openCostInBytes": "0",
}


def result_fingerprint(df) -> tuple[int, str]:
    from pserv_spark.testing import _canon_rows

    rows = df.collect()
    canon = _canon_rows(df.columns, [tuple(r) for r in rows])
    h = hashlib.sha256()
    h.update("\x1f".join(sorted(df.columns)).encode())
    for row in canon:
        h.update(b"\x1e")
        h.update("\x1f".join(row).encode())
    return len(rows), h.hexdigest()


def run_pass(spark, queries, oracles, sf_dir: str, label: str) -> dict:
    out: dict[str, dict] = {}
    for name, fn in queries.items():
        t = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                n, digest = result_fingerprint(df)
            else:
                # Declared rows-only id: the driver only checks row
                # count, so that is the property to hold stable.
                n, digest = df.count(), "rows-only"
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"{type(e).__name__}: {e}"[:160]}
            continue
        out[name] = {"rows": n, "hash": digest}
        print(f"{label} {name:28s} rows={n:<8d} {time.time() - t:.2f}s", flush=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pserv_spark.registry import build_oracles, build_queries
    from pserv_spark.session import get_session

    spark = get_session("audit_determinism")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = build_queries(), build_oracles()

    base_confs = {k: spark.conf.get(k) for k in VARIANT_CONFS}
    pass_a = run_pass(spark, queries, oracles, sf_dir, "A")
    for k, v in VARIANT_CONFS.items():
        spark.conf.set(k, v)
    try:
        pass_b = run_pass(spark, queries, oracles, sf_dir, "B")
    finally:
        for k, v in base_confs.items():
            spark.conf.set(k, v)

    unstable, errs = [], []
    per_id: dict[str, dict] = {}
    for name in queries:
        a, b = pass_a.get(name, {}), pass_b.get(name, {})
        if "err" in a or "err" in b:
            errs.append(name)
            per_id[name] = {"stable": False, "err": a.get("err") or b.get("err")}
            continue
        stable = a == b
        per_id[name] = {"stable": stable}
        if not stable:
            unstable.append(name)
            per_id[name].update(
                {"a": a, "b": b}
            )

    report = {
        "sf_dir": sf_dir,
        "variant_confs": VARIANT_CONFS,
        "n_ids": len(queries),
        "n_stable": sum(1 for v in per_id.values() if v["stable"]),
        "unstable": unstable,
        "errors": errs,
        "ids": per_id,
    }
    with open(REPO / "DETERMINISM.json", "w") as f:
        json.dump(report, f, indent=1)
    print(
        json.dumps(
            {k: report[k] for k in ("n_ids", "n_stable", "unstable", "errors")},
            indent=1,
        )
    )
    return 1 if (unstable or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
