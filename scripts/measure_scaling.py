#!/usr/bin/env python
"""Committed parallel-scaling artifact (round 10, VERDICT r9 #2).

The driver's own 8-vs-32-core probe at sf0.1 is blind: every flagship
query is 0.07–0.7 s warm there, dominated by fixed per-query costs, so
all core-ratios land ≈1 and ``suspect_cpus_ignored`` fires even though
``$SPARK_GRAFT_CPUS`` is honored (pserv_spark/session.py).  This script
runs the SAME harnesses (bench.py --sf1 and profile_dedup.py) at the
local 10× tier under SPARK_GRAFT_CPUS=8 and =32 — where per-query
compute dominates — and writes SCALING.json with per-query 8c/32c
ratios, so parallelism is measured, not assumed.

Each run is a fresh subprocess (fresh JVM at the requested core count);
runs are sequential so they never contend with each other.

Usage: python scripts/measure_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SF1 = str(REPO / ".testdata" / "sf1")

#: Heavy compute-bound dedup op for the non-flagship scaling signal
#: (~30 s warm at sf1/32c — big enough that fixed costs are noise).
DEDUP_OPS = ["dedup_ngram_jaccard"]


def run_bench(cpus: int) -> dict:
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--sf1"],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_dedup(cpus: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_SF_DIR": SF1,
    }
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "profile_dedup.py"), *DEDUP_OPS],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        sys.exit("build the sf1 tier first: python scripts/make_sf1.py")
    result: dict = {"sf_dir": SF1, "runs": {}}
    for cpus in (32, 8):
        bench = run_bench(cpus)
        dedup = run_dedup(cpus)
        result["runs"][str(cpus)] = {
            "bench_total": bench["value"],
            "bench_queries": bench["queries"],
            "bench_loadavg": bench.get("loadavg"),
            "dedup_noop_warm": dedup["noop_warm"],
            "dedup_loadavg": dedup.get("loadavg"),
        }
        print(f"cpus={cpus}: bench {bench['value']}s, dedup {dedup['noop_warm']}",
              flush=True)
    r32, r8 = result["runs"]["32"], result["runs"]["8"]
    ratios = {
        q: round(r8["bench_queries"][q] / r32["bench_queries"][q], 2)
        for q in r32["bench_queries"]
    }
    for op in DEDUP_OPS:
        ratios[op] = round(r8["dedup_noop_warm"][op] / r32["dedup_noop_warm"][op], 2)
    result["ratio_8c_over_32c"] = ratios
    result["bench_total_ratio"] = round(r8["bench_total"] / r32["bench_total"], 2)
    out = REPO / "SCALING.json"
    out.write_text(json.dumps(result, indent=1, sort_keys=True))
    print(f"wrote {out}")
    print(json.dumps(ratios, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
