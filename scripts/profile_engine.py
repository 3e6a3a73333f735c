#!/usr/bin/env python
"""Engine-only warm-path profile of every registry query.

Times each registered query's Spark-side execution (collect(), no
DuckDB oracle) at a given scale factor: one cold run, then a warm run,
both recorded.  Writes a JSON artifact and — given a prior artifact —
flags warm-time regressions, so plan/hint changes that silently tax a
non-flagship operator get caught the round they land instead of at
judge time.  bench.py stays the headline harness; this is the long
tail's counterpart.

Usage:
    python scripts/profile_engine.py [sf_dir] [id ...]
    python scripts/profile_engine.py --compare ENGINE_PROFILE.json

With ``--compare`` the run is followed by a regression report: any op
whose warm time exceeds max(1.5x prior, prior + 1.0 s) is listed (the
absolute floor keeps sub-second jitter out; loadavg in both artifacts
gives the contention disposition).  Exit code 1 if regressions.

Derby note: the JDBC ops boot embedded Derby — do not run this
concurrently with driver_sim / plan_lint / pytest (single-JVM lock).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = str(REPO / "ENGINE_PROFILE.json")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    compare_path = None
    if "--compare" in args:
        i = args.index("--compare")
        if i + 1 >= len(args):
            print("usage: profile_engine.py [sf_dir] [id ...] [--compare PRIOR.json]")
            return 2
        compare_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])

    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session

    spark = get_session("profile_engine")
    spark.sparkContext.setLogLevel("ERROR")

    rows: dict[str, dict] = {}
    t_start = time.perf_counter()
    for name, fn in build_queries().items():
        if only and name not in only:
            continue
        try:
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            cold = time.perf_counter() - t0
            # warm = MIN of two runs: HOF-heavy expressions keep JIT-
            # compiling for several executions (measured: vec_project_jl
            # 4.3 -> 14.8 -> 8.5 -> 2.9 -> 1.6 -> 1.4 s across one
            # session), so a single warm sample regresses on noise; the
            # min is the standard noise-robust timing estimator.
            warm = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                warm = min(warm, time.perf_counter() - t0)
            rows[name] = {"cold": round(cold, 3), "warm": round(warm, 3), "rows": n}
        except Exception as e:  # noqa: BLE001
            rows[name] = {"err": repr(e)[:160]}
        print(f"{name}: {rows[name]}", file=sys.stderr)

    artifact = {
        "sf_dir": sf_dir,
        "total_sec": round(time.perf_counter() - t_start, 1),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "ops": rows,
    }
    if not only:
        with open(OUT, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {OUT} ({len(rows)} ops, {artifact['total_sec']}s)")
    else:
        print(json.dumps(artifact, indent=1))

    if not compare_path:
        return 0
    prior = json.load(open(compare_path))["ops"]
    regressions = []
    for name, row in rows.items():
        old = prior.get(name, {})
        if "warm" not in row or "warm" not in old:
            continue
        if row["warm"] > max(1.5 * old["warm"], old["warm"] + 1.0):
            regressions.append((name, old["warm"], row["warm"]))
    if regressions:
        print("REGRESSIONS (warm sec, prior -> now):")
        for name, a, b in sorted(regressions, key=lambda r: r[2] - r[1], reverse=True):
            print(f"  {name}: {a} -> {b}")
    else:
        print("no warm-time regressions vs", compare_path)
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
