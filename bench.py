#!/usr/bin/env python
"""Benchmark harness — flagship suite, BASELINE.md methodology.

Runs the 15 flagship queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; per query: one warm-up, then median of 3
timed runs (collect() forces full materialization).  Prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Pass bar (BASELINE.md): suite total <= 16.5 s at sf0.1 (2x the naive
Spark SQL baseline of 8.25 s).

``--sf1`` (round 9, VERDICT r8 #5) runs the same suite at the local
10x tier (.testdata/sf1, built by scripts/make_sf1.py) so decade-scale
regressions surface in the committed bench story instead of only in
the ad-hoc scale sweep; the output line then carries "sf": 1.0.  The
driver's default invocation is unchanged (one line, sf0.1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP = [
    "scan_project", "agg_groupby_q1", "join_multiway_q5", "join_left_outer",
    "win_topk_per_group", "agg_grouping_sets", "topk_global", "sessionize",
    "window_tumbling", "fn_explode_wordcount", "vec_knn", "dedup_exact",
    "join_asof", "agg_percentile", "tfidf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf1" in sys.argv[1:]:
        sf_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".testdata", "sf1")
        if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet")):
            sys.exit("--sf1: build the tier first (python scripts/make_sf1.py)")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session

    spark = get_session("pserv_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    timings: dict[str, float] = {}
    for name in FLAGSHIP:
        fn = queries[name]
        fn(spark, sf_dir).collect()  # warm-up (also JIT + IO cache)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    # 1/5/15-min load averages so every recorded number carries its own
    # contention disposition (driver benches have repeatedly absorbed
    # sweep contention; see BASELINE.md round-4 notes).
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - platform without getloadavg
        load = None
    print(json.dumps({
        "metric": "flagship_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "loadavg": load,
    }))


if __name__ == "__main__":
    main()
