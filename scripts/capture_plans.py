"""Capture .explain("formatted") output for named queries into
plans/r09/<name>_<tag>.txt — the optimization round's plan evidence
(guide §1: measure first; the judge checks plan claims against these
files).

Usage: python scripts/capture_plans.py <tag> [name ...]
With no names, captures the 15 flagship bench queries.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP = [
    "scan_project", "agg_groupby_q1", "join_multiway_q5", "join_left_outer",
    "win_topk_per_group", "agg_grouping_sets", "topk_global", "sessionize",
    "window_tumbling", "fn_explode_wordcount", "vec_knn", "dedup_exact",
    "join_asof", "agg_percentile", "tfidf",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or FLAGSHIP
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session

    spark = get_session("pserv_spark_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
