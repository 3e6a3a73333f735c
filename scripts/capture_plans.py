"""Capture .explain("formatted") output for named queries into
plans/<round>/<name>_<tag>.txt — the optimization round's plan evidence
(guide §1: measure first; the judge checks plan claims against these
files).

Usage: python scripts/capture_plans.py <tag> [name ...]
With no names, captures the 15 flagship bench queries.
The round directory defaults to r10 (override with $SPARK_GRAFT_PLANS_ROUND).

Round 10 (VERDICT r9 #8): operators whose registered output is a 1-row
summary built AFTER an internal collect get their pre-collect internal
pipeline captured too (as ``<name>_internal_<tag>.txt``) — the r9
before/after plans for dedup_lsh_eval showed only the final
``Scan ExistingRDD``, which made the claimed rewrite invisible.
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


def _internal_builders():
    """name -> builder for the operator's pre-collect internal pipeline."""
    from pserv_spark.operators.dedup import _lsh_eval_pipeline
    from pserv_spark.operators.similarity import _bucketed_ids_plan

    return {
        "dedup_lsh_eval": _lsh_eval_pipeline,
        # the MapInPandas bucketing pass is hidden behind the operator's
        # localCheckpoint — capture the pipeline that produces it
        "ann_lsh_topk": _bucketed_ids_plan,
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or FLAGSHIP
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10")

    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session

    spark = get_session("pserv_spark_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()
    internals = _internal_builders()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)

    def dump(df, fname: str) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, fname)
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")

    for name in names:
        dump(queries[name](spark, sf_dir), f"{name}_{tag}.txt")
        if name in internals:
            dump(internals[name](spark, sf_dir), f"{name}_internal_{tag}.txt")


if __name__ == "__main__":
    main()
