"""Stage-isolated timings for the ppjoin dedup family (guide §1.4:
noop sink so the computation is timed, not the sink/collect).

For each op: warm-up run, then timed noop write; plus candidate-stage
counts so before/after comparisons can attribute a win to candidate
generation vs verify.

Usage: python scripts/profile_dedup.py [op ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OPS = ["dedup_jaccard", "dedup_ngram_jaccard", "dedup_containment",
       "dedup_minhash_lsh", "dedup_lsh_eval", "dedup_cluster_cc",
       "dedup_canonical_keeper", "graph_triangle_count", "dedup_simhash",
       "minhash_signature", "dedup_exact", "dedup_fingerprint",
       "dedup_substring_spans"]


def noop_time(fn, spark, sf_dir) -> float:
    """Time construction + noop write: iterative/eval operators do
    eager work (localCheckpoint loops, count() actions) inside the
    builder, so timing only the final write would under-count them."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    names = sys.argv[1:] or OPS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session

    spark = get_session("pserv_spark_profile_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    out = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"{name}: warm-up")
        noop_time(fn, spark, sf_dir)  # warm-up
        spark.sparkContext.setJobDescription(f"{name}: timed noop")
        samples = [noop_time(fn, spark, sf_dir) for _ in range(2)]
        out[name] = round(min(samples), 3)
        print(f"{name}: {out[name]} s (noop, warm)", flush=True)
        spark.sparkContext.setJobDescription(None)

    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    print(json.dumps({"sf_dir": sf_dir, "noop_warm": out, "loadavg": load}))


if __name__ == "__main__":
    main()
