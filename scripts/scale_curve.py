#!/usr/bin/env python
"""Measured scaling curves for the heavy spine — the 100× question.

The plan audits argue each heavy operator is bucketed / banded /
broadcast-bounded; this probe MEASURES it: warm runtime (min of 2, the
profiler's JIT methodology) at sf0.001 / sf0.01 / sf0.1 and, per op,
the 0.01→0.1 time ratio compared against the op's DRIVING TABLE's
actual row-growth factor between those tiers (the tables do not grow
uniformly: lineitem/events/documents grow 10×, embeddings only 4×).
The gate: time_ratio > max(1.5 × data_factor, 3.0) flags the op as
superlinear unless declared below.  The 1.5 slack covers n·log n and
shuffle-width effects; the 3.0 floor keeps sub-second jitter out.

Honesty note on the declared quadratics: at these test tiers (≤ 5k
docs / 2k vectors) the quadratic exact baselines do NOT yet exhibit
their asymptote — fixed task-launch overhead still dominates — so they
are declared by construction, not demonstrated by measurement.  The
measurement that matters is the other direction: every SERVING-path op
stays inside its linear band while the same harness and the same
machine would have shown a 10×-data op at 50× time had one regressed.

Run:  python scripts/scale_curve.py [op ...]      # default: all
Writes SCALECURVE.json (atomically: temp file + rename) and exits 1 on
undeclared superlinear ratios.  A SUBSET invocation (explicit op args
covering less than the full DRIVING_TABLE) writes SCALECURVE.partial
.json instead — VERDICT r8 #1: a targeted re-run must never clobber
the committed full-sweep artifact (that is exactly how round 8 shipped
a 1-op SCALECURVE.json at HEAD).  tests/test_scale_curve.py pins the
committed artifact's completeness against DRIVING_TABLE.
Derby-free op set by default; still avoid running concurrently with
other Spark work — timings are the product.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TIERS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# Round-8 fourth point (VERDICT r7 #3): a 10x key-shifted replication
# of sf0.1 built by scripts/make_sf1.py (gitignored, timing-only — the
# DuckDB oracles stay at <= sf0.1).  Included automatically when built;
# run `python scripts/make_sf1.py` first.
SF1 = str(REPO / ".testdata" / "sf1")
TIER_NAMES = ["sf0.001", "sf0.01", "sf0.1", "sf1"]

#: per-point budget for the UNGATED sf1 measurement of a declared-
#: superlinear op (ADVICE r8); above it the written n^2 prediction is
#: recorded instead.
SF1_DECLARED_BUDGET_S = 120.0

#: op id -> the base table whose growth drives the op's input size.
DRIVING_TABLE: dict[str, str] = {
    "dedup_exact": "documents",
    "dedup_fingerprint": "documents",
    "dedup_minhash_lsh": "documents",
    "dedup_simhash": "documents",
    "dedup_jaccard": "documents",
    "dedup_ngram_jaccard": "documents",
    "dedup_containment": "documents",
    "ann_ivf_topk": "embeddings",
    "ann_pq_topk": "embeddings",
    "ann_lsh_topk": "embeddings",
    "tfidf": "documents",
    "minhash_signature": "documents",
    "text_bpe_apply": "documents",
    "decontaminate_ngram": "documents",
    "feat_target_encode": "events",
    "pipeline_curate_e2e": "documents",
    "vec_crossmatch_zoned": "embeddings",
    "agg_groupby_q1": "lineitem",
    "sessionize": "events",
    "vec_cosine_pairs": "embeddings",
    "dedup_embedding_cosine": "embeddings",
    # round-6 session-2 widening: one representative per remaining family
    "astro_crossmatch_sph": "embeddings",
    "dedup_cluster_cc": "documents",
    "sketch_hll_estimate": "events",
    "text_langid": "documents",
    "text_fingerprint": "documents",
    "feat_hashing_trick": "documents",
    # round-8 widening, with the sf1 tier live: the remaining heavy
    # families — iterative graph, skew-salting, TPC-H multiway, BPE
    # training, OHLC resample, packing/interleave, search, rollup
    "graph_pagerank": "lineitem",
    "er_fuzzy_blocked": "customer",
    "join_salted_skew": "lineitem",
    "join_q9_profit": "lineitem",
    "ts_resample_ohlc": "events",
    "win_rolling_median": "events",
    "win_ewma_decay": "events",
    "pack_sequential_bins": "documents",
    "interleave_sources": "documents",
    "text_bpe_train": "documents",
    "text_bm25_topk": "documents",
    "sketch_countmin_topk": "documents",
    "rollup_serve_monthly": "events",
    "sample_coreset_kcenter": "embeddings",
}

#: op id -> why a superlinear ratio is expected/acceptable for this op.
SUPERLINEAR_DECLARED: dict[str, str] = {
    "vec_cosine_pairs": (
        "quadratic exact all-pairs baseline by construction (scale path: "
        "vec_crossmatch_zoned / ann_*); at 2k test vectors the asymptote "
        "is not yet visible above fixed overhead"
    ),
    "dedup_embedding_cosine": (
        "quadratic blocked exact baseline by construction (scale path: "
        "dedup_minhash_lsh / dedup_semantic_clustered)"
    ),
    "dedup_jaccard": (
        "ppjoin whose TRUE-PAIR OUTPUT grows ~n^2 on this synthetic "
        "corpus (964k pairs at sf0.1 — the dup-density is constant by "
        "generation); on real corpora dup-density falls with size. "
        "dedup_ngram_jaccard (prefix+positional filters) is the shape "
        "that holds when output is sparse"
    ),
}


def _rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def main() -> int:
    ops = sys.argv[1:] or list(DRIVING_TABLE)

    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session

    tiers = list(TIERS)
    if Path(SF1, "lineitem.parquet").exists():
        tiers.append(SF1)
    tier_names = TIER_NAMES[: len(tiers)]

    spark = get_session("scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    report: dict[str, dict] = {}
    violations = 0
    for name in ops:
        fn = queries[name]
        table = DRIVING_TABLE.get(name)
        if table is None:
            report[name] = {"err": "no DRIVING_TABLE declared"}
            violations += 1
            continue
        declared = name in SUPERLINEAR_DECLARED
        # ADVICE r8: declared-superlinear ops get the sf1 point TOO
        # (ungated) — the declaration should stay a measured claim,
        # and worse-than-declared growth (cubic) one decade out would
        # otherwise go unrecorded.  Guard: when the declared ~n^2
        # extrapolation from the sf0.1 warm time predicts more than
        # SF1_DECLARED_BUDGET_S, record the written prediction instead
        # of burning half the sweep on one informational point.
        op_tiers = list(tiers)
        sf1_skipped: dict | None = None
        times = []
        try:
            for ti, sf_dir in enumerate(op_tiers):
                if declared and ti == 3 and len(times) == 3:
                    data_factor = _rows(sf_dir, table) / max(
                        _rows(op_tiers[2], table), 1
                    )
                    predicted = times[2] * data_factor**2
                    if predicted > SF1_DECLARED_BUDGET_S:
                        sf1_skipped = {
                            "predicted_s": round(predicted, 1),
                            "reason": (
                                "declared-quadratic extrapolation "
                                f"{times[2]}s x {data_factor:.1f}^2 "
                                f"exceeds the {SF1_DECLARED_BUDGET_S}s "
                                "per-point budget; prediction recorded "
                                "in lieu of measurement"
                            ),
                        }
                        break
                fn(spark, sf_dir).collect()  # cold: JIT + fixture build
                t_best = float("inf")
                for _ in range(2):  # warm = min of 2 (profiler methodology)
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).collect()
                    t_best = min(t_best, time.perf_counter() - t0)
                times.append(round(t_best, 3))
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": repr(e)[:160]}
            violations += 1
            continue
        # Gate every decade past the noise floor: 0.01->0.1 and (when
        # the sf1 tier is built) 0.1->1.  The 0.001->0.01 segment is
        # all task-launch overhead and is reported but never gated.
        row: dict = {
            "warm_sec": dict(zip(tier_names, times)),
            "table": table,
        }
        segs = []
        bad = False
        for hi in range(2, len(times)):
            data_factor = _rows(op_tiers[hi], table) / max(
                _rows(op_tiers[hi - 1], table), 1
            )
            band = max(1.5 * data_factor, 3.0)
            ratio = round(times[hi] / max(times[hi - 1], 1e-9), 2)
            segs.append(
                {
                    "seg": f"{tier_names[hi - 1]}->{tier_names[hi]}",
                    "data_factor": round(data_factor, 1),
                    "time_ratio": ratio,
                    "band": round(band, 1),
                }
            )
            if ratio > band and not declared:
                bad = True
        # keep the round-7 field names for the 0.01->0.1 segment so
        # older consumers of SCALECURVE.json still parse
        row.update(
            {
                "data_factor": segs[0]["data_factor"],
                "time_ratio": segs[0]["time_ratio"],
                "band": segs[0]["band"],
                "segments": segs,
            }
        )
        if sf1_skipped is not None:
            row["sf1_skipped"] = sf1_skipped
        if declared:
            row["verdict"] = f"declared superlinear: {SUPERLINEAR_DECLARED[name]}"
        elif bad:
            row["verdict"] = "VIOLATION: undeclared superlinear scaling"
            violations += 1
        else:
            row["verdict"] = "ok (within linear band)"
        report[name] = row
        seg_str = " ".join(f"{s['seg']}:{s['time_ratio']}/{s['band']}" for s in segs)
        print(f"{name}: {times} {seg_str} ({table}) {row['verdict'][:30]}")

    out = {
        "violations": violations,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "ops": report,
    }
    # VERDICT r8 #1: a subset invocation must never clobber the
    # committed full-sweep artifact; full runs write atomically (temp
    # + rename) so an interrupted sweep leaves the old artifact
    # intact rather than a truncated one.
    full_run = set(ops) == set(DRIVING_TABLE)
    target = REPO / ("SCALECURVE.json" if full_run else "SCALECURVE.partial.json")
    tmp_path = target.with_suffix(".json.tmp")
    tmp_path.write_text(json.dumps(out, indent=1, sort_keys=True))
    os.replace(tmp_path, target)
    if not full_run:
        print(
            f"subset run ({len(ops)}/{len(DRIVING_TABLE)} ops) -> {target.name}; "
            "SCALECURVE.json untouched"
        )
    print(json.dumps({"violations": violations, "n_ops": len(report)}))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
