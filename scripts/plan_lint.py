#!/usr/bin/env python
"""Registry-wide physical-plan lint — the 100 TB scale audit.

Walks EVERY registry query, renders its physical plan, and flags:

- ``nested_loop``: BroadcastNestedLoopJoin / CartesianProduct — the
  O(N²) shapes.  Allowed only for operators on the documented
  exact-baseline / scalar-broadcast allowlist below.
- ``python_row_udf``: row-at-a-time Python UDF (``BatchEvalPython``) —
  the slow lane; only the deliberate UDF-surface demos may use it
  (Arrow/pandas lanes show as ArrowEvalPython/FlatMapGroupsInPandas
  and are fine).
- ``exploded_broadcast``: a STATIC ``BroadcastExchange`` whose subtree
  contains a ``Generate`` (explode) with no size-bounding operator
  (aggregate / limit) on the path between — the fan-out-blind estimate
  trap: Catalyst sizes the exploded stream from its pre-explode child,
  happily broadcasts a corpus-scale side at test scale, and AQE never
  DOWNGRADES a planned broadcast (it only upgrades shuffle joins), so
  the same plan OOMs on a cluster.  Allowed only where the exploded
  side is bounded by construction (constant benchmark suites, 1-row
  vector fan-outs, fixed query batches).
- ``global_window``: an ``Exchange SinglePartition`` feeding a
  ``Window`` with nothing row-bounding in the exchange's subtree — the
  unpartitioned ``OVER (ORDER BY ...)`` funnels the whole input through
  ONE task: fine at test scale, a straggler/OOM at 100 TB.  Safe
  shapes (TakeOrderedAndProject/limit pushed below the window,
  WindowGroupLimit, an aggregate whose rollup-sized output feeds the
  window) pass the detector automatically; the allowlist is only for
  inputs bounded by construction that the plan string can't show
  (pre-materialized rollups, constant key-range filters).

Exit code 1 if any non-allowlisted hazard is found; prints a JSON
report either way.  Usage: python scripts/plan_lint.py [sf_dir]

``--final`` mode (round 5): EXECUTES the merge-hinted / window-audited
subset below and lints the AQE-FINAL plans with the same rules,
writing PLANLINT_FINAL.json.  ``--final --all`` (round 6) widens the
executed-plan lint to EVERY registered id — each batch query runs to
completion and its '== Final Plan ==' section is linted; streaming ids
are covered by the micro-batch capture section instead.  The static lint sees the initial plan;
this verifies at runtime that AQE respects the pinned hints (it never
replaces a user-hinted join) and that its own runtime BHJ conversions
— which are actual-size-informed and therefore safe by mechanism —
never produce a fan-out-blind broadcast or an unbounded global window
in the executed plan.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

#: Operators allowed to plan a nested-loop/cartesian join, with why.
NESTED_LOOP_ALLOWED: dict[str, str] = {
    # documented exact baselines whose sub-quadratic counterparts exist
    "join_theta_band": "dim-scale theta join; scale path join_theta_band_binned",
    "join_cross": "5x5 region cartesian by definition",
    "vec_cosine_pairs": "exact baseline; scale path vec_crossmatch_zoned",
    "vec_knn": "exact brute-force baseline; scale path ann_*",
    "vec_crossmatch": "naive oracle anchor; scale path vec_crossmatch_zoned",
    "vec_cone_search": "scalar-threshold scan (1-row broadcast)",
    "ann_recall_eval": "eval op: exact side is the measurement itself",
    "dedup_embedding_cosine": "exact baseline; scale path dedup_minhash_lsh",
    "er_fuzzy_blocked": "blocked candidates; residual Levenshtein on blocks",
    "dedup_jaccard": "prefix-filtered candidates (setjoin.py; listed defensively)",
    "dedup_ngram_jaccard": "prefix-filtered candidates",
    "dedup_containment": "one-sided prefix filter candidates",
    # 1-row scalar broadcast joins (aggregates joined onto the scan)
    "subquery_q2_mincost": "scalar min-cost subquery broadcast",
    "subquery_q22_balance": "scalar avg-balance broadcast",
    "subquery_scalar_corr": "per-part scalar avg broadcast",
    "agg_q11_important": "scalar threshold broadcast",
    "join_q15_topsupplier": "scalar max-revenue broadcast",
    "win_skyline_2d": "driver-less scalar bound broadcast",
    "sample_time_embargo_split": "1-row time-boundary broadcast",
    "sample_weighted_priority": "1-row threshold broadcast",
    "causal_diff_in_diff": "1-row midpoint broadcast",
    "ab_welch_ztest": "two 1-row group-moment frames",
    "ml_logit_newton": "1-row beta frames between Newton steps",
    "ml_lift_gains_curve": "1-row totals broadcast",
    "ml_ols_normal_eq": "1-row moment frame",
    "serve_lambda_union": "1-row hi-day boundary broadcast",
    "survival_kaplan_meier": "1-row max-timestamp broadcast",
    "seq_markov_transitions": "1-row total-count broadcast",
    "profile_ks_drift": "1-row split-point broadcast",
    "profile_psi_drift": "1-row split-point broadcast",
    "stream_psi_monitor": "1-row all-time total broadcast",
    "ts_winsorized_mean": "1-row percentile-bounds broadcast",
    "profile_benford_digits": "1-row total broadcast",
    "profile_entropy_gini": "per-column total broadcast",
    "text_zipf_slope": "1-row moment broadcast",
    "lightcurve_dft_power": "4-row trial-period fan-out",
    "lightcurve_dcf_lag": "7-row lag fan-out on the daily rollup",
    "lightcurve_lomb_scargle": "trial-period fan-out",
    "lightcurve_periodogram": "trial-period fan-out",
    "decontaminate_embedding": "benchmark-suite broadcast (constant size)",
    "text_bm25_topk": "1-row corpus-stats broadcast",
    "text_bm25_ndcg": "1-row DCG x 1-row IDCG scalar combine",
    "tfidf": "1-row doc-count broadcast",
    "text_cooccur_pmi": "1-row total broadcast",
    "text_bigram_logprob": "1-row vocab-total broadcast",
    "sketch_sampled_quantile": "1-row sample-size broadcast",
    "sketch_kmv_distinct": "k-row sketch union",
    "agg_q8_marketshare": "scalar year-volume broadcast",
    "join_q8_marketshare": "scalar year-volume broadcast",
    "astro_depth_map": "1-row zero-point broadcast",
    "ts_changepoint_cusum": "1-row series-total broadcast",
    "ts_runs_test": "1-row median broadcast",
    "phase_fold_binning": "1-row epoch broadcast",
    "vec_centroid_per_label": "dim-count fan-out",
    "profile_chi2_independence": "marginal-totals broadcast",
    "text_rake_keyphrases": "1-row stats broadcast",
    "cluster_kmeans_lloyd": "k-row centroid broadcast per iteration",
    "vec_pca_power": "1-row eigvec broadcast per iteration",
    "sample_coreset_kcenter": "k-row pick broadcast per iteration",
    "dedup_semantic_clustered": "k-row centroid broadcast",
    "text_bpe_apply": "VOCAB-row dict broadcast",
    "ts_forecast_snaive_eval": "1-row holdout-boundary broadcast",
    "ts_max_concurrency": "metadata-sized cross-day carry",
    "sample_mixture_weights": "per-language weight broadcast",
    "class_balance_downsample": "per-class rate broadcast",
    "ann_pq_topk": "codebook/ADC-table broadcasts",
    "ann_ivf_topk": "centroid-table broadcast",
    "ann_lsh_topk": "hyperplane-table broadcast",
    "vec_quantize_int8": "1-row scale broadcast",
    "vec_norm_stats": "per-label percentile broadcast",
    "astro_density_knn": "zoned candidate set",
    "astro_xmatch_best": "zoned candidate set",
    "astro_crossmatch_sph": "zoned candidate set",
    "stream_static_join": "static-dim broadcast",
    "mm_phash_near_dup": "banded candidate pairs",
    "interleave_sources": "per-source count broadcast",
    "pack_sequential_bins": "per-lang offset broadcast",
    "text_chunk_sliding": "chunk-count fan-out",
    "win_rolling_median": "frame fan-out",
    "gapfill_date_spine": "date-spine broadcast",
    "ts_gap_fill_locf": "date-spine broadcast",
    "ts_seasonal_dow": "1-row grand-mean broadcast",
    "report_growth_rates": "rollup-sized window",
    "graph_common_neighbors": "candidate pairs from shared-neighbor join",
    "quality_composite_filter": "1-row corpus-stats broadcast",
    "merge_cdc_upsert": "1-row (lo,hi) time-boundary broadcast with inequality residual",
    "graph_bfs_frontier": "per-hop frontier scalar broadcast",
    "ml_nb_train_classify": "class-total scalar broadcasts",
    "dedup_lsh_eval": "eval op: exact all-pairs truth IS the measurement",
    "ml_silhouette_eval": "eval op: bounded-sample pair distances ARE the measurement",
    "seq_kleene_funnel": "window-only plan; no joins expected (listed defensively)",
    "text_repetition_ratio": "1-row stats broadcast",
}

#: Operators allowed a row-at-a-time Python UDF lane.
PYTHON_ROW_UDF_ALLOWED: dict[str, str] = {
    "udf_arrow_scalar": "the deliberate Arrow-scalar UDF lane demo",
    "udtf_word_expand": "the deliberate Python UDTF lane demo",
}

#: Operators allowed to broadcast an exploded subtree: the exploded side
#: is bounded by construction, so the static broadcast is the CORRECT
#: plan at any corpus scale.
EXPLODED_BROADCAST_ALLOWED: dict[str, str] = {
    "decontaminate_ngram": "benchmark-suite gram side; constant size by declaration",
    "vec_pca_power": "component fan-out of the 1-row eigvec frame",
    "ann_lsh_topk": "bucketed QUERY batch; bounded by the probe set",
}

#: Operators allowed a single-partition window: the window input is
#: bounded by construction in a way the plan string cannot show.
GLOBAL_WINDOW_ALLOWED: dict[str, str] = {
    "report_growth_rates": (
        "windows over the pre-materialized daily rollup (one row per "
        "day x event_type) — the bounding aggregate ran in the "
        "materialization job, invisible to this plan"
    ),
    "win_rank_dense": "constant key-range filter (o_orderkey < 300) bounds the frame",
    "win_ntile_pctrank": "constant key-range filter (o_orderkey < 1000) bounds the frame",
}

#: The ids whose EXECUTED (AQE-final) plans --final re-lints: every
#: merge-hint-pinned site from the round-4 exploded-broadcast fix, the
#: round-5 global-window sites, and (round 6, VERDICT r5 next-round #5)
#: the full shuffle-budget-pinned dedup/ANN/curation spine from
#: tests/test_plans.py::test_heavy_spine_exchange_budget — the static
#: lint proves the hints exist; this proves AQE kept them at runtime.
FINAL_LINT_IDS = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_jaccard",
    "dedup_containment",
    "mm_phash_near_dup",
    "vec_crossmatch_zoned",
    "join_interval_overlap",
    "text_cooccur_pmi",
    "text_langid_confusion",
    "text_langid_prf1",
    "text_bigram_logprob",
    "text_rake_keyphrases",
    "report_growth_rates",
    "win_rank_dense",
    "win_ntile_pctrank",
    "sample_weighted_priority",
    # round-6 additions: the budget-pinned heavy spine
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_canonical_keeper",
    "dedup_cluster_cc",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_lsh_topk",
    "tfidf",
    "minhash_signature",
    "text_bpe_train",
    "text_bpe_apply",
    "decontaminate_ngram",
    "decontaminate_embedding",
    "feat_hashing_trick",
    "feat_target_encode",
    "pipeline_curate_e2e",
]

#: Streaming ids whose EXECUTED micro-batch plans --final lints via the
#: streaming.jobs.BATCH_PLAN_CAPTURE hook (round 6, VERDICT r5 #5): the
#: StreamingQuery's last-executed plan (explainInternal) plus every
#: foreachBatch-internal DataFrame plan — the parts of a streaming job
#: the static registry lint cannot see (it only sees the post-stream
#: RESULT DataFrame read back from the sink).
STREAM_LINT_IDS = [
    "stream_tumbling_complete",
    "stream_hopping_complete",
    "stream_dedup_keys",
    "stream_session_window",
    "stream_stateful_counts",
    "stream_tumbling_watermark",
    "stream_static_join",
    "stream_stream_join",
    "stream_rollup_upsert",
    "stream_topk_maintain",
    "stream_late_drop_audit",
    "stream_checkpoint_resume",
    "stream_cdc_apply",
    "stream_psi_monitor",
    "stream_jdbc_sink",
    "stream_fitslike_tail",
]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    final_mode = "--final" in args
    if final_mode:
        args.remove("--final")
    all_mode = "--all" in args
    if all_mode:
        args.remove("--all")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from pserv_spark.plans import (
        exploded_broadcast,
        final_plan_section,
        global_window_unbounded,
    )
    from pserv_spark.plans import final_plan as _final_plan
    from pserv_spark.registry import build_queries
    from pserv_spark.session import get_session

    spark = get_session("plan_lint")
    spark.sparkContext.setLogLevel("ERROR")

    def lint_plan(name: str, plan: str, flags: dict) -> int:
        n = 0
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            ok = name in NESTED_LOOP_ALLOWED
            flags["nested_loop"] = (
                f"allowed: {NESTED_LOOP_ALLOWED[name]}" if ok else "VIOLATION"
            )
            n += 0 if ok else 1
        if "BatchEvalPython" in plan:
            ok = name in PYTHON_ROW_UDF_ALLOWED
            flags["python_row_udf"] = (
                f"allowed: {PYTHON_ROW_UDF_ALLOWED[name]}" if ok else "VIOLATION"
            )
            n += 0 if ok else 1
        if exploded_broadcast(plan):
            ok = name in EXPLODED_BROADCAST_ALLOWED
            flags["exploded_broadcast"] = (
                f"allowed: {EXPLODED_BROADCAST_ALLOWED[name]}" if ok else "VIOLATION"
            )
            n += 0 if ok else 1
        if global_window_unbounded(plan):
            ok = name in GLOBAL_WINDOW_ALLOWED
            flags["global_window"] = (
                f"allowed: {GLOBAL_WINDOW_ALLOWED[name]}" if ok else "VIOLATION"
            )
            n += 0 if ok else 1
        return n

    report: dict[str, dict] = {}
    violations = 0
    queries = build_queries()
    names = FINAL_LINT_IDS if final_mode else list(queries)
    if final_mode and all_mode:
        # --final --all (round 6): execute EVERY registered id and lint
        # its AQE-final plan.  Streaming ids are excluded from this loop
        # — the dedicated streaming section below lints their captured
        # micro-batch plans, which is the executed plan that matters (the
        # main loop would only see the post-stream sink re-read).
        names = [n for n in queries if n not in set(STREAM_LINT_IDS)]
    for name in names:
        try:
            # Lookup inside the try: a renamed/unregistered FINAL_LINT_IDS
            # entry records a per-op err instead of aborting the lint.
            df = queries[name](spark, sf_dir)
            if final_mode:
                # Executes, then reads the AQE plan — sliced to the
                # '== Final Plan ==' section so a hazard present only
                # in the never-executed Initial Plan isn't reported as
                # an executed-plan violation.
                plan = final_plan_section(_final_plan(df))
            else:
                plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            # An op whose plan cannot even be rendered is a loud failure
            # in BOTH modes: a silent err row would mask a lint hole.
            report[name] = {"err": repr(e)[:160]}
            violations += 1
            continue
        flags: dict = {}
        violations += lint_plan(name, plan, flags)
        if flags:
            report[name] = flags

    # Streaming section (--final only): re-run each streaming job with
    # the micro-batch plan-capture hook enabled and lint every captured
    # executed plan — StreamingQuery.explainInternal's last-batch plan
    # plus the foreachBatch-internal DataFrame plans.
    n_stream_plans = 0
    if final_mode:
        from pserv_spark.streaming import jobs as stream_jobs

        for name in STREAM_LINT_IDS:
            captured: list[tuple[str, str]] = []
            stream_jobs.BATCH_PLAN_CAPTURE = captured
            try:
                queries[name](spark, sf_dir).collect()
            except Exception as e:  # noqa: BLE001
                report[name] = {"err": repr(e)[:160]}
                violations += 1
                continue
            finally:
                stream_jobs.BATCH_PLAN_CAPTURE = None
            if not captured:
                report[name] = {"err": "no micro-batch plan captured"}
                violations += 1
                continue
            n_stream_plans += len(captured)
            flags = {}
            for label, plan in captured:
                v = lint_plan(name, final_plan_section(plan), flags)
                if v:
                    flags["plan_source"] = label
                violations += v
            if flags:
                report[name] = flags

    out = {"violations": violations, "flagged": report}
    if final_mode:
        out["mode"] = "final-all" if all_mode else "final"
        out["ids"] = names + STREAM_LINT_IDS
        out["n_stream_plans"] = n_stream_plans
        with open(__file__.rsplit("/", 2)[0] + "/PLANLINT_FINAL.json", "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
