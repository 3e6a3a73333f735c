"""Cheap structural invariants for the round-2 operators (sf0.001).

The exact-correctness burden sits on the DuckDB oracles; these pin the
semantic shape of each result so a future refactor that still happens
to hash-match a co-refactored oracle cannot silently change meaning.
"""

from __future__ import annotations

from pserv_spark.registry import build_queries


def _rows(spark, sf_smoke, name):
    return build_queries()[name](spark, sf_smoke).collect()


def test_ann_recall_bounds(spark, sf_smoke):
    from pserv_spark.operators.similarity import TOP_K

    for r in _rows(spark, sf_smoke, "ann_recall_eval"):
        assert 0 <= r.n_hits <= TOP_K
        assert 0.0 <= r.recall <= 1.0
        assert r.recall == r.n_hits / TOP_K


def test_lsh_eval_bounds(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "dedup_lsh_eval")
    assert r.n_hits <= min(r.n_truth, r.n_candidates)
    assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.precision <= 1.0


def test_silhouette_bounds(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "ml_silhouette_eval")
    assert rows
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.n_pts > 0


def test_km_survival_is_nonincreasing(spark, sf_smoke):
    rows = sorted(_rows(spark, sf_smoke, "survival_kaplan_meier"),
                  key=lambda r: r.t_hour)
    assert rows
    last = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= last
        last = r.survival
        assert r.n_conversions <= r.n_risk


def test_bpe_coverage_rates(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "text_bpe_vocab_coverage")
    assert rows
    for r in rows:
        assert 0.0 <= r.oov_rate <= 1.0
        assert r.n_oov <= r.n_words


def test_interval_overlap_positive(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "join_interval_overlap"):
        assert r.overlap_us >= 0
        assert r.a_user % 2 == 0 and r.b_user % 2 == 1


def test_kleene_matches_are_in_window(spark, sf_smoke):
    from pserv_spark.operators.timedomain import _KLEENE_WINDOW_US

    for r in _rows(spark, sf_smoke, "seq_kleene_funnel"):
        assert 0 <= r.purchase_us - r.signup_us <= _KLEENE_WINDOW_US
        assert r.n_clicks >= 0


def test_k_anonymity_risk_is_reciprocal(spark, sf_smoke):
    from pserv_spark.operators.profiling_ops import _KANON_K

    for r in _rows(spark, sf_smoke, "privacy_k_anonymity"):
        assert r.reident_risk == 1.0 / r.class_size
        assert r.meets_k == (r.class_size >= _KANON_K)


def test_jdbc_registry_values_follow_formula(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "source_jdbc_registry"):
        k = r.visit_id
        assert r.seeing == (k % 50) / 10.0 + 0.5
        assert r.zero_point == 25.0 + (k % 13) / 100.0


def test_orc_roundtrip_totals_match_source(spark, sf_smoke):
    from pserv_spark import catalog
    from pyspark.sql import functions as F

    got = {r.event_type: (r.n, r.cents)
           for r in _rows(spark, sf_smoke, "ingest_orc_roundtrip")}
    src = (
        catalog.v_events(spark, sf_smoke)
        .where((F.col("event_id") < 5000) & (F.col("user_id") % 3 == 0))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("c"))
        .collect()
    )
    assert got == {r.event_type: (r.n, r.c) for r in src}
