"""Property-based tests (hypothesis) — SURVEY §5.2 strategy 4, beyond
the fixed-constant eps sweep: randomized parameters must preserve the
zone/banding invariants and spherical-geometry semantics.

Each example runs a Spark job, so example counts are small and
deadlines disabled; shrinking still gives minimal counterexamples.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # deterministic CI: same examples every run
)


@given(eps=st.floats(min_value=0.004, max_value=0.08))
@settings(**_SETTINGS)
def test_zoned_crossmatch_equals_naive_for_random_eps(spark, sf_oracle, eps):
    """The zone prefilter is lossless for ANY radius, not just the
    validated constants."""
    from pserv_spark.operators.zonematch import _points, vec_crossmatch_zoned
    from pserv_spark.testing import compare_frames

    zoned = vec_crossmatch_zoned(spark, sf_oracle, eps=eps)
    pts = _points(spark, sf_oracle)
    dist = F.sqrt(
        F.pow(F.col("a.x") - F.col("b.x"), 2)
        + F.pow(F.col("a.y") - F.col("b.y"), 2)
    )
    naive = (
        pts.alias("a")
        .join(pts.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .where(dist < eps)
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.round(dist, 6).alias("dist"),
        )
    )
    res = compare_frames(f"zoned_eps_{eps}", zoned, naive)
    assert res.ok, f"eps={eps}: {res.detail}"


@given(
    ra0=st.floats(min_value=5.0, max_value=355.0),
    dec0=st.floats(min_value=-60.0, max_value=60.0),
    radius=st.floats(min_value=2.0, max_value=25.0),
)
@settings(**_SETTINGS)
def test_cone_search_matches_python_for_random_cones(
    spark, sf_oracle, ra0, dec0, radius
):
    """Haversine cone membership agrees with a Python recount for
    arbitrary centers/radii (not just the fixed operator constants)."""
    from pserv_spark.operators.astro_sph import _ang_sep, _sky

    sky = _sky(spark, sf_oracle)
    sep = _ang_sep(F.col("ra"), F.col("dec"), F.lit(ra0), F.lit(dec0))
    got = {r.vec_id for r in sky.where(sep < radius).collect()}

    def hav(ra, dec):
        h = (
            math.sin(math.radians(dec - dec0) / 2) ** 2
            + math.cos(math.radians(dec))
            * math.cos(math.radians(dec0))
            * math.sin(math.radians(ra - ra0) / 2) ** 2
        )
        return math.degrees(2 * math.asin(math.sqrt(h)))

    want = {
        r.vec_id for r in sky.collect() if hav(r.ra, r.dec) < radius
    }
    assert got == want


@given(t=st.floats(min_value=0.55, max_value=0.95))
@settings(**_SETTINGS)
def test_containment_prefix_filter_lossless_for_random_threshold(
    spark, sf_oracle, t
):
    """The one-sided ppjoin prefix filter + the round-8 POSITIONAL
    filter stay lossless together for any threshold: engine pairs ==
    Python all-pairs recount (the positional bound
    min(|A|−pa, |B|−pb) ≥ ⌈t·|A|⌉ must never drop a true pair)."""
    from pserv_spark import catalog
    from pserv_spark.functions.text import char_shingles
    from pyspark.sql import Window

    docs = catalog.table(spark, sf_oracle, "documents").where(
        F.col("doc_id") % 7 == 0
    )
    sh = docs.select(
        "doc_id", F.array_sort(char_shingles("text", 5)).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    exploded = sh.select("doc_id", "n_sh", F.explode("sh").alias("w"))
    dfreq = exploded.groupBy("w").agg(F.count("*").alias("dfq"))
    ordered = (
        exploded.join(dfreq, "w")
        .groupBy("doc_id", "n_sh")
        .agg(F.array_sort(F.collect_list(F.struct("dfq", "w"))).alias("osh"))
    )
    # Epsilon-slack ceil, mirroring the operator (ADVICE r8): bare
    # ceil(t*n) can be 1 stricter than the exact requirement when t*n
    # float-rounds just above an integer, dropping a true pair.
    def _req(n):
        return F.ceil(F.lit(t) * n - F.lit(1e-9))

    prefix_len = (F.col("n_sh") - _req(F.col("n_sh")) + 1).cast("int")
    probe = ordered.select(
        F.col("doc_id").alias("d_small"),
        F.col("n_sh").alias("n_small"),
        F.posexplode(
            F.transform(F.slice("osh", F.lit(1), prefix_len), lambda x: x["w"])
        ).alias("pa", "w"),
    )
    build = ordered.select(
        F.col("doc_id").alias("d_big"),
        F.col("n_sh").alias("n_big"),
        F.posexplode(F.transform("osh", lambda x: x["w"])).alias("pb", "w"),
    )
    cand = (
        probe.join(build, "w")
        .where(F.col("d_small") != F.col("d_big"))
        .where(
            F.least(
                F.col("n_small") - F.col("pa"), F.col("n_big") - F.col("pb")
            )
            >= _req(F.col("n_small"))
        )
        .select("d_small", "d_big")
        .distinct()
    )
    ic = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    cont = ic.cast("double") / F.col("a.n_sh")
    got = {
        (r.d_small, r.d_big)
        for r in cand.join(sh.alias("a"), cand.d_small == F.col("a.doc_id"))
        .join(sh.alias("b"), cand.d_big == F.col("b.doc_id"))
        .where(F.col("a.n_sh") < F.col("b.n_sh"))
        .where(cont >= t)
        .collect()
    }

    def shingles(text):
        return {text[i : i + 5] for i in range(max(len(text) - 4, 1))}

    ds = {r.doc_id: shingles(r.text) for r in docs.collect()}
    want = {
        (a, b)
        for a, sa in ds.items()
        for b, sb in ds.items()
        if a != b and len(sa) < len(sb) and len(sa & sb) / len(sa) >= t
    }
    assert got == want, f"t={t}"


@given(t=st.floats(min_value=0.55, max_value=0.95))
@settings(**_SETTINGS)
def test_prefix_filter_candidates_lossless_for_random_threshold(
    spark, sf_oracle, t
):
    """The shared symmetric ppjoin combinator (functions/setjoin.py —
    the candidate stage of dedup_jaccard / dedup_ngram_jaccard) is
    lossless for ANY threshold: its candidate set contains every pair
    with token-set Jaccard >= t (Python all-pairs recount), and the
    verified result equals the recount exactly.  Threshold 0.9 with
    |S| a multiple of 10 exercises the integer ceil(t*n) boundary the
    helper's epsilon slack guards."""
    from pserv_spark import catalog
    from pserv_spark.functions import distinct_tokens, prefix_filter_candidates

    docs = catalog.table(spark, sf_oracle, "documents").where(
        F.col("doc_id") % 7 == 0
    )
    tok = docs.select("doc_id", distinct_tokens("text").alias("ts"))
    cand = {
        (r.d1, r.d2)
        for r in prefix_filter_candidates(tok, "doc_id", "ts", t).collect()
    }

    ds = {r.doc_id: set(r.text.split(" ")) for r in docs.collect()}
    want = {
        (a, b)
        for a, sa in ds.items()
        for b, sb in ds.items()
        if a < b and len(sa & sb) / len(sa | sb) >= t
    }
    assert want <= cand, f"t={t}: missed {sorted(want - cand)[:5]}"


@given(bucket_hours=st.integers(min_value=1, max_value=48))
@settings(**_SETTINGS)
def test_interval_overlap_bucketing_lossless_for_any_width(
    spark, sf_smoke, bucket_hours
):
    """The bucketed candidate generation of the interval-overlap join
    must be lossless for ANY bucket width: the pair set always equals
    the in-Python quadratic over the same session intervals."""
    from pserv_spark.operators.interval_ops import _sessions, join_interval_overlap

    got = sorted(
        tuple(r)
        for r in join_interval_overlap(
            spark, sf_smoke, bucket_us=bucket_hours * 3_600_000_000
        ).collect()
    )
    sess = [tuple(r) for r in _sessions(spark, sf_smoke).collect()]
    a = [r for r in sess if r[0] % 2 == 0]
    b = [r for r in sess if r[0] % 2 == 1]
    want = sorted(
        (au, asess, bu, bsess, min(ae, be) - max(as_, bs))
        for au, asess, as_, ae in a
        for bu, bsess, bs, be in b
        if as_ <= be and bs <= ae
    )
    assert got == want


@given(t=st.floats(min_value=0.55, max_value=0.95))
@settings(**_SETTINGS)
def test_jaccard_pairs_exact_for_random_threshold(spark, sf_oracle, t):
    """Round-9: the int-encoded ``jaccard_pairs`` (dictionary-encoded
    ppjoin candidates + encoded-array verify, functions/setjoin.py)
    returns EXACTLY the Python all-pairs result set for any threshold,
    with each similarity within half-ulp-of-6dp of the true ratio —
    the bijective-encoding equivalence claim, machine-checked."""
    from pserv_spark import catalog
    from pserv_spark.functions import distinct_tokens, jaccard_pairs

    docs = catalog.table(spark, sf_oracle, "documents").where(
        F.col("doc_id") % 7 == 0
    )
    tok = docs.select("doc_id", distinct_tokens("text").alias("ts"))
    got = {
        (r.d1, r.d2): r.jac
        for r in jaccard_pairs(tok, "doc_id", "ts", t).collect()
    }

    ds = {r.doc_id: set(r.text.split(" ")) for r in docs.collect()}
    want = {
        (a, b): len(sa & sb) / len(sa | sb)
        for a, sa in ds.items()
        for b, sb in ds.items()
        if a < b and len(sa & sb) / len(sa | sb) >= t
    }
    assert set(got) == set(want), f"t={t}"
    for pair, true_jac in want.items():
        assert abs(got[pair] - true_jac) <= 5.0000001e-7, (pair, t)
