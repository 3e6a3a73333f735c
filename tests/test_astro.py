"""Tier-B astronomy tests over the reference-shaped fixtures
(FIXTURES.md Part 2a): the Object / CcdVisit / ForcedSource star schema
at its real shape, exercising the engine's astronomy surface — zoned
crossmatch on sky coordinates, calibrated light curves with a DuckDB
oracle, and the ingest invariants the reference's tests enforce."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pserv_spark.plans import partition_filters
from pserv_spark.sources import calibrate_flux
from pserv_spark.sources.zonestore import ZoneStore
from pserv_spark.testing import compare_df_to_duckdb, compare_frames

from astro_fixtures import EPOCHS_PER_OBJECT, N_OBJECT, N_VISIT, write_astro_tables


@pytest.fixture(scope="module")
def astro(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("astro")
    tables = write_astro_tables(str(d))
    frames = {name: spark.read.parquet(path) for name, path in tables.items()}
    return tables, frames


def test_pk_fk_invariants(astro):
    tables, t = astro
    obj, visit, fs = t["object"], t["ccd_visit"], t["forced_source"]
    assert obj.count() == obj.select("object_id").distinct().count() == N_OBJECT
    assert visit.count() == N_VISIT
    # Composite PK unique; FK closure both ways.
    assert fs.count() == fs.select("object_id", "ccd_visit_id").distinct().count()
    assert fs.join(obj, "object_id", "left_anti").count() == 0
    assert fs.join(visit, "ccd_visit_id", "left_anti").count() == 0
    # ~0.5% masked flux present.
    nulls = fs.where(F.col("ps_flux").isNull() | F.isnan("ps_flux")).count()
    assert 0 < nulls < 0.02 * N_OBJECT * EPOCHS_PER_OBJECT


def test_sky_crossmatch_zoned_equals_naive(spark, astro, tmp_path_factory):
    """ε=0.1° near-neighbor self-join on (ra, decl) — the Qserv query
    shape — via the zoned layout, equal to the naive all-pairs form."""
    _, t = astro
    pts = t["object"].select(
        F.col("object_id").alias("id"),
        F.col("ra").alias("x"),
        F.col("decl").alias("y"),
    )
    store = ZoneStore(
        str(tmp_path_factory.mktemp("skyzones") / "object"), zone_height=0.5
    )
    store.write(pts)
    zoned = store.crossmatch(spark, eps=0.1)
    dist = F.sqrt(
        F.pow(F.col("a.x") - F.col("b.x"), 2) + F.pow(F.col("a.y") - F.col("b.y"), 2)
    )
    naive = (
        pts.alias("a")
        .join(pts.alias("b"), F.col("a.id") < F.col("b.id"))
        .where(dist < 0.1)
        .select(
            F.col("a.id").alias("id"),
            F.col("b.id").alias("id2"),
            F.round(dist, 6).alias("dist"),
        )
    )
    res = compare_frames("sky_xmatch", zoned, naive)
    assert res.ok, res.detail
    assert zoned.count() > 0, "fixture density must yield pairs (FIXTURES invariant)"


def test_cone_search_prunes_sky_zones(spark, astro, tmp_path_factory):
    _, t = astro
    pts = t["object"].select(
        F.col("object_id").alias("id"), F.col("ra").alias("x"), F.col("decl").alias("y")
    )
    store = ZoneStore(str(tmp_path_factory.mktemp("cone") / "object"), zone_height=10.0)
    store.write(pts)
    cone = store.cone_search(spark, cx=180.0, cy=0.0, radius=5.0)
    assert partition_filters(cone)
    assert cone.count() > 0


def test_calibrated_lightcurve_stats_oracle(spark, astro):
    """The reference's headline workload: ForcedSource ⋈ CcdVisit with
    counts→flux calibration, then per-object light-curve statistics —
    held to a DuckDB oracle over the same fixture parquet."""
    tables, t = astro
    fs, visit = t["forced_source"], t["ccd_visit"]
    calibrated = calibrate_flux(
        fs.join(F.broadcast(visit), "ccd_visit_id").where(
            F.col("ps_flux").isNotNull() & ~F.isnan("ps_flux") & (F.col("flags") == 0)
        ),
        counts_col="ps_flux",
        zeropoint_col="zero_point",
        out_col="flux",
    )
    # Determinism (SURVEY §4.5): DECIMAL-exact mean (order-independent
    # partial sums), ROUND only the noisy stddev / pow-derived spread,
    # at 4 digits (flux is O(100), so 4 decimals ≈ 7 significant).
    out = calibrated.groupBy("object_id").agg(
        F.count("*").cast("long").alias("n_obs"),
        (
            F.sum(F.col("flux").cast("decimal(18,9)")).cast("double") / F.count("*")
        ).alias("mean_flux"),
        F.round(F.stddev_samp("flux"), 4).alias("sd_flux"),
        F.round(F.max("flux") - F.min("flux"), 4).alias("amplitude"),
    ).where(F.col("n_obs") >= 10)
    oracle = (
        "SELECT object_id, CAST(COUNT(*) AS BIGINT) AS n_obs, "
        "CAST(SUM(CAST(flux AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mean_flux, "
        "ROUND(STDDEV_SAMP(flux), 4) AS sd_flux, "
        "ROUND(MAX(flux) - MIN(flux), 4) AS amplitude FROM ("
        "SELECT fs.object_id, fs.ps_flux * POWER(10.0, -0.4 * v.zero_point) AS flux "
        "FROM forced_source fs JOIN ccd_visit v ON fs.ccd_visit_id = v.ccd_visit_id "
        "WHERE fs.ps_flux IS NOT NULL AND NOT isnan(fs.ps_flux) AND fs.flags = 0) "
        "GROUP BY object_id HAVING COUNT(*) >= 10"
    )
    res = compare_df_to_duckdb("lightcurve", out, oracle, "", tables=tables)
    assert res.ok, f"{res.detail} {res.mismatches[:3]}"


def test_healpix_ring_matches_independent_python(spark, sf_oracle):
    """The SQL ang2pix_ring must agree with an independent pure-Python
    implementation of the published algorithm (Gorski et al. 2005) on
    every source."""
    import math
    from collections import Counter

    from pserv_spark.operators.astro_sph import _HPX_NSIDE, _sky, astro_healpix_ring

    n = _HPX_NSIDE

    def ang2pix_ring(ra, dec):
        z = math.sin(math.radians(dec))
        za = abs(z)
        tt = (ra / 90.0) % 4.0
        if za <= 2.0 / 3.0:
            jp = math.floor(n * (0.5 + tt) - 0.75 * n * z)
            jm = math.floor(n * (0.5 + tt) + 0.75 * n * z)
            ir = n + 1 + jp - jm
            kshift = 1 - (ir & 1)
            ip = math.floor((jp + jm - n + kshift + 1) / 2) % (4 * n)
            return 2 * n * (n - 1) + (ir - 1) * 4 * n + ip
        tp = tt - math.floor(tt)
        tmp = n * math.sqrt(3.0 * (1.0 - za))
        jp = math.floor(tp * tmp)
        jm = math.floor((1.0 - tp) * tmp)
        ir = jp + jm + 1
        ip = math.floor(tt * ir) % (4 * ir)
        if z > 0:
            return 2 * ir * (ir - 1) + ip
        return 12 * n * n - 2 * ir * (ir + 1) + ip

    expected = Counter(
        ang2pix_ring(r.ra, r.dec) for r in _sky(spark, sf_oracle).collect()
    )
    got = {r.pix: r.n_src for r in astro_healpix_ring(spark, sf_oracle).collect()}
    assert got == dict(expected)


def test_poly_search_matches_matplotlib_free_winding(spark, sf_oracle):
    """Python point-in-convex-polygon recount (same CCW sign test) and
    sanity: all members inside the polygon's bounding box."""
    from pserv_spark.operators.astro_sph import _POLY, _sky, astro_poly_search

    got = {r.vec_id for r in astro_poly_search(spark, sf_oracle).collect()}
    assert got
    ras = [x for x, _ in _POLY]
    decs = [y for _, y in _POLY]
    pts = {r.vec_id: (r.ra, r.dec) for r in _sky(spark, sf_oracle).collect()}
    want = set()
    for vid, (ra, dec) in pts.items():
        inside = all(
            (x2 - x1) * (dec - y1) - (y2 - y1) * (ra - x1) >= 0
            for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1])
        )
        if inside:
            want.add(vid)
    assert got == want
    for vid in got:
        ra, dec = pts[vid]
        assert min(ras) <= ra <= max(ras) and min(decs) <= dec <= max(decs)


def test_wcs_tan_matches_python_gnomonic(spark, sf_oracle):
    """Recompute the TAN projection in Python at the same quantization
    grain; tangent-point neighborhood sanity: small offsets map to
    ~scale-linear pixels."""
    import math

    from pserv_spark.operators.astro_sph import _DEC0, _RA0, _WCS_SCALE, astro_wcs_tan_project

    rows = astro_wcs_tan_project(spark, sf_oracle).collect()
    assert rows
    for r in rows[:200]:
        a = math.radians(r.ra - _RA0)
        d = math.radians(r.dec)
        d0 = math.radians(_DEC0)
        den = math.sin(d0) * math.sin(d) + math.cos(d0) * math.cos(d) * math.cos(a)
        assert den > 0.1
        xi = math.cos(d) * math.sin(a) / den
        eta = (math.cos(d0) * math.sin(d) - math.sin(d0) * math.cos(d) * math.cos(a)) / den
        want_x = math.floor(math.degrees(xi) * _WCS_SCALE * 1000) / 1000
        want_y = math.floor(math.degrees(eta) * _WCS_SCALE * 1000) / 1000
        assert abs(r.px_x - want_x) < 2e-3 and abs(r.px_y - want_y) < 2e-3, r.vec_id
