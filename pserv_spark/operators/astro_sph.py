"""Spherical-geometry astronomy operators (scisql/Qserv analogs).

The corpus' `vec_cone_search`/`vec_crossmatch` validate the *shape* of
Qserv's spatial workload on a euclidean plane; these operators add the
real spherical math — haversine angular separation, the direct analog
of scisql's ``scisql_angSep``/``scisql_s2PtInCircle`` UDFs that Qserv
queries call (public Qserv/scisql docs; reference mount empty, see
SURVEY §0).

Sky coordinates are derived deterministically from the embedding table
(`ra = (emb[1]+0.5)*360`, `dec = emb[2]*180` — components lie in
(-0.5, 0.5), so ra ∈ (0, 360) and dec ∈ (-90, 90)) since the driver schema
has no ra/dec columns; the arithmetic is double-exact on the canonical
``v_emb`` double arrays, and JVM/DuckDB libm agree on
SIN/COS/ASIN to well under the 1e-6 rounding grain (verified: 2000/2000
values hash-match at round-6; float32 inputs do NOT — the cast to
double before any trig is load-bearing, SURVEY §4.5 rule 5).

Scale design: the crossmatch is implemented zone-first (Qserv's own
chunking strategy, SURVEY §4.3): ``zone = floor(dec/eps)``, candidates
from the 3 neighbor zones via explode → equi-join on zone, exact
haversine residual after.  Angular separation ≥ |Δdec|, so the zone
prefilter is a strict superset of the ε-ball — the oracle runs the
naive O(N²) pairwise form and the pair sets must match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ._oracle import inline_views

_RA0, _DEC0 = 180.0, 0.0  # cone center (deg)
_CONE_R = 10.0  # cone radius (deg)
_XM_EPS = 2.0  # crossmatch radius (deg)


def _sky(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.v_emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        ((F.element_at("emb", 1) + 0.5) * 360.0).alias("ra"),
        (F.element_at("emb", 2) * 180.0).alias("dec"),
    )


def _ang_sep(ra1: Column, dec1: Column, ra2: Column, dec2: Column) -> Column:
    """Haversine angular separation in degrees (scisql_angSep)."""
    h = (
        F.pow(F.sin(F.radians(dec1 - dec2) / 2), 2)
        + F.cos(F.radians(dec1))
        * F.cos(F.radians(dec2))
        * F.pow(F.sin(F.radians(ra1 - ra2) / 2), 2)
    )
    return F.degrees(2 * F.asin(F.sqrt(h)))


def astro_conesearch_sph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical cone search (scisql_s2PtInCircle): sources within
    `_CONE_R` degrees of the center.  At 100 TB the dec-zone partition
    layout (sources/zonestore.py) turns this into partition pruning +
    the same residual; here the residual alone is the whole query."""
    sky = _sky(spark, sf_dir)
    sep = _ang_sep(F.col("ra"), F.col("dec"), F.lit(_RA0), F.lit(_DEC0))
    return (
        sky.withColumn("sep_deg", F.round(sep, 6))
        .where(sep < _CONE_R)
        .select("vec_id", "ra", "dec", "sep_deg")
    )


def astro_crossmatch_sph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zoned spherical self-crossmatch: pairs closer than `_XM_EPS`
    degrees.  Zone equi-join (shuffle-bounded) + exact haversine
    residual; the naive O(N²) oracle must return the identical pair
    set — separation ≥ |Δdec| makes the 3-zone candidate set a strict
    superset."""
    sky = _sky(spark, sf_dir)
    zoned = sky.withColumn("zone", F.floor(F.col("dec") / _XM_EPS))
    a = zoned.select(
        F.col("vec_id").alias("id1"),
        F.col("ra").alias("ra1"),
        F.col("dec").alias("dec1"),
        F.explode(
            F.array(F.col("zone") - 1, F.col("zone"), F.col("zone") + 1)
        ).alias("zone"),
    )
    b = zoned.select(
        F.col("vec_id").alias("id2"),
        F.col("ra").alias("ra2"),
        F.col("dec").alias("dec2"),
        "zone",
    )
    sep = _ang_sep(F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2"))
    return (
        a.join(b, "zone")
        .where(F.col("id1") < F.col("id2"))
        .where(sep < _XM_EPS)
        .select("id1", "id2", F.round(sep, 6).alias("sep_deg"))
    )


def lightcurve_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust light-curve outlier detection: flag measurements more
    than 3 MADs from the per-object median (the standard variability
    screen before period fitting).  Median/MAD via exact interpolated
    percentile — both engines sort the same doubles.  Two shuffles on
    user_id, both map-side combinable."""
    ev = catalog.v_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "user_id").withColumn(
        "abs_dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy(F.col("user_id").alias("uid")).agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, dev.user_id == mad.uid)
        .where(F.col("abs_dev") > 3 * F.col("mad"))
        .select(
            "event_id",
            "user_id",
            "value",
            F.round("med", 6).alias("med"),
            F.round("abs_dev", 6).alias("abs_dev"),
        )
    )


def astro_mag_from_flux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pogson magnitude from flux (mag = -2.5·log10(flux)) + distance
    modulus vs a reference — the calibration arithmetic the reference
    applies at ingest (SURVEY §2.1 forced-source calibration), exposed
    as a query op.  Pure log10/arithmetic; round 6."""
    ev = catalog.v_events(spark, sf_dir).where(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    )
    mag = -2.5 * F.log10(F.col("value"))
    # `+ 0.0` normalizes IEEE negative zero: at value==100 the libm
    # log10 ulp makes the difference round to -0.0 on one engine and
    # +0.0 on the other, and value-hash canonicalization tells them
    # apart ('-0.0' != '0.0').
    return ev.select(
        "event_id",
        "user_id",
        (F.round(mag, 6) + 0.0).alias("mag"),
        (F.round(mag - (-2.5 * F.log10(F.lit(100.0))), 6) + 0.0).alias("dmag_ref"),
    )


_BOX_RA_MIN, _BOX_RA_WIDTH = 250.0, 160.0  # box spans the RA=0 wrap
_BOX_DEC_MIN, _BOX_DEC_MAX = -20.0, 20.0
_ELL_A, _ELL_B, _ELL_PA = 15.0, 5.0, 30.0  # semi-axes (deg), position angle
_PM_SCALE = 100.0  # mas/yr per unit embedding component
_PM_DT_YR = 10.0  # propagation epoch difference


def astro_box_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical box search (scisql_s2PtInBox) with RA wraparound.

    The box spans the RA=0 meridian (350°–10°), the case a naive
    BETWEEN gets wrong; membership is ``(ra - ra_min) mod 360 <=
    width``.  Pure scan-side predicate — at 100 TB the dec bound prunes
    the zone-partitioned layout and the RA test is a residual."""
    sky = _sky(spark, sf_dir)
    ra_off = (F.col("ra") - F.lit(_BOX_RA_MIN) + 360.0) % 360.0
    return sky.where(
        (ra_off <= _BOX_RA_WIDTH)
        & F.col("dec").between(_BOX_DEC_MIN, _BOX_DEC_MAX)
    ).select("vec_id", "ra", "dec", F.round(ra_off, 6).alias("ra_offset"))


def astro_ellipse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elliptical aperture search (scisql_s2PtInEllipse, small-angle
    form): offsets from the center are rotated into the ellipse frame
    by the position angle and tested against (u/a)² + (v/b)² ≤ 1.
    Center dec = 0 so the tangent-plane RA scaling is exact."""
    sky = _sky(spark, sf_dir)
    th = F.radians(F.lit(_ELL_PA))
    dx = (F.col("ra") - _RA0) * F.cos(F.radians(F.lit(_DEC0)))
    dy = F.col("dec") - _DEC0
    u = dx * F.cos(th) + dy * F.sin(th)
    v = -dx * F.sin(th) + dy * F.cos(th)
    m = F.pow(u / _ELL_A, 2) + F.pow(v / _ELL_B, 2)
    return (
        sky.withColumn("m", m)
        .where(F.col("m") <= 1.0)
        .select("vec_id", "ra", "dec", F.round("m", 6).alias("ell_dist2"))
    )


def astro_epoch_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper-motion epoch propagation: position advanced `_PM_DT_YR`
    years at (pm_ra·cosδ correction, pm_dec) — the astrometric
    transform Qserv queries apply when matching catalogs at different
    epochs.  Proper motions derive deterministically from embedding
    dims 3/4 (mas/yr); narrow map, no shuffle."""
    emb = catalog.v_emb(spark, sf_dir)
    sky = emb.select(
        "vec_id",
        ((F.element_at("emb", 1) + 0.5) * 360.0).alias("ra"),
        (F.element_at("emb", 2) * 180.0).alias("dec"),
        (F.element_at("emb", 3) * _PM_SCALE).alias("pm_ra"),
        (F.element_at("emb", 4) * _PM_SCALE).alias("pm_dec"),
    )
    deg_per_mas = F.lit(_PM_DT_YR / 3_600_000.0)
    ra2 = F.col("ra") + F.col("pm_ra") * deg_per_mas / F.cos(F.radians("dec"))
    dec2 = F.col("dec") + F.col("pm_dec") * deg_per_mas
    return sky.select(
        "vec_id",
        F.round("pm_ra", 6).alias("pm_ra"),
        F.round("pm_dec", 6).alias("pm_dec"),
        F.round(ra2, 6).alias("ra_new"),
        F.round(dec2, 6).alias("dec_new"),
    )


def lightcurve_stetson_j(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stetson J variability index per object (Stetson 1996) — the
    LSST-era statistic that separates correlated variability from
    noise: consecutive-pair residual products
    P_k = δ_k·δ_{k+1}, J = Σ sgn(P_k)·√|P_k| / N_pairs, with
    δ_k = √(n/(n−1))·(v_k − mean)/σ.

    Determinism (SURVEY §4.5 composition): mean is a DECIMAL-exact
    quotient; σ (engine variance accumulation order differs in final
    ulps) is quantized at 9 dp before use; per-row sqrt/division are
    IEEE-correctly-rounded so identical on both engines; pair terms
    are re-quantized at 12 dp and summed as DECIMAL(28,12) (exact,
    order-independent); the final J rounds at 6.  One groupBy + one
    lag window + one groupBy, all partitioned on the object key.
    """
    ev = catalog.v_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("value").cast("decimal(14,2)")).cast("double") / F.count("*")).alias("mean_v"),
        F.round(F.stddev_samp("value"), 9).alias("sd"),
    ).where(F.col("n") >= 5)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    delta = (
        ev.join(stats, "user_id")
        .withColumn(
            "d",
            F.round(
                F.sqrt(F.col("n") / (F.col("n") - 1.0))
                * (F.col("value") - F.col("mean_v"))
                / F.nullif(F.col("sd"), F.lit(0.0)),
                9,
            ),
        )
        .withColumn("d_next", F.lead("d").over(w))
        .where(F.col("d").isNotNull() & F.col("d_next").isNotNull())
    )
    p = F.col("d") * F.col("d_next")
    term = F.signum(p) * F.sqrt(F.abs(p))
    return (
        delta.groupBy("user_id")
        .agg(
            (
                F.sum(F.round(term, 12).cast("decimal(28,12)")).cast("double")
                / F.count("*")
            ).alias("raw_j"),
            F.count("*").cast("long").alias("n_pairs"),
        )
        .select(
            "user_id",
            (F.round("raw_j", 6) + 0.0).alias("stetson_j"),
            "n_pairs",
        )
    )


_STETSON_ORACLE = (
    "WITH ev AS (SELECT user_id, event_id, ts_us, value FROM v_events "
    "WHERE event_type = 'purchase'), "
    "stats AS (SELECT user_id, COUNT(*) AS n, "
    "CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS mean_v, "
    "ROUND(STDDEV_SAMP(value), 9) AS sd FROM ev GROUP BY user_id HAVING COUNT(*) >= 5), "
    "d AS (SELECT ev.user_id, "
    "ROUND(SQRT(n / (n - 1.0)) * (value - mean_v) / NULLIF(sd, 0.0), 9) AS d, "
    "ts_us, event_id FROM ev JOIN stats USING (user_id)), "
    "pairs AS (SELECT user_id, d, "
    "LEAD(d) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS d_next FROM d), "
    "terms AS (SELECT user_id, SIGN(d * d_next) * SQRT(ABS(d * d_next)) AS t "
    "FROM pairs WHERE d IS NOT NULL AND d_next IS NOT NULL) "
    "SELECT user_id, "
    "ROUND(CAST(SUM(CAST(ROUND(t, 12) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) + 0.0 "
    "AS stetson_j, CAST(COUNT(*) AS BIGINT) AS n_pairs "
    "FROM terms GROUP BY user_id"
)


_HPX_NSIDE = 8
_HPX_NPIX = 12 * _HPX_NSIDE * _HPX_NSIDE  # 768
_HPX_NCAP = 2 * _HPX_NSIDE * (_HPX_NSIDE - 1)  # 112


def _healpix_sql(elem1: str, elem2: str) -> str:
    """Engine-shared ang2pix_ring (Gorski et al. 2005, the public
    HEALPix ring-scheme pixelization; nside=8) + per-pixel counts.

    Identical SQL text runs in both engines (only array element access
    differs), so the double expression trees match; the single trig
    call (sin of dec) carries the usual measure-zero floor-boundary
    risk (SURVEY timedomain precedent).  `tt` needs no trig at all:
    phi/(pi/2) == ra/90.
    """
    n = _HPX_NSIDE
    four_n = 4 * n
    return (
        f"WITH sky AS (SELECT vec_id, ({elem1} + 0.5) * 360.0 AS ra, "
        f"{elem2} * 180.0 AS dec FROM v_emb), "
        "g AS (SELECT vec_id, "
        "  ra / 90.0 - 4.0 * FLOOR(ra / 360.0) AS tt, "
        "  SIN(RADIANS(dec)) AS z FROM sky), "
        "eq AS (SELECT vec_id, tt, z, ABS(z) AS za, "
        f"  CAST(FLOOR({n} * (0.5 + tt) - {0.75 * n} * z) AS BIGINT) AS jp, "
        f"  CAST(FLOOR({n} * (0.5 + tt) + {0.75 * n} * z) AS BIGINT) AS jm "
        "FROM g), "
        "pixed AS (SELECT vec_id, CASE WHEN za <= 2.0 / 3.0 THEN "
        # equatorial belt: ring ir in [1, 2n+1], 4n pixels per ring
        f"  {_HPX_NCAP} + ({n} + jp - jm) * {four_n} + "
        f"  ((CAST(FLOOR((jp + jm - {n} + (1 - (({n} + 1 + jp - jm) % 2)) + 1) / 2.0) AS BIGINT) "
        f"    % {four_n}) + {four_n}) % {four_n} "
        "ELSE "
        # polar caps: ring ir in [1, n), 4*ir pixels per ring
        f"  CASE WHEN z > 0 THEN 2 * hp_ir * (hp_ir - 1) + hp_ip "
        f"  ELSE {_HPX_NPIX} - 2 * hp_ir * (hp_ir + 1) + hp_ip END "
        "END AS pix FROM ("
        "  SELECT *, jp2 + jm2 + 1 AS hp_ir, "
        "    ((CAST(FLOOR(tt * (jp2 + jm2 + 1)) AS BIGINT) % (4 * (jp2 + jm2 + 1))) "
        "     + (4 * (jp2 + jm2 + 1))) % (4 * (jp2 + jm2 + 1)) AS hp_ip "
        "  FROM (SELECT *, "
        f"    CAST(FLOOR((tt - FLOOR(tt)) * {n} * SQRT(3.0 * (1.0 - za))) AS BIGINT) AS jp2, "
        f"    CAST(FLOOR((1.0 - (tt - FLOOR(tt))) * {n} * SQRT(3.0 * (1.0 - za))) AS BIGINT) AS jm2 "
        "  FROM eq) _p) _q) "
        "SELECT pix, CAST(COUNT(*) AS BIGINT) AS n_src "
        "FROM pixed GROUP BY pix"
    )


def astro_healpix_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEALPix ring-scheme source-density map (nside=8): the sky
    histogram Qserv-era pipelines build for coverage/depth QA, and the
    equal-area bucketing key for spatial co-location at 100 TB (a
    `partitionBy(pix)` layout gives every chunk the same solid angle —
    the property dec-zones lack near the poles).  Pure single-pass
    map + groupBy: pixel assignment is a narrow projection fused into
    the scan; the only exchange is the 768-bucket aggregate."""
    catalog.load_tables(spark, sf_dir)
    return spark.sql(_healpix_sql("element_at(emb, 1)", "element_at(emb, 2)"))


# J2000 north galactic pole + node constants (Perryman/Hipparcos
# convention, public): α_NGP, δ_NGP, l of the north celestial pole.
_A_NGP, _D_NGP, _L_NCP = 192.85948, 27.12825, 122.93192


def _galactic_sql(e1: str, e2: str) -> str:
    """Equatorial → galactic (l, b) rotation — the scisql-style
    coordinate UDF (Qserv queries filter on galactic latitude to mask
    the plane).  Narrow per-row projection, no shuffle at all; outputs
    floor-quantized at 1e-6 deg so the 1-ulp JVM/libm trig drift never
    crosses the hash (never ROUND — §4.5 rule 2)."""
    sinb = (
        f"SIN(RADIANS({_D_NGP})) * SIN(RADIANS(dec)) + "
        f"COS(RADIANS({_D_NGP})) * COS(RADIANS(dec)) * COS(RADIANS(ra - {_A_NGP}))"
    )
    y = f"COS(RADIANS(dec)) * SIN(RADIANS(ra - {_A_NGP}))"
    x = (
        f"COS(RADIANS({_D_NGP})) * SIN(RADIANS(dec)) - "
        f"SIN(RADIANS({_D_NGP})) * COS(RADIANS(dec)) * COS(RADIANS(ra - {_A_NGP}))"
    )
    lraw = f"({_L_NCP} - DEGREES(ATAN2({y}, {x})))"
    return (
        f"WITH sky AS (SELECT vec_id, ({e1} + 0.5) * 360.0 AS ra,"
        f" {e2} * 180.0 AS dec FROM v_emb)"
        " SELECT vec_id, ra, dec,"
        # CAST ... AS DOUBLE before the divide: Spark parses the
        # 1000000.0 literal as DECIMAL, and BIGINT/DECIMAL would emit
        # a DECIMAL column (schema drift vs the DOUBLE oracle).
        f" CAST(CAST(FLOOR(({lraw} - 360.0 * FLOOR({lraw} / 360.0)) * 1000000.0) AS BIGINT)"
        "   AS DOUBLE) / 1000000.0 AS gal_l,"
        f" CAST(CAST(FLOOR(DEGREES(ASIN({sinb})) * 1000000.0) AS BIGINT)"
        "   AS DOUBLE) / 1000000.0 AS gal_b"
        " FROM sky"
    )


def astro_xmatch_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-match catalog crossmatch: each source's single nearest
    neighbor within `_XM_EPS` degrees — the directional form Qserv's
    catalog-vs-catalog matching actually serves (vs the all-pairs
    `astro_crossmatch_sph`).  Candidates come from the same 3-zone
    equi-join; the per-source winner is ROW_NUMBER over the total
    order (round(sep, 6), id2) — §4.5 rule 4."""
    sky = _sky(spark, sf_dir)
    zoned = sky.withColumn("zone", F.floor(F.col("dec") / _XM_EPS))
    a = zoned.select(
        F.col("vec_id").alias("id1"),
        F.col("ra").alias("ra1"),
        F.col("dec").alias("dec1"),
        F.explode(
            F.array(F.col("zone") - 1, F.col("zone"), F.col("zone") + 1)
        ).alias("zone"),
    )
    b = zoned.select(
        F.col("vec_id").alias("id2"),
        F.col("ra").alias("ra2"),
        F.col("dec").alias("dec2"),
        "zone",
    )
    sep = _ang_sep(F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2"))
    pairs = (
        a.join(b, "zone")
        .where(F.col("id1") != F.col("id2"))
        .where(sep < _XM_EPS)
        .select("id1", "id2", F.round(sep, 6).alias("sep_deg"))
    )
    w = Window.partitionBy("id1").orderBy("sep_deg", "id2")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id1", F.col("id2").alias("best_id"), "sep_deg")
    )


_DENS_K = 5
_DENS_EPS = 10.0  # wider than the crossmatch: k=5 needs ~4 expected neighbors


def astro_density_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local source density via the distance to the 5th-nearest
    neighbor (the classic kNN density estimator; used for cluster /
    overdensity finding in survey catalogs).  Same zoned candidate
    generation as the crossmatch; sources with fewer than 5 neighbors
    inside the 10° search radius are excluded (deterministically).
    Rank order (round(sep,6), id2) is total — §4.5 rule 4."""
    sky = _sky(spark, sf_dir)
    zoned = sky.withColumn("zone", F.floor(F.col("dec") / _DENS_EPS))
    a = zoned.select(
        F.col("vec_id").alias("id1"),
        F.col("ra").alias("ra1"),
        F.col("dec").alias("dec1"),
        F.explode(
            F.array(F.col("zone") - 1, F.col("zone"), F.col("zone") + 1)
        ).alias("zone"),
    )
    b = zoned.select(
        F.col("vec_id").alias("id2"),
        F.col("ra").alias("ra2"),
        F.col("dec").alias("dec2"),
        "zone",
    )
    sep = _ang_sep(F.col("ra1"), F.col("dec1"), F.col("ra2"), F.col("dec2"))
    pairs = (
        a.join(b, "zone")
        .where(F.col("id1") != F.col("id2"))
        .where(sep < _DENS_EPS)
        .select("id1", F.round(sep, 6).alias("sep_deg"), "id2")
    )
    w = Window.partitionBy("id1").orderBy("sep_deg", "id2")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == _DENS_K)
        .select("id1", F.col("sep_deg").alias(f"d{_DENS_K}_deg"))
    )


#: Convex polygon vertices (deg), counter-clockwise, centered near the
#: (180, 0) tangent point like the ellipse search.
_POLY = ((150.0, -20.0), (210.0, -25.0), (225.0, 5.0), (185.0, 30.0), (155.0, 15.0))


def astro_poly_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex spherical-polygon membership (scisql_s2PtInCPoly,
    small-angle tangent-plane form): a point is inside iff every edge's
    2-D cross product has the same sign (CCW winding).  Pure per-row
    arithmetic fused into the scan — at 100 TB the polygon's bounding
    dec range prunes the zone layout and this test is the residual.
    The sign tests are exact comparisons of identical double
    expressions (no quantization needed — a point ON an edge is
    measure-zero)."""
    sky = _sky(spark, sf_dir)
    conds = None
    for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1]):
        cross = (F.lit(x2 - x1) * (F.col("dec") - F.lit(y1))) - (
            F.lit(y2 - y1) * (F.col("ra") - F.lit(x1))
        )
        c = cross >= 0
        conds = c if conds is None else (conds & c)
    return sky.where(conds).select("vec_id", "ra", "dec")


def _poly_oracle() -> str:
    edges = " AND ".join(
        f"(({x2 - x1}) * (dec - ({y1})) - ({y2 - y1}) * (ra - ({x1}))) >= 0"
        for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1])
    )
    return inline_views(
        f"WITH {_SKY_CTE} SELECT vec_id, ra, dec FROM sky WHERE {edges}"
    )


_WCS_SCALE = 3600.0 / 0.2  # pixels per degree (0.2"/px, LSST-like)


def _wcs_tan_sql(e1: str, e2: str) -> str:
    """Gnomonic (TAN) projection to pixel coordinates — the WCS
    transform every image-pipeline step applies between sky and CCD
    frames (FITS WCS Paper II, CTYPE TAN):

        d = sinδ₀ sinδ + cosδ₀ cosδ cos Δα
        ξ = cosδ sin Δα / d,  η = (cosδ₀ sinδ − sinδ₀ cosδ cos Δα) / d

    with (α₀, δ₀) the tangent point and pixel = ξ·scale.  Sources on
    the far hemisphere (d ≤ 0.1) are rejected like a real projector.
    Per-row trig, floor-quantized at 1e-3 px (≪ the 1-ulp trig
    drift's lever arm), fused into the scan."""
    d = (
        f"(SIN(RADIANS({_DEC0})) * SIN(RADIANS(dec))"
        f" + COS(RADIANS({_DEC0})) * COS(RADIANS(dec)) * COS(RADIANS(ra - {_RA0})))"
    )
    xi = f"(COS(RADIANS(dec)) * SIN(RADIANS(ra - {_RA0})) / {d})"
    eta = (
        f"((COS(RADIANS({_DEC0})) * SIN(RADIANS(dec))"
        f" - SIN(RADIANS({_DEC0})) * COS(RADIANS(dec)) * COS(RADIANS(ra - {_RA0})))"
        f" / {d})"
    )
    q = "CAST(FLOOR({expr} * 1000.0) AS BIGINT) AS DOUBLE) / 1000.0"
    return (
        f"WITH sky AS (SELECT vec_id, ({e1} + 0.5) * 360.0 AS ra,"
        f" {e2} * 180.0 AS dec FROM v_emb)"
        " SELECT vec_id, ra, dec,"
        f" CAST({q.format(expr=f'DEGREES({xi}) * {_WCS_SCALE}')} AS px_x,"
        f" CAST({q.format(expr=f'DEGREES({eta}) * {_WCS_SCALE}')} AS px_y"
        f" FROM sky WHERE {d} > 0.1"
    )


def astro_wcs_tan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAN-project every near-side source to pixel coordinates."""
    catalog.load_tables(spark, sf_dir)
    return spark.sql(_wcs_tan_sql("element_at(emb, 1)", "element_at(emb, 2)"))




def _depth_map_sql(e1: str, e2: str) -> str:
    """Survey-depth QA map: per-HEALPix-pixel source counts plus the
    coadd depth GAIN (Δmag = 1.25·log₁₀ n — stacking n exposures
    pushes the 5σ limit deeper by that much).  Composition of the
    ring-scheme pixelization with a quantized log — the coverage/depth
    product LSST-era pipelines publish per data release."""
    base = _healpix_sql(e1, e2)
    return (
        f"WITH hp AS ({base})"
        " SELECT pix, n_src,"
        "  CAST(CAST(FLOOR(1.25 * ln(CAST(n_src AS DOUBLE)) / ln(10.0)"
        "    * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0 AS depth_gain_mag"
        " FROM hp"
    )


def astro_depth_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel visit counts + coadd depth gain (mag)."""
    catalog.load_tables(spark, sf_dir)
    return spark.sql(_depth_map_sql("element_at(emb, 1)", "element_at(emb, 2)"))


def astro_galactic_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Galactic (l, b) for every source (J2000 rotation)."""
    catalog.load_tables(spark, sf_dir)
    return spark.sql(
        _galactic_sql("element_at(emb, 1)", "element_at(emb, 2)")
    )


QUERIES = {
    "astro_conesearch_sph": astro_conesearch_sph,
    "astro_crossmatch_sph": astro_crossmatch_sph,
    "lightcurve_outlier_mad": lightcurve_outlier_mad,
    "lightcurve_stetson_j": lightcurve_stetson_j,
    "astro_mag_from_flux": astro_mag_from_flux,
    "astro_box_search": astro_box_search,
    "astro_ellipse_search": astro_ellipse_search,
    "astro_epoch_propagation": astro_epoch_propagation,
    "astro_healpix_ring": astro_healpix_ring,
    "astro_galactic_coords": astro_galactic_coords,
    "astro_xmatch_best": astro_xmatch_best,
    "astro_density_knn": astro_density_knn,
    "astro_poly_search": astro_poly_search,
    "astro_wcs_tan_project": astro_wcs_tan_project,
    "astro_depth_map": astro_depth_map,
}

_SKY_CTE = (
    "sky AS (SELECT vec_id, (emb[1] + 0.5) * 360.0 AS ra, "
    "emb[2] * 180.0 AS dec FROM v_emb)"
)


def _duck_sep(ra1: str, dec1: str, ra2: str, dec2: str) -> str:
    return (
        f"DEGREES(2 * ASIN(SQRT(POWER(SIN(RADIANS({dec1} - ({dec2})) / 2), 2) + "
        f"COS(RADIANS({dec1})) * COS(RADIANS({dec2})) * "
        f"POWER(SIN(RADIANS({ra1} - ({ra2})) / 2), 2))))"
    )


ORACLES = {
    "astro_conesearch_sph": inline_views(
        f"WITH {_SKY_CTE} "
        f"SELECT vec_id, ra, dec, ROUND({_duck_sep('ra', 'dec', '180.0', '0.0')}, 6) AS sep_deg "
        f"FROM sky WHERE {_duck_sep('ra', 'dec', '180.0', '0.0')} < 10.0"
    ),
    "astro_crossmatch_sph": inline_views(
        f"WITH {_SKY_CTE} "
        f"SELECT a.vec_id AS id1, b.vec_id AS id2, "
        f"ROUND({_duck_sep('a.ra', 'a.dec', 'b.ra', 'b.dec')}, 6) AS sep_deg "
        f"FROM sky a JOIN sky b ON a.vec_id < b.vec_id "
        f"WHERE {_duck_sep('a.ra', 'a.dec', 'b.ra', 'b.dec')} < 2.0"
    ),
    "lightcurve_outlier_mad": inline_views(
        "WITH p AS (SELECT * FROM v_events WHERE event_type = 'purchase'), "
        "med AS (SELECT user_id AS mu, quantile_cont(value, 0.5) AS med FROM p GROUP BY user_id), "
        "dev AS (SELECT p.*, med.med, ABS(p.value - med.med) AS abs_dev "
        "FROM p JOIN med ON p.user_id = mu), "
        "mad AS (SELECT user_id AS uid, quantile_cont(abs_dev, 0.5) AS mad FROM dev GROUP BY user_id) "
        "SELECT event_id, user_id, value, ROUND(med, 6) AS med, ROUND(abs_dev, 6) AS abs_dev "
        "FROM dev JOIN mad ON user_id = uid WHERE abs_dev > 3 * mad"
    ),
    "lightcurve_stetson_j": inline_views(_STETSON_ORACLE),
    "astro_mag_from_flux": inline_views(
        "SELECT event_id, user_id, "
        "ROUND(-2.5 * LOG10(value), 6) + 0.0 AS mag, "
        "ROUND(-2.5 * LOG10(value) - (-2.5 * LOG10(100.0)), 6) + 0.0 AS dmag_ref "
        "FROM v_events WHERE event_type = 'purchase' AND value > 0"
    ),
    "astro_box_search": inline_views(
        f"WITH {_SKY_CTE} "
        f"SELECT vec_id, ra, dec, ROUND((ra - {_BOX_RA_MIN} + 360.0) % 360.0, 6) AS ra_offset "
        f"FROM sky WHERE (ra - {_BOX_RA_MIN} + 360.0) % 360.0 <= {_BOX_RA_WIDTH} "
        f"AND dec BETWEEN {_BOX_DEC_MIN} AND {_BOX_DEC_MAX}"
    ),
    "astro_ellipse_search": inline_views(
        f"WITH {_SKY_CTE}, m AS (SELECT vec_id, ra, dec, "
        f"POWER(((ra - {_RA0}) * COS(RADIANS({_DEC0})) * COS(RADIANS({_ELL_PA})) "
        f"+ (dec - {_DEC0}) * SIN(RADIANS({_ELL_PA}))) / {_ELL_A}, 2) "
        f"+ POWER((-(ra - {_RA0}) * COS(RADIANS({_DEC0})) * SIN(RADIANS({_ELL_PA})) "
        f"+ (dec - {_DEC0}) * COS(RADIANS({_ELL_PA}))) / {_ELL_B}, 2) AS m FROM sky) "
        "SELECT vec_id, ra, dec, ROUND(m, 6) AS ell_dist2 FROM m WHERE m <= 1.0"
    ),
    "astro_epoch_propagation": inline_views(
        "WITH sky AS (SELECT vec_id, (emb[1] + 0.5) * 360.0 AS ra, "
        "emb[2] * 180.0 AS dec, "
        f"emb[3] * {_PM_SCALE} AS pm_ra, emb[4] * {_PM_SCALE} AS pm_dec FROM v_emb) "
        "SELECT vec_id, ROUND(pm_ra, 6) AS pm_ra, ROUND(pm_dec, 6) AS pm_dec, "
        f"ROUND(ra + pm_ra * ({_PM_DT_YR} / 3600000.0) / COS(RADIANS(dec)), 6) AS ra_new, "
        f"ROUND(dec + pm_dec * ({_PM_DT_YR} / 3600000.0), 6) AS dec_new "
        "FROM sky"
    ),
    "astro_healpix_ring": inline_views(_healpix_sql("emb[1]", "emb[2]")),
    "astro_galactic_coords": inline_views(_galactic_sql("emb[1]", "emb[2]")),
    "astro_poly_search": _poly_oracle(),
    "astro_depth_map": inline_views(_depth_map_sql("emb[1]", "emb[2]")),
    "astro_wcs_tan_project": inline_views(_wcs_tan_sql("emb[1]", "emb[2]")),
    "astro_density_knn": inline_views(
        f"WITH {_SKY_CTE}, pairs AS ("
        "SELECT a.vec_id AS id1, "
        f"ROUND({_duck_sep('a.ra', 'a.dec', 'b.ra', 'b.dec')}, 6) AS sep_deg, "
        "b.vec_id AS id2 "
        "FROM sky a JOIN sky b ON a.vec_id <> b.vec_id "
        f"WHERE {_duck_sep('a.ra', 'a.dec', 'b.ra', 'b.dec')} < {_DENS_EPS}) "
        f"SELECT id1, sep_deg AS d{_DENS_K}_deg FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY id1 ORDER BY sep_deg, id2) AS rn "
        f"FROM pairs) t WHERE rn = {_DENS_K}"
    ),
    "astro_xmatch_best": inline_views(
        f"WITH {_SKY_CTE}, pairs AS ("
        "SELECT a.vec_id AS id1, b.vec_id AS id2, "
        f"ROUND({_duck_sep('a.ra', 'a.dec', 'b.ra', 'b.dec')}, 6) AS sep_deg "
        "FROM sky a JOIN sky b ON a.vec_id <> b.vec_id "
        f"WHERE {_duck_sep('a.ra', 'a.dec', 'b.ra', 'b.dec')} < 2.0) "
        "SELECT id1, id2 AS best_id, sep_deg FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY id1 ORDER BY sep_deg, id2) AS rn "
        "FROM pairs) t WHERE rn = 1"
    ),
}
