r"""FIXTURES.md Part 2b: the reference's CSV loading contract end to end.

raw_sources.csv (\N nulls, NaN counts, source column names) → declared-
schema load + column mapping + flux calibration; golden assertions:
row count preserved, NaN handling exact, and the checksum query equal
to DuckDB reading the same CSV with nullstr='\N'."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pserv_spark.sources import calibrate_flux, load_csv

from astro_fixtures import make_raw_sources_csv

RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("coord_ra", T.DoubleType()),
        T.StructField("coord_decl", T.DoubleType()),
        T.StructField("base_PsfFlux_instFlux", T.DoubleType()),
        T.StructField("base_PsfFlux_instFluxErr", T.DoubleType()),
        T.StructField("visit", T.LongType()),
        T.StructField("zero_point", T.DoubleType()),
    ]
)

MAPPING = {
    "object_id": "id",
    "ra": "coord_ra",
    "decl": "coord_decl",
    "ps_flux": "base_PsfFlux_instFlux",
    "ps_flux_sigma": "base_PsfFlux_instFluxErr",
    "visit": "visit",
    "zero_point": "zero_point",
}


@pytest.fixture(scope="module")
def raw_csv(tmp_path_factory):
    d = tmp_path_factory.mktemp("rawcsv")
    path = str(d / "raw_sources.csv")
    make_raw_sources_csv(path)
    return path


@pytest.fixture(scope="module")
def ingested(spark, raw_csv):
    df = load_csv(spark, raw_csv, RAW_SCHEMA, mapping=MAPPING)
    return calibrate_flux(
        # NaN counts are masked measurements → SQL NULL after ingest
        # (the reference's NaN→\N semantics, SURVEY §1.1).
        df.withColumn(
            "ps_flux", F.when(F.isnan("ps_flux"), None).otherwise(F.col("ps_flux"))
        ),
        counts_col="ps_flux",
        zeropoint_col="zero_point",
        out_col="ps_flux_cal",
    )


def test_row_count_and_mapping(ingested):
    assert ingested.count() == 1000
    assert ingested.columns == [
        "object_id", "ra", "decl", "ps_flux", "ps_flux_sigma", "visit",
        "zero_point", "ps_flux_cal",
    ]


def test_nan_to_null_counts(spark, raw_csv, ingested):
    with open(raw_csv) as fh:
        text = fh.read()
    n_nan = text.count(",NaN,")
    n_sentinel = text.count(r"\N")
    assert n_nan > 0 and n_sentinel > 0  # fixture exercises both paths
    assert ingested.where(F.col("ps_flux").isNull()).count() == n_nan
    assert ingested.where(F.col("ps_flux_sigma").isNull()).count() == n_sentinel
    # Calibration propagates NULL, never fabricates values.
    assert ingested.where(
        F.col("ps_flux").isNull() & F.col("ps_flux_cal").isNotNull()
    ).count() == 0


def test_checksum_matches_duckdb(spark, raw_csv, ingested):
    """The FIXTURES golden checksum: DECIMAL-exact sum of the rounded
    calibrated flux + counts, vs DuckDB reading the same CSV."""
    got = ingested.agg(
        F.sum(F.round("ps_flux_cal", 6).cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("checksum"),
        F.count("*").cast("long").alias("n"),
        F.count("ps_flux_cal").cast("long").alias("n_flux"),
    ).collect()[0]

    import duckdb

    want = duckdb.connect().execute(
        "SELECT CAST(SUM(CAST(ROUND(ps_flux_cal, 6) AS DECIMAL(18,6))) AS DECIMAL(18,6)), "
        "CAST(COUNT(*) AS BIGINT), CAST(COUNT(ps_flux_cal) AS BIGINT) FROM ("
        "SELECT CASE WHEN isnan(base_PsfFlux_instFlux) THEN NULL "
        "ELSE base_PsfFlux_instFlux END * POWER(10.0, -0.4 * zero_point) AS ps_flux_cal "
        f"FROM read_csv('{raw_csv}', header=true, nullstr='\\N'))"
    ).fetchone()
    assert (got.checksum, got.n, got.n_flux) == want


def test_roundtrip_floats_exact(spark, raw_csv):
    """Raw double columns survive CSV parsing bit-exactly vs DuckDB."""
    df = load_csv(spark, raw_csv, RAW_SCHEMA).select("id", "coord_ra")
    spark_vals = {r.id: r.coord_ra for r in df.collect()}

    import duckdb

    duck_vals = dict(
        duckdb.connect().execute(
            f"SELECT id, coord_ra FROM read_csv('{raw_csv}', header=true, nullstr='\\N')"
        ).fetchall()
    )
    assert spark_vals == duck_vals
    assert not any(math.isnan(v) for v in spark_vals.values())
