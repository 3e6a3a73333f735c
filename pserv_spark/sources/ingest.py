r"""Bulk ingestion: CSV with null sentinels, column maps, calibration.

The reference's ETL pipeline (public repo python/desc/pserv/Pserv.py,
SURVEY §2.1/§3.1) is FITS binary table → column-mapped CSV with ``\N``
null sentinels → ``LOAD DATA LOCAL INFILE``.  The Spark-first
re-expression keeps the same observable semantics:

- ``export_csv``  ≈ ``create_csv_file_from_fits``: write a DataFrame to
  CSV with ``\N`` for NULL (MySQL's sentinel), optional column mapping
  (rename + selection) applied first.
- ``load_csv``    ≈ ``load_csv``/``LOAD DATA``: read CSV with a
  *declared* schema (never inferred — the reference declares DDL,
  SURVEY §1.1), ``\N`` → NULL, NaN round-trip.
- ``apply_column_mapping`` — the FITS→table column-map step
  (ordered rename/selection dict).
- ``calibrate_flux`` — the forced-source counts→flux calibration
  (``flux = counts * 10^(-0.4 * zeroPoint)``) the reference applies
  during ingest (SURVEY §2.1, forced-source ingest row).
- ``write_partitioned`` — partitioned-Parquet sink (the zone/chunk
  layout of SURVEY §4.3 at rest).

At 100 TB: ingestion is a distributed scan→map→write with no shuffle
unless ``partition_by`` demands one; declared schemas keep the read
vectorized (no sampling pass) and make bad rows fail loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_SENTINEL = r"\N"

#: CSV options shared by export and load so round-trips are lossless.
#: Both timestamp flavors get an explicit format: the test parquet
#: carries TIMESTAMP_NTZ (naive), which has its own option key.
_CSV_OPTIONS = {
    "nullValue": NULL_SENTINEL,
    "nanValue": "NaN",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    "header": "true",
}


def apply_column_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Select + rename columns: ``{target_name: source_name}`` (ordered),
    mirroring the reference's FITS→CSV column_mapping dict."""
    return df.select(
        *[F.col(src).alias(dst) for dst, src in mapping.items()]
    )


def export_csv(
    df: DataFrame,
    path: str,
    mapping: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame as CSV with ``\\N`` null sentinels."""
    out = apply_column_mapping(df, mapping) if mapping else df
    writer = out.write.mode("overwrite")
    for key, value in _CSV_OPTIONS.items():
        writer = writer.option(key, value)
    writer.csv(path)


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Read CSV with a declared schema and ``\\N`` → NULL.

    ``schema`` describes the file as written; ``mapping`` then renames/
    selects into the target table shape.  Schema is never inferred.
    """
    reader = spark.read.schema(schema)
    for key, value in _CSV_OPTIONS.items():
        reader = reader.option(key, value)
    df = reader.csv(path)
    return apply_column_mapping(df, mapping) if mapping else df


def calibrate_flux(
    df: DataFrame,
    counts_col: str = "counts",
    zeropoint_col: str = "zero_point",
    out_col: str = "flux",
) -> DataFrame:
    """Photometric calibration: ``flux = counts * 10^(-0.4 * zp)``."""
    return df.withColumn(
        out_col,
        F.col(counts_col) * F.pow(F.lit(10.0), F.lit(-0.4) * F.col(zeropoint_col)),
    )


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Partitioned-Parquet sink (zone/chunk layout at rest)."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def upsert_dimension(
    dim: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Merge update rows into a dimension (``ingest_registry`` /
    ``ingest_calexp_info`` analog: fill per-visit zero points / seeing
    into the visit dimension, SURVEY §2.1).

    Matching keys take the update's values column-wise
    (``coalesce(update, dim)``); unmatched update keys append.  This is
    the declarative MERGE shape — at scale the dim is broadcastable or
    the join shuffles on the key, and the result is written back as a
    new dimension snapshot (immutable storage, no in-place mutation).
    """
    if dim.columns != updates.columns:
        raise ValueError(
            f"schema mismatch: dim={dim.columns} updates={updates.columns}"
        )
    value_cols = [c for c in dim.columns if c not in key_cols]
    d, u = dim.alias("d"), updates.alias("u")
    cond = [F.col(f"d.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols]
    joined = d.join(u, cond, "full_outer")
    return joined.select(
        *[
            F.coalesce(F.col(f"d.{k}"), F.col(f"u.{k}")).alias(k)
            for k in key_cols
        ],
        *[
            F.when(F.col(f"u.{key_cols[0]}").isNotNull(), F.col(f"u.{c}"))
            .otherwise(F.col(f"d.{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
