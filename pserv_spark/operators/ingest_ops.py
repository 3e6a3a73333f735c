r"""Driver-checkable ingestion round-trip (the Pserv ETL path, end to end).

``ingest_csv_roundtrip`` drives the full reference pipeline shape —
table → column-mapped CSV with ``\N`` sentinels → declared-schema load
→ calibration transform — and returns the loaded rows, so the DuckDB
oracle (which reads the *original* parquet and applies the same
calibration formula) proves the CSV hop was lossless: nulls, NaNs,
floats and timestamps all round-trip exactly.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import catalog
from ..sources import export_csv, load_csv, calibrate_flux

#: The CSV file's declared schema (as exported below).
_CSV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("line", T.IntegerType()),
        T.StructField("counts", T.DoubleType()),
        T.StructField("zero_point", T.DoubleType()),
        T.StructField("shipped", T.TimestampNTZType()),
    ]
)


def ingest_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem sample → \\N-sentinel CSV → declared-schema load →
    flux calibration; NULLIF creates genuine NULLs to exercise the
    sentinel path."""
    src = (
        catalog.table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 100)
        .select(
            F.col("l_orderkey").alias("l_orderkey"),
            F.col("l_linenumber").alias("l_linenumber"),
            F.nullif(F.col("l_tax"), F.lit(0.0)).alias("tax_or_null"),
            F.col("l_discount").alias("l_discount"),
            F.col("l_shipdate").alias("l_shipdate"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="pserv_ingest_")
    try:
        csv_dir = os.path.join(tmp, "lineitem_csv")
        export_csv(
            src,
            csv_dir,
            mapping={
                "id": "l_orderkey",
                "line": "l_linenumber",
                "counts": "tax_or_null",
                "zero_point": "l_discount",
                "shipped": "l_shipdate",
            },
        )
        loaded = load_csv(spark, csv_dir, _CSV_SCHEMA)
        out = calibrate_flux(loaded).select(
            "id",
            "line",
            "counts",
            F.round("flux", 10).alias("flux"),
            "shipped",
        )
        # Materialize before deleting the temp CSV.
        result = spark.createDataFrame(out.collect(), out.schema)
        return result
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_ROUNDTRIP_ORACLE = (
    "SELECT l_orderkey AS id, l_linenumber AS line, "
    "NULLIF(l_tax, 0.0) AS counts, "
    "ROUND(NULLIF(l_tax, 0.0) * POWER(10.0, -0.4 * l_discount), 10) AS flux, "
    "l_shipdate AS shipped "
    "FROM lineitem WHERE l_orderkey < 100"
)


#: JSONL round-trip declared schema (as exported below).
_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("priority", T.StringType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("placed", T.TimestampNTZType()),
    ]
)


def ingest_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders sample → JSON-lines files → declared-schema load.

    The second reference-shaped ingest format (registry/metadata files
    are line-oriented records — public repo: python/desc/pserv/,
    ingest_registry, SURVEY §2.1); JSONL is its modern stand-in and the
    interchange format LLM-data pipelines actually ship.  NULLIF
    exercises JSON null round-trip; the declared StructType (never
    inferSchema) parses ISO timestamps back to NTZ losslessly."""
    src = (
        catalog.table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 300)
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderstatus").alias("status"),
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("priority"),
            F.col("o_totalprice").alias("total"),
            F.col("o_orderdate").alias("placed"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="pserv_jsonl_")
    try:
        json_dir = os.path.join(tmp, "orders_jsonl")
        src.coalesce(1).write.mode("overwrite").json(json_dir)
        loaded = spark.read.schema(_JSONL_SCHEMA).json(json_dir)
        return spark.createDataFrame(loaded.collect(), loaded.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_JSONL_ORACLE = (
    "SELECT o_orderkey AS id, o_orderstatus AS status, "
    "NULLIF(o_orderpriority, '1-URGENT') AS priority, "
    "o_totalprice AS total, o_orderdate AS placed "
    "FROM orders WHERE o_orderkey < 300"
)


QUERIES = {
    "ingest_csv_roundtrip": ingest_csv_roundtrip,
    "ingest_jsonl_roundtrip": ingest_jsonl_roundtrip,
}
ORACLES = {
    "ingest_csv_roundtrip": _ROUNDTRIP_ORACLE,
    "ingest_jsonl_roundtrip": _JSONL_ORACLE,
}
