"""Ingestion sources/sinks (the reference's ETL surface, Spark-first)."""

from .ingest import (
    export_csv,
    load_csv,
    apply_column_mapping,
    calibrate_flux,
    write_partitioned,
    upsert_dimension,
)

__all__ = [
    "export_csv",
    "load_csv",
    "apply_column_mapping",
    "calibrate_flux",
    "write_partitioned",
    "upsert_dimension",
]
