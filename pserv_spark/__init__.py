"""pserv_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of DarkEnergyScienceCollaboration/Pserv.

Pserv is an LSST-DESC "practice server": ETL (FITS -> CSV -> MySQL bulk
load) plus a thin DB-connection layer fronting the Qserv-style catalog
query workload (see SURVEY.md §0-§2; the reference mount was empty, so
all parity claims cite the public repo paths recorded in SURVEY.md).

This package re-expresses that surface Spark-first:

- ``catalog``    — table registry + canonical normalizing views
                   (MySQL DDL analog: SURVEY §1.2)
- ``queries``    — the validated 73-query operator corpus as DataFrame
                   programs (SURVEY §2.2 / Appendix A)
- ``operators``  — scale-path operators: zoned spatial crossmatch
                   (Qserv chunking analog), dedup (MinHash/SimHash/LSH),
                   ANN similarity search, text analysis
- ``sources``    — ingestion (CSV with null sentinels, column mapping,
                   flux calibration — Pserv's create_csv_file_from_fits
                   / load_csv analogs)
- ``streaming``  — Structured Streaming ops (tumbling/session windows,
                   stateful dedup)
"""

__version__ = "0.1.0"
