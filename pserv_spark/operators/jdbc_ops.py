"""JDBC source/sink — the reference's actual database transport.

Pserv's whole serving layer is a thin Python shim over a JDBC-style
connection to MySQL (public repo: python/desc/pserv/Pserv.py,
DbConnection / LOAD DATA INFILE — SURVEY §2.1); SURVEY §2.2 carried
"JDBC source" as the one out-of-scope source row.  This closes it with
the JDBC engine that actually ships inside the Spark distribution:
embedded Apache Derby (derby*.jar in pyspark/jars — probed round 2; no
sqlite/mysql driver exists in the container, which is documented the
same way the `transformWithStateInPandas` gap is).

``source_jdbc_registry`` drives both directions end to end:

1. **sink** — the deterministic observation registry (same formulas as
   the sqlite fixture in ``ingest_registry_visits``) is written through
   ``DataFrameWriter.jdbc`` into a Derby table;
2. **source** — read back through ``spark.read.jdbc`` with an explicit
   ``partitionColumn/lowerBound/upperBound/numPartitions`` split, the
   scale-aware shape: each executor opens its own cursor over a key
   range, so a 10⁹-row registry table parallelizes instead of dragging
   through one connection (verified: 4 read partitions);
3. the registry broadcast-joins onto the visit dimension exactly like
   the reference's ``ingest_calexp_info`` enrichment.

Scale notes: registries are metadata-sized next to the fact tables, so
the broadcast join holds at 100 TB; the JDBC read parallelism is bounded
by the declared key range, not file count.  All registry values are
exact small-int quotients — IEEE-identical in Derby, Spark and DuckDB.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
_N_VISITS = 500


def _derby_url(sf_dir: str) -> tuple[str, dict[str, str], str]:
    db = os.path.join(
        tempfile.gettempdir(),
        f"pserv_derby_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    return f"jdbc:derby:{db};create=true", {"driver": _DRIVER}, db


def _registry_frame(spark: SparkSession) -> DataFrame:
    """The deterministic obs registry (same value formulas as the
    sqlite fixture — one source of truth for the oracle replay)."""
    return spark.range(_N_VISITS).select(
        F.col("id").alias("visit_id"),
        ((F.col("id") % 50) / 10.0 + 0.5).alias("seeing"),
        ((F.col("id") % 97) / 7.0).alias("sky_bg"),
        (25.0 + (F.col("id") % 13) / 100.0).alias("zero_point"),
    )


def source_jdbc_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    url, props, db = _derby_url(sf_dir)
    if not os.path.isdir(db):
        _registry_frame(spark).write.mode("overwrite").jdbc(
            url, "registry", properties=props
        )
    reg = spark.read.jdbc(
        url,
        "registry",
        column="visit_id",
        lowerBound=0,
        upperBound=_N_VISITS,
        numPartitions=4,
        properties=props,
    )
    visits = (
        catalog.table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < _N_VISITS)
        .select(
            F.col("o_orderkey").alias("visit_id"),
            F.date_trunc("day", "o_orderdate").cast("timestamp").alias("obs_ts"),
        )
    )
    return visits.join(F.broadcast(reg), "visit_id").select(
        "visit_id", "obs_ts", "seeing", "sky_bg", "zero_point"
    )


_JDBC_ORACLE = (
    "SELECT o_orderkey AS visit_id, "
    "CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS obs_ts, "
    "(o_orderkey % 50) / 10.0 + 0.5 AS seeing, "
    "(o_orderkey % 97) / 7.0 AS sky_bg, "
    "25.0 + (o_orderkey % 13) / 100.0 AS zero_point "
    f"FROM orders WHERE o_orderkey < {_N_VISITS}"
)

QUERIES = {"source_jdbc_registry": source_jdbc_registry}
ORACLES = {"source_jdbc_registry": _JDBC_ORACLE}
