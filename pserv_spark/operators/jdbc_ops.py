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

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..fixtures import fixture_key, publish_dir, staging_path

_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
_N_VISITS = 500
_log_routed = False


def _route_derby_log(spark: SparkSession) -> None:
    """Point Derby's engine log at the tempdir BEFORE the engine boots
    (round-2 nit: it defaulted to ``derby.log`` in the CWD, i.e. the
    repo root).  A no-op once the engine is up — every Derby entry
    point goes through ``_derby_url`` first, so the property is set
    ahead of the first connection of the JVM's lifetime."""
    global _log_routed
    if not _log_routed:
        spark._sc._jvm.java.lang.System.setProperty(  # noqa: SLF001
            "derby.stream.error.file",
            os.path.join(tempfile.gettempdir(), "pserv_derby.log"),
        )
        _log_routed = True


def _derby_url(
    spark: SparkSession, sf_dir: str, tag: str = ""
) -> tuple[str, dict[str, str], str]:
    _route_derby_log(spark)
    db = os.path.join(
        tempfile.gettempdir(), f"pserv_derby{tag}_{fixture_key(sf_dir)}"
    )
    return f"jdbc:derby:{db};create=true", {"driver": _DRIVER}, db


def _derby_shutdown(spark: SparkSession, db: str) -> None:
    """Cleanly shut down one embedded database so its files are fully
    checkpointed and closed before the staging dir is renamed.  Derby
    *signals* a successful single-db shutdown with SQLException 08006,
    so the raised error is the success path."""
    try:
        spark._sc._jvm.java.sql.DriverManager.getConnection(  # noqa: SLF001
            f"jdbc:derby:{db};shutdown=true"
        )
    except Exception:  # noqa: BLE001 — 08006 == clean shutdown
        pass


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
    url, props, db = _derby_url(spark, sf_dir)
    if not os.path.isdir(db):
        # Staged build + clean shutdown + atomic publish (ADVICE r2):
        # a crashed run can no longer leave a half-built database that
        # every later run trusts.  The shutdown checkpoint makes the
        # renamed files a consistent, bootable database; a concurrent
        # peer publishing first wins and ours is discarded (the
        # artifact is deterministic, so the copies are equivalent).
        staging = staging_path(db)
        shutil.rmtree(staging, ignore_errors=True)
        _registry_frame(spark).write.mode("overwrite").jdbc(
            f"jdbc:derby:{staging};create=true", "registry", properties=props
        )
        _derby_shutdown(spark, staging)
        publish_dir(staging, db)
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
