"""Table registry + canonical views — the engine's "DDL layer".

The reference declares fixed MySQL schemas in DDL files (public repo:
sql/create_*.sql — SURVEY §1.1) and never infers types.  Here the same
discipline: every table has a declared StructType; ``load_tables``
validates the Parquet footer against it (Parquet schemas are stored, not
inferred, so validation — not coercion — is the right move) and
registers temp views, including the two canonical normalizing views
(SURVEY §1.2):

- ``v_events`` — events.parquet stores TIMESTAMP(MICROS) with no
  timezone, which Spark reads as TIMESTAMP_NTZ.  The view casts to the
  session-zone TIMESTAMP (session TZ is pinned to UTC, so wall-clock ==
  instant) and adds ``ts_us`` (epoch µs, ``unix_micros``) for numeric
  window frames.  DuckDB reads the same column as a naive TIMESTAMP and
  ``epoch_us(ts)`` gives the identical longs — exact oracle parity.
- ``v_emb`` — float32 embeddings cast to array<double> before any
  arithmetic (float32 accumulation noise would break oracle parity,
  SURVEY §4.5 rule 5).

At 100 TB these views are zero-cost: they are logical projections that
Catalyst collapses into the scan (column pruning + pushdown still
apply to the underlying parquet columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .session import REQUIRED_SQL_CONFS, TUNING_SQL_CONFS

#: The ten driver tables (TESTDATA.md), as read by Spark 4.x.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            # parquet carries timestamp[ms] with no timezone → NTZ
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),  # timestamp[us], no tz
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(SCHEMAS)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_V_EVENTS_SQL = """
CREATE OR REPLACE TEMP VIEW v_events AS
SELECT event_id,
       CAST(ts AS TIMESTAMP)              AS ts,
       unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us,
       user_id, event_type, value, props
FROM events
WHERE ts IS NOT NULL
"""

_V_EMB_SQL = """
CREATE OR REPLACE TEMP VIEW v_emb AS
SELECT vec_id,
       transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
       label
FROM embeddings
WHERE embedding IS NOT NULL
"""


def _schemas_compatible(actual: T.StructType, expected: T.StructType) -> bool:
    if [f.name for f in actual.fields] != [f.name for f in expected.fields]:
        return False
    return all(a.dataType == e.dataType for a, e in zip(actual.fields, expected.fields))


#: Per-session memo of the last-registered sf_dir: re-running every
#: query through ``load_tables`` is the driver contract, but paying 10
#: parquet-footer reads + view registrations per query call makes
#: sub-second queries look 2× slower.  Keyed by the session's id so a
#: new session (or a different sf_dir) re-registers.
_REGISTERED: dict[int, tuple[str, dict[str, DataFrame]]] = {}


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, *, validate: bool = False
) -> dict[str, DataFrame]:
    """Register all base tables + canonical views for ``sf_dir``.

    Idempotent and cheap (view registration only; no data is read until
    a query runs); repeat calls for the same session + sf_dir are
    no-ops.  Returns the base DataFrames keyed by table name.
    """
    cached = _REGISTERED.get(id(spark))
    if cached is not None and cached[0] == sf_dir and not validate:
        return cached[1]

    # The driver supplies a bare session (no confs): apply the
    # correctness confs AND the tuning confs here — 200 static shuffle
    # partitions on a local[8] harness roughly doubles sub-second query
    # latency, and stateful-streaming state stores inherit the static
    # value (AQE never coalesces those).
    for key, value in {**REQUIRED_SQL_CONFS, **TUNING_SQL_CONFS}.items():
        spark.conf.set(key, value)

    frames: dict[str, DataFrame] = {}
    for name, schema in SCHEMAS.items():
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if validate and not _schemas_compatible(df.schema, schema):
            raise ValueError(
                f"schema drift in {name}: expected {schema.simpleString()}, "
                f"got {df.schema.simpleString()}"
            )
        df.createOrReplaceTempView(name)
        frames[name] = df

    spark.sql(_V_EVENTS_SQL)
    spark.sql(_V_EMB_SQL)
    _REGISTERED[id(spark)] = (sf_dir, frames)
    return frames


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one base table (no view registration)."""
    for key, value in {**REQUIRED_SQL_CONFS, **TUNING_SQL_CONFS}.items():
        spark.conf.set(key, value)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


#: On-disk size under which a dimension table is broadcast-hinted.
#: Compressed parquet expands ~3-5× in memory, so 32 MB on disk is a
#: ~100-150 MB broadcast — comfortable for any realistically-sized
#: executor, far beyond Catalyst's conservative 10 MB static default.
BROADCAST_DISK_BYTES = 32 << 20


def table_disk_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of ``<sf_dir>/<name>.parquet`` — directory-aware
    (round 10, VERDICT r9 #4).

    The local tiers store each table as a single parquet FILE, but a
    parquet table at scale is a DIRECTORY of part files —
    ``os.path.getsize`` on a directory returns the dirent size (~4 KB),
    which would make a size-aware broadcast hint broadcast *anything*.
    Sum the data files when the path is a directory (skipping
    ``_SUCCESS``/``_metadata``-style markers and hidden files).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.isdir(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if fname.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(root, fname))
    return total


def size_aware_broadcast(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Broadcast-hint ``df`` iff the backing table is small on disk
    (ADVICE r9 #3: the shared form of the ``dim`` pattern, reused by
    operators that project/filter a base table before a join).

    The probe sizes the FULL table even when ``df`` is a projection of
    it, so the hint is conservative: it stops broadcasting earlier than
    strictly necessary just above the cutoff (projection slack), and it
    never broadcasts a frame whose source scales with the fact data.
    """
    from pyspark.sql import functions as F

    size = table_disk_bytes(sf_dir, name)
    return F.broadcast(df) if size <= BROADCAST_DISK_BYTES else df


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A join dimension with a *size-aware* broadcast hint.

    Static planning can't know a dimension is small (statistics-free
    parquet scans estimate conservatively) and AQE only discovers it
    after the first shuffle is already planned; the catalog, however,
    knows the file size up front.  Tables under BROADCAST_DISK_BYTES
    get an explicit broadcast hint; larger ones are returned unhinted
    so Catalyst/AQE plan a shuffle join.  The same query code
    therefore broadcasts `orders` at sf0.1 (2.7 MB) and correctly
    refuses to at 100 TB, where `orders` scales with the fact table.
    """
    frame = load_tables(spark, sf_dir)[name]
    return size_aware_broadcast(frame, sf_dir, name)


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to ``defaultParallelism`` IFF its
    scan has fewer splits than the cluster has cores (round 10, guide
    §2/§6 — derive parallelism from the input, never a constant).

    Found by the sf1 8-vs-32-core scaling measurement (SCALING.json):
    a single-row-group parquet file is ONE split no matter what, so
    every expression the optimizer collapses into the scan stage — the
    dedup family's char-shingling, token n-grams, signature partials —
    ran in ONE task regardless of cores (measured: 19.3 s serial vs
    1.3 s spread for sf1 shingling; core-count-insensitive, the serial
    term behind the flat 8c/32c ratios).  The repartition must be
    applied to the RAW rows BEFORE composing the expensive projection:
    Spark evaluates a projection below a later repartition inside the
    scan stage (measured: repartitioning after the projection keeps
    the 19→21 s serial shape).

    At scale the guard makes this a no-op: a table with at least as
    many splits as cores is returned untouched, so no corpus-sized
    shuffle is ever added.  Row-preserving (results unchanged);
    keyless repartition is retry-safe (sortBeforeRepartition default).
    """
    nparts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < nparts:
        return df.repartition(nparts)
    return df


def v_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with canonical µs timestamp + ts_us long (SURVEY §1.2)."""
    from pyspark.sql import functions as F

    # NULL timestamps are excluded at this boundary (mirrored in the
    # SQL view and the oracle CTE): an event without a time cannot
    # participate in any window, session, watermark, or as-of join —
    # and its sort placement under ORDER BY ts differs per engine.
    # Same canonical-view contract as v_emb's NULL-vector exclusion.
    raw = table(spark, sf_dir, "events")
    return raw.where(F.col("ts").isNotNull()).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def v_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with array<double> ``emb`` (SURVEY §4.5 rule 5).

    NULL vectors are excluded at this boundary (mirrored in the SQL
    view and the oracle CTE): a missing embedding is a malformed input
    for every vector operator — distances would be NULL in Spark and a
    hard error in DuckDB's ``list_inner_product`` — so the canonical
    view serves only well-formed vectors."""
    from pyspark.sql import functions as F

    raw = table(spark, sf_dir, "embeddings")
    return raw.where(F.col("embedding").isNotNull()).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        "label",
    )
