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
from ._oracle import inline_views

def _fixture_dir(sf_dir: str, kind: str) -> str:
    """Persistent temp-fixture path keyed by sf_dir AND a content
    fingerprint of its parquet files (ADVICE r2: an in-place testdata
    regen must invalidate every derived fixture, not silently serve
    stale reads against a fresh oracle)."""
    from ..fixtures import fixture_path

    return fixture_path(sf_dir, kind)


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
    # Persistent sf-keyed fixture dir + lazy scan — no driver-side
    # collect of row data (VERDICT r1 "what's wrong" #2): the CSV stays
    # on disk, the returned plan reads it like any other source, and
    # executors — not the driver — move the rows.
    csv_dir = _fixture_dir(sf_dir, "ingest_csv")
    if not os.path.isdir(csv_dir):
        from ..fixtures import publish_dir, staging_path

        staging = staging_path(csv_dir)
        export_csv(
            src,
            staging,
            mapping={
                "id": "l_orderkey",
                "line": "l_linenumber",
                "counts": "tax_or_null",
                "zero_point": "l_discount",
                "shipped": "l_shipdate",
            },
        )
        publish_dir(staging, csv_dir)  # atomic + peer-tolerant
    loaded = load_csv(spark, csv_dir, _CSV_SCHEMA)
    return calibrate_flux(loaded).select(
        "id",
        "line",
        "counts",
        F.round("flux", 10).alias("flux"),
        "shipped",
    )


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
    # Persistent sf-keyed fixture + lazy scan (no driver-side collect —
    # VERDICT r1 #2), same pattern as ingest_csv_roundtrip.
    json_dir = _fixture_dir(sf_dir, "ingest_jsonl")
    if not os.path.isdir(json_dir):
        from ..fixtures import publish_dir, staging_path

        staging = staging_path(json_dir)
        src.coalesce(1).write.mode("overwrite").json(staging)
        publish_dir(staging, json_dir)
    return spark.read.schema(_JSONL_SCHEMA).json(json_dir)


_JSONL_ORACLE = (
    "SELECT o_orderkey AS id, o_orderstatus AS status, "
    "NULLIF(o_orderpriority, '1-URGENT') AS priority, "
    "o_totalprice AS total, o_orderdate AS placed "
    "FROM orders WHERE o_orderkey < 300"
)


def ingest_pk_dedup_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-PK enforcement on ingest + clustered storage layout —
    the Spark analog of the reference's MySQL primary-key bulk load
    (SURVEY §1.2: ForcedSource PK (objectId, ccdVisitId); a re-run
    ingest batch must not duplicate rows, and the table should land
    clustered by object for per-object light-curve scans).

    A 10% slice of the feed is deliberately re-ingested as batch 2;
    PK dedup keeps the highest batch per key (latest-load-wins, the
    MySQL REPLACE INTO semantic), then the surviving rows are written
    ``repartition(user_id).sortWithinPartitions(user_id, ts_us)`` so
    each parquet file holds contiguous per-object runs (row-group
    min/max stats then prune object-key point lookups).  The returned
    DataFrame re-reads the landed store, so the oracle — every event
    with batch = 2 exactly on the replayed keys — also proves the
    layout write was lossless.  tests/test_ingest.py asserts the
    physical sortedness per file.
    """
    ev = catalog.v_events(spark, sf_dir).select(
        "event_id", "user_id", "ts_us", "value"
    )
    b1 = ev.withColumn("batch", F.lit(1))
    b2 = (
        ev.where(F.col("event_id") % 10 == 0)
        .withColumn("batch", F.lit(2))
    )
    raw = b1.unionByName(b2)
    from pyspark.sql import Window

    w = Window.partitionBy("event_id").orderBy(F.col("batch").desc())
    deduped = (
        raw.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    from ..fixtures import publish_dir, staging_path

    out = _fixture_dir(sf_dir, "pk_layout")
    if not os.path.isdir(out):
        staging = staging_path(out)
        shutil.rmtree(staging, ignore_errors=True)
        (
            deduped.repartition(16, "user_id")
            .sortWithinPartitions("user_id", "ts_us")
            .write.mode("overwrite")
            .parquet(staging)
        )
        publish_dir(staging, out)
    return spark.read.parquet(out).select(
        "event_id", "user_id", "ts_us", "value", "batch"
    )


_PK_LAYOUT_ORACLE = (
    "SELECT event_id, user_id, ts_us, value, "
    "CASE WHEN event_id % 10 = 0 THEN 2 ELSE 1 END AS batch FROM v_events"
)


_FITS_REGISTERED: set[int] = set()


def _fitslike_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Register the datasource and materialize the deterministic
    FITS-like fixture (purchases with seeded NaNs) once per sf_dir."""
    from ..fixtures import fixture_path, publish_file, staging_path
    from ..session import configure
    from ..sources.fitslike import FitsLikeDataSource, write_fitslike

    # Apply the session confs even when the fixture already exists on
    # disk (r9 finding: a bare driver session whose FIRST op is this
    # one otherwise streams with the 200-partition default — every
    # micro-batch's aggregation paid 200 tasks for ~10 groups).
    configure(spark)

    if id(spark) not in _FITS_REGISTERED:
        spark.dataSource.register(FitsLikeDataSource)
        _FITS_REGISTERED.add(id(spark))

    path = fixture_path(sf_dir, "fitslike", ".dat")
    if not os.path.exists(path):
        src = (
            catalog.v_events(spark, sf_dir)
            .where(F.col("event_type") == "purchase")
            .select(
                "event_id",
                "user_id",
                "ts_us",
                F.when(F.col("event_id") % 101 == 0, float("nan"))
                .otherwise(F.col("value"))
                .alias("value"),
                "event_type",
            )
            .orderBy("event_id")
        )
        staging = staging_path(path)
        write_fitslike(
            staging,
            [
                ("event_id", "K"),
                ("user_id", "K"),
                ("ts_us", "K"),
                ("value", "D"),
                ("event_type", "8A"),
            ],
            [tuple(r) for r in src.collect()],
            sort_key="event_id",
        )
        publish_file(staging, path)
    return path


def source_fitslike_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom-connector ingest: events → FITS-style binary
    table fixture → ``spark.read.format("fitslike")`` → aggregation.

    This is the reference's actual ingest path (FITS binary table →
    typed columns, NaN→NULL — public repo python/desc/pserv/Pserv.py,
    ``create_csv_file_from_fits``) with the CSV hop deleted: the
    Spark 4 Python DataSource decodes the binary rows executor-side in
    row-block partitions.  NaNs are seeded into the fixture
    (event_id % 101 == 0) to prove the NULL path; the DuckDB oracle
    applies the same predicate to the original parquet, so a hash
    match certifies the binary encode→decode round-trip is lossless.
    """
    path = _fitslike_fixture(spark, sf_dir)
    loaded = (
        spark.read.format("fitslike")
        .option("path", path)
        .option("rowsPerBlock", 500)
        .load()
    )
    return loaded.groupBy((F.col("user_id") % 10).alias("cohort")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null"),
        F.sum(F.col("value").cast("decimal(14,2)"))
        .cast("double")
        .alias("sum_value"),
        F.max("ts_us").alias("max_ts_us"),
        F.max("event_type").alias("etype"),
    )


_FITSLIKE_ORACLE = (
    "SELECT user_id % 10 AS cohort, CAST(COUNT(*) AS BIGINT) AS n, "
    # a value is NULL after the round-trip if the fixture seeded a NaN
    # there OR the source itself carried NULL (both encode as FITS NaN)
    "CAST(SUM(CASE WHEN event_id % 101 = 0 OR value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
    "CAST(SUM(CASE WHEN event_id % 101 = 0 THEN NULL "
    "ELSE CAST(value AS DECIMAL(14,2)) END) AS DOUBLE) AS sum_value, "
    "CAST(MAX(ts_us) AS BIGINT) AS max_ts_us, MAX(event_type) AS etype "
    "FROM v_events WHERE event_type = 'purchase' GROUP BY 1"
)


def ingest_registry_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visit-dimension enrichment from a SQLite observation registry —
    the reference's ``ingest_registry`` + ``ingest_calexp_info`` pair
    (public repo python/desc/pserv/ utils: fill CcdVisit from the
    obs-registry sqlite file, then update per-visit zero
    points/seeing/sky from calexp metadata; SURVEY §2.1).

    A deterministic registry (seeing/sky/zero-point per visit id) is
    written to an actual ``.sqlite`` file and read back through
    stdlib ``sqlite3`` — registries are metadata-sized, so the
    driver-side hop is the right scale call (the reference does the
    same through MySQL).  The frame lands via ``createDataFrame`` with
    an explicit schema and broadcast-joins onto the visit dimension
    (orders sample): at 100 TB the dim join is still a broadcast —
    registries don't grow with the fact table.  All registry values
    are exact dyadic-free quotients of small ints, identical in IEEE
    on both sides.
    """
    import sqlite3

    from ..fixtures import fixture_path

    # fingerprint-keyed like the other fixtures, and regenerated only
    # when absent: a fixed unkeyed path deleted and rebuilt per call
    # can race against a concurrent run (ADVICE r1).
    reg_path = fixture_path(sf_dir, "registry", ".sqlite")
    if not os.path.exists(reg_path):
        tmp_path = f"{reg_path}.tmp.{os.getpid()}"
        con = sqlite3.connect(tmp_path)
        con.execute(
            "CREATE TABLE registry (visit_id INTEGER PRIMARY KEY,"
            " seeing REAL, sky_bg REAL, zero_point REAL)"
        )
        con.executemany(
            "INSERT INTO registry VALUES (?, ?, ?, ?)",
            [
                (k, (k % 50) / 10.0 + 0.5, (k % 97) / 7.0, 25.0 + (k % 13) / 100.0)
                for k in range(0, 500)
            ],
        )
        con.commit()
        con.close()
        os.replace(tmp_path, reg_path)  # atomic publish

    con = sqlite3.connect(reg_path)
    reg_rows = con.execute(
        "SELECT visit_id, seeing, sky_bg, zero_point FROM registry ORDER BY visit_id"
    ).fetchall()
    con.close()
    reg = spark.createDataFrame(
        reg_rows, "visit_id bigint, seeing double, sky_bg double, zero_point double"
    )
    visits = (
        catalog.table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 500)
        .select(
            F.col("o_orderkey").alias("visit_id"),
            F.date_trunc("day", "o_orderdate").cast("timestamp").alias("obs_date"),
        )
    )
    return visits.join(F.broadcast(reg), "visit_id").select(
        "visit_id", "obs_date", "seeing", "sky_bg", "zero_point"
    )


_REGISTRY_ORACLE = (
    "SELECT o_orderkey AS visit_id, CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS obs_date,"
    " CAST(o_orderkey % 50 AS DOUBLE) / 10.0 + 0.5 AS seeing,"
    " CAST(o_orderkey % 97 AS DOUBLE) / 7.0 AS sky_bg,"
    " 25.0 + CAST(o_orderkey % 13 AS DOUBLE) / 100.0 AS zero_point"
    " FROM orders WHERE o_orderkey < 500"
)


def ingest_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution across ingest batches — the lakehouse
    answer to the reference's fixed-DDL ALTER TABLE path (SURVEY §1.1:
    schemas are declared, but the LSST catalog schema itself gained
    columns between data releases).

    Batch 1 lands (id, qty); batch 2 lands (id, qty, discount) — a
    column added mid-stream.  The read side uses
    ``option("mergeSchema", "true")``, which resolves the union schema
    from parquet footers only (no data scan) and back-fills NULLs for
    the pre-evolution files.  At 100 TB the cost model matters:
    mergeSchema reads every footer at planning time, so steady-state
    pipelines pin the merged schema explicitly — this operator
    verifies the back-fill semantics that pinned schema relies on.
    """
    from ..fixtures import publish_dir, staging_path

    li = catalog.table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    b1 = li.where(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("id"), F.col("l_quantity").alias("qty")
    )
    b2 = li.where(F.col("l_linenumber") == 2).select(
        F.col("l_orderkey").alias("id"),
        F.col("l_quantity").alias("qty"),
        F.col("l_discount").alias("discount"),
    )
    out = _fixture_dir(sf_dir, "schema_evo")
    if not os.path.isdir(out):
        staging = staging_path(out)
        shutil.rmtree(staging, ignore_errors=True)
        b1.write.parquet(os.path.join(staging, "batch=1"))
        b2.write.parquet(os.path.join(staging, "batch=2"))
        publish_dir(staging, out)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(out)
        .select("id", "qty", "discount", "batch")
    )


def stream_fitslike_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the FITS-like binary table through the custom source's
    ``SimpleDataSourceStreamReader`` — the incremental per-visit
    ingest feed (row-offset checkpoints give exactly-once replay on
    the immutable table; each micro-batch advances ≤ rowsPerBatch
    rows).  The complete-mode aggregation must equal the batch scan's,
    so the oracle is the same one ``source_fitslike_scan`` passes —
    proving the streamed decode path is byte-equivalent to the batch
    DataSourceReader."""
    path = _fitslike_fixture(spark, sf_dir)
    # Round-9 optimization (guide §2: scale-adaptive partitioning, not
    # a constant tuned for one tier): a FIXED 1500-row micro-batch
    # means the batch count — and the per-micro-batch planning/commit
    # overhead that dominates this op's wall time — grows linearly
    # with input (20 batches at sf0.1, ~11 s of mostly fixed costs).
    # Size the batch from the table's own header row count instead:
    # ≤ ~8 micro-batches at any scale, floored at 1500 so the small
    # tiers still exercise genuine multi-batch replay (pinned in
    # tests/test_streaming.py).  The aggregation runs in complete mode
    # over the whole table, so the result is batching-invariant.
    from ..sources.fitslike import read_header_ex

    nrows = read_header_ex(path).nrows
    rows_per_batch = max(1500, -(-nrows // 8))
    stream = (
        spark.readStream.format("fitslike")
        .option("path", path)
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    agg = stream.groupBy((F.col("user_id") % 10).alias("cohort")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null"),
        F.sum(F.col("value").cast("decimal(14,2)"))
        .cast("double")
        .alias("sum_value"),
        F.max("ts_us").alias("max_ts_us"),
        F.max("event_type").alias("etype"),
    )
    sink = "stream_fitslike_tail_sink"
    # NOT availableNow: with a SimpleDataSourceStreamReader the
    # "available" offset is whatever the driver-side prefetch cache
    # holds at query start (one rowsPerBatch batch) — the run would
    # stop ~1 batch in.  processAllAvailable() drains the source to
    # its true end across as many micro-batches as it takes.
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        query.processAllAvailable()
        from ..streaming.jobs import _capture_stream_plan

        _capture_stream_plan("stream_fitslike_tail", query)
    finally:
        query.stop()
    return spark.table(sink)


def ingest_badrows_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue ingest: a CSV feed with deliberately
    corrupted rows loads in PERMISSIVE mode with a
    ``columnNameOfCorruptRecord`` — valid rows land typed, malformed
    rows are captured verbatim for quarantine instead of failing the
    load (the production alternative to the reference's all-or-nothing
    ``LOAD DATA``).  Corruption is deterministic (every 13th order id
    gets a non-numeric total), so the oracle knows exactly which rows
    quarantine.  Output: per-disposition counts + recoverable id sums,
    all integers."""
    import csv

    from ..fixtures import fixture_path, publish_file, staging_path

    path = fixture_path(sf_dir, "dlq", ".csv")
    if not os.path.exists(path):
        src = (
            catalog.table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") < 400)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy("o_orderkey")
            .collect()
        )
        staging = staging_path(path)
        with open(staging, "w", newline="") as fh:
            wcsv = csv.writer(fh)
            for r in src:
                if r.o_orderkey % 13 == 0:
                    wcsv.writerow(
                        [r.o_orderkey, r.o_custkey, "CORRUPT#%d" % r.o_orderkey]
                    )
                else:
                    wcsv.writerow([r.o_orderkey, r.o_custkey, r.o_totalprice])
        publish_file(staging, path)

    schema = (
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,"
        " _corrupt STRING"
    )
    loaded = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    ).cache()  # Spark requires caching before referencing _corrupt alone
    return loaded.select(
        F.when(F.col("_corrupt").isNull(), "loaded")
        .otherwise("quarantined")
        .alias("disposition"),
        "o_orderkey",
    ).groupBy("disposition").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_keys"),
    )


_DLQ_ORACLE = (
    "SELECT CASE WHEN o_orderkey % 13 = 0 THEN 'quarantined' ELSE 'loaded' END"
    " AS disposition,"
    " CAST(COUNT(*) AS BIGINT) AS n_rows,"
    " CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys"
    " FROM orders WHERE o_orderkey < 400 GROUP BY 1"
)


_SCHEMA_EVO_ORACLE = (
    "SELECT l_orderkey AS id, l_quantity AS qty, CAST(NULL AS DOUBLE) AS discount,"
    " 1 AS batch FROM lineitem WHERE l_orderkey < 200 AND l_linenumber = 1"
    " UNION ALL "
    "SELECT l_orderkey, l_quantity, l_discount, 2"
    " FROM lineitem WHERE l_orderkey < 200 AND l_linenumber = 2"
)



def ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the third columnar container Spark ships
    natively (Parquet, ORC; spark-avro's DataSource module is NOT in
    this container — probed round 2, only the avro core jars ship, so
    Avro is documented-unavailable like transformWithStateInPandas).

    events sample → ORC store (keyed persistent fixture) → scan with a
    pushed predicate → exact per-type aggregation; the oracle computes
    the same aggregate from the original parquet, proving the ORC hop
    is lossless.  µs timestamps travel as BIGINT — integer-exact in
    every container."""
    orc_dir = _fixture_dir(sf_dir, "ingest_orc")
    if not os.path.isdir(orc_dir):
        from ..fixtures import publish_dir, staging_path

        staging = staging_path(orc_dir)
        (
            catalog.v_events(spark, sf_dir)
            .where(F.col("event_id") < 5000)
            .select("event_id", "user_id", "ts_us", "event_type", "value")
            .write.mode("overwrite")
            .orc(staging)
        )
        publish_dir(staging, orc_dir)
    loaded = spark.read.orc(orc_dir).where(F.col("user_id") % 3 == 0)
    return loaded.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).cast("long").alias("cents"),
        F.max("ts_us").cast("long").alias("max_ts_us"),
    )


_ORC_ORACLE = inline_views(
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents, "
    "CAST(MAX(ts_us) AS BIGINT) AS max_ts_us "
    "FROM v_events WHERE event_id < 5000 AND user_id % 3 = 0 "
    "GROUP BY event_type"
)

def source_fitslike_varlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length + scaled FITS columns end to end (round 3,
    VERDICT r2 next-round #3): the fixture packs each user's purchase
    values into a ``PD`` heap array (the astropy shape for per-object
    forced-source samples) beside a TSCAL=0.01-quantized ``J``
    zero-point column, and the query explodes the arrays back to
    per-sample rows and aggregates — so a hash match against the
    original parquet proves descriptor/heap addressing AND §7.3.2
    scaling decode are lossless.

    The driver-side fixture build collects ~bounded per-user lists
    (registry-scale metadata, same call as the sqlite registry); the
    SCAN is the custom DataSource reading executor-side as usual.
    """
    from ..fixtures import fixture_path, publish_file, staging_path
    from ..sources.fitslike import FitsLikeDataSource

    if id(spark) not in _FITS_REGISTERED:
        spark.dataSource.register(FitsLikeDataSource)
        _FITS_REGISTERED.add(id(spark))

    path = fixture_path(sf_dir, "fitsvarlen", ".dat")
    if not os.path.exists(path):
        from ..sources.fitslike import write_fitslike

        src = (
            catalog.v_events(spark, sf_dir)
            .where((F.col("event_type") == "purchase") & (F.col("user_id") < 200))
            .select("user_id", "ts_us", "event_id", "value")
            .collect()
        )
        by_user: dict[int, list] = {}
        for r in src:
            by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_id, r.value))
        rows = [
            (
                uid,
                [v for _ts, _eid, v in sorted(samples)],
                25.0 + (uid % 13) / 100.0,
            )
            for uid, samples in sorted(by_user.items())
        ]
        staging = staging_path(path)
        write_fitslike(
            staging,
            [("user_id", "K"), ("samples", "PD(64)"), ("zero_point", "J")],
            rows,
            sort_key="user_id",
            scales={"zero_point": (0.01, 0.0)},
        )
        publish_file(staging, path)
    loaded = spark.read.format("fitslike").option("path", path).load()
    return (
        loaded.select(
            "user_id",
            F.col("zero_point"),
            F.explode("samples").alias("v"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.sum(F.floor(F.col("v") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents"),
            # §4.5 rule 4: re-quantize the TSCAL-decoded double to its
            # integer quantum — a 1-ulp product skew can never flip it
            F.floor(F.max("zero_point") * 100 + 0.5)
            .cast("long")
            .alias("zp_cents"),
        )
    )


_FITS_VARLEN_ORACLE = (
    "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_samples, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents, "
    "CAST(2500 + user_id % 13 AS BIGINT) AS zp_cents "
    "FROM v_events WHERE event_type = 'purchase' AND user_id < 200 "
    "GROUP BY user_id"
)


QUERIES = {
    "source_fitslike_varlen": source_fitslike_varlen,
    "ingest_orc_roundtrip": ingest_orc_roundtrip,
    "ingest_csv_roundtrip": ingest_csv_roundtrip,
    "ingest_jsonl_roundtrip": ingest_jsonl_roundtrip,
    "ingest_pk_dedup_layout": ingest_pk_dedup_layout,
    "ingest_schema_evolution": ingest_schema_evolution,
    "ingest_registry_visits": ingest_registry_visits,
    "ingest_badrows_quarantine": ingest_badrows_quarantine,
    "source_fitslike_scan": source_fitslike_scan,
    "stream_fitslike_tail": stream_fitslike_tail,
}
ORACLES = {
    "source_fitslike_varlen": inline_views(_FITS_VARLEN_ORACLE),
    "ingest_orc_roundtrip": _ORC_ORACLE,
    "ingest_csv_roundtrip": _ROUNDTRIP_ORACLE,
    "ingest_jsonl_roundtrip": _JSONL_ORACLE,
    "ingest_pk_dedup_layout": inline_views(_PK_LAYOUT_ORACLE),
    "ingest_schema_evolution": _SCHEMA_EVO_ORACLE,
    "ingest_registry_visits": _REGISTRY_ORACLE,
    "ingest_badrows_quarantine": _DLQ_ORACLE,
    "source_fitslike_scan": inline_views(_FITSLIKE_ORACLE),
    "stream_fitslike_tail": inline_views(_FITSLIKE_ORACLE),
}
