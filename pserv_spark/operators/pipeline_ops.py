"""Training-data pipeline layout operators + decayed/rolling window
statistics.

The dedup/similarity/text modules cover *selection*; these cover
*arrangement* — the deterministic layout steps between a cleaned corpus
and a training run:

- ``pack_sequential_bins``: assign documents to fixed-token-budget
  context bins (the packing step before example concatenation).
- ``interleave_sources``: deterministic round-robin mixture position
  across sources (corpus mixing without a global shuffle).
- ``class_balance_downsample``: per-class hash-ordered downsample to
  the minority-class count.
- ``win_ewma_decay``: exponentially-decayed running value per user —
  computed as a left fold over the window frame so BOTH engines execute
  the identical +/× sequence (a POWER()-weighted sum would hit libm
  ulp skew between JVM ``Math.pow`` and DuckDB's libm).
- ``win_rolling_median``: interpolated median over a 5-row sliding
  frame (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the same
  equivalence the corpus validated globally in ``agg_percentile``).
- ``text_chunk_sliding``: 64-token sliding windows on a 48-token
  stride — shuffle-free generator over each document.
- ``ts_resample_ohlc``: daily OHLC downsampling of the event stream
  with a total-order-deterministic open/close.

Scale: none of these uses a global (unpartitioned) window.  Packing and
balancing shuffle once on their group key (lang); interleave's global
position is pure arithmetic ``(rank-1)*n_sources + source_index`` over
per-source ranks — the classic way to avoid a single-partition
ROW_NUMBER at 100 TB.  Scalar thresholds (minority count, source count)
are 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..catalog import load_tables
from ._oracle import inline_views

_TOKEN_BUDGET = 2048


def pack_sequential_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential first-fit packing: within each language, documents in
    doc_id order accumulate into ``_TOKEN_BUDGET``-token bins; a doc's
    bin is decided by the tokens strictly before it (straddlers spill
    into the next bin at read time).  One shuffle on lang; the running
    sum is an exact integer."""
    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    return tok.select(
        "doc_id",
        "lang",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / _TOKEN_BUDGET)
        .cast("long")
        .alias("bin_id"),
    )


def interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source interleave: hash-rank within each source,
    then global position = (rank-1)*n_sources + source_index.  No
    global window — the position is arithmetic over per-source ranks,
    so it parallelizes at any scale."""
    t = load_tables(spark, sf_dir)
    # sourceless docs are not routable to an interleave slot (and a
    # NULL source would take a different index slot per engine)
    docs = t["documents"].where(F.col("source").isNotNull())
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .cast("long")
        .alias("rk"),
    )
    src = (
        docs.select("source")
        .distinct()
        .select(
            F.col("source").alias("s2"),
            (F.row_number().over(Window.orderBy("source")) - 1)
            .cast("long")
            .alias("sidx"),
        )
    )
    n = src.agg(F.count("*").alias("ns"))
    return (
        ranked.join(F.broadcast(src), F.col("source") == F.col("s2"))
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "source",
            "rk",
            ((F.col("rk") - 1) * F.col("ns") + F.col("sidx"))
            .cast("long")
            .alias("position"),
        )
    )


def class_balance_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance classes to the minority-class count by keeping the
    lowest-hash documents per language — deterministic, seedless, and
    stable under re-partitioning (hash order ≠ storage order)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    k = docs.groupBy("lang").count().agg(F.min("count").alias("k"))
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .cast("long")
        .alias("rk"),
    )
    return (
        ranked.join(F.broadcast(k))
        .where(F.col("rk") <= F.col("k"))
        .select("doc_id", "lang", "rk")
    )


def win_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decayed running sum (EWMA numerator, α-complement 0.9) over each
    user's last 20 events.  The frame is materialized as an array and
    left-folded ``acc*0.9 + v`` — both engines run the identical IEEE
    op sequence, so the result hashes exactly (rounded 6dp only as a
    belt)."""
    ev = catalog.v_events(spark, sf_dir).where(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-19, 0)
    )
    # collect_list SKIPS NULLs (the EWMA runs over observed values);
    # an all-NULL frame therefore collects an EMPTY list, which must
    # decay to NULL — not feed slice() a negative length.
    lst = F.collect_list(F.col("value")).over(w)
    return ev.select(
        "event_id",
        "user_id",
        lst.alias("lst"),
    ).select(
        "event_id",
        "user_id",
        F.round(
            F.expr(
                "CASE WHEN size(lst) = 0 THEN NULL ELSE "
                "aggregate(slice(lst, 2, size(lst) - 1), "
                "CAST(element_at(lst, 1) AS DOUBLE), "
                "(acc, x) -> acc * 0.9 + x) END"
            ),
            6,
        ).alias("decayed"),
    )


def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated median over a 5-row sliding frame per user.
    Midpoint arithmetic on identical sorted frames is deterministic
    across engines (validated globally by ``agg_percentile``)."""
    ev = catalog.v_events(spark, sf_dir).where(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("med5"),
        F.min("value").over(w).alias("min5"),
        F.max("value").over(w).alias("max5"),
    )


_CHUNK = 64
_STRIDE = 48


def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window context chunking: split each document into
    64-token chunks on a 48-token stride (16-token overlap) — the
    standard pre-training windowing step between packing and example
    emission.  Pure per-row generator arithmetic (sequence + explode +
    slice): no shuffle at all, embarrassingly parallel at any scale."""
    t = load_tables(spark, sf_dir)
    tok = t["documents"].select("doc_id", F.split("text", " ").alias("toks"))
    ex = tok.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr(f"sequence(0, CAST(floor((size(toks) - 1) / {_STRIDE}) AS INT))")
        ).alias("k"),
    )
    chunk = F.expr(f"slice(toks, k * {_STRIDE} + 1, {_CHUNK})")
    return ex.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream to daily OHLC bars per event type
    (open/high/low/close + count + decimal volume) — the canonical
    time-series resampling operator (ForcedSource light curves rebinned
    per night, in reference terms).  Open/close are made deterministic
    with a total (ts_us, event_id) ordering via two row_number passes
    over ONE shuffle of the same partition key; the agg then reuses
    that partitioning (no second exchange)."""
    ev = catalog.v_events(spark, sf_dir)
    base = ev.select(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        "value",
        "ts_us",
        "event_id",
    )
    wa = Window.partitionBy("day", "event_type").orderBy("ts_us", "event_id")
    wd = Window.partitionBy("day", "event_type").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    ranked = base.select(
        "day",
        "event_type",
        "value",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return ranked.groupBy("day", "event_type").agg(
        F.max(F.when(F.col("ra") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rd") == 1, F.col("value"))).alias("close"),
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(14,2)"))
        .cast("double")
        .alias("volume"),
    ).select(
        F.col("day").cast("timestamp").alias("day"),
        "event_type", "open", "high", "low", "close", "n", "volume",
    )


_ZBITS = 10


def _zbucket(col):
    """Bucket an embedding coordinate (empirically within ±0.5) to
    [0, 1023] — explicit FLOOR so both engines truncate identically
    (a bare double→INT cast rounds in DuckDB but truncates in Spark)."""
    scaled = F.least(
        F.greatest((col + 0.5) * (2**_ZBITS - 1), F.lit(0.0)),
        F.lit(float(2**_ZBITS - 1)),
    )
    return F.floor(scaled).cast("int")


def layout_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key for the first two embedding dimensions:
    interleave the 10-bit bucket indices so sorting by ``zval``
    co-locates 2-D neighbors in the same files/row-groups — the
    multi-column clustering layout (Delta's OPTIMIZE ZORDER BY) that
    turns 2-D box predicates into file-level min/max pruning at rest.
    The key itself is pure integer bit arithmetic (exact oracle);
    tests/test_zonestore.py measures the locality win on disk."""
    emb = catalog.v_emb(spark, sf_dir)
    bucketed = emb.select(
        "vec_id",
        _zbucket(F.element_at("emb", 1)).alias("bx"),
        _zbucket(F.element_at("emb", 2)).alias("by"),
    )
    zval = F.expr(
        f"aggregate(sequence(0, {_ZBITS - 1}), 0L, (acc, i) -> acc"
        " + shiftleft(CAST((bx >> i) & 1 AS BIGINT), 2 * i)"
        " + shiftleft(CAST((by >> i) & 1 AS BIGINT), 2 * i + 1))"
    )
    return bucketed.select("vec_id", "bx", "by", zval.alias("zval"))


_ZORDER_ORACLE_BUCKET = (
    "CAST(FLOOR(LEAST(GREATEST((emb[{d}] + 0.5) * 1023, 0.0), 1023.0)) AS INT)"
)

_COMPACT_TARGET = 256  # records per file after compaction


def layout_compact_smallfiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction of the day-partitioned event store — the
    OPTIMIZE / rewrite-data-files maintenance job every long-running
    100 TB table needs (streaming ingest leaves a file per micro-batch
    per partition; scans then drown in open() overhead and tiny row
    groups).

    Mechanism: repartition on the partition column so each day lands
    in exactly one write task, and let ``maxRecordsPerFile`` split that
    task's output into ⌈rows/target⌉ equal-bounded files — the
    idiomatic Spark compaction (no manual file surgery).  The operator
    returns per-day (rows, files) with ``n_files`` counted from the
    actual directory listing, so the oracle's ⌈rows/target⌉ is checked
    against what really landed on disk, not against the plan's
    intention.

    At scale the repartition("day") shuffle is the rewrite cost — it
    moves each partition once; a day whose rows exceed one task's
    memory would use (day, file_group) salting at a ceil-preserving
    granularity.
    """
    import glob
    import os
    import shutil

    from ..fixtures import fixture_path

    ev = catalog.v_events(spark, sf_dir).withColumn(
        "day", F.col("ts").cast("date")
    )
    # rebuilt every call (the op measures the rewrite itself), so the
    # path is per-process to keep concurrent runs off each other
    out = fixture_path(sf_dir, "compact", f".run{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)
    (
        ev.repartition(F.col("day"))
        .write.option("maxRecordsPerFile", _COMPACT_TARGET)
        .partitionBy("day")
        .parquet(out)
    )
    files = [
        (d.split("day=")[1], len(glob.glob(os.path.join(out, d, "part-*"))))
        for d in os.listdir(out)
        if d.startswith("day=")
    ]
    files_df = spark.createDataFrame(files, "day_str string, n_files long").select(
        F.col("day_str").cast("date").alias("day"), "n_files"
    )
    rows = (
        # schema-explicit read-back: an input pruned to zero rows writes
        # no part files (only _SUCCESS), and a bare read would fail
        # schema inference — at 100 TB an empty compaction window is a
        # normal state, not an error
        spark.read.schema(ev.schema).parquet(out)
        .groupBy(F.col("day").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    return rows.join(files_df, "day").select(
        F.col("day").cast("timestamp").alias("day"), "n_rows", "n_files"
    )


_COMPACT_ORACLE = (
    "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    f"CAST(CEIL(COUNT(*) / {_COMPACT_TARGET}.0) AS BIGINT) AS n_files "
    "FROM events WHERE ts IS NOT NULL GROUP BY 1"
)


def layout_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level zone-map data skipping on a NON-partition column —
    the Delta/Iceberg file-stats mechanism, day-zero on plain parquet.

    Partition pruning only helps for the partition key; a 100 TB fact
    table also needs skipping on its clustered sort key.  Mechanism:
    (1) range-layout the table (`repartitionByRange` on l_shipdate →
    each output file covers a tight date band); (2) build a manifest of
    per-file (min, max) of the sort key with ONE aggregated scan
    (`input_file_name()` groupBy — what OPTIMIZE stats collection
    does); (3) at query time, intersect the predicate with the
    manifest driver-side (the manifest is file-count-sized, i.e. tiny)
    and read only surviving files, keeping the predicate as a residual
    filter.  The oracle is the plain global filter, so a hash match
    proves skipping never changes results; tests assert most files
    were actually skipped.
    """
    import json
    import os
    import shutil

    from ..fixtures import fixture_path, publish_dir, staging_path

    lo, hi, hi_excl = "1996-01-01", "1996-03-31", "1996-04-01"
    li = catalog.table(spark, sf_dir, "lineitem")
    out = fixture_path(sf_dir, "zonemap")
    manifest_path = os.path.join(out, "_manifest.json")
    if not os.path.exists(manifest_path):
        # staged build + atomic publish; manifest stores RELATIVE file
        # names so the rename doesn't invalidate it (ADVICE r2)
        staging = staging_path(out)
        shutil.rmtree(staging, ignore_errors=True)
        (
            li.repartitionByRange(16, "l_shipdate")
            .write.mode("overwrite")
            .parquet(staging)
        )
        stats = (
            # schema-explicit: zero-row staging (pruned-to-empty input)
            # has no part files to infer from
            spark.read.schema(li.schema).parquet(staging)
            .groupBy(F.input_file_name().alias("file"))
            .agg(
                F.min("l_shipdate").cast("string").alias("mn"),
                F.max("l_shipdate").cast("string").alias("mx"),
            )
            .collect()
        )
        with open(os.path.join(staging, "_manifest.json"), "w") as f:
            json.dump([(r.file.rsplit("/", 1)[-1], r.mn, r.mx) for r in stats], f)
        publish_dir(staging, out, sentinel="_manifest.json")

    manifest = json.load(open(manifest_path))
    # A file whose sort key is entirely NULL has NULL zone stats (min/max
    # skip NULLs) — per Delta/Iceberg semantics a file without usable
    # stats can NEVER be skipped; the residual filter below still drops
    # its rows, so conservatism costs a read, not correctness.
    selected = [
        os.path.join(out, fname)
        for fname, mn, mx in manifest
        if mn is None or mx is None
        or not (mx < lo or mn >= hi_excl)  # ISO strings order correctly
    ]
    # surface the skipping stats for the audit test
    layout_zonemap_prune.last_audit = {  # type: ignore[attr-defined]
        "n_files": len(manifest),
        "n_selected": len(selected),
    }
    if selected:
        pruned = spark.read.parquet(*selected)
    else:
        # every file zone-skipped (or an empty store): the exact answer
        # is the empty relation — no scan at all
        pruned = spark.createDataFrame([], li.schema)
    pruned = pruned.where(
        F.to_date("l_shipdate").between(lo, hi)  # residual filter stays on
    )
    return pruned.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("sum_price"),
    )


_ZONEMAP_ORACLE = (
    "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price "
    "FROM lineitem "
    "WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31' "
    "GROUP BY l_returnflag"
)


_TT_US_PER_DAY = 86_400_000_000


def layout_snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolation time travel on plain parquet — the
    Delta/Iceberg ``VERSION AS OF`` mechanism, reproduced with
    file-list manifests (a snapshot IS its file list; appends create a
    new manifest, never touch old files).

    Version 1 lands the first half of the purchase stream; an append
    batch lands the rest and commits manifest v2 = v1 ∪ new-files.
    Querying "as of v1" plans a scan over exactly the v1 manifest —
    no tombstones, no copy-on-write, and old versions stay readable
    for free.  The oracle recomputes both versions from the raw
    stream, so a hash match proves append isolation (v1's answer is
    unchanged by later writes).  At 100 TB the manifest is
    file-count-sized and the as-of scan prunes to the listed files at
    planning time.
    """
    import hashlib
    import json
    import os
    import shutil
    import tempfile

    ev = catalog.v_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    day = F.floor(F.col("ts_us") / F.lit(float(_TT_US_PER_DAY))).cast("long")
    bounds = ev.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    ).collect()[0]
    # pruned-to-empty stream: no bounds — any midpoint splits nothing
    lo_b = bounds.lo if bounds.lo is not None else 0
    hi_b = bounds.hi if bounds.hi is not None else 0
    mid = lo_b + (hi_b - lo_b) // 2

    from ..fixtures import fixture_path, publish_dir, staging_path

    out = fixture_path(sf_dir, "timetravel")
    m1p, m2p = os.path.join(out, "_v1.json"), os.path.join(out, "_v2.json")
    if not (os.path.exists(m1p) and os.path.exists(m2p)):
        # staged build, manifests hold names relative to data/ so the
        # publish rename can't invalidate them (ADVICE r2)
        staging = staging_path(out)
        shutil.rmtree(staging, ignore_errors=True)
        data = os.path.join(staging, "data")
        ev.where(day < mid).write.parquet(data)
        v1_files = sorted(f for f in os.listdir(data) if f.endswith(".parquet"))
        ev.where(day >= mid).write.mode("append").parquet(data)
        all_files = sorted(f for f in os.listdir(data) if f.endswith(".parquet"))
        with open(os.path.join(staging, "_v1.json"), "w") as fh:
            json.dump(v1_files, fh)
        with open(os.path.join(staging, "_v2.json"), "w") as fh:
            json.dump(all_files, fh)
        publish_dir(staging, out, sentinel="_v2.json")

    def as_of(manifest_path: str, version: int) -> DataFrame:
        with open(manifest_path) as fh:
            files = [os.path.join(out, "data", f) for f in json.load(fh)]
        # an empty manifest is a valid snapshot (zero committed files):
        # the as-of scan is the empty relation, and the global aggregate
        # below still emits its one summary row — same as the oracle
        snap = (
            spark.read.parquet(*files)
            if files
            else spark.createDataFrame([], ev.schema)
        )
        return (
            snap
            .agg(
                F.lit(version).alias("version"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                .cast("long")
                .alias("cents"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            )
        )

    return as_of(m1p, 1).unionByName(as_of(m2p, 2))


def layout_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution (the Iceberg capability plain Hive
    layouts lack): old data stays partitioned by DAY, new data lands
    partitioned by MONTH, and queries plan against BOTH specs without
    rewriting history.

    Mechanism: each batch's manifest records its partition spec and
    per-partition file list; the reader turns a predicate into
    spec-appropriate partition pruning per manifest (day granularity
    on the old files, month granularity + residual on the new), then
    unions the two scans.  The oracle is the plain global filter —
    a hash match proves cross-spec planning loses nothing.  The
    returned frame aggregates per (spec, day) so the result also
    shows which spec served each slice.
    """
    import json
    import os
    import shutil

    from ..fixtures import fixture_path, publish_dir, staging_path

    ev = catalog.v_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    day = F.floor(F.col("ts_us") / F.lit(float(_TT_US_PER_DAY))).cast("long")
    bounds = ev.agg(F.min(day).alias("lo"), F.max(day).alias("hi")).collect()[0]
    lo_b = bounds.lo if bounds.lo is not None else 0
    hi_b = bounds.hi if bounds.hi is not None else 0
    mid = lo_b + (hi_b - lo_b) // 2

    out = fixture_path(sf_dir, "specevo")
    man_path = os.path.join(out, "_manifests.json")
    if not os.path.exists(man_path):
        # staged build + atomic publish, spec roots stored relative
        staging = staging_path(out)
        shutil.rmtree(staging, ignore_errors=True)
        (
            ev.where(day < mid)
            .withColumn("p_day", day)
            .write.partitionBy("p_day")
            .parquet(os.path.join(staging, "byday"))
        )
        (
            ev.where(day >= mid)
            .withColumn("p_month", F.floor(day / 30).cast("long"))
            .write.partitionBy("p_month")
            .parquet(os.path.join(staging, "bymonth"))
        )
        manifests = [
            {"spec": "day", "root": "byday", "col": "p_day"},
            {"spec": "month", "root": "bymonth", "col": "p_month"},
        ]
        with open(os.path.join(staging, "_manifests.json"), "w") as fh:
            json.dump(manifests, fh)
        publish_dir(staging, out, sentinel="_manifests.json")

    with open(man_path) as fh:
        manifests = json.load(fh)

    # Query: a 20-day window straddling the spec boundary.
    q_lo, q_hi = mid - 10, mid + 10
    parts = []
    for m in manifests:
        root = os.path.join(out, m["root"])
        # schema-explicit (base columns + this spec's partition column):
        # a spec whose batch was pruned to zero rows has no part files
        spec_schema = ev.withColumn(
            m["col"], F.lit(0).cast("long")
        ).schema
        df = spark.read.schema(spec_schema).option("basePath", root).parquet(root)
        if m["spec"] == "day":
            # day-granular spec: partition predicate IS the filter
            pruned = df.where(
                (F.col("p_day") >= q_lo) & (F.col("p_day") < q_hi)
            )
        else:
            # month-granular spec: prune to candidate months, keep the
            # day predicate as a residual on the data column
            d = F.floor(F.col("ts_us") / F.lit(float(_TT_US_PER_DAY))).cast("long")
            pruned = df.where(
                (F.col("p_month") >= q_lo // 30) & (F.col("p_month") <= q_hi // 30)
            ).where((d >= q_lo) & (d < q_hi))
        parts.append(
            pruned.select(
                F.lit(m["spec"]).alias("spec"),
                F.floor(F.col("ts_us") / F.lit(float(_TT_US_PER_DAY)))
                .cast("long")
                .alias("day"),
                "value",
            )
        )
    both = parts[0].unionByName(parts[1])
    return both.groupBy("spec", "day").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents"),
    )


_SPECEVO_ORACLE = (
    "WITH p AS (SELECT *, " + "CAST(FLOOR(ts_us / 86400000000.0) AS BIGINT)" + " AS d"
    " FROM v_events WHERE event_type = 'purchase'),"
    " b AS (SELECT MIN(d) AS lo, MIN(d) + CAST(FLOOR((MAX(d) - MIN(d)) / 2) AS BIGINT) AS mid FROM p)"
    " SELECT CASE WHEN d < mid THEN 'day' ELSE 'month' END AS spec, d AS day,"
    "  CAST(COUNT(*) AS BIGINT) AS n,"
    "  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents"
    " FROM p CROSS JOIN b WHERE d >= mid - 10 AND d < mid + 10"
    " GROUP BY 1, 2"
)


def vacuum_data_dir(data_dir: str, manifest_paths: list[str]) -> dict:
    """The VACUUM core, shared by ``layout_vacuum_orphans`` and the
    crash-consistency audit: delete every ``*.parquet`` under
    ``data_dir`` that no manifest references (crashed-writer debris —
    complete-but-uncommitted files, torn partial writes, hidden
    ``.part-*`` temporaries).  Non-parquet entries (manifests, Spark
    ``_SUCCESS``/``_temporary``, staging ``*.json.tmp.*``) are never
    touched: manifest hygiene is the publisher's job, not vacuum's.
    Both sides of the set difference are file-listing-sized at any
    scale.  Returns an audit dict (counts + removed names)."""
    import json
    import os

    referenced: set[str] = set()
    for mp in manifest_paths:
        with open(mp) as fh:
            names = json.load(fh)
        # manifests may hold absolute paths or data/-relative names
        referenced.update(
            n if os.path.isabs(n) else os.path.join(data_dir, n) for n in names
        )
    listed = {
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    }
    orphans = sorted(listed - referenced)
    for f in orphans:
        os.remove(f)
    return {
        "n_listed": len(listed),
        "n_orphans_removed": len(orphans),
        "orphans": orphans,
    }


def layout_vacuum_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM: delete data files not referenced by the current
    manifest (failed-commit debris, the other half of the
    snapshot-manifest lifecycle from ``layout_snapshot_timetravel``).

    Setup plants a deliberate orphan (a parquet file written next to
    the committed ones but absent from every manifest — exactly what a
    crashed writer leaves).  Vacuum = directory listing MINUS the
    manifest union, then unlink; the audited result re-reads the v2
    snapshot, so a hash match against the same oracle proves vacuum
    touched ONLY the orphan.  At 100 TB both sides of the set
    difference are file-listing-sized."""
    import json
    import os
    import shutil

    from ..fixtures import fixture_path

    ev = catalog.v_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    day = F.floor(F.col("ts_us") / F.lit(float(_TT_US_PER_DAY))).cast("long")
    bounds = ev.agg(F.min(day).alias("lo"), F.max(day).alias("hi")).collect()[0]
    lo_b = bounds.lo if bounds.lo is not None else 0
    hi_b = bounds.hi if bounds.hi is not None else 0
    mid = lo_b + (hi_b - lo_b) // 2

    # rebuilt (and mutated — the whole point is deleting an orphan)
    # every call, so the path is per-process: concurrent runs each
    # vacuum their own copy instead of racing on one directory
    out = fixture_path(sf_dir, "vacuum", f".run{os.getpid()}")
    m1p, m2p = os.path.join(out, "_v1.json"), os.path.join(out, "_v2.json")
    data = os.path.join(out, "data")
    shutil.rmtree(out, ignore_errors=True)
    ev.where(day < mid).write.parquet(data)
    v1_files = sorted(
        os.path.join(data, f) for f in os.listdir(data) if f.endswith(".parquet")
    )
    ev.where(day >= mid).write.mode("append").parquet(data)
    all_files = sorted(
        os.path.join(data, f) for f in os.listdir(data) if f.endswith(".parquet")
    )
    with open(m1p, "w") as fh:
        json.dump(v1_files, fh)
    with open(m2p, "w") as fh:
        json.dump(all_files, fh)
    # the crashed-writer debris: a valid parquet file no manifest knows
    orphan_stage = os.path.join(out, "_orphan_stage")
    ev.limit(100).coalesce(1).write.parquet(orphan_stage)
    part = next(
        (
            f for f in os.listdir(orphan_stage)
            if f.endswith(".parquet") and not f.startswith(".")
        ),
        None,  # zero-row input writes no part file: nothing to plant
    )
    if part is not None:
        orphan = os.path.join(data, "part-orphan-uncommitted.snappy.parquet")
        shutil.move(os.path.join(orphan_stage, part), orphan)
    shutil.rmtree(orphan_stage)

    layout_vacuum_orphans.last_audit = vacuum_data_dir(data, [m1p, m2p])
    with open(m2p) as fh:
        v2 = json.load(fh)
    snap = spark.read.parquet(*v2) if v2 else spark.createDataFrame([], ev.schema)
    return snap.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


_VACUUM_ORACLE = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,"
    " CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,"
    " CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users"
    " FROM v_events WHERE event_type = 'purchase'"
)


_TT_DAY = f"CAST(FLOOR(ts_us / {_TT_US_PER_DAY}.0) AS BIGINT)"
_TIMETRAVEL_ORACLE = (
    "WITH p AS (SELECT *, " + _TT_DAY + " AS d FROM v_events"
    " WHERE event_type = 'purchase'),"
    " b AS (SELECT MIN(d) + CAST(FLOOR((MAX(d) - MIN(d)) / 2) AS BIGINT) AS mid FROM p)"
    " SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,"
    "  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,"
    "  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users"
    " FROM p CROSS JOIN b WHERE d < mid"
    " UNION ALL"
    " SELECT 2, CAST(COUNT(*) AS BIGINT),"
    "  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT),"
    "  CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM p"
)



_BLOOM_M = 131_072  # bits per file (16 KiB) — sized for ~10k keys/file
_BLOOM_KEY = 41     # the point-lookup customer


def layout_bloom_file_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file BLOOM-FILTER data skipping for point lookups on a
    column the layout is NOT organized by — the mechanism Parquet
    bloom filters / Delta bloom indexes provide, complementing
    ``layout_zonemap_prune``: min/max stats only skip when the file
    range excludes the predicate, which never happens for a hashed
    key; a bloom bitset per file skips on MEMBERSHIP instead.

    (1) hash-layout orders into 16 files keyed by o_orderkey (so
    custkey lookups get no help from ordering); (2) one aggregated
    scan builds a per-file bitset manifest — 3 md5-anchored bit
    positions per key, the ``sketch_bloom_prune`` family; (3) a point
    lookup computes its 3 bits driver-side and reads only files whose
    bitset contains ALL of them (no false negatives by construction —
    every file containing the key set its bits), with the exact
    predicate kept as a residual.  The oracle is the plain global
    filter; tests assert files were actually skipped.
    """
    import hashlib as _hl
    import json
    import os
    import shutil

    from ..fixtures import fixture_path, publish_dir, staging_path

    orders = catalog.table(spark, sf_dir, "orders")
    out = fixture_path(sf_dir, "bloomskip")
    manifest_path = os.path.join(out, "_bloom_manifest.json")
    if not os.path.exists(manifest_path):
        # Staged build + atomic publish (ADVICE r2): the manifest is
        # written INSIDE the staging dir before the rename, so the
        # published fixture is complete-or-absent — a crashed builder
        # can never leave a parquet layout that a later run trusts
        # without its manifest (or a half-written manifest).  File
        # names are stored relative so publication doesn't invalidate
        # them.
        staging = staging_path(out)
        shutil.rmtree(staging, ignore_errors=True)
        orders.repartition(16, "o_orderkey").write.mode("overwrite").parquet(staging)
        bit_cols = F.array(
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"bf{i}"), F.col("o_custkey").cast("string"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % _BLOOM_M
                )
                for i in range(1, 4)
            ]
        )
        stats = (
            spark.read.parquet(staging)
            .select(F.input_file_name().alias("file"), F.explode(bit_cols).alias("bit"))
            .groupBy("file")
            .agg(F.collect_set("bit").alias("bits"))
            .collect()
        )
        with open(os.path.join(staging, "_bloom_manifest.json"), "w") as fh:
            json.dump([(r.file.rsplit("/", 1)[-1], sorted(r.bits)) for r in stats], fh)
        publish_dir(staging, out, sentinel="_bloom_manifest.json")

    manifest = json.load(open(manifest_path))
    want = {
        int(_hl.md5(f"bf{i}{_BLOOM_KEY}".encode()).hexdigest()[:8], 16) % _BLOOM_M
        for i in range(1, 4)
    }
    selected = [os.path.join(out, fp) for fp, bits in manifest if want <= set(bits)]
    layout_bloom_file_skip.last_audit = {  # type: ignore[attr-defined]
        "n_files": len(manifest),
        "n_selected": len(selected),
    }
    if not manifest:
        # zero-row table: no files, no bitsets — the lookup scans nothing
        hit = spark.createDataFrame([], orders.schema)
    else:
        if not selected:  # key absent everywhere — empty exact result
            selected = [os.path.join(out, manifest[0][0])]
        hit = spark.read.parquet(*selected)
    hit = hit.where(F.col("o_custkey") == _BLOOM_KEY)
    return hit.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents"),
        F.min("o_orderkey").cast("long").alias("min_okey"),
        F.max("o_orderkey").cast("long").alias("max_okey"),
    )


_BLOOMSKIP_ORACLE = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents, "
    "CAST(MIN(o_orderkey) AS BIGINT) AS min_okey, "
    "CAST(MAX(o_orderkey) AS BIGINT) AS max_okey "
    f"FROM orders WHERE o_custkey = {_BLOOM_KEY}"
)

def feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.'s feature
    hashing): every token maps to one of 64 feature buckets via the
    md5-anchored 32-bit token hash, giving a fixed-width sparse
    count vector per document with no vocabulary pass at all — the
    constant-memory featurizer training pipelines use when the
    vocabulary would not fit (or would need an extra corpus scan to
    build).

    Output is the sparse representation exploded to rows
    (doc_id, bucket, cnt, tf) on a bounded doc slice; tf is cnt
    normalized by the document token count.

    At 100 TB: explode + one (doc_id, bucket) groupBy — linear, no
    broadcast state, no vocabulary table; the bucket id is computed
    map-side from md5 so the plan is a single shuffle on the
    composite key."""
    from ..functions.text import token_hash32, tokens

    docs = catalog.table(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    tok = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.explode(tokens("text")).alias("w"),
    )
    return (
        tok.groupBy(
            "doc_id",
            "n_tokens",
            (token_hash32("w") % 64).cast("long").alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            "doc_id",
            "bucket",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n_tokens"), 6).alias(
                "tf"
            ),
        )
    )


def _hashing_trick_oracle() -> str:
    from ._oracle import duck_hash32

    return (
        "WITH tok AS ("
        "  SELECT doc_id,"
        "    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,"
        "    unnest(string_split(text, ' ')) AS w"
        "  FROM documents WHERE doc_id < 30"
        "), g AS ("
        "  SELECT doc_id, n_tokens,"
        f"   CAST({duck_hash32('w')} % 64 AS BIGINT) AS bucket,"
        "    CAST(COUNT(*) AS BIGINT) AS cnt"
        "  FROM tok GROUP BY doc_id, n_tokens, bucket"
        ") SELECT doc_id, bucket, cnt,"
        "  ROUND(CAST(cnt AS DOUBLE) / n_tokens, 6) AS tf"
        "  FROM g"
    )


_CURATE_BUDGET = 1024


def _curate_e2e_sql(splitfn: str, distinctfn: str, filterfn: str, lenfn: str) -> str:
    """End-to-end curation funnel — the composition proof for the
    training-data pipeline family: the stages shipped individually
    (`dedup_canonical_keeper`'s exact-hash dedup,
    `quality_composite_filter`'s keep rules, `pack_sequential_bins`'s
    token-budget packing) chained the way a real curation run chains
    them, with one audit row per stage (docs and token mass in, bins
    out) — the funnel readout a data-curation dashboard shows.

    Stage semantics are byte-identical to the standalone operators:
    exact dedup keeps MIN(doc_id) per md5(text); the quality screen
    applies the same four rules in the same order; packing reuses the
    per-language running-sum bin id with a smaller budget so multiple
    bins exist per language even on the post-filter corpus.

    At 100 TB: stage 1 is one groupBy(md5) + a self-equi-join on the
    key both sides hash by; stage 2 is a scan-fused filter; stage 3 is
    one per-language window; the four audit rows aggregate each stage
    with map-side partials.  Nothing quadratic, nothing driver-side.
    Exact by construction: every output is an integer count/sum
    (§4.5 rule 2 — no rounding anywhere)."""
    toks = f"{splitfn}(text, ' ')"
    nt = f"CAST({lenfn}({toks}) AS BIGINT)"
    nd = f"{lenfn}({distinctfn}({toks}))"
    stop = f"{lenfn}({filterfn}({toks}, t -> t = 'the' OR t = 'a'))"
    return (
        "WITH base AS ("
        f"  SELECT doc_id, lang, md5(text) AS h, {nt} AS n_tok,"
        f"    CAST({nd} AS DOUBLE) / {nt} AS distinct_ratio,"
        f"    CAST({stop} AS DOUBLE) / {nt} AS stop_ratio"
        "  FROM documents"
        "), canon AS ("
        "  SELECT MIN(doc_id) AS doc_id FROM base GROUP BY h"
        "), dd AS ("
        "  SELECT base.doc_id, lang, n_tok, distinct_ratio, stop_ratio"
        "  FROM base JOIN canon ON base.doc_id = canon.doc_id"
        "), kept AS ("
        "  SELECT doc_id, lang, n_tok FROM dd"
        "  WHERE n_tok >= 15 AND n_tok <= 500"
        "    AND distinct_ratio >= 0.35 AND stop_ratio <= 0.12"
        "), packed AS ("
        "  SELECT lang, n_tok,"
        "    CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)"
        f"      / {_CURATE_BUDGET}) AS BIGINT) AS bin_id"
        "  FROM kept"
        "), bins AS ("
        "  SELECT CAST(COUNT(*) AS BIGINT) AS n_bins"
        "  FROM (SELECT DISTINCT lang, bin_id FROM packed) db"
        ") SELECT stage_ord, stage, n_docs, n_tokens, n_bins FROM ("
        "  SELECT CAST(1 AS BIGINT) AS stage_ord, 'raw' AS stage,"
        "    CAST(COUNT(*) AS BIGINT) AS n_docs,"
        "    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,"
        "    CAST(0 AS BIGINT) AS n_bins FROM base"
        "  UNION ALL SELECT CAST(2 AS BIGINT), 'exact_dedup',"
        "    CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT),"
        "    CAST(0 AS BIGINT) FROM dd"
        "  UNION ALL SELECT CAST(3 AS BIGINT), 'quality',"
        "    CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT),"
        "    CAST(0 AS BIGINT) FROM kept"
        "  UNION ALL SELECT CAST(4 AS BIGINT), 'packed',"
        "    CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tok) AS BIGINT),"
        "    (SELECT n_bins FROM bins) FROM packed"
        ") f"
    )


def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the second vocabulary-free
    featurizer beside `feat_hashing_trick`: replace a categorical
    column with the mean of the target over the OTHER rows of the same
    category, loo = (sum_cat - y_i) / (n_cat - 1).  The leave-one-out
    form is what training pipelines use to avoid target leakage
    (the naive per-category mean includes the row's own label).

    Category = o_orderpriority, target = o_totalprice (held as exact
    cent BIGINTs, the Q1 scaled-integer pattern).  Scale: one
    map-side-combining groupBy reduces the data to |categories| rows,
    broadcast back onto the scan — no second shuffle; the per-row
    encode is one IEEE division of exact integers.  NULLIF guards the
    degenerate n_cat = 1 class (encode undefined -> NULL)."""
    o = load_tables(spark, sf_dir)["orders"]
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    rows = o.select(
        "o_orderkey", F.col("o_orderpriority").alias("category"), cents.alias("yc")
    )
    stats = rows.groupBy("category").agg(
        F.count("*").cast("long").alias("n_cat"),
        F.sum("yc").cast("long").alias("s_cat"),
    )
    return rows.join(F.broadcast(stats), "category").select(
        "o_orderkey",
        "category",
        "n_cat",
        F.round(
            (F.col("s_cat") - F.col("yc")).cast("double")
            / (F.lit(100.0) * F.nullif(F.col("n_cat") - 1, F.lit(0))),
            6,
        ).alias("loo_target_mean"),
    )


_TARGET_ENCODE_ORACLE = (
    "WITH rows_ AS ("
    "  SELECT o_orderkey, o_orderpriority AS category,"
    "    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS yc"
    "  FROM orders"
    "), stats AS ("
    "  SELECT category, CAST(COUNT(*) AS BIGINT) AS n_cat,"
    "    CAST(SUM(yc) AS BIGINT) AS s_cat"
    "  FROM rows_ GROUP BY category"
    ") SELECT o_orderkey, category, n_cat,"
    "  ROUND(CAST(s_cat - yc AS DOUBLE)"
    "    / (100.0 * NULLIF(n_cat - 1, 0)), 6) AS loo_target_mean"
    "  FROM rows_ JOIN stats USING (category)"
)


def pipeline_curate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation funnel: exact dedup -> quality screen ->
    token-budget packing, one audit row per stage."""
    load_tables(spark, sf_dir)
    return spark.sql(_curate_e2e_sql("split", "array_distinct", "filter", "size"))


QUERIES = {
    "layout_bloom_file_skip": layout_bloom_file_skip,
    "feat_hashing_trick": feat_hashing_trick,
    "pipeline_curate_e2e": pipeline_curate_e2e,
    "feat_target_encode": feat_target_encode,
    "layout_snapshot_timetravel": layout_snapshot_timetravel,
    "layout_partition_evolution": layout_partition_evolution,
    "layout_vacuum_orphans": layout_vacuum_orphans,
    "layout_zorder_keys": layout_zorder_keys,
    "text_chunk_sliding": text_chunk_sliding,
    "ts_resample_ohlc": ts_resample_ohlc,
    "pack_sequential_bins": pack_sequential_bins,
    "interleave_sources": interleave_sources,
    "class_balance_downsample": class_balance_downsample,
    "win_ewma_decay": win_ewma_decay,
    "win_rolling_median": win_rolling_median,
    "layout_compact_smallfiles": layout_compact_smallfiles,    "layout_zonemap_prune": layout_zonemap_prune,
}

ORACLES = {
    "layout_bloom_file_skip": _BLOOMSKIP_ORACLE,
    "feat_hashing_trick": _hashing_trick_oracle(),
    "feat_target_encode": _TARGET_ENCODE_ORACLE,
    "pipeline_curate_e2e": _curate_e2e_sql(
        "string_split", "list_distinct", "list_filter", "len"
    ),
    "layout_snapshot_timetravel": inline_views(_TIMETRAVEL_ORACLE),
    "layout_partition_evolution": inline_views(_SPECEVO_ORACLE),
    "layout_vacuum_orphans": inline_views(_VACUUM_ORACLE),
    "layout_compact_smallfiles": _COMPACT_ORACLE,
    "layout_zorder_keys": inline_views(
        "WITH b AS (SELECT vec_id, "
        + _ZORDER_ORACLE_BUCKET.format(d=1)
        + " AS bx, "
        + _ZORDER_ORACLE_BUCKET.format(d=2)
        + " AS by FROM v_emb) "
        "SELECT vec_id, bx, by, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(generate_series(0, 9), i -> "
        "(CAST((bx >> i) & 1 AS BIGINT) << (2 * i)) "
        "+ (CAST((by >> i) & 1 AS BIGINT) << (2 * i + 1)))), "
        "(a, b) -> a + b) AS zval FROM b"
    ),
    "text_chunk_sliding": (
        "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "ex AS (SELECT doc_id, toks, "
        "UNNEST(generate_series(0, CAST(FLOOR((len(toks) - 1) / 48) AS BIGINT))) AS k "
        "FROM tok) "
        "SELECT doc_id, CAST(k AS BIGINT) AS chunk_id, "
        "CAST(len(list_slice(toks, k * 48 + 1, LEAST(k * 48 + 64, len(toks)))) AS BIGINT) AS n_tok, "
        "array_to_string(list_slice(toks, k * 48 + 1, LEAST(k * 48 + 64, len(toks))), ' ') AS chunk_text "
        "FROM ex"
    ),
    "ts_resample_ohlc": inline_views(
        "WITH b AS (SELECT CAST(ts AS DATE) AS day, event_type, value, "
        "ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE), event_type "
        "ORDER BY ts_us, event_id) AS ra, "
        "ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE), event_type "
        "ORDER BY ts_us DESC, event_id DESC) AS rd FROM v_events) "
        "SELECT CAST(day AS TIMESTAMP) AS day, event_type, "
        "MAX(CASE WHEN ra = 1 THEN value END) AS open, "
        "MAX(value) AS high, MIN(value) AS low, "
        "MAX(CASE WHEN rd = 1 THEN value END) AS close, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS volume "
        "FROM b GROUP BY day, event_type"
    ),
    "pack_sequential_bins": (
        "WITH tok AS (SELECT doc_id, lang, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents) "
        "SELECT doc_id, lang, n_tok, "
        "CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) / 2048) AS BIGINT) AS bin_id "
        "FROM tok"
    ),
    "interleave_sources": (
        # sourceless docs are not routable (NULL never equi-joins the
        # source index anyway); excluding them explicitly also keeps
        # the 0-based source indexes engine-agnostic — Spark would
        # order a NULL source FIRST, DuckDB LAST, shifting every sidx
        "WITH ranked AS (SELECT doc_id, source, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY source "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk "
        "FROM documents WHERE source IS NOT NULL), "
        "src AS (SELECT source AS s2, "
        "CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT) AS sidx "
        "FROM (SELECT DISTINCT source FROM documents WHERE source IS NOT NULL) d), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM src) "
        "SELECT doc_id, source, rk, "
        "CAST((rk - 1) * ns + sidx AS BIGINT) AS position "
        "FROM ranked JOIN src ON source = s2 CROSS JOIN n"
    ),
    "class_balance_downsample": (
        "WITH k AS (SELECT MIN(n) AS k FROM "
        "(SELECT COUNT(*) AS n FROM documents GROUP BY lang) c), "
        "ranked AS (SELECT doc_id, lang, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk FROM documents) "
        "SELECT doc_id, lang, rk FROM ranked CROSS JOIN k WHERE rk <= k"
    ),
    "win_ewma_decay": inline_views(
        # DuckDB's list() window KEEPS NULLs (Spark's collect_list
        # skips them): filter them out, and an all-NULL frame is NULL
        "SELECT event_id, user_id, "
        "ROUND(CASE WHEN len(nlst) = 0 THEN NULL ELSE "
        "list_reduce(nlst, (acc, x) -> acc * 0.9 + x) END, 6) AS decayed FROM "
        "(SELECT event_id, user_id, "
        "list_filter(list(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), x -> x IS NOT NULL) AS nlst "
        "FROM v_events WHERE user_id < 30) t"
    ),
    "win_rolling_median": inline_views(
        "SELECT event_id, user_id, "
        "ROUND(quantile_cont(value, 0.5) OVER w, 6) AS med5, "
        "MIN(value) OVER w AS min5, MAX(value) OVER w AS max5 "
        "FROM v_events WHERE user_id < 30 "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
    ),    "layout_zonemap_prune": _ZONEMAP_ORACLE,
}
