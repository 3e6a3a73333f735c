"""Streaming jobs over the ``events`` table as a file source.

The reference has no streaming surface (Pserv is batch ETL into MySQL);
this is the Qserv-era "live catalog updates" analog the BASELINE
extension surface asks for, built the idiomatic way: ``readStream`` →
declarative transforms → stateful operators → ``writeStream`` with
``trigger(availableNow=True)`` for finite, driver-checkable runs.

Checkable semantics (SURVEY §2.4 [E] smoke facts):

- ``stream_tumbling_complete`` — tumbling daily aggregation in
  *complete* mode: emits every window, so the result equals the batch
  ``window_tumbling`` query exactly → exact DuckDB oracle.
- ``stream_dedup_keys`` — stateful streaming dedup on
  (user_id, event_type).  Projected to the key set, the output is
  order-independent → exact oracle (``SELECT DISTINCT``).
- ``stream_session_window`` — gap-based session windows (30 min) with
  a 1-hour watermark in append mode.  Append mode withholds windows
  newer than the final watermark, so this is a rows-only check by
  design.

At scale the same plans run untriggered on a real source (Kafka/files)
with checkpointed state; ``availableNow`` here exercises the identical
stateful operators (state store, watermark bookkeeping) in a bounded
run.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..catalog import SCHEMAS
from ..session import REQUIRED_SQL_CONFS

_run_ids = itertools.count()

#: Diagnostic hook (scripts/plan_lint.py --final): when set to a list,
#: every finite streaming run appends ``(label, plan_string)`` rows —
#: the micro-batch engine's LAST EXECUTED physical plan for the
#: streaming query itself (``StreamingQuery.explainInternal``), plus
#: the per-batch DataFrame plans built INSIDE ``foreachBatch``
#: functions, which the query's own explain cannot see.  ``None``
#: (default) = zero overhead on the product path.  This is what lets
#: the plan lint audit the streaming family's executed micro-batch
#: plans with the same hazard detectors as the batch registry.
BATCH_PLAN_CAPTURE: list[tuple[str, str]] | None = None

#: Companion hook (scripts/audit_stream_state.py): when set to a list,
#: every finite streaming run appends ``(label, stateOperators)`` — the
#: state-store metrics (numRowsTotal etc.) from the query's last
#: progress event.  The state audit is the streaming counterpart of the
#: collect audit: at 100 TB the failure mode of a stateful stream is
#: UNBOUNDED STATE GROWTH (no watermark eviction, no key bound), which
#: correctness checks can never see because every test run is finite.
STATE_CAPTURE: list[tuple[str, list]] | None = None

#: audit-only hooks (scripts/audit_crash_consistency.py, round 9 —
#: VERDICT r8 #7).  The four foreachBatch sinks claim exactly-once BY
#: IDEMPOTENCE; that claim is only real if a driver killed between
#: micro-batch publish and checkpoint commit (or mid-publish) leaves a
#: state the REPLAYED batch repairs.  ``SINK_CHECKPOINT_DIR`` makes a
#: sink op restartable (explicit checkpoint at <dir>/<op>; the sink
#: store is then NOT wiped at entry — preserving crash state is the
#: scenario) and ``SINK_FAULT`` = {"op","phase","batch"} raises inside
#: foreachBatch at the declared point ("before_publish" /
#: "after_publish").  Production calls leave both None: fresh temp
#: checkpoint, sink wiped, no faults — behavior unchanged.
SINK_CHECKPOINT_DIR: str | None = None
SINK_FAULT: dict | None = None


class InjectedSinkFault(RuntimeError):
    """Deliberate sink crash planted by the crash-consistency audit."""


def _fault_point(op: str, phase: str, batch_id: int) -> None:
    f = SINK_FAULT
    if (
        f is not None
        and f.get("op") == op
        and f.get("phase") == phase
        and int(batch_id) == int(f.get("batch", 0))
    ):
        raise InjectedSinkFault(f"{op}/{phase}/batch{batch_id}")


def _sink_start(op: str, writer):
    """Start a sink op's writeStream, checkpointed when under audit."""
    if SINK_CHECKPOINT_DIR is not None:
        writer = writer.option(
            "checkpointLocation", os.path.join(SINK_CHECKPOINT_DIR, op)
        )
    return writer.start()


def sink_store_path(op: str, sf_dir: str) -> str:
    """Canonical sink-store directory for a foreachBatch sink op —
    shared with the crash-consistency audit so it can inspect/clear
    the store between kill and restart."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"pserv_sink_{op}_{key}")


def _read_sink(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-explicit read of a foreachBatch-written parquet sink.

    A source pruned to zero rows can legally produce ZERO micro-batches
    (``availableNow`` lists no files → foreachBatch never fires → the
    sink directory is never created) or an empty dynamic-partition
    write (directory exists, no part files).  Both states must read
    back as an empty frame of the sink's declared schema — on a real
    cluster an empty trigger window is routine, not an error."""
    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as exc:
        # Only the two legitimate zero-batch shapes may read as empty;
        # any other analysis error (corrupt footer, permission, schema
        # clash) must surface, not masquerade as an empty trigger window.
        cond = getattr(exc, "getCondition", lambda: None)() or ""
        msg = str(exc)
        if (
            "PATH_NOT_FOUND" in cond
            or "UNABLE_TO_INFER_SCHEMA" in cond
            or "PATH_NOT_FOUND" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            return spark.createDataFrame([], schema)
        raise


def _capture_stream_plan(label: str, query) -> None:
    if BATCH_PLAN_CAPTURE is not None:
        try:  # diagnostic-only: never fail the job over a plan rendering
            BATCH_PLAN_CAPTURE.append((label, query._jsq.explainInternal(False)))
        except Exception:  # noqa: BLE001
            pass
    if STATE_CAPTURE is not None:
        try:
            prog = query.lastProgress or {}
            STATE_CAPTURE.append((label, prog.get("stateOperators") or []))
        except Exception:  # noqa: BLE001
            pass


def _capture_batch_plan(label: str, df: DataFrame) -> None:
    if BATCH_PLAN_CAPTURE is None:
        return
    try:
        BATCH_PLAN_CAPTURE.append(
            (label, df._jdf.queryExecution().executedPlan().toString())
        )
    except Exception:  # noqa: BLE001
        pass


def _stream_source_dir(sf_dir: str) -> str:
    """Spark's file stream source requires a *directory*; stage one
    containing a symlink to the events parquet (idempotent per sf)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"pserv_stream_{key}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.lexists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``v_events``-shaped streaming DataFrame over the events parquet.

    Same canonical NTZ→session-zone cast + epoch-µs derivation as the
    batch catalog view, so batch and stream share the exact expression.
    """
    for key, value in REQUIRED_SQL_CONFS.items():
        spark.conf.set(key, value)
    raw = (
        spark.readStream.schema(SCHEMAS["events"])
        .parquet(_stream_source_dir(sf_dir))
    )
    # same NULL-timestamp exclusion as the batch view: a time-less
    # event has no window/watermark placement
    return raw.where(F.col("ts").isNotNull()).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


_CDC_SLICES = 4
_CDC_BUCKETS = 16


def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDC apply: a keyed state store maintained across
    micro-batches by foreachBatch MERGE, served tombstone-filtered.

    The streaming half of ``merge_cdc_upsert``: the events feed is
    staged as 4 files and consumed one file per trigger, so the
    bounded ``availableNow`` run genuinely exercises 4 incremental
    merges (not one degenerate batch).  Each micro-batch reduces to
    its per-user latest change (delete markers = 'error' events kept
    as tombstones so an out-of-order earlier change can never
    resurrect a deleted key), merges against the store with
    last-writer-wins ordering (ts_us DESC, event_id DESC), and
    dynamically overwrites only the 16-way hash-bucket partitions the
    batch touched — a day-zero Delta/Iceberg MERGE on plain parquet.
    Final store state is independent of the file/batch order, so the
    exact oracle is the batch latest-per-key query.

    At scale: state per key is one row; the store rewrite is bounded
    by touched buckets (raise the bucket count with key cardinality);
    the in-batch reduction and the merge are both key-partitioned
    shuffles.
    """
    import shutil

    from pyspark.sql import Window

    from .. import catalog

    from ..fixtures import fixture_key

    key = fixture_key(sf_dir)
    src = os.path.join(tempfile.gettempdir(), f"pserv_cdc_src_{key}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        (
            catalog.table(spark, sf_dir, "events")
            .repartition(_CDC_SLICES, F.pmod(F.hash("event_id"), F.lit(_CDC_SLICES)))
            .write.mode("overwrite")
            .parquet(src)
        )
    out = sink_store_path("stream_cdc_apply", sf_dir)
    if SINK_CHECKPOINT_DIR is None:  # audit preserves crash state
        shutil.rmtree(out, ignore_errors=True)

    raw = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # same canonical NULL-timestamp gate as events_stream / v_events: a
    # time-less change has no last-writer-wins position, and the oracle
    # excludes it.  Gated on the stream (not only the staged fixture) so
    # a src directory cached by an earlier run is still filtered.
    changes = raw.where(F.col("ts").isNotNull()).select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    store_schema = (
        "user_id long, value double, ts_us long, event_id long, "
        "is_delete boolean, bucket int"
    )

    def reduce_latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _fault_point("stream_cdc_apply", "before_publish", batch_id)
        cand = reduce_latest(batch_df).select(
            "user_id",
            "value",
            "ts_us",
            "event_id",
            (F.col("event_type") == "error").alias("is_delete"),
            F.pmod(F.hash("user_id"), F.lit(_CDC_BUCKETS)).alias("bucket"),
        )
        try:
            cur = spark.read.parquet(out).select(*cand.columns)
        except Exception:
            cur = spark.createDataFrame([], store_schema)
        touched = [r.bucket for r in cand.select("bucket").distinct().collect()]
        merged = reduce_latest(cur.unionByName(cand)).where(
            F.col("bucket").isin(touched)
        )
        _capture_batch_plan("stream_cdc_apply:batch", merged)
        merged = merged.localCheckpoint()  # materialize before overwriting source
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(out)
        )
        _fault_point("stream_cdc_apply", "after_publish", batch_id)

    query = _sink_start(
        "stream_cdc_apply",
        changes.writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .trigger(availableNow=True),
    )
    try:
        query.awaitTermination()
        _capture_stream_plan("stream_cdc_apply", query)
    finally:
        query.stop()
    return (
        _read_sink(spark, out, store_schema)
        .where(~F.col("is_delete"))
        .select("user_id", "value", F.col("ts_us").alias("as_of_us"))
    )


def run_to_memory(stream_df: DataFrame, mode: str, name: str) -> DataFrame:
    """Execute a finite ``availableNow`` run into a memory sink and
    return the materialized result as a batch DataFrame."""
    spark = stream_df.sparkSession
    sink = f"{name}_{next(_run_ids)}"
    query = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
        _capture_stream_plan(name, query)
    finally:
        query.stop()
    return spark.table(sink)


def stream_tumbling_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling aggregation, complete mode ⇒ batch-equal."""
    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy(
        F.date_trunc("day", "ts").cast("timestamp").alias("day"), "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double"), 2
        ).alias("total_value"),
    )
    return run_to_memory(agg, "complete", "stream_tumbling")


def stream_hopping_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation — 2-hour windows every
    hour, so each event lands in exactly two overlapping windows.
    Complete mode over a finite availableNow run ⇒ equals the batch
    form; the oracle derives the same two candidate window starts per
    event with integer µs arithmetic and unnests them."""
    hour_us = 3_600_000_000
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(14,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return run_to_memory(agg, "complete", "stream_hopping")


def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup projected to its key set."""
    ev = events_stream(spark, sf_dir)
    deduped = ev.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_memory(deduped, "append", "stream_dedup")


def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: per-user running event counts via
    ``applyInPandasWithState`` — the escape hatch for operators the
    built-in stateful set can't express (SURVEY §2.2 UDF surface).

    State is one long per user key, held in the state store across
    micro-batches; each invocation folds the Arrow batches for its key
    and emits the updated total.  In a bounded ``availableNow`` run the
    file source delivers one batch, so the emitted totals equal the
    batch ``GROUP BY`` counts — which is this operator's exact oracle.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = events_stream(spark, sf_dir).select("user_id", "event_id")

    def count_events(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    counted = ev.groupBy("user_id").applyInPandasWithState(
        count_events,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(counted, "update", "stream_stateful")


def stream_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data handling: daily tumbling windows with a 1-hour
    watermark in *append* mode — the production shape for unbounded
    sources (state for a window is dropped once the watermark passes
    its end; late rows beyond that are discarded).  Rows-only by
    declaration: append mode withholds every window newer than the
    final watermark (SURVEY §2.2 [E]), which ANSI SQL can't express."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    out = agg.select(
        F.col("w.start").cast("timestamp").alias("day"), "event_type", "n"
    )
    return run_to_memory(out, "append", "stream_tumbling_wm")


def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the streaming events feed joined
    to the static customer dimension (the "live catalog update joined
    to reference catalog" shape).  The static side is planned per
    micro-batch and broadcast (dim-sized); the stream side never
    shuffles.  Stateless ⇒ append mode emits exactly the joined rows,
    so the batch inner join is an exact oracle."""
    from ..catalog import load_tables

    dim = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    ev = events_stream(spark, sf_dir).select("event_id", "user_id")
    joined = ev.join(dim, ev.user_id == dim.c_custkey).select(
        "event_id", "user_id", "c_mktsegment"
    )
    return run_to_memory(joined, "append", "stream_static_join")


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: the purchases stream joined to the
    signups stream on user + a 7-day event-time range, watermarked on
    both sides so each side's join state is bounded (rows older than
    watermark − range are dropped from the state store).  Inner joins
    emit matches as both sides arrive, so a bounded ``availableNow``
    run emits exactly the batch join — an exact oracle."""
    purchases = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
        )
    )
    signups = (
        events_stream(spark, sf_dir)
        .where(F.col("event_type") == "signup")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("s_id"),
            F.col("user_id").alias("s_uid"),
            F.col("ts").alias("s_ts"),
        )
    )
    joined = purchases.join(
        signups,
        (purchases.user_id == signups.s_uid)
        & (signups.s_ts <= purchases.p_ts)
        & (signups.s_ts >= purchases.p_ts - F.expr("INTERVAL 7 DAYS")),
        "inner",
    ).select("p_id", "user_id", "s_id")
    return run_to_memory(joined, "append", "stream_stream_join")


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute gap session windows per user, 1h watermark, append."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").cast("long").alias("n_events"))
    out = sessions.select(
        "user_id", F.col("w.start").alias("sess_start"), "n_events"
    )
    return run_to_memory(out, "append", "stream_session")


def stream_rollup_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the daily rollup (the continuous-
    aggregate ingest path): the events stream aggregates to daily
    partials in complete mode, and each micro-batch ``foreachBatch``-
    upserts the affected day partitions of a parquet rollup store
    (dynamic partition overwrite — a day is rewritten, never the
    table).  After a bounded ``availableNow`` run the store's final
    state must equal the batch daily aggregation, which is the exact
    oracle.  At scale this is how the serving rollup stays fresh
    without re-reading the raw history: state lives in the streaming
    aggregation, the store write is per-touched-partition.
    """
    import shutil

    out = sink_store_path("stream_rollup_upsert", sf_dir)
    if SINK_CHECKPOINT_DIR is None:  # audit preserves crash state
        shutil.rmtree(out, ignore_errors=True)
    ev = events_stream(spark, sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("timestamp").alias("day"), "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(14,2)"))
        .cast("decimal(18,2)")
        .alias("sum_value"),
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        _fault_point("stream_rollup_upsert", "before_publish", batch_id)
        staged = batch_df.withColumn("day_part", F.date_format("day", "yyyy-MM-dd"))
        _capture_batch_plan("stream_rollup_upsert:batch", staged)
        (
            staged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day_part")
            .parquet(out)
        )
        _fault_point("stream_rollup_upsert", "after_publish", batch_id)

    query = _sink_start(
        "stream_rollup_upsert",
        daily.writeStream.outputMode("complete")
        .foreachBatch(upsert)
        .trigger(availableNow=True),
    )
    try:
        query.awaitTermination()
        _capture_stream_plan("stream_rollup_upsert", query)
    finally:
        query.stop()
    sink_schema = (
        "day timestamp, event_type string, n long, "
        "sum_value decimal(18,2), day_part string"
    )
    return _read_sink(spark, out, sink_schema).select(
        "day", "event_type", "n", F.col("sum_value").cast("double").alias("sum_value")
    )



def stream_psi_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor — the online complement of the batch
    ``profile_psi_drift`` gate: the stream maintains a per-day 10-bin
    value histogram (complete-mode tumbling aggregation, the state a
    monitoring job keeps hot), and the serving readout scores every
    day's distribution against the all-time reference histogram with
    the same Laplace-smoothed PSI fold — the per-window drift alarm a
    score-monitoring dashboard polls.

    Complete mode + ``availableNow`` emits the full final state, so
    the streaming store equals the batch per-(day, bin) counts and the
    whole operator has an exact ANSI oracle.  The readout runs on the
    |days| x 10 store — bins absent from a day (or from the whole
    corpus) enter through the spine with smoothed shares, exactly as
    in the batch gate.

    Determinism (SURVEY §4.5): counts are exact BIGINTs; shares are
    single IEEE divisions of exact integers; each bin term is
    floor-quantized to integer billionths before the cross-bin SUM;
    the 1-row all-time total is an allowlisted scalar broadcast."""
    ev = events_stream(spark, sf_dir).where(F.col("value").isNotNull())
    binned = ev.select(
        F.date_trunc("day", "ts").cast("timestamp").alias("day"),
        F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("long").alias("bin"),
    )
    agg = binned.groupBy("day", "bin").agg(F.count("*").cast("long").alias("n"))
    store = run_to_memory(agg, "complete", "stream_psi")

    tot_day = store.groupBy("day").agg(F.sum("n").cast("long").alias("n_day"))
    tot_bin = store.groupBy("bin").agg(F.sum("n").cast("long").alias("n_bin"))
    n_all = store.agg(F.sum("n").cast("long").alias("n_all"))
    spine = tot_day.select(
        "day", "n_day", F.explode(F.expr("sequence(0, 9)")).alias("bin_i")
    ).select("day", "n_day", F.col("bin_i").cast("long").alias("bin"))
    cells = store.select(
        F.col("day").alias("c_day"), F.col("bin").alias("c_bin"), "n"
    )
    j = (
        spine.join(
            cells,
            (spine.day == cells.c_day) & (spine.bin == cells.c_bin),
            "left",
        )
        .join(F.broadcast(tot_bin), "bin", "left")
        .crossJoin(F.broadcast(n_all))
        .select(
            "day",
            "n_day",
            F.coalesce("n", F.lit(0).cast("long")).alias("c"),
            F.coalesce("n_bin", F.lit(0).cast("long")).alias("rc"),
            "n_all",
        )
    )
    p_day = (F.col("c") + 1).cast("double") / (F.col("n_day") + 10)
    p_ref = (F.col("rc") + 1).cast("double") / (F.col("n_all") + 10)
    term_q = F.floor(
        F.lit(1000000000.0) * ((p_day - p_ref) * F.log(p_day / p_ref))
    ).cast("long")
    return (
        j.select("day", "n_day", term_q.alias("tq"))
        .groupBy("day")
        .agg(
            F.max("n_day").cast("long").alias("n_day"),
            F.round(F.sum("tq").cast("double") / 1000000000.0, 6).alias("psi"),
        )
    )


def stream_jdbc_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → JDBC serving sink, exactly-once by idempotence: the
    complete-mode per-type aggregate is ``foreachBatch``-overwritten
    into an embedded-Derby table each micro-batch (the reference's
    MySQL serving role fed FROM the stream), so a replayed batch
    rewrites the same state instead of double-counting.  After the
    bounded ``availableNow`` drain the Derby table is read back over
    JDBC and must equal the batch aggregate — which is the oracle.

    Composes the two round-2 transports end to end: custom stream in,
    JDBC store out.  The aggregate is event-type-count-sized, so the
    per-batch overwrite is metadata-scale at any data volume.
    """
    from ..operators.jdbc_ops import _derby_url

    url, props, _db = _derby_url(spark, sf_dir, tag="_ssink")
    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents"),
    )

    def to_jdbc(batch_df: DataFrame, batch_id: int) -> None:
        _fault_point("stream_jdbc_sink", "before_publish", batch_id)
        _capture_batch_plan("stream_jdbc_sink:batch", batch_df)
        batch_df.write.mode("overwrite").jdbc(url, "serving_agg", properties=props)
        _fault_point("stream_jdbc_sink", "after_publish", batch_id)

    query = _sink_start(
        "stream_jdbc_sink",
        agg.writeStream.outputMode("complete")
        .foreachBatch(to_jdbc)
        .trigger(availableNow=True),
    )
    try:
        query.awaitTermination()
        _capture_stream_plan("stream_jdbc_sink", query)
    finally:
        query.stop()
    return spark.read.jdbc(url, "serving_agg", properties=props).select(
        "event_type", "n", "cents"
    )

def stream_topk_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of a top-k leaderboard (most-active
    users): the stream aggregates per-user counts in complete mode and
    each micro-batch ``foreachBatch``-overwrites a k-row store with
    the current top-10 under the total order (n DESC, user_id).

    The store is k rows — rewriting it per batch IS the scalable
    design (contrast the rollup upsert, which must be partition-
    surgical because its store is day-count-sized).  After a bounded
    ``availableNow`` run the leaderboard equals the batch top-10,
    which is the exact oracle.
    """
    import shutil

    out = sink_store_path("stream_topk_maintain", sf_dir)
    if SINK_CHECKPOINT_DIR is None:  # audit preserves crash state
        shutil.rmtree(out, ignore_errors=True)
    counts = (
        events_stream(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n"))
    )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        _fault_point("stream_topk_maintain", "before_publish", batch_id)
        topk = batch_df.orderBy(F.col("n").desc(), "user_id").limit(10)
        _capture_batch_plan("stream_topk_maintain:batch", topk)
        topk.write.mode("overwrite").parquet(out)
        _fault_point("stream_topk_maintain", "after_publish", batch_id)

    query = _sink_start(
        "stream_topk_maintain",
        counts.writeStream.outputMode("complete")
        .foreachBatch(publish)
        .trigger(availableNow=True),
    )
    try:
        query.awaitTermination()
        _capture_stream_plan("stream_topk_maintain", query)
    finally:
        query.stop()
    return spark.read.parquet(out).select("user_id", "n")


_LATE_US_PER_DAY = 86_400_000_000
_LATE_WM_US = 3_600_000_000  # 1 hour


def stream_late_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC late-data dropping — watermark semantics made
    exactly checkable instead of rows-only.

    The purchase feed replays as three files under
    ``maxFilesPerTrigger=1`` with controlled mtimes: f1 = on-time
    history (days < hi), f2 = on-time head (day hi — this commit
    establishes the high watermark), f3 = the LATE rows (odd-event-id
    rows of the first and last days).  Empirically pinned Spark
    semantics (see tests): a batch filters input with the watermark
    committed after the PREVIOUS batch, dropping rows whose window end
    ≤ that watermark — so f3's first-day rows are dropped (their
    window emits with the on-time count only) while f3's last-day rows
    land in the still-open head window; append mode finally emits
    exactly the windows whose end ≤ global-max-ts − 1 h.  Every branch
    is integer event-time arithmetic, so the DuckDB oracle replays the
    policy exactly.
    """
    import hashlib as _hl
    import shutil

    ev = (
        spark.read.schema(SCHEMAS["events"])
        .parquet(_stream_source_dir(sf_dir))
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "event_type",
        )
        .where(F.col("event_type") == "purchase")
    )
    day = F.floor(F.col("ts_us") / F.lit(float(_LATE_US_PER_DAY))).cast("long")
    b = ev.agg(F.min(day).alias("lo"), F.max(day).alias("hi")).collect()[0]
    is_late = ((day == b.lo) | (day == b.hi)) & (F.col("event_id") % 2 == 1)

    src = os.path.join(
        tempfile.gettempdir(),
        f"pserv_late3_{_hl.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    # Flat files (the file stream source does not recurse), mtime-ordered.
    for name, pred, mtime in (
        ("f1_history.parquet", (~is_late) & (day < b.hi), 1_000_000),
        ("f2_head.parquet", (~is_late) & (day == b.hi), 2_000_000),
        ("f3_late.parquet", is_late, 3_000_000),
    ):
        stage = os.path.join(src, f"_stage_{name}")
        ev.where(pred).coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        dest = os.path.join(src, name)
        shutil.move(os.path.join(stage, part), dest)
        shutil.rmtree(stage)
        os.utime(dest, (mtime, mtime))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    agg = stream.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.count("*").cast("long").alias("n")
    )
    out = agg.select(
        F.floor(F.unix_micros(F.col("w.start")) / F.lit(float(_LATE_US_PER_DAY)))
        .cast("long")
        .alias("day"),
        "n",
    )
    return run_to_memory(out, "append", "stream_late_drop")


def stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed restart recovery — exactly-once across TWO runs of
    the same query: run 1 sees only half the feed and commits its
    offsets/state to the checkpoint; more data lands; run 2 starts
    from the SAME checkpoint, resumes at the committed offset, and
    processes only the new file.  The foreachBatch sink appends one
    parquet slice per (run, batch), so double-processing would show up
    as duplicated rows — the exact batch-aggregation oracle proves
    none occurred.  This is the restart contract a production stream
    relies on (state store + offset log both recovered)."""
    import hashlib as _hl
    import shutil

    key = _hl.md5(sf_dir.encode()).hexdigest()[:8]
    src = os.path.join(tempfile.gettempdir(), f"pserv_ckpt_src_{key}")
    ckpt = os.path.join(tempfile.gettempdir(), f"pserv_ckpt_log_{key}")
    sink = os.path.join(tempfile.gettempdir(), f"pserv_ckpt_sink_{key}")
    for d in (src, ckpt, sink):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(src)

    ev = (
        spark.read.schema(SCHEMAS["events"])
        .parquet(_stream_source_dir(sf_dir))
        # same canonical gate as events_stream: a time-less event never
        # enters a stream (even though this aggregation ignores ts)
        .where(F.col("ts").isNotNull())
        .select("event_id", "user_id", "event_type", "value")
        .where(F.col("event_type") == "purchase")
    )

    def land(name: str, pred) -> None:
        stage = os.path.join(src, f"_stage_{name}")
        ev.where(pred).coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        shutil.move(os.path.join(stage, part), os.path.join(src, name))
        shutil.rmtree(stage)

    def run_once() -> None:
        stream = spark.readStream.schema(ev.schema).parquet(src)
        agg = stream.groupBy((F.col("user_id") % 10).alias("cohort")).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents"),
        )

        def publish(batch_df: DataFrame, batch_id: int) -> None:
            staged = batch_df.withColumn("batch_id", F.lit(batch_id))
            _capture_batch_plan("stream_checkpoint_resume:batch", staged)
            staged.write.mode("append").parquet(sink)

        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(publish)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            _capture_stream_plan("stream_checkpoint_resume", q)
        finally:
            q.stop()

    land("f1.parquet", F.col("event_id") % 2 == 0)
    run_once()  # run 1: commits offsets for f1
    land("f2.parquet", F.col("event_id") % 2 == 1)
    run_once()  # run 2: resumes from the checkpoint, reads only f2

    # Latest update per cohort = final state; max batch picks it.
    from pyspark.sql import Window

    w = Window.partitionBy("cohort").orderBy(
        F.col("batch_id").desc(), F.col("n").desc()
    )
    out = spark.read.parquet(sink)
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cohort", "n", "cents")
    )
