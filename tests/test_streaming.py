"""Streaming checks (SURVEY §5.2 strategy 5: availableNow runs must
equal — or deterministically relate to — their batch formulations)."""

from __future__ import annotations

from pserv_spark.registry import build_queries
from pserv_spark.streaming import (
    stream_dedup_keys,
    stream_session_window,
    stream_tumbling_complete,
)
from pserv_spark.testing import compare_frames


def test_batch_plan_capture_hook(spark, sf_smoke):
    """The diagnostic micro-batch plan-capture hook (plan_lint --final
    streaming section, round 6): with BATCH_PLAN_CAPTURE set, a finite
    memory-sink run records the streaming engine's last-executed
    physical plan; with it unset (the default), nothing is recorded
    and behavior is unchanged."""
    from pserv_spark.streaming import jobs as stream_jobs

    captured: list[tuple[str, str]] = []
    stream_jobs.BATCH_PLAN_CAPTURE = captured
    try:
        stream_tumbling_complete(spark, sf_smoke).collect()
    finally:
        stream_jobs.BATCH_PLAN_CAPTURE = None
    assert captured, "memory-sink run captured no plan"
    label, plan = captured[-1]
    assert label == "stream_tumbling"
    # The executed micro-batch plan, not the post-stream result read:
    # complete-mode stateful agg renders StateStore operators.
    assert "StateStore" in plan or "HashAggregate" in plan
    # Hook off -> no capture, stream still runs.
    assert stream_tumbling_complete(spark, sf_smoke).count() > 0


def test_tumbling_stream_equals_batch(spark, sf_smoke):
    """Complete-mode tumbling agg == the batch window_tumbling query."""
    stream = stream_tumbling_complete(spark, sf_smoke)
    batch = build_queries()["window_tumbling"](spark, sf_smoke)
    res = compare_frames("tumbling", stream, batch)
    assert res.ok, res.detail


def test_stream_dedup_equals_distinct(spark, sf_smoke):
    stream = stream_dedup_keys(spark, sf_smoke)
    batch = (
        build_queries()["window_tumbling"](spark, sf_smoke).sparkSession.read.parquet(
            f"{sf_smoke}/events.parquet"
        )
        .select("user_id", "event_type")
        .distinct()
    )
    res = compare_frames("dedup", stream, batch)
    assert res.ok, res.detail


def test_session_window_shape(spark, sf_smoke):
    out = stream_session_window(spark, sf_smoke)
    assert out.columns == ["user_id", "sess_start", "n_events"]
    n = out.count()
    # Append mode withholds windows newer than the final watermark, so
    # the count is ≤ the total session count but must be substantial.
    assert n > 100


def test_fitslike_stream_multiple_batches(spark, sf_oracle):
    """The simple stream reader must advance through >1 micro-batch
    and its final aggregation must equal the batch DataSourceReader's.

    rowsPerBatch is adaptive since r9 — ``max(1500, ceil(nrows/8))`` —
    so the >1-batch guarantee is ``total > rows_per_batch`` with the
    batch size recomputed from the fixture header, not the 1500 floor
    (ADVICE r9 #4: the floor alone implies >1 batch only through the
    formula)."""
    from pserv_spark.operators.ingest_ops import (
        _fitslike_fixture,
        source_fitslike_scan,
        stream_fitslike_tail,
    )
    from pserv_spark.sources.fitslike import read_header_ex
    from pserv_spark.testing import compare_frames

    streamed = stream_fitslike_tail(spark, sf_oracle)
    batch = source_fitslike_scan(spark, sf_oracle)
    res = compare_frames("fitslike_stream_vs_batch", streamed, batch)
    assert res.ok, res.detail
    path = _fitslike_fixture(spark, sf_oracle)
    nrows = read_header_ex(path).nrows
    rows_per_batch = max(1500, -(-nrows // 8))  # the operator's formula
    total = sum(r.n for r in streamed.collect())
    assert total > rows_per_batch  # guarantees >1 batch actually streamed


def test_late_drop_actually_drops(spark, sf_oracle):
    """The first day's late (odd-id) rows must be missing from its
    emitted window, while the head day's late rows are accepted —
    both compared against full batch counts."""
    from pserv_spark.catalog import v_events
    from pserv_spark.streaming import stream_late_drop_audit
    from pyspark.sql import functions as F

    got = {r.day: r.n for r in stream_late_drop_audit(spark, sf_oracle).collect()}
    day = F.floor(F.col("ts_us") / F.lit(86400000000.0)).cast("long")
    full = {
        r.day: (r.n, r.n_odd)
        for r in v_events(spark, sf_oracle)
        .where("event_type = 'purchase'")
        .groupBy(day.alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_id") % 2 == 1).cast("long")).alias("n_odd"),
        )
        .collect()
    }
    lo, hi = min(full), max(full)
    # first day: emitted minus its dropped odd rows
    assert got[lo] == full[lo][0] - full[lo][1]
    assert full[lo][1] > 0, "vacuous: no late rows existed to drop"
    # head day held back entirely (window still open at final watermark)
    assert hi not in got
    # every fully-on-time day emitted with its complete count
    for d in range(lo + 1, hi):
        assert got[d] == full[d][0], d


def test_checkpoint_resume_processes_each_file_once(spark, sf_oracle):
    """Run 2 must resume, not reprocess: the sink shows two distinct
    non-overlapping batch generations whose final state equals batch."""
    import os
    import tempfile
    import hashlib

    from pserv_spark.streaming import stream_checkpoint_resume

    stream_checkpoint_resume(spark, sf_oracle).collect()
    key = hashlib.md5(sf_oracle.encode()).hexdigest()[:8]
    sink = os.path.join(tempfile.gettempdir(), f"pserv_ckpt_sink_{key}")
    slices = spark.read.parquet(sink)
    batch_ids = sorted(r.batch_id for r in slices.select("batch_id").distinct().collect())
    assert len(batch_ids) >= 2  # one commit per run, monotone batch ids
    assert batch_ids == sorted(set(batch_ids))


def test_cdc_apply_drops_all_null_ts_user(spark, tmp_path):
    """ADVICE r6: a user whose EVERY change has a NULL timestamp must be
    absent from the CDC store (no NULL as_of_us row) — the oracle
    excludes NULL-ts events, and the engine now gates the change stream
    on the same canonical ts-IS-NOT-NULL boundary."""
    import shutil

    from pyspark.sql import functions as F

    from pserv_spark import catalog
    from pserv_spark.streaming import stream_cdc_apply

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_cdc_nullts"
    d.mkdir()
    for name in catalog.TABLE_NAMES:
        shutil.copy(f"{src}/{name}.parquet", d / f"{name}.parquet")
    ev = spark.read.parquet(f"{src}/events.parquet")
    victim = ev.groupBy("user_id").count().orderBy("count", "user_id").first().user_id
    ev.withColumn(
        "ts", F.when(F.col("user_id") == victim, None).otherwise(F.col("ts"))
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    catalog._REGISTERED.pop(id(spark), None)
    try:
        store = stream_cdc_apply(spark, str(d))
        rows = store.collect()
        assert all(r.user_id != victim for r in rows), victim
        assert all(r.as_of_us is not None for r in rows)
        # and the store still equals the batch latest-per-key oracle on
        # the surviving (dated) changes
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("ts_us").desc(), F.col("event_id").desc()
        )
        expect = {
            (r.user_id, r.value, r.ts_us)
            for r in catalog.v_events(spark, str(d))
            .withColumn("rn", F.row_number().over(w))
            .where("rn = 1 AND event_type != 'error'")
            .select("user_id", "value", "ts_us")
            .collect()
        }
        assert {(r.user_id, r.value, r.as_of_us) for r in rows} == expect
    finally:
        catalog._REGISTERED.pop(id(spark), None)
