#!/usr/bin/env python
"""Crash-consistency audit for the manifest-snapshot layout family.

VERDICT r7 next-round #6: `layout_snapshot_timetravel` /
`layout_compact_smallfiles` / `layout_vacuum_orphans`
(pserv_spark/operators/pipeline_ops.py) claim Iceberg-style semantics
on plain parquet — a snapshot IS its manifest's file list, appends
commit a new manifest, vacuum deletes unreferenced files.  The one
failure mode that design must survive is a WRITER KILLED MID-JOB, and
until now the only planted debris was the happy-path case (one
complete-but-uncommitted file).  This audit kills the writer in every
distinct phase and checks the reader+vacuum contract against each
corpse:

- d1 `orphan_committed_quality`: a complete, valid parquet file next
  to the committed ones, absent from every manifest (crash BETWEEN
  data write and manifest commit).
- d2 `torn_parquet`: a committed file's bytes truncated to 60% under
  a fresh name (crash DURING a data write — not even a valid footer).
- d3 `hidden_task_temp`: a `.part-*.snappy.parquet` hidden temp (a
  speculative task's leftover rename source).
- d4 `spark_temporary_dir`: a `_temporary/0/task.../part-*.parquet`
  tree (crash before Spark's commit-protocol rename).
- d5 `torn_manifest_staging`: half of a manifest JSON under
  `_v2.json.tmp.<pid>` (crash DURING a manifest publish — the
  staging+rename discipline means the live `_v2.json` is never torn).

Checked contracts (each a scenario row in CRASHCONSISTENCY.json):

1. `snapshot_reads_unaffected`: as-of v1/v2 reads (rows + exact cents
   + users) are byte-identical before and after all five plants.
2. `naive_reader_diverges`: a plain directory read of `data/` does NOT
   silently return the committed answer (it either fails on the torn
   file or counts the orphan) — the measured reason the manifest is
   the contract, not the directory listing.
3. `vacuum_removes_exactly_debris`: `vacuum_data_dir` unlinks exactly
   {d1, d2, d3} — every unreferenced top-level `*.parquet`, and
   nothing else: all manifest-listed files survive (checksummed), the
   manifests and the torn staging file survive (manifest hygiene is
   the publisher's job), `_temporary/` survives (the commit
   protocol's own domain).
4. `post_vacuum_reads_identical`: as-of reads after vacuum still match
   the pre-debris answers.
5. `publish_recovery_resumes`: a fixture directory left WITHOUT its
   completeness sentinel (crash mid-`publish_dir`) is detected as
   debris and replaced by the next builder's publish, while a
   sentinel-complete directory wins over a late publisher.

Round 9 (VERDICT r8 #7) adds the STREAMING-SINK replay scenarios
(`sink_replay_*`): each foreachBatch sink op (CDC merge, rollup
upsert, top-k publish, JDBC serving) is killed via an injected fault
either between sink publish and checkpoint commit ("after_publish" —
the batch replays on restart, so double-apply must converge: the
exactly-once-by-idempotence claim) or before the publish
("before_publish" — replay must fill the hole), then restarted from
the SAME checkpoint; the served result must equal the uninterrupted
run's rows exactly.  Hooks: pserv_spark.streaming.jobs.SINK_FAULT /
SINK_CHECKPOINT_DIR (production calls leave both None).

Usage: python scripts/audit_crash_consistency.py [sf_dir]
Writes CRASHCONSISTENCY.json (atomic rename); exit 1 on any failed
scenario.  Includes stream_jdbc_sink — never run concurrently with
other Derby work (driver_sim / plan_lint / pytest).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _md5(path: str) -> str:
    with open(path, "rb") as fh:
        return hashlib.md5(fh.read()).hexdigest()


def build_fixture(spark, sf_dir: str, scratch: str) -> dict:
    """Write the two-version purchase snapshot (same shape as
    layout_snapshot_timetravel) into ``scratch`` and return its
    manifest paths + pre-debris as-of answers."""
    from pyspark.sql import functions as F

    from pserv_spark import catalog
    from pserv_spark.operators.pipeline_ops import _TT_US_PER_DAY

    ev = catalog.v_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    day = F.floor(F.col("ts_us") / F.lit(float(_TT_US_PER_DAY))).cast("long")
    b = ev.agg(F.min(day).alias("lo"), F.max(day).alias("hi")).collect()[0]
    lo = b.lo if b.lo is not None else 0
    hi = b.hi if b.hi is not None else 0
    mid = lo + (hi - lo) // 2

    data = os.path.join(scratch, "data")
    ev.where(day < mid).write.parquet(data)
    v1 = sorted(f for f in os.listdir(data) if f.endswith(".parquet"))
    ev.where(day >= mid).write.mode("append").parquet(data)
    v2 = sorted(f for f in os.listdir(data) if f.endswith(".parquet"))
    m1p, m2p = os.path.join(scratch, "_v1.json"), os.path.join(scratch, "_v2.json")
    with open(m1p, "w") as fh:
        json.dump(v1, fh)
    with open(m2p, "w") as fh:
        json.dump(v2, fh)
    return {
        "data": data,
        "m1p": m1p,
        "m2p": m2p,
        "schema": ev.schema,
        "answers": {
            "v1": read_as_of(spark, data, m1p, None),
            "v2": read_as_of(spark, data, m2p, None),
        },
    }


def read_as_of(spark, data: str, manifest: str, schema) -> dict:
    """The manifest-scan readout: exact rows / cents / users."""
    from pyspark.sql import functions as F

    with open(manifest) as fh:
        files = [os.path.join(data, f) for f in json.load(fh)]
    snap = spark.read.parquet(*files)
    row = snap.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    ).collect()[0]
    return {"n_rows": row.n_rows, "cents": row.cents, "n_users": row.n_users}


def plant_debris(spark, sf_dir: str, fx: dict) -> dict:
    """Kill the writer in every phase: plant all five debris classes."""
    from pyspark.sql import functions as F

    from pserv_spark import catalog

    data = fx["data"]
    committed = sorted(f for f in os.listdir(data) if f.endswith(".parquet"))

    # d1: complete-but-uncommitted orphan (valid parquet, no manifest)
    ev = catalog.v_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    stage = os.path.join(os.path.dirname(data), "_orphan_stage")
    ev.limit(100).coalesce(1).write.parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    d1 = os.path.join(data, "part-orphan-uncommitted.snappy.parquet")
    shutil.move(os.path.join(stage, part), d1)
    shutil.rmtree(stage)

    # d2: torn parquet — first 60% of a committed file's bytes
    src_bytes = open(os.path.join(data, committed[0]), "rb").read()
    d2 = os.path.join(data, "part-torn-halfwrite.snappy.parquet")
    with open(d2, "wb") as fh:
        fh.write(src_bytes[: max(8, int(len(src_bytes) * 0.6))])

    # d3: hidden task temporary
    d3 = os.path.join(data, ".part-speculative.snappy.parquet.crc-less")
    shutil.copy(os.path.join(data, committed[0]), d3)
    d3b = os.path.join(data, ".part-speculative.snappy.parquet")
    shutil.copy(os.path.join(data, committed[0]), d3b)

    # d4: the Spark commit protocol's _temporary tree
    tdir = os.path.join(data, "_temporary", "0", "task_000", "")
    os.makedirs(tdir, exist_ok=True)
    shutil.copy(
        os.path.join(data, committed[0]),
        os.path.join(tdir, "part-in-flight.snappy.parquet"),
    )

    # d5: torn manifest staging (live _v2.json untouched by design)
    txt = open(fx["m2p"]).read()
    d5 = fx["m2p"] + ".tmp.12345"
    with open(d5, "w") as fh:
        fh.write(txt[: len(txt) // 2])

    return {
        "committed": committed,
        "committed_md5": {f: _md5(os.path.join(data, f)) for f in committed},
        "d1": d1,
        "d2": d2,
        "d3_crc_less": d3,
        "d3_hidden": d3b,
        "d4_temp_dir": os.path.join(data, "_temporary"),
        "d5_staging": d5,
    }


def run_scenarios(spark, sf_dir: str, scratch: str) -> dict:
    from pserv_spark.fixtures import publish_dir
    from pserv_spark.operators.pipeline_ops import vacuum_data_dir

    fx = build_fixture(spark, sf_dir, scratch)
    debris = plant_debris(spark, sf_dir, fx)
    data, m1p, m2p = fx["data"], fx["m1p"], fx["m2p"]
    out: dict[str, dict] = {}

    # 1. manifest reads see none of the five corpses
    after = {
        "v1": read_as_of(spark, data, m1p, None),
        "v2": read_as_of(spark, data, m2p, None),
    }
    out["snapshot_reads_unaffected"] = {
        "ok": after == fx["answers"],
        "pre": fx["answers"],
        "post": after,
    }

    # 2. the naive directory reader must NOT silently give the
    # committed answer (torn file -> error, or orphan rows counted)
    try:
        n_naive = spark.read.parquet(data).count()
        naive = {"outcome": f"read {n_naive} rows", "silent_match": n_naive == fx["answers"]["v2"]["n_rows"]}
    except Exception as e:  # noqa: BLE001
        naive = {"outcome": f"raised {type(e).__name__}", "silent_match": False}
    out["naive_reader_diverges"] = {"ok": not naive["silent_match"], **naive}

    # 3. vacuum unlinks exactly the unreferenced top-level *.parquet
    audit = vacuum_data_dir(data, [m1p, m2p])
    removed = {os.path.basename(p) for p in audit["orphans"]}
    expect = {
        os.path.basename(debris["d1"]),
        os.path.basename(debris["d2"]),
        os.path.basename(debris["d3_hidden"]),
    }
    survivors_ok = (
        all(
            _md5(os.path.join(data, f)) == h
            for f, h in debris["committed_md5"].items()
        )
        and os.path.exists(m1p)
        and os.path.exists(m2p)
        and os.path.exists(debris["d5_staging"])
        and os.path.isdir(debris["d4_temp_dir"])
        # ADVICE r8: the non-*.parquet hidden temp (.crc-less suffix)
        # must also survive — "removes exactly the debris" both ways.
        and os.path.exists(debris["d3_crc_less"])
    )
    out["vacuum_removes_exactly_debris"] = {
        "ok": removed == expect and survivors_ok,
        "removed": sorted(removed),
        "expected": sorted(expect),
        "survivors_intact": survivors_ok,
    }

    # 4. reads after vacuum still match the pre-debris answers
    post = {
        "v1": read_as_of(spark, data, m1p, None),
        "v2": read_as_of(spark, data, m2p, None),
    }
    out["post_vacuum_reads_identical"] = {"ok": post == fx["answers"]}

    # 5. publish_dir treats a sentinel-less final dir as debris and a
    # sentinel-complete one as a peer's finished artifact
    base = tempfile.mkdtemp(prefix="pserv_crash_publish_")
    final = os.path.join(base, "final")
    os.makedirs(final)
    open(os.path.join(final, "partial.bin"), "w").write("crashed")
    staging = os.path.join(base, "staging")
    os.makedirs(staging)
    open(os.path.join(staging, "_DONE"), "w").write("ok")
    open(os.path.join(staging, "payload.bin"), "w").write("good")
    publish_dir(staging, final, sentinel="_DONE")
    recovered = os.path.exists(os.path.join(final, "payload.bin")) and not os.path.exists(
        os.path.join(final, "partial.bin")
    )
    staging2 = os.path.join(base, "staging2")
    os.makedirs(staging2)
    open(os.path.join(staging2, "_DONE"), "w").write("ok")
    open(os.path.join(staging2, "payload2.bin"), "w").write("late")
    publish_dir(staging2, final, sentinel="_DONE")
    peer_respected = os.path.exists(
        os.path.join(final, "payload.bin")
    ) and not os.path.exists(os.path.join(final, "payload2.bin"))
    shutil.rmtree(base, ignore_errors=True)
    out["publish_recovery_resumes"] = {
        "ok": recovered and peer_respected,
        "sentinel_less_dir_replaced": recovered,
        "complete_peer_respected": peer_respected,
    }
    return out


#: (op, phase, micro-batch index) — kill points for the foreachBatch
#: sink replay scenarios (VERDICT r8 #7).  Phases bracket the sink
#: publish: "after_publish" = driver died between publish and the
#: checkpoint commit (the batch is REPLAYED on restart — double-apply
#: must converge, the idempotence claim); "before_publish" = driver
#: died after the checkpoint recorded the offsets but before the sink
#: saw the batch (replay must fill the hole).  stream_cdc_apply gets
#: both phases at a MID-RUN batch (its 4-file staging yields 4 real
#: incremental merges); the complete-mode sinks re-derive their whole
#: store each batch, so batch 0 is their only batch.
SINK_SCENARIOS: list[tuple[str, str, int]] = [
    ("stream_cdc_apply", "after_publish", 1),
    ("stream_cdc_apply", "before_publish", 2),
    ("stream_rollup_upsert", "after_publish", 0),
    ("stream_topk_maintain", "before_publish", 0),
    ("stream_jdbc_sink", "after_publish", 0),
]


def run_stream_sink_scenarios(spark, sf_dir: str) -> dict:
    """Kill each foreachBatch sink mid-run, restart from the same
    checkpoint, and demand the served result converge to the clean
    run's rows (exact multiset)."""
    from pserv_spark.registry import build_queries
    from pserv_spark.streaming import jobs as stream_jobs

    queries = build_queries()
    out: dict[str, dict] = {}
    clean_rows: dict[str, list] = {}
    for op, phase, batch in SINK_SCENARIOS:
        key = f"sink_replay_{op.removeprefix('stream_')}_{phase}_b{batch}"
        ckpt = None
        try:
            if op not in clean_rows:  # uninterrupted reference run
                clean_rows[op] = sorted(
                    map(tuple, queries[op](spark, sf_dir).collect())
                )
            ckpt = tempfile.mkdtemp(prefix=f"pserv_sink_ckpt_{op}_")
            shutil.rmtree(
                stream_jobs.sink_store_path(op, sf_dir), ignore_errors=True
            )
            stream_jobs.SINK_CHECKPOINT_DIR = ckpt
            stream_jobs.SINK_FAULT = {"op": op, "phase": phase, "batch": batch}
            crashed = False
            try:
                queries[op](spark, sf_dir).collect()
            except Exception as e:  # noqa: BLE001 — the planted crash
                # PySpark's StreamingQueryException repr() is empty;
                # the injected fault's Python traceback is embedded in
                # the message/desc chain.
                detail = " ".join(
                    str(x) for x in (e, getattr(e, "desc", ""), e.args)
                )
                crashed = "InjectedSinkFault" in detail
                if not crashed:
                    raise
            # restart: same checkpoint, fault cleared — Structured
            # Streaming replays every batch the crash left uncommitted
            stream_jobs.SINK_FAULT = None
            replayed = sorted(map(tuple, queries[op](spark, sf_dir).collect()))
            out[key] = {
                "ok": crashed and replayed == clean_rows[op],
                "crash_injected": crashed,
                "rows_clean": len(clean_rows[op]),
                "rows_after_replay": len(replayed),
                "converged": replayed == clean_rows[op],
            }
        except Exception as e:  # noqa: BLE001
            out[key] = {"ok": False, "err": repr(e)[:200]}
        finally:
            stream_jobs.SINK_FAULT = None
            stream_jobs.SINK_CHECKPOINT_DIR = None
            if ckpt is not None:
                shutil.rmtree(ckpt, ignore_errors=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pserv_spark.session import get_session

    spark = get_session("audit_crash_consistency")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    scratch = tempfile.mkdtemp(prefix="pserv_crash_tier_")
    try:
        scenarios = run_scenarios(spark, sf_dir, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    scenarios.update(run_stream_sink_scenarios(spark, sf_dir))
    failures = [k for k, v in scenarios.items() if not v["ok"]]
    report = {
        "sf_dir": sf_dir,
        "n_scenarios": len(scenarios),
        "n_ok": len(scenarios) - len(failures),
        "failures": failures,
        "elapsed_s": round(time.time() - t0, 1),
        "scenarios": scenarios,
    }
    target = REPO / "CRASHCONSISTENCY.json"
    tmp_path = target.with_suffix(".json.tmp")
    tmp_path.write_text(json.dumps(report, indent=1))
    os.replace(tmp_path, target)
    print(json.dumps({k: report[k] for k in ("n_scenarios", "n_ok", "failures")}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
