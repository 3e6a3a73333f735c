"""bench.py output contract.

The external driver runs ``python bench.py`` each round and parses the
single JSON line into ``BENCH_r{N}.json`` — a malformed line means the
round records no bench at all.  This pins the schema (including the
round-5 ``loadavg`` field) on a 1-query run at the smoke tier, so a
bench.py edit that breaks the contract fails here in seconds instead
of at driver time.
"""

from __future__ import annotations

import json
import io
import contextlib

import bench


def test_bench_json_line_schema(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "FLAGSHIP", ["scan_project"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, "bench must print exactly ONE line on stdout"
    out = json.loads(lines[0])
    assert out["metric"] == "flagship_suite_total"
    assert out["unit"] == "sec"
    assert isinstance(out["value"], (int, float)) and out["value"] > 0
    assert out["sf"] == 0.001
    assert set(out["queries"]) == {"scan_project"}
    assert all(isinstance(v, (int, float)) for v in out["queries"].values())
    assert out["value"] == round(sum(out["queries"].values()), 4)
    load = out["loadavg"]
    assert load is None or (
        len(load) == 3 and all(isinstance(x, (int, float)) for x in load)
    )
