"""Column-pruning pins (round 6).

scripts/audit_scan_pruning.py audits ALL 313 plans at round close; these
tests pin the parser and the flagship scan shapes in CI so a projection
regression (a plan change that defeats Catalyst's column pruning and
ships whole rows off the scan) fails the suite, not just the audit.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

_SPEC = importlib.util.spec_from_file_location(
    "audit_scan_pruning",
    Path(__file__).resolve().parent.parent / "scripts" / "audit_scan_pruning.py",
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_scan_block_parser_on_synthetic_plan():
    plan = (
        "(1) Scan parquet \n"
        "Output [3]: [a#1, b#2, c#3]\n"
        "Batched: true\n"
        "Location: InMemoryFileIndex [file:/data/sf/orders.parquet]\n"
        "PushedFilters: [IsNotNull(a)]\n"
        "ReadSchema: struct<a:bigint,b:double,c:string>\n"
        "\n"
        "(2) Scan parquet \n"
        "Output [11]: [x#9, ...]\n"
        "Location: InMemoryFileIndex [file:/data/sf/lineitem.parquet]\n"
        "PushedFilters: []\n"
    )
    blocks = _MOD.scan_blocks(plan)
    assert blocks == [
        {"table": "orders", "n_read": 3, "pushed": True},
        {"table": "lineitem", "n_read": 11, "pushed": False},
    ]


def _formatted(df):
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_flagship_scans_are_column_pruned(spark, sf_oracle):
    """The two heaviest flagship scans must stay narrow: Q1 needs 9 of
    lineitem's 11 columns (with the shipdate filter pushed), and
    scan_project must read only its projection."""
    from pserv_spark.registry import build_queries

    qs = build_queries()
    q1 = [
        s
        for s in _MOD.scan_blocks(_formatted(qs["agg_groupby_q1"](spark, sf_oracle)))
        if s["table"] == "lineitem"
    ]
    assert q1 and all(s["n_read"] <= 9 for s in q1), q1
    assert any(s["pushed"] for s in q1), "shipdate filter not pushed to scan"

    sp = _MOD.scan_blocks(_formatted(qs["scan_project"](spark, sf_oracle)))
    widths = {s["table"]: s["n_read"] for s in sp}
    assert all(n <= 4 for n in widths.values()), widths


def test_full_scan_allowlist_reasons_are_reviewable():
    for name, reason in _MOD.FULL_SCAN_ALLOWED.items():
        assert len(reason) > 20, f"{name}: reason too thin to review"
