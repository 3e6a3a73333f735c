#!/usr/bin/env python
"""Hostile-string robustness sweep — unicode / metacharacter injection.

The synthetic documents corpus is pure ``[a-z ]`` words and the events
``props`` JSON is ``{"k": <int>}``: every regex, tokenizer, shingle,
JSON-path, and string-length expression in the repo has therefore only
ever seen 7-bit-clean input.  A 100 TB web crawl is the opposite —
CJK and emoji (multi-byte codepoints), combining accents, RTL marks,
zero-width joiners, regex metacharacters inside the DATA, embedded
quotes/backslashes/newlines/tabs, NBSP whitespace, kilobyte-long
unbroken tokens, and empty strings.  Engine/oracle semantics can
genuinely diverge on such input (Java regex vs DuckDB's RE2, codepoint
vs byte lengths, unicode case folding), and no standing tier would
ever show it.

This audit builds a mirror tier with deterministic hostile injections,
then runs EVERY registered id against it with the same DuckDB oracle
on the same files:

- documents.text: doc_id % 11 picks one of ten payload classes,
  appended to (or for some classes replacing) the original text —
  unicode word salad, regex metas, quoting/backslash soup, embedded
  newlines/tabs, NBSP/ZWJ whitespace, a 1-kB unbroken token, an empty
  string, leading/trailing spaces.  doc_id % 11 == 10 keeps the
  original text untouched (the control group).  n_chars is kept
  consistent (codepoint length, both engines' ``length()``).
- events.props: event_id % 13 == 0 gets a VALID JSON object whose
  string value contains unicode + escaped quotes/backslashes — JSON
  path extraction must agree on escape handling.

Ids that raise, or disagree with the oracle, fail unless allowlisted
with a written reason.  Writes HOSTILETEXT.json; exit 1 on unexplained
failures.

Usage: python scripts/audit_hostile_text.py [schema_sf_dir]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: The payload classes.  Index = doc_id % 11; class 10 = untouched.
PAYLOADS: list[str] = [
    # 0: multi-byte unicode word salad (CJK, emoji, Cyrillic, Greek)
    "数据 处理 管道 🚀 данные ποσότητα 株式会社 ♥ 🇫🇷",
    # 1: combining accents + precomposed forms (NFC vs NFD material)
    "café café naïve naïve Ångström Ångström",
    # 2: regex metacharacters as literal data
    r".*+?[a-z]{2,}(foo|bar)^$\d \\w [[:alpha:]] (?!x) \1",
    # 3: quote and backslash soup
    "it's \"quoted\" and \\escaped\\ and `backticked` and 'single'",
    # 4: embedded newlines and tabs
    "line one\nline two\r\nline three\ttabbed\tcells",
    # 5: exotic whitespace: NBSP, thin space, ZWJ, ZWNJ, BOM, RTL mark
    "a b c‍d‌e﻿f‏g",
    # 6: one kilobyte-long unbroken token (tokenizer stress)
    "x" * 1024,
    # 7: SQL-looking content (must stay inert data)
    "'; DROP TABLE documents; -- OR 1=1 UNION SELECT NULL",
    # 8: leading/trailing runs of spaces around a single word
    "   padded   ",
    # 9: empty string
    "",
]

#: id -> why a divergence under hostile strings is accepted, evidence.
HOSTILE_ALLOWED: dict[str, str] = {}


def build_hostile_tier(schema_sf_dir: str, dst: str) -> dict[str, int]:
    """Write single-file parquet mirrors with hostile strings injected;
    returns per-table changed-cell counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    changed: dict[str, int] = {}
    for t in TABLES:
        tbl = pq.read_table(f"{schema_sf_dir}/{t}.parquet")
        cols = {f.name: tbl.column(f.name) for f in tbl.schema}
        n_chg = 0
        if t == "documents":
            ids = cols["doc_id"].to_pylist()
            txt = cols["text"].to_pylist()
            new = []
            for i, v in zip(ids, txt):
                k = i % 11
                if v is None or k == 10:
                    new.append(v)
                elif k in (6, 8, 9):  # whole-value classes
                    new.append(PAYLOADS[k])
                else:
                    new.append(v + " " + PAYLOADS[k])
            n_chg = sum(1 for a, b in zip(txt, new) if a != b)
            cols["text"] = pa.array(new, type=tbl.schema.field("text").type)
            cols["n_chars"] = pa.array(
                [None if v is None else len(v) for v in new],
                type=tbl.schema.field("n_chars").type,
            )
        elif t == "events":
            ids = cols["event_id"].to_pylist()
            props = cols["props"].to_pylist()

            # ADVICE r8 #3: rotate hostile 'k' payloads through the
            # number representations where naive string->int casts
            # diverge between the engines (DuckDB rounds '5.7'->6,
            # Spark try_cast NULLs it): bare fractional, quoted
            # fractional, trailing-zero float, exponent, boolean.
            # fn_map_props' floor-through-double normalization must
            # hold for all of them.
            def _hostile_props(i: int) -> str:
                k_variants = [i % 100, 5.7, "5.7", 5.0, 1e2, True]
                body = json.dumps(
                    {"k": k_variants[(i // 13) % len(k_variants)],
                     "s": 'uni ✓ "q" \\b\\ ' + "日本語"}
                )
                # json.dumps renders 1e2 as 100.0 — rewrite one class
                # to a literal exponent token to exercise the parser.
                if (i // 13) % len(k_variants) == 4:
                    body = body.replace('"k": 100.0', '"k": 1e2')
                return body

            new = [
                _hostile_props(i) if (v is not None and i % 13 == 0) else v
                for i, v in zip(ids, props)
            ]
            n_chg = sum(1 for a, b in zip(props, new) if a != b)
            cols["props"] = pa.array(new, type=tbl.schema.field("props").type)
        out = pa.table(cols, schema=tbl.schema)
        pq.write_table(out, f"{dst}/{t}.parquet")
        changed[t] = n_chg
    return changed


def main() -> int:
    schema_sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pserv_spark.registry import build_oracles, build_queries
    from pserv_spark.session import get_session
    from pserv_spark.testing import compare_df_to_duckdb

    spark = get_session("audit_hostile_text")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = build_queries(), build_oracles()

    tmp = tempfile.mkdtemp(prefix="pserv_hostile_tier_")
    changed = build_hostile_tier(schema_sf_dir, tmp)

    report: dict[str, dict] = {}
    failures: list[str] = []
    t0 = time.time()
    for name, fn in queries.items():
        t = time.time()
        try:
            df = fn(spark, tmp)
            if name in oracles:
                res = compare_df_to_duckdb(name, df, oracles[name], tmp)
                ok, rows, detail = res.ok, res.spark_rows, res.detail
            else:
                rows, detail = df.count(), "rows-only"
                ok = True
        except Exception as e:  # noqa: BLE001
            ok, rows = False, None
            detail = f"EXCEPTION {type(e).__name__}: {e}"[:200]
        entry: dict = {"ok": ok, "rows": rows}
        if not ok:
            if name in HOSTILE_ALLOWED:
                entry["allowed"] = HOSTILE_ALLOWED[name]
            else:
                failures.append(name)
                entry["detail"] = detail
        report[name] = entry
        status = "ok " if ok else ("ALLOW" if name in HOSTILE_ALLOWED else "FAIL")
        print(f"{status:5s} {name:28s} rows={rows!s:8s} {time.time() - t:.2f}s", flush=True)

    out = {
        "schema_sf_dir": schema_sf_dir,
        "changed_cells": changed,
        "n_ids": len(queries),
        "n_ok": sum(1 for v in report.values() if v["ok"]),
        "n_allowed": sum(1 for v in report.values() if "allowed" in v),
        "failures": failures,
        "elapsed_s": round(time.time() - t0, 1),
        "ids": report,
    }
    with open(REPO / "HOSTILETEXT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("n_ids", "n_ok", "n_allowed", "failures")}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
