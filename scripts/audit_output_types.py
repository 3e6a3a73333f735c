#!/usr/bin/env python
"""Audit every registry query's OUTPUT types for driver-hash hazards.

Empirically proven (round 2): the driver's value-hash normalizes one
side through a pandas-style conversion, so output cells whose Python
object differs between `collect()` and a pandas frame flip the hash
even when raw values are identical.  Confirmed hazard: DECIMAL output
columns (trailing-zero strings vs float repr) — predicted the driver's
47/3 pass/fail split exactly.  Extrapolated hazards audited here:

  decimal   any Decimal output cell (flag if str != float-repr now,
            but ANY decimal output is a latent hazard — data-dependent)
  date      datetime.date outputs (pandas renders midnight timestamps)
  array     list outputs (numpy array str differs)
  null-int  None inside an integer column (pandas promotes to float64)
  null-ts   None inside a timestamp column (NaT vs None)

Usage: python scripts/audit_output_types.py [sf_dir]
"""
import sys, decimal, datetime, json, traceback
sys.path.insert(0, __file__.rsplit("/", 2)[0])
from pserv_spark.session import get_session
from pserv_spark.registry import build_queries

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_session("audit_output_types")
spark.sparkContext.setLogLevel("ERROR")

report = {}
for name, fn in build_queries().items():
    try:
        df = fn(spark, SF)
        rows = df.collect()
    except Exception as e:
        report[name] = {"err": repr(e)[:200]}
        continue
    flags = {}
    for i, (col, dt) in enumerate(df.dtypes):
        if dt.startswith("decimal"):
            flags.setdefault("decimal", []).append(col)
        if dt == "date":
            flags.setdefault("date", []).append(col)
        if dt.startswith(("array", "struct", "map")):
            flags.setdefault("array", []).append(col)
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, decimal.Decimal) and str(v) != repr(float(v)):
                flags.setdefault("dec_strmismatch", []).append(df.columns[i])
            if v is None:
                dt = df.dtypes[i][1]
                if dt in ("bigint", "int", "smallint", "tinyint"):
                    flags.setdefault("null_int", []).append(df.columns[i])
                if dt.startswith("timestamp"):
                    flags.setdefault("null_ts", []).append(df.columns[i])
    if flags:
        report[name] = {k: sorted(set(v)) for k, v in flags.items()}

print(json.dumps(report, indent=1, sort_keys=True))
print(f"# {len(report)} flagged of {len(build_queries())}", file=sys.stderr)
