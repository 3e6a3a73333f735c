"""Shared DuckDB-dialect SQL fragments for extension-operator oracles.

The oracle side re-derives every deterministic anchor independently
(never from engine output).  DuckDB 1.0 has no ``conv``; hex→int is a
Horner fold over the hex digits, verified equal to Spark's
``conv(substr(md5(w),1,8),16,10)`` by tests/test_extensions.py.
"""

from __future__ import annotations

from ..corpus import _inline_views

#: DuckDB: 32-bit integer from the first 8 hex chars of md5({expr}).
DUCK_HASH32 = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, 8), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5({expr}), i, 1)) - 1 AS BIGINT))), "
    "(a, b) -> a * 16 + b)"
)


def duck_hash32(expr: str) -> str:
    return DUCK_HASH32.format(expr=expr)


def duck_token_shingles(text_expr: str = "text", n: int = 3) -> str:
    """DuckDB: distinct token n-gram shingles of a text expression
    (mirrors ``functions.text.token_shingles``)."""
    ts = f"string_split({text_expr}, ' ')"
    parts = " , ".join(f"({ts})[i + {k}]" for k in range(n))
    joined = (
        f"list_transform(generate_series(1, len({ts}) - {n - 1}), "
        f"i -> concat_ws('_', {parts}))"
    )
    return (
        f"list_distinct(CASE WHEN len({ts}) >= {n} THEN {joined} "
        f"ELSE [array_to_string({ts}, '_')] END)"
    )


def inline_views(sql: str) -> str:
    """Prepend v_events / v_emb CTEs when an oracle references them."""
    return _inline_views(sql)
