"""DataFrame-API re-expressions of the corpus queries.

Each module exposes a ``QUERIES: dict[str, QueryFn]`` whose keys are
corpus ids.  Every entry is differentially tested against the validated
SQL form (tests/test_dataframe_parity.py) before it is allowed to
override the SQL fallback in the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

DATAFRAME_QUERIES: dict[str, QueryFn] = {}


def _register(module_queries: dict[str, QueryFn]) -> None:
    for name, fn in module_queries.items():
        if name in DATAFRAME_QUERIES:
            raise ValueError(f"duplicate DataFrame impl for {name!r}")
        DATAFRAME_QUERIES[name] = fn


def _load() -> None:
    from . import scans, joins, aggregates, windows, setops, scalar_fns, textvec, events

    for mod in (scans, joins, aggregates, windows, setops, scalar_fns, textvec, events):
        _register(getattr(mod, "QUERIES", {}))


_load()
