"""Scale-path / extension operators (dedup, ANN, text analysis, zones).

Each module contributes ``QUERIES`` (name -> (spark, sf_dir) -> DataFrame)
and optionally ``ORACLES`` (name -> DuckDB SQL) for the driver's
correctness gate.
"""

from __future__ import annotations

EXTENSION_QUERIES: dict = {}
EXTENSION_ORACLES: dict = {}


def _load() -> None:
    import importlib

    for modname in (
        "dedup",
        "similarity",
        "textanalysis",
        "zonematch",
        "multimodal",
        "udfs",
        "streamops",
        "ingest_ops",
        "jdbc_ops",
        "extras",
        "sampling",
        "bucketing",
        "relational_ext",
        "tpch_shapes",
        "tpch_full",
        "pipeline_ops",
        "astro_sph",
        "quality_ops",
        "profiling_ops",
        "iterative",
        "rollup",
        "sketches",
        "timedomain",
        "lifecycle_ops",
        "search_ops",
        "tokenize_ops",
        "survival_ops",
        "interval_ops",
        "ml_ops",
    ):
        # Import errors must be LOUD: a silently-skipped module shrinks
        # the registry and the driver would simply test fewer queries.
        try:
            mod = importlib.import_module(f".{modname}", __package__)
        except ImportError as e:
            raise ImportError(
                f"extension module {modname!r} failed to import — "
                f"registry surface would silently shrink: {e}"
            ) from e
        EXTENSION_QUERIES.update(getattr(mod, "QUERIES", {}))
        EXTENSION_ORACLES.update(getattr(mod, "ORACLES", {}))


_load()
