"""Deterministic astronomy-shaped fixtures (FIXTURES.md Part 2a/2b).

Synthesizes the reference's three core tables at their declared shapes
(SURVEY §1.1: Object / CcdVisit / ForcedSource — the deep-coadd catalog,
the exposure dimension, and the forced-photometry fact table) plus the
raw-CSV ingestion fixture, all from ``numpy.default_rng(42)`` so every
run regenerates byte-identical data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
N_OBJECT = 15_000  # 10 × customer rows at sf0.01 (FIXTURES Part 2a)
N_VISIT = 200
EPOCHS_PER_OBJECT = 50
FILTERS = ["u", "g", "r", "i", "z", "y"]


def make_object() -> pd.DataFrame:
    rng = np.random.default_rng(SEED)
    return pd.DataFrame(
        {
            "object_id": np.arange(N_OBJECT, dtype=np.int64),
            "ra": rng.uniform(0.0, 360.0, N_OBJECT),
            "decl": rng.uniform(-90.0, 90.0, N_OBJECT),
            "mag_ref": rng.uniform(18.0, 26.0, N_OBJECT),
        }
    )


def make_ccd_visit() -> pd.DataFrame:
    rng = np.random.default_rng(SEED + 1)
    start = pd.Timestamp("2024-01-01 00:00:00")
    return pd.DataFrame(
        {
            "ccd_visit_id": np.arange(N_VISIT, dtype=np.int64),
            "obs_start": [start + pd.Timedelta(minutes=5 * i) for i in range(N_VISIT)],
            "filter": [FILTERS[i % len(FILTERS)] for i in range(N_VISIT)],
            "zero_point": rng.uniform(29.0, 32.0, N_VISIT),
            "seeing": rng.uniform(0.5, 1.5, N_VISIT),
        }
    )


def make_forced_source(objects: pd.DataFrame) -> pd.DataFrame:
    """50 epochs per object over distinct visits — composite PK
    (object_id, ccd_visit_id); ~1% flagged, ~0.5% masked (NULL flux)."""
    rng = np.random.default_rng(SEED + 2)
    n = N_OBJECT * EPOCHS_PER_OBJECT
    visit_ids = np.concatenate(
        [
            rng.choice(N_VISIT, EPOCHS_PER_OBJECT, replace=False)
            for _ in range(N_OBJECT)
        ]
    ).astype(np.int64)
    object_ids = np.repeat(objects["object_id"].to_numpy(), EPOCHS_PER_OBJECT)
    base_flux = 10.0 ** (
        -0.4 * (np.repeat(objects["mag_ref"].to_numpy(), EPOCHS_PER_OBJECT) - 25.0)
    )
    ps_flux = base_flux * rng.lognormal(0.0, 0.1, n)
    ps_flux[rng.random(n) < 0.005] = np.nan  # masked measurements
    flags = np.where(rng.random(n) < 0.01, rng.integers(1, 8, n), 0).astype(np.int32)
    return pd.DataFrame(
        {
            "object_id": object_ids,
            "ccd_visit_id": visit_ids,
            "ps_flux": ps_flux,
            "ps_flux_sigma": np.abs(rng.normal(0.0, 0.05, n)) + 1e-6,
            "flags": flags,
        }
    )


def write_astro_tables(dirpath: str) -> dict[str, str]:
    """Write the three tables as parquet; returns name → path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    objects = make_object()
    out = {}
    for name, pdf in (
        ("object", objects),
        ("ccd_visit", make_ccd_visit()),
        ("forced_source", make_forced_source(objects)),
    ):
        path = f"{dirpath}/{name}.parquet"
        # µs timestamps: Spark 4 has no native TIMESTAMP(NANOS) reader,
        # and the driver's own tables are timestamp[us].
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            path,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        out[name] = path
    return out


def make_raw_sources_csv(path: str, n: int = 1000) -> None:
    """FIXTURES Part 2b: the reference's CSV loading contract —
    ``\\N`` nulls, NaN counts (~1%), source column names needing maps."""
    rng = np.random.default_rng(SEED + 3)
    flux = rng.lognormal(5.0, 1.0, n)
    flux[rng.random(n) < 0.01] = np.nan
    rows = ["id,coord_ra,coord_decl,base_PsfFlux_instFlux,base_PsfFlux_instFluxErr,visit,zero_point"]
    for i in range(n):
        fx = "NaN" if np.isnan(flux[i]) else f"{flux[i]!r}"
        err = f"{abs(rng.normal(0.0, 0.1)) + 1e-6!r}"
        # ~2% rows carry a \N (unmeasured error column)
        if rng.random() < 0.02:
            err = r"\N"
        rows.append(
            f"{i},{rng.uniform(0, 360)!r},{rng.uniform(-90, 90)!r},{fx},{err},"
            f"{int(rng.integers(0, 200))},{rng.uniform(29, 32)!r}"
        )
    with open(path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
