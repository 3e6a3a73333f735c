"""Vector primitives over ``array<double>`` embedding columns.

All pure built-in higher-order functions (``zip_with`` + ``aggregate``)
— JVM-side, no Python boundary, identical left-to-right fold order to
DuckDB's ``list_dot_product`` (equality validated by the corpus query
``vec_cosine_pairs``, SURVEY §2.2 [E]).

Inputs must already be DOUBLE arrays (catalog view ``v_emb`` casts
float32 → double before any arithmetic — SURVEY §4.5 rule 5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
