"""Zone-bucketed spatial crossmatch — the Qserv-chunking scale path.

Qserv answers near-neighbor self-joins inside overlapping sky chunks
(Wang et al., SC'11; SURVEY §4.3).  The Spark-native equivalent: assign
each point a ``(zx, zy) = (floor(x/ε), floor(y/ε))`` zone, explode one
join side into its 3×3 neighbor cells, and equi-join on the cell id —
turning the O(N²) broadcast-nested-loop theta join of the naive
``vec_crossmatch`` into a shuffle-bounded equi-join, followed by the
exact distance residual.

Correctness invariant (property-tested): any pair with distance < ε has
zone deltas ≤ 1 in each axis, so the neighbor-cell join loses nothing;
each surviving pair appears exactly once because the left side keeps
its own single cell.  The DuckDB oracle is the *naive* all-pairs
formulation — the zoned plan must reproduce it exactly.

At 100 TB this is the layout to bake into storage:
``write.partitionBy(zone)`` parquet + zone-predicate pruning, giving
Qserv-style chunked scans for cone searches and crossmatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..corpus import ORACLE_SQL

EPS = 0.01


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.v_emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        F.element_at("emb", 1).alias("x"),
        F.element_at("emb", 2).alias("y"),
    )


def vec_crossmatch_zoned(spark: SparkSession, sf_dir: str, eps: float = EPS) -> DataFrame:
    """Pairs with euclidean distance < ``eps`` via neighbor-cell join."""
    pts = _points(spark, sf_dir).withColumns(
        {
            "zx": F.floor(F.col("x") / eps),
            "zy": F.floor(F.col("y") / eps),
        }
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    right = pts.select(
        F.col("vec_id").alias("id2"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("zx") + dx).alias("cx"), (F.col("zy") + dy).alias("cy")
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("cell"),
    ).select("id2", "x2", "y2", "cell.cx", "cell.cy")

    dist = F.sqrt(
        F.pow(F.col("x") - F.col("x2"), 2) + F.pow(F.col("y") - F.col("y2"), 2)
    )
    return (
        pts.join(
            right.hint("merge"),
            (F.col("zx") == F.col("cx"))
            & (F.col("zy") == F.col("cy"))
            & (F.col("vec_id") < F.col("id2")),
        )
        .where(dist < eps)
        .select(
            F.col("vec_id").alias("id1"),
            "id2",
            F.round(dist, 6).alias("dist"),
        )
    )


QUERIES = {"vec_crossmatch_zoned": vec_crossmatch_zoned}

#: Oracle: the naive all-pairs crossmatch (already view-inlined) — the
#: zoned plan must return the identical pair set.
ORACLES = {"vec_crossmatch_zoned": ORACLE_SQL["vec_crossmatch"]}
