"""Zoned storage layout — Qserv sky-chunking at rest (SURVEY §4.3).

Qserv partitions the catalog into sky chunks so spatial predicates
touch only the chunks they overlap (Wang et al., SC'11).  The
Spark-native equivalent is a zone column baked into the *storage
layout*: ``write.partitionBy(zx)`` parquet, so zone predicates become
partition-directory pruning — zero I/O for non-overlapping zones,
visible as ``PartitionFilters`` in the scan.

``ZoneStore`` manages that layout for a 2-D point table:

- :meth:`write` — assign ``zx = floor(x / zone_height)`` and persist
  partitioned parquet.  One-dimensional zoning keeps the directory
  count bounded (a 2-D grid explodes small files — the classic
  many-partitions trap); the second coordinate is pruned by row-group
  statistics instead.
- :meth:`cone_search` — Qserv ``scisql_s2PtInCircle`` analog: prune to
  the zone range overlapping the circle, then apply the exact
  distance residual.
- :meth:`crossmatch` — near-neighbor self-join inside neighboring
  zones (equi-join on zone id + distance residual), reading the zoned
  layout.

At 100 TB the same layout serves both: cone searches read O(r/h)
partitions; crossmatches shuffle at most by zone id, never all-pairs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ZoneStore:
    def __init__(self, path: str, zone_height: float):
        self.path = path
        self.zone_height = zone_height

    def write(self, points: DataFrame) -> None:
        """Persist ``(id, x, y)`` points partitioned by zone."""
        zoned = points.withColumn(
            "zx", F.floor(F.col("x") / self.zone_height).cast("long")
        )
        zoned.write.mode("overwrite").partitionBy("zx").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def cone_search(
        self, spark: SparkSession, cx: float, cy: float, radius: float
    ) -> DataFrame:
        """All points within ``radius`` of ``(cx, cy)`` — zone-pruned."""
        lo = math.floor((cx - radius) / self.zone_height)
        hi = math.floor((cx + radius) / self.zone_height)
        pts = self.read(spark).where(F.col("zx").between(lo, hi))
        dist = F.sqrt(F.pow(F.col("x") - cx, 2) + F.pow(F.col("y") - cy, 2))
        return pts.where(dist < radius).select(
            "id", F.round(dist, 6).alias("dist")
        )

    def crossmatch(self, spark: SparkSession, eps: float) -> DataFrame:
        """Pairs within ``eps`` via neighbor-zone equi-join over the
        stored layout (zone-delta ≤ ceil(eps/zone_height))."""
        reach = math.ceil(eps / self.zone_height)
        pts = self.read(spark)
        right = pts.select(
            F.col("id").alias("id2"),
            F.col("x").alias("x2"),
            F.col("y").alias("y2"),
            F.explode(
                F.array(*[F.col("zx") + d for d in range(-reach, reach + 1)])
            ).alias("czx"),
        )
        dist = F.sqrt(
            F.pow(F.col("x") - F.col("x2"), 2) + F.pow(F.col("y") - F.col("y2"), 2)
        )
        return (
            pts.join(
                right,
                (F.col("zx") == F.col("czx")) & (F.col("id") < F.col("id2")),
            )
            .where(dist < eps)
            .select("id", "id2", F.round(dist, 6).alias("dist"))
        )
