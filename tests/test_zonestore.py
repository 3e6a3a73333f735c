"""ZoneStore: zoned layout at rest — pruning + correctness invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pserv_spark import catalog
from pserv_spark.plans import partition_filters, physical_plan
from pserv_spark.sources.zonestore import ZoneStore
from pserv_spark.testing import compare_frames


@pytest.fixture(scope="module")
def store(spark, sf_oracle, tmp_path_factory):
    emb = catalog.v_emb(spark, sf_oracle)
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.element_at("emb", 1).alias("x"),
        F.element_at("emb", 2).alias("y"),
    )
    st = ZoneStore(str(tmp_path_factory.mktemp("zones") / "pts"), zone_height=0.05)
    st.write(pts)
    return st, pts


def test_cone_search_prunes_partitions(spark, store):
    st, _ = store
    cone = st.cone_search(spark, 0.05, 0.05, 0.04)
    assert partition_filters(cone), "cone search must prune zone partitions"
    plan = physical_plan(cone)
    assert "zx" in " ".join(partition_filters(cone))
    assert "PushedFilters" in plan


def test_cone_search_matches_naive(spark, store):
    st, pts = store
    cone = st.cone_search(spark, 0.05, 0.05, 0.04)
    dist = F.sqrt(F.pow(F.col("x") - 0.05, 2) + F.pow(F.col("y") - 0.05, 2))
    naive = pts.where(dist < 0.04).select("id", F.round(dist, 6).alias("dist"))
    res = compare_frames("cone", cone, naive)
    assert res.ok, res.detail


@pytest.mark.parametrize("eps", [0.01, 0.07])
def test_stored_crossmatch_matches_naive(spark, store, eps):
    """eps below and above the zone height — both must equal the naive
    all-pairs join (reach = ceil(eps/h) neighbor zones)."""
    st, pts = store
    zoned = st.crossmatch(spark, eps)
    dist = F.sqrt(
        F.pow(F.col("a.x") - F.col("b.x"), 2) + F.pow(F.col("a.y") - F.col("b.y"), 2)
    )
    naive = (
        pts.alias("a")
        .join(pts.alias("b"), F.col("a.id") < F.col("b.id"))
        .where(dist < eps)
        .select(
            F.col("a.id").alias("id"),
            F.col("b.id").alias("id2"),
            F.round(dist, 6).alias("dist"),
        )
    )
    res = compare_frames(f"xmatch_{eps}", zoned, naive)
    assert res.ok, res.detail


def test_dynamic_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Join-driven pruning: with the fact laid out partitioned on the
    join key, a selective dim filter must turn into a runtime
    PartitionFilter on the fact scan (Catalyst DPP) — at 100 TB this is
    the difference between scanning one partition directory and all of
    them.  Complements the *static* pruning audits above."""
    from pyspark.sql import functions as F

    from pserv_spark.catalog import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "orders_bypri")
    t["orders"].write.partitionBy("o_orderpriority").parquet(d)
    fact = spark.read.parquet(d)
    dim = (
        t["orders"].select("o_orderpriority").distinct()
        .where(F.col("o_orderpriority").startswith("1-"))
    )
    j = fact.join(dim, "o_orderpriority").agg(F.count("*"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_zorder_layout_improves_box_locality(spark, tmp_path):
    """Sorting by the Morton key must co-locate 2-D neighbors: a small
    box predicate over (d1, d2) touches strictly fewer files in the
    z-ordered layout than in a vec_id-ordered one (file count pinned
    with maxRecordsPerFile so both layouts have the same granularity)."""
    from pyspark.sql import functions as F

    from pserv_spark.catalog import v_emb
    from pserv_spark.operators.pipeline_ops import layout_zorder_keys

    sf = "/root/testdata/sf0.01"
    pts = v_emb(spark, sf).select(
        "vec_id",
        F.element_at("emb", 1).alias("d1"),
        F.element_at("emb", 2).alias("d2"),
    )
    keys = layout_zorder_keys(spark, sf).select("vec_id", "zval")
    both = pts.join(keys, "vec_id")

    def files_touched(order_col: str, path: str) -> int:
        (
            both.repartition(1)
            .sortWithinPartitions(order_col)
            .write.option("maxRecordsPerFile", 50)
            .parquet(path)
        )
        hit = (
            spark.read.parquet(path)
            .where(
                (F.col("d1") > 0.05) & (F.col("d1") < 0.15)
                & (F.col("d2") > 0.05) & (F.col("d2") < 0.15)
            )
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        return hit

    z_files = files_touched("zval", str(tmp_path / "bz"))
    plain_files = files_touched("vec_id", str(tmp_path / "bp"))
    assert z_files < plain_files, (z_files, plain_files)
