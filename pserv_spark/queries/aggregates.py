"""Aggregation queries (corpus section C) — DataFrame API.

Determinism discipline (SURVEY §4.5) is structural here: DECIMAL casts
*inside* SUM (exact, order-independent under partial aggregation),
unrounded decimal/count quotients for averages, BIGINT casts on counts,
ROUND only on genuinely noisy float statistics (stddev/corr).
Partial→final aggregation (map-side combine) is Catalyst-automatic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables


def _dec(col: str | F.Column, scale: int) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        F.sum(_dec("l_extendedprice", 2)).cast("double").alias("sum_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        (F.sum(_dec("l_quantity", 2)).cast("double") / F.count("*")).alias("avg_qty"),
    )


def _fp_unit(col: F.Column, s: int) -> F.Column:
    """Integer count of 10^-s units of ``col``, HALF_UP, in pure
    FP+long whole-stage codegen (no per-row BigDecimal).

    ``floor(x·10^s + 0.5)`` is round-half-away-from-zero for x ≥ 0;
    the negative branch mirrors it (BigDecimal HALF_UP semantics —
    floor alone would round -2.5 to -2).  Equal to
    ``CAST(x AS DECIMAL(18,s)) * 10^s`` whenever x's true value is an
    s-digit decimal reached through a short IEEE product chain (see
    the exactness argument at the call site in ``agg_groupby_q1``).
    """
    ux = col * (10**s)
    return (
        F.when(ux >= 0, F.floor(ux + F.lit(0.5)))
        .otherwise(-F.floor(F.lit(0.5) - ux))
        .cast("long")
    )


def agg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 with scaled-integer partial aggregation.

    Semantically identical to the Appendix-A decimal formulation (the
    oracle is unchanged and hash-matches), but ~1.7× faster: each
    money measure is converted per-row to an integer number of its
    smallest unit (cents / 1e-4 / 1e-6 units — exact, the inputs are
    fixed-point decimals stored as doubles; ROUND is the same HALF_UP
    a DECIMAL cast applies), partial-aggregated as LONG inside
    whole-stage codegen (compact 8-byte accumulators instead of the
    >18-digit BigDecimal path a DECIMAL(28,x) sum buffer forces), then
    combined as DECIMAL(27,0) and descaled — exact at every step.

    Overflow story at scale: partials carry a 1024-way salt over the
    measure columns, so the per-accumulator load is total/1024 *in
    expectation* — entropy-dependent, not guaranteed (ADVICE r9 #2:
    every row sharing one (price, discount, qty) triple lands in one
    bucket, so the worst case is bounded by the most frequent measure
    triple, ≈ total/#distinct-triples × skew).  On TPC-H-shaped data
    the triples are near-uniform (≈5e12 charge-units per salt at
    sf0.1, margin ≈2e6× before the 9.2e18 LONG limit ≈ sf200 000, two
    decades past the 100 TB target), and the margin is so wide that
    even a 1000× hot-triple skew cannot reach the limit below
    ≈sf200; the 6×1024-row combine shuffle is noise.  ANSI mode
    (Spark 4 default) turns any overflow into a loud error, never a
    silent wrap — the guarantee is "loud failure", the margin is
    probabilistic.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # (col, decimal scale s): per-row integer units must equal
    # CAST(col AS DECIMAL(18,s)) * 10^s — the HALF_UP decimal-cast the
    # oracle applies.  Round 3 computes them in PURE FP+long codegen
    # (`_fp_unit`: one multiply, one floor — no per-row BigDecimal),
    # which is ~2.5× faster on the map stage and *provably* identical
    # on this data, not coincidentally: every measure is (a chain of
    # ≤3 IEEE products of) s-digit decimals bounded by 1e7, so the
    # true value sits on an exact unit boundary and the accumulated FP
    # error is < 1e-4 unit — never within 0.4999 of the .5 rounding
    # boundary where HALF_UP(expansion) and floor(x·10^s + 0.5) could
    # part ways.  tests/test_aggregates_q1.py machine-checks per-row
    # equality of the two forms over every real row at all three
    # tiers, so a data regen that broke the precondition fails loudly.
    units = {
        "q": (F.col("l_quantity"), 2),
        "p": (F.col("l_extendedprice"), 2),
        "d": (disc, 4),
        "ch": (disc * (1 + F.col("l_tax")), 6),
    }
    # Salt from the measure columns the aggregation reads anyway
    # (r9, guide §2.3 "narrower types / project before the exchange"):
    # the old hash(l_orderkey, l_linenumber) salt forced the scan to
    # read two columns used for NOTHING else — ~2/9 of the scan bytes.
    # ANY deterministic per-row value works (the salt only spreads
    # partial-aggregation groups; the final combine re-merges by the
    # real keys), and price/discount carry ample entropy to fill 1024
    # buckets.
    salt = F.pmod(
        F.hash("l_extendedprice", "l_discount", "l_quantity"), F.lit(1024)
    )
    partial = (
        li.where(F.expr("l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus", salt.alias("salt"))
        .agg(
            *[
                F.sum(_fp_unit(col, s)).alias(k)
                for k, (col, s) in units.items()
            ],
            F.count("*").alias("n"),
        )
    )

    def _descale(k: str, scale: int) -> F.Column:
        # exact integer total, descaled in DECIMAL (27,0)/10^s keeps scale 6 ≥ s
        # and precision 33 ≤ 38 → exact, no §4.5-rule-6 precision loss), then a
        # single correctly-rounded cast to double — bit-identical to the
        # oracle's CAST(decimal-sum AS DOUBLE).
        return (F.sum(F.col(k).cast("decimal(27,0)")) / scale).cast("double")

    return partial.groupBy("l_returnflag", "l_linestatus").agg(
        _descale("q", 100).alias("sum_qty"),
        _descale("p", 100).alias("sum_base_price"),
        _descale("d", 10_000).alias("sum_disc_price"),
        _descale("ch", 1_000_000).alias("sum_charge"),
        (_descale("q", 100) / F.sum("n")).alias("avg_qty"),
        F.sum("n").cast("long").alias("count_order"),
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        F.sum_distinct(_dec("l_quantity", 2)).cast("double").alias("sum_dist_qty"),
    )


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n"))
        .where(F.col("n") >= 15)
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.grouping("l_returnflag").alias("g_rf"),
        F.grouping("l_linestatus").alias("g_ls"),
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("long").alias("n")
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("long").alias("n")
    )


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    return c.groupBy("c_nationkey").agg(
        F.round(F.stddev_samp("c_acctbal"), 6).alias("sd"),
        F.round(F.var_samp("c_acctbal"), 6).alias("var"),
        F.round(F.min("c_acctbal"), 2).alias("lo"),
        F.round(F.max("c_acctbal"), 2).alias("hi"),
    )


def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("r"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov"),
    )


def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
    )


def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The ordering key composes (price, orderkey) into one BIGINT so the
    # winner among TIED prices is pinned (highest key for best, lowest
    # for worst) — bare MAX_BY/MIN_BY on price alone picks an arbitrary
    # tie member, which the round-7 ties-tier audit caught diverging
    # between engines.  Cents are exact at <2^27; the 2^32 shift leaves
    # headroom for any orderkey this schema can hold.
    o = load_tables(spark, sf_dir)["orders"]
    rank = (
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        * F.lit(4294967296).cast("long")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", rank).alias("best_order"),
        F.min_by("o_orderkey", rank).alias("worst_order"),
    )


def agg_filter_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    ev = spark.table("v_events")

    def n_of(kind: str) -> F.Column:
        return (
            F.count(F.when(F.col("event_type") == kind, True))
            .cast("long")
            .alias(f"{kind}s")
        )

    purchase_value = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(0.0).cast("decimal(14,2)")
    return ev.groupBy("user_id").agg(
        n_of("click").alias("clicks"),
        n_of("purchase").alias("purchases"),
        n_of("error").alias("errors"),
        F.round(F.sum(purchase_value).cast("double"), 2).alias("purchase_value"),
    )


def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_custkey").agg(
        F.bool_and(F.col("o_totalprice") > 2000).alias("all_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
    )


def agg_string_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n, r = t["nation"].alias("n"), t["region"].alias("r")
    return (
        n.join(r, F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .groupBy("r.r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n.n_name")), ",").alias("nations")
        )
    )


QUERIES = {
    "agg_global": agg_global,
    "agg_groupby_q1": agg_groupby_q1,
    "agg_distinct": agg_distinct,
    "agg_having": agg_having,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_stats": agg_stats,
    "agg_corr": agg_corr,
    "agg_percentile": agg_percentile,
    "agg_minmax_by": agg_minmax_by,
    "agg_filter_pivot": agg_filter_pivot,
    "agg_bool": agg_bool,
    "agg_string_sorted": agg_string_sorted,
}
