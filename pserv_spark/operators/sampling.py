"""Training-pipeline sampling / layout operators.

The reference delegates dataset slicing to MySQL-side predicates
(SURVEY §2.1, `DbConnection.apply`); a 100 TB training pipeline needs
the same capabilities as deterministic, shuffle-free operators:

- ``sample_hash_split`` — reproducible train/val/test assignment via a
  content-independent key hash.  No randomness, no state: the split is
  a pure function of ``doc_id``, so it is identical on every run, every
  engine, and any partitioning — the property that makes it safe to
  recompute the split lazily on 1000 executors instead of materializing
  a membership table and joining it.
- ``sample_stratified_hash`` — per-stratum (language) sampled/total
  counts under a fixed hash threshold: the deterministic analog of
  ``df.sampleBy``, exact-oracle-checkable because there is no RNG.
- ``gapfill_date_spine`` — date-spine gap filling (``sequence`` +
  explode + left join).  The spine side is tiny (one row per day) and
  broadcast; the fact side never reshuffles.
- ``agg_salted_twophase`` — skew-defeating two-phase aggregation:
  pre-aggregate by (key, salt) to spread a hot key over N reducers,
  then combine partials.  Output is provably identical to the plain
  group-by (the oracle IS the plain group-by) because the measures are
  summed as DECIMAL (associative, exact).
- ``agg_histogram_bins`` — fixed-width histogram by floor binning;
  single map-side-combinable aggregation, no sort.

All five keep the md5-anchored determinism contract of SURVEY §4.5:
Spark ``conv(substr(md5(x),1,8),16,10)`` == DuckDB Horner fold
(``_oracle.duck_hash32``), verified in tests/test_extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import token_hash32
from ._oracle import duck_hash32, inline_views


def _split_hash(col):
    """32-bit key hash for split assignment (salted so it is
    independent of any other md5-derived bucketing in the repo)."""
    return token_hash32(F.concat(F.lit("split:"), col.cast("string")))


_DUCK_SPLIT_HASH = duck_hash32("concat('split:', CAST(doc_id AS VARCHAR))")


def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment, pure function of doc_id."""
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = (_split_hash(F.col("doc_id")) % 10).cast("int")
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 8, "train")
        .when(bucket < 9, "val")
        .otherwise("test")
        .alias("split"),
    )


_SPLIT_ORACLE = (
    f"SELECT doc_id, CAST({_DUCK_SPLIT_HASH} % 10 AS INT) AS bucket, "
    f"CASE WHEN {_DUCK_SPLIT_HASH} % 10 < 8 THEN 'train' "
    f"WHEN {_DUCK_SPLIT_HASH} % 10 < 9 THEN 'val' ELSE 'test' END AS split "
    "FROM documents"
)


def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample per language stratum: sampled vs total
    counts in one map-side-combinable pass (no sampleBy RNG)."""
    docs = load_tables(spark, sf_dir)["documents"]
    keep = _split_hash(F.col("doc_id")) % 100 < 20
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(keep.cast("long")).alias("n_sampled"),
    )


_STRAT_ORACLE = (
    "SELECT lang, COUNT(*) AS n_total, "
    f"CAST(SUM(CASE WHEN {_DUCK_SPLIT_HASH} % 100 < 20 THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_sampled FROM documents GROUP BY lang"
)


def gapfill_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order counts for a sparse customer slice with missing days
    zero-filled from a generated date spine.

    Scale shape: the spine is one row per day (a few thousand rows even
    for decades) — Spark broadcasts it; the daily aggregate is the only
    shuffle.  Equivalent of DuckDB/Postgres ``generate_series`` spines.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    daily = (
        orders.where(F.col("o_custkey") < 50)
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    spine = (
        daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    return spine.join(daily, "d", "left").select(
        F.col("d").cast("timestamp").alias("d"),
        F.coalesce("n", F.lit(0)).alias("n_orders"),
    )


_GAPFILL_ORACLE = (
    "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n "
    "FROM orders WHERE o_custkey < 50 GROUP BY 1), "
    "spine AS (SELECT CAST(unnest(generate_series(min_d, max_d, INTERVAL 1 DAY)) AS DATE) AS d "
    "FROM (SELECT MIN(d) AS min_d, MAX(d) AS max_d FROM daily)) "
    "SELECT CAST(spine.d AS TIMESTAMP) AS d, CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders "
    "FROM spine LEFT JOIN daily USING (d)"
)


def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill with last-observation-carried-forward.

    The sibling of ``gapfill_date_spine``: instead of zero-filling, a
    missing day inherits the most recent observed daily average (the
    standard LOCF imputation for sparse sensor / light-curve series).
    The ordered window runs over the *day-grain spine*, not the fact
    table, so the single-partition sort is bounded by calendar size
    (a few thousand rows per decade) regardless of data scale; the
    fact table is reduced by the grouped aggregate first.

    Determinism (SURVEY §4.5): the daily average is
    CAST(SUM(DECIMAL) AS DOUBLE)/COUNT — exact and order-independent —
    and LOCF merely copies that double forward, so no rounding is
    needed.  Days before the first observation stay NULL on both
    engines.
    """
    orders = load_tables(spark, sf_dir)["orders"]
    daily = (
        orders.where(F.col("o_custkey") < 50)
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_price")
        )
    )
    spine = (
        daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    joined = spine.join(daily, "d", "left")
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        F.col("d").cast("timestamp").alias("d"),
        F.last("avg_price", ignorenulls=True).over(w).alias("avg_price_filled"),
        F.col("avg_price").isNotNull().alias("observed"),
    )


# DuckDB 1.0 formulation: the cumulative-count-of-non-nulls "group"
# trick (COUNT(col) OVER ignores NULLs), portable LOCF without
# IGNORE NULLS support.
_LOCF_ORACLE = (
    "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price "
    "FROM orders WHERE o_custkey < 50 GROUP BY 1), "
    "spine AS (SELECT CAST(unnest(generate_series(min_d, max_d, INTERVAL 1 DAY)) AS DATE) AS d "
    "FROM (SELECT MIN(d) AS min_d, MAX(d) AS max_d FROM daily)), "
    "j AS (SELECT spine.d, daily.avg_price FROM spine LEFT JOIN daily USING (d)), "
    "g AS (SELECT d, avg_price, COUNT(avg_price) OVER "
    "(ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM j) "
    "SELECT CAST(d AS TIMESTAMP) AS d, MAX(avg_price) OVER (PARTITION BY grp) AS avg_price_filled, "
    "avg_price IS NOT NULL AS observed FROM g"
)


def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a skewable key.

    Phase 1 groups by (key, salt) — a hot key spreads across 8 reducer
    partitions instead of one; phase 2 combines the ≤8 partials per key.
    DECIMAL sums make the result bit-identical to the direct group-by,
    which is exactly what the oracle runs.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    qty = F.col("l_quantity").cast("decimal(18,2)")
    salt = F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(8))
    partial = (
        li.select("l_returnflag", qty.alias("qty"), salt.alias("salt"))
        .groupBy("l_returnflag", "salt")
        .agg(F.sum("qty").alias("pq"), F.count("*").alias("pn"))
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pq").cast("double").alias("sum_qty"),
        F.sum("pn").cast("long").alias("n_rows"),
    )


_SALTED_ORACLE = (
    "SELECT l_returnflag, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
    "COUNT(*) AS n_rows FROM lineitem GROUP BY l_returnflag"
)


def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of l_extendedprice (bin width 5000):
    floor binning + count, one shuffle, map-side combined."""
    li = load_tables(spark, sf_dir)["lineitem"]
    bin_ = F.floor(F.col("l_extendedprice") / 5000).cast("long")
    return (
        li.groupBy(bin_.alias("bin"))
        .agg(F.count("*").cast("long").alias("n"))
    )


_HIST_ORACLE = (
    "SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bin, COUNT(*) AS n "
    "FROM lineitem GROUP BY 1"
)


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join for skewed keys: the fact side gets a
    deterministic salt in [0, 16); the dim side is replicated once per
    salt value; the join key becomes (key, salt) so a hot supplier's
    rows spread over 16 shuffle partitions instead of one straggler.

    This is the manual form of AQE's skew-join split, expressed so it
    works on any Spark (and inside stateful streaming joins where AQE
    doesn't apply).  The merge hint forces the shuffle path — with a
    broadcast dim the salt would be pointless.  Salting never changes
    the result (each fact row meets exactly the one dim replica with
    its salt), so the plain join IS the oracle.
    """
    t = load_tables(spark, sf_dir)
    n_salt = 16
    fact = t["lineitem"].select(
        "l_suppkey",
        "l_extendedprice",
        F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(n_salt)).alias("salt"),
    )
    dim = (
        t["supplier"]
        .select("s_suppkey", "s_name")
        .withColumn("salt", F.explode(F.expr(f"sequence(0, {n_salt - 1})")))
    )
    joined = fact.join(
        dim.hint("merge"),
        (fact.l_suppkey == dim.s_suppkey) & (fact.salt == dim.salt),
    )
    return joined.groupBy("s_name").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


_SALTED_JOIN_ORACLE = (
    "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY s_name"
)


def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority /
    exponential sampling, Duffield-Lund-Thorup): key_i = -ln(u_i)/w_i
    with u_i a key-hash uniform and w_i = n_chars (longer documents
    weighted up); the k smallest keys are the sample.  RNG-free like
    every sampler here: identical on every engine, run, and
    partitioning, and mergeable (per-partition top-k partials combine
    into the global top-k — Spark's TakeOrderedAndProject does exactly
    that, no full sort).

    Determinism: the key is rounded to 9 digits INSIDE the ordering
    with doc_id as total-order tiebreak (SURVEY §4.5 rule 4); a 1-ulp
    libm `ln` difference flips a rounded key only on a measure-zero
    boundary."""
    # zero-weight items have inclusion probability 0 in DLT sampling —
    # and an EMPTY document (n_chars = 0) would divide by zero under
    # ANSI (hostile-text audit, round 7): exclude up front, both sides.
    docs = load_tables(spark, sf_dir)["documents"].where(F.col("n_chars") > 0)
    u = (_split_hash(F.concat(F.lit("wps:"), F.col("doc_id").cast("string"))) + 1).cast(
        "double"
    ) / (4294967296.0 + 1)
    key = -F.log(u) / F.col("n_chars").cast("double")
    ranked = docs.select(
        "doc_id", "n_chars", F.round(key, 9).alias("priority_key")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("priority_key"), F.col("doc_id"))
        ),
    )
    return ranked.where(F.col("rn") <= 20).select(
        "doc_id", "n_chars", "priority_key", F.col("rn").cast("int").alias("rn")
    )


_WPS_HASH = duck_hash32("concat('split:', concat('wps:', CAST(doc_id AS VARCHAR)))")
_WPS_ORACLE = (
    "WITH keyed AS (SELECT doc_id, n_chars, "
    f"ROUND(-ln(CAST({_WPS_HASH} + 1 AS DOUBLE) / (4294967296.0 + 1)) "
    "/ CAST(n_chars AS DOUBLE), 9) AS priority_key FROM documents WHERE n_chars > 0), "
    "ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY priority_key, doc_id) AS rn "
    "FROM keyed) "
    "SELECT doc_id, n_chars, priority_key, CAST(rn AS INT) AS rn "
    "FROM ranked WHERE rn <= 20"
)


_EMBARGO_DAYS = 2
_US_PER_DAY = 86_400_000_000


def _embargo_sql() -> str:
    """Leakage-safe temporal train/test split with an embargo gap —
    the time-series cross-validation discipline (train strictly
    before, test strictly after, and an excluded buffer between so
    label horizons cannot leak across the boundary).

    The split day is min_day + 80% of the day span, all integer; the
    embargo excludes the _EMBARGO_DAYS days before it.  One scalar
    subquery (broadcast) + one scan with a CASE label + one keyed
    aggregation; every metric is an exact integer.
    """
    day = f"CAST(FLOOR(ts_us / {_US_PER_DAY}.0) AS BIGINT)"
    return (
        "WITH bounds AS ("
        f"  SELECT MIN({day}) AS lo, MAX({day}) AS hi FROM v_events"
        "), lab AS ("
        f"  SELECT {day} AS d, user_id, value, event_type,"
        "    CASE"
        f"     WHEN {day} < lo + CAST(FLOOR((hi - lo) * 8 / 10) AS BIGINT)"
        f"          - {_EMBARGO_DAYS} THEN 'train'"
        f"     WHEN {day} >= lo + CAST(FLOOR((hi - lo) * 8 / 10) AS BIGINT) THEN 'test'"
        "     ELSE 'embargo' END AS split"
        "  FROM v_events CROSS JOIN bounds"
        ") SELECT split,"
        "    CAST(COUNT(*) AS BIGINT) AS n_rows,"
        "    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,"
        "    CAST(MIN(d) AS BIGINT) AS min_day,"
        "    CAST(MAX(d) AS BIGINT) AS max_day,"
        "    CAST(SUM(CASE WHEN event_type = 'purchase'"
        "      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)"
        "      AS purchase_cents"
        "  FROM lab GROUP BY split"
    )


def sample_time_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 temporal split with a 2-day embargo buffer."""
    load_tables(spark, sf_dir)
    return spark.sql(_embargo_sql())


_EMBARGO_ORACLE = inline_views(_embargo_sql())




#: Target corpus mixture, per-mille by language code (sums to 1000).
_MIX_TARGET = (("de", 300), ("en", 250), ("es", 200), ("fr", 150), ("zh", 100))


def _mixture_sql(values_clause: str) -> str:
    """Importance weights that reshape the observed language mixture
    into a declared target mixture — the data-mixing step before
    training (upweight underrepresented strata, downweight the rest).

    weight(lang) = target_share / source_share, computed as one exact
    quotient of integers (target per-mille × corpus size) / (1000 ×
    stratum count); the weighted counts re-sum to the corpus size by
    construction (asserted in tests).  One count aggregation + a
    broadcast of the 5-row target."""
    return (
        "WITH src AS ("
        "  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang"
        "), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM src)"
        f" SELECT src.lang, src.c AS n_docs,"
        "    CAST(src.c AS DOUBLE) / n AS p_source,"
        "    CAST(t.pm AS DOUBLE) / 1000.0 AS p_target,"
        "    (CAST(t.pm AS DOUBLE) * n) / (1000.0 * src.c) AS weight"
        f" FROM src JOIN {values_clause} ON src.lang = t.lang CROSS JOIN tot"
    )


def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language importance weights toward the target mixture."""
    load_tables(spark, sf_dir)
    rows = ", ".join(f"('{l}', {pm})" for l, pm in _MIX_TARGET)
    return spark.sql(_mixture_sql(f"(VALUES {rows}) AS t(lang, pm)"))


def _mixture_oracle() -> str:
    rows = ", ".join(f"('{l}', {pm})" for l, pm in _MIX_TARGET)
    return _mixture_sql(f"(VALUES {rows}) t(lang, pm)")


def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join: the declarative counterpart of the manual
    ``join_salted_skew`` (VERDICT r2 next-round #7).  Same shuffle
    sort-merge join on the same skewed key, but with NO salt columns —
    on a modern Spark, ``spark.sql.adaptive.skewJoin`` (enabled by
    default) measures the actual post-shuffle partition sizes at the
    stage boundary and splits any partition larger than
    ``skewedPartitionFactor × median`` into sub-partitions, replicating
    the matching build-side rows — exactly what the manual salt does,
    except the split factor is chosen per hot key at runtime from real
    sizes rather than a static 16 guessed at authoring time.  At 100 TB
    this is the preferred form: salting pays its constant-factor
    explode/repartition cost on *every* key, AQE pays only on the keys
    that are actually hot this run.

    The merge hint forces the shuffle path (a broadcast dim would make
    skew moot — same reasoning as ``join_salted_skew``); correctness is
    oracle-checked against the plain join, and the skew-split firing is
    demonstrated in ``tests/test_plans.py::test_aqe_skew_join_splits``
    on a deliberately skewed build with lowered split thresholds.
    """
    t = load_tables(spark, sf_dir)
    fact = t["lineitem"].select("l_suppkey", "l_extendedprice")
    dim = t["supplier"].select("s_suppkey", "s_name").hint("merge")
    joined = fact.join(dim, fact.l_suppkey == dim.s_suppkey)
    return joined.groupBy("s_name").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


QUERIES = {
    "join_skew_aqe": join_skew_aqe,
    "sample_hash_split": sample_hash_split,
    "sample_stratified_hash": sample_stratified_hash,
    "gapfill_date_spine": gapfill_date_spine,
    "ts_gap_fill_locf": ts_gap_fill_locf,
    "agg_salted_twophase": agg_salted_twophase,
    "agg_histogram_bins": agg_histogram_bins,
    "join_salted_skew": join_salted_skew,
    "sample_weighted_priority": sample_weighted_priority,
    "sample_time_embargo_split": sample_time_embargo_split,
    "sample_mixture_weights": sample_mixture_weights,
}

ORACLES = {
    "join_skew_aqe": _SALTED_JOIN_ORACLE,
    "join_salted_skew": _SALTED_JOIN_ORACLE,
    "sample_hash_split": _SPLIT_ORACLE,
    "sample_stratified_hash": _STRAT_ORACLE,
    "gapfill_date_spine": _GAPFILL_ORACLE,
    "ts_gap_fill_locf": _LOCF_ORACLE,
    "agg_salted_twophase": _SALTED_ORACLE,
    "agg_histogram_bins": _HIST_ORACLE,
    "sample_weighted_priority": _WPS_ORACLE,
    "sample_time_embargo_split": _EMBARGO_ORACLE,
    "sample_mixture_weights": _mixture_oracle(),
}
