"""Dataset profiling operators.

The reference's workflow leans on ad-hoc sanity queries after each bulk
load (row counts, min/max ranges per column — the practice-server use
case, SURVEY §2.1 `DbConnection.apply`).  These make that a first-class
operator pair, the way a 100 TB ingestion pipeline gates a new drop
before training on it:

- ``profile_table_stats`` — one-pass column profile of ``orders``:
  per column row count, null count, exact distinct count, and a
  canonical min/max rendering.  Implemented as a SINGLE aggregation
  over one scan (all metrics as agg expressions) followed by a
  ``stack`` unpivot — never one scan per column.  At 100 TB the exact
  ``COUNT(DISTINCT)`` would swap to ``approx_count_distinct`` (the
  expand-operator cost is the one non-linear piece); kept exact here
  for the oracle gate.
- ``profile_value_counts`` — top-5 most frequent values for the
  low-cardinality string columns (frequency table / enum drift check).
  Group-by per column then a per-column top-k window with a total
  (count DESC, value ASC) ordering — deterministic under ties.

Min/max renderings are normalized before casting to string so both
engines print identically: DECIMAL(18,2) for doubles (Java
``Double.toString`` would use scientific notation where DuckDB does
not), DATE for timestamps, plain CAST for integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables

#: column -> rendering class for min/max normalization.
_PROFILE_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def _spark_repr(agg: str, col: str, kind: str) -> str:
    if kind == "num":
        return f"CAST(CAST({agg}({col}) AS DECIMAL(18,2)) AS STRING)"
    if kind == "date":
        return f"CAST(CAST({agg}({col}) AS DATE) AS STRING)"
    return f"CAST({agg}({col}) AS STRING)"


def _duck_repr(agg: str, col: str, kind: str) -> str:
    if kind == "num":
        return f"CAST(CAST({agg}({col}) AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "date":
        return f"CAST(CAST({agg}({col}) AS DATE) AS VARCHAR)"
    return f"CAST({agg}({col}) AS VARCHAR)"


def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan column profile of the orders table (see module doc)."""
    orders = load_tables(spark, sf_dir)["orders"]
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs.append((F.count("*") - F.count(c)).cast("long").alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"nd_{c}"))
        aggs.append(F.expr(_spark_repr("MIN", c, kind)).alias(f"mn_{c}"))
        aggs.append(F.expr(_spark_repr("MAX", c, kind)).alias(f"mx_{c}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_repr, max_repr)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_repr", "max_repr")


_TABLE_STATS_ORACLE = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null, "
    f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
    f"{_duck_repr('MIN', c, kind)} AS min_repr, "
    f"{_duck_repr('MAX', c, kind)} AS max_repr FROM orders"
    for c, kind in _PROFILE_COLS
)

_VC_COLS = ("o_orderstatus", "o_orderpriority")


def profile_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 frequency table for the enum-like orders columns."""
    orders = load_tables(spark, sf_dir)["orders"]
    counted = None
    for c in _VC_COLS:
        part = (
            orders.groupBy(F.col(c).alias("value"))
            .agg(F.count("*").cast("long").alias("n"))
            .select(F.lit(c).alias("col_name"), "value", "n")
        )
        counted = part if counted is None else counted.unionAll(part)
    w = Window.partitionBy("col_name").orderBy(F.col("n").desc(), F.col("value"))
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
    )


_VALUE_COUNTS_ORACLE = (
    "WITH counted AS ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, {c} AS value, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY {c}"
        for c in _VC_COLS
    )
    + ") SELECT col_name, value, n, CAST(ROW_NUMBER() OVER "
    "(PARTITION BY col_name ORDER BY n DESC, value) AS BIGINT) AS rank "
    "FROM counted QUALIFY rank <= 5"
)


def profile_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per event type.

    Splits the event stream at the midpoint of its time range (a pure
    function of global MIN/MAX ts_us — deterministic) and computes
    KS = max |F̂₁(v) − F̂₂(v)| between the early and late empirical
    CDFs of ``value``.  The distribution-drift gate a training
    pipeline runs on every new data drop before mixing it in.

    Scale shape: one scan → per-(type, value) counts (map-side
    combinable), then a per-type ordered window over *distinct*
    values, then a per-type max.  The window partition carries at most
    |distinct values per type| rows, never the raw stream; nothing is
    collected to the driver.

    Determinism (SURVEY §4.5): cumulative counts are integers; each
    |c₁/n₁ − c₂/n₂| is one double op on identical operands in both
    engines; MAX is order-independent.  ROUND(…,6) guards the final
    rendering.
    """
    from .. import catalog

    ev = catalog.v_events(spark, sf_dir).select("event_type", "value", "ts_us")
    bounds = ev.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    )
    sided = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        F.when(F.col("ts_us") * 2 <= F.col("lo") + F.col("hi"), 1)
        .otherwise(2)
        .alias("side"),
    )
    per_value = sided.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("side") == 2, 1).otherwise(0)).alias("c2"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    stepped = per_value.select(
        "event_type",
        F.sum("c1").over(w_cum).alias("cum1"),
        F.sum("c2").over(w_cum).alias("cum2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    gap = F.abs(
        F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2")
    )
    return stepped.groupBy("event_type").agg(
        F.round(F.max(gap), 6).alias("ks"),
        F.max("n1").cast("long").alias("n_early"),
        F.max("n2").cast("long").alias("n_late"),
    )


from ._oracle import inline_views

_KS_ORACLE = inline_views(
    "WITH ev AS (SELECT event_type, value, ts_us FROM v_events), "
    "b AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM ev), "
    "sided AS (SELECT event_type, value, "
    "CASE WHEN ts_us * 2 <= lo + hi THEN 1 ELSE 2 END AS side FROM ev CROSS JOIN b), "
    "per_value AS (SELECT event_type, value, "
    "SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1, "
    "SUM(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2 "
    "FROM sided GROUP BY event_type, value), "
    "stepped AS (SELECT event_type, "
    "SUM(c1) OVER (PARTITION BY event_type ORDER BY value NULLS FIRST "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1, "
    "SUM(c2) OVER (PARTITION BY event_type ORDER BY value NULLS FIRST "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2, "
    "SUM(c1) OVER (PARTITION BY event_type) AS n1, "
    "SUM(c2) OVER (PARTITION BY event_type) AS n2 "
    "FROM per_value) "
    "SELECT event_type, "
    "ROUND(MAX(ABS(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2)), 6) AS ks, "
    "CAST(MAX(n1) AS BIGINT) AS n_early, CAST(MAX(n2) AS BIGINT) AS n_late "
    "FROM stepped GROUP BY event_type"
)


def _entropy_sql() -> str:
    """Per-categorical-column Shannon entropy (nats) + Gini impurity —
    the class-balance profile a sampling/curriculum stage reads before
    deciding split ratios.

    One UNION-ALL scan stacks the profiled columns into (col, val)
    rows, one groupBy counts categories, one groupBy folds the
    distribution metrics.  The per-category −p·ln p terms are
    floor-quantized to 1e-9 before the cross-category SUM (ln differs
    by 1 ulp across engines — the DFT/Stetson pattern).  Gini is NOT
    quantized the same way: p² = (c/n)² sits exactly on floor
    boundaries whenever c/n is a short decimal (0.2² · 1e9 is an
    integer — observed ±1 flips), so it is computed as the fully
    exact Σc² instead: gini = 1 − Σc²/n².  At 100 TB the shuffle
    carries only (column × category) partial counts.
    """
    stacked = (
        "SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders"
        " UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders"
        " UNION ALL SELECT 'event_type', event_type FROM v_events"
        " UNION ALL SELECT 'doc_lang', lang FROM documents"
    )
    p = "(CAST(c AS DOUBLE) / n)"
    return (
        f"WITH stacked AS ({stacked}),"
        " cat AS ("
        "  SELECT col, val, CAST(COUNT(*) AS BIGINT) AS c FROM stacked"
        "  GROUP BY col, val"
        "), tot AS ("
        "  SELECT col, CAST(SUM(c) AS BIGINT) AS n FROM cat GROUP BY col"
        ") SELECT cat.col,"
        "    CAST(COUNT(*) AS BIGINT) AS n_categories,"
        "    CAST(MAX(n) AS BIGINT) AS n_rows,"
        f"   CAST(CAST(SUM(CAST(FLOOR(-{p} * ln({p}) * 1000000000.0) AS BIGINT)) AS BIGINT)"
        "      AS DOUBLE) / 1000000000.0 AS entropy_nats,"
        "   1.0 - CAST(SUM(c * c) AS BIGINT)"
        "      / (CAST(MAX(n) AS DOUBLE) * MAX(n)) AS gini"
        "  FROM cat JOIN tot ON cat.col = tot.col"
        "  GROUP BY cat.col"
    )


def profile_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + Gini impurity per categorical column."""
    load_tables(spark, sf_dir)
    return spark.sql(_entropy_sql())


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_matrix_sql() -> str:
    """Pairwise Pearson correlation matrix of the numeric fact
    columns, from ONE scan of exact decimal moment sums.

    corr(x,y) = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)),
    with every Σ an order-independent DECIMAL sum (per-row products
    cast to DECIMAL(30,8) — §4.5 rule 1) and the final formula a fixed
    double expression over those exact operands, ROUNDed at 6 dp like
    the validated ``agg_corr``.  Profiling all C(4,2) pairs costs one
    aggregation of 15 partials — the single-scan property
    ``profile_table_stats`` established, extended to second moments.
    """
    sums = [f"CAST(COUNT(*) AS BIGINT) AS n"]
    for c in _CORR_COLS:
        sums.append(f"SUM(CAST({c} AS DECIMAL(24,6))) AS s_{c}")
        sums.append(f"SUM(CAST({c} * {c} AS DECIMAL(30,8))) AS ss_{c}")
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        sums.append(f"SUM(CAST({a} * {b} AS DECIMAL(30,8))) AS sp_{a}_{b}")

    def r(a: str, b: str) -> str:
        num = (
            f"(n * CAST(sp_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        den = (
            f"sqrt((n * CAST(ss_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * (n * CAST(ss_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        )
        return f"ROUND({num} / {den}, 6)"

    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, {r(a, b)} AS r, n AS n_rows FROM m"
        for a, b in pairs
    )
    return f"WITH m AS (SELECT {', '.join(sums)} FROM lineitem) {rows}"


def profile_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation for every numeric-column pair, one scan."""
    load_tables(spark, sf_dir)
    return spark.sql(_corr_matrix_sql())


def _dq_sql(distinct_pair: str) -> str:
    """Declarative data-quality gate (the Great-Expectations /
    dbt-tests shape): a suite of named assertions, each emitting
    (check, observed, threshold, passed).  The five lineitem checks
    are evaluated from ONE scan's aggregate moments; a sixth check
    (`events_null_ts_excluded`, round 7) adds one uncorrelated scalar
    subquery — a single-column COUNT over events.ts — so the suite is
    one lineitem pass plus one pushed events-column probe, six rows
    total (ADVICE r7 #3 pins this contract).  At 100 TB the lineitem
    side stays a single partial-aggregated pass regardless of how many
    checks share it.  All observed values are exact (counts or exact
    quotients).

    NB the PK-uniqueness expectation legitimately FAILS on the driver
    data (the synthetic lineitem has ~0.24% duplicate
    (orderkey, linenumber) pairs) — which is the point of a gate;
    tests assert it catches the defect."""
    m = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_nulls,"
        " CAST(MAX(l_discount) AS DOUBLE) AS max_disc,"
        " CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,"
        f" CAST({distinct_pair} AS BIGINT) AS n_pk,"
        # quarantine visibility for the v_events boundary: every events
        # row the canonical view silently excludes (ts IS NULL) is
        # counted here, so a production feed with missing timestamps
        # flips a named gate instead of shrinking results invisibly.
        # One extra single-column aggregate scan (ts only, pushed).
        " (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE ts IS NULL)"
        "   AS ts_null_events"
        " FROM lineitem"
    )
    checks = [
        ("row_count_min", "CAST(n AS DOUBLE)", 1000.0, ">="),
        ("quantity_null_rate_max", "CAST(q_nulls AS DOUBLE) / n", 0.001, "<="),
        ("discount_max_bound", "max_disc", 0.5, "<="),
        ("quantity_min_bound", "min_qty", 1.0, ">="),
        ("pk_duplicate_rows_max", "CAST(n - n_pk AS DOUBLE)", 0.0, "<="),
        ("events_null_ts_excluded", "CAST(ts_null_events AS DOUBLE)", 0.0, "<="),
    ]
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS check_name, {obs} AS observed,"
        f" CAST({thr} AS DOUBLE) AS threshold,"
        f" CASE WHEN ({obs}) {op} {thr} THEN TRUE ELSE FALSE END AS passed FROM m"
        for name, obs, thr, op in checks
    )
    return f"WITH m AS ({m}) {rows}"


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named data-quality assertions over the fact table, one scan."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _dq_sql("COUNT(DISTINCT l_orderkey, l_linenumber)")
    )




def _benford_sql(vchar: str) -> str:
    """Benford's-law screen on order totals: observed leading-digit
    frequencies vs the log₁₀(1+1/d) expectation, with the per-digit
    deviation — the classic forensic/data-quality test for fabricated
    or truncated numeric columns.  Counts exact; expected shares and
    deviations are fixed double expressions; one scan."""
    return (
        "WITH d AS ("
        # FLOOR explicitly: CAST(double AS BIGINT) truncates in Spark
        # but ROUNDS in DuckDB (observed ±1 leading-digit flips).
        f"  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS {vchar}), 1, 1)"
        "    AS BIGINT) AS digit"
        "  FROM orders WHERE o_totalprice >= 1"
        "), c AS ("
        "  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit"
        "), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c)"
        " SELECT digit, n,"
        "  CAST(n AS DOUBLE) / nt AS p_observed,"
        "  ln(1.0 + 1.0 / digit) / ln(10.0) AS p_benford,"
        "  CAST(CAST(FLOOR(ABS(CAST(n AS DOUBLE) / nt"
        "    - ln(1.0 + 1.0 / digit) / ln(10.0)) * 1000000.0) AS BIGINT) AS DOUBLE)"
        "    / 1000000.0 AS abs_dev"
        " FROM c CROSS JOIN tot"
    )


def profile_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution vs Benford expectation."""
    load_tables(spark, sf_dir)
    return spark.sql(_benford_sql("STRING"))




def _winsor_sql(pctl: str) -> str:
    """Winsorized statistics per event type: clip values at the
    p05/p95 fences, then report the robust mean — the outlier
    treatment between dropping (MAD screen) and keeping.  Fences use
    the validated interpolated-percentile parity; clipped values are
    floor-quantized to cents before the SUM so the robust mean is an
    exact-integer quotient.  Two passes over one keyed exchange."""
    return (
        "WITH fences AS ("
        f"  SELECT event_type, {pctl}(value, 0.05) AS lo, {pctl}(value, 0.95) AS hi"
        "  FROM v_events GROUP BY event_type"
        "), clipped AS ("
        "  SELECT e.event_type,"
        "    CAST(FLOOR(GREATEST(f.lo, LEAST(f.hi, e.value)) * 100.0) AS BIGINT)"
        "      AS cents"
        "  FROM v_events e JOIN fences f ON e.event_type = f.event_type"
        ") SELECT event_type,"
        "    CAST(COUNT(*) AS BIGINT) AS n,"
        "    CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / COUNT(*) / 100.0"
        "      AS winsor_mean"
        "  FROM clipped GROUP BY event_type"
    )


def ts_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p05/p95-winsorized robust mean per event type."""
    load_tables(spark, sf_dir)
    return spark.sql(_winsor_sql("percentile"))




def _chi2_sql() -> str:
    """Chi-square test of independence between event type and weekday
    (joins KS/Benford in the statistical-testing family): observed
    cell counts are exact; expected counts are exact-integer-product
    quotients; the χ² statistic sums per-cell terms floor-quantized at
    1e-6 (the DFT pattern).  dof = (r−1)(c−1) from exact cardinalities.
    One scan, one cell aggregation, metadata-sized algebra after."""
    return (
        "WITH obs AS ("
        "  SELECT event_type,"
        f"    CAST(FLOOR(ts_us / {86_400_000_000}.0) AS BIGINT) % 7 AS dow,"
        "    CAST(COUNT(*) AS BIGINT) AS o"
        "  FROM v_events GROUP BY 1, 2"
        "), rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),"
        " ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),"
        " n AS (SELECT CAST(SUM(o) AS BIGINT) AS nt FROM obs),"
        " cells AS ("
        "  SELECT obs.o, CAST(rt.r AS DOUBLE) * ct.c / nt AS e"
        "  FROM obs JOIN rt ON obs.event_type = rt.event_type"
        "  JOIN ct ON obs.dow = ct.dow CROSS JOIN n"
        "), dims AS ("
        "  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,"
        "    CAST(COUNT(DISTINCT dow) AS BIGINT) AS nc FROM obs"
        ") SELECT"
        "  CAST(CAST(SUM(CAST(FLOOR((o - e) * (o - e) / e * 1000000.0) AS BIGINT))"
        "    AS BIGINT) AS DOUBLE) / 1000000.0 AS chi2,"
        "  CAST((SELECT (nr - 1) * (nc - 1) FROM dims) AS BIGINT) AS dof,"
        "  CAST(COUNT(*) AS BIGINT) AS n_cells"
        " FROM cells"
    )


def profile_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence test: event type × weekday."""
    load_tables(spark, sf_dir)
    return spark.sql(_chi2_sql())


QUERIES = {
    "profile_table_stats": profile_table_stats,
    "profile_value_counts": profile_value_counts,
    "profile_ks_drift": profile_ks_drift,
    "profile_entropy_gini": profile_entropy_gini,
    "profile_corr_matrix": profile_corr_matrix,
    "dq_expectations": dq_expectations,
    "profile_benford_digits": profile_benford_digits,
    "ts_winsorized_mean": ts_winsorized_mean,
    "profile_chi2_independence": profile_chi2_independence,
}

ORACLES = {
    "profile_table_stats": _TABLE_STATS_ORACLE,
    "profile_value_counts": _VALUE_COUNTS_ORACLE,
    "profile_ks_drift": _KS_ORACLE,
    "profile_entropy_gini": inline_views(_entropy_sql()),
    "profile_corr_matrix": _corr_matrix_sql(),
    "dq_expectations": _dq_sql("COUNT(DISTINCT (l_orderkey, l_linenumber))"),
    "profile_benford_digits": _benford_sql("VARCHAR"),
    "ts_winsorized_mean": inline_views(_winsor_sql("quantile_cont")),
    "profile_chi2_independence": inline_views(_chi2_sql()),
}


_KANON_K = 5


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the privacy gate a
    dataset release runs before publication: every combination of
    quasi-identifier values must be shared by at least k individuals,
    or the row is re-identifiable by linkage.

    QI set: (c_nationkey, c_mktsegment) on customer.  Output: one row
    per equivalence class with its size and k-compliance, plus the
    re-identification risk of the class (1/size, the standard
    prosecutor-model risk — an exact small-int reciprocal, identical
    IEEE in both engines).

    Scale: a single groupBy on the QI columns — partial counts combine
    map-side; the audit never materializes individuals."""
    c = load_tables(spark, sf_dir)["customer"]
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("long").alias("class_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            (F.col("class_size") >= _KANON_K).alias("meets_k"),
            (F.lit(1.0) / F.col("class_size")).alias("reident_risk"),
        )
    )


_KANON_ORACLE = (
    "SELECT c_nationkey, c_mktsegment, "
    "CAST(COUNT(*) AS BIGINT) AS class_size, "
    f"COUNT(*) >= {_KANON_K} AS meets_k, "
    "CAST(1.0 AS DOUBLE) / COUNT(*) AS reident_risk "
    "FROM customer GROUP BY c_nationkey, c_mktsegment"
)

QUERIES["privacy_k_anonymity"] = privacy_k_anonymity
ORACLES["privacy_k_anonymity"] = _KANON_ORACLE


_LDIV_L = 3


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    homogeneity-attack complement of ``privacy_k_anonymity``: a class
    can satisfy k-anonymity and still leak if (nearly) every member
    shares the same *sensitive* value, so the release gate also
    requires >= l distinct sensitive values per quasi-identifier
    equivalence class.

    Release under audit: orders joined to the customer QI columns
    (c_nationkey, c_mktsegment); sensitive attribute =
    o_orderpriority.  Output per class: size, distinct sensitive
    count, l-compliance, and the top sensitive-value share (the
    homogeneity-attack success probability — MAX over exact per-value
    counts / exact class size, one IEEE division).

    Scale: one equi-join on the join key both tables already hash by,
    then two map-side-combinable groupBys — the second runs on the
    (QI x sensitive)-sized cell table, never the raw rows."""
    t = load_tables(spark, sf_dir)
    rel = t["orders"].join(
        t["customer"], t["orders"].o_custkey == t["customer"].c_custkey
    )
    cells = rel.groupBy("c_nationkey", "c_mktsegment", "o_orderpriority").agg(
        F.count("*").cast("long").alias("n")
    )
    return (
        cells.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("n").cast("long").alias("class_size"),
            F.count("*").cast("long").alias("n_sensitive_distinct"),
            F.max("n").cast("long").alias("top_n"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "n_sensitive_distinct",
            (F.col("n_sensitive_distinct") >= _LDIV_L).alias("meets_l"),
            F.round(
                F.col("top_n").cast("double") / F.col("class_size"), 6
            ).alias("top_sensitive_share"),
        )
    )


_LDIV_ORACLE = (
    "WITH cells AS ("
    "  SELECT c_nationkey, c_mktsegment, o_orderpriority,"
    "    CAST(COUNT(*) AS BIGINT) AS n"
    "  FROM orders JOIN customer ON o_custkey = c_custkey"
    "  GROUP BY 1, 2, 3"
    ") SELECT c_nationkey, c_mktsegment,"
    "  CAST(SUM(n) AS BIGINT) AS class_size,"
    "  CAST(COUNT(*) AS BIGINT) AS n_sensitive_distinct,"
    f"  COUNT(*) >= {_LDIV_L} AS meets_l,"
    "  ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_sensitive_share"
    "  FROM cells GROUP BY 1, 2"
)

QUERIES["privacy_l_diversity"] = privacy_l_diversity
ORACLES["privacy_l_diversity"] = _LDIV_ORACLE


_PSI_BINS = 10
_PSI_WIDTH = 50.0  # value domain is (0, 500) in the synthetic data


def profile_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per event type — the binned drift
    gate model-monitoring pipelines run beside the KS test
    (``profile_ks_drift`` answers "did the distribution move
    anywhere"; PSI localizes *how much mass moved between which
    bins*, the form score-monitoring dashboards alarm on).

    Same deterministic midpoint split as the KS gate, then ``value``
    is histogrammed into 10 fixed-width bins and
    PSI = sum over bins of (p2 - p1) * ln(p2 / p1), with
    Laplace-smoothed shares p_i = (c_i + 1)/(n_i + 10) so empty bins
    are well-defined (the standard practitioner fix).

    Scale shape: one scan -> per-(type, bin) counts (map-side
    combinable); the bin spine is exploded from the per-type totals
    row, so every later stage runs on |types| x 10 rows.  The 1-row
    time-bounds broadcast is the allowlisted KS pattern.

    Determinism (SURVEY §4.5): counts are exact BIGINTs; each share
    is one IEEE division of exact integers; ln can drift by an ulp,
    so each bin term is floor-quantized to integer billionths before
    the cross-bin SUM (the DFT/Stetson pattern), and the exact
    BIGINT total is divided and rounded once."""
    from .. import catalog

    ev = catalog.v_events(spark, sf_dir).select("event_type", "value", "ts_us")
    ev = ev.where(F.col("value").isNotNull())
    bounds = ev.agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi"))
    sided = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.least(
            F.floor(F.col("value") / _PSI_WIDTH), F.lit(_PSI_BINS - 1)
        )
        .cast("long")
        .alias("bin"),
        F.when(F.col("ts_us") * 2 <= F.col("lo") + F.col("hi"), 1)
        .otherwise(2)
        .alias("side"),
    )
    cnt = sided.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("side") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    spine = tot.select(
        "event_type",
        "n1",
        "n2",
        F.explode(F.expr(f"sequence(0, {_PSI_BINS - 1})")).alias("bin_i"),
    ).select("event_type", "n1", "n2", F.col("bin_i").cast("long").alias("bin"))
    j = spine.join(cnt, ["event_type", "bin"], "left").select(
        "event_type",
        "n1",
        "n2",
        F.coalesce("c1", F.lit(0).cast("long")).alias("c1"),
        F.coalesce("c2", F.lit(0).cast("long")).alias("c2"),
    )
    p1 = (F.col("c1") + 1).cast("double") / (F.col("n1") + _PSI_BINS)
    p2 = (F.col("c2") + 1).cast("double") / (F.col("n2") + _PSI_BINS)
    term_q = F.floor(
        F.lit(1000000000.0) * ((p2 - p1) * F.log(p2 / p1))
    ).cast("long")
    return (
        j.select("event_type", "n1", "n2", term_q.alias("tq"))
        .groupBy("event_type")
        .agg(
            F.max("n1").cast("long").alias("n_early"),
            F.max("n2").cast("long").alias("n_late"),
            F.round(
                F.sum("tq").cast("double") / 1000000000.0, 6
            ).alias("psi"),
        )
    )


_PSI_ORACLE = inline_views(
    "WITH ev AS (SELECT event_type, value, ts_us FROM v_events"
    "  WHERE value IS NOT NULL), "
    "b AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM ev), "
    "sided AS (SELECT event_type,"
    f"  CAST(LEAST(FLOOR(value / {_PSI_WIDTH}), {_PSI_BINS - 1}) AS BIGINT) AS bin,"
    "  CASE WHEN ts_us * 2 <= lo + hi THEN 1 ELSE 2 END AS side"
    "  FROM ev CROSS JOIN b), "
    "cnt AS (SELECT event_type, bin,"
    "  CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,"
    "  CAST(SUM(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2"
    "  FROM sided GROUP BY 1, 2), "
    "tot AS (SELECT event_type, CAST(SUM(c1) AS BIGINT) AS n1,"
    "  CAST(SUM(c2) AS BIGINT) AS n2 FROM cnt GROUP BY 1), "
    "spine AS (SELECT event_type, n1, n2,"
    f"  UNNEST(generate_series(0, {_PSI_BINS - 1})) AS bin FROM tot), "
    "j AS (SELECT spine.event_type, n1, n2,"
    "  COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2"
    "  FROM spine LEFT JOIN cnt"
    "  ON spine.event_type = cnt.event_type AND spine.bin = cnt.bin), "
    "t AS (SELECT event_type, n1, n2,"
    "  CAST(FLOOR(1000000000.0 * ("
    f"    (CAST(c2 + 1 AS DOUBLE) / (n2 + {_PSI_BINS})"
    f"     - CAST(c1 + 1 AS DOUBLE) / (n1 + {_PSI_BINS}))"
    f"    * LN((CAST(c2 + 1 AS DOUBLE) / (n2 + {_PSI_BINS}))"
    f"       / (CAST(c1 + 1 AS DOUBLE) / (n1 + {_PSI_BINS})))"
    "  )) AS BIGINT) AS tq FROM j) "
    "SELECT event_type, CAST(MAX(n1) AS BIGINT) AS n_early,"
    "  CAST(MAX(n2) AS BIGINT) AS n_late,"
    "  ROUND(CAST(SUM(tq) AS DOUBLE) / 1000000000.0, 6) AS psi"
    "  FROM t GROUP BY event_type"
)

QUERIES["profile_psi_drift"] = profile_psi_drift
ORACLES["profile_psi_drift"] = _PSI_ORACLE
