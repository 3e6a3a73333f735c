"""In-engine ML training as relational algebra (no MLlib, no driver math).

Two classic closed-form/counting learners, expressed so that training
is a single aggregation pass — the shapes that stay cheap at 100 TB
because the model, not the data, crosses the shuffle:

- ``ml_ols_normal_eq`` — ordinary least squares (2 features +
  intercept) by the normal equations: one scan accumulates the exact
  decimal moment matrix (the `profile_corr_matrix` trick extended to
  XᵀX / Xᵀy), then Cramer's rule solves the 3×3 system in a fixed
  double expression.  β and R² come out of 10 aggregated numbers
  regardless of row count.
- ``ml_nb_train_classify`` — multinomial Naive Bayes over the document
  corpus (class = lang) with add-1 smoothing, trained by two grouped
  counts and applied by a per-(doc, class) log-score aggregation.
  Vocabulary and class tables are broadcast-sized; scoring fans each
  token row out |classes| ways map-side.

Determinism (SURVEY §4.5): every cross-row sum is an exact DECIMAL or
quantized-BIGINT sum; Cramer determinants are fixed expressions over
exact operands; NB per-token log terms are floor-quantized at 1e-9
(ln differs by 1 ulp across engines) and the argmax breaks ties on
the class name — a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_tables
from ._oracle import inline_views

# Target: per-line gross revenue (qty · price) — the driver's synthetic
# columns are mutually independent, so a column-on-column fit would be
# R² ≈ 0; the bilinear revenue target is genuinely (partially)
# explained by its linear factors, giving the fit something real to
# recover (R² ≈ 0.86 at sf0.01).
_Y = "(l_quantity * l_extendedprice)"
_X1 = "l_quantity"
_X2 = "l_extendedprice"


def _det3(m: list[list[str]]) -> str:
    """3×3 determinant as SQL text (expansion along the first row)."""
    (a, b, c), (d, e, f), (g, h, i) = m
    return (
        f"({a}) * (({e}) * ({i}) - ({f}) * ({h}))"
        f" - ({b}) * (({d}) * ({i}) - ({f}) * ({g}))"
        f" + ({c}) * (({d}) * ({h}) - ({e}) * ({g}))"
    )


def _ols_sql() -> str:
    moments = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n,"
        f" CAST(SUM(CAST({_X1} AS DECIMAL(24,6))) AS DOUBLE) AS s1,"
        f" CAST(SUM(CAST({_X2} AS DECIMAL(24,6))) AS DOUBLE) AS s2,"
        f" CAST(SUM(CAST({_Y} AS DECIMAL(26,6))) AS DOUBLE) AS sy,"
        f" CAST(SUM(CAST({_X1} * {_X1} AS DECIMAL(30,8))) AS DOUBLE) AS s11,"
        f" CAST(SUM(CAST({_X1} * {_X2} AS DECIMAL(30,8))) AS DOUBLE) AS s12,"
        f" CAST(SUM(CAST({_X2} * {_X2} AS DECIMAL(30,8))) AS DOUBLE) AS s22,"
        f" CAST(SUM(CAST({_X1} * {_Y} AS DECIMAL(34,6))) AS DOUBLE) AS s1y,"
        f" CAST(SUM(CAST({_X2} * {_Y} AS DECIMAL(34,6))) AS DOUBLE) AS s2y,"
        f" CAST(SUM(CAST({_Y} * {_Y} AS DECIMAL(38,4))) AS DOUBLE) AS syy"
        " FROM lineitem"
    )
    A = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    b = ["sy", "s1y", "s2y"]
    det = _det3(A)

    def col_swapped(k: int) -> str:
        m = [row[:] for row in A]
        for r in range(3):
            m[r][k] = b[r]
        return _det3(m)

    beta = [f"({col_swapped(k)}) / ({det})" for k in range(3)]
    sse = f"syy - ({beta[0]}) * sy - ({beta[1]}) * s1y - ({beta[2]}) * s2y"
    sst = "syy - sy * sy / n"
    return (
        f"WITH m AS ({moments})"
        f" SELECT n AS n_rows,"
        f"  ROUND({beta[0]}, 6) AS beta0,"
        f"  ROUND({beta[1]}, 6) AS beta1,"
        f"  ROUND({beta[2]}, 6) AS beta2,"
        f"  ROUND(1.0 - ({sse}) / ({sst}), 6) AS r2"
        "  FROM m"
    )


def ml_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of revenue (qty·price) ~ quantity + extendedprice via
    exact normal-equation moments (see module header)."""
    load_tables(spark, sf_dir)
    return spark.sql(_ols_sql())


_NB_SMOOTH = 1  # add-1 (Laplace) smoothing


def _nb_sql(toks_clause: str) -> str:
    """Train-and-classify multinomial NB; scored docs are the
    doc_id % 7 = 0 sample (train = full corpus)."""
    return (
        f"WITH toks AS ({toks_clause}),"
        " lab AS (SELECT doc_id, lang FROM documents),"
        " cls AS ("
        "  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM lab GROUP BY lang"
        "), tot_docs AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nd FROM cls),"
        " cw AS ("
        "  SELECT lab.lang, t.token, CAST(COUNT(*) AS BIGINT) AS c"
        "  FROM toks t JOIN lab ON t.doc_id = lab.doc_id"
        "  GROUP BY lab.lang, t.token"
        "), ctot AS ("
        "  SELECT lang, CAST(SUM(c) AS BIGINT) AS tw FROM cw GROUP BY lang"
        "), vocab AS ("
        "  SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM toks"
        "), scored AS ("
        "  SELECT t.doc_id, c.lang,"
        "    CAST(SUM(CAST(FLOOR(ln("
        f"      (COALESCE(cw.c, 0) + {_NB_SMOOTH}.0) / (ctot.tw + {_NB_SMOOTH} * vocab.v)"
        "     ) * 1000000000.0) AS BIGINT)) AS BIGINT)"
        "    + CAST(FLOOR(ln(CAST(c.n_docs AS DOUBLE) / tot_docs.nd)"
        "        * 1000000000.0) AS BIGINT) AS score_q"
        "  FROM toks t CROSS JOIN cls c"
        "  LEFT JOIN cw ON cw.lang = c.lang AND cw.token = t.token"
        "  JOIN ctot ON ctot.lang = c.lang"
        "  CROSS JOIN vocab CROSS JOIN tot_docs"
        "  WHERE t.doc_id % 7 = 0"
        "  GROUP BY t.doc_id, c.lang, c.n_docs, ctot.tw, vocab.v, tot_docs.nd"
        "), best AS ("
        "  SELECT doc_id, lang AS pred_lang, score_q,"
        "    ROW_NUMBER() OVER (PARTITION BY doc_id"
        "      ORDER BY score_q DESC, lang) AS rk"
        "  FROM scored"
        ") SELECT b.doc_id, b.pred_lang, lab.lang AS true_lang,"
        "    CASE WHEN b.pred_lang = lab.lang THEN 1 ELSE 0 END AS correct"
        "  FROM best b JOIN lab ON b.doc_id = lab.doc_id WHERE b.rk = 1"
    )


_SPARK_NB_TOKS = (
    "SELECT doc_id, token FROM documents"
    " LATERAL VIEW explode(split(text, ' ')) t AS token"
)
_DUCK_NB_TOKS = (
    "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
)


def ml_nb_train_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial NB language classification (train on corpus,
    score the doc_id % 7 sample)."""
    load_tables(spark, sf_dir)
    return spark.sql(_nb_sql(_SPARK_NB_TOKS))




def _did_sql() -> str:
    """Difference-in-differences estimator — the workhorse of
    observational causal inference on event streams: treatment group
    (even user_id — scale-independent) vs control, pre/post the time
    midpoint; the
    effect is (T_post − T_pre) − (C_post − C_pre) on mean purchase
    value.  All four cell means are exact cents-sum / count quotients;
    the DiD is a fixed double expression over them (no rounding,
    §4.5 rule 2).  One scan, one 4-group aggregation."""
    return (
        "WITH b AS ("
        "  SELECT CAST(FLOOR((MIN(ts_us) + MAX(ts_us)) / 2) AS BIGINT) AS mid"
        "  FROM v_events WHERE event_type = 'purchase'"
        "), cells AS ("
        "  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,"
        "    CASE WHEN ts_us > mid THEN 1 ELSE 0 END AS post,"
        "    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,"
        "    CAST(COUNT(*) AS BIGINT) AS n"
        "  FROM v_events CROSS JOIN b WHERE event_type = 'purchase'"
        "  GROUP BY 1, 2"
        "), m AS ("
        "  SELECT"
        "    MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(cents AS DOUBLE) / n END) AS t1,"
        "    MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(cents AS DOUBLE) / n END) AS t0,"
        "    MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(cents AS DOUBLE) / n END) AS c1,"
        "    MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(cents AS DOUBLE) / n END) AS c0,"
        "    CAST(SUM(n) AS BIGINT) AS n_total"
        "  FROM cells"
        ") SELECT n_total,"
        "    (t1 - t0) / 100.0 AS treated_delta,"
        "    (c1 - c0) / 100.0 AS control_delta,"
        "    ((t1 - t0) - (c1 - c0)) / 100.0 AS did_estimate"
        "  FROM m"
    )


def causal_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD effect estimate on mean purchase value."""
    load_tables(spark, sf_dir)
    return spark.sql(_did_sql())


QUERIES = {
    "ml_ols_normal_eq": ml_ols_normal_eq,
    "ml_nb_train_classify": ml_nb_train_classify,
    "causal_diff_in_diff": causal_diff_in_diff,
}

ORACLES = {
    "ml_ols_normal_eq": _ols_sql(),
    "ml_nb_train_classify": inline_views(_nb_sql(_DUCK_NB_TOKS)),
    "causal_diff_in_diff": inline_views(_did_sql()),
}
