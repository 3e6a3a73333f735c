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


#: The original (engine-agnostic) NB scoring pass: CROSS JOIN the
#: sampled token-occurrence stream with the class table.  The DuckDB
#: oracle keeps this formulation — since round 10 it is an INDEPENDENT
#: derivation of the engine's pivoted scoring pass below.
_NB_SCORED_CROSSJOIN = (
    " scored AS ("
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
    ")"
)

#: Round-10 pivoted scoring pass — ENGINE side only (VERDICT r9 #6,
#: guide §2.3 "aggregate before you shuffle / shuffle fewer bytes"):
#: the cross-join form fans the sampled occurrence stream out
#: |classes|× and shuffles that against the (lang, token) count table.
#: Here the |classes|× completion (including the Laplace default for
#: unseen (lang, token) pairs) happens on the VOCABULARY — bounded,
#: Heaps-law-slow-growing — producing one per-token array of |classes|
#: quantized weights; the sampled stream joins that map ONCE and
#: explodes in-task straight into the partial aggregation, so the
#: shuffle carries (doc, lang) partials instead of |classes|× the
#: occurrence stream.  Results are identical: each (doc, lang) score
#: is the SUM of the exact same FLOOR-quantized BIGINT addends
#: (integer addition is order-free) plus the same class prior — and
#: the oracle now checks this through the structurally different
#: cross-join derivation.  (LATERAL VIEW is Spark syntax, another
#: reason this block is engine-side only.)
_NB_SCORED_PIVOT = (
    " tokw AS ("
    "  SELECT vt.token, c.lang, c.n_docs,"
    "    CAST(FLOOR(ln("
    f"      (COALESCE(cw.c, 0) + {_NB_SMOOTH}.0) / (ctot.tw + {_NB_SMOOTH} * vocab.v)"
    "     ) * 1000000000.0) AS BIGINT) AS wq"
    "  FROM (SELECT DISTINCT token FROM toks) vt"
    "  CROSS JOIN cls c"
    "  LEFT JOIN cw ON cw.lang = c.lang AND cw.token = vt.token"
    "  JOIN ctot ON ctot.lang = c.lang"
    "  CROSS JOIN vocab"
    "), tokmap AS ("
    "  SELECT token, collect_list(named_struct('lang', lang, 'wq', wq)) AS ws"
    "  FROM tokw GROUP BY token"
    "), prior AS ("
    "  SELECT c.lang,"
    "    CAST(FLOOR(ln(CAST(c.n_docs AS DOUBLE) / tot_docs.nd)"
    "        * 1000000000.0) AS BIGINT) AS pq"
    "  FROM cls c CROSS JOIN tot_docs"
    "), scored AS ("
    "  SELECT s.doc_id, s.lang, s.sq + p.pq AS score_q"
    "  FROM ("
    "    SELECT t.doc_id, w.lang AS lang, CAST(SUM(w.wq) AS BIGINT) AS sq"
    "    FROM toks t JOIN tokmap m ON m.token = t.token"
    "    LATERAL VIEW explode(m.ws) ex AS w"
    "    WHERE t.doc_id % 7 = 0"
    "    GROUP BY t.doc_id, w.lang"
    "  ) s JOIN prior p ON s.lang = p.lang"
    ")"
)


def _nb_sql(toks_clause: str, scored_clause: str = _NB_SCORED_CROSSJOIN) -> str:
    """Train-and-classify multinomial NB; scored docs are the
    doc_id % 7 = 0 sample (train = full corpus).  ``scored_clause``
    selects the scoring-pass formulation: the engine runs the pivoted
    single-token-pass form, the oracle the original cross-join form —
    both produce identical (doc, lang, score_q) rows (see
    _NB_SCORED_PIVOT's exactness note)."""
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
        f"),{scored_clause}, best AS ("
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
    return spark.sql(_nb_sql(_SPARK_NB_TOKS, _NB_SCORED_PIVOT))




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




def _ab_ztest_sql() -> str:
    """Welch two-sample z-test on purchase value, treatment = even
    user_id (the same scale-free assignment as the DiD op) — the A/B
    readout every experimentation pipeline serves.

    Determinism (§4.5): group moments are EXACT integers (cents and
    cents² sums — cents ≤ ~10⁷ so the squared sum stays far inside
    BIGINT); means/variances/z are fixed double expressions over those
    exact ints, identical in both engines; only the final z is rounded.
    One scan, one 2-group aggregation — nothing scales with data but
    the partial-aggregate combine."""
    cents = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"
    return (
        "WITH g AS ("
        "  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,"
        "    CAST(COUNT(*) AS BIGINT) AS n,"
        f"   CAST(SUM({cents}) AS BIGINT) AS sc,"
        f"   CAST(SUM({cents} * {cents}) AS BIGINT) AS sc2"
        "  FROM v_events WHERE event_type = 'purchase' GROUP BY 1"
        "), m AS ("
        "  SELECT treated, n,"
        "    CAST(sc AS DOUBLE) / 100.0 / n AS mean,"
        "    (CAST(sc2 AS DOUBLE) / 10000.0"
        "      - n * (CAST(sc AS DOUBLE) / 100.0 / n) * (CAST(sc AS DOUBLE) / 100.0 / n))"
        "      / (n - 1) AS var FROM g"
        ") SELECT t.n AS n_treat, c.n AS n_ctrl,"
        "  t.mean AS mean_treat, c.mean AS mean_ctrl,"
        "  ROUND((t.mean - c.mean) / SQRT(t.var / t.n + c.var / c.n), 6) AS z"
        "  FROM (SELECT * FROM m WHERE treated = 1) t"
        "  CROSS JOIN (SELECT * FROM m WHERE treated = 0) c"
    )


def ab_welch_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch z-test of treatment vs control purchase value."""
    load_tables(spark, sf_dir)
    return spark.sql(_ab_ztest_sql())




def _logit_sql() -> str:
    """Logistic regression by two distributed Newton steps (IRLS) —
    P(l_returnflag = 'R') ~ 1 + quantity + discount.

    Scale/determinism design (the ``vec_pca_power`` recipe applied to
    IRLS): each Newton step reduces the fact table to NINE aggregate
    moments (3×3 weighted Gram + gradient); the 3×3 Cramer solve is a
    fixed double expression over them, so the MODEL crosses the
    shuffle, never the data.  Step 1 (β=0 ⇒ p=½, W=¼I) uses EXACT
    integer moments (2-dp fixed-point cents).  Step 2's per-row
    σ(βᵀx) needs libm ``exp`` — its contributions are FLOOR-quantized
    to 1e-6 units and summed as BIGINT, absorbing cross-engine libm
    ulps exactly like the Lomb–Scargle/DFT trig sums (§4.5).  The
    readout adds a third pass scoring training accuracy at η ≥ 0.
    """
    y = "(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
    q = "CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)"   # exact cents
    d = "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)"
    u = f"(2 * {y} - 1)"  # ±1
    m1 = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n,"
        f" CAST(SUM({q}) AS BIGINT) AS sq, CAST(SUM({d}) AS BIGINT) AS sd,"
        f" CAST(SUM({q} * {q}) AS BIGINT) AS sqq,"
        f" CAST(SUM({q} * {d}) AS BIGINT) AS sqd,"
        f" CAST(SUM({d} * {d}) AS BIGINT) AS sdd,"
        f" CAST(SUM({u}) AS BIGINT) AS su,"
        f" CAST(SUM({u} * {q}) AS BIGINT) AS suq,"
        f" CAST(SUM({u} * {d}) AS BIGINT) AS sud"
        " FROM lineitem"
    )
    # descaled doubles (exact ints -> correctly-rounded doubles)
    A1 = [
        ["CAST(n AS DOUBLE)", "CAST(sq AS DOUBLE) / 100", "CAST(sd AS DOUBLE) / 100"],
        ["CAST(sq AS DOUBLE) / 100", "CAST(sqq AS DOUBLE) / 10000", "CAST(sqd AS DOUBLE) / 10000"],
        ["CAST(sd AS DOUBLE) / 100", "CAST(sqd AS DOUBLE) / 10000", "CAST(sdd AS DOUBLE) / 10000"],
    ]
    g1 = ["CAST(su AS DOUBLE) / 2", "CAST(suq AS DOUBLE) / 200", "CAST(sud AS DOUBLE) / 200"]

    def solve(A: list[list[str]], g: list[str], scale: str) -> list[str]:
        det = _det3(A)
        out = []
        for k in range(3):
            m = [row[:] for row in A]
            for r in range(3):
                m[r][k] = g[r]
            out.append(f"({scale}) * ({_det3(m)}) / ({det})")
        return out

    b1 = solve(A1, g1, "4.0")  # (¼ XᵀX)⁻¹ g = 4 (XᵀX)⁻¹ g
    beta1 = ", ".join(f"({e}) AS b1_{k}" for k, e in enumerate(b1))

    eta = "(b1_0 + b1_1 * l_quantity + b1_2 * l_discount)"
    p = f"(1.0 / (1.0 + exp(-{eta})))"
    w = f"({p} * (1.0 - {p}))"
    r = f"({y} - {p})"
    Q6 = "CAST(FLOOR(({e}) * 1000000.0) AS BIGINT)"
    ents = {
        "w11": w, "w1q": f"{w} * l_quantity", "w1d": f"{w} * l_discount",
        "wqq": f"{w} * l_quantity * l_quantity",
        "wqd": f"{w} * l_quantity * l_discount",
        "wdd": f"{w} * l_discount * l_discount",
        "g0": r, "gq": f"{r} * l_quantity", "gd": f"{r} * l_discount",
    }
    m2 = (
        "SELECT "
        + ", ".join(
            f"CAST(SUM({Q6.format(e=e)}) AS BIGINT) AS {k}" for k, e in ents.items()
        )
        + " FROM lineitem CROSS JOIN b1"
    )
    A2 = [
        ["CAST(w11 AS DOUBLE) / 1e6", "CAST(w1q AS DOUBLE) / 1e6", "CAST(w1d AS DOUBLE) / 1e6"],
        ["CAST(w1q AS DOUBLE) / 1e6", "CAST(wqq AS DOUBLE) / 1e6", "CAST(wqd AS DOUBLE) / 1e6"],
        ["CAST(w1d AS DOUBLE) / 1e6", "CAST(wqd AS DOUBLE) / 1e6", "CAST(wdd AS DOUBLE) / 1e6"],
    ]
    g2 = ["CAST(g0 AS DOUBLE) / 1e6", "CAST(gq AS DOUBLE) / 1e6", "CAST(gd AS DOUBLE) / 1e6"]
    step2 = solve(A2, g2, "1.0")
    beta2 = ", ".join(f"(b1_{k} + ({e})) AS b2_{k}" for k, e in enumerate(step2))

    eta2 = "(b2_0 + b2_1 * l_quantity + b2_2 * l_discount)"
    acc = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,"
        f" CAST(SUM(CASE WHEN ({eta2} >= 0) = ({y} = 1) THEN 1 ELSE 0 END) AS BIGINT)"
        "  AS n_correct FROM lineitem CROSS JOIN b2"
    )
    return (
        f"WITH m1 AS ({m1}), b1 AS (SELECT {beta1} FROM m1),"
        f" m2 AS ({m2}), b2 AS (SELECT {beta2} FROM b1 CROSS JOIN m2),"
        f" a AS ({acc})"
        " SELECT n_rows, n_correct,"
        "  ROUND(b2_0, 6) AS beta0, ROUND(b2_1, 6) AS beta1, ROUND(b2_2, 6) AS beta2"
        " FROM a CROSS JOIN b2"
    )


def ml_logit_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step Newton logistic regression; see ``_logit_sql``."""
    load_tables(spark, sf_dir)
    return spark.sql(_logit_sql())


def _auc_sql() -> str:
    """Exact tie-aware ROC-AUC (Mann–Whitney rank form) of ``value``
    as a ranking score for purchase events.

    The question every offline model-eval pipeline asks — "how well
    does this score rank the positives?" — computed exactly, not
    sampled.  AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the sum
    of the *midranks* (average rank over score ties) of the positive
    rows.

    Scale shape: one groupBy(score) partial-aggregates the data down
    to the distinct-score table (≤ |score domain| rows — at 100 TB a
    quantized score keeps this metadata-sized), then the cumulative
    window and the final fold run over that reduced table only; the
    raw data is never sorted globally.

    Determinism (§4.5): midranks are held as 2·midrank BIGINTs
    (2·mid = 2·cum_before + n + 1, always integral), so every
    cross-row accumulation is an exact integer sum; the single final
    division is one fixed double expression.  AUC = (Σ2mr − n⁺(n⁺+1))
    / (2·n⁺·n⁻)."""
    return (
        "WITH e AS ("
        "  SELECT value AS s,"
        "    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y"
        "  FROM v_events WHERE value IS NOT NULL"
        "), g AS ("
        "  SELECT s, CAST(COUNT(*) AS BIGINT) AS n,"
        "    CAST(SUM(y) AS BIGINT) AS np"
        "  FROM e GROUP BY s"
        "), w AS ("
        "  SELECT n, np,"
        "    2 * COALESCE(SUM(n) OVER (ORDER BY s"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
        "      CAST(0 AS BIGINT)) + n + 1 AS mr2"
        "  FROM g"
        "), t AS ("
        "  SELECT CAST(SUM(np * mr2) AS BIGINT) AS r2,"
        "    CAST(SUM(np) AS BIGINT) AS npos,"
        "    CAST(SUM(n) - SUM(np) AS BIGINT) AS nneg"
        "  FROM w"
        ") SELECT npos AS n_pos, nneg AS n_neg,"
        "  ROUND(CAST(r2 - npos * (npos + 1) AS DOUBLE)"
        "    / (2.0 * npos * nneg), 6) AS auc"
        "  FROM t"
    )


def ml_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC of value-as-score for purchases."""
    load_tables(spark, sf_dir)
    return spark.sql(_auc_sql())


def _calibration_sql() -> str:
    """Reliability-diagram bins for a [0,1] score against the purchase
    label: 10 equi-width bins over p = value/500, each reporting row
    count, mean predicted probability, empirical positive rate and the
    |gap| between them (the per-bin term of expected calibration
    error).

    The score is a fixture (a monotone rescale of ``value``, whose
    domain is (0, 500) in the synthetic data) — the operator under
    test is the binned-calibration mechanism, not the model.

    Determinism (§4.5): scores are quantized to exact cent BIGINTs
    before any cross-row sum (the Q1 scaled-integer-partials trick),
    bin ids come from one per-row IEEE division + floor (identical in
    both engines), and each output is a fixed double expression over
    exact integers, rounded once.  One scan, one 10-group aggregation."""
    cents = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"
    return (
        "WITH e AS ("
        "  SELECT CAST(LEAST(FLOOR(value / 50.0), 9) AS BIGINT) AS bin,"
        f"   {cents} AS c,"
        "    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y"
        "  FROM v_events WHERE value IS NOT NULL"
        "), g AS ("
        "  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,"
        "    CAST(SUM(c) AS BIGINT) AS sc,"
        "    CAST(SUM(y) AS BIGINT) AS npos"
        "  FROM e GROUP BY bin"
        ") SELECT bin, n,"
        "  ROUND(CAST(sc AS DOUBLE) / (100.0 * 500.0 * n), 6) AS mean_pred,"
        "  ROUND(CAST(npos AS DOUBLE) / n, 6) AS frac_pos,"
        "  ROUND(ABS(CAST(sc AS DOUBLE) / (100.0 * 500.0 * n)"
        "    - CAST(npos AS DOUBLE) / n), 6) AS abs_gap"
        "  FROM g"
    )


def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin calibration (reliability diagram) of value/500 vs
    the purchase label."""
    load_tables(spark, sf_dir)
    return spark.sql(_calibration_sql())


def _auc_pr_sql() -> str:
    """Exact average precision (area under the precision–recall curve
    in its step form): AP = Σ_t ΔR(t)·P(t) over distinct score
    thresholds in descending order, ties grouped — sklearn's
    ``average_precision_score`` definition, computed exactly over the
    full data instead of a sample.

    Same scale shape as ``ml_auc_rank``: groupBy(score) reduces the
    data to the distinct-score table; the descending cumulative window
    and final fold touch only that.

    Determinism (§4.5): the only non-integer inputs are the per-group
    precision ratios cum_pos/cum_n — one IEEE division each, identical
    in both engines — which are floor-quantized at 1e-9 into BIGINTs
    before the cross-row sum (the NB/logit quantization trick), so the
    accumulation is exact integer arithmetic; max Σ np·⌊1e9·P⌋ ≈
    n_pos·1e9 ≪ 2⁶³."""
    return (
        "WITH e AS ("
        "  SELECT value AS s,"
        "    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y"
        "  FROM v_events WHERE value IS NOT NULL"
        "), g AS ("
        "  SELECT s, CAST(COUNT(*) AS BIGINT) AS n,"
        "    CAST(SUM(y) AS BIGINT) AS np"
        "  FROM e GROUP BY s"
        "), c AS ("
        "  SELECT np,"
        "    CAST(SUM(n) OVER (ORDER BY s DESC"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn,"
        "    CAST(SUM(np) OVER (ORDER BY s DESC"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cump"
        "  FROM g"
        "), t AS ("
        "  SELECT CAST(SUM(np * CAST(FLOOR(1e9 * (CAST(cump AS DOUBLE) / cumn))"
        "      AS BIGINT)) AS BIGINT) AS acc,"
        "    CAST(SUM(np) AS BIGINT) AS npos,"
        "    CAST(MAX(cumn) AS BIGINT) AS ntot"
        "  FROM c"
        ") SELECT npos AS n_pos, ntot - npos AS n_neg,"
        "  ROUND(CAST(acc AS DOUBLE) / (1e9 * npos), 6) AS avg_precision"
        "  FROM t"
    )


def ml_auc_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (PR-curve area, step form) of
    value-as-score for purchases."""
    load_tables(spark, sf_dir)
    return spark.sql(_auc_pr_sql())


def _lift_gains_sql() -> str:
    """Cumulative gains / lift table at score deciles — the fourth
    member of the offline-eval quartet (`ml_auc_rank` ranks,
    `ml_auc_pr` summarizes the PR curve, `ml_calibration_bins` checks
    probability calibration; this is the campaign-targeting readout:
    "contact the top d deciles by score, capture what share of the
    positives?").

    Same scale shape as the AUC pair: groupBy(score) reduces the data
    to the distinct-score table; one descending cumulative window and
    a 10-group fold run over that only.  Tie handling is exact and
    order-free: a whole score-group lands in the decile of its LAST
    cumulative row (CEIL(10*cumn/N)), so no within-tie ordering is
    ever needed; deciles fully covered by one giant tie simply do not
    emit a row — identically in both engines.

    Determinism (§4.5): counts are BIGINTs end-to-end; gain and lift
    are fixed double expressions over exact integers, rounded once."""
    return (
        "WITH e AS ("
        "  SELECT value AS s,"
        "    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y"
        "  FROM v_events WHERE value IS NOT NULL"
        "), g AS ("
        "  SELECT s, CAST(COUNT(*) AS BIGINT) AS n,"
        "    CAST(SUM(y) AS BIGINT) AS np"
        "  FROM e GROUP BY s"
        "), c AS ("
        "  SELECT"
        "    CAST(SUM(n) OVER (ORDER BY s DESC"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn,"
        "    CAST(SUM(np) OVER (ORDER BY s DESC"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cump"
        "  FROM g"
        "), t AS ("
        "  SELECT CAST(MAX(cumn) AS BIGINT) AS nt,"
        "    CAST(MAX(cump) AS BIGINT) AS pt FROM c"
        "), d AS ("
        "  SELECT CAST(CEIL(cumn * 10.0 / nt) AS BIGINT) AS decile,"
        "    cumn, cump, nt, pt"
        "  FROM c CROSS JOIN t"
        ") SELECT decile,"
        "  CAST(MAX(cumn) AS BIGINT) AS n_cum,"
        "  CAST(MAX(cump) AS BIGINT) AS pos_cum,"
        "  ROUND(CAST(MAX(cump) AS DOUBLE) / MAX(pt), 6) AS gain,"
        "  ROUND((CAST(MAX(cump) AS DOUBLE) / MAX(pt))"
        "    / (CAST(MAX(cumn) AS DOUBLE) / MAX(nt)), 6) AS lift"
        "  FROM d GROUP BY decile"
    )


def ml_lift_gains_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains + lift at score deciles (tie-exact)."""
    load_tables(spark, sf_dir)
    return spark.sql(_lift_gains_sql())


QUERIES = {
    "ml_ols_normal_eq": ml_ols_normal_eq,
    "ml_nb_train_classify": ml_nb_train_classify,
    "causal_diff_in_diff": causal_diff_in_diff,
    "ab_welch_ztest": ab_welch_ztest,
    "ml_logit_newton": ml_logit_newton,
    "ml_auc_rank": ml_auc_rank,
    "ml_calibration_bins": ml_calibration_bins,
    "ml_auc_pr": ml_auc_pr,
    "ml_lift_gains_curve": ml_lift_gains_curve,
}

ORACLES = {
    "ml_ols_normal_eq": _ols_sql(),
    "ml_nb_train_classify": inline_views(_nb_sql(_DUCK_NB_TOKS)),
    "causal_diff_in_diff": inline_views(_did_sql()),
    "ab_welch_ztest": inline_views(_ab_ztest_sql()),
    "ml_logit_newton": _logit_sql(),
    "ml_auc_rank": inline_views(_auc_sql()),
    "ml_calibration_bins": inline_views(_calibration_sql()),
    "ml_auc_pr": inline_views(_auc_pr_sql()),
    "ml_lift_gains_curve": inline_views(_lift_gains_sql()),
}
