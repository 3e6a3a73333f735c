"""Survival analysis over the events stream — Kaplan–Meier estimator.

Time-to-conversion survival: for each user, the HOURS from first
activity to first purchase; users who never purchase are
right-censored at their last observed activity.  S(t) = P(still
unconverted after t hours), the product-limit estimator of Kaplan &
Meier 1958: S(t_i) = Π_{j≤i} (1 − d_j / n_j) over ordered distinct
conversion times, d_j conversions at t_j, n_j users still at risk.

Scale + determinism design:

- one keyed aggregation builds (first_us, first_purchase_us, last_us)
  per user — integer µs, single shuffle;
- at-risk counts WITHOUT a per-(user × step) join: users are counted
  per observed hour, and n_j is a DESCENDING cumulative sum over that
  metadata-sized histogram (nothing quadratic ever forms);
- the survival product: per-step ln(1 − d/n) is libm — each value is
  FLOOR-quantized to 1e-6 units (BIGINT) so the running product is an
  EXACT integer cumulative sum (the Lomb–Scargle/DFT recipe, SURVEY
  §4.5); ``cum_log_q6`` is hash-exact.  The convenience ``survival``
  column re-exponentiates and rounds to 6 dp (rule-2: ROUND only
  genuinely-noisy float results).
- d_j = n_j (everyone remaining converts) would be ln(0): mapped to
  the sentinel quantized log ``_LOG_FLOOR_Q6`` on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ._oracle import inline_views

_US_PER_HOUR = 3_600_000_000
_LOG_FLOOR_Q6 = -13_815_511  # floor(ln(1e-6) * 1e6) — the d == n sentinel


def _km_sql() -> str:
    return (
        "WITH per_user AS ("
        "  SELECT user_id,"
        "    CAST(MIN(ts_us) AS BIGINT) AS first_us,"
        "    CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) AS BIGINT)"
        "      AS first_p_us,"
        "    CAST(MAX(ts_us) AS BIGINT) AS last_us"
        "  FROM v_events GROUP BY user_id"
        "), lab AS ("
        "  SELECT (first_p_us IS NULL) AS censored,"
        f"   CAST(FLOOR((COALESCE(first_p_us, last_us) - first_us) / {_US_PER_HOUR}.0)"
        "      AS BIGINT) AS t_obs"
        "  FROM per_user"
        "), hist AS ("
        "  SELECT t_obs AS t,"
        "    CAST(COUNT(*) AS BIGINT) AS n_total,"
        "    CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d"
        "  FROM lab GROUP BY t_obs"
        "), risk AS ("
        "  SELECT t, d,"
        "    CAST(SUM(n_total) OVER (ORDER BY t DESC"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk"
        "  FROM hist"
        "), steps AS ("
        "  SELECT t, d, n_risk,"
        "    CASE WHEN d >= n_risk THEN " + str(_LOG_FLOOR_Q6) +
        "      WHEN d = 0 THEN 0"
        "      ELSE CAST(FLOOR(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))"
        "        * 1000000.0) AS BIGINT) END AS log_q6"
        "  FROM risk"
        ") SELECT t AS t_hour, n_risk, d AS n_conversions,"
        "  CAST(SUM(log_q6) OVER (ORDER BY t"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_log_q6,"
        "  ROUND(exp(CAST(SUM(log_q6) OVER (ORDER BY t"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000.0), 6)"
        "    AS survival"
        "  FROM steps WHERE d > 0"
    )


def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM time-to-first-purchase survival curve; see module doc."""
    load_tables(spark, sf_dir)
    return spark.sql(_km_sql())


QUERIES = {"survival_kaplan_meier": survival_kaplan_meier}
ORACLES = {"survival_kaplan_meier": inline_views(_km_sql())}
