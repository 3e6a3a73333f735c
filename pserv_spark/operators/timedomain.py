"""Time-domain analysis operators: DFT periodogram + lag cross-correlation.

Two classic unevenly-sampled-time-series tools from the variable-star /
AGN literature, applied to the events stream (the stand-in for the
reference's ForcedSource light curves — public repo:
python/desc/pserv/, forced-photometry ingest, SURVEY §1.1):

- ``lightcurve_dft_power`` — the Deeming (1975) discrete-Fourier-
  transform periodogram for unevenly sampled data:
  P(f) = [ (Σ v·cos 2πft)² + (Σ v·sin 2πft)² ] / N.  Complements the
  Stellingwerf PDM periodogram (``lightcurve_periodogram``): PDM is
  trig-free, DFT is the frequency-domain standard.
- ``lightcurve_dcf_lag`` — discrete correlation function between two
  event-type "bands" (click vs purchase daily series) over a grid of
  day lags — the band-to-band lag measurement used for reverberation
  mapping, as a daily-binned Pearson correlation per lag.

Scale path: both are explode-before-shuffle single-pass aggregations —
trial frequencies (resp. lags) are fanned out map-side, then ONE
partially-aggregated groupBy collapses rows × n_freq to
users × n_freq.  No self-join on the fact table, no window over the
full series; at 100 TB the only exchange is the final keyed aggregate.

Determinism (SURVEY §4.5): Java ``Math.cos`` and libm ``cos`` disagree
in the last ulp on ~0.4% of arguments (measured: 874/200k values), so
raw trig sums cannot hash-match.  The Stetson-J quantization pattern
absorbs this: per-row terms are floored to integer millionths
(``CAST(FLOOR(x*1e6) AS BIGINT)``) before the SUM, making the
aggregation exact-integer and order-independent; a 1-ulp trig
difference changes the floored value only when x·1e6 sits within 1 ulp
of an integer boundary (probability ~2⁻⁴⁶ per row — measure-zero).
The DCF rounds ``corr`` to 4 digits, the same tolerance the validated
``agg_corr`` corpus query uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..catalog import load_tables
from ._oracle import inline_views

#: Trial periods (days) for the DFT periodogram.
_PERIODS_D = (0.5, 1.0, 3.0, 7.0)

#: Day lags for the discrete correlation function.
_LAGS = tuple(range(-3, 4))

#: Shared arithmetic (identical text both engines ⇒ identical double
#: expression trees; only cos/sin may differ by 1 ulp, absorbed by the
#: floor-quantization).
_THETA = "2 * pi() * (ts_us / 86400000000.0) / p"
_QC = f"CAST(FLOOR(value * cos({_THETA}) * 1000000.0) AS BIGINT)"
_QS = f"CAST(FLOOR(value * sin({_THETA}) * 1000000.0) AS BIGINT)"
_POWER = (
    "ROUND(((CAST(c AS DOUBLE) / 1000000.0) * (CAST(c AS DOUBLE) / 1000000.0)"
    " + (CAST(s AS DOUBLE) / 1000000.0) * (CAST(s AS DOUBLE) / 1000000.0))"
    " / n_obs, 6)"
)


def _dft_sql(values_clause: str) -> str:
    """Engine-shared DFT query body; only the periods-list FROM-clause
    syntax differs per dialect."""
    return (
        "WITH base AS ("
        "  SELECT user_id, ts_us, value FROM v_events"
        "  WHERE event_type = 'purchase' AND user_id < 50"
        "), ex AS ("
        f"  SELECT user_id, ts_us, value, p FROM base CROSS JOIN {values_clause}"
        "), parts AS ("
        "  SELECT user_id, p,"
        "    CAST(COUNT(*) AS BIGINT) AS n_obs,"
        f"   CAST(SUM({_QC}) AS BIGINT) AS c,"
        f"   CAST(SUM({_QS}) AS BIGINT) AS s"
        "  FROM ex GROUP BY user_id, p"
        ") SELECT user_id, CAST(p AS DOUBLE) AS period_days, n_obs, "
        f"{_POWER} AS power FROM parts"
    )


def lightcurve_dft_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deeming DFT periodogram over per-user purchase series."""
    load_tables(spark, sf_dir)
    rows = ",".join(f"({p})" for p in _PERIODS_D)
    return spark.sql(_dft_sql(f"(VALUES {rows}) AS periods(p)"))


def _dft_oracle() -> str:
    rows = ",".join(f"({p})" for p in _PERIODS_D)
    return _dft_sql(f"(VALUES {rows}) periods(p)")


def _dcf_sql(lags_clause: str, day_shift: str) -> str:
    """Engine-shared DCF body.  ``day_shift`` adds ``lag`` days to a
    DATE (dialect-specific: Spark date_add, DuckDB date + int)."""
    return (
        "WITH daily AS ("
        "  SELECT CAST(ts AS DATE) AS day, event_type,"
        "    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS v"
        "  FROM v_events WHERE event_type IN ('click', 'purchase')"
        "  GROUP BY 1, 2"
        "), a AS (SELECT day, v FROM daily WHERE event_type = 'click'),"
        "   b AS (SELECT day, v FROM daily WHERE event_type = 'purchase')"
        f" SELECT dlag, CAST(COUNT(*) AS BIGINT) AS n_pairs,"
        "    ROUND(corr(a.v, b.v), 4) AS r"
        f" FROM a CROSS JOIN {lags_clause}"
        f" JOIN b ON b.day = {day_shift}"
        "  GROUP BY dlag"
    )


def lightcurve_dcf_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete correlation function: click→purchase daily-series
    correlation at day lags −3…+3.  The daily rollup collapses the
    stream to ~30 rows per band before the (broadcast-size) lag
    fan-out, so the quadratic part never touches raw events."""
    load_tables(spark, sf_dir)
    rows = ",".join(f"({k})" for k in _LAGS)
    return spark.sql(
        _dcf_sql(f"(VALUES {rows}) AS lags(dlag)", "date_add(a.day, dlag)")
    )


def _dcf_oracle() -> str:
    rows = ",".join(f"({k})" for k in _LAGS)
    return _dcf_sql(f"(VALUES {rows}) lags(dlag)", "a.day + dlag")


_FUNNEL_WINDOW_US = 7 * 86_400_000_000  # 7 days


def _funnel_sql() -> str:
    """Engine-shared 3-step ordered funnel (MATCH_RECOGNIZE-lite):
    signup -> click -> purchase, earliest-chain semantics, conversion
    counted only when the whole chain fits in a 7-day window.

    Scale shape: three chained per-user conditional-min aggregations,
    all keyed on user_id — Catalyst plans ONE exchange and reuses the
    partitioning across the chain (no per-user sort, no window over
    the raw stream).
    """
    return (
        "WITH s1 AS ("
        "  SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts_us END) AS t1"
        "  FROM v_events GROUP BY user_id"
        "), s2 AS ("
        "  SELECT e.user_id, MIN(s1.t1) AS t1,"
        "    MIN(CASE WHEN e.event_type = 'click' AND e.ts_us > s1.t1 THEN e.ts_us END) AS t2"
        "  FROM v_events e JOIN s1 ON e.user_id = s1.user_id"
        "  WHERE s1.t1 IS NOT NULL GROUP BY e.user_id"
        "), s3 AS ("
        "  SELECT e.user_id, MIN(s2.t1) AS t1, MIN(s2.t2) AS t2,"
        "    MIN(CASE WHEN e.event_type = 'purchase' AND e.ts_us > s2.t2 THEN e.ts_us END) AS t3"
        "  FROM v_events e JOIN s2 ON e.user_id = s2.user_id"
        "  WHERE s2.t2 IS NOT NULL GROUP BY e.user_id"
        ") SELECT"
        "  (SELECT CAST(COUNT(*) AS BIGINT) FROM s1 WHERE t1 IS NOT NULL) AS n_signup,"
        "  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2 WHERE t2 IS NOT NULL) AS n_clicked_after,"
        "  CAST(COUNT(CASE WHEN t3 IS NOT NULL THEN 1 END) AS BIGINT) AS n_purchased_after,"
        f"  CAST(COUNT(CASE WHEN t3 - t1 <= {_FUNNEL_WINDOW_US} THEN 1 END) AS BIGINT) AS n_converted_7d"
        "  FROM s3"
    )


def seq_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel with a time-window constraint."""
    load_tables(spark, sf_dir)
    return spark.sql(_funnel_sql())


def _markov_sql() -> str:
    """First-order Markov transition matrix over per-user event
    sequences: LAG over a total order (ts_us, event_id), bigram counts,
    row-normalized probabilities.

    Scale shape: one window over (user_id) partitions (the same
    exchange every per-user op reuses), then two keyed aggregations on
    the tiny (prev, next) type alphabet.  Probability is a single
    double division of exact integers — deterministic without rounding
    (SURVEY §4.5 rule 2: never ROUND an exact quotient).
    """
    return (
        "WITH ord AS ("
        "  SELECT user_id, event_type,"
        "    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
        "      AS prev_type"
        "  FROM v_events"
        "), pairs AS ("
        "  SELECT prev_type, event_type AS next_type,"
        "    CAST(COUNT(*) AS BIGINT) AS n_trans"
        "  FROM ord WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type"
        "), tot AS ("
        "  SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from"
        "  FROM pairs GROUP BY prev_type"
        ") SELECT p.prev_type, p.next_type, p.n_trans, t.n_from,"
        "    CAST(p.n_trans AS DOUBLE) / t.n_from AS prob"
        "  FROM pairs p JOIN tot t ON p.prev_type = t.prev_type"
    )


def seq_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov)."""
    load_tables(spark, sf_dir)
    return spark.sql(_markov_sql())


#: Rolling-frame anomaly parameters: frame = 5 preceding observations,
#: z² threshold 4 (|z| > 2), minimum 3 frame observations.
_ANOM_FRAME = "ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING"


def _anomaly_sql() -> str:
    """Rolling z-score anomaly screen on per-user purchase series,
    decided entirely in exact integer arithmetic.

    The frame statistics are scaled-integer sums (x = value·100 as
    BIGINT), so mean/variance never touch floats: with s = Σx,
    q = Σx², n = frame count, the |z| > 2 test
    (x − s/n)² > 4 · (n·q − s²)/(n(n−1)) multiplies out to

        (n·x − s)² · (n − 1)  >  4 · n · (n·q − s²)

    — a pure-BIGINT predicate (|x| ≤ 10⁶ ⇒ every term < 2⁶³), hence
    bit-identical across engines with no quantization step at all.
    Scale shape: one per-user window (single exchange), then one
    keyed aggregation.
    """
    return (
        "WITH p AS ("
        "  SELECT user_id, ts_us, event_id,"
        "    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x"
        "  FROM v_events WHERE event_type = 'purchase'"
        "), framed AS ("
        "  SELECT user_id, x,"
        f"    CAST(SUM(x) OVER (PARTITION BY user_id ORDER BY ts_us, event_id {_ANOM_FRAME}) AS BIGINT) AS s,"
        f"    CAST(SUM(x * x) OVER (PARTITION BY user_id ORDER BY ts_us, event_id {_ANOM_FRAME}) AS BIGINT) AS q,"
        f"    CAST(COUNT(x) OVER (PARTITION BY user_id ORDER BY ts_us, event_id {_ANOM_FRAME}) AS BIGINT) AS n"
        "  FROM p"
        ") SELECT user_id,"
        "    CAST(COUNT(CASE WHEN n >= 3 THEN 1 END) AS BIGINT) AS n_eval,"
        "    CAST(COUNT(CASE WHEN n >= 3 AND"
        "      (n * x - s) * (n * x - s) * (n - 1) > 4 * n * (n * q - s * s)"
        "      THEN 1 END) AS BIGINT) AS n_anomalies"
        "  FROM framed GROUP BY user_id"
        "  HAVING COUNT(CASE WHEN n >= 3 THEN 1 END) > 0"
    )


def win_anomaly_rolling_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score (|z| > 2) anomaly counts per user, exact-integer
    frame statistics."""
    load_tables(spark, sf_dir)
    return spark.sql(_anomaly_sql())


_US_PER_DAY = 86_400_000_000


def _seasonal_sql() -> str:
    """Day-of-week seasonal decomposition of the daily purchase totals.

    dow is epoch-day mod 7 (portable — avoids the Spark/DuckDB DOW
    numbering trap, SURVEY §4.5 dialect list; 0 = Thursday since
    1970-01-01 was one).  Daily totals are exact DECIMAL sums; the
    per-dow mean and the seasonal index are single double divisions of
    exact operands, so no rounding is needed.  Scale shape: the raw
    stream collapses to ~n_days rows in the first aggregation; all
    later stages are metadata-sized.
    """
    return (
        "WITH daily AS ("
        f"  SELECT CAST(FLOOR(ts_us / {_US_PER_DAY}.0) AS BIGINT) AS day_idx,"
        "    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DECIMAL(18,2)) AS v"
        "  FROM v_events WHERE event_type = 'purchase' GROUP BY 1"
        "), by_dow AS ("
        "  SELECT day_idx % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,"
        "    CAST(SUM(v) AS DECIMAL(20,2)) AS tot"
        "  FROM daily GROUP BY day_idx % 7"
        "), overall AS ("
        "  SELECT CAST(SUM(tot) AS DOUBLE) / CAST(SUM(n_days) AS BIGINT) AS g"
        "  FROM by_dow"
        ") SELECT dow, n_days,"
        "    CAST(tot AS DOUBLE) / n_days AS avg_daily,"
        "    (CAST(tot AS DOUBLE) / n_days) / g AS seasonal_idx"
        "  FROM by_dow CROSS JOIN overall"
    )


def ts_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal-index decomposition of daily purchase volume."""
    load_tables(spark, sf_dir)
    return spark.sql(_seasonal_sql())


def _cusum_sql() -> str:
    """CUSUM level-shift changepoint detection on the daily purchase
    total series, entirely in scaled-integer arithmetic.

    With v_k the day-k total in cents (BIGINT), n days and T = Σv,
    the mean-adjusted cumulative sum at day k is
    S_k = Σ_{i≤k}(v_i − T/n); scaling by n gives
    n·S_k = n·P_k − k·T (P_k = prefix sum, k = row index) — pure
    BIGINT, so the argmax decision is exact.  The changepoint is the
    first day attaining max |n·S_k| (total order: (|nS| DESC, day)).
    Scale shape: the raw stream collapses to one row per day in the
    first aggregation; both windows run on that metadata-sized series.
    """
    return (
        "WITH daily AS ("
        f"  SELECT CAST(FLOOR(ts_us / {_US_PER_DAY}.0) AS BIGINT) AS day_idx,"
        "    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v"
        "  FROM v_events WHERE event_type = 'purchase' GROUP BY 1"
        "), pre AS ("
        "  SELECT day_idx, v,"
        "    CAST(SUM(v) OVER (ORDER BY day_idx"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,"
        "    CAST(ROW_NUMBER() OVER (ORDER BY day_idx) AS BIGINT) AS k,"
        "    CAST(SUM(v) OVER () AS BIGINT) AS t,"
        "    CAST(COUNT(*) OVER () AS BIGINT) AS n"
        "  FROM daily"
        "), cs AS ("
        "  SELECT day_idx, v, n * p - k * t AS ns, n FROM pre"
        ") SELECT day_idx, v AS day_total_cents,"
        "    CAST(ns AS DOUBLE) / n / 100.0 AS cusum,"
        "    CASE WHEN ROW_NUMBER() OVER (ORDER BY ABS(ns) DESC, day_idx) = 1"
        "      THEN TRUE ELSE FALSE END AS is_changepoint"
        "  FROM cs"
    )


def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen over the daily purchase series."""
    load_tables(spark, sf_dir)
    return spark.sql(_cusum_sql())


def _asof_nearest_sql() -> str:
    """Nearest-neighbor temporal join: each purchase matched to its
    closest click (either direction) of the same user — the two-sided
    complement of the corpus ``join_asof`` (backward-only).  One
    window exchange on user_id computes both candidates (last click
    before via a preceding MAX, first click after via a following
    MIN) — no event×event join ever materializes.  All-integer µs
    arithmetic; ties (equidistant) resolve to the earlier click,
    identical in both engines because the frame order is total."""
    frame_prev = "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    frame_next = "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING"
    ck = "CASE WHEN event_type = 'click' THEN ts_us END"
    return (
        "WITH ev AS ("
        "  SELECT user_id, event_id, ts_us, event_type FROM v_events"
        "  WHERE event_type IN ('click', 'purchase')"
        "), m AS ("
        "  SELECT user_id, event_id, ts_us, event_type,"
        f"    MAX({ck}) OVER (PARTITION BY user_id ORDER BY ts_us, event_id {frame_prev}) AS prev_click,"
        f"    MIN({ck}) OVER (PARTITION BY user_id ORDER BY ts_us, event_id {frame_next}) AS next_click"
        "  FROM ev"
        ") SELECT event_id, user_id, ts_us,"
        "    CASE WHEN prev_click IS NULL THEN next_click"
        "         WHEN next_click IS NULL THEN prev_click"
        "         WHEN ts_us - prev_click <= next_click - ts_us THEN prev_click"
        "         ELSE next_click END AS click_ts_us,"
        "    CASE WHEN prev_click IS NULL THEN next_click - ts_us"
        "         WHEN next_click IS NULL THEN ts_us - prev_click"
        "         WHEN ts_us - prev_click <= next_click - ts_us THEN ts_us - prev_click"
        "         ELSE next_click - ts_us END AS abs_delta_us"
        "  FROM m WHERE event_type = 'purchase'"
        "    AND (prev_click IS NOT NULL OR next_click IS NOT NULL)"
    )


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided nearest-in-time click for every purchase."""
    load_tables(spark, sf_dir)
    return spark.sql(_asof_nearest_sql())


_CONC_IV_US = 600_000_000  # each event opens a 10-minute activity interval


def _concurrency_sql() -> str:
    """Peak concurrency per day (classic interval sweep-line), without
    a global window.

    Every event opens a half-open 10-minute interval [s, e); the sweep
    emits +1 at s and −1 at e.  The scalable shape is two-phase (the
    salted-agg pattern): within-day running sums use a window
    PARTITIONed BY day, and the cross-day offset ("carry" = Σ deltas
    of all earlier days, i.e. intervals still open at midnight) comes
    from a per-day total rollup whose running sum is metadata-sized.
    peak(day) = carry(day) + max running.  Ties at the same timestamp
    order (t, delta) — ends before starts, so touching intervals never
    double-count; tied equal-delta rows permute freely but their
    running-sum *set* is permutation-invariant, so the per-day MAX is
    exact.  All integers.
    """
    return (
        "WITH iv AS ("
        f"  SELECT ts_us AS s, ts_us + {_CONC_IV_US} AS e FROM v_events"
        "), pts AS ("
        "  SELECT s AS t, 1 AS delta FROM iv"
        "  UNION ALL SELECT e, -1 FROM iv"
        "), d AS ("
        f"  SELECT t, delta, CAST(FLOOR(t / {_US_PER_DAY}.0) AS BIGINT) AS day"
        "  FROM pts"
        "), daily_tot AS ("
        "  SELECT day, CAST(SUM(delta) AS BIGINT) AS tot FROM d GROUP BY day"
        "), carry AS ("
        "  SELECT day, CAST(COALESCE(SUM(tot) OVER (ORDER BY day"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c"
        "  FROM daily_tot"
        "), run AS ("
        "  SELECT day, CAST(SUM(delta) OVER (PARTITION BY day ORDER BY t, delta"
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r"
        "  FROM d"
        ") SELECT run.day, CAST(MAX(carry.c + run.r) AS BIGINT) AS peak_concurrency"
        "  FROM run JOIN carry ON run.day = carry.day GROUP BY run.day"
    )


def ts_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak concurrent 10-minute activity intervals."""
    load_tables(spark, sf_dir)
    return spark.sql(_concurrency_sql())


def _ls_sql(values_clause: str) -> str:
    """Lomb–Scargle periodogram (Lomb 1976; Scargle 1982) for
    unevenly sampled light curves — the standard LSST-era period
    finder, completing the periodogram triad (PDM: trig-free folding;
    Deeming DFT: plain Fourier power; LS: least-squares-equivalent
    with the τ phase origin that makes the statistic time-shift
    invariant).

    Two map-side fan-out passes over (user × frequency), each ending
    in ONE keyed aggregation of floor-quantized per-row trig terms
    (the Stetson/DFT determinism pattern): pass 1 accumulates
    Σsin 2ωt / Σcos 2ωt → τ = atan2(S,C)/2ω; pass 2, joined back on
    the (user, period) key, accumulates the centered-value projections
    on cos/sin ω(t−τ).  atan2's 1-ulp cross-engine drift perturbs τ
    by ~1e-16 — absorbed by the pass-2 quantization (boundary hits
    measure-zero).  The per-user mean is the exact-integer quotient
    (the PCA μ pattern).  At 100 TB: no self-join, no window; two
    shuffles, both keyed on (user, period) with map-side combine.
    """
    theta = "2 * pi() * (ts_us / 86400000000.0) / p"
    return (
        "WITH base AS ("
        "  SELECT user_id, ts_us, value FROM v_events"
        "  WHERE event_type = 'purchase' AND user_id < 50"
        "), mu AS ("
        "  SELECT user_id,"
        "    CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS BIGINT) AS sq,"
        "    CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY user_id"
        "), ex AS ("
        "  SELECT b.user_id, b.ts_us,"
        # §4.5 rule 6: BIGINT / computed-DECIMAL divisor is DECIMAL
        # division in Spark (precision-loss quantized) but double
        # division in DuckDB — force double explicitly (ADVICE r1).
        "    b.value - CAST(mu.sq AS DOUBLE) / (CAST(mu.n AS DOUBLE) * 1000000.0) AS cv, p"
        "  FROM base b JOIN mu ON b.user_id = mu.user_id"
        "  CROSS JOIN " + values_clause + ""
        "), p1 AS ("
        f"  SELECT user_id, p,"
        f"    CAST(SUM(CAST(FLOOR(sin(2 * ({theta})) * 1000000.0) AS BIGINT)) AS BIGINT) AS s2,"
        f"    CAST(SUM(CAST(FLOOR(cos(2 * ({theta})) * 1000000.0) AS BIGINT)) AS BIGINT) AS c2"
        "  FROM ex GROUP BY user_id, p"
        "), tau AS ("
        "  SELECT user_id, p,"
        "    atan2(CAST(s2 AS DOUBLE), CAST(c2 AS DOUBLE))"
        "      / (2 * (2 * pi() / (p * 86400000000.0))) AS t0"
        "  FROM p1"
        "), p2 AS ("
        "  SELECT ex.user_id, ex.p,"
        "    CAST(COUNT(*) AS BIGINT) AS n_obs,"
        "    CAST(SUM(CAST(FLOOR(ex.cv * cos((2 * pi() / (ex.p * 86400000000.0)) * (ex.ts_us - tau.t0)) * 1000000.0) AS BIGINT)) AS BIGINT) AS a,"
        "    CAST(SUM(CAST(FLOOR(ex.cv * sin((2 * pi() / (ex.p * 86400000000.0)) * (ex.ts_us - tau.t0)) * 1000000.0) AS BIGINT)) AS BIGINT) AS b,"
        "    CAST(SUM(CAST(FLOOR(pow(cos((2 * pi() / (ex.p * 86400000000.0)) * (ex.ts_us - tau.t0)), 2) * 1000000.0) AS BIGINT)) AS BIGINT) AS cc,"
        "    CAST(SUM(CAST(FLOOR(pow(sin((2 * pi() / (ex.p * 86400000000.0)) * (ex.ts_us - tau.t0)), 2) * 1000000.0) AS BIGINT)) AS BIGINT) AS ss"
        "  FROM ex JOIN tau ON ex.user_id = tau.user_id AND ex.p = tau.p"
        "  GROUP BY ex.user_id, ex.p"
        ") SELECT user_id, CAST(p AS DOUBLE) AS period_days, n_obs,"
        "    CAST(CAST(FLOOR(0.5 * ((CAST(a AS DOUBLE) / 1000000.0) * (CAST(a AS DOUBLE) / 1000000.0)"
        "      / (CAST(cc AS DOUBLE) / 1000000.0)"
        "      + (CAST(b AS DOUBLE) / 1000000.0) * (CAST(b AS DOUBLE) / 1000000.0)"
        "      / (CAST(ss AS DOUBLE) / 1000000.0)) * 1000000.0) AS BIGINT) AS DOUBLE)"
        "      / 1000000.0 AS ls_power"
        "  FROM p2"
    )


_LS_PERIODS = "(VALUES (0.5), (1.0), (3.0), (7.0))"


def lightcurve_lomb_scargle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lomb–Scargle power at 4 trial periods per user series."""
    load_tables(spark, sf_dir)
    return spark.sql(_ls_sql(f"{_LS_PERIODS} AS periods(p)"))




def _snaive_sql() -> str:
    """Seasonal-naive forecast evaluation (the standard forecasting
    baseline): predict each of the final 7 days' purchase totals with
    the same weekday one week earlier, and score MAE / bias on that
    holdout.  Errors are exact integer cents; the MAE quotient is a
    single exact-operand division (§4.5 rule 2).  Scale shape: the
    stream collapses to one row per day first; everything after is
    metadata-sized (a self-join at lag 7 on ~n_days rows)."""
    return (
        "WITH daily AS ("
        f"  SELECT CAST(FLOOR(ts_us / {_US_PER_DAY}.0) AS BIGINT) AS d,"
        "    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents"
        "  FROM v_events WHERE event_type = 'purchase' GROUP BY 1"
        "), b AS (SELECT MAX(d) AS hi FROM daily)"
        ", holdout AS ("
        "  SELECT a.d, a.cents AS actual, f.cents AS forecast,"
        "    ABS(a.cents - f.cents) AS abs_err, a.cents - f.cents AS err"
        "  FROM daily a JOIN daily f ON f.d = a.d - 7 CROSS JOIN b"
        "  WHERE a.d > b.hi - 7"
        ") SELECT CAST(COUNT(*) AS BIGINT) AS n_days,"
        "    CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err_cents,"
        "    CAST(CAST(SUM(abs_err) AS BIGINT) AS DOUBLE) / COUNT(*) / 100.0 AS mae,"
        "    CAST(CAST(SUM(err) AS BIGINT) AS DOUBLE) / COUNT(*) / 100.0 AS mean_bias"
        "  FROM holdout"
    )


def ts_forecast_snaive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-7) forecast MAE/bias on the last week."""
    load_tables(spark, sf_dir)
    return spark.sql(_snaive_sql())


def _drawdown_sql() -> str:
    """Maximum drawdown of the daily revenue series per event type —
    the running-peak-to-trough statistic (finance's risk metric; for a
    light curve, the deepest dimming below the running maximum).
    The raw stream collapses to one row per (type, day) first; the two
    window passes (running max over time, then the max gap) run on
    that metadata-sized series.  All integers until the final
    cents→unit division."""
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    return (
        "WITH daily AS ("
        "  SELECT event_type,"
        f"    CAST(FLOOR(ts_us / {_US_PER_DAY}.0) AS BIGINT) AS d,"
        "    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents"
        "  FROM v_events WHERE event_type IN ('purchase', 'click')"
        "  GROUP BY event_type, 2"
        "), dd AS ("
        "  SELECT event_type, cents,"
        f"    CAST(MAX(cents) OVER (PARTITION BY event_type ORDER BY d {frame}) AS BIGINT) AS peak"
        "  FROM daily"
        ") SELECT event_type,"
        "    CAST(CAST(MAX(peak - cents) AS BIGINT) AS DOUBLE) / 100.0 AS max_drawdown,"
        "    CAST(CAST(MAX(peak) AS BIGINT) AS DOUBLE) / 100.0 AS peak_daily"
        "  FROM dd GROUP BY event_type"
    )


def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown of the daily revenue series per event type."""
    load_tables(spark, sf_dir)
    return spark.sql(_drawdown_sql())


_ABANDON_WINDOW_US = 86_400_000_000  # 24 h


def _abandon_sql() -> str:
    """Abandonment screen (the funnel's negative pattern): a click is
    ABANDONED when no purchase by the same user follows within 24 h.
    The next-purchase timestamp comes from one conditional MIN over
    the FOLLOWING frame of the per-user ordered stream — the
    ``join_asof_nearest`` machinery pointed forward; no click×purchase
    join exists.  All-integer decision; per-user rollup after."""
    frame = "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING"
    pt = "CASE WHEN event_type = 'purchase' THEN ts_us END"
    return (
        "WITH ev AS ("
        "  SELECT user_id, event_id, ts_us, event_type FROM v_events"
        "  WHERE event_type IN ('click', 'purchase')"
        "), m AS ("
        "  SELECT user_id, ts_us, event_type,"
        f"    MIN({pt}) OVER (PARTITION BY user_id ORDER BY ts_us, event_id {frame})"
        "      AS next_purchase_us"
        "  FROM ev"
        ") SELECT user_id,"
        "    CAST(COUNT(*) AS BIGINT) AS n_clicks,"
        "    CAST(COUNT(CASE WHEN next_purchase_us IS NULL"
        f"      OR next_purchase_us - ts_us > {_ABANDON_WINDOW_US}"
        "      THEN 1 END) AS BIGINT) AS n_abandoned"
        "  FROM m WHERE event_type = 'click' GROUP BY user_id"
    )


def seq_abandoned_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks not followed by a purchase within 24 h, per user."""
    load_tables(spark, sf_dir)
    return spark.sql(_abandon_sql())


def _attribution_sql() -> str:
    """First-touch attribution: each 30-minute-gap session's purchase
    revenue is credited to the session's FIRST event type (the
    marketing-attribution rollup).  Session assignment is the corpus
    ``sessionize`` LAG+cumulative-flag pattern; the first touch is a
    MIN over (ts_us, event_id, event_type) tuples encoded as a sortable
    string — one user_id exchange end to end, exact integer cents."""
    gap_us = 30 * 60 * 1_000_000
    return (
        "WITH ev AS ("
        "  SELECT user_id, event_id, ts_us, event_type,"
        "    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM v_events"
        "), flagged AS ("
        "  SELECT *, CASE WHEN LAG(ts_us) OVER w IS NULL"
        f"    OR ts_us - LAG(ts_us) OVER w > {gap_us} THEN 1 ELSE 0 END AS new_sess"
        "  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)"
        "), sess AS ("
        "  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id"
        "    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid"
        "  FROM flagged"
        "), agg AS ("
        "  SELECT user_id, sid,"
        "    MIN(CONCAT(LPAD(CAST(ts_us AS STRING), 20, '0'), ':',"
        "      LPAD(CAST(event_id AS STRING), 12, '0'), ':', event_type))"
        "      AS first_key,"
        "    CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)"
        "      AS BIGINT) AS sess_cents"
        "  FROM sess GROUP BY user_id, sid"
        ") SELECT SPLIT_PART(first_key, ':', 3) AS first_touch,"
        "    CAST(COUNT(*) AS BIGINT) AS n_sessions,"
        "    CAST(SUM(sess_cents) AS BIGINT) AS attributed_cents"
        "  FROM agg GROUP BY 1"
    )


def seq_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session revenue credited to the session's first event type."""
    load_tables(spark, sf_dir)
    return spark.sql(_attribution_sql())


def _islands_sql() -> str:
    """Gaps-and-islands: contiguous runs of purchase-active days per
    user (the classic sequence-reconstruction op — streaks, uptime
    stretches, observing runs).  The per-user day set is the first
    rollup, so the LAG + cumulative-flag island assignment runs on a
    collapsed relation; output one row per island with
    start/end/length and the gap that preceded it.  All-integer."""
    return (
        "WITH daily AS ("
        f"  SELECT user_id, CAST(FLOOR(ts_us / {_US_PER_DAY}.0) AS BIGINT) AS d"
        "  FROM v_events WHERE event_type = 'purchase' AND user_id < 30"
        "  GROUP BY user_id, 2"
        "), flagged AS ("
        "  SELECT user_id, d,"
        "    CASE WHEN LAG(d) OVER w IS NULL OR d - LAG(d) OVER w > 1"
        "      THEN 1 ELSE 0 END AS new_island,"
        "    d - COALESCE(LAG(d) OVER w, d) AS gap"
        "  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)"
        "), isl AS ("
        "  SELECT user_id, d, gap, CAST(SUM(new_island) OVER ("
        "    PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING)"
        "    AS BIGINT) AS island_id"
        "  FROM flagged"
        ") SELECT user_id, island_id,"
        "    CAST(MIN(d) AS BIGINT) AS start_day,"
        "    CAST(MAX(d) AS BIGINT) AS end_day,"
        "    CAST(COUNT(*) AS BIGINT) AS length_days,"
        "    CAST(MAX(gap) AS BIGINT) AS entry_gap"
        "  FROM isl GROUP BY user_id, island_id"
    )


def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous purchase-day runs (islands) per user."""
    load_tables(spark, sf_dir)
    return spark.sql(_islands_sql())


def _runs_test_sql() -> str:
    """Wald–Wolfowitz runs test per user: is the purchase series'
    above/below-median sign sequence random, or does it trend/cluster?
    (The residual-randomness screen after any fit.)  Signs from the
    exact interpolated median (equal-to-median points excluded); run
    count via LAG sign changes on one user_id exchange; the z-score is
    a fixed double expression over exact integers (n₁, n₂, runs),
    floor-quantized at 1e-6."""
    mu = "2.0 * n1 * n2 / (n1 + n2) + 1.0"
    sg2 = (
        "(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2))"
        " / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))"
    )
    return (
        "WITH p AS ("
        "  SELECT user_id, ts_us, event_id, value FROM v_events"
        "  WHERE event_type = 'purchase' AND user_id < 60"
        "), med AS ("
        "  SELECT user_id AS mu_uid, percentile(value, 0.5) AS med"
        "  FROM p GROUP BY user_id"
        "), signed AS ("
        "  SELECT p.user_id, ts_us, event_id,"
        "    CASE WHEN value > med THEN 1 ELSE 0 END AS s"
        "  FROM p JOIN med ON p.user_id = med.mu_uid WHERE value <> med"
        "), runs AS ("
        "  SELECT user_id, s,"
        "    CASE WHEN LAG(s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
        "      IS DISTINCT FROM s THEN 1 ELSE 0 END AS new_run"
        "  FROM signed"
        "), agg AS ("
        "  SELECT user_id,"
        "    CAST(SUM(s) AS BIGINT) AS n1,"
        "    CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2,"
        "    CAST(SUM(new_run) AS BIGINT) AS n_runs"
        "  FROM runs GROUP BY user_id"
        ") SELECT user_id, n1, n2, n_runs,"
        f"   CAST(CAST(FLOOR((n_runs - ({mu})) / sqrt({sg2}) * 1000000.0) AS BIGINT)"
        "      AS DOUBLE) / 1000000.0 AS z"
        "  FROM agg WHERE n1 >= 5 AND n2 >= 5"
    )


def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs-test z-scores for per-user purchase sign sequences."""
    load_tables(spark, sf_dir)
    return spark.sql(_runs_test_sql())


QUERIES = {
    "lightcurve_dft_power": lightcurve_dft_power,
    "lightcurve_dcf_lag": lightcurve_dcf_lag,
    "seq_funnel_3step": seq_funnel_3step,
    "seq_markov_transitions": seq_markov_transitions,
    "win_anomaly_rolling_z": win_anomaly_rolling_z,
    "ts_seasonal_dow": ts_seasonal_dow,
    "ts_changepoint_cusum": ts_changepoint_cusum,
    "join_asof_nearest": join_asof_nearest,
    "ts_max_concurrency": ts_max_concurrency,
    "lightcurve_lomb_scargle": lightcurve_lomb_scargle,
    "ts_forecast_snaive_eval": ts_forecast_snaive_eval,
    "win_max_drawdown": win_max_drawdown,
    "seq_abandoned_clicks": seq_abandoned_clicks,
    "seq_first_touch_attribution": seq_first_touch_attribution,
    "win_gap_islands": win_gap_islands,
    "ts_runs_test": ts_runs_test,
}

ORACLES = {
    "lightcurve_dft_power": inline_views(_dft_oracle()),
    "lightcurve_dcf_lag": inline_views(_dcf_oracle()),
    "seq_funnel_3step": inline_views(_funnel_sql()),
    "seq_markov_transitions": inline_views(_markov_sql()),
    "win_anomaly_rolling_z": inline_views(_anomaly_sql()),
    "ts_seasonal_dow": inline_views(_seasonal_sql()),
    "ts_changepoint_cusum": inline_views(_cusum_sql()),
    "join_asof_nearest": inline_views(_asof_nearest_sql()),
    "ts_max_concurrency": inline_views(_concurrency_sql()),
    "lightcurve_lomb_scargle": inline_views(_ls_sql(f"{_LS_PERIODS} periods(p)")),
    "ts_forecast_snaive_eval": inline_views(_snaive_sql()),
    "win_max_drawdown": inline_views(_drawdown_sql()),
    "seq_abandoned_clicks": inline_views(_abandon_sql()),
    "seq_first_touch_attribution": inline_views(_attribution_sql()),
    "win_gap_islands": inline_views(_islands_sql()),
    "ts_runs_test": inline_views(_runs_test_sql().replace("percentile(", "quantile_cont(")),
}


_KLEENE_WINDOW_US = 7 * 86_400_000_000


def seq_kleene_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE with a Kleene star: ``signup click* purchase``
    — a purchase matches iff the latest preceding signup is within 7
    days and EVERY event strictly between them is a click (the strict
    micro-funnel: no competing activity allowed inside the pattern).

    Engine shape (one window exchange, no event×event join): per user
    in (ts, id) order, carry three running columns — the last signup's
    timestamp, the non-click cumulative count at that signup, and its
    row number.  A purchase row then decides the ENTIRE pattern from
    arithmetic on its own carried values: zero non-click events in the
    gap ⇔ (cum_nonclick − 1) == cum_at_signup, and the click count is
    the row-number gap.  This is the §4.3-style "turn a pattern join
    into per-partition running state" rewrite that survives 100 TB.

    The oracle replays it declaratively (latest-signup max + correlated
    NOT-EXISTS/COUNT between) — clearer, quadratic, oracle-only.
    """
    ev = catalog.v_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    is_signup = F.col("event_type") == "signup"
    cum_nonclick = F.sum(
        F.when(F.col("event_type") != "click", 1).otherwise(0)
    ).over(w)
    rn = F.row_number().over(w)
    base = ev.select(
        "user_id", "event_id", "event_type", "ts_us",
        cum_nonclick.alias("cum_nc"), rn.alias("rn"),
    )
    carried = base.select(
        "*",
        F.last(F.when(is_signup, F.col("ts_us")), ignorenulls=True).over(w).alias("sig_us"),
        F.last(F.when(is_signup, F.col("cum_nc")), ignorenulls=True).over(w).alias("sig_cum"),
        F.last(F.when(is_signup, F.col("rn")), ignorenulls=True).over(w).alias("sig_rn"),
    )
    return (
        carried.where(
            (F.col("event_type") == "purchase")
            & F.col("sig_us").isNotNull()
            & (F.col("ts_us") - F.col("sig_us") <= _KLEENE_WINDOW_US)
            & (F.col("cum_nc") - 1 == F.col("sig_cum"))
        )
        .select(
            "user_id",
            F.col("sig_us").alias("signup_us"),
            F.col("ts_us").alias("purchase_us"),
            (F.col("rn") - F.col("sig_rn") - 1).cast("long").alias("n_clicks"),
        )
    )


# The oracle reasons under the SAME total order as the engine —
# (ts_us, event_id) row-value comparisons, not bare ts_us — so the two
# sides cannot diverge if a user ever has two events in the same
# microsecond (ADVICE r2: the earlier ts-only form silently assumed a
# unique-(user_id, ts_us) invariant the data happens to satisfy).  The
# two aligned LIMIT-1 subqueries share one ORDER BY, so (signup_us,
# signup_id) is one consistent row.
_KLEENE_ORACLE = inline_views(
    "WITH p AS (SELECT user_id, event_id, ts_us FROM v_events WHERE event_type = 'purchase'), "
    "s AS (SELECT user_id, event_id, ts_us FROM v_events WHERE event_type = 'signup'), "
    "m AS (SELECT p.user_id, p.event_id AS pid, p.ts_us AS purchase_us, "
    "  (SELECT s.ts_us FROM s WHERE s.user_id = p.user_id "
    "     AND (s.ts_us, s.event_id) <= (p.ts_us, p.event_id) "
    "   ORDER BY s.ts_us DESC, s.event_id DESC LIMIT 1) AS signup_us, "
    "  (SELECT s.event_id FROM s WHERE s.user_id = p.user_id "
    "     AND (s.ts_us, s.event_id) <= (p.ts_us, p.event_id) "
    "   ORDER BY s.ts_us DESC, s.event_id DESC LIMIT 1) AS signup_id "
    "  FROM p) "
    "SELECT m.user_id, m.signup_us, m.purchase_us, "
    "  CAST((SELECT COUNT(*) FROM v_events e WHERE e.user_id = m.user_id "
    "    AND (e.ts_us, e.event_id) > (m.signup_us, m.signup_id) "
    "    AND (e.ts_us, e.event_id) < (m.purchase_us, m.pid)) AS BIGINT) AS n_clicks "
    "FROM m WHERE m.signup_us IS NOT NULL "
    f"AND m.purchase_us - m.signup_us <= {_KLEENE_WINDOW_US} "
    "AND NOT EXISTS (SELECT 1 FROM v_events e WHERE e.user_id = m.user_id "
    "  AND (e.ts_us, e.event_id) > (m.signup_us, m.signup_id) "
    "  AND (e.ts_us, e.event_id) < (m.purchase_us, m.pid) "
    "  AND e.event_type <> 'click')"
)

QUERIES["seq_kleene_funnel"] = seq_kleene_funnel
ORACLES["seq_kleene_funnel"] = _KLEENE_ORACLE
