"""Pandas-UDF surface: grouped-map and grouped-agg custom operators.

The reference's per-catalog Python transforms (flux calibration, CSV
munging — public repo python/desc/pserv/Pserv.py, SURVEY §2.1) become
Arrow-batched pandas UDFs here.  Two representative operators, each
with an exact SQL-window/aggregate oracle so the Python path is held to
the same differential gate as everything else:

- ``udf_zscore_pandas``       — per-user z-score normalization via
  ``applyInPandas`` (grouped map).  Oracle: the window formula
  ``(v - AVG) / NULLIF(STDDEV_SAMP, 0)``.
- ``udf_weighted_mean_pandas``— per-user weighted mean via a
  GROUPED_AGG ``pandas_udf`` (weight = event_id % 5 + 1).  Oracle: the
  SUM/SUM formula.

At 100 TB: ``applyInPandas`` shuffles once on the grouping key and
streams one Arrow batch per group through a Python worker — the only
acceptable Python shape in a hot path (SURVEY SNIPPETS patterns); the
rest of the engine stays JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ._oracle import inline_views


def udf_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values (grouped-map pandas UDF)."""
    ev = (
        catalog.v_events(spark, sf_dir)
        .where(F.col("user_id") < 30)
        .select("event_id", "user_id", "value")
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        sd = v.std(ddof=1)  # NaN for singleton groups, matching SQL NULL
        z = (v - v.mean()) / sd if sd and not np.isnan(sd) else pd.Series(
            [np.nan] * len(v), index=v.index
        )
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z.round(6)}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, "event_id long, user_id long, z double"
    )


_ZSCORE_ORACLE = (
    "SELECT event_id, user_id, "
    "ROUND((value - AVG(value) OVER (PARTITION BY user_id)) / "
    "NULLIF(STDDEV_SAMP(value) OVER (PARTITION BY user_id), 0), 6) AS z "
    "FROM v_events WHERE user_id < 30"
)


def udf_weighted_mean_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user weighted mean value (grouped-agg pandas UDF).

    SURVEY §4.5 rule 2 applied to a UDF: never ROUND a quotient.  The
    numerator is accumulated as an exact integer (values are 6-dp
    decimals: per-row ``rint(v·1e6)·w`` in int64 — order-independent,
    no float summation), and the emitted quotient is two IEEE
    divisions with no rounding step.  The oracle mirrors it with a
    DECIMAL(18,6) sum cast to DOUBLE: correctly-rounded division makes
    ``float(n·1e6)/1e6`` equal the decimal→double cast bit-for-bit.
    The earlier ``np.round(np.dot(...)/W, 6)`` form flipped on exact
    .5e-6 boundary quotients at sf0.1 (half-even vs binary rounding).
    """
    ev = catalog.v_events(spark, sf_dir).select(
        "user_id",
        "value",
        (F.col("event_id") % 5 + 1).alias("w"),
    )

    @F.pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        # SQL aggregate NULL semantics, explicitly: NULL values drop
        # out of the numerator (a NaN would cast to garbage int64),
        # the weight sum stays over all rows (w is never NULL here),
        # and an all-NULL group is NULL — matching the oracle's
        # SUM(NULL products) / SUM(w).
        vv, ww = v.to_numpy(), w.to_numpy()
        keep = ~np.isnan(vv)
        if not keep.any():
            return None
        num = int((np.rint(vv[keep] * 1e6).astype(np.int64) * ww[keep]).sum())
        return (float(num) / 1e6) / float(w.sum())

    return ev.groupBy("user_id").agg(wmean("value", "w").alias("wmean"))


_WMEAN_ORACLE = (
    "SELECT user_id, "
    "CAST(SUM(CAST(value AS DECIMAL(18,6)) * (event_id % 5 + 1)) AS DOUBLE) "
    "/ CAST(SUM(event_id % 5 + 1) AS DOUBLE) AS wmean "
    "FROM v_events GROUP BY user_id"
)


def udf_scalar_magcal_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (vectorized) pandas UDF: counts→magnitude calibration
    per element, Arrow batch in / Arrow batch out — the elementwise
    flavor of the reference's flux calibration."""
    ev = catalog.v_events(spark, sf_dir).select("event_id", "value")

    @F.pandas_udf("double")
    def to_mag(v: pd.Series) -> pd.Series:
        # NULL flux -> NULL magnitude (Arrow keeps float NaN as NaN,
        # not null, so the missing mask must be re-applied explicitly
        # via a nullable dtype)
        mag = (-2.5 * np.log10(v.clip(lower=1e-9)) + 25.0).round(6)
        return mag.astype("Float64").mask(v.isna())

    return ev.select("event_id", to_mag("value").alias("mag"))


_MAGCAL_ORACLE = (
    # explicit NULL propagation: DuckDB's GREATEST skips NULL args
    # (would calibrate a missing flux to the 1e-9 floor)
    "SELECT event_id, CASE WHEN value IS NULL THEN NULL ELSE "
    "ROUND(-2.5 * LOG10(GREATEST(value, 1e-9)) + 25.0, 6) END AS mag "
    "FROM v_events"
)


def udtf_word_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input doc row → N output rows
    (word, length) — the user-defined explode shape (Spark 3.5+ UDTF
    API), held to an unnest-equivalent oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, word string, wlen int")
    class WordExpand:
        def eval(self, doc_id: int, text: str):
            if text is None:  # NULL doc expands to no rows, like unnest
                return
            for w in text.split(" "):
                yield doc_id, w, len(w)

    docs = catalog.table(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    spark.udtf.register("word_expand", WordExpand)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.word, t.wlen FROM _udtf_docs, "
        "LATERAL word_expand(doc_id, text) t"
    )


_UDTF_ORACLE = (
    "SELECT doc_id, w AS word, CAST(length(w) AS INT) AS wlen FROM ("
    "SELECT doc_id, unnest(string_split(text, ' ')) AS w "
    "FROM documents WHERE doc_id < 30)"
)


def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``useArrow=True`` — Spark
    3.5+'s third lane between row-pickled UDFs and pandas UDFs:
    per-row Python semantics, Arrow-batch transport).  The body is
    integer checksum arithmetic, so the oracle is plain SQL and the
    match is exact — what's under test is the Arrow UDF plumbing."""
    from pyspark.sql.functions import udf
    from pyspark.sql.types import LongType

    @udf(returnType=LongType(), useArrow=True)
    def key_checksum(orderkey, linenumber):
        return (orderkey * 31 + linenumber * 7) % 1_000_003

    li = catalog.table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        key_checksum("l_orderkey", "l_linenumber").alias("checksum"),
    )


_ARROW_UDF_ORACLE = (
    "SELECT l_orderkey, l_linenumber,"
    " (l_orderkey * 31 + l_linenumber * 7) % 1000003 AS checksum"
    " FROM lineitem WHERE l_orderkey < 200"
)


QUERIES = {
    "udf_zscore_pandas": udf_zscore_pandas,
    "udf_weighted_mean_pandas": udf_weighted_mean_pandas,
    "udf_scalar_magcal_pandas": udf_scalar_magcal_pandas,
    "udtf_word_expand": udtf_word_expand,
    "udf_arrow_scalar": udf_arrow_scalar,
}

ORACLES = {
    "udf_arrow_scalar": _ARROW_UDF_ORACLE,
    "udf_zscore_pandas": inline_views(_ZSCORE_ORACLE),
    "udf_weighted_mean_pandas": inline_views(_WMEAN_ORACLE),
    "udf_scalar_magcal_pandas": inline_views(_MAGCAL_ORACLE),
    "udtf_word_expand": _UDTF_ORACLE,
}
