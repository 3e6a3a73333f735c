"""Interval×interval overlap join — the temporal-join strategy piece.

``join_interval`` (corpus) is point-in-range; the harder shape is
range×range: find PAIRS of intervals that overlap (concurrent user
sessions, exposure windows × observation windows, gene regions — the
same operator everywhere).  Naively it is a quadratic theta join
(``a.start ≤ b.end AND b.start ≤ a.end`` has no equi key), which is
exactly the shape that dies at scale.

Spark-first strategy (the §4.3 zone recipe lifted to 1-D time): chunk
the timeline into fixed buckets, explode each interval to the buckets
it covers (intervals are session-length, so the per-interval fan-out is
tiny and bounded), equi-join on the bucket, de-duplicate pairs that
co-occur in several buckets, then apply the exact overlap predicate as
a residual.  Candidate generation is LOSSLESS: two overlapping
intervals necessarily share the bucket containing the overlap start.
The oracle is the naive quadratic join over the identical session
derivation — proving the bucketed plan loses nothing.

Intervals: gap-sessionized user activity (30-min gap, the corpus
``sessionize`` rule); side A = even users, side B = odd users —
"which sessions of different users ran concurrently".
Output: per overlapping pair, both session keys and the exact overlap
length in µs (all BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ._oracle import inline_views

_GAP_US = 30 * 60 * 1_000_000        # corpus sessionize gap
_BUCKET_US = 6 * 3_600 * 1_000_000   # 6-hour candidate buckets


def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.v_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    flagged = ev.select(
        "user_id",
        "ts_us",
        F.when((F.col("ts_us") - prev > _GAP_US) | prev.isNull(), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    run = Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.select(
        "user_id", "ts_us", F.sum("new_sess").over(run).alias("sess_id")
    )
    return sess.groupBy(
        "user_id", F.col("sess_id").cast("long").alias("sess_id")
    ).agg(
        F.min("ts_us").cast("long").alias("s_us"),
        F.max("ts_us").cast("long").alias("e_us"),
    )


def join_interval_overlap(
    spark: SparkSession, sf_dir: str, *, bucket_us: int = _BUCKET_US
) -> DataFrame:
    sess = _sessions(spark, sf_dir)
    a = sess.where(F.col("user_id") % 2 == 0).select(
        F.col("user_id").alias("a_user"),
        F.col("sess_id").alias("a_sess"),
        F.col("s_us").alias("a_s"),
        F.col("e_us").alias("a_e"),
    )
    b = sess.where(F.col("user_id") % 2 == 1).select(
        F.col("user_id").alias("b_user"),
        F.col("sess_id").alias("b_sess"),
        F.col("s_us").alias("b_s"),
        F.col("e_us").alias("b_e"),
    )

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_us), F.floor(F.col(e) / bucket_us)
                )
            ),
        )

    cand = (
        bucketed(a, "a_s", "a_e")
        .join(bucketed(b, "b_s", "b_e").hint("merge"), "bucket")
        .where((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        # a pair overlapping several buckets is found several times —
        # keep it once via the canonical bucket of its overlap start
        .where(
            F.col("bucket")
            == F.floor(F.greatest("a_s", "b_s") / bucket_us)
        )
    )
    return cand.select(
        "a_user",
        "a_sess",
        "b_user",
        "b_sess",
        (
            F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
        ).cast("long").alias("overlap_us"),
    )


_SESS_SQL = (
    "sess AS ("
    "  SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,"
    "    CAST(MIN(ts_us) AS BIGINT) AS s_us, CAST(MAX(ts_us) AS BIGINT) AS e_us"
    "  FROM ("
    "    SELECT user_id, ts_us,"
    "      SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us"
    "        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id"
    "    FROM ("
    "      SELECT user_id, ts_us,"
    "        CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id"
    f"         ORDER BY ts_us, event_id) > {_GAP_US}"
    "          OR LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)"
    "            IS NULL THEN 1 ELSE 0 END AS new_sess"
    "      FROM v_events) f) s"
    "  GROUP BY user_id, sess_id)"
)

#: Naive quadratic oracle over the identical session sets — proves the
#: bucketed candidate generation is lossless.
_OVERLAP_ORACLE = inline_views(
    "WITH " + _SESS_SQL + " "
    "SELECT a.user_id AS a_user, a.sess_id AS a_sess, "
    "b.user_id AS b_user, b.sess_id AS b_sess, "
    "CAST(LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS BIGINT) AS overlap_us "
    "FROM (SELECT * FROM sess WHERE user_id % 2 = 0) a "
    "JOIN (SELECT * FROM sess WHERE user_id % 2 = 1) b "
    "ON a.s_us <= b.e_us AND b.s_us <= a.e_us"
)

QUERIES = {"join_interval_overlap": join_interval_overlap}
ORACLES = {"join_interval_overlap": _OVERLAP_ORACLE}
