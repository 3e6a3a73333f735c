"""Registry adapter for the streaming jobs (see streaming/jobs.py).

``stream_session_window`` deliberately has no oracle entry — append
mode withholds windows newer than the final watermark, which ANSI SQL
cannot express portably; the driver records its weaker rows-only check
(SURVEY §2.2 declares it rows-only).
"""

from __future__ import annotations

from ..corpus import ORACLE_SQL
from ..streaming import (
    stream_dedup_keys,
    stream_hopping_complete,
    stream_session_window,
    stream_stateful_counts,
    stream_static_join,
    stream_stream_join,
    stream_cdc_apply,
    stream_rollup_upsert,
    stream_topk_maintain,
    stream_tumbling_complete,
    stream_tumbling_watermark,
)

QUERIES = {
    "stream_tumbling_complete": stream_tumbling_complete,
    "stream_hopping_complete": stream_hopping_complete,
    "stream_dedup_keys": stream_dedup_keys,
    "stream_session_window": stream_session_window,
    "stream_stateful_counts": stream_stateful_counts,
    "stream_static_join": stream_static_join,
    "stream_stream_join": stream_stream_join,
    "stream_rollup_upsert": stream_rollup_upsert,
    "stream_cdc_apply": stream_cdc_apply,
    "stream_topk_maintain": stream_topk_maintain,
    # Late-data/watermark semantics — rows-only by declaration.
    "stream_tumbling_watermark": stream_tumbling_watermark,
}

ORACLES = {
    # Complete mode emits all windows ⇒ equals the batch tumbling query.
    "stream_tumbling_complete": ORACLE_SQL["window_tumbling"],
    # foreachBatch upsert: final store state == batch daily aggregation.
    "stream_rollup_upsert": (
        "SELECT CAST(ts AS DATE) AS day, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DECIMAL(18,2)) AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
    "stream_dedup_keys": "SELECT DISTINCT user_id, event_type FROM events",
    # foreachBatch leaderboard: final k-row store == batch top-10.
    "stream_topk_maintain": (
        "SELECT user_id, n FROM ("
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rk "
        "FROM events GROUP BY user_id) t WHERE rk <= 10"
    ),
    # Batch-order-independent final state == batch latest-per-key query.
    "stream_cdc_apply": (
        "WITH latest AS (SELECT user_id, value, "
        "CAST(epoch_us(ts) AS BIGINT) AS as_of_us, event_type, "
        "ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) "
        "SELECT user_id, value, as_of_us FROM latest "
        "WHERE rn = 1 AND event_type != 'error'"
    ),
    # Hopping 2h/1h: every event belongs to exactly two windows; derive
    # both candidate starts with integer µs arithmetic and unnest.
    "stream_hopping_complete": (
        "WITH ev AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type, value "
        "FROM events), "
        "cand AS (SELECT UNNEST([ (ts_us // 3600000000) * 3600000000, "
        "(ts_us // 3600000000) * 3600000000 - 3600000000 ]) AS start_us, "
        "event_type, value FROM ev) "
        "SELECT make_timestamp(start_us) AS win_start, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE), 2) AS total_value "
        "FROM cand GROUP BY start_us, event_type"
    ),
    # Single-batch availableNow ⇒ final state == batch GROUP BY counts.
    "stream_stateful_counts": (
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM events GROUP BY user_id"
    ),
    # Stateless stream-static join ⇒ append mode emits the plain join.
    "stream_static_join": (
        "SELECT event_id, user_id, c_mktsegment "
        "FROM events JOIN customer ON user_id = c_custkey"
    ),
    # Inner stream-stream joins emit every match in a bounded run.
    "stream_stream_join": (
        "SELECT p.event_id AS p_id, p.user_id, s.event_id AS s_id "
        "FROM events p JOIN events s ON p.user_id = s.user_id "
        "AND p.event_type='purchase' AND s.event_type='signup' "
        "AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 7 DAY"
    ),
}
