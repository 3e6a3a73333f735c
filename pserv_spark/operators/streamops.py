"""Registry adapter for the streaming jobs (see streaming/jobs.py).

Every streaming op now carries an exact oracle: the append-mode
watermark holdback and even actual late-data DROPPING proved fully
deterministic for bounded replays (emitted set ≡ windows closed under
the final watermark; a late row survives iff its window outlived the
watermark its batch ran under), so ANSI SQL can replay the policy.
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
    stream_late_drop_audit,
    stream_checkpoint_resume,
    stream_tumbling_complete,
    stream_tumbling_watermark,
    stream_jdbc_sink,
    stream_psi_monitor,
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
    "stream_late_drop_audit": stream_late_drop_audit,
    "stream_checkpoint_resume": stream_checkpoint_resume,
    "stream_tumbling_watermark": stream_tumbling_watermark,
    "stream_jdbc_sink": stream_jdbc_sink,
    "stream_psi_monitor": stream_psi_monitor,
}

ORACLES = {
    "stream_psi_monitor": (
        # complete mode emits the full final state => the streaming
        # store equals the batch per-(day, bin) histogram; the PSI
        # readout is replayed with the same smoothing/quantization.
        "WITH ev AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(LEAST(FLOOR(value / 50.0), 9) AS BIGINT) AS bin "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events WHERE value IS NOT NULL), "
        "store AS (SELECT day, bin, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2), "
        "td AS (SELECT day, CAST(SUM(n) AS BIGINT) AS n_day FROM store GROUP BY 1), "
        "tb AS (SELECT bin, CAST(SUM(n) AS BIGINT) AS n_bin FROM store GROUP BY 1), "
        "na AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM store), "
        "spine AS (SELECT day, n_day, UNNEST(generate_series(0, 9)) AS bin FROM td), "
        "j AS (SELECT spine.day, n_day, COALESCE(store.n, 0) AS c, "
        "COALESCE(tb.n_bin, 0) AS rc, n_all "
        "FROM spine LEFT JOIN store ON spine.day = store.day AND spine.bin = store.bin "
        "LEFT JOIN tb ON spine.bin = tb.bin CROSS JOIN na), "
        "t AS (SELECT day, n_day, CAST(FLOOR(1000000000.0 * ("
        "(CAST(c + 1 AS DOUBLE) / (n_day + 10) - CAST(rc + 1 AS DOUBLE) / (n_all + 10)) "
        "* LN((CAST(c + 1 AS DOUBLE) / (n_day + 10)) / (CAST(rc + 1 AS DOUBLE) / (n_all + 10)))"
        ")) AS BIGINT) AS tq FROM j) "
        "SELECT day, CAST(MAX(n_day) AS BIGINT) AS n_day, "
        "ROUND(CAST(SUM(tq) AS DOUBLE) / 1000000000.0, 6) AS psi FROM t GROUP BY day"
    ),
    "stream_jdbc_sink": (
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events GROUP BY event_type"
    ),
    # Complete mode emits all windows ⇒ equals the batch tumbling query.
    "stream_tumbling_complete": ORACLE_SQL["window_tumbling"],
    # foreachBatch upsert: final store state == batch daily aggregation.
    "stream_rollup_upsert": (
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events GROUP BY 1, 2"
    ),
    "stream_dedup_keys": "SELECT DISTINCT user_id, event_type FROM (SELECT * FROM events WHERE ts IS NOT NULL) events",
    # Two checkpointed runs with no double-processing == one batch agg.
    "stream_checkpoint_resume": (
        "SELECT user_id % 10 AS cohort, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events WHERE event_type = 'purchase' GROUP BY 1"
    ),
    # Late-data dropping, replayed exactly: on-time rows always count;
    # a late row survives iff its window end exceeds the watermark in
    # effect when its batch ran (= max on-time ts − 1h); emitted
    # windows are those with end <= global max ts − 1h.
    "stream_late_drop_audit": (
        "WITH p AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
        "CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS d "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events WHERE event_type = 'purchase'), "
        "b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM p), "
        "lab AS (SELECT p.*, ((d = lo OR d = hi) AND event_id % 2 = 1) AS late "
        "FROM p CROSS JOIN b), "
        "wm1 AS (SELECT MAX(ts_us) - 3600000000 AS w1 FROM lab WHERE NOT late), "
        "wmf AS (SELECT MAX(ts_us) - 3600000000 AS wf FROM lab), "
        "kept AS (SELECT * FROM lab CROSS JOIN wm1 "
        "WHERE NOT late OR (d + 1) * 86400000000 > w1), "
        "agg AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY d) "
        "SELECT day, n FROM agg CROSS JOIN wmf "
        "WHERE (day + 1) * 86400000000 <= wf"
    ),
    # Append-mode holdback is DETERMINISTIC, not merely rows-only: a
    # bounded availableNow run emits exactly the windows whose end is
    # <= the final watermark (max event time − delay) — verified to
    # reproduce the engine output bit-for-bit at sf0.001/0.01/0.1.
    "stream_tumbling_watermark": (
        "WITH m AS (SELECT MAX(ts) AS mt FROM (SELECT * FROM events WHERE ts IS NOT NULL) events), "
        "w AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM (SELECT * FROM events WHERE ts IS NOT NULL) events GROUP BY 1, 2) "
        "SELECT day, event_type, n FROM w CROSS JOIN m "
        "WHERE CAST(day AS TIMESTAMP) + INTERVAL 1 DAY <= mt - INTERVAL 1 HOUR"
    ),
    # Session windows: Spark's session end = last event + gap; a
    # session is emitted once the watermark passes that end.  The
    # LAG/flag sessionization below re-derives the same sessions.
    "stream_session_window": (
        "WITH m AS (SELECT MAX(ts) AS mt FROM (SELECT * FROM events WHERE ts IS NOT NULL) events), "
        "lagd AS (SELECT user_id, ts, "
        "CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "> INTERVAL 30 MINUTE OR LAG(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_sess FROM (SELECT * FROM events WHERE ts IS NOT NULL) events), "
        "sess AS (SELECT user_id, ts, SUM(new_sess) OVER (PARTITION BY user_id "
        "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM lagd), "
        "agg AS (SELECT user_id, sid, MIN(ts) AS sess_start, "
        "MAX(ts) + INTERVAL 30 MINUTE AS sess_end, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM sess GROUP BY 1, 2) "
        "SELECT user_id, sess_start, n_events FROM agg CROSS JOIN m "
        "WHERE sess_end <= mt - INTERVAL 1 HOUR"
    ),
    # foreachBatch leaderboard: final k-row store == batch top-10.
    "stream_topk_maintain": (
        "SELECT user_id, n FROM ("
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rk "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events GROUP BY user_id) t WHERE rk <= 10"
    ),
    # Batch-order-independent final state == batch latest-per-key query.
    "stream_cdc_apply": (
        "WITH latest AS (SELECT user_id, value, "
        "CAST(epoch_us(ts) AS BIGINT) AS as_of_us, event_type, "
        "ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM (SELECT * FROM events WHERE ts IS NOT NULL) events) "
        "SELECT user_id, value, as_of_us FROM latest "
        "WHERE rn = 1 AND event_type != 'error'"
    ),
    # Hopping 2h/1h: every event belongs to exactly two windows; derive
    # both candidate starts with integer µs arithmetic and unnest.
    "stream_hopping_complete": (
        "WITH ev AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type, value "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events), "
        # floored hour multiple via non-negative mod: DuckDB's integer
        # `//` TRUNCATES toward zero, mis-bucketing pre-1970 (negative
        # epoch) timestamps where Spark's window() floors — found by the
        # round-7 temporal-edge audit
        "cand AS (SELECT UNNEST([ ts_us - ((ts_us % 3600000000) + 3600000000) % 3600000000, "
        "ts_us - ((ts_us % 3600000000) + 3600000000) % 3600000000 - 3600000000 ]) AS start_us, "
        "event_type, value FROM ev) "
        "SELECT make_timestamp(start_us) AS win_start, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE), 2) AS total_value "
        "FROM cand GROUP BY start_us, event_type"
    ),
    # Single-batch availableNow ⇒ final state == batch GROUP BY counts.
    "stream_stateful_counts": (
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events GROUP BY user_id"
    ),
    # Stateless stream-static join ⇒ append mode emits the plain join.
    "stream_static_join": (
        "SELECT event_id, user_id, c_mktsegment "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) events JOIN customer ON user_id = c_custkey"
    ),
    # Inner stream-stream joins emit every match in a bounded run.
    "stream_stream_join": (
        "SELECT p.event_id AS p_id, p.user_id, s.event_id AS s_id "
        "FROM (SELECT * FROM events WHERE ts IS NOT NULL) p "
        "JOIN (SELECT * FROM events WHERE ts IS NOT NULL) s ON p.user_id = s.user_id "
        "AND p.event_type='purchase' AND s.event_type='signup' "
        "AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 7 DAY"
    ),
}
