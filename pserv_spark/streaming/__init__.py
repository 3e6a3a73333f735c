"""Structured Streaming surface (SURVEY §2.2 events/streaming block)."""

from .jobs import (
    events_stream,
    run_to_memory,
    stream_tumbling_complete,
    stream_dedup_keys,
    stream_session_window,
    stream_stateful_counts,
    stream_static_join,
    stream_stream_join,
    stream_hopping_complete,
    stream_tumbling_watermark,
    stream_rollup_upsert,
    stream_topk_maintain,
    stream_late_drop_audit,
    stream_checkpoint_resume,
    stream_cdc_apply,
    stream_jdbc_sink,
)

__all__ = [
    "events_stream",
    "run_to_memory",
    "stream_tumbling_complete",
    "stream_dedup_keys",
    "stream_session_window",
    "stream_stateful_counts",
    "stream_static_join",
    "stream_stream_join",
    "stream_hopping_complete",
    "stream_tumbling_watermark",
    "stream_jdbc_sink",
    "stream_rollup_upsert",
    "stream_topk_maintain",
    "stream_late_drop_audit",
    "stream_checkpoint_resume",
    "stream_cdc_apply",
]
