"""Structured Streaming operators — the reference's core value-add
(Flink DataStream semantics) on Spark's micro-batch engine.

SURVEY.md §2.2 "Streaming-only" table: event-time windows + watermarks,
streaming dedup, stream–static and stream–stream joins, stateful per-key
processing (the ``KeyedProcessFunction`` analogue), checkpoint restore.
"""

from flink_note_spark.streaming.control import (
    cancel_query,
    get_query,
    last_progress,
    list_queries,
    query_status,
    stop_query,
)
from flink_note_spark.streaming.dispatch import (
    pattern_stream_start,
    recognize_stream_start,
)
from flink_note_spark.streaming.replay import (
    compact_replay_log,
    match_pattern_replay_stream,
    match_recognize_replay_stream,
    replay_emissions,
    retract_stream_start,
    stream_batch_replay_start,
)
from flink_note_spark.streaming.ops import (
    match_pattern_stream,
    route_to_sinks,
    session_window_agg,
    side_outputs,
    sliding_window_agg,
    tag_late_data,
    stateful_sessionize,
    stream_dedup,
    stream_static_join,
    interval_join_stream,
    stream_stream_join,
    tagged_union,
    tumbling_window_agg,
)

__all__ = [
    "cancel_query",
    "get_query",
    "last_progress",
    "list_queries",
    "query_status",
    "stop_query",
    "compact_replay_log",
    "match_pattern_replay_stream",
    "match_recognize_replay_stream",
    "pattern_stream_start",
    "recognize_stream_start",
    "replay_emissions",
    "retract_stream_start",
    "stream_batch_replay_start",
    "match_pattern_stream",
    "route_to_sinks",
    "session_window_agg",
    "side_outputs",
    "tag_late_data",
    "sliding_window_agg",
    "stateful_sessionize",
    "stream_dedup",
    "stream_static_join",
    "interval_join_stream",
    "stream_stream_join",
    "tagged_union",
    "tumbling_window_agg",
]
