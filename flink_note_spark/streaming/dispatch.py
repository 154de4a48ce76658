"""Unified streaming entry points that ALWAYS run — Flink users call
``CEP.pattern(...)`` / SQL ``MATCH_RECOGNIZE`` once and it just works;
this module gives the repo the same contract (VERDICT r10 #1).

The native incremental engines (``streaming/ops.py`` /
``operators/match_recognize.match_recognize_stream``) cover the shapes
whose per-key state can be maintained row-by-row and refuse the rest
loudly toward batch. The replay engine (``streaming/replay.py``)
streams ANY batch-supported shape by running the unmodified batch
operator over epoch-log slices, at up to one extra ``within`` of
latency. :func:`pattern_stream_start` / :func:`recognize_stream_start`
dispatch between them:

- ``engine="auto"`` (default): build the native plan; if the native
  engine refuses AND the batch operator supports the shape (probed on
  an empty frame — so user errors like unknown columns still raise),
  route through incremental replay. Refusals survive only for shapes
  batch refuses too.
- ``engine="native"`` / ``engine="replay"``: force one path.

Both paths land each epoch's newly-final matches at
``{log}/out/epoch={id}`` (or a custom ``sink``) and return the
``StreamingQuery`` with a ``routed`` attribute (``"native"`` /
``"replay"``) so callers can observe the decision. The NATIVE path's
output is normalized to the BATCH operator's schema (the engines emit
step times as epoch-µs longs and payloads as doubles; the dispatcher
casts them back), so downstream consumers see ONE schema regardless of
which engine ran — ``replay_emissions`` reads either.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType, TimestampNTZType, TimestampType

from flink_note_spark.streaming.replay import (
    _default_sink,
    _require_checkpoint,
    match_pattern_replay_stream,
    match_recognize_replay_stream,
)

__all__ = [
    "pattern_stream_start",
    "recognize_stream_start",
    "timeouts_stream_start",
]


def _normalize_to_batch(native: DataFrame, batch_schema: StructType) -> DataFrame:
    """Project the native engine's output onto the batch operator's
    schema: epoch-µs longs become timestamps (``timestamp_micros``, not
    a seconds-interpreting cast), payload doubles cast back to the
    source column type, column order follows batch."""
    target = {f.name: f.dataType for f in batch_schema.fields}
    cols = []
    for f in native.schema.fields:
        t = target.get(f.name)
        if t is None or f.dataType == t:
            cols.append(F.col(f.name))
        elif isinstance(t, (TimestampType, TimestampNTZType)) and isinstance(
            f.dataType, LongType
        ):
            cols.append(F.timestamp_micros(F.col(f.name)).cast(t).alias(f.name))
        else:
            cols.append(F.col(f.name).cast(t).alias(f.name))
    out = native.select(*cols)
    if set(out.columns) == set(batch_schema.names):
        out = out.select(*batch_schema.names)
    return out


def _start_native(
    native: DataFrame,
    batch_schema: StructType | None,
    log_path: str,
    sink: Callable[[DataFrame, int], None] | None,
    checkpoint: str,
    trigger: dict | None,
):
    """Start a native (update-mode stateful) match stream into the
    epoch-directory sink layout ``replay_emissions`` reads. The native
    engines emit each match exactly once, so per-epoch overwrite is
    exactly-once under retries just like the replay sink."""
    if batch_schema is not None:
        native = _normalize_to_batch(native, batch_schema)
    emit = sink if sink is not None else _default_sink(log_path)
    writer = (
        native.writeStream.foreachBatch(lambda df, eid: emit(df, eid))
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def _empty_like(stream: DataFrame) -> DataFrame:
    return stream.sparkSession.createDataFrame([], stream.schema)


def pattern_stream_start(
    stream: DataFrame,
    pattern,
    *,
    log_path: str,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    watermark: str = "5 minutes",
    contiguity: str | None = None,
    skip_strategy: str | None = None,
    carry_payload: dict[str, list[str]] | None = None,
    sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
    engine: str = "auto",
):
    """Stream a CEP pattern with automatic engine selection — the ONE
    entry point that runs every batch-supported shape (module docstring
    has the dispatch rule and latency trade-off). ``within`` is
    required whenever the replay path may engage (it bounds the slice
    and open-terminal finality); native-only shapes inherit the native
    engines' own ``within`` rules."""
    if engine not in ("auto", "native", "replay"):
        raise ValueError(f"engine must be auto|native|replay, got {engine!r}")
    _require_checkpoint(checkpoint, "pattern_stream_start")
    replay_kw = dict(
        key_col=key_col,
        time_col=time_col,
        type_col=type_col,
        within=within,
        watermark=watermark,
        contiguity=contiguity,
        skip_strategy=skip_strategy,
        carry_payload=carry_payload,
        sink=sink,
        checkpoint=checkpoint,
        trigger=trigger,
    )
    from flink_note_spark.operators.cep import match_pattern

    def batch_probe() -> DataFrame:
        return match_pattern(
            _empty_like(stream),
            pattern,
            key_col=key_col,
            time_col=time_col,
            type_col=type_col,
            within=within,
            contiguity=contiguity,
            skip_strategy=skip_strategy,
            carry_payload=carry_payload,
        )

    if engine == "replay":
        q = match_pattern_replay_stream(stream, pattern, log_path, **replay_kw)
        q.routed = "replay"
        return q

    from flink_note_spark.streaming.ops import match_pattern_stream

    try:
        native = match_pattern_stream(
            stream,
            pattern,
            key_col=key_col,
            time_col=time_col,
            type_col=type_col,
            within=within,
            watermark=watermark,
            contiguity=contiguity,
            skip_strategy=skip_strategy,
            carry_payload=carry_payload,
        )
    except ValueError as native_err:
        if engine == "native":
            raise
        try:
            batch_probe()
        except Exception:
            # batch refuses too — the shape is genuinely unsupported;
            # surface the native engine's (more specific) refusal
            raise native_err from None
        q = match_pattern_replay_stream(stream, pattern, log_path, **replay_kw)
        q.routed = "replay"
        return q
    try:
        batch_schema = batch_probe().schema
    except Exception:
        batch_schema = None  # native-only shape: emit the native schema
    q = _start_native(native, batch_schema, log_path, sink, checkpoint, trigger)
    q.routed = "native"
    return q


def recognize_stream_start(
    stream: DataFrame,
    *,
    log_path: str,
    partition_by: str,
    order_by: str,
    pattern: str,
    define: dict | None = None,
    measures: dict[str, str] | None = None,
    after_match: str = "skip past last row",
    within: str | None = None,
    watermark: str = "5 minutes",
    rows_per_match: str = "one row per match",
    subset: dict | None = None,
    tiebreak: list[str] | None = None,
    sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
    engine: str = "auto",
):
    """Stream a ``MATCH_RECOGNIZE`` query with automatic engine
    selection — the MR twin of :func:`pattern_stream_start`. Closes the
    native refusals (ALL ROWS PER MATCH, non-numeric payload measures,
    non-disjoint quantifiers under pruning AFTER MATCH, reluctant
    quantifier residue, …) via incremental replay whenever the batch
    operator supports the shape. The one argued exception: NEXT()
    navigation refuses on BOTH engines — the physical successor has no
    event-time bound, so no watermark ever decides the match
    (``match_recognize_replay_stream`` has the proof sketch)."""
    if engine not in ("auto", "native", "replay"):
        raise ValueError(f"engine must be auto|native|replay, got {engine!r}")
    _require_checkpoint(checkpoint, "recognize_stream_start")
    mr_kw = dict(
        partition_by=partition_by,
        order_by=order_by,
        pattern=pattern,
        define=define,
        measures=measures,
        after_match=after_match,
        within=within,
        rows_per_match=rows_per_match,
        subset=subset,
    )
    from flink_note_spark.operators.match_recognize import match_recognize

    def batch_probe() -> DataFrame:
        return match_recognize(_empty_like(stream), tiebreak=tiebreak, **mr_kw)

    def replay_route():
        q = match_recognize_replay_stream(
            stream,
            log_path=log_path,
            watermark=watermark,
            tiebreak=tiebreak,
            sink=sink,
            checkpoint=checkpoint,
            trigger=trigger,
            **mr_kw,
        )
        q.routed = "replay"
        return q

    if engine == "replay":
        return replay_route()

    from flink_note_spark.operators.match_recognize import match_recognize_stream

    try:
        native = match_recognize_stream(stream, watermark=watermark, **mr_kw)
    except ValueError as native_err:
        if engine == "native":
            raise
        try:
            batch_probe()
        except Exception:
            raise native_err from None
        return replay_route()
    try:
        batch_schema = batch_probe().schema
    except Exception:
        batch_schema = None
    q = _start_native(native, batch_schema, log_path, sink, checkpoint, trigger)
    q.routed = "native"
    return q


def timeouts_stream_start(
    stream: DataFrame,
    pattern,
    *,
    log_path: str,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    watermark: str = "5 minutes",
    contiguity: str | None = None,
    sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
    engine: str = "auto",
):
    """Timed-out partial matches with automatic engine selection — the
    ``PatternTimeoutFunction`` twin of :func:`pattern_stream_start`.
    The native engine's scope is the batch operator's MINUS ``where``
    conditions; ``where``-bearing chains route through replay. A
    timeout verdict is horizon-local by construction (it depends only
    on the anchor's own ``[anchor, anchor+within]`` window and consumes
    nothing), and the finality is exactly the anchor's horizon —
    ``ts_1 + within`` (the anchor is always a bound event, so the
    NULL-anchor hazard cannot arise here)."""
    if engine not in ("auto", "native", "replay"):
        raise ValueError(f"engine must be auto|native|replay, got {engine!r}")
    if within is None:
        raise ValueError(
            "timeouts_stream_start requires within= (without a window "
            "nothing ever times out — Flink's rule; it also bounds the "
            "replay slice)"
        )
    _require_checkpoint(checkpoint, "timeouts_stream_start")
    from flink_note_spark.operators.cep import match_pattern_timeouts
    from flink_note_spark.streaming.replay import (
        finality_anchor_within,
        stream_batch_replay_start,
    )

    def batch_op(events: DataFrame) -> DataFrame:
        return match_pattern_timeouts(
            events,
            pattern,
            key_col=key_col,
            time_col=time_col,
            type_col=type_col,
            within=within,
            contiguity=contiguity,
        )

    def batch_probe() -> DataFrame:
        return batch_op(_empty_like(stream))

    def replay_route():
        q = stream_batch_replay_start(
            stream,
            batch_op,
            finality_anchor_within(["ts_1"], within),
            time_col,
            log_path,
            within=within,
            watermark=watermark,
            sink=sink,
            checkpoint=checkpoint,
            trigger=trigger,
        )
        q.routed = "replay"
        return q

    if engine == "replay":
        batch_probe()  # surface shape errors before starting the query
        return replay_route()

    from flink_note_spark.streaming.ops import match_pattern_timeouts_stream

    try:
        native = match_pattern_timeouts_stream(
            stream,
            pattern,
            key_col=key_col,
            time_col=time_col,
            type_col=type_col,
            within=within,
            watermark=watermark,
            contiguity=contiguity,
        )
    except ValueError as native_err:
        if engine == "native":
            raise
        try:
            batch_probe()
        except Exception:
            raise native_err from None
        return replay_route()
    try:
        batch_schema = batch_probe().schema
    except Exception:
        batch_schema = None
    q = _start_native(native, batch_schema, log_path, sink, checkpoint, trigger)
    q.routed = "native"
    return q
