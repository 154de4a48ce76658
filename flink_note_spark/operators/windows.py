"""Window-function operators: top-k per group and batch sessionization.

SURVEY.md §2.2 "Window functions" / "Sorts / limits / top-k". These are
shuffle-once patterns: one hash partition on the group key, sort within
partitions, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` + filter.

    ``order_cols`` must include a unique tiebreaker for deterministic
    output. At scale this is the canonical top-k: the window sort is
    per-partition after one shuffle; no ``orderBy().limit()`` global sort.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Batch session assignment (gaps-and-islands): a new session starts
    when the gap to the previous event of the same key exceeds
    ``gap_seconds``. Adds a ``session_id`` column (1-based per key).

    This is the bounded-data twin of Structured Streaming's
    ``session_window`` (SURVEY.md §2.2 Streaming table); the streaming
    path lives in ``flink_note_spark.streaming``. Single shuffle on key.
    """
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prev_us = F.lag(F.unix_micros(F.col(ts).cast("timestamp"))).over(w)
    cur_us = F.unix_micros(F.col(ts).cast("timestamp"))
    is_new = F.when(
        prev_us.isNull() | (cur_us - prev_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("session_id", F.sum(is_new).over(run))


def count_window(
    df: DataFrame,
    key: str,
    ts: str,
    size: int,
    tiebreak: str | None = None,
    window_col: str = "window_id",
) -> DataFrame:
    """Tumbling COUNT windows per key — Flink ``keyBy().countWindow(n)``
    (the DataStream window family's count-based member, SURVEY.md §2.2):
    each key's events, in ``(ts, tiebreak)`` order, are grouped into
    consecutive windows of exactly ``size`` events (the final partial
    window remains open in Flink and here carries the last id with
    fewer than ``size`` rows — filter on a count if only full windows
    matter).

    Flink numbers count windows by ARRIVAL order, which is not
    reproducible; the batch rendering totalizes on event time (+
    ``tiebreak`` — pass the event id, the sampling-determinism
    doctrine), so results are stable under repartitioning. One
    ``row_number`` window pass — a single shuffle on the key.

    Adds ``window_col`` = 0-based window index per key; aggregate with
    a plain ``groupBy(key, window_col)``.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    order = [F.col(ts).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn(
        window_col,
        ((F.row_number().over(w) - F.lit(1)) / F.lit(size)).cast("long"),
    )


def sliding_count_window(
    df: DataFrame,
    key: str,
    ts: str,
    size: int,
    slide: int,
    tiebreak: str | None = None,
    window_col: str = "window_id",
) -> DataFrame:
    """SLIDING count windows — Flink ``countWindow(size, slide)``:
    window ``w`` covers a key's rows at positions ``[w·slide,
    w·slide + size)`` (0-based, ``(ts, tiebreak)``-totalized like
    :func:`count_window`), so each row belongs to up to
    ``ceil(size/slide)`` windows and is EXPLODED once per membership —
    the honest output size of overlapping windows (same contract as the
    time-based sliding window, q24). Trailing windows with fewer than
    ``size`` rows are emitted partial, matching Flink's open windows.

    One row_number pass + a ``sequence``/``explode`` projection: a
    single shuffle on the key at any scale; the fan-out factor is the
    static ``size/slide`` overlap, not data-dependent.
    """
    if size < 1 or slide < 1:
        raise ValueError(
            f"size and slide must be >= 1, got size={size} slide={slide}"
        )
    order = [F.col(ts).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    # the window function must be materialized in its own projection —
    # a generator (explode) cannot wrap a window expression directly
    df = df.withColumn("__pos", F.row_number().over(w) - F.lit(1))
    pos = F.col("__pos")
    # memberships: ceil((pos - size + 1) / slide) <= w <= floor(pos/slide)
    lo = F.greatest(
        F.lit(0).cast("long"),
        F.ceil((pos - F.lit(size) + F.lit(1)) / F.lit(slide)).cast("long"),
    )
    hi = F.floor(pos / F.lit(slide)).cast("long")
    return df.withColumn(
        window_col, F.explode(F.sequence(lo, hi))
    ).drop("__pos")


def cumulate_window(
    df: DataFrame,
    ts: str,
    step: str,
    size: str,
    start_col: str = "win_start",
    end_col: str = "win_end",
) -> DataFrame:
    """CUMULATE windows — Flink SQL's ``CUMULATE(TABLE t,
    DESCRIPTOR(ts), step, size)`` windowing TVF (r7), which Spark has
    no builtin for: each ``size``-aligned span emits a SEQUENCE of
    growing windows ``[start, start+step)``, ``[start, start+2·step)``
    … ``[start, start+size)`` (early-fire cumulative aggregates, e.g.
    a daily total re-emitted every hour). A row belongs to every
    cumulative window of its span that ENDS after it: static fan-out
    ``<= size/step`` memberships per row, exploded exactly like the
    sliding count window — one projection, no shuffle here; the
    caller's ``groupBy(win_start, win_end)`` is the single shuffle.

    ``step``/``size`` are interval strings (``"1 hour"``); ``size``
    must be a multiple of ``step`` (Flink's rule). Adds ``start_col``/
    ``end_col`` timestamp columns; aggregate with a plain ``groupBy``.
    """
    step_us = _duration_us(step)
    size_us = _duration_us(size)
    if size_us % step_us != 0:
        raise ValueError(
            f"size must be a multiple of step (Flink's CUMULATE rule), "
            f"got step={step!r} size={size!r}"
        )
    n_steps = size_us // step_us
    # unix_micros rejects TIMESTAMP_NTZ; the session tz is pinned UTC
    # (session.py), so the cast is wall-clock-preserving
    ts_dt = dict(df.dtypes)[ts]
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    # floor division (not cast-truncation) so pre-epoch timestamps
    # still align spans downward
    start_us = (
        F.floor(ts_us / F.lit(size_us)).cast("long") * F.lit(size_us)
    )
    jmin = (
        F.floor((ts_us - start_us) / F.lit(step_us)).cast("long")
        + F.lit(1)
    )
    out = df.withColumn("__start_us", start_us).withColumn(
        "__j", F.explode(F.sequence(jmin, F.lit(n_steps)))
    )
    return (
        out.withColumn(
            start_col,
            F.timestamp_micros(F.col("__start_us")).cast(ts_dt),
        )
        .withColumn(
            end_col,
            F.timestamp_micros(
                F.col("__start_us") + F.col("__j") * F.lit(step_us)
            ).cast(ts_dt),
        )
        .drop("__start_us", "__j")
    )


def count_evictor_window(
    df: DataFrame,
    key: str,
    ts: str,
    size: str,
    n: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Flink ``CountEvictor.of(n)`` on a tumbling event-time window
    (r8): when the window fires, only the LAST ``n`` elements (by
    event time) are handed to the window function; earlier elements
    are evicted. Spark has no evictor concept — the declarative
    rendering is one ``row_number`` window pass descending by event
    time inside each (key, window) and a ``rank <= n`` filter; the
    caller aggregates the survivors with a plain ``groupBy(key,
    win_start)``.

    ``tiebreak`` columns order equal-timestamp events (the CEP
    determinism doctrine — pass the event id for a reproducible
    eviction on ties; Flink's evictor order is arrival order, which a
    distributed shuffle cannot reproduce). Adds ``win_start_us``
    (epoch µs, matching the streaming twin
    ``streaming/ops.count_evictor_tumbling_stream``).
    """
    if n < 1:
        raise ValueError("count evictor requires n >= 1")
    size_us = _duration_us(size)
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    out = df.withColumn(
        "win_start_us",
        F.floor(ts_us / F.lit(size_us)).cast("long") * F.lit(size_us),
    )
    order = [F.col(ts).desc()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(key, "win_start_us").orderBy(*order)
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def window_top_n(
    df: DataFrame,
    ts: str,
    size: str,
    order_cols: list[Column],
    n: int,
    partition_cols: list[str] | None = None,
    rank_col: str = "rn",
    window_col: str = "win",
    offset: str | None = None,
) -> DataFrame:
    """Flink SQL **Window Top-N** (windowing TVF + ``ROW_NUMBER() OVER
    (PARTITION BY window_start, window_end [, keys] ...) <= n``, r8):
    the top ``n`` rows per tumbling window (and optional extra keys),
    ordered by ``order_cols``. Spark-first rendering: ``F.window``
    assigns the tumble (a scan-stage projection, no shuffle), then ONE
    ``row_number`` pass over ``(window, *partition_cols)`` — a single
    hash shuffle whose key cardinality grows with the window count, so
    partitions stay balanced at any scale.

    ``order_cols`` must include a unique tiebreaker for deterministic
    output (the ``topk_per_group`` doctrine). Adds ``window_col``
    (struct ``start``/``end``) and ``rank_col``. Streaming twin:
    ``streaming/ops.window_top_n_stream`` (O(n) incremental state,
    final emission at watermark close).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    out = df.withColumn(window_col, _tumble(ts, size, offset))
    w = Window.partitionBy(window_col, *(partition_cols or [])).orderBy(
        *order_cols
    )
    return out.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def window_dedup(
    df: DataFrame,
    ts: str,
    size: str,
    keys: list[str],
    keep: str = "first",
    tiebreak: list[str] | None = None,
    window_col: str = "win",
    offset: str | None = None,
) -> DataFrame:
    """Flink SQL **Window Deduplication** (windowing TVF +
    ``ROW_NUMBER() OVER (PARTITION BY window_start, window_end, keys
    ORDER BY ts [DESC]) = 1``, r8): the first or last row per key per
    tumbling window by EVENT TIME. Same single-shuffle shape as
    :func:`window_top_n` with ``n = 1`` and a time ordering.

    ``keep`` is ``"first"`` or ``"last"``; ``tiebreak`` orders
    equal-timestamp rows (pass the event id — the determinism
    doctrine). Adds ``window_col``. Streaming twin:
    ``streaming/ops.window_dedup_stream`` (O(1) state per live (key,
    window): only the current best row is retained).
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep!r}")
    col = F.col(ts).asc() if keep == "first" else F.col(ts).desc()
    tb = [
        (F.col(c).asc() if keep == "first" else F.col(c).desc())
        for c in (tiebreak or [])
    ]
    out = df.withColumn(window_col, _tumble(ts, size, offset))
    w = Window.partitionBy(window_col, *keys).orderBy(col, *tb)
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _tumble(ts: str, size: str, offset: str | None):
    """Tumbling window assignment with Flink's window OFFSET
    (``TUMBLE(..., offset)`` / ``TumblingEventTimeWindows.of(size,
    offset)`` — e.g. day windows aligned to a non-UTC timezone): maps
    to ``F.window``'s ``startTime`` parameter, which shifts the
    epoch-aligned grid by the same amount."""
    if offset is None:
        return F.window(ts, size)
    return F.window(ts, size, size, offset)


def _duration_us(s: str) -> int:
    """Interval string → microseconds (day/hour/minute/second units —
    calendar units would make spans variable-width, which CUMULATE
    forbids)."""
    import re

    m = re.fullmatch(
        r"\s*(\d+)\s*(day|hour|minute|second)s?\s*", s.lower()
    )
    if not m:
        raise ValueError(
            f"duration must be '<n> day|hour|minute|second[s]', got {s!r}"
        )
    n, unit = int(m.group(1)), m.group(2)
    return n * {
        "day": 86_400_000_000,
        "hour": 3_600_000_000,
        "minute": 60_000_000,
        "second": 1_000_000,
    }[unit]
