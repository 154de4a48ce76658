"""Streaming operator builders.

Each function takes an unbounded DataFrame (``isStreaming=True``) and
returns the transformed unbounded DataFrame; sinks/triggers are attached
by the caller (``sources.files.write_stream_sink``).

Watermarks bound state (late rows beyond the delay are dropped) — the
Spark rendering of Flink's event-time/watermark contract the reference
runtime carries through its operator chain (SURVEY.md §2.2 Streaming).
All state goes to the RocksDB state store configured in ``session.py``.
"""

from __future__ import annotations

import ast
import re
from bisect import bisect_left, bisect_right
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_window_agg(
    stream: DataFrame,
    ts_col: str,
    window: str,
    watermark: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Fixed windows (reference: Flink tumbling event-time windows)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *keys)
        .agg(*aggs)
    )


def sliding_window_agg(
    stream: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    watermark: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping windows of ``window`` length every ``slide``."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), *keys)
        .agg(*aggs)
    )


def session_window_agg(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    watermark: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Data-driven session windows with inactivity ``gap`` (builtin
    ``session_window`` — preferred over custom state, SURVEY.md §7.3)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
    )


def stream_dedup(
    stream: DataFrame, keys: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Streaming exact dedup on ``keys`` alone: the first arrival per key
    survives, later events with the same key are dropped while the key's
    state lives. ``dropDuplicatesWithinWatermark`` bounds that state by the
    watermark delay (unbounded-stream safe) without adding ``ts_col`` to
    the dedup key — two events for one key at different timestamps still
    collapse to one, matching the batch twin (q26 keeps one row per
    user_id)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_static_join(
    stream: DataFrame, static: DataFrame, on: list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Enrich a stream against a bounded table — planned per micro-batch,
    broadcast when the static side is small."""
    return stream.join(static, on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_watermark: str,
    right_watermark: str,
    equi: Column,
    time_bound: Column,
    how: str = "inner",
) -> DataFrame:
    """Stream–stream join: watermarks on both sides + a time-range
    conjunct so the engine can evict buffered state (SURVEY.md §2.2)."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    return lw.join(rw, equi & time_bound, how)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    left_watermark: str = "5 minutes",
    right_watermark: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Flink DataStream ``intervalJoin`` on UNBOUNDED streams (r9) —
    ``a.keyBy(k).intervalJoin(b.keyBy(k)).between(lower, upper)``, the
    streaming twin of ``operators/joins.interval_join``: pair rows
    sharing ``on`` where ``right_time ∈ [left_time + lower,
    left_time + upper]`` (both bounds inclusive, Flink's default).

    Spark-first rendering: watermarks on BOTH sides plus the interval
    as a time-range join conjunct — exactly what Spark's stream-stream
    join needs to bound state (a buffered left row evicts once the
    right watermark passes ``left_time + upper``; a right row once the
    left watermark passes ``right_time - lower``), which is Flink's
    relative-window state cleanup. The equi key keeps the exchange a
    keyed hash join; the interval is a residual conjunct. Output
    carries one ``on`` column (the left side's)."""

    def _ivl(s: str) -> Column:
        s = s.strip()
        if s.startswith("-"):
            return -F.expr(f"INTERVAL {s[1:].strip()}")
        return F.expr(f"INTERVAL {s}")

    lw = left.withWatermark(left_time, left_watermark)
    rw = right.withWatermark(right_time, right_watermark)
    lo = rw[right_time] >= lw[left_time] + _ivl(lower)
    hi = rw[right_time] <= lw[left_time] + _ivl(upper)
    return lw.join(
        rw, (lw[on] == rw[on]) & lo & hi, how
    ).drop(rw[on])


def _session_schema(key_name: str, key_type: str) -> str:
    """Output schema of :func:`stateful_sessionize` — the key column
    inherits the INPUT's name and type (ADVICE r2 #5: a hardcoded
    ``user_id long`` silently mislabels string/other keys)."""
    return (
        f"{key_name} {key_type}, session_start long, session_end long, "
        "n_events int, closed boolean"
    )


_STATE_SCHEMA = "start long, last long, n int"


def _make_session_fn(gap_ms: int, key_name: str, ts_col: str):
    """Build the per-key session accumulator (the ``KeyedProcessFunction``
    analogue, SURVEY.md §2.2 "Stateful per-key processing").

    Each batch extends the open session and re-arms an EVENT-time timer at
    ``last_event + gap`` — exactly Flink's
    ``ctx.timerService().registerEventTimeTimer``. When the watermark
    passes the timer, the session closes deterministically (a
    processing-time timeout here would make results wall-clock dependent
    and, with continuous no-data batches, unbounded — event time is the
    reproducible-at-scale choice)."""

    gap_us = gap_ms * 1_000
    cols = [key_name, "session_start", "session_end", "n_events", "closed"]

    def _session_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n, True)], columns=cols)
            return

        import numpy as np

        start, last, n = state.get if state.exists else (None, None, 0)
        # datetime64[ns] → int64 gives NANOseconds; work in epoch-MICROs
        # to match the batch sessionization surface (q25 session_*_us).
        parts = [
            pdf[ts_col].to_numpy().view("int64") // 1_000 for pdf in pdfs
        ]
        ts = (
            np.sort(np.concatenate(parts)) if parts
            else np.empty(0, dtype=np.int64)
        )
        if ts.size == 0:
            if start is not None:
                state.update((start, last, n))
                state.setTimeoutTimestamp(last // 1_000 + gap_ms)
                yield pd.DataFrame(
                    [(user_id, start, last, n, False)], columns=cols
                )
            return

        # Vectorized segmentation (r8, VERDICT r7 item 4 — the
        # per-event Python walk replaced by one np.diff pass), same
        # semantics: split whenever the gap between CONSECUTIVE sorted
        # events exceeds gap_us; an in-batch gap closes the old session
        # immediately (the timer only handles the final open session).
        # Events at or below the open session's `last` are
        # watermark-bounded stragglers: each compares against the
        # running max, so they ALL merge into the open session (best
        # effort, never resurrecting closed ones) — rendered here by
        # folding them in up front and seeding the forward pass with a
        # synthetic element at `last`.
        if start is not None:
            n_le = int(np.searchsorted(ts, last, side="right"))
            if n_le:
                start = min(start, int(ts[0]))
                n += n_le
            aug = np.concatenate(([last], ts[n_le:]))
            synth = True
        else:
            aug = ts
            synth = False
        brk = np.flatnonzero(np.diff(aug) > gap_us)
        seg_s = np.concatenate(([0], brk + 1))
        seg_e = np.concatenate((brk, [aug.size - 1]))
        sv, ev = aug[seg_s], aug[seg_e]
        cnt = seg_e - seg_s + 1
        if synth:
            cnt[0] -= 1  # the seeded element is not a real event
            # segment 0 extends the open session (possibly by nothing)
            sv[0], ev0 = start, int(ev[0])
            n0 = n + int(cnt[0])
        m = sv.size
        closed_rows = None
        if m > 1:
            firsts = (
                [(user_id, start, ev0, n0, True)] if synth
                else [(user_id, int(sv[0]), int(ev[0]), int(cnt[0]), True)]
            )
            closed_rows = firsts + [
                (user_id, int(sv[i]), int(ev[i]), int(cnt[i]), True)
                for i in range(1, m - 1)
            ]
            start, last, n = int(sv[m - 1]), int(ev[m - 1]), int(cnt[m - 1])
        elif synth:
            start, last, n = start, ev0, n0
        else:
            start, last, n = int(sv[0]), int(ev[0]), int(cnt[0])
        state.update((start, last, n))
        # event-time timer: close when the watermark passes last + gap
        state.setTimeoutTimestamp(last // 1_000 + gap_ms)
        # ONE frame per invocation (closed rows + the open snapshot):
        # pandas frame construction is ~100µs — at high key
        # cardinality a second yield per key is real money (r8)
        snap = (user_id, start, last, n, False)
        yield pd.DataFrame(
            closed_rows + [snap] if closed_rows else [snap], columns=cols
        )

    return _session_fn


def stateful_sessionize(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "6 minutes",
    watermark: str = "5 minutes",
    gap_ms: int | None = None,
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``:
    emits open-session snapshots per batch (``closed=false``) and a final
    ``closed=true`` row once the watermark passes ``last_event + gap``.

    Demonstrates arbitrary per-key state — the escape hatch matching the
    reference's ``transform(operatorName, typeInfo, operator)``
    (``NOTES:29-32``; SURVEY.md §2.1 M6) on the streaming path. State is
    O(1) per live key in the RocksDB store; watermark-driven timers bound
    its lifetime, so this survives unbounded streams.
    """
    if gap_ms is None:
        gap_ms = _parse_duration_ms(gap)
    key_type = dict(stream.dtypes)[key]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            _make_session_fn(gap_ms, key, ts_col),
            outputStructType=_session_schema(key, key_type),
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _parse_duration_ms(text: str) -> int:
    qty, unit = text.split()
    return int(qty) * {
        "second": 1_000, "seconds": 1_000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }[unit]


def _make_cep_fn(pattern: list[str], key_name: str, ts_col: str,
                 type_col: str, within_us: int | None, k: int,
                 contiguity: str):
    """Per-key incremental pattern matcher (the Flink-CEP NFA rendered
    as a sorted event buffer + event-time finality), both contiguity
    modes:

    **strict**: a match is final exactly when its LAST element's time is
    at or below the watermark — any not-yet-arrived event is younger
    than the watermark, so it cannot land between the match's elements
    and break adjacency. Eviction keeps the trailing ``k-1`` events of
    the finalized region (they may prefix a future-completed match; a
    full match among them alone is impossible), which makes emission
    exactly-once with no bookkeeping. State is O(watermark delay + k).

    **relaxed** (skip-till-next-match): each step binds the EARLIEST
    later event of its type. The same finality rule holds — a chosen
    successor at or below the watermark cannot be displaced, because a
    displacing event would need a SMALLER time yet arrive in the
    future (> watermark). But eviction cannot keep a fixed tail:
    events stay matchable as successors for any start within the
    ``within`` horizon, so ``within`` is REQUIRED (it bounds state to
    the horizon) and exactly-once needs explicit bookkeeping — the
    previous watermark rides in state and only matches with
    ``wm_prev < ts_k ≤ wm`` emit. (New events always have
    ``ts > wm_prev``, so no match is both old and new.)
    """
    cols = [key_name] + [f"ts_{i}" for i in range(1, k + 1)]

    def _find_strict(ts_buf: list[int], tp_buf: list[str], wm_us: int,
                     wm_prev_us: int):
        # finality is STRICTLY below the watermark: Spark's late-row
        # filter drops only ts < wm, so an event with ts == wm can
        # still arrive in a later batch and must not be matched past
        # or evicted yet (ADVICE r5 boundary fix)
        rows = []
        for j in range(len(ts_buf) - k + 1):
            if ts_buf[j + k - 1] >= wm_us:
                break  # sorted: later windows end even younger
            if all(tp_buf[j + d] == pattern[d] for d in range(k)):
                if within_us is None or ts_buf[j + k - 1] - ts_buf[j] <= within_us:
                    rows.append([ts_buf[j + d] for d in range(k)])
        # evict the finalized (< wm) region, keep its trailing k-1 events
        n_final = 0
        while n_final < len(ts_buf) and ts_buf[n_final] < wm_us:
            n_final += 1
        cut = max(0, n_final - (k - 1))
        return rows, ts_buf[cut:], tp_buf[cut:]

    def _find_relaxed(ts_buf: list[int], tp_buf: list[str], wm_us: int,
                      wm_prev_us: int):
        from bisect import bisect_right

        # per-type sorted timestamp lists once per invocation: successor
        # lookup becomes bisect (O(S·k·log N) per key, not a full-buffer
        # rescan per start and step)
        by_type: dict[str, list[int]] = {}
        for t, y in zip(ts_buf, tp_buf):
            by_type.setdefault(y, []).append(t)
        rows = []
        for t0 in by_type.get(pattern[0], ()):
            times = [t0]
            cur = t0
            ok = True
            for want in pattern[1:]:
                cand = by_type.get(want)
                if not cand:
                    ok = False
                    break
                i = bisect_right(cand, cur)
                if i == len(cand):
                    ok = False
                    break
                cur = cand[i]
                times.append(cur)
            if (
                ok
                and times[-1] - times[0] <= within_us
                and wm_prev_us <= times[-1] < wm_us
            ):
                # strictly-below-wm finality + half-open [wm_prev, wm)
                # emission intervals: exactly-once even when an event
                # arrives with ts exactly == a previous watermark
                # (Spark drops only ts < wm — ADVICE r5 boundary fix)
                rows.append(times)
        # an event strictly older than wm - within can only serve starts
        # that are older still, and those starts' candidate successors
        # are all < wm → their matches are final (emitted or dead)
        horizon = wm_us - within_us
        cut = 0
        while cut < len(ts_buf) and ts_buf[cut] < horizon:
            cut += 1
        return rows, ts_buf[cut:], tp_buf[cut:]

    find = _find_strict if contiguity == "strict" else _find_relaxed

    def _cep_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        wm_us = state.getCurrentWatermarkMs() * 1_000

        if state.hasTimedOut:
            ts_buf, tp_buf, wm_prev = state.get
            rows, ts_buf, tp_buf = find(
                list(ts_buf), list(tp_buf), wm_us, wm_prev
            )
            if rows:
                yield pd.DataFrame(
                    [[key_val, *r] for r in rows], columns=cols
                )
            if ts_buf:
                state.update((ts_buf, tp_buf, wm_us))
                # re-arm only while NOT-YET-FINAL events remain (the
                # sparse-timer policy may fire before the youngest
                # event finalizes); once everything is below the
                # watermark, the kept tail can only emit with NEW
                # events, whose batch re-arms the timer.
                pending = [t for t in ts_buf if t >= wm_us]
                if pending:
                    state.setTimeoutTimestamp(max(
                        pending[0] // 1_000 + 1,
                        state.getCurrentWatermarkMs() + 1,
                    ))
            else:
                state.remove()
            return

        ts_buf, tp_buf, wm_prev = [], [], 0
        if state.exists:
            prev_ts, prev_tp, wm_prev = state.get
            ts_buf, tp_buf = list(prev_ts), list(prev_tp)
        new = []
        for pdf in pdfs:
            # datetime64[ns] → epoch MICROseconds (sessionize convention)
            for t, y in zip(
                (pdf[ts_col].astype("int64") // 1_000).tolist(),
                pdf[type_col].tolist(),
            ):
                new.append((t, y))
        merged = sorted(
            list(zip(ts_buf, tp_buf)) + new
        )  # (ts, type): type is the equal-ts tiebreak, same as the
        #    batch twin called with tiebreak=[type_col]
        ts_buf = [t for t, _ in merged]
        tp_buf = [y for _, y in merged]

        rows, ts_buf, tp_buf = find(ts_buf, tp_buf, wm_us, wm_prev)
        if rows:
            yield pd.DataFrame([[key_val, *r] for r in rows], columns=cols)
        if ts_buf:
            state.update((ts_buf, tp_buf, wm_us))
            # sparse timer (late-r8, the relaxed_vec treatment): arm at
            # the FIRST not-yet-final event — the exact next instant a
            # buffered match can finalize without new data. When every
            # buffered event is already below the watermark (the kept
            # k−1 tail of an idle key), arm nothing: the tail can only
            # emit with NEW events, whose batch re-arms. The previous
            # wm+1 clamp woke every stateful key on every watermark
            # advance forever.
            if contiguity == "strict":
                pending = [t for t in ts_buf if t >= wm_us]
                if pending:
                    state.setTimeoutTimestamp(max(
                        pending[0] // 1_000 + 1,
                        state.getCurrentWatermarkMs() + 1,
                    ))
            else:
                state.setTimeoutTimestamp(max(
                    ts_buf[-1] // 1_000 + 1,
                    state.getCurrentWatermarkMs() + 1,
                ))
        else:
            state.remove()

    return _cep_fn


def _make_cep_fn_relaxed_vec(pattern_slots: list[int], key_name: str,
                             ts_col: str, slot_col: str,
                             within_us: int, k: int):
    """Vectorized relaxed plain matcher (r8, VERDICT r7 item 4): the
    Python-state hot loop of :func:`_make_cep_fn`'s relaxed mode with
    ZERO per-event Python.

    Three levers over the r7 engine, all semantics-preserving (the
    equality-vs-batch suite is unchanged):

    - the dispatcher FILTERS non-candidate events JVM-side (relaxed
      matching never consults them — only the per-type candidate
      lists matter) and ships a small-int step SLOT instead of the
      type string, so the Python worker and the state store only ever
      see candidate rows and two int64 arrays;
    - binding is batch-vectorized: ALL anchors advance through each
      step with one ``np.searchsorted`` per step (the per-anchor
      bisect chain turned sideways), then one boolean mask applies
      the within-horizon and the exactly-once emission window;
    - output frames are built from numpy column arrays, not
      per-row lists.

    Finality/eviction/exactly-once rules are IDENTICAL to
    ``_make_cep_fn`` relaxed (strictly-below-wm finality, half-open
    ``[wm_prev, wm)`` emission on the last element, ``wm - within``
    eviction). Equal-timestamp candidate duplicates keep their
    multiplicity (each anchors its own match) exactly as before;
    equal-ts tie ORDER is irrelevant here because relaxed matching is
    pure event-time (per-slot sorted arrays, strictly-greater
    binding)."""
    import numpy as np

    cols = [key_name] + [f"ts_{i}" for i in range(1, k + 1)]
    uniq_slots = sorted(set(pattern_slots))
    empty = np.empty(0, dtype=np.int64)

    def _find(ts, sl, wm_us, wm_prev_us):
        cand = {s: ts[sl == s] for s in uniq_slots}
        t0 = cand[pattern_slots[0]]
        steps = [t0]
        alive = np.ones(t0.shape, dtype=bool)
        cur = t0
        for s in pattern_slots[1:]:
            ct = cand[s]
            if ct.size == 0:
                alive = np.zeros(t0.shape, dtype=bool)
                steps.append(np.zeros_like(cur))
                continue
            idx = np.searchsorted(ct, cur, side="right")
            ok = idx < ct.size
            alive &= ok
            cur = ct[np.minimum(idx, ct.size - 1)]
            steps.append(cur)
        next_emit = None
        if t0.size:
            last = steps[-1]
            complete = alive & (last - t0 <= within_us)
            emit = complete & (last >= wm_prev_us) & (last < wm_us)
            rows = [st[emit] for st in steps]
            # earliest future finality: the smallest pending match end —
            # the exact next instant a wakeup can produce output
            pend = complete & (last >= wm_us)
            if pend.any():
                next_emit = int(last[pend].min())
        else:
            rows = None
        cut = int(np.searchsorted(ts, wm_us - within_us, side="left"))
        return rows, ts[cut:], sl[cut:], next_emit

    def _emit(key_val, rows):
        data = {key_name: np.repeat(
            np.asarray([key_val]), rows[0].size
        )}
        for i, arr in enumerate(rows, 1):
            data[f"ts_{i}"] = arr
        return pd.DataFrame(data, columns=cols)

    def _arm(state, ts, next_emit):
        """Arm the event-time timer at the NEXT instant this key can act
        without new data (r8 timer audit): the earliest pending-match
        finality if one exists, else the buffer-eviction horizon
        ``ts[0] + within``. The previous policy (youngest event, clamped
        to ``wm + 1``) woke EVERY stateful key on EVERY watermark
        advance — with high key cardinality the timer micro-batches cost
        more than the matching itself (measured: a no-op kernel with
        per-batch timers ran 1.5x slower than one with none). New data
        for the key always triggers an invocation regardless of the
        timer, so sparse timers lose no emission and no eviction."""
        cands = [(int(ts[0]) + within_us) // 1_000 + 1]
        if next_emit is not None:
            cands.append(next_emit // 1_000 + 1)
        state.setTimeoutTimestamp(max(
            min(cands), state.getCurrentWatermarkMs() + 1
        ))

    def _cep_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        wm_us = state.getCurrentWatermarkMs() * 1_000

        if state.hasTimedOut:
            prev_ts, prev_sl, wm_prev = state.get
            ts = np.asarray(prev_ts, dtype=np.int64)
            sl = np.asarray(prev_sl, dtype=np.int64)
            rows, ts, sl, next_emit = _find(ts, sl, wm_us, wm_prev)
            if rows is not None and rows[0].size:
                yield _emit(key_val, rows)
            if ts.size:
                state.update((ts.tolist(), sl.tolist(), wm_us))
                # re-arm (a fired timer is consumed): without this a
                # quiet key's residual buffer would never evict
                _arm(state, ts, next_emit)
            else:
                state.remove()
            return

        parts_t, parts_s, wm_prev = [], [], 0
        if state.exists:
            prev_ts, prev_sl, wm_prev = state.get
            parts_t.append(np.asarray(prev_ts, dtype=np.int64))
            parts_s.append(np.asarray(prev_sl, dtype=np.int64))
        for pdf in pdfs:
            parts_t.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            parts_s.append(pdf[slot_col].to_numpy().astype(np.int64))
        ts = np.concatenate(parts_t)
        sl = np.concatenate(parts_s)
        order = np.argsort(ts, kind="stable")
        ts, sl = ts[order], sl[order]

        rows, ts, sl, next_emit = _find(ts, sl, wm_us, wm_prev)
        if rows is not None and rows[0].size:
            yield _emit(key_val, rows)
        if ts.size:
            state.update((ts.tolist(), sl.tolist(), wm_us))
            _arm(state, ts, next_emit)
        else:
            state.remove()

    return _cep_fn


def _make_mixed_cep_fn(steps, key_name, ts_col, mask_col, within_us,
                       out_cols):
    """Per-key incremental matcher for MIXED-contiguity patterns
    (late-r8) — Flink's natural ``begin().next().followedBy()`` shape,
    the streaming twin of the batch positional engine
    (``operators/cep._match_mixed``), equality-tested against it in
    tests/test_streaming.py.

    Finality: mixed patterns REQUIRE ``within`` and decide at the
    anchor horizon (``wm_prev <= t0 + within < wm`` emits exactly
    once), inheriting the relaxed engine's argument — every event a
    VALID match consumes has ``ts <= horizon < wm`` (a bind beyond the
    horizon dies on ``within`` by timestamp monotonicity), and the
    stable region's content, order, and adjacency are immutable. The
    two verdicts that are NOT horizon-stable are excluded at dispatch:

    - a strict NEGATION whose next positive step is relaxed asserts on
      a successor that may lie beyond the horizon, where a future
      arrival (``ts >= wm``) can still displace it — so strict
      negations must be followed by a strict-mode positive step (the
      asserted event is then the bound event itself, stable);
    - a TERMINAL STRICT LOOP: the run's maximality (its ``n``/last
      capture) asserts on the event after it, which may never arrive
      — same refusal (and counterexample test) as the uniform strict
      engine's terminal-loop rule.

    NON-terminal loops stream since r9 — the horizon argument: a
    strict run that EMITS is pinned by a bounding non-candidate event
    whose position precedes the following step's bind (≤ horizon,
    stable); a run still open at the stable region's end (or
    continuing at ``ts > h``) extends greedily in batch and dies on
    ``within``, so emitting nothing agrees. A relaxed loop's
    membership is every candidate position in (prev_bind, stop ∧
    horizon] — all ≤ h < wm, stable; an ``until`` stop matters only at
    positions ≤ h, equally stable.

    Binding is POSITIONAL, exactly like the batch engine: strict
    steps consume the immediately-next buffer position, relaxed steps
    scan forward for the next candidate POSITION (equal timestamps
    resolve by the buffer's (ts, mask) order — the same documented
    tiebreak caveat as every streaming engine), relaxed negations
    assert positional absence in the gap to the next bind (terminal:
    up to the horizon). State is ``(ts, mask, wm)``; eviction at
    ``wm - within``; the timer re-arms at the oldest event's horizon
    so tail anchors decide without new data."""
    cols = [key_name] + out_cols
    # steps: (slot, neg, times, mode, loop, until_slot) — validated at
    # dispatch (plain/times/loops; terminal strict loops refused)
    slot0 = steps[0][0]

    def _find(ts, mk, wm_us, wm_prev_us):
        n = bisect_left(ts, wm_us)
        total = len(ts)
        rows = []

        def hit(pos, slot):
            return pos < total and (mk[pos] >> slot) & 1

        for p0 in range(n):
            if not hit(p0, slot0):
                continue
            t0 = ts[p0]
            h = t0 + within_us
            if not (wm_prev_us <= h < wm_us):
                continue
            pos, cur_bind_pos, ok, cap = p0, None, True, []
            # pending relaxed negations: (slot, from_pos) — positional
            # absence in (from_pos, next_bind_pos)
            pending: list[tuple[int, int]] = []
            first_step = True
            for (slot, neg, times, mode, loop, until_slot) in steps:
                if neg:
                    if mode == "strict":
                        # asserted event == the next strict bind's
                        # event (dispatch guarantees a strict positive
                        # follows); only a failing verdict matters
                        # when that bind succeeds, so stability rides
                        # the bind's ts <= h < wm
                        if hit(pos, slot):
                            ok = False
                            break
                    else:
                        pending.append(
                            (slot, p0 if cur_bind_pos is None
                             else cur_bind_pos)
                        )
                    continue
                if loop:
                    # r9: loops stream. Horizon-stability per shape:
                    # STRICT runs must be PINNED by a bounding
                    # non-candidate event in the buffer — an open run
                    # (or one continuing at ts > h) extends greedily
                    # in batch and dies on within, so fail; RELAXED
                    # membership is every candidate position in
                    # (prev_bind, stop ∧ horizon], all ≤ h < wm and
                    # therefore stable.
                    if mode == "strict":
                        if first_step:
                            q = p0
                        else:
                            q = pos
                            if q >= total or ts[q] > h or not hit(q, slot):
                                ok = False
                                break
                        e = q
                        while (
                            e + 1 < total and hit(e + 1, slot)
                            and ts[e + 1] <= h
                        ):
                            e += 1
                        if e + 1 >= total or hit(e + 1, slot):
                            ok = False
                            break
                        mf, cnt = q, e - q + 1
                    else:
                        P = p0 if first_step else pos - 1
                        stop = None
                        if until_slot is not None:
                            jj = P + 1
                            while jj < total and ts[jj] <= h:
                                if hit(jj, until_slot):
                                    stop = jj
                                    break
                                jj += 1
                        if first_step:
                            mf, e, cnt = p0, p0, 1
                        else:
                            q = pos
                            while q < total and ts[q] <= h and (
                                stop is None or q < stop
                            ) and not hit(q, slot):
                                q += 1
                            if (
                                q >= total or ts[q] > h
                                or (stop is not None and q >= stop)
                                or not hit(q, slot)
                            ):
                                ok = False
                                break
                            mf, e, cnt = q, q, 1
                        for j in range(e + 1, total):
                            if ts[j] > h or (
                                stop is not None and j >= stop
                            ):
                                break
                            if hit(j, slot):
                                e = j
                                cnt += 1
                    for (x, anc) in pending:
                        for j in range(anc + 1, mf):
                            if hit(j, x):
                                ok = False
                                break
                        if not ok:
                            break
                    pending = []
                    if not ok:
                        break
                    cap += [ts[mf], ts[e], cnt]
                    cur_bind_pos = e
                    pos = e + 1
                    first_step = False
                    continue
                first_bind = None
                for rep in range(times):
                    if first_step and rep == 0:
                        q = p0  # the anchor binds itself
                    elif mode == "strict":
                        q = pos
                        if (
                            q >= total or ts[q] > h
                            or not hit(q, slot)
                        ):
                            ok = False
                            break
                    else:
                        q = pos
                        while q < total and not (
                            hit(q, slot) and ts[q] <= h
                        ):
                            if q < total and ts[q] > h:
                                break
                            q += 1
                        if q >= total or ts[q] > h or not hit(q, slot):
                            ok = False
                            break
                    if first_bind is None:
                        first_bind = q
                    pos = q + 1
                    cur_bind_pos = q
                if not ok:
                    break
                first_step = False
                # relaxed negations pending since the previous bind:
                # positional absence strictly between anchor and the
                # first repetition's bind
                for (x, anc) in pending:
                    for j in range(anc + 1, first_bind):
                        if hit(j, x):
                            ok = False
                            break
                    if not ok:
                        break
                pending = []
                if not ok:
                    break
                cap.append(ts[first_bind])
                if times > 1:
                    cap.append(ts[cur_bind_pos])
            if not ok or not cap:
                continue
            if pending:
                # terminal relaxed negation: absence up to the horizon
                dead = False
                for (x, anc) in pending:
                    j = anc + 1
                    while j < total and ts[j] <= h:
                        if hit(j, x):
                            dead = True
                            break
                        j += 1
                    if dead:
                        break
                if dead:
                    continue
            rows.append(cap)
        cut = bisect_left(ts, wm_us - within_us)
        return rows, ts[cut:], mk[cut:]

    def _mixed_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def _arm(ts_buf):
            if ts_buf:
                state.setTimeoutTimestamp(max(
                    (ts_buf[0] + within_us) // 1_000 + 1,
                    state.getCurrentWatermarkMs() + 1,
                ))

        if state.hasTimedOut:
            prev_ts, prev_mk, wm_prev = state.get
            ts_buf, mk_buf = list(prev_ts), list(prev_mk)
            rows, ts_buf, mk_buf = _find(ts_buf, mk_buf, wm_us, wm_prev)
            if rows:
                yield pd.DataFrame(
                    [[key_val, *r] for r in rows], columns=cols
                )
            if ts_buf:
                state.update((ts_buf, mk_buf, wm_us))
                _arm(ts_buf)
            else:
                state.remove()
            return

        ts_buf, mk_buf, wm_prev = [], [], 0
        if state.exists:
            prev_ts, prev_mk, wm_prev = state.get
            ts_buf, mk_buf = list(prev_ts), list(prev_mk)
        ts_parts = [np.asarray(ts_buf, dtype=np.int64)]
        mk_parts = [np.asarray(mk_buf, dtype=np.int64)]
        for pdf in pdfs:
            ts_parts.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            mk_parts.append(pdf[mask_col].to_numpy().astype(np.int64))
        ts_a = np.concatenate(ts_parts)
        mk_a = np.concatenate(mk_parts)
        order = np.lexsort((mk_a, ts_a))
        ts_buf = ts_a[order].tolist()
        mk_buf = mk_a[order].tolist()

        rows, ts_buf, mk_buf = _find(ts_buf, mk_buf, wm_us, wm_prev)
        if rows:
            yield pd.DataFrame([[key_val, *r] for r in rows], columns=cols)
        if ts_buf:
            state.update((ts_buf, mk_buf, wm_us))
            _arm(ts_buf)
        else:
            state.remove()

    return _mixed_fn


def _dispatch_mixed_stream(stream, steps, key_col, time_col, type_col,
                           contiguity_arg, within, watermark, skip):
    """Dispatch a MIXED-contiguity pattern to the positional streaming
    engine (late-r8). Guards mirror the batch mixed engine plus the
    two streaming-only exclusions proven in ``_make_mixed_cep_fn``:
    strict negations must be followed by a strict positive, and loops
    stay batch-only. Mode resolution is the batch rule —
    ``step.mode or contiguity_arg or "strict"``."""
    from flink_note_spark.operators.cep import (
        PatternStep,
        _cand_cond,
        _iter_where,
        _out_cols,
    )

    if within is None:
        raise ValueError(
            "mixed-contiguity streaming CEP requires within= — "
            "matches decide at the anchor horizon, which bounds both "
            "emission and per-key state"
        )
    if skip is not None and skip[0] != "no_skip":
        raise ValueError(
            f"skip_strategy {skip[0]!r} on a mixed streaming pattern "
            "is batch-only (mixed anchors decide at their horizon, "
            "where pruning needs the relaxed engine's pending-release "
            "machinery; pattern_stream_start(engine='auto') routes "
            "this shape through incremental replay); mixed binding is "
            "deterministic per anchor, so no_skip/default are "
            "equivalent and supported"
        )
    if steps[0].negate:
        raise ValueError("a mixed pattern must start positively")
    if any(st.where is not None or _iter_where(st) is not None
           for st in steps):
        raise ValueError(
            "where() predicates are supported on uniform strict/"
            "relaxed patterns (the mixed positional engine is "
            "type-keyed)"
        )
    if any(st.any_match for st in steps):
        raise ValueError(
            "followedByAny requires uniform relaxed contiguity "
            "(mixed patterns are earliest-binding only)"
        )
    if any(st.optional or st.times_max is not None for st in steps):
        raise ValueError(
            "mixed streaming CEP with optional()/times(n, m) is "
            "batch-only (variant expansion over the positional engine; pattern_stream_start(engine='auto') routes this shape through incremental replay)"
        )
    default_mode = (
        contiguity_arg if contiguity_arg not in (None, "mixed") else None
    )
    steps = [
        PatternStep(s.event_type, s.negate, s.times, s.loop, s.until,
                    s.times_max, s.optional,
                    s.mode or default_mode or "strict", s.where)
        for s in steps
    ]
    # loops stream since r9 — horizon-stability argument per shape in
    # _make_mixed_cep_fn; the ONE remainder is a terminal STRICT loop,
    # whose run maximality asserts on the event after it (no final
    # answer on an unbounded stream — the same refusal, with the same
    # pinned counterexample test, as the uniform strict engine's)
    last_pos = next((s for s in reversed(steps) if not s.negate), None)
    if last_pos is not None and last_pos.loop and (
        last_pos.mode == "strict"
    ):
        raise ValueError(
            "mixed streaming CEP ending in a STRICT one_or_more is "
            "batch-only: the run's maximality asserts on the event "
            "after it, which has no final answer on an unbounded "
            "stream (relaxed terminal loops are fine — the within "
            "horizon bounds their membership)"
        )
    if any(s.loop and s.mode == "strict" and s.until is not None
           for s in steps):
        raise ValueError(
            "until applies to relaxed loops only (a strict/consecutive "
            "run ends at the first non-matching event by construction)"
        )
    for i, s in enumerate(steps):
        if s.negate and s.mode == "strict":
            nxt = next(
                (t for t in steps[i + 1:] if not t.negate), None
            )
            if nxt is None or nxt.mode != "strict":
                raise ValueError(
                    "a strict negation in a mixed streaming pattern "
                    "must be followed by a strict-mode positive step: "
                    "the asserted successor is only horizon-stable "
                    "when it is the bound event itself (terminal or "
                    "relaxed-followed strict negations are batch-only)"
                )
    out_cols = _out_cols(steps)
    key_type = dict(stream.dtypes)[key_col]
    out_schema = f"{key_col} {key_type}, " + ", ".join(
        f"{c} long" for c in out_cols
    )
    within_us = _parse_duration_ms(within) * 1_000
    conds = [_cand_cond(s, type_col) for s in steps]
    steps_l = []
    for i, s in enumerate(steps):
        until_slot = None
        if s.loop and s.until is not None:
            until_slot = len(conds)
            conds.append(F.col(type_col) == s.until)
        steps_l.append(
            (i, s.negate, s.times, s.mode, s.loop, until_slot)
        )
    steps_t = tuple(steps_l)
    mask = None
    for i, c in enumerate(conds):
        term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
        mask = term if mask is None else mask + term
    # strict adjacency counts NON-candidate events — keep every row
    projected = _mask_projection(
        stream, mask, key_col, time_col, watermark, drop_zero=False,
    )
    return (
        projected.groupBy(key_col)
        .applyInPandasWithState(
            _make_mixed_cep_fn(
                steps_t, key_col, time_col, "__cand_mask", within_us,
                out_cols,
            ),
            outputStructType=out_schema,
            stateStructType="ts array<long>, mk array<long>, wm long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _make_cep_timeouts_fn(pattern_slots: list[int], key_name: str,
                          ts_col: str, slot_col: str,
                          within_us: int, k: int):
    """Per-key incremental TIMEOUT extractor (r8) — the streaming twin
    of ``operators/cep.match_pattern_timeouts`` (Flink's
    ``PatternTimeoutFunction`` side output), sharing the vectorized
    relaxed engine's buffer design (int64 (ts, slot) arrays, JVM-side
    candidate filter).

    An anchor's fate is DECIDED exactly when the watermark passes its
    horizon ``t0 + within`` — everything it could ever bind is then
    stable — so timeouts emit with the anchor-horizon exactly-once
    window ``wm_prev <= t0 + within < wm`` (the same bookkeeping the
    general engine uses for relaxed finality). Binding failure is
    per-step: the first step whose earliest-after candidate is absent
    or beyond the horizon sets ``timeout_step``; bound prefix steps
    keep their times, the rest are NULL. Eviction and timer proofs are
    the matcher's (undecided anchors have ``horizon >= wm``, hence
    ``t0 >= wm - within`` — inside the kept region; the timer re-arms
    at the oldest buffered event's horizon)."""
    cols = (
        [key_name] + [f"ts_{i}" for i in range(1, k + 1)]
        + ["timeout_step"]
    )
    uniq_slots = sorted(set(pattern_slots))

    def _find(ts, sl, wm_us, wm_prev_us):
        cand = {s: ts[sl == s] for s in uniq_slots}
        t0 = cand[pattern_slots[0]]
        out = None
        if t0.size:
            horizon = t0 + within_us
            steps = [t0]
            fail = np.zeros(t0.shape, dtype=np.int64)
            cur = t0
            for si, s in enumerate(pattern_slots[1:], start=2):
                ct = cand[s]
                if ct.size:
                    idx = np.searchsorted(ct, cur, side="right")
                    ok = idx < ct.size
                    nxt = ct[np.minimum(idx, ct.size - 1)]
                else:
                    ok = np.zeros(t0.shape, dtype=bool)
                    nxt = cur
                ok = ok & (nxt <= horizon)
                fail = np.where((fail == 0) & ~ok, si, fail)
                cur = np.where(ok, nxt, cur)
                steps.append(nxt)
            decide = (horizon >= wm_prev_us) & (horizon < wm_us)
            emit = decide & (fail > 0)
            if emit.any():
                fs = fail[emit]
                out = {"steps": [st[emit] for st in steps], "fail": fs}
        cut = int(np.searchsorted(ts, wm_us - within_us, side="left"))
        return out, ts[cut:], sl[cut:]

    def _emit(key_val, out):
        n = out["fail"].size
        data = {key_name: np.repeat(np.asarray([key_val]), n)}
        for j, arr in enumerate(out["steps"], start=1):
            s = pd.array(arr, dtype="Int64")
            s[out["fail"] <= j] = pd.NA
            data[f"ts_{j}"] = s
        data["timeout_step"] = out["fail"].astype(np.int32)
        return pd.DataFrame(data, columns=cols)

    def _fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def _arm(ts):
            state.setTimeoutTimestamp(max(
                (int(ts[0]) + within_us) // 1_000 + 1,
                state.getCurrentWatermarkMs() + 1,
            ))

        if state.hasTimedOut:
            prev_ts, prev_sl, wm_prev = state.get
            ts = np.asarray(prev_ts, dtype=np.int64)
            sl = np.asarray(prev_sl, dtype=np.int64)
            out, ts, sl = _find(ts, sl, wm_us, wm_prev)
            if out is not None:
                yield _emit(key_val, out)
            if ts.size:
                state.update((ts.tolist(), sl.tolist(), wm_us))
                _arm(ts)
            else:
                state.remove()
            return

        parts_t, parts_s, wm_prev = [], [], 0
        if state.exists:
            prev_ts, prev_sl, wm_prev = state.get
            parts_t.append(np.asarray(prev_ts, dtype=np.int64))
            parts_s.append(np.asarray(prev_sl, dtype=np.int64))
        for pdf in pdfs:
            parts_t.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            parts_s.append(pdf[slot_col].to_numpy().astype(np.int64))
        ts = np.concatenate(parts_t)
        sl = np.concatenate(parts_s)
        order = np.argsort(ts, kind="stable")
        ts, sl = ts[order], sl[order]

        out, ts, sl = _find(ts, sl, wm_us, wm_prev)
        if out is not None:
            yield _emit(key_val, out)
        if ts.size:
            state.update((ts.tolist(), sl.tolist(), wm_us))
            _arm(ts)
        else:
            state.remove()

    return _fn


def match_pattern_timeouts_stream(
    stream: DataFrame,
    pattern,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    watermark: str = "5 minutes",
    contiguity: str | None = None,
) -> DataFrame:
    """Streaming timed-out partial matches (r8) — Flink's
    ``PatternTimeoutFunction`` side output where it natively lives:
    for every anchor whose relaxed chain fails to complete inside
    ``within``, emit ``(key, ts_1 .. ts_k, timeout_step)`` once the
    watermark passes the anchor's horizon (bound steps in epoch µs,
    unbound NULL). Equality-vs-batch
    (``operators/cep.match_pattern_timeouts``) and the
    matches+timeouts anchor partition are pytest-pinned.

    Scope mirrors the batch operator MINUS ``where`` conditions
    (the streaming slot projection is per event type): plain positive
    relaxed chains only; ``within`` required."""
    from flink_note_spark.operators.cep import (
        Pattern,
        _normalize,
        _resolve_contiguity,
    )

    if isinstance(pattern, Pattern):
        if contiguity is None and pattern.contiguity is not None:
            contiguity = pattern.contiguity
        if within is None:
            within = pattern.within_
    steps = _normalize(pattern)
    if _resolve_contiguity(steps, contiguity) != "relaxed":
        raise ValueError(
            "timeout extraction is relaxed-only (pass "
            "contiguity='relaxed' or build with followed_by)"
        )
    if within is None:
        raise ValueError(
            "match_pattern_timeouts_stream requires within= (without "
            "a window nothing ever times out — Flink's rule)"
        )
    if any(
        s.negate or s.loop or s.times != 1 or s.optional
        or s.times_max is not None or s.any_match or s.where is not None
        for s in steps
    ):
        raise ValueError(
            "streaming timeout extraction supports plain positive "
            "steps only (where()/quantifiers/negation/any are "
            "batch-only here)"
        )
    k = len(steps)
    if k < 2:
        raise ValueError("pattern needs at least two steps to time out")
    types = [s.event_type for s in steps]
    within_us = _parse_duration_ms(within) * 1_000
    key_type = dict(stream.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, "
        + ", ".join(f"ts_{i} long" for i in range(1, k + 1))
        + ", timeout_step int"
    )
    types_sorted = sorted(set(types))
    slot_of = {t: i for i, t in enumerate(types_sorted)}
    slot_expr = F.lit(-1)
    for t, i in slot_of.items():
        slot_expr = F.when(F.col(type_col) == t, F.lit(i)).otherwise(
            slot_expr
        )
    # the event-time column folds into the slot expression so the
    # candidate filter stays ABOVE the watermark node (see
    # _mask_projection's pushdown note)
    slot_expr = F.when(F.col(time_col).isNull(), F.lit(-1)).otherwise(
        slot_expr
    )
    projected = (
        stream.withWatermark(time_col, watermark)
        .withColumn("__slot", slot_expr)
        .filter(F.col("__slot") >= 0)
        .select(key_col, time_col, "__slot")
    )
    return (
        projected.groupBy(key_col)
        .applyInPandasWithState(
            _make_cep_timeouts_fn(
                [slot_of[t] for t in types], key_col, time_col,
                "__slot", within_us, k,
            ),
            outputStructType=out_schema,
            stateStructType="ts array<long>, sl array<long>, wm long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _make_general_cep_fn(steps, key_name, ts_col, mask_col, within_us,
                         contiguity, out_cols, skip=None,
                         n_vals=0, capture=()):
    """Per-key incremental matcher for the GENERAL pattern surface
    (negation + greedy ``one_or_more``/``until`` + ``times`` +
    ``where()`` value predicates), r7/r8 — the streaming rendering of
    the batch general engines, equality-tested against
    ``operators/cep.match_pattern`` per pattern in
    tests/test_streaming.py.

    Candidate-mask design (r8): ``steps`` carries SLOT indices, not
    event types — ``match_pattern_stream`` pre-computes one candidate
    boolean per pattern step (type equality AND the optional
    ``where`` predicate, ``operators/cep._cand_cond``) as a Catalyst
    projection BEFORE the stream enters the buffer, packs them into
    one long (bit i = candidate for slot i), and the engines test
    bits instead of type strings. Value predicates therefore never
    reach Python — the payload columns are dropped at the scan — and
    per-event state shrinks from a string to a long.

    Matching always runs on the STABLE REGION — buffered events with
    ``ts < wm``. Any not-yet-arrived event has ``ts >= wm``, so the
    stable region's content and ORDER are immutable: positional
    (strict) and earliest-after (relaxed) decisions taken inside it
    are final. What differs per mode is when a whole match is DECIDED:

    **strict**: every check a match performs (adjacency, negation,
    loop-run maximality) involves only its own consumed events plus
    the event at a consumed position — a terminal positive step means
    the last examined position is consumed, so a match is decided
    exactly when its last consumed event is ``< wm`` (same finality
    rule as the plain strict engine; that is why terminal negation /
    terminal loops are rejected at dispatch — their "what comes next"
    question has no final answer against an unbounded stream).
    Exactly-once: emit matches with ``wm_prev <= last_ts < wm``.
    Eviction: loop-free patterns keep the trailing
    ``consumed_total - 1`` events of the finalized region (a match
    spanning the boundary occupies trailing adjacent positions);
    loop patterns REQUIRE ``within`` — a run can stretch a match over
    arbitrarily many events, so state is bounded by the horizon
    instead (evict ``ts < wm - within``; an incomplete match anchored
    below that is dead: any future completion would land ``>= wm``
    and breach ``within``).

    **relaxed**: a match anchored at ``t0`` only ever examines events
    in ``(t0, t0 + within]`` — bindings beyond the horizon fail the
    match regardless of identity, loop elements are horizon-filtered,
    an ``until`` stop beyond the horizon is irrelevant, and terminal
    negation asserts absence up to the horizon (the batch rule). So
    the match is decided as soon as ``wm > t0 + within``: everything
    at or below the horizon is then stable. Exactly-once: emit
    anchors with ``wm_prev <= t0 + within < wm`` (horizon-window
    bookkeeping instead of the plain engine's last-element window,
    because loop runs and negation verdicts are not final at the last
    element's timestamp). Eviction as in the plain relaxed engine
    (``ts < wm - within``). The event-time timer is re-armed at the
    oldest buffered event's horizon so tail anchors decide even if
    this key never receives another event.
    """
    cols = [key_name] + out_cols
    has_loop = any(s[3] for s in steps)
    consumed_total = sum(s[2] for s in steps if not s[1] and not s[3])
    noskip_loops = skip is not None  # any strategy => non-greedy loops
    #: payload capture (r9 — streaming ``carry_payload``): per entry
    #: (positive_step_k, val_idx, "first"|"last"), appended to each cap
    #: AFTER the timestamp geometry, in ``capture`` order; the caller's
    #: ``out_cols`` names them. STRICT engine only (dispatch-guarded).
    pidx_of: dict[int, int] = {}
    _pk = 0
    for _si, _s in enumerate(steps):
        if not _s[1]:
            _pk += 1
            pidx_of[_si] = _pk

    # cap-offset geometry shared with batch _apply_skip: which cap
    # entries are timestamps, and where each positive step's
    # first/last timestamps sit
    _is_ts: list[bool] = []
    _step_offsets: list[tuple[int, int | None]] = []
    _off = 0
    has_any = any(s[5] for s in steps)
    for (_typ, _neg, _times, _loop, _until, _any) in steps:
        if _neg:
            continue
        first_off = _off
        _is_ts.append(True)
        _off += 1
        last_off = None
        if _loop or _times > 1:
            _is_ts.append(True)
            last_off = _off
            _off += 1
        if _loop:
            _is_ts.append(False)
            _off += 1
        _step_offsets.append((first_off, last_off))
    _is_ts += [False] * len(capture)  # payload entries: never timestamps

    def _se(cap):
        ts = [v for v, f in zip(cap, _is_ts) if f]
        return (min(ts), max(ts))

    #: sequential strategies prune in COMPLETION order (r8, ADVICE
    #: r7): a cap is final for the chain only when no later-decided
    #: cap can end before it — ends of future anchors are >= wm -
    #: within, so caps are held PENDING and released once
    #: ``end < wm - within``, giving a release sequence globally
    #: monotone in end across watermark windows (the batch kernel's
    #: (end, start) scan, rendered incrementally).
    sequential = skip is not None and skip[0] in (
        "skip_past_last_event", "skip_to_first", "skip_to_last"
    )

    def _apply_skip_rows(decided, bound):
        """no_skip / skip_to_next over THIS WINDOW's decided caps
        (both are per-anchor selections, insensitive to cross-window
        completion order; the sequential strategies run through the
        pending-release chain instead)."""
        if skip is None or skip[0] == "no_skip":
            return decided, bound
        best = {}
        for c in sorted(decided, key=lambda c: (_se(c)[1], c)):
            best.setdefault(_se(c)[0], c)
        return (
            sorted(best.values(), key=lambda c: (*_se(c), c)),
            bound,
        )

    def _chain_sequential(release, bound):
        """The per-key sequential prune chain over caps RELEASED in
        completion order (sorted by (end, start); ends are monotone
        across calls by the release rule). Caps sharing an end are
        simultaneous completions: Flink reports every match that
        completes at an event before pruning partials, so the whole
        group is judged against the pre-group bound and the threshold
        advances only when the group flushes (same-end groups never
        split across release batches — a cap's release window depends
        only on its end)."""
        kind, arg = skip
        if kind == "skip_past_last_event":
            def thr(c):
                return _se(c)[1]
            strict_after = True
        else:
            first_off, last_off = _step_offsets[arg - 1]
            use = (
                last_off
                if (kind == "skip_to_last" and last_off is not None)
                else first_off
            )

            def thr(c):
                return c[use]
            strict_after = False
        rows = []
        i, n = 0, len(release)
        while i < n:
            e = _se(release[i])[1]
            gb = None
            while i < n and _se(release[i])[1] == e:
                c = release[i]
                s = _se(c)[0]
                if bound is None or (
                    s > bound if strict_after else s >= bound
                ):
                    rows.append(c)
                    t = thr(c)
                    if (
                        t is not None
                        and (gb is None or t > gb)
                        and (bound is None or t > bound)
                    ):
                        gb = t
                i += 1
            if gb is not None:
                bound = gb
        return rows, bound

    def _find_gstrict(ts_buf, mk_buf, vs_buf, wm_us, wm_prev_us,
                      bound, pend):
        n = 0
        while n < len(ts_buf) and ts_buf[n] < wm_us:
            n += 1
        rows = []

        def hit(pos, slot):
            return (mk_buf[pos] >> slot) & 1

        def emit(cap, last_ts, fpos=None, lpos=None):
            if within_us is not None and last_ts - cap[0] > within_us:
                return
            if wm_prev_us <= last_ts:  # last_ts < wm by construction
                if capture:
                    cap = cap + [
                        vs_buf[vi][
                            fpos[ck] if which == "first" else lpos[ck]
                        ]
                        for (ck, vi, which) in capture
                    ]
                rows.append(cap)

        def rec(si, pos, cap, last_ts, fpos, lpos):
            """Non-greedy (no_skip) enumeration: loops emit every
            prefix; a prefix whose next position still holds the loop
            candidate dies at the following step (strict adjacency)
            exactly as in the batch engine."""
            if si == len(steps):
                if cap:
                    emit(cap, last_ts, fpos, lpos)
                return
            slot, neg, times, loop, _until, _any = steps[si]
            if neg:
                if pos < n and hit(pos, slot):
                    return
                rec(si + 1, pos, cap, last_ts, fpos, lpos)
                return
            k = pidx_of[si]
            if loop:
                q = pos
                while q < n and hit(q, slot):
                    q += 1
                    rec(
                        si + 1, q,
                        cap + [ts_buf[pos], ts_buf[q - 1], q - pos],
                        ts_buf[q - 1],
                        {**fpos, k: pos}, {**lpos, k: q - 1},
                    )
                return
            first, p, lt = None, pos, last_ts
            for _ in range(times):
                if p >= n or not hit(p, slot):
                    return
                if first is None:
                    first = ts_buf[p]
                lt = ts_buf[p]
                p += 1
            rec(
                si + 1, p,
                cap + [first] + ([lt] if times > 1 else []), lt,
                {**fpos, k: pos}, {**lpos, k: p - 1},
            )

        for p0 in range(n):
            if noskip_loops:
                rec(0, p0, [], None, {}, {})
                continue
            pos, cap, ok, last_ts = p0, [], True, None
            fpos, lpos = {}, {}
            for si, (slot, neg, times, loop, _until, _any) in enumerate(
                steps
            ):
                if neg:
                    if pos < n and hit(pos, slot):
                        ok = False
                        break
                    continue
                k = pidx_of[si]
                if loop:
                    if pos >= n or not hit(pos, slot):
                        ok = False
                        break
                    q = pos
                    while q < n and hit(q, slot):
                        q += 1
                    cap += [ts_buf[pos], ts_buf[q - 1], q - pos]
                    fpos[k], lpos[k] = pos, q - 1
                    last_ts = ts_buf[q - 1]
                    pos = q
                else:
                    first = None
                    fp = pos
                    for _ in range(times):
                        if pos >= n or not hit(pos, slot):
                            ok = False
                            break
                        if first is None:
                            first = ts_buf[pos]
                        last_ts = ts_buf[pos]
                        pos += 1
                    if not ok:
                        break
                    cap.append(first)
                    if times > 1:
                        cap.append(last_ts)
                    fpos[k], lpos[k] = fp, pos - 1
            if not ok or not cap:
                continue
            emit(cap, last_ts, fpos, lpos)
        # r8: skip strategies on STRICT patterns. A strict match is
        # decided exactly when its END passes the watermark, so ends
        # are globally monotone across watermark windows — the
        # sequential prune chain consumes each window's decided caps
        # directly (sorted by (end, start)), carrying only ``bound``;
        # the relaxed engine's pending-release machinery exists solely
        # because relaxed anchors decide at their HORIZON, where a
        # later-decided anchor can still end earlier. Equal-end groups
        # cannot split across windows (same end ⇒ same window).
        # skip_to_next rides the per-window per-anchor selection —
        # loop-free strict patterns bind deterministically (≤1 match
        # per anchor); strict LOOPS (r9, VERDICT r8 item 4) extend it
        # across windows: an anchor's prefix caps end in prefix-length
        # order and a strict cap decides exactly when its end passes
        # the watermark, so the FIRST window in which ANY cap of an
        # anchor decides contains its earliest end — emit that one,
        # remember the anchor in ``pend`` (padded to cap width), and
        # drop the anchor's later-window caps. Anchor entries evict at
        # the anchor horizon: emit()'s ``within`` filter means no cap
        # can end past start + within, so once wm passes it the
        # anchor is closed.
        if sequential:
            release = sorted(
                rows, key=lambda c: (_se(c)[1], _se(c)[0], c)
            )
            rows, bound = _chain_sequential(release, bound)
        else:
            rows, bound = _apply_skip_rows(rows, bound)
            if skip is not None and skip[0] == "skip_to_next" and has_loop:
                seen = {c[0] for c in pend}
                kept = []
                for c in rows:
                    s = _se(c)[0]
                    if s in seen:
                        continue
                    seen.add(s)
                    kept.append(c)
                rows = kept
                anchor_evict = wm_us - within_us
                pend = [
                    [s] * cap_w
                    for s in sorted(seen) if s >= anchor_evict
                ]
        if has_loop:
            evict = wm_us - within_us
            cut = 0
            while cut < len(ts_buf) and ts_buf[cut] < evict:
                cut += 1
        else:
            cut = max(0, n - (consumed_total - 1)) if consumed_total > 1 else n
        return (
            rows, ts_buf[cut:], mk_buf[cut:],
            [col[cut:] for col in vs_buf], bound, pend,
        )

    def _find_grelaxed(ts_buf, mk_buf, vs_buf, wm_us, wm_prev_us,
                       bound, pend):
        from bisect import bisect_right

        n = 0
        while n < len(ts_buf) and ts_buf[n] < wm_us:
            n += 1
        by_slot: dict[int, list[int]] = {}
        for t, m in zip(ts_buf[:n], mk_buf[:n]):
            s = 0
            while m:
                if m & 1:
                    by_slot.setdefault(s, []).append(t)
                m >>= 1
                s += 1

        def first_after(slot, after):
            c = by_slot.get(slot)
            if not c:
                return None
            i = bisect_right(c, after)
            return c[i] if i < len(c) else None

        t0_slot = next(s[0] for s in steps if not s[1])
        decided = []

        greedy_rec = not noskip_loops

        def rec(s0, h, si, cur, cap, pending):
            """Branching enumeration — used for the skip strategies'
            non-greedy semantics (relaxed loops branch per prefix, the
            streaming twin of the batch ordered-window prefix pass)
            AND, since r8, for ``followedByAny`` patterns in greedy
            mode (any-steps branch per candidate, any-loops per
            suffix run — the batch suffix-window rendered over the
            stable region, which is complete below the anchor's
            horizon by relaxed finality)."""
            if si == len(steps):
                for (x, anc) in pending:
                    xa = first_after(x, anc if anc is not None else s0)
                    if xa is not None and xa <= h:
                        return
                decided.append(cap)
                return
            slot, neg, times, loop, until, any_m = steps[si]
            if neg:
                # advance past the negation (r8 fix: the r7 kernel
                # recursed with the SAME si, infinitely — latent, as
                # no test combined negation with the rec path)
                rec(s0, h, si + 1, cur, cap, pending + [(slot, cur)])
                return

            def negs_ok(nxt):
                for (x, anc) in pending:
                    xa = first_after(x, anc if anc is not None else s0)
                    if xa is not None and xa < nxt:
                        return False
                return True

            if loop:
                anchor = s0 if cur is None else cur
                els0 = [s0] if cur is None else []
                stop = first_after(until, anchor) if until else None
                lst = by_slot.get(slot, [])
                i = bisect_right(lst, anchor)
                els = els0 + [
                    t for t in lst[i:]
                    if (stop is None or t < stop) and t <= h
                ]
                if not els:
                    return
                if any_m and cur is not None:
                    # any-loop (r8, greedy-only): every element starts
                    # its own greedy run over its suffix
                    for j in range(len(els)):
                        if negs_ok(els[j]):
                            rec(
                                s0, h, si + 1, els[-1],
                                cap + [els[j], els[-1], len(els) - j],
                                [],
                            )
                    return
                if not negs_ok(els[0]):
                    return
                if greedy_rec:
                    rec(
                        s0, h, si + 1, els[-1],
                        cap + [els[0], els[-1], len(els)], [],
                    )
                    return
                for k in range(1, len(els) + 1):
                    rec(
                        s0, h, si + 1, els[k - 1],
                        cap + [els[0], els[k - 1], k], [],
                    )
                return
            if any_m and cur is not None:
                lst = by_slot.get(slot, [])
                i = bisect_right(lst, cur)
                for c in lst[i:]:
                    if c > h:
                        break
                    if negs_ok(c):
                        rec(s0, h, si + 1, c, cap + [c], [])
                return
            if cur is None:
                nxt, new_cur = s0, s0
            else:
                nxt = first_after(slot, cur)
                if nxt is None or nxt > h:
                    return
                new_cur = nxt
            for _ in range(times - 1):
                new_cur = first_after(slot, new_cur)
                if new_cur is None or new_cur > h:
                    return
            if not negs_ok(nxt):
                return
            rec(
                s0, h, si + 1, new_cur,
                cap + [nxt] + ([new_cur] if times > 1 else []), [],
            )

        for s0 in by_slot.get(t0_slot, ()):
            h = s0 + within_us
            if not (wm_prev_us <= h < wm_us):  # decided exactly once
                continue
            if noskip_loops or has_any:
                rec(s0, h, 0, None, [], [])
                continue
            cap, cur, ok, pending = [], None, True, []
            for (slot, neg, times, loop, until, _any) in steps:
                if neg:
                    pending.append((slot, cur))
                    continue
                if loop:
                    anchor = s0 if cur is None else cur
                    els0 = [s0] if cur is None else []
                    stop = first_after(until, anchor) if until else None
                    lst = by_slot.get(slot, [])
                    i = bisect_right(lst, anchor)
                    els = els0 + [
                        t for t in lst[i:]
                        if (stop is None or t < stop) and t <= h
                    ]
                    if not els:
                        ok = False
                        break
                    nxt = els[0]
                    cap += [els[0], els[-1], len(els)]
                    new_cur = els[-1]
                else:
                    if cur is None:
                        nxt = s0
                        cap.append(s0)
                        new_cur = s0
                        reps = times - 1
                    else:
                        nxt = first_after(slot, cur)
                        if nxt is None or nxt > h:
                            ok = False
                            break
                        cap.append(nxt)
                        new_cur = nxt
                        reps = times - 1
                    for _ in range(reps):
                        new_cur = first_after(slot, new_cur)
                        if new_cur is None or new_cur > h:
                            ok = False
                            break
                    if not ok:
                        break
                    if times > 1:
                        cap.append(new_cur)
                # open-interval absence check for negations declared
                # since the previous positive binding: no negated-type
                # event strictly between the anchor and this binding
                for (x, anc) in pending:
                    xa = first_after(x, anc if anc is not None else s0)
                    if xa is not None and xa < nxt:
                        ok = False
                        break
                pending = []
                if not ok:
                    break
                cur = new_cur
            if ok and pending:
                # terminal negation: absence up to the within horizon
                for (x, anc) in pending:
                    xa = first_after(x, anc if anc is not None else s0)
                    if xa is not None and xa <= h:
                        ok = False
                        break
            if ok:
                decided.append(cap)
        if sequential:
            pend = pend + decided
            rel_cut = wm_us - within_us
            release = sorted(
                (c for c in pend if _se(c)[1] < rel_cut),
                key=lambda c: (_se(c)[1], _se(c)[0], c),
            )
            pend = [c for c in pend if _se(c)[1] >= rel_cut]
            rows, bound = _chain_sequential(release, bound)
        else:
            rows, bound = _apply_skip_rows(decided, bound)
        evict = wm_us - within_us
        cut = 0
        while cut < len(ts_buf) and ts_buf[cut] < evict:
            cut += 1
        return (
            rows, ts_buf[cut:], mk_buf[cut:],
            [col[cut:] for col in vs_buf], bound, pend,
        )

    strict = contiguity == "strict"
    find = _find_gstrict if strict else _find_grelaxed
    # relaxed decisions happen at anchor horizons; strict ones at the
    # last element — arm the timer accordingly
    horizon_timer = not strict

    # pending caps are carried in state FLATTENED (cap width is fixed
    # per pattern — no optional steps in streaming), avoiding nested
    # array state types. With payload capture, cap_w grows by the
    # capture count (entries ride rows, and the skip_to_next anchor
    # set pads to the same width).
    cap_w = _off + len(capture)

    def _pack(pend):
        return [v for c in pend for v in c]

    def _unpack(flat):
        flat = list(flat)
        return [
            flat[i:i + cap_w] for i in range(0, len(flat), cap_w)
        ]

    def _general_cep_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def _arm(ts_buf, pend):
            cands = []
            if ts_buf:
                if horizon_timer:
                    cands.append((ts_buf[0] + within_us) // 1_000 + 1)
                else:
                    cands.append(ts_buf[-1] // 1_000 + 1)
            if pend:
                # a pending cap releases when wm passes end + within
                m = min(_se(c)[1] for c in pend)
                cands.append((m + within_us) // 1_000 + 1)
            state.setTimeoutTimestamp(
                max(min(cands), state.getCurrentWatermarkMs() + 1)
            )

        def _vs_unflat(vflat, n_rows):
            return [
                list(vflat[i * n_rows:(i + 1) * n_rows])
                for i in range(n_vals)
            ]

        def _vs_flat(vs_buf):
            return [v for col in vs_buf for v in col]

        def _update(ts_buf, mk_buf, bound, pend, vs_buf):
            if n_vals:
                state.update((
                    ts_buf, mk_buf, wm_us, bound, _pack(pend),
                    _vs_flat(vs_buf),
                ))
            else:
                state.update(
                    (ts_buf, mk_buf, wm_us, bound, _pack(pend))
                )

        if state.hasTimedOut:
            if n_vals:
                ts_buf, mk_buf, wm_prev, bound, pf, vflat = state.get
                vs_buf = _vs_unflat(vflat, len(ts_buf))
            else:
                ts_buf, mk_buf, wm_prev, bound, pf = state.get
                vs_buf = []
            rows, ts_buf, mk_buf, vs_buf, bound, pend = find(
                list(ts_buf), list(mk_buf), vs_buf, wm_us, wm_prev,
                bound, _unpack(pf),
            )
            if rows:
                yield pd.DataFrame(
                    [[key_val, *r] for r in rows], columns=cols
                )
            if ts_buf or pend:
                _update(ts_buf, mk_buf, bound, pend, vs_buf)
                if horizon_timer:
                    # undecided anchors / unreleased caps remain; both
                    # resolve on watermark advance alone, so the timer
                    # MUST re-arm (strict matches instead need new
                    # events, whose batch re-arms)
                    _arm(ts_buf, pend)
            else:
                # bound dies with the buffer safely: every emitted
                # threshold is < wm - within, every future event
                # arrives >= wm
                state.remove()
            return

        ts_buf, mk_buf, wm_prev, bound, pend = [], [], 0, None, []
        vs_buf = [[] for _ in range(n_vals)]
        if state.exists:
            if n_vals:
                prev_ts, prev_mk, wm_prev, bound, pf, vflat = state.get
                vs_buf = _vs_unflat(vflat, len(prev_ts))
            else:
                prev_ts, prev_mk, wm_prev, bound, pf = state.get
            ts_buf, mk_buf = list(prev_ts), list(prev_mk)
            pend = _unpack(pf)
        # numpy merge (r8): same (ts, mask) sort as the old
        # sorted(zip(...)) — lexsort primary ts, secondary mask keeps
        # the equal-ts tiebreak — without per-event Python
        pt = [np.asarray(ts_buf, dtype=np.int64)]
        pm = [np.asarray(mk_buf, dtype=np.int64)]
        pvs = [
            [np.asarray(vs_buf[i], dtype=np.float64)]
            for i in range(n_vals)
        ]
        for pdf in pdfs:
            pt.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            pm.append(pdf[mask_col].to_numpy().astype(np.int64))
            for i in range(n_vals):
                pvs[i].append(
                    pdf[f"__val{i}"].to_numpy(dtype=np.float64)
                )
        ts_a, mk_a = np.concatenate(pt), np.concatenate(pm)
        order = np.lexsort((mk_a, ts_a))
        ts_buf = ts_a[order].tolist()
        mk_buf = mk_a[order].tolist()
        vs_buf = [
            np.concatenate(pvs[i])[order].tolist() for i in range(n_vals)
        ]

        rows, ts_buf, mk_buf, vs_buf, bound, pend = find(
            ts_buf, mk_buf, vs_buf, wm_us, wm_prev, bound, pend
        )
        if rows:
            yield pd.DataFrame([[key_val, *r] for r in rows], columns=cols)
        if ts_buf or pend:
            _update(ts_buf, mk_buf, bound, pend, vs_buf)
            _arm(ts_buf, pend)
        else:
            state.remove()

    return _general_cep_fn


#: AST node whitelist for streaming iterative predicates — the SQL
#: subset that translates 1:1 to Python: comparisons, arithmetic,
#: and/or/not, abs(), numeric literals, column names.
_ITER_OK_NODES = (
    ast.Expression, ast.BoolOp, ast.And, ast.Or, ast.UnaryOp, ast.Not,
    ast.USub, ast.UAdd, ast.BinOp, ast.Add, ast.Sub, ast.Mult, ast.Div,
    ast.Mod, ast.Compare, ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.Eq,
    ast.NotEq, ast.Name, ast.Load, ast.Constant, ast.Call,
)


def _sql_predicate_to_python(template: str) -> tuple[str, list[str]]:
    """Translate a resolved iterative-condition template (SQL, refs
    already rewritten to ``__v{k}_{col}`` by ``cep._resolve_iter``)
    into a Python expression the streaming engine can evaluate at
    binding time. Supported subset — where SQL and Python agree
    symbol-for-symbol after keyword mapping: comparisons
    (``< <= > >= = <>``), arithmetic (``+ - * / %``), ``AND/OR/NOT``,
    ``abs()``, numeric literals, column names. Anything else (CASE,
    string functions, subqueries, ...) raises with a pointer to the
    batch operator, which evaluates the predicate in Spark SQL.

    Returns ``(python_expr, names)`` where ``names`` is every column
    identifier the expression reads (both ``__v{k}_{col}`` bind refs
    and bare candidate-event columns)."""
    s = template.replace("<>", "!=")
    s = re.sub(r"\bAND\b", " and ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bOR\b", " or ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNOT\b", " not ", s, flags=re.IGNORECASE)
    s = re.sub(r"(?<![<>!=])=(?!=)", "==", s)
    try:
        tree = ast.parse(s, mode="eval")
    except SyntaxError as e:
        raise ValueError(
            f"streaming iterative condition {template!r} is outside "
            f"the supported SQL subset (comparisons, arithmetic, "
            f"AND/OR/NOT, abs()); use the batch operator for full "
            f"Spark SQL predicates ({e.msg})"
        ) from None
    names: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            if not (
                isinstance(node.func, ast.Name)
                and node.func.id == "abs"
                and len(node.args) == 1
                and not node.keywords
            ):
                raise ValueError(
                    f"streaming iterative condition {template!r}: only "
                    f"abs() is supported as a function call; use the "
                    f"batch operator for full Spark SQL predicates"
                )
        elif isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)) or isinstance(
                node.value, bool
            ):
                raise ValueError(
                    f"streaming iterative condition {template!r}: only "
                    f"numeric literals are supported; use the batch "
                    f"operator for full Spark SQL predicates"
                )
        elif not isinstance(node, _ITER_OK_NODES):
            raise ValueError(
                f"streaming iterative condition {template!r} uses "
                f"{type(node).__name__}, outside the supported SQL "
                f"subset (comparisons, arithmetic, AND/OR/NOT, abs()); "
                f"use the batch operator for full Spark SQL predicates"
            )
        if isinstance(node, ast.Name) and node.id != "abs":
            if node.id not in names:
                names.append(node.id)
    return s, names


def _make_iter_cep_fn(steps, key_name, ts_col, mask_col, n_vals, preds,
                      within_us, contiguity, out_cols):
    """Per-key incremental matcher for ITERATIVE conditions (r8 —
    Flink ``IterativeCondition``, the streaming twin of the batch
    cross-step engines; equality-tested against
    ``operators/cep.match_pattern`` in tests/test_streaming.py).

    Why a dedicated engine: the general engine's candidate mask is
    computed per event by Catalyst BEFORE buffering, but an iterative
    predicate (``s<k>.col`` / ``first.col`` / ``prev.col`` refs)
    depends on the match's earlier bindings — it can only be decided
    at binding time, inside the enumeration. So this engine carries
    the REFERENCED payload columns (cast to double JVM-side,
    ``__val{i}``) through the shuffle and state alongside
    ``(ts, mask)``, and evaluates the compiled predicate per candidate
    during the walk. Only the columns a predicate actually reads pay
    the state cost; the candidate mask still prunes on type and any
    non-iterative ``where()`` parts JVM-side first.

    Binding semantics mirror the batch engines exactly (their naive
    differentials are the ground truth):

    - refs address the referenced step's FIRST bound event (loops:
      the run's first element);
    - relaxed plain steps bind the EARLIEST qualifying candidate
      after the previous binding (skip-till-next-match WITH the
      predicate — a type-matching event failing the predicate is
      skipped, Flink's rule); ``times(n)`` repeats that scan, every
      repetition tested;
    - relaxed loops take every qualifying element in
      ``(prev, horizon]`` before the ``until`` stop — non-qualifying
      elements are skipped, not run-breaking (relaxed internal
      contiguity); any-steps/any-loops branch per candidate/suffix
      exactly like the general engine;
    - negations assert the ABSENCE of a qualifying event (type AND
      predicate) strictly between their anchor and the next binding
      (terminal: up to the horizon);
    - strict patterns test the predicate at fixed positions
      (the batch lead/lag chain evaluated positionally).

    Finality/eviction are inherited verbatim from the general engine:
    relaxed anchors decide at ``t0 + within`` (within REQUIRED),
    strict matches at their last consumed event; eviction at
    ``wm - within`` (relaxed) / trailing ``consumed-1`` events
    (strict, loop-free by construction — strict loops are refused).

    NULL semantics (documented deviation): a candidate whose
    referenced value is NULL fails the predicate outright. This
    matches Spark SQL for conjunctions and bare comparisons (NULL
    compares to NULL → not matched); it deviates for ``OR``s where
    one disjunct alone would decide (SQL ``TRUE OR NULL`` = TRUE).
    Batch evaluates in Spark SQL and is authoritative for
    NULL-heavy payloads."""
    cols = [key_name] + out_cols
    strict = contiguity == "strict"
    consumed_total = sum(s[2] for s in steps if not s[1] and not s[3])
    # positive-step index (1-based) per step position
    pk_of: list[int | None] = []
    _pk = 0
    for s in steps:
        if s[1]:
            pk_of.append(None)
        else:
            _pk += 1
            pk_of.append(_pk)

    _compiled: dict[int, Any] = {}

    def _pred(idx, pos, binds, vals):
        expr, names = preds[idx]
        code = _compiled.get(idx)
        if code is None:
            code = compile(expr, "<iterative-condition>", "eval")
            _compiled[idx] = code
        ns = {}
        for nm, kind, k, ci in names:
            v = vals[ci][binds[k]] if kind == "ref" else vals[ci][pos]
            if v != v:  # NaN ≙ NULL: comparison never matches
                return False
            ns[nm] = v
        return bool(eval(code, {"__builtins__": {}, "abs": abs}, ns))

    def _find_strict(ts, mk, vals, wm_us, wm_prev_us):
        n = bisect_left(ts, wm_us)
        rows = []

        def hit(pos, slot):
            return (mk[pos] >> slot) & 1

        for p0 in range(n):
            pos, cap, ok, last_ts = p0, [], True, None
            binds: dict[int, int] = {}
            for si, (slot, neg, times, _loop, _until, _any) in enumerate(
                steps
            ):
                if neg:
                    if (
                        pos < n
                        and hit(pos, slot)
                        and (si not in preds or _pred(si, pos, binds, vals))
                    ):
                        ok = False
                        break
                    continue
                first = None
                for _ in range(times):
                    if (
                        pos >= n
                        or not hit(pos, slot)
                        or (si in preds and not _pred(si, pos, binds, vals))
                    ):
                        ok = False
                        break
                    if first is None:
                        first = pos
                    last_ts = ts[pos]
                    pos += 1
                if not ok:
                    break
                binds[pk_of[si]] = first
                cap.append(ts[first])
                if times > 1:
                    cap.append(last_ts)
            if not ok or not cap:
                continue
            if within_us is not None and last_ts - cap[0] > within_us:
                continue
            if wm_prev_us <= last_ts:  # last_ts < wm by pos < n
                rows.append(cap)
        cut = max(0, n - (consumed_total - 1)) if consumed_total > 1 else n
        return rows, ts[cut:], mk[cut:], [v[cut:] for v in vals]

    def _find_relaxed(ts, mk, vals, wm_us, wm_prev_us):
        n = bisect_left(ts, wm_us)
        by_pos: dict[int, list[int]] = {}
        by_ts: dict[int, list[int]] = {}
        for p in range(n):
            m = mk[p]
            s = 0
            while m:
                if m & 1:
                    by_pos.setdefault(s, []).append(p)
                    by_ts.setdefault(s, []).append(ts[p])
                m >>= 1
                s += 1

        def cands(slot, after_ts, idx, binds, limit_ts):
            """Qualifying candidate positions of ``slot`` with ts
            strictly after ``after_ts`` and <= ``limit_ts``, in order;
            predicate-filtered when step ``idx`` is iterative."""
            pl = by_pos.get(slot)
            if not pl:
                return
            tl = by_ts[slot]
            i = bisect_right(tl, after_ts)
            for j in range(i, len(pl)):
                if tl[j] > limit_ts:
                    return
                p = pl[j]
                if idx in preds and not _pred(idx, p, binds, vals):
                    continue
                yield p

        def neg_exists(slot, idx, anc_ts, lim_ts, inclusive, binds):
            pl = by_pos.get(slot)
            if not pl:
                return False
            tl = by_ts[slot]
            i = bisect_right(tl, anc_ts)
            for j in range(i, len(pl)):
                t = tl[j]
                if (t > lim_ts) if inclusive else (t >= lim_ts):
                    return False
                if idx not in preds or _pred(idx, pl[j], binds, vals):
                    return True
            return False

        t0_slot = next(s[0] for s in steps if not s[1])
        decided = []

        def rec(s0p, s0t, h, si, cur_ts, cap, binds, pending):
            if si == len(steps):
                for (slot_, idx_, anc) in pending:
                    if neg_exists(
                        slot_, idx_, anc if anc is not None else s0t,
                        h, True, binds,
                    ):
                        return
                decided.append(cap)
                return
            slot, neg, times, loop, until_slot, any_m = steps[si]
            if neg:
                rec(
                    s0p, s0t, h, si + 1, cur_ts, cap, binds,
                    pending + [(slot, si, cur_ts)],
                )
                return

            def negs_ok(nxt_ts, nb):
                for (slot_, idx_, anc) in pending:
                    if neg_exists(
                        slot_, idx_, anc if anc is not None else s0t,
                        nxt_ts, False, nb,
                    ):
                        return False
                return True

            k = pk_of[si]
            if loop:
                anchor_ts = s0t if cur_ts is None else cur_ts
                stop_ts = None
                if until_slot is not None:
                    tl = by_ts.get(until_slot)
                    if tl:
                        i = bisect_right(tl, anchor_ts)
                        if i < len(tl):
                            stop_ts = tl[i]
                els = [s0p] if cur_ts is None else []
                for p in cands(slot, anchor_ts, si, binds, h):
                    if stop_ts is not None and ts[p] >= stop_ts:
                        break
                    els.append(p)
                if not els:
                    return
                if any_m and cur_ts is not None:
                    for j in range(len(els)):
                        if negs_ok(ts[els[j]], binds):
                            rec(
                                s0p, s0t, h, si + 1, ts[els[-1]],
                                cap + [
                                    ts[els[j]], ts[els[-1]], len(els) - j,
                                ],
                                {**binds, k: els[j]}, [],
                            )
                    return
                if not negs_ok(ts[els[0]], binds):
                    return
                rec(
                    s0p, s0t, h, si + 1, ts[els[-1]],
                    cap + [ts[els[0]], ts[els[-1]], len(els)],
                    {**binds, k: els[0]}, [],
                )
                return
            if any_m and cur_ts is not None:
                for p in cands(slot, cur_ts, si, binds, h):
                    if negs_ok(ts[p], binds):
                        rec(
                            s0p, s0t, h, si + 1, ts[p], cap + [ts[p]],
                            {**binds, k: p}, [],
                        )
                return
            if cur_ts is None:
                first_p, c_ts = s0p, s0t
            else:
                first_p = next(cands(slot, cur_ts, si, binds, h), None)
                if first_p is None:
                    return
                c_ts = ts[first_p]
            last_p = first_p
            for _ in range(times - 1):
                q = next(cands(slot, c_ts, si, binds, h), None)
                if q is None:
                    return
                last_p, c_ts = q, ts[q]
            if not negs_ok(ts[first_p], binds):
                return
            rec(
                s0p, s0t, h, si + 1, c_ts,
                cap + [ts[first_p]] + ([ts[last_p]] if times > 1 else []),
                {**binds, k: first_p}, [],
            )

        for s0j, s0p in enumerate(by_pos.get(t0_slot, ())):
            s0t = by_ts[t0_slot][s0j]
            h = s0t + within_us
            if not (wm_prev_us <= h < wm_us):  # decided exactly once
                continue
            rec(s0p, s0t, h, 0, None, [], {}, [])
        cut = bisect_left(ts, wm_us - within_us)
        return decided, ts[cut:], mk[cut:], [v[cut:] for v in vals]

    find = _find_strict if strict else _find_relaxed
    horizon_timer = not strict

    def _unpack_vals(flat, n):
        flat = list(flat)
        return [
            np.asarray(flat[c * n:(c + 1) * n], dtype=np.float64)
            for c in range(n_vals)
        ]

    def _pack_vals(vals):
        return [float(x) for v in vals for x in v]

    def _iter_cep_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def _arm(ts_buf):
            if not ts_buf:
                return
            if horizon_timer:
                cand = (ts_buf[0] + within_us) // 1_000 + 1
            else:
                cand = ts_buf[-1] // 1_000 + 1
            state.setTimeoutTimestamp(
                max(cand, state.getCurrentWatermarkMs() + 1)
            )

        if state.hasTimedOut:
            prev_ts, prev_mk, wm_prev, vf = state.get
            ts_buf, mk_buf = list(prev_ts), list(prev_mk)
            vals = _unpack_vals(vf, len(ts_buf))
            rows, ts_buf, mk_buf, vals = find(
                ts_buf, mk_buf, vals, wm_us, wm_prev
            )
            if rows:
                yield pd.DataFrame(
                    [[key_val, *r] for r in rows], columns=cols
                )
            if ts_buf:
                state.update((ts_buf, mk_buf, wm_us, _pack_vals(vals)))
                if horizon_timer:
                    _arm(ts_buf)
            else:
                state.remove()
            return

        ts_buf, mk_buf, wm_prev = [], [], 0
        vals = [np.asarray([], dtype=np.float64)] * n_vals
        if state.exists:
            prev_ts, prev_mk, wm_prev, vf = state.get
            ts_buf, mk_buf = list(prev_ts), list(prev_mk)
            vals = _unpack_vals(vf, len(ts_buf))
        ts_parts = [np.asarray(ts_buf, dtype=np.int64)]
        mk_parts = [np.asarray(mk_buf, dtype=np.int64)]
        val_parts = [[v] for v in vals]
        for pdf in pdfs:
            ts_parts.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            mk_parts.append(pdf[mask_col].to_numpy().astype(np.int64))
            for ci in range(n_vals):
                val_parts[ci].append(
                    pdf[f"__val{ci}"].to_numpy().astype(np.float64)
                )
        ts_a = np.concatenate(ts_parts)
        mk_a = np.concatenate(mk_parts)
        order = np.lexsort((mk_a, ts_a))
        ts_buf = ts_a[order].tolist()
        mk_buf = mk_a[order].tolist()
        vals = [np.concatenate(val_parts[ci])[order] for ci in range(n_vals)]

        rows, ts_buf, mk_buf, vals = find(
            ts_buf, mk_buf, vals, wm_us, wm_prev
        )
        if rows:
            yield pd.DataFrame([[key_val, *r] for r in rows], columns=cols)
        if ts_buf:
            state.update((ts_buf, mk_buf, wm_us, _pack_vals(vals)))
            _arm(ts_buf)
        else:
            state.remove()

    return _iter_cep_fn


def _mask_projection(stream, mask, key_col, time_col, watermark,
                     drop_zero, val_cols=()):
    """Project the per-event candidate mask and (relaxed modes only)
    FILTER zero-mask events JVM-side — relaxed matching never consults
    them, so they need not shuffle, transfer, or buffer (r8).

    The filter must evaluate ABOVE the EventTimeWatermark node so that
    non-candidate events still advance the watermark; Catalyst pushes
    any predicate not referencing the watermark column below the node,
    so the event-time column is folded into the mask expression (null
    event time → mask 0, vacuous for CEP), making the filter one
    unsplittable time-referencing predicate that stays put. Strict
    modes keep every event (adjacency counts non-candidates).

    ``val_cols`` (r8, iterative conditions): payload columns the
    engine must consult at BINDING time — projected as
    ``__val{i}`` doubles. Everything else is still dropped at the
    scan; only the columns a cross-step predicate actually references
    pay the shuffle/state cost."""
    vals = [
        F.col(c).cast("double").alias(f"__val{i}")
        for i, c in enumerate(val_cols)
    ]
    val_names = [f"__val{i}" for i in range(len(val_cols))]
    if not drop_zero:
        return (
            stream.select(
                key_col, time_col,
                mask.cast("long").alias("__cand_mask"), *vals,
            )
            .withWatermark(time_col, watermark)
        )
    masked = F.when(F.col(time_col).isNull(), F.lit(0)).otherwise(mask)
    return (
        stream.withWatermark(time_col, watermark)
        .withColumn("__cand_mask", masked.cast("long"))
        .filter(F.col("__cand_mask") != 0)
        .select(key_col, time_col, "__cand_mask", *[
            F.col(c).cast("double").alias(n)
            for c, n in zip(val_cols, val_names)
        ])
    )


def _expand_variant_slots(steps):
    """Streaming variant expansion (r8): compile ``optional()`` /
    ``times(n, m)`` steps into PLAIN variant step tuples that
    reference ORIGINAL step slots (the candidate-mask bit layout is
    per original step, shared by every variant).

    Returns ``[(vsteps, opidx)]`` where ``vsteps`` is a tuple of
    ``(orig_step_idx, neg, times, loop, until)`` and ``opidx[j]`` is
    the ORIGINAL 1-based positive-step index of the variant's j-th
    positive step — the streaming twin of the batch
    ``operators/cep._expand_variants`` (same branching, same
    all-absent drop), keeping slot indices instead of event types."""
    per_step: list[list[tuple[tuple | None, int]]] = []
    pidx = 0
    for idx, s in enumerate(steps):
        if s.negate:
            per_step.append([((idx, True, 1, False, s.until), 0)])
            continue
        pidx += 1
        opts: list[tuple[tuple | None, int]] = []
        if s.optional:
            opts.append((None, pidx))
        counts = (
            range(s.times, s.times_max + 1)
            if s.times_max is not None else [s.times]
        )
        for c in counts:
            opts.append(((idx, False, c, s.loop, s.until), pidx))
        per_step.append(opts)

    variants: list[tuple[tuple, list[int]]] = []

    def rec(i: int, cur: list, orig: list[int]) -> None:
        if i == len(per_step):
            if any(not v[1] for v in cur):
                variants.append((tuple(cur), list(orig)))
            return
        for vstep, oi in per_step[i]:
            if vstep is None:
                rec(i + 1, cur, orig)
            else:
                cur.append(vstep)
                if not vstep[1]:
                    orig.append(oi)
                rec(i + 1, cur, orig)
                cur.pop()
                if not vstep[1]:
                    orig.pop()

    rec(0, [], [])
    return variants


def _variant_emit_maps(variants, out_cols):
    """Per-variant output realignment: map each FULL output column
    (``_out_cols`` of the ORIGINAL steps) to an index in the
    variant's cap, or None for absent optional steps. A count-1
    variant of a range quantifier repeats ``ts_i`` as ``ts_i_last``
    (the batch union's rule); an absent loop (zeroOrMore) leaves
    ``n_i`` NULL."""
    maps = []
    for vsteps, opidx in variants:
        cap_pos: dict[int, dict[str, int]] = {}
        w = 0
        j = 0
        for (idx, neg, times, loop, _until) in vsteps:
            if neg:
                continue
            entry = {"first": w}
            w += 1
            if loop or times > 1:
                entry["last"] = w
                w += 1
            else:
                entry["last"] = entry["first"]  # count-1 repeat rule
            if loop:
                entry["n"] = w
                w += 1
            cap_pos[opidx[j]] = entry
            j += 1
        emit = []
        for c in out_cols:
            if c.startswith("n_"):
                i, kind = int(c[2:]), "n"
            elif c.endswith("_last"):
                i, kind = int(c[3:-5]), "last"
            else:
                i, kind = int(c[3:]), "first"
            e = cap_pos.get(i)
            emit.append(None if e is None else e.get(kind))
        maps.append(emit)
    return maps


#: pend-state encoding of an absent optional step's NULL timestamp —
#: realigned variant rows carry NULLs, and the flattened array<long>
#: state cannot (epoch-micro values are always far above this)
_VNULL = -(1 << 62)


def _make_variants_cep_fn(steps, emit_maps, key_name, ts_col, mask_col,
                          within_us, contiguity, out_cols, skip=None):
    """Per-key incremental matcher for ``optional()`` / ``times(n, m)``
    patterns (r8): the batch variant-union (Flink's branching NFA as a
    union of deterministic patterns, ``operators/cep._expand_variants``)
    rendered incrementally — every expanded variant runs as its own
    GREEDY state machine over ONE shared per-key (ts, candidate-mask)
    buffer inside one ``applyInPandasWithState`` pass, and the
    emission is the per-variant union realigned to the full output
    geometry (absent steps NULL). Exactly one state buffer, one
    shuffle — V variants cost V in-memory scans of the stable region,
    never V state copies.

    Finality/eviction inherit the general engine's proofs
    (:func:`_make_general_cep_fn`): per variant, strict matches decide
    at their last consumed event, relaxed anchors at their horizon;
    the buffer keeps the most conservative requirement across variants
    (max trailing-window for loop-free strict, the ``within`` horizon
    otherwise).

    Skip strategies compose since r10 (``within`` REQUIRED — it is the
    pending/eviction bound). The batch operator prunes over the WHOLE
    union in (end, start) completion order; the streaming rendering
    uses the general engine's decided-order arguments on the realigned
    union rows:

    - ``skip_to_next`` keeps the first-completing match per (key,
      start). RELAXED: every match sharing a start decides at that
      anchor's horizon in ONE invocation (``anchors_all`` is shared by
      all variants), so an in-window min-by-(end, row) per start IS
      the selection. STRICT: a match decides exactly when its end
      passes the watermark, so the FIRST window in which any match of
      a start decides holds its earliest end — emit it and remember
      the start in ``pend`` (padded rows) until ``wm − within``.
    - sequential strategies (``skip_past_last_event`` /
      ``skip_to_first:i`` / ``skip_to_last:i``): STRICT decisions are
      end-monotone across windows (same argument), so each window's
      decided rows feed the bound-threshold chain directly; RELAXED
      anchors decide at horizons where a later anchor can still end
      earlier, so decided rows are held PENDING until ``end + within
      < wm`` and released in (end, start) order — the general
      engine's release rule, with NULL-bearing union rows encoded via
      the ``_VNULL`` sentinel in the flattened pend state. Equal-end
      groups judge against the pre-group bound (the batch
      simultaneity rule); a release window depends only on the end,
      so groups never split."""
    cols = [key_name] + out_cols
    has_loop = any(v[3] for vs, _o in steps for v in vs)
    W = len(out_cols)
    # positions of timestamp entries (not n_i counts) in out_cols,
    # in step order — realigned-row start = first non-NULL (step
    # order IS time order), end = max non-NULL
    _ts_pos = [
        i for i, c in enumerate(out_cols) if not c.startswith("n_")
    ]

    def _start(r):
        for i in _ts_pos:
            if r[i] is not None:
                return r[i]
        return None

    def _end(r):
        return max(r[i] for i in _ts_pos if r[i] is not None)

    def _nkey(r):
        # NULLS FIRST total order over a realigned row (the batch
        # kernel sorts out_cols asc with na_position='first')
        return tuple(
            (v is not None, v if v is not None else 0) for v in r
        )

    _thr_idx = None
    _strict_after = False
    if skip is not None and skip[0] in (
        "skip_past_last_event", "skip_to_first", "skip_to_last"
    ):
        kind, arg = skip
        if kind == "skip_past_last_event":
            _strict_after = True
        else:
            base, last = f"ts_{arg}", f"ts_{arg}_last"
            use = (
                last if (kind == "skip_to_last" and last in out_cols)
                else base
            )
            if base not in out_cols:
                raise ValueError(
                    f"{kind} step index must reference a positive "
                    f"step, got {arg}"
                )
            _thr_idx = out_cols.index(use)

    def _thr(r):
        return _end(r) if _thr_idx is None else r[_thr_idx]

    def _chain(release, bound):
        rows = []
        i, n = 0, len(release)
        while i < n:
            e = _end(release[i])
            gb = None
            while i < n and _end(release[i]) == e:
                c = release[i]
                s = _start(c)
                if bound is None or (
                    s > bound if _strict_after else s >= bound
                ):
                    rows.append(c)
                    t = _thr(c)
                    if (
                        t is not None
                        and (gb is None or t > gb)
                        and (bound is None or t > bound)
                    ):
                        gb = t
                i += 1
            if gb is not None:
                bound = gb
        return rows, bound
    # max events a loop-free strict match can span (trailing keep)
    max_consumed = max(
        (
            sum(t for (_i, neg, t, _lp, _u) in vs if not neg)
            for vs, _o in steps
        ),
        default=1,
    )
    def _find_strict_variant(vsteps, ts_buf, mk_buf, n,
                             wm_us, wm_prev_us):
        def hit(pos, slot):
            return (mk_buf[pos] >> slot) & 1

        caps = []
        for p0 in range(n):
            pos, cap, ok, last_ts = p0, [], True, None
            for (slot, neg, times, loop, _until) in vsteps:
                if neg:
                    if pos < n and hit(pos, slot):
                        ok = False
                        break
                    continue
                if loop:
                    if pos >= n or not hit(pos, slot):
                        ok = False
                        break
                    q = pos
                    while q < n and hit(q, slot):
                        q += 1
                    cap += [ts_buf[pos], ts_buf[q - 1], q - pos]
                    last_ts = ts_buf[q - 1]
                    pos = q
                else:
                    first = None
                    for _ in range(times):
                        if pos >= n or not hit(pos, slot):
                            ok = False
                            break
                        if first is None:
                            first = ts_buf[pos]
                        last_ts = ts_buf[pos]
                        pos += 1
                    if not ok:
                        break
                    cap.append(first)
                    if times > 1:
                        cap.append(last_ts)
            if not ok or not cap:
                continue
            if within_us is not None and last_ts - cap[0] > within_us:
                continue
            if wm_prev_us <= last_ts:  # < wm by construction
                caps.append(cap)
        return caps

    def _find_relaxed_variant(vsteps, by_slot, first_after, anchors):
        from bisect import bisect_right

        t0_slot = next(v[0] for v in vsteps if not v[1])
        caps = []
        for s0 in by_slot.get(t0_slot, ()):
            h = s0 + within_us
            if s0 not in anchors:
                continue
            cap, cur, ok, pending = [], None, True, []
            for (slot, neg, times, loop, until) in vsteps:
                if neg:
                    pending.append((slot, cur))
                    continue
                if loop:
                    anchor = s0 if cur is None else cur
                    els0 = [s0] if cur is None else []
                    stop = first_after(until, anchor) if until else None
                    lst = by_slot.get(slot, [])
                    i = bisect_right(lst, anchor)
                    els = els0 + [
                        t for t in lst[i:]
                        if (stop is None or t < stop) and t <= h
                    ]
                    if not els:
                        ok = False
                        break
                    nxt = els[0]
                    cap += [els[0], els[-1], len(els)]
                    new_cur = els[-1]
                else:
                    if cur is None:
                        nxt, new_cur, reps = s0, s0, times - 1
                        cap.append(s0)
                    else:
                        nxt = first_after(slot, cur)
                        if nxt is None or nxt > h:
                            ok = False
                            break
                        cap.append(nxt)
                        new_cur, reps = nxt, times - 1
                    for _ in range(reps):
                        new_cur = first_after(slot, new_cur)
                        if new_cur is None or new_cur > h:
                            ok = False
                            break
                    if not ok:
                        break
                    if times > 1:
                        cap.append(new_cur)
                for (x, anc) in pending:
                    xa = first_after(x, anc if anc is not None else s0)
                    if xa is not None and xa < nxt:
                        ok = False
                        break
                pending = []
                if not ok:
                    break
                cur = new_cur
            if ok and pending:
                for (x, anc) in pending:
                    xa = first_after(x, anc if anc is not None else s0)
                    if xa is not None and xa <= h:
                        ok = False
                        break
            if ok:
                caps.append(cap)
        return caps

    strict = contiguity == "strict"
    sequential = skip is not None and skip[0] in (
        "skip_past_last_event", "skip_to_first", "skip_to_last"
    )

    def _find(ts_buf, mk_buf, wm_us, wm_prev_us, bound, pend):
        n = 0
        while n < len(ts_buf) and ts_buf[n] < wm_us:
            n += 1
        rows = []
        if strict:
            for (vsteps, _o), emap in zip(steps, emit_maps):
                for cap in _find_strict_variant(
                    vsteps, ts_buf, mk_buf, n, wm_us, wm_prev_us
                ):
                    rows.append(
                        [None if m is None else cap[m] for m in emap]
                    )
        else:
            from bisect import bisect_right

            by_slot: dict[int, list[int]] = {}
            for t, m in zip(ts_buf[:n], mk_buf[:n]):
                s = 0
                while m:
                    if m & 1:
                        by_slot.setdefault(s, []).append(t)
                    m >>= 1
                    s += 1

            def first_after(slot, after):
                c = by_slot.get(slot)
                if not c:
                    return None
                i = bisect_right(c, after)
                return c[i] if i < len(c) else None

            # one anchor-decision window shared by all variants: an
            # anchor decides exactly once, when wm passes its horizon
            anchors_all = {
                t for lst in by_slot.values() for t in lst
                if wm_prev_us <= t + within_us < wm_us
            }
            for (vsteps, _o), emap in zip(steps, emit_maps):
                for cap in _find_relaxed_variant(
                    vsteps, by_slot, first_after, anchors_all
                ):
                    rows.append(
                        [None if m is None else cap[m] for m in emap]
                    )
        # skip strategies over the decided union rows (r10 — the
        # finality/ordering arguments in the factory docstring)
        if skip is not None and skip[0] != "no_skip":
            if skip[0] == "skip_to_next":
                best = {}
                for r in sorted(rows, key=lambda r: (_end(r), _nkey(r))):
                    best.setdefault(_start(r), r)
                rows = [best[s] for s in sorted(best)]
                if strict:
                    seen = {int(p[0]) for p in pend}
                    rows = [r for r in rows if _start(r) not in seen]
                    seen |= {_start(r) for r in rows}
                    anchor_evict = wm_us - within_us
                    pend = [
                        [s] * W
                        for s in sorted(seen) if s >= anchor_evict
                    ]
            elif sequential and strict:
                release = sorted(
                    rows, key=lambda r: (_end(r), _start(r), _nkey(r))
                )
                rows, bound = _chain(release, bound)
            elif sequential:
                pend = pend + rows
                rel_cut = wm_us - within_us
                release = sorted(
                    (r for r in pend if _end(r) < rel_cut),
                    key=lambda r: (_end(r), _start(r), _nkey(r)),
                )
                pend = [r for r in pend if _end(r) >= rel_cut]
                rows, bound = _chain(release, bound)
        # eviction: most conservative requirement across variants
        if has_loop or not strict:
            evict = wm_us - within_us
            cut = 0
            while cut < len(ts_buf) and ts_buf[cut] < evict:
                cut += 1
        else:
            cut = (
                max(0, n - (max_consumed - 1))
                if max_consumed > 1 else n
            )
        return rows, ts_buf[cut:], mk_buf[cut:], bound, pend

    with_skip = skip is not None

    def _pack(pend):
        return [
            (_VNULL if v is None else int(v)) for r in pend for v in r
        ]

    def _unpack(flat):
        flat = list(flat)
        return [
            [None if v == _VNULL else v for v in flat[i:i + W]]
            for i in range(0, len(flat), W)
        ]

    def _variants_cep_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def _read_state():
            if with_skip:
                ts0, mk0, wm0, bound, pflat = state.get
                return ts0, mk0, wm0, bound, _unpack(pflat or [])
            ts0, mk0, wm0 = state.get
            return ts0, mk0, wm0, None, []

        def _write_state(ts_buf, mk_buf, bound, pend):
            if not ts_buf and not pend:
                state.remove()
                return False
            if with_skip:
                state.update(
                    (ts_buf, mk_buf, wm_us, bound, _pack(pend))
                )
            else:
                state.update((ts_buf, mk_buf, wm_us))
            return True

        def _arm(ts_buf, pend):
            cands = []
            if ts_buf:
                if strict:
                    cands.append(ts_buf[-1] // 1_000 + 1)
                else:
                    cands.append((ts_buf[0] + within_us) // 1_000 + 1)
            if sequential and not strict and pend:
                # a pending union row releases at end + within
                m = min(_end(r) for r in pend)
                cands.append((m + within_us) // 1_000 + 1)
            if not cands:
                return
            state.setTimeoutTimestamp(
                max(min(cands), state.getCurrentWatermarkMs() + 1)
            )

        if state.hasTimedOut:
            ts0, mk0, wm_prev, bound, pend = _read_state()
            rows, ts_buf, mk_buf, bound, pend = _find(
                list(ts0), list(mk0), wm_us, wm_prev, bound, pend
            )
            if rows:
                yield pd.DataFrame(
                    [[key_val, *r] for r in rows], columns=cols
                )
            if _write_state(ts_buf, mk_buf, bound, pend):
                if not strict or (sequential and pend):
                    _arm(ts_buf, pend)
            return

        ts_buf, mk_buf, wm_prev, bound, pend = [], [], 0, None, []
        if state.exists:
            prev_ts, prev_mk, wm_prev, bound, pend = _read_state()
            ts_buf, mk_buf = list(prev_ts), list(prev_mk)
        pt = [np.asarray(ts_buf, dtype=np.int64)]
        pm = [np.asarray(mk_buf, dtype=np.int64)]
        for pdf in pdfs:
            pt.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            pm.append(pdf[mask_col].to_numpy().astype(np.int64))
        ts_a, mk_a = np.concatenate(pt), np.concatenate(pm)
        order = np.lexsort((mk_a, ts_a))
        ts_buf = ts_a[order].tolist()
        mk_buf = mk_a[order].tolist()

        rows, ts_buf, mk_buf, bound, pend = _find(
            ts_buf, mk_buf, wm_us, wm_prev, bound, pend
        )
        if rows:
            yield pd.DataFrame(
                [[key_val, *r] for r in rows], columns=cols
            )
        if _write_state(ts_buf, mk_buf, bound, pend):
            _arm(ts_buf, pend)

    return _variants_cep_fn


def _make_mr_greedy_fn(qsteps, key_name, ts_col, mask_col, within_us,
                       out_cols, n_vals=0, capture=(), skip=None,
                       aggs=(), preds=None, keep_prev=0):
    """Per-key SQL-greedy row-pattern matcher with per-anchor selection
    at HORIZON CLOSE (r10 — VERDICT r9 #1): streaming MATCH_RECOGNIZE
    for quantified variables whose DEFINEs are NOT provably disjoint
    from their follow sets. Disjointness made every greedy choice
    local (the engine's maximal run IS the SQL binding); without it
    the binding is data-dependent — a maximal run may have to be cut
    short for the remainder to match. The batch operator resolves that
    with a no_skip pass + leftmost-greedy selection; the streaming
    twin buffers the anchor's whole ``within`` window and runs the
    SAME selection once the window is CLOSED:

    - an anchor (buffer position) DECIDES exactly once, in the
      invocation where ``wm_prev <= anchor_ts + within < wm`` — every
      event of the window is then final (arrivals carry
      ``ts >= wm``), so the greedy binding computed here equals the
      batch operator's over the same rows;
    - the binding itself is textbook leftmost-greedy backtracking over
      the anchor's window slice: at each quantified step try the
      longest consumption first and recurse — exactly the preference
      order the batch pass recovers by ordering the no_skip match set
      per anchor (output columns in step order, desc NULLS LAST);
    - ONE match per anchor == AFTER MATCH SKIP TO NEXT ROW (the
      default, ``skip=None``); the PRUNING strategies
      (``skip_past_last_event`` / ``skip_to_first:i`` /
      ``skip_to_last:i``, late-r10) run the batch kernel's
      completion-order chain over the per-anchor picks: decided rows
      are held PENDING until ``end + within < wm`` — every anchor
      that could still produce an earlier-ending match has decided by
      then (its anchor precedes the end, so its horizon precedes
      ``end + within``) — and released in ``(end, start)`` order
      through the carried ``bound`` threshold, exactly the relaxed
      engines' r8 release rule, at the documented cost of up to one
      extra ``within`` of emission latency;
    - eviction: positions with ``ts + within < wm`` are decided and
      can never be consumed by a LIVE anchor (a later anchor's window
      starts at its own ts ``>= wm - within``), so state is bounded by
      ``within`` + the watermark delay — the same bound as the
      relaxed/variants engines.

    Buffer order is (ts, mask) — equal-timestamp events decide by
    candidate mask and only the FIRST position of a duplicated
    timestamp anchors (the batch selection keys anchors by (key,
    ts_1)); use unique per-key timestamps for a total order (the
    operator-wide convention).

    ``capture`` (``(k, val_idx, first|last)`` triples over column-major
    ``vals`` state, the general engine's r9 convention) appends the
    matched events' numeric payloads as DOUBLE columns."""
    cols = [key_name] + out_cols
    K = len(qsteps)
    emit_last = [
        (loop or times > 1 or tmax is not None)
        for (_s, times, tmax, loop, _o, _r) in qsteps
    ]
    emit_n = [loop for (_s, _t, _m, loop, _o, _r) in qsteps]
    # row geometry for the pruning chain: which entries are
    # timestamps, and each step's first/last offsets (absent variant
    # entries are None and skipped by _se)
    _is_ts: list[bool] = []
    _step_offsets: list[tuple[int, "int | None"]] = []
    _roff = 0
    for si in range(K):
        first_off = _roff
        _is_ts.append(True)
        _roff += 1
        last_off = None
        if emit_last[si]:
            _is_ts.append(True)
            last_off = _roff
            _roff += 1
        if emit_n[si]:
            _is_ts.append(False)
            _roff += 1
        _step_offsets.append((first_off, last_off))
    _is_ts += [False] * (len(capture) + len(aggs))
    row_w = _roff + len(capture) + len(aggs)
    sequential = skip is not None

    def _se(row):
        ts = [v for v, f in zip(row, _is_ts) if f and v is not None]
        return (min(ts), max(ts))

    def _safe_key(row):
        s, e = _se(row)
        return (e, s, tuple(
            (v is None, 0 if v is None else v) for v in row
        ))

    def _chain(release, bound):
        """The batch _apply_skip sequential kernel over rows released
        in completion order (same-end groups judged against the
        pre-group bound, threshold advances at group flush)."""
        kind, arg = skip
        if kind == "skip_past_last_event":
            def thr(row):
                return _se(row)[1]
            strict_after = True
        else:
            first_off, last_off = _step_offsets[arg - 1]
            use = (
                last_off
                if (kind == "skip_to_last" and last_off is not None)
                else first_off
            )

            def thr(row):
                return row[use]
            strict_after = False
        rows = []
        i, n = 0, len(release)
        while i < n:
            e = _se(release[i])[1]
            gb = None
            while i < n and _se(release[i])[1] == e:
                row = release[i]
                s = _se(row)[0]
                if bound is None or (
                    s > bound if strict_after else s >= bound
                ):
                    rows.append(row)
                    t = thr(row)
                    if (
                        t is not None
                        and (gb is None or t > gb)
                        and (bound is None or t > bound)
                    ):
                        gb = t
                i += 1
            if gb is not None:
                bound = gb
        return rows, bound

    preds = preds or {}
    _pred_code: dict[int, Any] = {}

    def _match_anchor(i0, ts_buf, mk_buf, nbuf, h, vals):
        """Leftmost-greedy binding anchored at buffer position i0;
        returns per-step (first_idx, last_idx, count) or None (absent
        step), or None when no complete match exists."""
        out: list = [None] * K

        def _pred_ok(spec, p) -> bool:
            # iterative condition at binding time (late-r10): refs
            # read the referenced step's FIRST bound position from
            # `out` (refs point strictly earlier, so it is decided);
            # NaN/NULL values fail the predicate outright — the
            # documented streaming NULL rule (batch evaluates SQL
            # three-valued logic and is authoritative there)
            expr, names = spec
            code = _pred_code.get(id(spec))
            if code is None:
                code = compile(expr, "<iterative-condition>", "eval")
                _pred_code[id(spec)] = code
            ns = {}
            for nm, kind, k, ci in names:
                if kind == "ref":
                    seg = out[k - 1]
                    if seg is None:
                        return False
                    v = vals[ci][seg[0]]
                elif kind == "prev":
                    # physical offset into the buffer: the retained
                    # prefix (keep_prev rows past eviction) makes
                    # p - k resolvable for every live anchor; p - k
                    # < 0 IS the partition start — no previous row,
                    # NULL, predicate fails (the batch lag() rule)
                    if p - k < 0:
                        return False
                    v = vals[ci][p - k]
                else:
                    v = vals[ci][p]
                if v is None or v != v:
                    return False
                ns[nm] = v
            return bool(
                eval(code, {"__builtins__": {}, "abs": abs}, ns)
            )

        def rec(pos: int, si: int) -> bool:
            if si == K:
                return True
            slot, times, tmax, loop, opt, rel = qsteps[si]
            bit = 1 << slot
            pspec = preds.get(si)

            def ok(p: int) -> bool:
                return (
                    p < nbuf and ts_buf[p] <= h
                    and (mk_buf[p] & bit) != 0
                    and (pspec is None or _pred_ok(pspec, p))
                )

            if loop:
                hi = pos
                while ok(hi):
                    hi += 1
                lo = 0 if opt else 1
                counts = (
                    range(lo, hi - pos + 1) if rel
                    else range(hi - pos, lo - 1, -1)
                )
                for cnt in counts:
                    out[si] = (
                        (pos, pos + cnt - 1, cnt) if cnt else None
                    )
                    if rec(pos + cnt, si + 1):
                        return True
                out[si] = None
                return False
            if tmax is not None:
                hi = pos
                while hi - pos < tmax and ok(hi):
                    hi += 1
                if rel and opt:  # reluctant optional range: absent 1st
                    out[si] = None
                    if rec(pos, si + 1):
                        return True
                counts = (
                    range(times, hi - pos + 1) if rel
                    else range(hi - pos, times - 1, -1)
                )
                for cnt in counts:
                    out[si] = (pos, pos + cnt - 1, cnt)
                    if rec(pos + cnt, si + 1):
                        return True
                out[si] = None
                if opt and not rel:
                    return rec(pos, si + 1)
                return False
            if opt:
                if rel:  # reluctant optional: absent first
                    out[si] = None
                    if rec(pos, si + 1):
                        return True
                    if ok(pos):
                        out[si] = (pos, pos, 1)
                        if rec(pos + 1, si + 1):
                            return True
                    out[si] = None
                    return False
                if ok(pos):
                    out[si] = (pos, pos, 1)
                    if rec(pos + 1, si + 1):
                        return True
                out[si] = None
                return rec(pos, si + 1)
            for j in range(times):
                if not ok(pos + j):
                    return False
            out[si] = (pos, pos + times - 1, times)
            return rec(pos + times, si + 1)

        return out if rec(i0, 0) else None

    def _find(ts_buf, mk_buf, vals, wm_us, wm_prev_us, bound, pend):
        decided = []
        nbuf = len(ts_buf)
        for i0 in range(nbuf):
            h = ts_buf[i0] + within_us
            if h >= wm_us:
                break  # anchors are ts-ordered; later ones undecided
            if h < wm_prev_us:
                continue  # decided in an earlier invocation
            if i0 > 0 and ts_buf[i0 - 1] == ts_buf[i0]:
                continue  # one anchor per distinct timestamp
            m = _match_anchor(i0, ts_buf, mk_buf, nbuf, h, vals)
            if m is None:
                continue
            row = []
            for si in range(K):
                if m[si] is None:
                    # absent step: every column NULL (the batch
                    # variant union's convention — n_k included;
                    # COUNT measures coalesce downstream)
                    row.append(None)
                    if emit_last[si]:
                        row.append(None)
                    if emit_n[si]:
                        row.append(None)
                    continue
                fi, li, cnt = m[si]
                row.append(ts_buf[fi])
                if emit_last[si]:
                    row.append(ts_buf[li])
                if emit_n[si]:
                    row.append(cnt)
            for (k, vi, which) in capture:
                cap = m[k - 1]
                if cap is None:
                    row.append(None)
                else:
                    p = cap[0] if which == "first" else cap[1]
                    row.append(vals[vi][p])
            for (k, vi, fn) in aggs:
                # FINAL aggregate over the variable's bound run
                # (late-r10): strict adjacency means the run is
                # exactly the buffer slice [fi..li] — NULLs (NaN in
                # the double buffer) are skipped, all-NULL runs and
                # absent variables aggregate to NULL, the SQL rule
                seg = m[k - 1]
                if seg is None:
                    # absent optional variable: COUNT is 0 (the SQL
                    # empty-group rule); value aggregates are NULL
                    row.append(0.0 if fn == "COUNT" else None)
                    continue
                fi, li, _cnt = seg
                vs = [
                    v for v in vals[vi][fi:li + 1]
                    if v is not None and v == v
                ]
                if fn == "COUNT":
                    # non-null count (r10): 0 for all-NULL runs, not
                    # NULL — the SQL COUNT rule differs from the
                    # value aggregates here
                    row.append(float(len(vs)))
                elif not vs:
                    row.append(None)
                elif fn == "SUM":
                    row.append(float(sum(vs)))
                elif fn == "AVG":
                    row.append(float(sum(vs)) / len(vs))
                elif fn == "MIN":
                    row.append(float(min(vs)))
                else:
                    row.append(float(max(vs)))
            decided.append(row)
        if sequential:
            # the pending-release rule (see docstring): a row is final
            # for the completion-order chain once every anchor that
            # could still end before it has decided
            pend = pend + decided
            rel_cut = wm_us - within_us
            release = sorted(
                (r for r in pend if _se(r)[1] < rel_cut),
                key=_safe_key,
            )
            pend = [r for r in pend if _se(r)[1] >= rel_cut]
            rows, bound = _chain(release, bound)
        else:
            rows = decided
        cut = 0
        while cut < nbuf and ts_buf[cut] + within_us < wm_us:
            cut += 1
        # PREV navigation keeps keep_prev decided rows behind the live
        # region (physical lookback); decided anchors among them are
        # skipped by the h < wm_prev_us check above, so retention
        # costs state, never recomputation
        cut = max(0, cut - keep_prev)
        return (
            rows, ts_buf[cut:], mk_buf[cut:],
            [v[cut:] for v in vals], bound, pend,
        )

    val_names = [f"__val{i}" for i in range(n_vals)]

    def _mr_greedy_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        (key_val,) = key
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def _arm(ts_buf, pend):
            cands = []
            # first LIVE anchor (the retained PREV-lookback prefix is
            # already decided — arming on it would re-fire for rows
            # the h < wm_prev check skips anyway)
            live = next(
                (t for t in ts_buf if t + within_us >= wm_us), None
            )
            if live is not None:
                cands.append((live + within_us) // 1_000 + 1)
            if pend:
                m = min(_se(r)[1] for r in pend)
                cands.append((m + within_us) // 1_000 + 1)
            if not cands:
                return
            state.setTimeoutTimestamp(
                max(min(cands), state.getCurrentWatermarkMs() + 1)
            )

        def _unpack(stored):
            ts_b, mk_b, wm_prev = stored[0], stored[1], stored[2]
            i = 3
            bound, pend = None, []
            if sequential:
                bound = stored[3]
                # pend rides as NaN-padded doubles (fixed row width);
                # ts/count entries round-trip exactly below 2^53 us
                flat = list(stored[4] or [])
                for j in range(0, len(flat), row_w):
                    row = []
                    for x, f in zip(flat[j:j + row_w], _is_ts):
                        if x is None or (
                            isinstance(x, float) and math.isnan(x)
                        ):
                            row.append(None)
                        else:
                            row.append(int(x) if f else x)
                    # count entries (non-ts, non-capture) back to int
                    for ci in range(_roff):
                        if not _is_ts[ci] and row[ci] is not None:
                            row[ci] = int(row[ci])
                    pend.append(row)
                i = 5
            vals = [
                list(stored[i][q * len(ts_b):(q + 1) * len(ts_b)])
                for q in range(n_vals)
            ] if n_vals else []
            return list(ts_b), list(mk_b), wm_prev, bound, pend, vals

        def _pack(ts_buf, mk_buf, bound, pend, vals):
            base = (ts_buf, mk_buf, wm_us)
            if sequential:
                flat = [
                    float("nan") if v is None else float(v)
                    for r in pend for v in r
                ]
                base = base + (bound, flat)
            if n_vals:
                base = base + ([x for v in vals for x in v],)
            return base

        def _emit_and_store(rows, ts_buf, mk_buf, vals, bound, pend):
            if rows:
                yield pd.DataFrame(
                    [[key_val, *r] for r in rows], columns=cols
                )
            if ts_buf or pend:
                state.update(_pack(ts_buf, mk_buf, bound, pend, vals))
                _arm(ts_buf, pend)
            else:
                state.remove()

        if state.hasTimedOut:
            ts_buf, mk_buf, wm_prev, bound, pend, vals = _unpack(
                state.get
            )
            rows, ts_buf, mk_buf, vals, bound, pend = _find(
                ts_buf, mk_buf, vals, wm_us, wm_prev, bound, pend
            )
            yield from _emit_and_store(
                rows, ts_buf, mk_buf, vals, bound, pend
            )
            return

        ts_buf, mk_buf, wm_prev, bound, pend = [], [], 0, None, []
        vals = [[] for _ in range(n_vals)]
        if state.exists:
            ts_buf, mk_buf, wm_prev, bound, pend, vals = _unpack(
                state.get
            )
        pt = [np.asarray(ts_buf, dtype=np.int64)]
        pm = [np.asarray(mk_buf, dtype=np.int64)]
        pv = [[np.asarray(v, dtype=np.float64)] for v in vals]
        for pdf in pdfs:
            pt.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            pm.append(pdf[mask_col].to_numpy().astype(np.int64))
            for i in range(n_vals):
                pv[i].append(
                    pdf[val_names[i]].to_numpy().astype(np.float64)
                )
        ts_a, mk_a = np.concatenate(pt), np.concatenate(pm)
        order = np.lexsort((mk_a, ts_a))
        ts_buf = ts_a[order].tolist()
        mk_buf = mk_a[order].tolist()
        vals = [
            np.concatenate(pv[i])[order].tolist() for i in range(n_vals)
        ]

        rows, ts_buf, mk_buf, vals, bound, pend = _find(
            ts_buf, mk_buf, vals, wm_us, wm_prev, bound, pend
        )
        yield from _emit_and_store(
            rows, ts_buf, mk_buf, vals, bound, pend
        )

    return _mr_greedy_fn


def match_pattern_stream_greedy(
    stream: DataFrame,
    pattern,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    watermark: str = "5 minutes",
    carry_payload: dict[str, list[str]] | None = None,
    reluctant: "list[bool] | None" = None,
    skip_strategy: str | tuple | None = None,
    aggregates: "list[tuple[int, str, str]] | None" = None,
) -> DataFrame:
    """Streaming strict-contiguity pattern matching with SQL-GREEDY
    per-anchor binding decided at horizon close (r10) — the engine
    streaming MATCH_RECOGNIZE routes to when a quantified variable's
    DEFINE is NOT provably disjoint from its follow set (see
    :func:`_make_mr_greedy_fn` for the finality argument). One match
    per anchor == AFTER MATCH SKIP TO NEXT ROW; ``within`` REQUIRED
    (it is the buffering horizon — without it no anchor ever closes).

    Scope: uniform STRICT positive steps with any quantifier
    (``+ * ? {n} {n,m}``), non-absentable FIRST step (the anchor
    identity — batch keys its selection on ``ts_1``), non-quantified
    LAST step (the terminal-loop counterexample), no negation /
    followedByAny / until / iterative refs. ``carry_payload``
    (numeric columns, the r9 convention) rides a column-major value
    buffer and emits ``<ts_col>_<col>`` DOUBLE columns."""
    from flink_note_spark.operators.cep import (
        _cand_cond,
        _iter_where,
        _normalize,
        _out_cols,
        _parse_skip,
        _resolve_contiguity,
    )

    steps = _normalize(pattern)
    if _resolve_contiguity(steps, "strict") != "strict":
        raise ValueError(
            "match_pattern_stream_greedy is strict-contiguity only "
            "(SQL row-pattern variables are adjacent rows)"
        )
    skip = _parse_skip(skip_strategy)
    if skip is not None and skip[0] in ("greedy", "no_skip", "skip_to_next"):
        # one match per anchor IS skip-to-next; greedy/no_skip callers
        # get the same per-anchor set (the selection already picked)
        skip = None
    if skip is not None and skip[0] in ("skip_to_first", "skip_to_last"):
        n_pos = len(steps)
        if skip[1] is None or not (1 <= skip[1] <= n_pos):
            raise ValueError(
                f"{skip[0]} step index must be in 1..{n_pos} "
                f"(1-based positive-step index), got {skip[1]}"
            )
    if within is None:
        raise ValueError(
            "greedy-selection streaming requires within= — the anchor "
            "window must CLOSE for the greedy binding to be final"
        )
    if any(
        s.negate or s.any_match or s.until is not None for s in steps
    ):
        raise ValueError(
            "greedy-selection streaming supports plain quantified "
            "positive steps only (negation/followedByAny/until: use "
            "the disjoint fast path or batch)"
        )
    # iterative conditions (late-r10): cross-step ``s<k>.<col>`` refs
    # evaluate at BINDING time inside the backtracking walk — the
    # referenced columns ride the same value buffer payload capture
    # uses. The batch parity boundary applies: loops and variants
    # with iterative refs refuse exactly as the batch engines do.
    iter_templates = {
        i: _iter_where(s)
        for i, s in enumerate(steps)
        if _iter_where(s) is not None
    }
    if iter_templates:
        if any(s.loop for s in steps):
            raise ValueError(
                "iterative conditions with strict loop steps are not "
                "supported (the batch operator refuses them too — "
                "the segments engine binds runs by position)"
            )
        if any(s.optional or s.times_max is not None for s in steps):
            raise ValueError(
                "iterative conditions do not compose with optional()/"
                "times(n, m) (variant expansion renumbers the s<k> "
                "step references — the batch operator refuses them "
                "too)"
            )
    first, last = steps[0], steps[-1]
    if first.optional or (first.times_max is not None and first.times == 0):
        raise ValueError(
            "greedy-selection streaming requires a non-absentable "
            "FIRST variable — the anchor identity is its first row "
            "(batch keys the selection on ts_1)"
        )
    if last.loop or last.optional or last.times_max is not None:
        raise ValueError(
            "greedy-selection streaming requires the pattern to end "
            "with a plain variable (a terminal quantifier asserts on "
            "events that may never arrive — the pinned terminal-loop "
            "counterexample; batch-only)"
        )
    out_cols = _out_cols(steps)
    key_type = dict(stream.dtypes)[key_col]
    within_us = _parse_duration_ms(within) * 1_000

    capture: list[tuple[int, int, str]] = []
    cap_cols: list[str] = []
    val_cols: list[str] = []
    dtypes = dict(stream.dtypes)
    numeric = {
        "tinyint", "smallint", "int", "bigint", "float", "double",
    }

    def _val_idx(c: str, what: str) -> int:
        t = dtypes.get(c)
        if t is None:
            raise ValueError(f"{what} column {c!r} not in the stream")
        if t not in numeric and not t.startswith("decimal"):
            raise ValueError(
                f"streaming {what} supports numeric columns only; "
                f"{c!r} has type {t}"
            )
        if c not in val_cols:
            val_cols.append(c)
        return val_cols.index(c)

    if carry_payload:
        for tsc in sorted(carry_payload):
            m = re.fullmatch(r"ts_(\d+)(_last)?", tsc)
            if not m or tsc not in out_cols:
                raise ValueError(
                    f"carry_payload key {tsc!r} is not an output step "
                    f"column of this pattern ({out_cols})"
                )
            k = int(m.group(1))
            which = "last" if m.group(2) else "first"
            for c in sorted(set(carry_payload[tsc])):
                capture.append((k, _val_idx(c, "payload capture"), which))
                cap_cols.append(f"{tsc}_{c}")
    agg_triples: list[tuple[int, int, str]] = []
    if aggregates:
        n_pos = len(steps)
        for (k, c, fn) in aggregates:
            fn = fn.upper()
            if fn not in ("SUM", "AVG", "MIN", "MAX", "COUNT"):
                raise ValueError(
                    f"unsupported streaming aggregate {fn!r} "
                    "(SUM | AVG | MIN | MAX | COUNT)"
                )
            if not (1 <= k <= n_pos):
                raise ValueError(
                    f"aggregate step index must be in 1..{n_pos}, "
                    f"got {k}"
                )
            agg_triples.append((k, _val_idx(c, "aggregate measure"), fn))
    # binding-time predicate sources (late-r10): iterative s<k> refs
    # (template from _resolve_iter) and/or PREV navigation names
    # (__mrnav_p{n}_{col}, physical buffer offsets) — either one
    # moves the WHOLE where off the Catalyst mask into the Python
    # walk, reading the shared value buffer
    pred_src: dict[int, str] = {}
    if iter_templates:
        from flink_note_spark.operators.cep import _resolve_iter

        iter_info = _resolve_iter(steps)  # validates ref targets
        pred_src.update({i: t for i, (t, _r) in iter_info.items()})
    for i, s in enumerate(steps):
        if (
            i not in pred_src and isinstance(s.where, str)
            and "__mrnav_" in s.where
        ):
            pred_src[i] = s.where
    keep_prev = 0
    preds: dict[int, tuple[str, tuple]] = {}
    for idx, template in pred_src.items():
        py_expr, raw_names = _sql_predicate_to_python(template)
        names = []
        for nm in raw_names:
            mref = re.match(r"^__v(\d+)_(.+)$", nm)
            mnav = re.match(r"^__mrnav_([pn])(\d+)_(.+)$", nm)
            if mref:
                kind, k, c = "ref", int(mref.group(1)), mref.group(2)
                what = "iterative condition"
            elif mnav:
                if mnav.group(1) == "n":
                    raise ValueError(
                        "NEXT(...) navigation is batch-only on "
                        "streams (the physical successor may arrive "
                        "arbitrarily late)"
                    )
                kind, k, c = "prev", int(mnav.group(2)), mnav.group(3)
                keep_prev = max(keep_prev, k)
                what = "PREV navigation"
            else:
                kind, k, c = "bare", None, nm
                what = "iterative condition"
            names.append((nm, kind, k, _val_idx(c, what)))
        preds[idx] = (py_expr, tuple(names))

    out_schema = f"{key_col} {key_type}, " + ", ".join(
        f"{c} long" for c in out_cols
    )
    if cap_cols:
        out_schema += ", " + ", ".join(f"{c} double" for c in cap_cols)
    agg_names = [f"__agg{j}" for j in range(len(agg_triples))]
    if agg_names:
        out_schema += ", " + ", ".join(f"{c} double" for c in agg_names)
    # pred steps degrade the Catalyst mask to type-only (their where
    # reads binding-time state Catalyst cannot see); _cand_cond does
    # this for iterative refs, PREV-nav steps need it explicitly
    conds = [
        (F.col(type_col) == s.event_type) if i in pred_src
        else _cand_cond(s, type_col)
        for i, s in enumerate(steps)
    ]
    mask = None
    for i, c in enumerate(conds):
        term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
        mask = term if mask is None else mask + term
    projected = _mask_projection(
        stream, mask, key_col, time_col, watermark,
        drop_zero=False, val_cols=val_cols,
    )
    # per-variable RELUCTANT flags (r10): flip that variable's
    # consumption preference to fewest-rows in the backtracking order
    rel = list(reluctant or [])
    rel += [False] * (len(steps) - len(rel))
    qsteps = tuple(
        (i, s.times, s.times_max, s.loop, s.optional, rel[i])
        for i, s in enumerate(steps)
    )
    state_struct = "ts array<long>, mk array<long>, wm long"
    if skip is not None:
        state_struct += ", bound long, pend array<double>"
    if val_cols:
        state_struct += ", vals array<double>"
    return (
        projected.groupBy(key_col)
        .applyInPandasWithState(
            _make_mr_greedy_fn(
                qsteps, key_col, time_col, "__cand_mask", within_us,
                out_cols + cap_cols + agg_names, n_vals=len(val_cols),
                capture=tuple(capture), skip=skip,
                aggs=tuple(agg_triples), preds=preds or None,
                keep_prev=keep_prev,
            ),
            outputStructType=out_schema,
            stateStructType=state_struct,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def match_pattern_stream(
    stream: DataFrame,
    pattern,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    watermark: str = "5 minutes",
    contiguity: str | None = None,
    skip_strategy: str | tuple | None = None,
    carry_payload: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Streaming CEP (Flink ``CEP.pattern(stream, Pattern.begin()
    .next()/.followedBy()...)``): incremental, exactly-once match
    emission driven by event-time finality — the streaming twin of
    ``operators/cep.match_pattern``, equality-tested against it in
    tests/test_streaming.py for both contiguity modes.

    State-schema note: the per-key state is
    ``(ts array, tp array, wm long)`` for the plain engine and
    ``(ts array, mk array<long>, wm long, bound long,
    pend array<long>)`` for the general engine (iterative conditions
    add ``vals array<double>`` — the carried payload columns,
    column-major — in place of ``bound``/``pend``) (r7 added ``bound``,
    the sequential skip-strategy threshold; r8 added ``pend``,
    decided-but-unreleased match captures flattened at fixed cap
    width, held until the watermark passes their completion horizon,
    and replaced the per-event type string by ``mk``, the per-step
    candidate bitmask computed JVM-side) and is versioned WITH
    this operator — restoring a checkpoint written by an older build
    is not supported; restart such a query from a fresh checkpoint.

    Emits one row per match, ``(key, ts_1 .. ts_k)`` with step times in
    epoch MICROseconds (the ``stateful_sessionize`` output convention),
    once the watermark passes the match's last event. Equal-timestamp
    events order by event type (plain engine) / candidate mask
    (general engine) — use unique timestamps per key for a total
    order. Strict state per key is bounded by the watermark
    delay plus ``k-1`` events; relaxed (``followedBy``,
    skip-till-next-match) REQUIRES ``within`` — it is both the match
    horizon and the state bound (events older than
    ``watermark − within`` can no longer bind to any live start). Late
    events beyond the watermark are dropped by the engine before they
    reach the operator. Finality is STRICTLY below the watermark (the
    engine's late filter drops only ``ts < wm``, so ``ts == wm`` can
    still arrive): matches emit once their last event is ``< wm``.

    ``pattern`` may also be an ``operators.cep.Pattern`` or step-spec
    list containing ``times(n)`` quantifiers (expanded positionally).
    Negation (``not_next``/``not_followed_by``), greedy
    ``one_or_more``/``until`` loops, and ``where()`` value predicates
    (r8 — Flink ``SimpleCondition``; the predicate evaluates
    JVM-side into the candidate mask before buffering, so payload
    columns never reach Python) run on the general per-key engine
    (r7/r8, ``_make_general_cep_fn`` — finality/eviction proofs
    there), with loop steps adding ``ts_i_last``/``n_i`` columns
    exactly like the batch operator.

    ``skip_strategy`` (r7, batch ``AfterMatchSkipStrategy`` twin):
    RELAXED patterns support the full surface — ``no_skip``
    (non-greedy prefix emission) and ``skip_to_next`` decide per
    anchor at its horizon, and the sequential strategies
    (``skip_past_last_event`` / ``skip_to_first:i`` /
    ``skip_to_last:i``) prune in COMPLETION order like Flink's NFA
    (r8): decided matches are held pending in state and released
    through the chain once ``end + within < wm`` — no later-decided
    match can end earlier, so releases are globally end-monotone and
    render the batch (end, start) scan exactly, at the cost of up to
    one extra ``within`` of emission latency for those strategies.
    The chain carries one threshold timestamp per key (``bound``).
    STRICT patterns support the full strategy set — sequential
    strategies since late-r8: a strict match decides exactly when its
    END passes the watermark, so ends are globally monotone across
    windows and the sequential chain consumes each window's decided
    matches directly on the carried ``bound`` (no pending-release
    stage; that machinery exists because relaxed anchors decide at
    their horizon, where a later-decided anchor can still end
    earlier); ``skip_to_next`` on strict LOOPS since r9: an anchor's
    prefix caps end in prefix-length order, so the first-decided cap
    per anchor IS its earliest match — emitted immediately, with the
    anchor held in ``pend`` (padded to cap width) until its ``within``
    horizon closes so later-window prefixes stay suppressed. Equality
    vs the batch operator per strategy in tests/test_streaming.py.

    ``optional()`` / ``times(n, m)`` (r8): the batch variant union
    (Flink's branching NFA) runs incrementally — every expanded
    variant is a parallel greedy state machine over ONE shared per-key
    buffer (``_make_variants_cep_fn``), emitting the per-variant union
    realigned to the full output geometry (absent steps NULL long).
    Skip strategies COMPOSE with loop-free variant unions since r10
    (``within`` REQUIRED — see ``_make_variants_cep_fn`` for the
    per-contiguity finality arguments; pending union rows ride state
    with NULLs sentinel-encoded); variants containing ``one_or_more``
    under a strategy stay batch-only (the batch twin expands every
    loop PREFIX non-greedily before pruning — the streaming engine
    binds loops greedily). Strict patterns require every variant to
    end positively.

    ``followedByAny`` (r8): runs on the general relaxed engine — the
    branching enumerator explores every candidate binding (any-steps
    per candidate, any-loops per suffix run) within the anchor's
    ``within`` horizon, which is COMPLETE below the horizon when the
    anchor decides (relaxed finality), so the branching is exact.
    Plain any-steps compose with the skip strategies; any-loops are
    greedy-only, and any + optional()/times(n, m) stays batch-only.

    Iterative conditions (r8 — Flink ``IterativeCondition``,
    ``s<k>./first./prev.`` cross-step refs in ``where()`` strings):
    run on a dedicated engine (``_make_iter_cep_fn``) that carries
    the referenced payload columns (cast to double) through the
    state buffer and evaluates the predicate at BINDING time —
    relaxed binds scan for the earliest QUALIFYING candidate, loops
    skip non-qualifying elements, negations assert the absence of a
    qualifying event, strict chains test at fixed positions; all
    equality-tested vs batch. Scope: predicates in the SQL subset
    that maps 1:1 to Python (comparisons, arithmetic, AND/OR/NOT,
    abs()) over NUMERIC columns; variants/strict-loops refuse
    exactly as batch does, and skip strategies with iterative
    conditions stay batch-only.

    Mixed contiguity (late-r8 — Flink's natural
    ``begin().next().followedBy()`` shape): plain positive steps,
    negations, and (r9) greedy loops stream on the positional per-key
    engine (``_make_mixed_cep_fn`` — matches decide at the anchor
    horizon, ``within`` REQUIRED; strict adjacency counts
    non-candidates, so every event buffers). Two verdicts are not
    horizon-stable and refuse: strict negations not followed by a
    strict positive, and TERMINAL strict loops (run maximality asserts
    on the event after the run — the uniform strict engine's rule).

    ``carry_payload`` (r9 — the streaming twin of the batch engines'
    zero-join payload capture): ``{ts_col: [numeric payload cols]}``
    adds ``<ts_col>_<col>`` DOUBLE output columns holding the matched
    events' values, captured at binding time from a per-key value
    buffer that rides state alongside the timestamps (the iterative
    engine's carried-payload convention — column-major doubles,
    evicted with the event buffer). STRICT patterns on the general
    engine only; relaxed/mixed/variants/iterative combinations refuse
    with pointers at ``attach_event_payload`` / ``foreachBatch``.

    Batch-only remainders: mixed variants/skip strategies, skip
    strategies over variant unions CONTAINING loops (loop-free
    unions compose since r10) or with iterative conditions,
    non-numeric/non-subset iterative predicates, non-greedy
    any-loops, payload capture outside strict patterns, and — for
    STRICT and mixed patterns — terminal negation/loops (they ask
    what follows the match, unanswerable on an unbounded stream;
    relaxed terminal negation and loops are fine, the ``within``
    horizon decides them).
    """
    from flink_note_spark.operators.cep import (
        Pattern,
        _expand_group_variants,
        _expand_simple_steps,
        _normalize,
        _out_cols,
        _resolve_contiguity,
    )

    from flink_note_spark.operators.cep import _parse_skip

    if isinstance(pattern, Pattern):
        if contiguity is None and pattern.contiguity is not None:
            contiguity = pattern.contiguity
        if within is None:
            within = pattern.within_
        if skip_strategy is None:
            skip_strategy = pattern.skip_
    grp = _expand_group_variants(pattern)
    if grp is not None:
        variants, posmaps, _template = grp
        if len(variants) == 1 and posmaps[0] == list(
            range(1, len(posmaps[0]) + 1)
        ):
            # exact-count groups FLATTEN (r11) — stream natively
            pattern = variants[0]
        else:
            raise ValueError(
                "RANGED/optional group patterns are batch-only on the "
                "native engines (block-variant union) — "
                "pattern_stream_start(engine='auto') streams them via "
                "incremental replay"
            )
    skip = _parse_skip(skip_strategy)
    if skip is not None and skip[0] == "greedy":
        skip = None
    general = skip is not None or bool(carry_payload)
    steps = None
    variants_mode = False
    iterative = False
    if general or not (
        isinstance(pattern, list)
        and all(isinstance(p, str) for p in pattern)
    ):
        # resolve contiguity with the SAME rule as batch match_pattern
        # (review r6: step-level modes are more specific than the
        # argument, the first step's mode never decides alone) so a
        # spec matches identically in both engines or fails loudly
        steps = _normalize(pattern)
        resolved = _resolve_contiguity(steps, contiguity)
        if carry_payload and resolved != "strict":
            raise ValueError(
                "carry_payload (streaming payload capture) is "
                "supported on STRICT patterns only — the strict "
                "engine binds positions whose payload rides the "
                "state buffer; relaxed/mixed payload access is "
                "batch-only (attach_event_payload) or foreachBatch"
            )
        if resolved == "mixed":
            # late-r8: mixed contiguity streams on the positional
            # per-key engine (_make_mixed_cep_fn has the finality
            # argument and the two excluded verdicts)
            return _dispatch_mixed_stream(
                stream, steps, key_col, time_col, type_col,
                contiguity, within, watermark, skip,
            )
        contiguity = resolved
        variants_mode = any(
            s.optional or s.times_max is not None for s in steps
        )
        if carry_payload and variants_mode:
            raise ValueError(
                "carry_payload with optional()/times(n, m) is "
                "batch-only (the variants engine realigns a union, "
                "not positional caps)"
            )
        if variants_mode and skip is not None:
            if any(s.loop for s in steps):
                # the batch twin expands every loop PREFIX under a
                # non-greedy strategy before pruning; the streaming
                # variants engine binds loops greedily (maximal run)
                raise ValueError(
                    "skip strategies with one_or_more inside "
                    "optional()/times(n, m) patterns are batch-only "
                    "in streaming (non-greedy loop-prefix expansion; pattern_stream_start(engine='auto') routes this shape through incremental replay)"
                )
            if skip[0] != "no_skip" and within is None:
                raise ValueError(
                    "skip strategies with optional()/times(n, m) on "
                    "streams require within= — it bounds the pending "
                    "matches and the anchor-suppression state (r10)"
                )
        if any(s.any_match for s in steps):
            # r8: followedByAny runs on the general relaxed engine —
            # any-steps branch per candidate, any-loops per suffix
            # run, all within the anchor's horizon (complete below it
            # by relaxed finality, so the branching is exact)
            if contiguity != "relaxed":
                raise ValueError(
                    "followedByAny requires uniform relaxed "
                    "contiguity (it IS a relaxed-family binding mode)"
                )
            if variants_mode:
                raise ValueError(
                    "followedByAny with optional()/times(n, m) "
                    "streaming CEP is batch-only"
                )
            if skip is not None and any(
                s.any_match and s.loop for s in steps
            ):
                raise ValueError(
                    "followedByAny one_or_more supports the greedy "
                    "default only (a non-greedy any-loop emits every "
                    "contiguous subrange — quadratic in the run)"
                )
            general = True
        from flink_note_spark.operators.cep import _iter_where

        if any(_iter_where(s) is not None for s in steps):
            # r8: iterative conditions route to the dedicated engine —
            # the candidate mask is per-event, so cross-step predicates
            # are evaluated at BINDING time over carried payload
            # columns (_make_iter_cep_fn). Compositions whose batch
            # twin refuses (variants, strict loops) refuse identically;
            # skip strategies add prefix/pruning machinery the iter
            # engine does not carry — batch-only.
            if variants_mode:
                raise ValueError(
                    "iterative conditions with optional()/times(n, m) "
                    "are unsupported (variant renumbering changes ref "
                    "targets — the batch operator refuses them too)"
                )
            if skip is not None:
                raise ValueError(
                    "iterative conditions with a skip_strategy are "
                    "batch-only in streaming (the skip engines prune "
                    "over candidate-mask state; iterative bindings "
                    "need carried payload; pattern_stream_start(engine='auto') routes this shape through incremental replay)"
                )
            if carry_payload:
                raise ValueError(
                    "carry_payload with iterative conditions is "
                    "batch-only in streaming (the iterative engine's "
                    "val buffer serves predicate binding, not "
                    "capture)"
                )
            if contiguity == "strict" and any(s.loop for s in steps):
                raise ValueError(
                    "strict one_or_more with iterative conditions is "
                    "unsupported (the batch operator refuses it too)"
                )
            if contiguity == "strict" and (
                steps[-1].negate or steps[-1].loop
            ):
                raise ValueError(
                    "strict streaming CEP requires the pattern to end "
                    "with a positive non-loop step: terminal not_next/"
                    "one_or_more ask what follows the match, which has "
                    "no final answer on an unbounded stream (batch-only — pattern_stream_start(engine='auto') streams it via "
                    "incremental replay)"
                )
            iterative = True
            general = False
        else:
            general = general or any(
                s.negate or s.loop or s.where is not None for s in steps
            )
        if variants_mode:
            general = False  # routed to the variants engine below
        elif not general and not iterative:
            pattern = _expand_simple_steps(steps)
    if contiguity is None:
        contiguity = "strict"
    if contiguity not in ("strict", "relaxed"):
        raise ValueError(
            f"contiguity must be strict|relaxed, got {contiguity!r}"
        )
    if contiguity == "relaxed" and within is None:
        raise ValueError(
            "relaxed streaming CEP requires within= — it bounds both the "
            "match horizon and the per-key state"
        )
    key_type = dict(stream.dtypes)[key_col]
    within_us = None if within is None else _parse_duration_ms(within) * 1_000

    if iterative:
        # r8: Flink IterativeCondition — cross-step ``s<k>./first./
        # prev.`` refs evaluated at binding time by the dedicated
        # engine over carried payload columns (_make_iter_cep_fn has
        # the semantics + finality/eviction inheritance)
        from flink_note_spark.operators.cep import (
            _cand_cond,
            _resolve_iter,
        )

        iter_info = _resolve_iter(steps)  # validates ref targets
        dtypes = dict(stream.dtypes)
        numeric = {
            "tinyint", "smallint", "int", "bigint", "float", "double",
        }
        val_cols: list[str] = []
        pred_spec: dict[int, tuple[str, tuple]] = {}
        for idx, (template, _refs) in iter_info.items():
            py_expr, raw_names = _sql_predicate_to_python(template)
            names = []
            for nm in raw_names:
                m = re.match(r"^__v(\d+)_(.+)$", nm)
                if m:
                    kind, k, col = "ref", int(m.group(1)), m.group(2)
                else:
                    kind, k, col = "bare", None, nm
                if col not in dtypes:
                    raise ValueError(
                        f"iterative condition references unknown "
                        f"column {col!r}"
                    )
                t = dtypes[col]
                if t not in numeric and not t.startswith("decimal"):
                    raise ValueError(
                        f"streaming iterative conditions support "
                        f"numeric columns only; {col!r} has type {t} "
                        f"(the batch operator evaluates full Spark SQL)"
                    )
                if col not in val_cols:
                    val_cols.append(col)
                names.append((nm, kind, k, val_cols.index(col)))
            pred_spec[idx] = (py_expr, tuple(names))

        out_cols = _out_cols(steps)
        out_schema = f"{key_col} {key_type}, " + ", ".join(
            f"{c} long" for c in out_cols
        )
        conds = [_cand_cond(s, type_col) for s in steps]
        steps_t = []
        for i, s in enumerate(steps):
            until_slot = None
            if s.loop and s.until is not None:
                until_slot = len(conds)
                conds.append(F.col(type_col) == s.until)
            steps_t.append(
                (i, s.negate, s.times, s.loop, until_slot, s.any_match)
            )
        steps_t = tuple(steps_t)
        mask = None
        for i, c in enumerate(conds):
            term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
            mask = term if mask is None else mask + term
        projected = _mask_projection(
            stream, mask, key_col, time_col, watermark,
            drop_zero=contiguity == "relaxed", val_cols=val_cols,
        )
        return (
            projected.groupBy(key_col)
            .applyInPandasWithState(
                _make_iter_cep_fn(
                    steps_t, key_col, time_col, "__cand_mask",
                    len(val_cols), pred_spec, within_us, contiguity,
                    out_cols,
                ),
                outputStructType=out_schema,
                stateStructType=(
                    "ts array<long>, mk array<long>, wm long, "
                    "vals array<double>"
                ),
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )

    if general:
        # r7: negation + greedy one_or_more/until + times run on the
        # general per-key engine (_make_general_cep_fn docstring has
        # the finality/eviction proofs); skip strategies ride the same
        # engine. STRICT patterns support the full strategy set —
        # sequential strategies since late-r8 (strict matches decide
        # exactly when their END passes the watermark, so ends are
        # globally monotone across windows and the prune chain needs
        # only the carried ``bound``, see _find_gstrict);
        # skip_to_next on strict LOOPS since r9 (an anchor's prefix
        # caps decide in end order, so the first-decided cap per
        # anchor IS the earliest match — the engine carries emitted
        # anchors in ``pend`` until their horizon closes).
        if skip is not None and skip[0] in ("skip_to_first", "skip_to_last"):
            # mirror batch _apply_skip's range check HERE, before the
            # state function ships to executors: an out-of-range index
            # would otherwise resolve via Python negative indexing to
            # the wrong step (silent wrong pruning) or die with an
            # opaque executor-side IndexError
            n_pos = sum(1 for s in steps if not s.negate)
            if skip[1] is None or not (1 <= skip[1] <= n_pos):
                raise ValueError(
                    f"{skip[0]} step index must be in 1..{n_pos} "
                    f"(1-based positive-step index), got {skip[1]}"
                )
        if contiguity == "strict":
            if steps[-1].negate or steps[-1].loop:
                raise ValueError(
                    "strict streaming CEP requires the pattern to end "
                    "with a positive non-loop step: terminal not_next/"
                    "one_or_more ask what follows the match, which has "
                    "no final answer on an unbounded stream (batch-only — pattern_stream_start(engine='auto') streams it via "
                    "incremental replay)"
                )
            if any(s.loop for s in steps) and within is None:
                raise ValueError(
                    "strict streaming CEP with one_or_more requires "
                    "within= — a loop run can span arbitrarily many "
                    "events, so the horizon is the only state bound"
                )
        out_cols = _out_cols(steps)
        # r9 payload capture: resolve ``carry_payload`` ({ts_col:
        # [payload cols]}) into (positive_step_k, val_idx,
        # first|last) entries; captured values ride the state buffer
        # as doubles (the iterative engine's convention) and emit as
        # ``<ts_col>_<col>`` DOUBLE columns appended to the schema
        capture: list[tuple[int, int, str]] = []
        cap_cols: list[str] = []
        val_cols: list[str] = []
        if carry_payload:
            dtypes = dict(stream.dtypes)
            numeric = {
                "tinyint", "smallint", "int", "bigint", "float",
                "double",
            }
            n_pos = sum(1 for s in steps if not s.negate)
            for tsc in sorted(carry_payload):
                m = re.fullmatch(r"ts_(\d+)(_last)?", tsc)
                if not m or not (1 <= int(m.group(1)) <= n_pos):
                    raise ValueError(
                        f"carry_payload key {tsc!r} is not an output "
                        f"step column (ts_1..ts_{n_pos}[, _last])"
                    )
                if tsc not in out_cols:
                    raise ValueError(
                        f"carry_payload key {tsc!r}: this pattern "
                        "does not emit that column"
                    )
                k = int(m.group(1))
                which = "last" if m.group(2) else "first"
                for c in sorted(set(carry_payload[tsc])):
                    t = dtypes.get(c)
                    if t is None:
                        raise ValueError(
                            f"carry_payload column {c!r} not in the "
                            "stream"
                        )
                    if t not in numeric and not t.startswith("decimal"):
                        raise ValueError(
                            f"streaming payload capture supports "
                            f"numeric columns only; {c!r} has type "
                            f"{t} (batch attach_event_payload carries "
                            "any type)"
                        )
                    if c not in val_cols:
                        val_cols.append(c)
                    capture.append((k, val_cols.index(c), which))
                    cap_cols.append(f"{tsc}_{c}")
        out_schema = f"{key_col} {key_type}, " + ", ".join(
            f"{c} long" for c in out_cols
        )
        if cap_cols:
            out_schema += ", " + ", ".join(
                f"{c} double" for c in cap_cols
            )
            out_cols = out_cols + cap_cols
        # slot allocation (r8): one candidate bit per step — type
        # equality AND the optional where() value predicate, computed
        # by CATALYST before the stream enters the buffer (payload
        # columns never reach Python) — plus one bit per loop step's
        # until stop type; the engines test bits, not type strings
        from flink_note_spark.operators.cep import _cand_cond

        conds = [_cand_cond(s, type_col) for s in steps]
        steps_t = []
        for i, s in enumerate(steps):
            until_slot = None
            if s.loop and s.until is not None:
                until_slot = len(conds)
                conds.append(F.col(type_col) == s.until)
            steps_t.append(
                (i, s.negate, s.times, s.loop, until_slot, s.any_match)
            )
        steps_t = tuple(steps_t)
        mask = None
        for i, c in enumerate(conds):
            term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
            mask = term if mask is None else mask + term
        projected = _mask_projection(
            stream, mask, key_col, time_col, watermark,
            drop_zero=contiguity == "relaxed", val_cols=val_cols,
        )
        state_struct = (
            "ts array<long>, mk array<long>, wm long, "
            "bound long, pend array<long>"
        )
        if val_cols:
            state_struct += ", vals array<double>"
        return (
            projected.groupBy(key_col)
            .applyInPandasWithState(
                _make_general_cep_fn(
                    steps_t, key_col, time_col, "__cand_mask",
                    within_us, contiguity, out_cols, skip,
                    n_vals=len(val_cols), capture=tuple(capture),
                ),
                outputStructType=out_schema,
                stateStructType=state_struct,
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )

    if variants_mode:
        # r8: optional()/times(n, m) — the batch variant union run as
        # parallel greedy state machines over ONE shared buffer (see
        # _make_variants_cep_fn for the finality/eviction inheritance)
        raw = _expand_variant_slots(steps)
        if contiguity == "strict":
            for vsteps, _o in raw:
                last = vsteps[-1]
                if last[1] or last[3]:
                    raise ValueError(
                        "strict streaming CEP requires every expanded "
                        "variant to end with a positive non-loop step: "
                        "a terminal not_next/one_or_more (including "
                        "one exposed by an absent optional tail) asks "
                        "what follows the match — batch-only"
                    )
            if within is None and any(
                v[3] for vs, _o in raw for v in vs
            ):
                raise ValueError(
                    "strict streaming CEP with one_or_more requires "
                    "within= — a loop run can span arbitrarily many "
                    "events, so the horizon is the only state bound"
                )
        from flink_note_spark.operators.cep import _cand_cond

        out_cols = _out_cols(steps)
        out_schema = f"{key_col} {key_type}, " + ", ".join(
            f"{c} long" for c in out_cols
        )
        conds = [_cand_cond(s, type_col) for s in steps]
        until_slot: dict[int, int] = {}
        for i, s in enumerate(steps):
            if s.loop and s.until is not None:
                until_slot[i] = len(conds)
                conds.append(F.col(type_col) == s.until)
        variants = [
            (
                tuple(
                    (idx, neg, times, loop,
                     until_slot.get(idx) if loop else None)
                    for (idx, neg, times, loop, _u) in vsteps
                ),
                opidx,
            )
            for vsteps, opidx in raw
        ]
        emit_maps = _variant_emit_maps(variants, out_cols)
        mask = None
        for i, c in enumerate(conds):
            term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
            mask = term if mask is None else mask + term
        projected = _mask_projection(
            stream, mask, key_col, time_col, watermark,
            drop_zero=contiguity == "relaxed",
        )
        return (
            projected.groupBy(key_col)
            .applyInPandasWithState(
                _make_variants_cep_fn(
                    variants, emit_maps, key_col, time_col,
                    "__cand_mask", within_us, contiguity, out_cols,
                    skip=skip,
                ),
                outputStructType=out_schema,
                stateStructType=(
                    "ts array<long>, mk array<long>, wm long"
                    + (
                        ", bound long, pend array<long>"
                        if skip is not None else ""
                    )
                ),
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )

    k = len(pattern)
    if k < 1:
        raise ValueError("pattern must name at least one event type")
    out_schema = f"{key_col} {key_type}, " + ", ".join(
        f"ts_{i} long" for i in range(1, k + 1)
    )
    if contiguity == "relaxed":
        # vectorized path (r8): relaxed matching never consults
        # non-candidate events, so they are filtered JVM-side — AFTER
        # withWatermark, so every event (candidate or not) still
        # advances the watermark — and the type string is replaced by
        # a small-int step slot. Slots are assigned in SORTED type
        # order (a stable, data-independent mapping); per-key state
        # holds two int64 arrays instead of a string array.
        types_sorted = sorted(set(pattern))
        slot_of = {t: i for i, t in enumerate(types_sorted)}
        # the candidate filter MUST evaluate ABOVE the
        # EventTimeWatermark node — non-candidate rows still advance
        # the watermark. Catalyst pushes any predicate that does not
        # reference the watermark column below the node (and splits
        # conjunctions to do it), so the event-time column is folded
        # INTO the slot expression: the filter then inherently
        # references it as one unsplittable predicate and stays put
        # (a null event time maps to -1 — vacuous for CEP, such rows
        # could never match).
        slot_expr = F.lit(-1)
        for t, i in slot_of.items():
            slot_expr = F.when(F.col(type_col) == t, F.lit(i)).otherwise(
                slot_expr
            )
        slot_expr = F.when(F.col(time_col).isNull(), F.lit(-1)).otherwise(
            slot_expr
        )
        projected = (
            stream.withWatermark(time_col, watermark)
            .withColumn("__slot", slot_expr)
            .filter(F.col("__slot") >= 0)
            .select(key_col, time_col, "__slot")
        )
        return (
            projected.groupBy(key_col)
            .applyInPandasWithState(
                _make_cep_fn_relaxed_vec(
                    [slot_of[t] for t in pattern], key_col, time_col,
                    "__slot", within_us, k,
                ),
                outputStructType=out_schema,
                stateStructType="ts array<long>, sl array<long>, wm long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _make_cep_fn(
                pattern, key_col, time_col, type_col, within_us, k, contiguity
            ),
            outputStructType=out_schema,
            stateStructType="ts array<long>, tp array<string>, wm long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def top_n_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    n: int,
    value_col: str = "value",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Flink SQL **continuous Top-N** (r8) — the UNWINDOWED
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY value DESC) <= n``
    over a stream, Flink's retract-mode ranking: the per-key top ``n``
    is maintained forever and RE-EMITTED whenever a batch changes it
    (update output mode stands in for the retract stream — the sink
    upserts on ``(key, rn)``, exactly how Flink's upsert sinks consume
    Top-N).

    State is O(n) per key and never expires (the ranking is over the
    whole stream — Flink's unwindowed Top-N has the same unbounded
    lifetime; put a TTL-bearing op upstream if keys churn). Each batch
    that improves a key's top-``n`` emits the FULL refreshed ranking
    for that key (n rows), because one insertion can shift every lower
    rank — the same n-row update Flink's retract stream carries.
    Ties on value break by earlier event time, then arbitrarily
    (fixture doctrine: unique (value, ts) per key).

    Output: ``(key, rn, ts_us, value)``; the final table state equals
    the batch ``topk_per_group`` (pinned in tests).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    key_type = dict(stream.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, rn int, ts_us long, value double"
    )
    cols = [key_col, "rn", "ts_us", "value"]

    def fn(key_tuple, pdfs, state: GroupState):
        (k,) = key_tuple
        if state.hasTimedOut:  # pragma: no cover - no timers are set
            state.remove()
            return
        pt, pv = [], []
        if state.exists:
            prev_ts, prev_vals = state.get
            pt.append(np.asarray(prev_ts, dtype=np.int64))
            pv.append(np.asarray(prev_vals, dtype=np.float64))
        old_top = (
            list(zip(pt[0].tolist(), pv[0].tolist())) if pt else []
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            pt.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            pv.append(
                pdf[value_col].fillna(0.0).to_numpy(dtype=np.float64)
            )
        ts = np.concatenate(pt)
        vals = np.concatenate(pv)
        order = np.lexsort((ts, -vals))[:n]
        ts, vals = ts[order], vals[order]
        new_top = list(zip(ts.tolist(), vals.tolist()))
        state.update((ts.tolist(), vals.tolist()))
        if new_top != old_top:
            yield pd.DataFrame(
                [
                    (k, r + 1, int(t), float(v))
                    for r, (t, v) in enumerate(new_top)
                ],
                columns=cols,
            )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="ts array<long>, vals array<double>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def window_top_n_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    size: str,
    n: int,
    value_col: str = "value",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Flink SQL **Window Top-N** on a stream (r8): per (key, tumbling
    window), the top ``n`` rows by ``value_col`` DESC (event-time ASC
    breaking ties), emitted ONCE when the watermark passes the window
    end — Window Top-N is append-only in Flink too (ranks are only
    final at window close, unlike the retracting unwindowed Top-N).

    Incremental state is O(n) per live (key, window): a row below the
    current n-th-best value can never re-enter (later rows only raise
    the cutoff), so each micro-batch merges and reprunes to ``n`` —
    the same monotone-cutoff argument as the count evictor's. Output:
    ``(key, win_start_us, win_end_us, rn, ts_us, value)``; batch twin
    ``operators/windows.window_top_n`` (equality pinned in tests).
    Equal (value, ts) pairs tie arbitrarily — unique timestamps per
    key, the fixture doctrine."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from flink_note_spark.operators.windows import _duration_us

    size_us = _duration_us(size)
    key_type = dict(stream.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, win_start_us long, win_end_us long, "
        "rn int, ts_us long, value double"
    )
    cols = [key_col, "win_start_us", "win_end_us", "rn", "ts_us",
            "value"]

    def fn(key_tuple, pdfs, state: GroupState):
        k, win_start = key_tuple
        win_start = int(win_start)
        end_us = win_start + size_us

        def final(ts, vals):
            # rank: value desc, ts asc — lexsort on (-vals, ts)
            order = np.lexsort((ts, -vals))
            rows = [
                (k, win_start, end_us, r + 1, int(ts[i]),
                 float(vals[i]))
                for r, i in enumerate(order)
            ]
            return pd.DataFrame(rows, columns=cols)

        if state.hasTimedOut:
            ts, vals = state.get
            state.remove()
            yield final(
                np.asarray(ts, dtype=np.int64),
                np.asarray(vals, dtype=np.float64),
            )
            return

        pt, pv = [], []
        if state.exists:
            prev_ts, prev_vals = state.get
            pt.append(np.asarray(prev_ts, dtype=np.int64))
            pv.append(np.asarray(prev_vals, dtype=np.float64))
        for pdf in pdfs:
            pt.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            pv.append(
                pdf[value_col].fillna(0.0).to_numpy(dtype=np.float64)
            )
        ts = np.concatenate(pt)
        vals = np.concatenate(pv)
        # monotone cutoff: keep only the current top n
        order = np.lexsort((ts, -vals))[:n]
        ts, vals = ts[order], vals[order]
        wm_us = state.getCurrentWatermarkMs() * 1_000
        if wm_us >= end_us:
            state.remove()
            yield final(ts, vals)
            return
        state.update((ts.tolist(), vals.tolist()))
        state.setTimeoutTimestamp(max(
            end_us // 1_000, state.getCurrentWatermarkMs() + 1
        ))

    win = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(size_us)
        ).cast("long") * F.lit(size_us)
    ).alias("__win")
    return (
        stream.withWatermark(ts_col, watermark)
        .select("*", win)
        .groupBy(key_col, "__win")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="ts array<long>, vals array<double>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def window_dedup_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    size: str,
    keep: str = "first",
    value_col: str = "value",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Flink SQL **Window Deduplication** on a stream (r8): the first
    or last row per (key, tumbling window) by EVENT TIME, emitted once
    at window close. State is O(1) per live (key, window) — only the
    current best (ts, value) survives each micro-batch, the degenerate
    ``n = 1`` case of the Top-N monotone cutoff.

    Output: ``(key, win_start_us, win_end_us, ts_us, value)``; batch
    twin ``operators/windows.window_dedup`` (equality pinned in
    tests). Equal-timestamp rows tie arbitrarily (fixture doctrine)."""
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first|last, got {keep!r}")
    from flink_note_spark.operators.windows import _duration_us

    size_us = _duration_us(size)
    key_type = dict(stream.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, win_start_us long, win_end_us long, "
        "ts_us long, value double"
    )
    cols = [key_col, "win_start_us", "win_end_us", "ts_us", "value"]
    want_min = keep == "first"

    def fn(key_tuple, pdfs, state: GroupState):
        k, win_start = key_tuple
        win_start = int(win_start)
        end_us = win_start + size_us

        if state.hasTimedOut:
            best_ts, best_val = state.get
            state.remove()
            yield pd.DataFrame(
                [(k, win_start, end_us, int(best_ts),
                  float(best_val))],
                columns=cols,
            )
            return

        best = state.get if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pdf[ts_col].to_numpy().view("int64") // 1_000
            vals = pdf[value_col].fillna(0.0).to_numpy(
                dtype=np.float64
            )
            i = int(np.argmin(ts) if want_min else np.argmax(ts))
            cand = (int(ts[i]), float(vals[i]))
            if best is None or (
                cand[0] < best[0] if want_min else cand[0] > best[0]
            ):
                best = cand
        wm_us = state.getCurrentWatermarkMs() * 1_000
        if wm_us >= end_us:
            state.remove()
            yield pd.DataFrame(
                [(k, win_start, end_us, best[0], best[1])],
                columns=cols,
            )
            return
        state.update(best)
        state.setTimeoutTimestamp(max(
            end_us // 1_000, state.getCurrentWatermarkMs() + 1
        ))

    win = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(size_us)
        ).cast("long") * F.lit(size_us)
    ).alias("__win")
    return (
        stream.withWatermark(ts_col, watermark)
        .select("*", win)
        .groupBy(key_col, "__win")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="best_ts long, best_val double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def file_wall_clock(path: str):
    """Picklable stub wall clock for deterministic processing-time
    tests: a zero-arg callable reading the current fake time (seconds)
    from ``path`` — the driver rewrites the file between batches,
    workers read it per batch (plain closure, pickled by value with
    the package)."""
    def _read() -> float:
        with open(path) as f:
            return float(f.read().strip())

    return _read


def keyed_running_agg_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str = "value",
    ttl: str | None = None,
    watermark: str = "5 minutes",
    ttl_clock: str = "event",
    _wall_clock=None,
) -> DataFrame:
    """Per-key running aggregate with **state TTL** (r8) — Flink's
    canonical ``ValueState`` + ``StateTtlConfig`` pattern (the running-
    average/fraud-detection example): each key keeps ``(n, sum)`` and
    emits the updated aggregate every micro-batch it receives data;
    with ``ttl`` set, state that has not been UPDATED for ``ttl``
    expires — the next event starts the aggregate fresh, and a timer
    physically removes idle state (the memory-bound half of TTL, which
    matters at 100 TB key cardinalities: without cleanup, every key
    ever seen stays in the store forever).

    ``ttl_clock`` (r9, VERDICT r8 item 5) selects the expiry clock:

    - ``"event"`` (default): expiry on EVENT-time gaps (an event more
      than ``ttl`` after the state's last event resets it first) —
      deterministic under replay/restart, the engine's documented
      deviation from Flink. Within a batch, resets apply at every
      ``> ttl`` gap in event-time order.
    - ``"processing"``: Flink's ``StateTtlConfig`` DEFAULT — state
      untouched for ``ttl`` of WALL-CLOCK time expires, regardless of
      event times. Requires ``ttl``; cleanup runs on a
      processing-time timer. Inherently non-deterministic under
      replay (the Flink behavior); within one micro-batch no reset
      applies (all rows of the batch update state "now", exactly as
      Flink's per-element update refreshes the TTL). ``_wall_clock``
      injects the clock for deterministic tests (a picklable
      zero-arg callable returning seconds; workers call it per
      batch). Caveat: pending processing-time timers keep the query
      scheduling micro-batches, so ``availableNow`` triggers and
      ``processAllAvailable()`` do not quiesce while state is live —
      exactly as a Flink job with registered processing-time timers
      stays running; stop the query explicitly.

    Output per (key, batch-with-data): ``(key, last_ts_us, n,
    sum_value)`` — the aggregate AFTER folding the batch, where
    ``n``/``sum_value`` count events since the last expiry. Update
    output mode; equality-vs-python-fold pinned in tests.
    """
    if ttl_clock not in ("event", "processing"):
        raise ValueError(
            f"ttl_clock must be 'event' or 'processing', got {ttl_clock!r}"
        )
    if ttl_clock == "processing" and ttl is None:
        raise ValueError("ttl_clock='processing' requires ttl=")
    ttl_us = None if ttl is None else _parse_duration_ms(ttl) * 1_000
    key_type = dict(stream.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, last_ts_us long, n long, "
        "sum_value double"
    )
    cols = [key_col, "last_ts_us", "n", "sum_value"]

    if ttl_clock == "processing":
        ttl_ms = _parse_duration_ms(ttl)
        wall = _wall_clock

        def fn_proc(key_tuple, pdfs, state: GroupState):
            import time as _time

            (k,) = key_tuple
            if state.hasTimedOut:
                state.remove()
                return
            now_us = int((wall() if wall is not None else _time.time())
                         * 1_000_000)
            n, s, last_ts, last_wall = (
                state.get if state.exists else (0, 0.0, None, None)
            )
            pt, pv = [], []
            for pdf in pdfs:
                if not len(pdf):
                    continue
                pt.append(
                    pdf[ts_col].to_numpy().view("int64") // 1_000
                )
                pv.append(
                    pdf[value_col].fillna(0.0)
                    .to_numpy(dtype=np.float64)
                )
            if not pt:
                return
            ts = np.concatenate(pt)
            vals = np.concatenate(pv)
            if last_wall is not None and now_us - last_wall > ttl_us:
                n, s = 0, 0.0  # idle past TTL on the wall clock
            n += len(ts)
            s += float(vals.sum())
            last_ts = int(ts.max())
            state.update((n, s, last_ts, now_us))
            state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                [(k, last_ts, n, round(s, 4))], columns=cols
            )

        return (
            stream.groupBy(key_col)
            .applyInPandasWithState(
                fn_proc,
                outputStructType=out_schema,
                stateStructType=(
                    "n long, s double, last_ts long, last_wall long"
                ),
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
            )
        )

    def fn(key_tuple, pdfs, state: GroupState):
        (k,) = key_tuple
        if state.hasTimedOut:
            # idle past TTL: physical cleanup, nothing to emit
            state.remove()
            return

        n, s, last_ts = state.get if state.exists else (0, 0.0, None)
        pt, pv = [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pt.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            pv.append(
                pdf[value_col].fillna(0.0).to_numpy(dtype=np.float64)
            )
        if not pt:
            return
        ts = np.concatenate(pt)
        vals = np.concatenate(pv)
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order], vals[order]
        if ttl_us is not None:
            prev = np.concatenate((
                [last_ts if last_ts is not None else ts[0]], ts[:-1]
            ))
            resets = np.nonzero(ts - prev > ttl_us)[0]
            if len(resets):
                cut = int(resets[-1])
                n, s = 0, 0.0
                ts, vals = ts[cut:], vals[cut:]
        n += len(ts)
        s += float(vals.sum())
        last_ts = int(ts[-1])
        state.update((n, s, last_ts))
        if ttl_us is not None:
            state.setTimeoutTimestamp(max(
                (last_ts + ttl_us) // 1_000,
                state.getCurrentWatermarkMs() + 1,
            ))
        yield pd.DataFrame(
            [(k, last_ts, n, round(s, 4))], columns=cols
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="n long, s double, last_ts long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def allowed_lateness_tumbling_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    size: str,
    lateness: str,
    value_col: str = "value",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Flink **allowedLateness** on an event-time tumbling window
    (r8): the window fires when the watermark passes its end, but its
    state is kept for ``lateness`` longer — each late event arriving
    in that grace period RE-FIRES the window with the updated
    aggregate; events later still are dropped by this operator (route
    them with :func:`tag_late_data` → :func:`side_outputs` for Flink's
    ``sideOutputLateData``).

    Spark folds lateness into the watermark delay and never re-fires;
    the faithful rendering widens the ENGINE watermark by ``lateness``
    (so grace-period rows still reach the state store) and recovers
    the true event-time watermark as ``engine_wm + lateness`` for
    firing decisions. Firing schedule per (key, window): the on-time
    firing (``firing = 0``) when the true watermark passes the window
    end — emitted by event-time timer, so it fires even for windows
    with no further data; one late firing (``firing = k``) per
    micro-batch that delivers grace-period data after that; physical
    state cleanup when the true watermark passes ``end + lateness``.
    Late-firing TIMING follows micro-batch boundaries, exactly as
    Flink's follows per-element arrival; the final firing's aggregate
    is deterministic and equals the batch aggregate over all rows that
    reached the operator (pinned in tests).

    Output: ``(key, win_start_us, win_end_us, firing, n_events,
    sum_value)``, update mode.
    """
    from flink_note_spark.operators.windows import _duration_us

    size_us = _duration_us(size)
    late_us = _duration_us(lateness)
    key_type = dict(stream.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, win_start_us long, win_end_us long, "
        "firing int, n_events long, sum_value double"
    )
    cols = [key_col, "win_start_us", "win_end_us", "firing",
            "n_events", "sum_value"]

    def fn(key_tuple, pdfs, state: GroupState):
        k, win_start = key_tuple
        win_start = int(win_start)
        end_us = win_start + size_us
        # engine watermark is widened by `lateness`; recover the true
        # event-time watermark for firing decisions
        wm_true = state.getCurrentWatermarkMs() * 1_000 + late_us

        if state.hasTimedOut:
            n, s, fired = state.get
            if fired == 0:
                # on-time firing (timer at end - lateness on the
                # engine clock == end on the true clock)
                state.update((n, s, 1))
                state.setTimeoutTimestamp(max(
                    end_us // 1_000,  # engine clock: end+lateness true
                    state.getCurrentWatermarkMs() + 1,
                ))
                yield pd.DataFrame(
                    [(k, win_start, end_us, 0, n, round(s, 4))],
                    columns=cols,
                )
            else:
                # grace period over: physical cleanup, no emission
                state.remove()
            return

        existed = state.exists
        n, s, fired = state.get if existed else (0, 0.0, 0)
        if wm_true >= end_us + late_us:
            # the batch's rows are PAST the grace period — Flink drops
            # them at arrival (they belong on the late side output via
            # tag_late_data); clean up whatever state remains
            if existed:
                state.remove()
            return
        got_n, got_s = 0, 0.0
        for pdf in pdfs:
            if not len(pdf):
                continue
            got_n += len(pdf)
            got_s += float(pdf[value_col].fillna(0.0).sum())
        rows = []
        if fired == 0 and wm_true >= end_us:
            # the watermark passed the window end between batches but
            # the timer could not run (data suppresses timeouts): emit
            # the on-time firing from the PRE-BATCH state — exactly
            # what Flink fired at watermark passage — then this
            # batch's grace-period rows as their own late firing
            if existed:
                rows.append((k, win_start, end_us, 0, n, round(s, 4)))
                fired = 1
                n += got_n
                s += got_s
                rows.append(
                    (k, win_start, end_us, fired, n, round(s, 4))
                )
                fired += 1
            else:
                # window born by a grace-period row: its first firing
                n, s, fired = got_n, got_s, 1
                rows.append((k, win_start, end_us, 0, n, round(s, 4)))
            state.update((n, s, fired))
            state.setTimeoutTimestamp(max(
                end_us // 1_000,  # engine clock: end+lateness true
                state.getCurrentWatermarkMs() + 1,
            ))
            yield pd.DataFrame(rows, columns=cols)
            return
        n += got_n
        s += got_s
        if fired > 0:
            # late re-firing inside the grace period
            state.update((n, s, fired + 1))
            state.setTimeoutTimestamp(max(
                end_us // 1_000,
                state.getCurrentWatermarkMs() + 1,
            ))
            yield pd.DataFrame(
                [(k, win_start, end_us, fired, n, round(s, 4))],
                columns=cols,
            )
            return
        state.update((n, s, fired))
        state.setTimeoutTimestamp(max(
            (end_us - late_us) // 1_000,  # fire at true-wm end
            state.getCurrentWatermarkMs() + 1,
        ))

    win = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(size_us)
        ).cast("long") * F.lit(size_us)
    ).alias("__win")
    # widen the engine watermark so grace-period rows are not
    # pre-filtered before they reach the state store
    wide = f"{_parse_duration_ms(watermark) + _parse_duration_ms(lateness)} milliseconds"
    return (
        stream.withWatermark(ts_col, wide)
        .select("*", win)
        .groupBy(key_col, "__win")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="n long, s double, fired int",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def tag_late_data(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    watermark: str,
) -> DataFrame:
    """Flink ``sideOutputLateData`` analogue: pass every row through
    with an ``is_late`` flag set from the ENGINE's current watermark,
    instead of silently dropping late rows the way Spark's stateful
    operators do.

    Structured Streaming exposes the watermark only inside stateful
    operators, so this rides a stateLESS ``applyInPandasWithState``
    pass (no state is ever written — the GroupState is used purely as
    the watermark oracle; state store stays empty, keys cost nothing).
    A row is late when its event time is at or below the watermark the
    engine computed from the PREVIOUS batch — the same cutoff at which
    downstream aggregations would discard it, so routing
    ``is_late`` through :func:`side_outputs` / :func:`route_to_sinks`
    captures exactly the rows a windowed agg would lose. Note Spark
    pre-filters rows later than the watermark DELAY at the source of
    stateful ops; tag BEFORE any aggregation (this operator is the
    first stateful op in its lineage, so everything reaches it).

    Output: the input columns (in order) + ``is_late boolean``. Column
    types flow through Arrow; the event-time column is emitted as epoch
    MICROseconds (``stateful_sessionize`` convention) to keep the
    pass-through deterministic.
    """
    in_cols = [c for c in stream.columns]
    types = dict(stream.dtypes)
    out_fields = []
    for c in in_cols:
        t = "long" if c == time_col else types[c]
        out_fields.append(f"{c} {t}")
    out_schema = ", ".join(out_fields) + ", is_late boolean"

    def tagger(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timers are set
            state.remove()
            return
        wm_us = state.getCurrentWatermarkMs() * 1_000
        for pdf in pdfs:
            if not len(pdf):
                continue
            out = pdf.copy()
            ts_us = out[time_col].astype("int64") // 1_000
            out[time_col] = ts_us
            out["is_late"] = ts_us <= wm_us if wm_us > 0 else False
            yield out[in_cols + ["is_late"]]
        # no state.update: nothing persists, the store stays empty

    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            tagger,
            outputStructType=out_schema,
            stateStructType="unused byte",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def side_outputs(
    df: DataFrame,
    tags: dict[str, Column],
    main: str = "main",
) -> dict[str, DataFrame]:
    """Flink side-output analogue (``OutputTag`` routing, a DataStream
    v1.12 capability the notes' API surface implies — SURVEY.md §2.2):
    route one input into named outputs by predicate.

    Returns ``{tag: DataFrame}`` plus a ``main`` entry holding every row
    matching NO tag. Tags are evaluated independently — a row can reach
    several tags, matching Flink's semantics where a ProcessFunction may
    emit one element to multiple OutputTags. Works identically on batch
    and streaming frames (each returned stream attaches its own sink;
    Spark plans each independently, and a shared upstream should be
    ``foreachBatch``-fanned-out or persisted by the caller if recompute
    matters — the returned frames are filters over the INPUT's lineage,
    so Catalyst pushes each predicate into its own scan).

    The Spark-first translation of Flink's imperative
    ``ctx.output(tag, value)`` is declarative: the predicate IS the
    routing decision, so the optimizer sees it (pushdown, pruning)
    instead of an opaque process function.
    """
    if main in tags:
        raise ValueError(f"tag name {main!r} collides with the main output")
    out = {name: df.filter(cond) for name, cond in tags.items()}
    none_match = None
    for cond in tags.values():
        # NULL-predicate rows match no tag, so they belong to MAIN —
        # but ~NULL is NULL and filter() drops it (three-valued logic),
        # silently losing the row. Coalesce to false before negating.
        neg = ~F.coalesce(cond, F.lit(False))
        none_match = neg if none_match is None else (none_match & neg)
    out[main] = df if none_match is None else df.filter(none_match)
    return out


def route_to_sinks(
    stream: DataFrame,
    tags: dict[str, Column],
    sinks: dict,
    main: str = "main",
    checkpoint: str | None = None,
    query_name: str | None = None,
):
    """Fan one stream out to every tag's sink with ONE source read and
    ONE materialization per micro-batch — the streaming half Flink's
    OutputTag gives for free and plain :func:`side_outputs` does not:
    each returned frame there is a filter over the INPUT's lineage, so
    attaching N sinks re-reads (and re-computes) the source N times
    (VERDICT r4 "What's missing" #3).

    ``sinks`` maps tag name (including ``main``) → callable
    ``(batch_df, batch_id) -> None`` — the same contract as
    ``foreachBatch``, receiving that tag's slice of the micro-batch.
    Inside each batch the input is persisted once, every tag's
    predicate filters the cached rows (identical routing semantics to
    :func:`side_outputs`, NULL→main included), the sinks run, and the
    cache is dropped — so the upstream pipeline executes exactly once
    per batch regardless of sink count (asserted by accumulator in
    tests/test_streaming.py). Tags without a sink are simply not
    written; a sink for an unknown tag is an error.

    Returns the un-started ``DataStreamWriter`` — attach a trigger and
    ``.start()`` it (same convention as ``sources.files``'s
    ``foreach_batch_sink``). A stateful upstream
    (``applyInPandasWithState`` — sessionize, streaming CEP) requires
    ``.outputMode("update")`` on the returned writer; the engine rejects
    the default append at analysis time. Exactly-once notes: foreachBatch is
    at-least-once on retry; idempotent/transactional sinks should key
    on ``batch_id`` (e.g. the manifest pattern in
    ``sources/files.write_stream_sink``).
    """
    unknown = set(sinks) - (set(tags) | {main})
    if unknown:
        raise ValueError(
            f"route_to_sinks: sinks for unknown tags {sorted(unknown)} "
            f"(tags: {sorted(tags)} + {main!r})"
        )

    def fan_out(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            outs = side_outputs(batch_df, tags, main=main)
            for name, sink in sinks.items():
                sink(outs[name], batch_id)
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(fan_out)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if query_name is not None:
        writer = writer.queryName(query_name)
    return writer


def tagged_union(
    left: DataFrame,
    right: DataFrame,
    tag_col: str = "__source",
    left_tag: str = "left",
    right_tag: str = "right",
) -> DataFrame:
    """Flink ``connect``-pattern front half: merge two schemas into one
    tagged stream for shared keyed processing.

    Flink's ``ConnectedStreams`` + ``CoProcessFunction`` lets two typed
    streams share keyed state; Structured Streaming has no two-input
    stateful operator, so the Spark-first pattern is tag → unionByName
    (missing columns null-filled) → ``applyInPandasWithState`` keyed on
    the shared key, dispatching on the tag column inside the function —
    state is shared because the union IS one stream. Works on batch
    frames too (same dispatch, no state). A ``tag_col`` already present
    on either input is overwritten — pick an unused name.
    """
    lt = left.withColumn(tag_col, F.lit(left_tag))
    rt = right.withColumn(tag_col, F.lit(right_tag))
    return lt.unionByName(rt, allowMissingColumns=True)


def count_window_stream(
    stream: DataFrame,
    key: str,
    ts_col: str,
    size: int,
    value_col: str = "value",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Streaming tumbling COUNT windows — Flink ``keyBy().countWindow(n)``
    via ``applyInPandasWithState``: per key, every ``size``-th event
    closes a window and emits ``(key, window_id, n_events, sum_value,
    win_start_us, win_end_us)``; the partial tail stays in state
    (≤ size−1 buffered events per key — O(size) state, watermark-free
    eviction is unnecessary because the buffer is bounded by
    construction; the watermark only gates late-row admission).

    Ordering contract (same as Flink's): count windows are ARRIVAL-
    ordered across micro-batches — only event-time-sorted WITHIN each
    batch. On a single bounded batch this equals the batch
    :func:`~flink_note_spark.operators.windows.count_window` rendering
    (equality-tested); across batches the assignment depends on arrival,
    exactly like Flink's count triggers.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    key_type = dict(stream.dtypes)[key]
    out_schema = (
        f"{key} {key_type}, window_id long, n_events int, "
        "sum_value double, win_start_us long, win_end_us long"
    )
    cols = [key, "window_id", "n_events", "sum_value",
            "win_start_us", "win_end_us"]

    def fn(key_tuple, pdfs, state: GroupState):
        (k,) = key_tuple
        if state.hasTimedOut:  # pragma: no cover - no timers armed
            state.remove()
            return
        win_id, buf_ts, buf_val = (
            state.get if state.exists else (0, [], [])
        )
        buf_ts, buf_val = list(buf_ts), list(buf_val)
        rows = []
        for pdf in pdfs:
            order = pdf[ts_col].argsort(kind="stable")
            ts_us = (pdf[ts_col].astype("int64") // 1_000).iloc[order]
            vals = pdf[value_col].iloc[order]
            for t, v in zip(ts_us.tolist(), vals.tolist()):
                buf_ts.append(t)
                buf_val.append(float(v) if v is not None else 0.0)
                if len(buf_ts) == size:
                    rows.append((
                        k, win_id, size, round(sum(buf_val), 4),
                        min(buf_ts), max(buf_ts),
                    ))
                    win_id += 1
                    buf_ts, buf_val = [], []
        state.update((win_id, buf_ts, buf_val))
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=(
                "win long, buf_ts array<long>, buf_val array<double>"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cumulate_window_stream(
    stream: DataFrame,
    ts_col: str,
    step: str,
    size: str,
    value_col: str = "value",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Streaming CUMULATE windows (r7) — Flink SQL's ``CUMULATE`` TVF
    early-fire behaviour: each ``size``-aligned span re-emits its
    cumulative ``(n_events, sum_value)`` at every ``step`` boundary
    the watermark passes, exactly once per boundary. The batch twin is
    ``operators/windows.cumulate_window`` + ``groupBy`` (equality-
    tested on bounded input in tests/test_streaming.py).

    Keyed by the span start (derived column — stateful ops take
    arbitrary group keys; the watermark still gates late-row admission
    and drives the event-time timers): state buffers the span's
    events, a boundary ``end_j = start + j·step`` is FINAL once
    ``wm >= end_j`` (the engine's late filter then drops any
    ``ts < end_j``), the timer re-arms at the next undecided boundary,
    and the span's state is dropped after its last boundary emits.
    State per span is bounded by the span's own row count within the
    watermark delay — the same bound Flink's CUMULATE operator
    carries.

    Output: ``(win_start_us, win_end_us, n_events, sum_value)`` in
    epoch microseconds (the stateful-operator output convention).
    """
    from flink_note_spark.operators.windows import _duration_us

    step_us = _duration_us(step)
    size_us = _duration_us(size)
    if size_us % step_us != 0:
        raise ValueError(
            f"size must be a multiple of step (Flink's CUMULATE rule), "
            f"got step={step!r} size={size!r}"
        )
    n_steps = size_us // step_us
    out_schema = (
        "win_start_us long, win_end_us long, n_events int, "
        "sum_value double"
    )
    cols = ["win_start_us", "win_end_us", "n_events", "sum_value"]

    def fn(key_tuple, pdfs, state: GroupState):
        (span_start,) = key_tuple
        span_start = int(span_start)  # numpy int64 breaks JSON paths
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def decide(j_done, buf_ts, buf_val):
            rows = []
            while j_done < n_steps:
                end_j = span_start + (j_done + 1) * step_us
                if wm_us < end_j:
                    break
                live = [
                    (t, v) for t, v in zip(buf_ts, buf_val) if t < end_j
                ]
                rows.append((
                    span_start, end_j, len(live),
                    round(sum(v for _, v in live), 4),
                ))
                j_done += 1
            return rows, j_done

        if state.hasTimedOut:
            j_done, buf_ts, buf_val = state.get
            rows, j_done = decide(j_done, list(buf_ts), list(buf_val))
            if j_done >= n_steps:
                state.remove()
            else:
                state.update((j_done, list(buf_ts), list(buf_val)))
                state.setTimeoutTimestamp(max(
                    (span_start + (j_done + 1) * step_us) // 1_000,
                    state.getCurrentWatermarkMs() + 1,
                ))
            if rows:
                yield pd.DataFrame(rows, columns=cols)
            return

        j_done, buf_ts, buf_val = (
            state.get if state.exists else (0, [], [])
        )
        buf_ts, buf_val = list(buf_ts), list(buf_val)
        for pdf in pdfs:
            ts_us = (pdf[ts_col].astype("int64") // 1_000).tolist()
            vals = pdf[value_col].tolist()
            for t, v in zip(ts_us, vals):
                buf_ts.append(t)
                buf_val.append(float(v) if v is not None else 0.0)
        rows, j_done = decide(j_done, buf_ts, buf_val)
        if j_done >= n_steps:
            state.remove()
        else:
            state.update((j_done, buf_ts, buf_val))
            state.setTimeoutTimestamp(max(
                (span_start + (j_done + 1) * step_us) // 1_000,
                state.getCurrentWatermarkMs() + 1,
            ))
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    span = (
        F.floor(
            F.unix_micros(F.col(ts_col)) / F.lit(size_us)
        ).cast("long") * F.lit(size_us)
    ).alias("__span")
    return (
        stream.withWatermark(ts_col, watermark)
        .select("*", span)
        .groupBy("__span")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=(
                "j_done int, ts array<long>, vals array<double>"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def early_fire_tumbling_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    size: str,
    value_col: str = "value",
    watermark: str = "5 minutes",
    every: str | None = None,
) -> DataFrame:
    """Custom window TRIGGER recipe (r8, VERDICT r7 item 6) — Flink's
    early-firing triggers on an event-time tumbling window, rendered
    deterministically:

    - ``every=None`` — the ``ContinuousProcessingTimeTrigger`` /
      fire-per-update analogue: every micro-batch that adds data to a
      live (key, window) re-emits its cumulative ``(n_events,
      sum_value)`` with ``is_final = false``; when the watermark
      passes the window end, the FINAL row emits with ``is_final =
      true`` and state drops. Partials are correct prefixes but their
      timing follows micro-batch boundaries (as Flink's
      processing-time firings follow wall clock); the finals are
      deterministic and equal the batch tumbling aggregate. State is
      O(1) per live (key, window) — (n, sum), no event buffer.
    - ``every="1 minute"`` — the ``ContinuousEventTimeTrigger``
      analogue: partials fire exactly once per event-time boundary
      ``win_start + j·every`` as the watermark passes it, each
      aggregating events with ``ts < boundary`` — fully deterministic,
      at the cost of buffering the window's events (the CUMULATE
      machinery generalized to per-key windows + finality flag);
      ``every`` must divide ``size``.

    Output: ``(key, win_start_us, win_end_us, n_events, sum_value,
    is_final)``; epoch-µs window bounds (stateful-op convention).
    Equality-vs-batch-finals is pinned in tests/test_streaming.py.
    """
    from flink_note_spark.operators.windows import _duration_us

    size_us = _duration_us(size)
    every_us = None
    if every is not None:
        every_us = _duration_us(every)
        if size_us % every_us != 0:
            raise ValueError(
                f"every must divide size (boundary alignment), got "
                f"every={every!r} size={size!r}"
            )
    key_type = dict(stream.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, win_start_us long, win_end_us long, "
        "n_events int, sum_value double, is_final boolean"
    )
    cols = [key_col, "win_start_us", "win_end_us", "n_events",
            "sum_value", "is_final"]

    def snapshot_fn(key_tuple, pdfs, state: GroupState):
        k, win_start = key_tuple
        win_start = int(win_start)
        end_us = win_start + size_us
        wm_us = state.getCurrentWatermarkMs() * 1_000

        if state.hasTimedOut:
            n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [(k, win_start, end_us, n, round(s, 4), True)],
                columns=cols,
            )
            return

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].fillna(0.0).sum())
        if wm_us >= end_us:
            # the window is already final (data and finality arrived
            # in the same batch) — emit the final row directly
            state.remove()
            yield pd.DataFrame(
                [(k, win_start, end_us, n, round(s, 4), True)],
                columns=cols,
            )
            return
        state.update((n, s))
        state.setTimeoutTimestamp(max(
            end_us // 1_000, state.getCurrentWatermarkMs() + 1
        ))
        yield pd.DataFrame(
            [(k, win_start, end_us, n, round(s, 4), False)],
            columns=cols,
        )

    n_bounds = (size_us // every_us) if every_us else 0

    def boundary_fn(key_tuple, pdfs, state: GroupState):
        k, win_start = key_tuple
        win_start = int(win_start)
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def decide(j_done, ts, vals):
            rows = []
            while j_done < n_bounds:
                b = win_start + (j_done + 1) * every_us
                if wm_us < b:
                    break
                live = [(t, v) for t, v in zip(ts, vals) if t < b]
                rows.append((
                    k, win_start, b, len(live),
                    round(sum(v for _, v in live), 4),
                    j_done + 1 == n_bounds,
                ))
                j_done += 1
            return rows, j_done

        if state.hasTimedOut:
            j_done, ts, vals = state.get
            rows, j_done = decide(j_done, list(ts), list(vals))
            if j_done >= n_bounds:
                state.remove()
            else:
                state.update((j_done, list(ts), list(vals)))
                state.setTimeoutTimestamp(max(
                    (win_start + (j_done + 1) * every_us) // 1_000,
                    state.getCurrentWatermarkMs() + 1,
                ))
            if rows:
                yield pd.DataFrame(rows, columns=cols)
            return

        j_done, ts, vals = state.get if state.exists else (0, [], [])
        ts, vals = list(ts), list(vals)
        for pdf in pdfs:
            ts.extend(
                (pdf[ts_col].to_numpy().view("int64") // 1_000).tolist()
            )
            vals.extend(
                pdf[value_col].fillna(0.0).astype(float).tolist()
            )
        rows, j_done = decide(j_done, ts, vals)
        if j_done >= n_bounds:
            state.remove()
        else:
            state.update((j_done, ts, vals))
            state.setTimeoutTimestamp(max(
                (win_start + (j_done + 1) * every_us) // 1_000,
                state.getCurrentWatermarkMs() + 1,
            ))
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    win = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(size_us)
        ).cast("long") * F.lit(size_us)
    ).alias("__win")
    grouped = (
        stream.withWatermark(ts_col, watermark)
        .select("*", win)
        .groupBy(key_col, "__win")
    )
    if every_us is None:
        return grouped.applyInPandasWithState(
            snapshot_fn,
            outputStructType=out_schema,
            stateStructType="n int, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    return grouped.applyInPandasWithState(
        boundary_fn,
        outputStructType=out_schema,
        stateStructType=(
            "j_done int, ts array<long>, vals array<double>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def count_evictor_tumbling_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    size: str,
    n: int,
    value_col: str = "value",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Custom window EVICTOR recipe (r8, VERDICT r7 item 6) — Flink
    ``CountEvictor.of(n)`` on an event-time tumbling window: when the
    window fires, only the LAST ``n`` elements by event time reach the
    window function; earlier ones are evicted.

    The streaming rendering keeps the top-``n``-by-time INCREMENTALLY:
    an event below the current n-th-largest timestamp can never
    re-enter (later events only raise the cutoff), so per-(key,
    window) state is O(n) — the evictor's own bound, NOT the window's
    row count. One final row per window once the watermark passes its
    end: ``(key, win_start_us, win_end_us, n_kept, sum_value)``.

    Batch twin: ``operators/windows.count_evictor_window`` + groupBy
    (equality-tested in tests/test_streaming.py). Equal-timestamp
    events at the cutoff evict arbitrarily (use unique timestamps per
    key for reproducibility — the fixture doctrine)."""
    if n < 1:
        raise ValueError("count evictor requires n >= 1")
    from flink_note_spark.operators.windows import _duration_us

    size_us = _duration_us(size)
    key_type = dict(stream.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, win_start_us long, win_end_us long, "
        "n_kept int, sum_value double"
    )
    cols = [key_col, "win_start_us", "win_end_us", "n_kept",
            "sum_value"]

    def fn(key_tuple, pdfs, state: GroupState):
        k, win_start = key_tuple
        win_start = int(win_start)
        end_us = win_start + size_us
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def final_rows(ts, vals):
            return pd.DataFrame(
                [(k, win_start, end_us, len(ts),
                  round(float(np.sum(vals)) if len(vals) else 0.0, 4))],
                columns=cols,
            )

        if state.hasTimedOut:
            ts, vals = state.get
            state.remove()
            yield final_rows(list(ts), list(vals))
            return

        pt, pv = [], []
        if state.exists:
            prev_ts, prev_vals = state.get
            pt.append(np.asarray(prev_ts, dtype=np.int64))
            pv.append(np.asarray(prev_vals, dtype=np.float64))
        for pdf in pdfs:
            pt.append(pdf[ts_col].to_numpy().view("int64") // 1_000)
            pv.append(
                pdf[value_col].fillna(0.0).to_numpy(dtype=np.float64)
            )
        ts = np.concatenate(pt)
        vals = np.concatenate(pv)
        # incremental eviction: keep only the n latest by event time
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order][-n:], vals[order][-n:]
        if wm_us >= end_us:
            state.remove()
            yield final_rows(ts, vals)
            return
        state.update((ts.tolist(), vals.tolist()))
        state.setTimeoutTimestamp(max(
            end_us // 1_000, state.getCurrentWatermarkMs() + 1
        ))

    win = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(size_us)
        ).cast("long") * F.lit(size_us)
    ).alias("__win")
    return (
        stream.withWatermark(ts_col, watermark)
        .select("*", win)
        .groupBy(key_col, "__win")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="ts array<long>, vals array<double>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def minhash_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    *,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    retention: str | None = None,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """STREAMING MinHash near-duplicate detection (late-r8) —
    ingest-time dedup of a document stream against its own history,
    the training-data-pipeline op a streaming corpus intake needs
    (the batch twin is ``operators.dedup.minhash_lsh_pairs``; the
    signature/band math is IDENTICAL, so streamed pairs equal the
    batch candidate pairs at the same est threshold — pinned in
    tests/test_streaming.py).

    Plan shape (the 100 TB posture):

    1. Per-document MinHash signatures as pure Catalyst expressions —
       whitespace-run tokens → word n-grams → ``pmod(xxhash64, 2³¹−1)``
       → one ``array_min`` per hash function — evaluated per row at
       the scan, NO shuffle and NO Python (bit-identical values to the
       batch ``_shingle_rows``/``minhash_signatures`` path, which
       instead amortizes one explode+groupBy over a full corpus scan).
    2. Band keys (``xxhash64`` over each signature slice) exploded to
       ``(band_id, band_key)`` rows — the ONLY shuffle, on the bucket
       key, exactly the batch equi-join's key.
    3. One ``applyInPandasWithState`` per bucket: state is the
       bucket's seen ``(id, ts, signature)`` rows; each arriving doc
       scores signature agreement (est Jaccard = equal components /
       num_hashes) against the bucket history and emits
       ``(doc_id, dup_of, est_jaccard, band_id)`` for est ≥ threshold,
       where ``dup_of`` is the earlier document by (ts, id).

    State policy: ``retention`` (e.g. ``"7 days"``) bounds dedup by
    event time, enforced twice — as a MATCH conjunct
    (``|new_ts − old_ts| <= retention``, so results are deterministic
    regardless of watermark progress) and as state eviction (entries
    older than ``watermark − retention`` drop; an event-time timer
    physically clears idle buckets). Dedup means "against the
    retained window" — the unbounded-corpus answer; ``None`` keeps
    everything and is only for bounded replays. ``max_bucket`` is the
    boilerplate-flood cap: a bucket that reaches it stops storing and
    matching (the batch op anti-joins flooded buckets away wholesale;
    a stream cannot retroactively unemit, so the cap freezes the
    bucket instead — documented policy, pinned by a unit test).

    Caveats vs batch: a pair colliding in several bands emits once per
    band (batch dropDuplicates over candidates; chaining a second
    stateful dedup after this op is a Spark update-mode restriction —
    distinct on (doc_id, dup_of) in ``foreachBatch`` if exact batch
    parity is needed), there is no exact-Jaccard verify stage (est
    only — verify downstream against a document store), and docs with
    fewer than ``n`` tokens never pair (they produce no shingles, as
    in batch). PRECONDITION (same as batch): one row per id.
    """
    from flink_note_spark.operators.dedup import _MERSENNE31, _lcg

    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    rnd = _lcg(seed)
    params = [
        (next(rnd) % (_MERSENNE31 - 1) + 1, next(rnd) % _MERSENNE31)
        for _ in range(num_hashes)
    ]
    id_type = dict(docs.dtypes)[id_col]
    ret_us = (
        None if retention is None
        else _parse_duration_ms(retention) * 1_000
    )

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        id_col, ts_col, words.alias("__w")
    ).filter(F.size("__w") >= n)
    grams = F.expr(
        f"transform(sequence(0, size(__w) - {n}), "
        f"i -> concat_ws(' ', slice(__w, i + 1, {n})))"
    )
    hv = F.transform(grams, lambda x: F.pmod(F.xxhash64(x),
                                             F.lit(_MERSENNE31)))
    base = base.select(id_col, ts_col, hv.alias("__hv"))
    sig = F.array(*[
        F.array_min(
            F.transform(
                F.col("__hv"),
                lambda h: F.pmod(
                    F.lit(a) * h + F.lit(b), F.lit(_MERSENNE31)
                ),
            )
        ).cast("int")
        for (a, b) in params
    ])
    sigd = base.select(id_col, ts_col, sig.alias("signature"))
    band_struct = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("band_id"),
            F.xxhash64(F.concat_ws(",", *[
                F.element_at("signature", i * r + j + 1).cast("string")
                for j in range(r)
            ])).alias("band_key"),
        )
        for i in range(bands)
    ])).alias("band")
    rows = (
        sigd.withWatermark(ts_col, watermark)
        .select(id_col, ts_col, "signature", band_struct)
        .select(
            id_col, ts_col, "signature", "band.band_id", "band.band_key",
        )
    )

    out_schema = (
        f"doc_id {id_type}, dup_of {id_type}, est_jaccard double, "
        f"band_id int"
    )
    state_schema = (
        f"ids array<{id_type}>, tss array<long>, sigs array<int>"
    )
    nh = num_hashes
    thr = float(threshold)

    def _fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band_id = int(key[0])
        wm_us = state.getCurrentWatermarkMs() * 1_000

        def _evict(ids, tss, sigs):
            # state appends in processing order; late-but-in-watermark
            # docs make tss non-monotone, so filter rather than
            # prefix-scan
            if ret_us is None or not tss:
                return ids, tss, sigs
            cutoff = wm_us - ret_us
            keep = [k for k, t in enumerate(tss) if t >= cutoff]
            if len(keep) == len(tss):
                return ids, tss, sigs
            return (
                [ids[k] for k in keep],
                [tss[k] for k in keep],
                [v for k in keep for v in sigs[k * nh:(k + 1) * nh]],
            )

        def _arm(tss):
            if ret_us is not None and tss:
                state.setTimeoutTimestamp(max(
                    (min(tss) + ret_us) // 1_000 + 1,
                    state.getCurrentWatermarkMs() + 1,
                ))

        if state.hasTimedOut:
            ids, tss, sigs = state.get
            ids, tss, sigs = _evict(list(ids), list(tss), list(sigs))
            if ids:
                state.update((ids, tss, sigs))
                _arm(tss)
            else:
                state.remove()
            return

        ids, tss, sigs = [], [], []
        if state.exists:
            p_ids, p_tss, p_sigs = state.get
            ids, tss, sigs = list(p_ids), list(p_tss), list(p_sigs)
        ids, tss, sigs = _evict(ids, tss, sigs)
        hist = (
            np.asarray(sigs, dtype=np.int64).reshape(-1, nh)
            if sigs else np.empty((0, nh), dtype=np.int64)
        )
        new = []
        for pdf in pdfs:
            if len(pdf):
                new.append(pdf)
        out_rows = []
        if new:
            pdf = pd.concat(new, ignore_index=True)
            pdf = pdf.sort_values(
                [ts_col, id_col], kind="stable", ignore_index=True
            )
            new_sigs = np.asarray(
                [list(s) for s in pdf["signature"]], dtype=np.int64
            )
            new_ts = pdf[ts_col].to_numpy().view("int64") // 1_000
            new_ids = pdf[id_col].tolist()
            for j in range(len(pdf)):
                if len(ids) >= max_bucket:
                    break  # flood-frozen bucket (documented policy)
                s = new_sigs[j]
                jt, jid = int(new_ts[j]), new_ids[j]
                if hist.shape[0]:
                    est = (hist == s).mean(axis=1)
                    for k in np.nonzero(est >= thr)[0]:
                        if ids[k] == jid:
                            continue
                        # the retention window is a MATCH conjunct,
                        # not just lazy state eviction: results are
                        # then deterministic regardless of how far
                        # the watermark happened to advance
                        if (
                            ret_us is not None
                            and abs(jt - tss[k]) > ret_us
                        ):
                            continue
                        # orient by event time (ties by id): file
                        # arrival order across micro-batches is not
                        # the event-time order
                        if (tss[k], ids[k]) < (jt, jid):
                            later, earlier = jid, ids[k]
                        else:
                            later, earlier = ids[k], jid
                        out_rows.append((
                            later, earlier,
                            round(float(est[k]), 6), band_id,
                        ))
                ids.append(jid)
                tss.append(jt)
                sigs.extend(int(x) for x in s)
                hist = np.vstack([hist, s[None, :]])
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["doc_id", "dup_of", "est_jaccard", "band_id"],
            )
        if ids:
            state.update((ids, tss, sigs))
            _arm(tss)
        else:
            state.remove()

    return (
        rows.groupBy("band_id", "band_key")
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def paragraph_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    *,
    sep: str = "\n\n",
    normalize: bool = True,
    min_len: int = 0,
    retention: str | None = None,
) -> DataFrame:
    """STREAMING paragraph-level dedup (late-r10) — ingest-time
    boilerplate removal for a document stream, the streaming twin of
    ``operators.dedup.paragraph_dedup``: a paragraph whose normalized
    digest has already been seen is DROPPED; the first arrival owns
    the key. Output is the surviving-paragraph stream
    ``id, ts_us (epoch microseconds, the streaming convention), pos,
    para`` in append mode — reassembly is a downstream concern
    (the batch reassembly groupBy runs per micro-batch in
    ``foreachBatch`` when each document's paragraphs arrive together,
    which the stateless explode guarantees within a batch).

    Plan shape (the 100 TB posture): the split + posexplode + digest
    are pure Catalyst at the scan (zero shuffle, the batch op's
    expressions verbatim); the ONLY shuffle keys on the 128-bit
    paragraph digest — exactly the batch window's partitioning — into
    one ``applyInPandasWithState`` whose state per digest is a single
    owner timestamp (O(1), no text retained). Paragraphs shorter than
    ``min_len`` NORMALIZED characters bypass the stateful stage
    entirely (never dropped, never claim a key — the batch rule, and
    they add no state).

    Ordering contract: within a micro-batch the owner is the smallest
    ``(ts, id, pos)`` row (deterministic); ACROSS batches it is
    arrival order — equal to the batch operator's global (id, pos)
    choice whenever documents arrive in id order (the replay case,
    pinned in tests). ``retention`` (e.g. ``"7 days"``) re-admits a
    paragraph once the current owner is older than the window — a
    MATCH conjunct evaluated against the arriving row's event time
    (deterministic regardless of watermark progress) — and evicts the
    state entry by event-time timer once the watermark passes
    ``owner + retention`` (at which point every admissible arrival
    would re-own the key anyway, so eviction changes no answer).
    ``None`` keeps every digest forever — bounded replays only."""
    from flink_note_spark.operators.windows import _duration_us

    ret_us = _duration_us(retention) if retention else None
    paras_arr = F.filter(
        F.split(F.col(text_col), F.lit(sep), -1),
        lambda p: F.trim(p) != "",
    )
    exploded = (
        docs.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.posexplode(paras_arr).alias("pos", "para"),
        )
    )
    norm = F.col("para")
    if normalize:
        norm = F.regexp_replace(F.trim(F.lower(norm)), r"\s+", " ")
    keyed = exploded.select(
        id_col, ts_col, "pos", "para",
        F.md5(norm).alias("__pkey"),
        F.length(norm).alias("__plen"),
    )
    id_type = dict(docs.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, ts_us long, pos int, para string"
    )
    short = keyed.filter(F.col("__plen") < F.lit(min_len)).select(
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col("pos").cast("int"),
        "para",
    )
    rows = keyed.filter(F.col("__plen") >= F.lit(min_len))

    def _fn(
        key: tuple,
        pdfs: "Iterator[pd.DataFrame]",
        state: GroupState,
    ) -> "Iterator[pd.DataFrame]":
        if state.hasTimedOut:
            # wm >= owner + retention: every admissible arrival would
            # re-own the key — dropping state changes no answer
            state.remove()
            return
        owner_us = state.get[0] if state.exists else None
        new = [p for p in pdfs if len(p)]
        if not new:
            if owner_us is not None and ret_us is not None:
                state.setTimeoutTimestamp(max(
                    (owner_us + ret_us) // 1_000 + 1,
                    state.getCurrentWatermarkMs() + 1,
                ))
            return
        pdf = pd.concat(new, ignore_index=True)
        pdf = pdf.sort_values(
            [ts_col, id_col, "pos"], kind="stable", ignore_index=True
        )
        ts_us = pdf[ts_col].to_numpy().view("int64") // 1_000
        out = []
        for j in range(len(pdf)):
            t = int(ts_us[j])
            if owner_us is None or (
                ret_us is not None and t - owner_us > ret_us
            ):
                r = pdf.iloc[j]
                out.append(
                    (r[id_col], t, int(r["pos"]), r["para"])
                )
                owner_us = t
        state.update((owner_us,))
        if ret_us is not None:
            state.setTimeoutTimestamp(max(
                (owner_us + ret_us) // 1_000 + 1,
                state.getCurrentWatermarkMs() + 1,
            ))
        if out:
            yield pd.DataFrame(
                out, columns=[id_col, "ts_us", "pos", "para"]
            )

    survivors = (
        rows.groupBy("__pkey")
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType="owner_us long",
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout if ret_us
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
    return survivors.unionByName(short)


def bloom_capacity(n_items: int, fp_rate: float) -> tuple[int, int]:
    """Classic Bloom sizing: (total_bits, n_hashes) for ``n_items``
    inserted keys at ``fp_rate`` false-positive probability —
    ``m = -n·ln p / (ln 2)²``, ``k = (m/n)·ln 2``. Round total_bits up
    to the caller's shard granularity before use."""
    import math

    if n_items <= 0 or not 0.0 < fp_rate < 1.0:
        raise ValueError("n_items must be positive, fp_rate in (0, 1)")
    m = math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def bloom_dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    *,
    n_shards: int = 64,
    bits_per_shard: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Space-BOUNDED streaming dedup via sharded Bloom filters — the
    100 TB alternative to exact per-key state. ``stream_dedup`` (and the
    digest-keyed stateful ops) hold one state entry PER DISTINCT key:
    correct, but on an unbounded key universe (URLs, content digests)
    the state either grows forever or needs a watermark/TTL horizon.
    This operator's TOTAL state is fixed at
    ``n_shards × bits_per_shard`` bits FOREVER, with the classic
    one-sided error: a true duplicate is ALWAYS dropped (no false
    negatives — dedup's safety property), while a novel key is wrongly
    dropped with probability ≈ ``(1 − e^(−k·n/M))^k`` after n distinct
    keys against ``M = n_shards·bits_per_shard`` total bits and
    ``k = n_hashes`` probes (size with :func:`bloom_capacity`; the
    64 MiB default absorbs ~50 M keys at <1% FP).

    Plan shape: key and probe hashes are JVM ``xxhash64`` columns
    computed at the scan; the ONLY shuffle keys rows on
    ``hash(keys) % n_shards`` — uniform by construction, no hot-shard
    skew regardless of key skew (two equal keys always meet in one
    shard, which is all correctness needs). Each shard's filter is one
    BINARY state value updated per micro-batch by a numpy bit-set
    kernel; probe positions use Kirsch–Mitzenmacher double hashing
    (``pos_i = h1 + i·h2 mod m`` with an odd step — a full-period walk
    since ``bits_per_shard`` is a power of two). Set ``n_shards`` to a
    small multiple of executor cores: it bounds the stateful stage's
    parallelism.

    Within a micro-batch rows are processed in ``(ts, keys)`` order, so
    which of two same-key arrivals survives is deterministic. Output is
    the surviving rows in append mode, ``ts_col`` replaced by ``ts_us``
    (epoch microseconds — the streaming convention). No watermark is
    required: nothing here evicts by time, that is the point.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if bits_per_shard < 8 or bits_per_shard & (bits_per_shard - 1):
        raise ValueError("bits_per_shard must be a power of two >= 8")
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    for c in keys + [ts_col]:
        if c not in stream.columns:
            raise ValueError(f"column {c!r} not in the stream")

    m = bits_per_shard
    kcols = [F.col(c) for c in keys]
    work = (
        stream.withColumn(
            "__bd_shard",
            F.pmod(F.xxhash64(*kcols, F.lit(101)), F.lit(n_shards)).cast("int"),
        )
        .withColumn("__bd_h1", F.xxhash64(*kcols, F.lit(202)))
        .withColumn("__bd_h2", F.xxhash64(*kcols, F.lit(303)))
        .withColumn(
            "__bd_ts_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
        )
    )
    passthrough = [c for c in stream.columns if c != ts_col]
    dtypes = dict(stream.dtypes)
    out_schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in passthrough] + ["ts_us long"]
    )
    out_cols = passthrough + ["__bd_ts_us"]
    n_bytes = m // 8

    def _fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        new = [p for p in pdfs if len(p)]
        if not new:
            return
        filt = (
            np.frombuffer(state.get[0], dtype=np.uint8).copy()
            if state.exists
            else np.zeros(n_bytes, dtype=np.uint8)
        )
        pdf = pd.concat(new, ignore_index=True).sort_values(
            ["__bd_ts_us", *keys], kind="stable", ignore_index=True
        )
        h1 = pdf["__bd_h1"].to_numpy().astype(np.uint64) % np.uint64(m)
        h2 = (pdf["__bd_h2"].to_numpy().astype(np.uint64) | np.uint64(1)) % np.uint64(m)
        steps = np.arange(n_hashes, dtype=np.uint64)
        # all probe positions, rows × k (vectorized; the sequential part
        # below is only the bit test/set, which must see earlier rows'
        # inserts to catch intra-batch duplicates)
        pos = (h1[:, None] + steps[None, :] * h2[:, None]) % np.uint64(m)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        keep = np.zeros(len(pdf), dtype=bool)
        for j in range(len(pdf)):
            b, msk = byte_idx[j], bit[j]
            if not np.all(filt[b] & msk):
                # unbuffered OR: two probes of one row may share a BYTE
                # (distinct bits) — plain fancy-index |= would drop one
                np.bitwise_or.at(filt, b, msk)
                keep[j] = True
        state.update((filt.tobytes(),))
        kept = pdf.loc[keep, out_cols]
        if len(kept):
            yield kept.rename(columns={"__bd_ts_us": "ts_us"})

    return work.groupBy("__bd_shard").applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType="filter binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def upsert_latest_stream(
    stream: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Streaming upsert materialization (r10) — Flink's upsert-kafka /
    dynamic-table surface: a keyed changelog stream compacts to its
    latest row per key, re-emitting a key whenever its winner changes.

    Spark-first twin: the batch operator
    (`operators/changelog.py:upsert_latest`) is a single declarative
    ``max_by`` aggregate, and that SAME plan is incrementally
    executable — no applyInPandasWithState, no custom timers. State =
    exactly one compacted struct per live key in the aggregation store
    (the minimum any upsert semantics needs); update output mode emits
    a key only in micro-batches that change it. Late rows with stale
    versions fold in and LOSE to the stored winner — max_by is
    insensitive to arrival order, so stream == batch on any prefix, and
    restarts replay exactly (checkpoint test).

    No watermark: upsert state is keyed CURRENT state, not windowed
    history — it must never expire while the key is live (Flink's
    upsert sink keeps the latest row forever too). Bound key
    cardinality upstream (partition the table) rather than by TTL.

    Write the result with ``output_mode="update"``; the final state per
    key is the LAST emitted row for that key (foreachBatch-merge into a
    keyed store, or compact the memory sink by max version again).
    """
    from flink_note_spark.operators.changelog import upsert_latest

    return upsert_latest(stream, key_cols, version_col, tiebreak)
