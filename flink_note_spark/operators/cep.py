"""Complex-event-processing pattern matching (Flink CEP analogue).

Flink v1.12 ships the CEP library on top of exactly the DataStream
runtime the reference notes trace (keyed state + event-time timers —
SURVEY.md §2.2 "Stateful per-key processing"): ``Pattern.begin("a")
.next("b").followedBy("c").within(Time...)`` compiles to an NFA operator
over a keyed stream. This module re-expresses the two core contiguity
modes Spark-first, as declarative plans Catalyst can optimize, instead
of an imperative NFA:

- **strict contiguity** (Flink ``next``): the pattern's steps are
  ADJACENT events of the key's event-time-ordered stream. One window
  pass: ``lead(type, i)`` per step over (key, time) — a single shuffle
  on the key, no joins, no Python.
- **relaxed contiguity** (Flink ``followedBy``, skip-till-next-match):
  each step matches the EARLIEST event of its type strictly after the
  previous step's event. One union + running-``min`` window pass per
  step — every pass shuffles on the same key, so AQE/exchange reuse
  keeps it one physical repartition; no correlated per-row subqueries,
  no cross join, no per-key Python. State per key inside a window frame
  is O(1), so both shapes survive 100 TB the same way the as-of join
  does (``operators/joins.py``).

The streaming twin (``streaming/ops.match_pattern_stream``) runs the
same strict-contiguity semantics incrementally with
``applyInPandasWithState`` + event-time timers and is equality-tested
against the batch operator in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _step_cols(k: int) -> list[str]:
    return [f"ts_{i}" for i in range(1, k + 1)]


def match_pattern(
    events: DataFrame,
    pattern: list[str],
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    contiguity: str = "strict",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Match an event-type sequence per key; one output row per match.

    Output schema: ``key_col, ts_1 .. ts_k`` — the event time of each
    matched step (``ts_1`` = pattern start, ``ts_k`` = completion).

    ``contiguity='strict'`` is Flink's ``next()``: steps are adjacent in
    the key's stream ordered by ``(time_col, *tiebreak)`` — every event
    between ``ts_1`` and ``ts_k`` belongs to the match. Emitted for
    every starting position (Flink's default no-skip behavior: matches
    may overlap).

    ``contiguity='relaxed'`` is ``followedBy()`` under
    skip-till-next-match: for EACH occurrence of ``pattern[0]``, each
    later step binds to the earliest event of its type STRICTLY after
    the previous step's time. Deterministic (no ambiguity to resolve:
    "earliest completion per start") and the standard CEP reading of
    ``followedBy`` with greedy-minimal continuation.

    ``within`` (e.g. ``"7 days"``) bounds ``ts_k <= ts_1 + within`` —
    Flink's ``Pattern.within``. For relaxed contiguity it is ALSO the
    state-eviction horizon at scale: steps further apart can never
    complete.

    ``tiebreak`` columns break equal-timestamp ordering for strict
    contiguity (pass the event id for a total, reproducible order —
    same doctrine as ``operators/sampling``'s determinism contract).
    """
    if contiguity not in ("strict", "relaxed"):
        raise ValueError(
            f"contiguity must be strict|relaxed, got {contiguity!r}"
        )
    if len(pattern) < 1:
        raise ValueError("pattern must name at least one event type")
    k = len(pattern)
    cols = _step_cols(k)

    if contiguity == "strict":
        return _match_strict(
            events, pattern, key_col, time_col, type_col, within,
            tiebreak or [], cols,
        )
    return _match_relaxed(
        events, pattern, key_col, time_col, type_col, within, cols
    )


def _match_strict(
    events: DataFrame,
    pattern: list[str],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    tiebreak: list[str],
    cols: list[str],
) -> DataFrame:
    k = len(pattern)
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)

    df = events.select(key_col, time_col, type_col, *tiebreak)
    sel = [F.col(key_col), F.col(time_col).alias(cols[0])]
    cond = F.col(type_col) == pattern[0]
    for i in range(1, k):
        cond = cond & (F.lead(type_col, i).over(w) == pattern[i])
        sel.append(F.lead(time_col, i).over(w).alias(cols[i]))
    out = df.select(*sel, cond.alias("__m")).filter(F.col("__m")).drop("__m")
    if within is not None:
        out = out.filter(
            F.col(cols[-1]) <= F.col(cols[0]) + F.expr(f"INTERVAL {within}")
        )
    return out


def _match_relaxed(
    events: DataFrame,
    pattern: list[str],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    cols: list[str],
) -> DataFrame:
    k = len(pattern)
    base = events.select(key_col, time_col, type_col)
    matches = base.filter(F.col(type_col) == pattern[0]).select(
        key_col, F.col(time_col).alias(cols[0])
    )
    for i in range(1, k):
        step = base.filter(F.col(type_col) == pattern[i]).select(
            key_col, F.col(time_col).alias("__step_t")
        )
        matches = _earliest_after(
            matches, step, key_col, prev_col=cols[i - 1], out_col=cols[i]
        ).filter(F.col(cols[i]).isNotNull())
        if within is not None:
            # prune per step, not only at the end: ts_i is monotone in i,
            # so a partial match already past the horizon can never
            # complete — dropping it here keeps the next union pass from
            # carrying doomed anchors (the state-eviction bound at scale)
            matches = matches.filter(
                F.col(cols[i]) <= F.col(cols[0]) + F.expr(f"INTERVAL {within}")
            )
    return matches


def _earliest_after(
    anchors: DataFrame,
    step: DataFrame,
    key_col: str,
    prev_col: str,
    out_col: str,
) -> DataFrame:
    """Attach ``out_col`` = min step time STRICTLY after ``prev_col``,
    per key — the forward-looking sibling of ``asof_join``'s union +
    running-window trick (``operators/joins.py``): tag both sides, sort
    each key DESCENDING by time, and take the running ``min`` of step
    times over the PRECEDING frame. At equal times the anchor sorts
    first (side desc), so an equal-time step event stays outside the
    frame — that is exactly the strict ``>``. One shuffle on the key,
    no join explosion.
    """
    t, side = "__cep_t", "__cep_side"
    a = anchors.withColumn(t, F.col(prev_col)).withColumn(side, F.lit(1))
    s = step.withColumnRenamed("__step_t", t).withColumn(side, F.lit(0))
    merged = a.unionByName(s, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(t).desc(), F.col(side).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = merged.withColumn(
        out_col,
        F.min(F.when(F.col(side) == 0, F.col(t))).over(w),
    )
    return filled.filter(F.col(side) == 1).drop(t, side)
