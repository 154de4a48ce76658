"""Join operators beyond plain equi-joins.

The reference names ``join()`` on DataStream (``ExecutionEnviroment
readTextFile创建DataSource分析.md:29-32``); equi/semi/anti/outer joins map
1:1 onto ``df.join`` and Catalyst picks broadcast-hash / shuffled-hash /
sort-merge (SURVEY.md §2.2 "Joins"). This module adds the two join shapes
Spark has no single builtin for: as-of joins and range joins.

Scale posture: both operators keep an equi-key prefix so the physical
plan is a hash/sort-merge join on the key, never a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Event-time as-of join: for each left row, attach the latest right
    row with ``right_time <= left_time`` (direction='backward') or the
    earliest with ``right_time >= left_time`` ('forward'), per ``on`` key.

    Implementation (SURVEY.md §2.2 "As-of"): union both sides tagged, then
    a single ``last(..., ignorenulls=True)`` running window per key ordered
    by time. One shuffle on the key, no join explosion, no per-row Python —
    this survives 100 TB because state per key is O(1) within the window
    frame and skew is just a hot key in one sort.

    ``right_cols`` defaults to all non-key, non-time right columns; they
    appear on the output with their own names (left schema is preserved).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    rcols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    clash = set(rcols) & set(left.columns)
    if clash:
        # unionByName would merge same-named columns, silently feeding
        # left-side values into the last(..., ignorenulls) fill — refuse
        # instead of corrupting (rename on the right before calling).
        raise ValueError(
            f"asof_join: right_cols {sorted(clash)} collide with left columns; "
            "rename them on the right side first"
        )
    t = "__asof_t"
    side = "__asof_side"

    rsel = [on, right_time] + [c for c in rcols if c not in (on, right_time)]
    lt = left.withColumn(t, F.col(left_time)).withColumn(side, F.lit(1))
    rt = (
        right.select(*rsel)
        .withColumn(t, F.col(right_time))
        .withColumn(side, F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows at equal t, so an exact
        # timestamp match is visible to the left row.
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(t).asc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = merged.select(
            "*", *[F.last(c, ignorenulls=True).over(w).alias(f"__v_{c}") for c in rcols]
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(t).desc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = merged.select(
            "*", *[F.last(c, ignorenulls=True).over(w).alias(f"__v_{c}") for c in rcols]
        )

    out = filled.filter(F.col(side) == 1)
    for c in rcols:
        out = out.drop(c).withColumnRenamed(f"__v_{c}", c)
    return out.drop(t, side)


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    lo: Column,
    hi: Column,
) -> DataFrame:
    """Equi-prefixed range join: ``equi AND lo AND hi``.

    Keeping the equality conjunct first lets Catalyst plan a hash or
    sort-merge join on the equi key with the range bounds as residual
    filters — the 100 TB-safe shape (SURVEY.md §2.2 "Range/interval join").
    A pure range condition with no equi key would degrade to
    BroadcastNestedLoopJoin; callers who need that must opt in explicitly
    via :func:`theta_join`.
    """
    return left.join(right, equi & lo & hi)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Flink DataStream ``intervalJoin`` (r8) —
    ``a.keyBy(k).intervalJoin(b.keyBy(k)).between(lower, upper)``:
    pair rows sharing ``on`` where
    ``right_time ∈ [left_time + lower, left_time + upper]`` (both
    bounds INCLUSIVE, Flink's default). A thin Flink-signature facade
    over :func:`range_join` — the equi key keeps the plan a hash/SMJ
    join with the interval as residual conjuncts (the 100 TB-safe
    shape). ``lower``/``upper`` are interval strings; negative bounds
    spell as e.g. ``"-1 hour"`` → ``- INTERVAL 1 hour``."""

    def _ivl(s: str) -> Column:
        s = s.strip()
        if s.startswith("-"):
            return -F.expr(f"INTERVAL {s[1:].strip()}")
        return F.expr(f"INTERVAL {s}")

    lo = F.col(right_time) >= F.col(left_time) + _ivl(lower)
    hi = F.col(right_time) <= F.col(left_time) + _ivl(upper)
    return left.join(
        right, (left[on] == right[on]) & lo & hi, how
    ).drop(right[on])


def theta_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    max_right_rows: int | None = 100_000,
) -> DataFrame:
    """Explicit opt-in theta (arbitrary-predicate) join.

    With no equality conjunct Spark can only plan a nested-loop join:
    the right side is broadcast and every left row evaluates the
    predicate against it — O(|L|·|R|) by nature. That is fine when the
    right side is genuinely small and catastrophic otherwise, so this
    wrapper (a) exists to make the choice visible at call sites, and
    (b) refuses right sides above ``max_right_rows`` (pass ``None`` to
    disable the guard) instead of silently melting a 100 TB cluster.
    """
    if max_right_rows is not None:
        n = right.limit(max_right_rows + 1).count()
        if n > max_right_rows:
            raise ValueError(
                f"theta_join: right side has >{max_right_rows} rows; a "
                "nested-loop join at this size is a plan error — add an "
                "equality conjunct (range_join) or pass max_right_rows=None"
            )
    from pyspark.sql.functions import broadcast

    return left.join(broadcast(right), condition, how)


def temporal_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_time: str,
    valid_from: str,
    dim_cols: list[str] | None = None,
    how: str = "inner",
    strategy: str = "union_window",
) -> DataFrame:
    """Temporal / versioned table join — Flink SQL's ``JOIN dim FOR
    SYSTEM_TIME AS OF fact.ts`` against a changelog-backed dimension:
    each ``dim`` row is a VERSION effective from ``valid_from`` until
    the same key's next version; every fact row joins the version in
    effect at its event time (latest ``valid_from <= fact_time`` per
    key). ``how='inner'`` drops facts with no version yet (Flink's
    event-time temporal join), ``'left'`` keeps them with NULLs.

    Two physical strategies, both key-partitioned, never cartesian:

    - ``'union_window'`` (default): tag-union both sides and take a
      running ``last(..., ignorenulls)`` per key ordered by (time,
      side) — :func:`asof_join`'s kernel. ONE shuffle on the key, no
      join fan-out, O(1) state per row; the right default at 100 TB
      where a hot entity may have thousands of versions. Batch-only
      (window over an unbounded frame).
    - ``'interval'``: derive half-open validity intervals
      (``valid_to = lead(valid_from)``) once on the dimension, then a
      plain key equi-join with the interval containment as residual
      filter. Fan-out = versions-per-key before the filter, but the
      plan is a hash join on the key (broadcastable when the dim is
      small) and — unlike the window form — STREAM-STATIC compatible:
      use it under ``foreachBatch``/stream-static joins as the
      streaming rendering of ``FOR SYSTEM_TIME AS OF`` (the interval
      table is a snapshot; rebuild it per batch for a slowly-changing
      dim).

    ``dim_cols`` defaults to all non-key, non-time dimension columns;
    names must not collide with fact columns (rename first), same
    contract as :func:`asof_join`.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if strategy not in ("union_window", "interval"):
        raise ValueError(
            f"strategy must be union_window|interval, got {strategy!r}"
        )
    dcols = dim_cols or [
        c for c in dim.columns if c not in (on, valid_from)
    ]
    clash = set(dcols) & set(fact.columns)
    if clash:
        raise ValueError(
            f"temporal_join: dim_cols {sorted(clash)} collide with fact "
            "columns; rename them on the dimension first"
        )

    if strategy == "union_window":
        if fact.isStreaming:
            raise ValueError(
                "union_window is batch-only (unbounded window frame); "
                "use strategy='interval' for the stream-static "
                "rendering of FOR SYSTEM_TIME AS OF"
            )
        if how == "left":
            out = asof_join(
                fact, dim, on, fact_time, valid_from, right_cols=dcols,
                direction="backward",
            )
        else:
            # inner: a NULL-valued version row is indistinguishable
            # from "no version yet" in the filled columns — carry the
            # version time itself to decide matched-ness
            out = (
                asof_join(
                    fact, dim.withColumn("__vt", F.col(valid_from)),
                    on, fact_time, valid_from,
                    right_cols=dcols + ["__vt"], direction="backward",
                )
                .filter(F.col("__vt").isNotNull())
                .drop("__vt")
            )
        # asof_join's tag-union leaves the dimension's time column in
        # the output when its name differs from the fact's — the
        # output contract is fact columns + dim_cols only
        if valid_from != fact_time and valid_from not in fact.columns:
            out = out.drop(valid_from)
        return out

    w = Window.partitionBy(on).orderBy(F.col(valid_from).asc())
    d = dim.select(on, valid_from, *dcols).withColumn(
        "__valid_to", F.lead(valid_from).over(w)
    )
    f = fact
    cond = (
        (f[on] == d[on])
        & (f[fact_time] >= d[valid_from])
        & (d["__valid_to"].isNull() | (f[fact_time] < d["__valid_to"]))
    )
    joined = f.join(d, cond, how)
    # drop the dimension's duplicated key/time bookkeeping columns
    return joined.select(
        *[f[c] for c in fact.columns], *[d[c] for c in dcols]
    )


def window_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    window: str,
    how: str = "inner",
    window_col: str = "window",
) -> DataFrame:
    """Flink DataStream window join (r7) — ``left.join(right)
    .where(key).equalTo(key).window(TumblingEventTimeWindows.of(...))``:
    rows pair when they share the key AND fall in the same tumbling
    event-time window. Spark-first rendering: attach ``F.window`` to
    both sides and equi-join on (key, window) — a plain hash/sort-merge
    join on a compound key, never a range or cross join, so it scales
    like any co-partitioned equi-join. The window struct survives as
    ``window_col`` (start/end) on the output.

    Works batch and STREAMING (Spark's stream-stream join accepts
    window-equality conjuncts and derives state eviction from the
    watermarks — attach ``withWatermark`` on both inputs first).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lw = left.withColumn(window_col, F.window(left_ts, window))
    r_win = "__rw_" + window_col
    rw = right.withColumn(r_win, F.window(right_ts, window))
    cond = (lw[window_col] == rw[r_win])
    for k in keys:
        cond = cond & (lw[k] == rw[k])
    joined = lw.join(rw, cond, how)
    drop = [rw[k] for k in keys]
    out = joined.drop(rw[r_win])
    for c in drop:
        out = out.drop(c)
    return out
