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
