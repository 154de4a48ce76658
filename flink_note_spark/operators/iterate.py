"""Bounded iteration — the Flink ``iterate()`` analogue.

Flink v1.12's DataStream/DataSet surface (the family the reference
notes trace — ``ExecutionEnviromentreadTextFile创建DataSource分析.md``'s
``DataStream { ... }`` members; SURVEY.md §2.1) includes
``iterate()``: feed an operator's output back as its input until a
termination criterion fires. Spark has no cyclic dataflow — the
idiomatic rendering is a DRIVER LOOP over materialized frames, which is
exactly how this repo's concrete iterative operators already run
(large-star/small-star connected components, Lloyd k-means for
IVF/PQ). This module extracts that pattern as a reusable combinator so
a user can port a Flink iterate() job without re-deriving the three
load-bearing details:

1. **Materialize every iteration** (eager ``localCheckpoint``): without
   it the lineage doubles per round and Catalyst's analysis/codegen
   time explodes LONG before the data does (the components operator's
   round-2 lesson). Blocks are ContextCleaner-owned — freed on GC, no
   ``unpersist()`` lifetime to manage.
2. **Convergence as a CHEAP aggregate, not a diff join**: the default
   criterion is a multiset checksum — group by every column with a
   ``count(*)`` multiplicity, then (group count, order-insensitive
   ``bit_xor`` of ``xxhash64(all columns, multiplicity)``) — two
   map-side-combinable aggs per round, O(1) driver rows. Hashing the
   multiplicity is load-bearing: a plain row-level ``bit_xor`` lets
   identical rows XOR-cancel, so a step whose changes are confined to
   even-multiplicity row groups ({A,A,B} -> {C,C,B}) would falsely
   read as a fixpoint. With multiplicity folded in, false positives
   need a 64-bit collision across distinct (row, count) groups
   (≈2⁻⁶⁴ per round); pass ``converged=`` for exact or
   domain-specific checks.
3. **A hard ``max_iters`` bound**: Flink's iterate() requires one too
   (``closeWith`` + maxIterations) — unbounded fixpoints are a job bug,
   not a feature.

At 100 TB each round is a normal distributed job; only the checksum
row reaches the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checksum(df: DataFrame) -> tuple[int, int]:
    # Multiset-sound: fold each distinct row's multiplicity into the
    # hash so duplicate rows cannot XOR-cancel (see module docstring).
    grouped = df.groupBy(*df.columns).agg(F.count(F.lit(1)).alias("__mult"))
    row = grouped.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(*df.columns, F.col("__mult"))), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def iterate(
    df: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iters: int,
    converged: Callable[[DataFrame, DataFrame], bool] | None = None,
) -> DataFrame:
    """Apply ``step(frame, i) -> frame`` until a fixpoint or
    ``max_iters`` rounds (Flink ``iterate().closeWith(...)``).

    ``step`` receives the previous round's MATERIALIZED frame and the
    0-based round index, and must return a frame with the same schema
    (checked — a schema drift would make the checksum comparison
    meaningless and is a porting bug worth failing loudly on).

    ``converged(prev, cur) -> bool`` overrides the default
    checksum-equality criterion; it runs AFTER each round on
    materialized frames, so whatever it computes costs real jobs —
    keep it aggregate-shaped.

    Returns the final materialized frame. ``max_iters == 0`` returns
    the (materialized) input unchanged.
    """
    if max_iters < 0:
        raise ValueError(f"max_iters must be >= 0, got {max_iters}")
    cur = df.localCheckpoint(eager=True)
    if max_iters == 0:
        return cur
    prev_sum = _checksum(cur) if converged is None else None
    for i in range(max_iters):
        nxt = step(cur, i)
        if nxt.schema != cur.schema:
            raise ValueError(
                "iterate: step changed the schema at round "
                f"{i}: {cur.schema.simpleString()} -> "
                f"{nxt.schema.simpleString()}"
            )
        nxt = nxt.localCheckpoint(eager=True)
        if converged is not None:
            if converged(cur, nxt):
                return nxt
        else:
            nxt_sum = _checksum(nxt)
            if nxt_sum == prev_sum:
                return nxt
            prev_sum = nxt_sum
        cur = nxt
    return cur
