"""Query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``bench.py``, and the pytest
differential suite.

``QUERIES[name](spark, sf_dir) -> DataFrame``; ``ORACLES[name]`` is the
DuckDB-runnable ANSI SQL with identical column aliases. Names missing
from ``ORACLES`` are non-SQL-expressible ops (driver does rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_note_spark.queries import events, extended, llm, relational

_ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **relational.QUERIES,
    **events.QUERIES,
    **llm.QUERIES,
    **extended.QUERIES,
}


def _window_rotation(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Rotate the registry so the driver's bounded CORRECTNESS window
    (first 50 entries of ``queries()``) always covers the queries with
    the STALEST driver verification.

    The registry outgrew the driver's 50-entry window in round 5 (79
    queries, 29 never driver-checked — VERDICT r5 "What's wrong" #2).
    Policy (documented in SURVEY.md §2.2.1): order queries by the most
    recent committed ``CORRECTNESS_r*.json`` — entries ABSENT from it
    (new this round, or rotated out last round) come first, entries
    present come last, each group keeping stable module order. Under
    this policy every query is driver-verified at least every other
    round as long as the registry stays under 100 entries.

    Falls back to natural module order when no CORRECTNESS file is
    found (fresh checkout outside the driver harness).
    """
    import glob
    import json
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        return dict(queries)
    try:
        with open(files[-1]) as f:
            checked = set(json.load(f))
    except (OSError, ValueError):
        return dict(queries)
    stale = {n: q for n, q in queries.items() if n not in checked}
    fresh = {n: q for n, q in queries.items() if n in checked}
    return {**stale, **fresh}


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = (
    _window_rotation(_ALL_QUERIES)
)

ORACLES: dict[str, str] = {
    **relational.ORACLES,
    **events.ORACLES,
    **llm.ORACLES,
    **extended.ORACLES,
}

assert set(ORACLES) <= set(QUERIES), "oracle without a query implementation"

__all__ = ["QUERIES", "ORACLES"]
