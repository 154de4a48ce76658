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

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **relational.QUERIES,
    **events.QUERIES,
    **llm.QUERIES,
    **extended.QUERIES,
}

ORACLES: dict[str, str] = {
    **relational.ORACLES,
    **events.ORACLES,
    **llm.ORACLES,
    **extended.ORACLES,
}

assert set(ORACLES) <= set(QUERIES), "oracle without a query implementation"

__all__ = ["QUERIES", "ORACLES"]
