"""Physical-plan assertions (SURVEY.md "optimize for scale" contract).

Usage in tests::

    assert has_broadcast_join(df)          # small dim actually broadcast
    assert "l_shipdate" in pushed_filters(df)   # filter reached the scan
    assert shuffle_count(df) <= 2          # no accidental extra exchange
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (Spark only prints it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"\bExchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_str(df, "simple")
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause(s) of file scans, concatenated."""
    plan = explain_str(df, "formatted")
    return " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))


def scan_columns(df: DataFrame) -> str:
    """ReadSchema clause(s) — verify column pruning reached the scan."""
    plan = explain_str(df, "formatted")
    return " ".join(re.findall(r"ReadSchema: [^\n]*", plan))
