"""Plan introspection helpers.

The reference's three-level plan IR (StreamGraph → JobGraph →
ExecutionGraph, ``flink_arch-StreamGraph-JobGraph-ExecutorGraph生成
过程.png``) is Catalyst's analyzed → optimized → physical plan in Spark
(SURVEY.md §1.1, §3.1). These helpers make the physical plan assertable
in tests so scale properties (pushdown, broadcast, codegen) are enforced,
not hoped for.
"""

from flink_note_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "scan_columns",
    "shuffle_count",
]
