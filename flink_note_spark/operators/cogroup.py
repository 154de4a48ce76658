"""Co-group: Flink's ``coGroup`` (and the keyed half of ``connect``)
rendered on PySpark's grouped co-processing API.

Flink v1.12's DataStream/DataSet surface (whose class the notes trace —
``ExecutionEnviromentreadTextFile创建DataSource分析.md:29-32``, the
``DataStream { join(), transform() }`` family) includes ``coGroup``:
for each key, hand BOTH sides' full groups to a user function — strictly
more general than a join, which only sees pairwise combinations.

Spark's native rendering is ``df1.groupBy(k).cogroup(df2.groupBy(k))
.applyInPandas(fn, schema)``: each side's rows for a key arrive as one
pandas DataFrame (empty when the key is absent from that side — Flink's
outer co-group semantics), Arrow-batched per group, shuffled once per
side on the key. The thin wrapper here fixes the contract (key columns,
DDL schema) and documents the scale shape; anything expressible as a
join or aggregate should stay a join or aggregate (codegen beats Python
per-group), so reach for co-group only when the per-key logic is
genuinely procedural over both whole groups.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Apply ``fn(left_group, right_group) -> pdf`` per key.

    ``fn`` receives each side's rows for the key (possibly empty — keys
    present on only one side still fire, matching Flink's CoGroupFunction
    over outer groups). Output must match ``schema`` (DDL string). One
    hash shuffle per input on ``keys``; per-key groups must fit a
    worker's memory — the same bound Flink's coGroup has, since both
    buffer whole groups.
    """
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(fn, schema)
    )
