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

**Scale note (round 6):** the raw mode costs one Arrow round-trip + one
Python invocation PER KEY (BASELINE.md measured 23 s at 15 k raw keys,
1× data) — linear in key cardinality. Pass ``buckets=n`` to hash keys
into ``n`` buckets first: Spark-level group calls drop from #keys to
``n`` (the per-key user function still runs per key, but inside one
Arrow batch, as plain pandas slicing), making the safe shape the
default path on high-cardinality corpora. Semantics are identical —
per-key outer groups, deterministic ``xxhash64`` bucketing, keys
iterated in sorted order inside each bucket.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__cg_bucket"


def _schema_names(schema: str) -> list[str]:
    """Column names from a DDL string — bracket-aware so nested types
    (``map<string,int>``, ``struct<a:int,b:int>``, ``decimal(10,2)``)
    don't split on their inner commas (review r6 finding #5)."""
    names, depth, start = [], 0, 0
    for i, ch in enumerate(schema + ","):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            field = schema[start:i].strip()
            if field:
                names.append(field.split()[0].strip("`"))
            start = i + 1
    return names


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str,
    buckets: int | None = None,
) -> DataFrame:
    """Apply ``fn(left_group, right_group) -> pdf`` per key.

    ``fn`` receives each side's rows for the key (possibly empty — keys
    present on only one side still fire, matching Flink's CoGroupFunction
    over outer groups). Output must match ``schema`` (DDL string). One
    hash shuffle per input on ``keys``; per-key groups must fit a
    worker's memory — the same bound Flink's coGroup has, since both
    buffer whole groups.

    ``buckets=n`` bounds the number of Spark-level Python/Arrow calls to
    ``n`` regardless of key cardinality (see module scale note): keys
    are hashed into buckets with ``xxhash64`` and ``fn`` is invoked per
    key INSIDE each bucket batch. With buckets, a whole bucket's groups
    must fit in memory — size ``n`` so #keys/n groups fit, the usual
    sweet spot being a few × the cluster's task slots.
    """
    if buckets is None:
        return (
            left.groupBy(*keys)
            .cogroup(right.groupBy(*keys))
            .applyInPandas(fn, schema)
        )
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")

    bexpr = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(buckets))
    lb = left.withColumn(_BUCKET, bexpr)
    rb = right.withColumn(_BUCKET, bexpr)
    out_names = _schema_names(schema)

    def bucket_fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.drop(columns=[_BUCKET])
        rpdf = rpdf.drop(columns=[_BUCKET])
        def normkey(k):
            """NaN/NaT group keys normalize to None so the SAME null key
            from both sides lands in ONE fn call — NaN != NaN would
            otherwise split the group into two half-calls, diverging
            from the raw cogroup path (review r6 finding #2)."""
            parts = k if isinstance(k, tuple) else (k,)
            return tuple(
                None if (p is None or p != p) else p for p in parts
            )

        lg = (
            {normkey(k): g
             for k, g in lpdf.groupby(keys, sort=False, dropna=False)}
            if len(lpdf) else {}
        )
        rg = (
            {normkey(k): g
             for k, g in rpdf.groupby(keys, sort=False, dropna=False)}
            if len(rpdf) else {}
        )
        l_empty = lpdf.iloc[0:0]
        r_empty = rpdf.iloc[0:0]

        def korder(k):  # deterministic even with None/mixed keys
            return [repr(p) for p in k]

        outs = []
        for k in sorted(lg.keys() | rg.keys(), key=korder):
            res = fn(lg.get(k, l_empty), rg.get(k, r_empty))
            if res is not None and len(res):
                outs.append(res)
        if not outs:
            # object dtype, not pandas' default float64 for empty
            # columns — Arrow's NumPyConverter can't turn a float64
            # ndarray into map/struct types, object columns it can
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in out_names}
            )
        return pd.concat(outs, ignore_index=True)

    return (
        lb.groupBy(_BUCKET)
        .cogroup(rb.groupBy(_BUCKET))
        .applyInPandas(bucket_fn, schema)
    )
