"""Shared execution-shape helpers for Python-stage operators.

Originally grew inside ``operators/dedup.py``; every operator family
with an Arrow/pandas stage (dedup, similarity, packing) needs the same
two moves, so they live here (VERDICT r4 task 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _spread_for_python_stage(df: DataFrame) -> DataFrame:
    """Give the Arrow/pandas-UDF stage real parallelism. A parquet file
    with one row group scans as ONE task, which funnels the whole corpus
    through a single Python worker — measured as the dominant (and
    bimodal, when the task lands on a cold fork) cost of the SimHash and
    shingling stages at sf0.1. Only repartitions when the input has
    fewer partitions than the cluster has slots: at real scale the scan
    already carries thousands of partitions and this is a no-op, so no
    gratuitous full shuffle is added to a 100 TB run.

    A plan that already contains an Exchange is returned UNTOUCHED, for
    two reasons: its post-shuffle side arrives with
    ``spark.sql.shuffle.partitions`` partitions (and AQE's
    ``parallelismFirst`` coalescing keeps parallelism around the default
    parallelism), and — the sharp edge — probing ``.rdd`` on an adaptive
    plan forces ``getFinalPhysicalPlan()``, which EXECUTES the shuffle
    stages at plan-construction time; the upstream shuffle would then
    run twice (once for the probe, once in the real job). The static
    ``sparkPlan`` string inspection below costs analysis only; the
    ``.rdd`` partition probe is reached only for scan-shaped plans,
    where it is a plan conversion with no stages to materialize."""
    spark = df.sparkSession
    target = min(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    if "Exchange" in df._jdf.queryExecution().sparkPlan().toString():
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _computed_once(df: DataFrame) -> DataFrame:
    """Compute an intermediate frame exactly once and back it with
    executor-stored blocks (eager ``localCheckpoint``): every downstream
    plan branch (self-join sides, size lookups, verification joins) reads
    the blocks instead of re-running the lineage. Unlike ``persist()``
    this registers nothing in the CacheManager — the blocks are
    ContextCleaner-owned and free when the frame is GC'd — so nothing
    outlives the operator and there is no ``unpersist()`` lifetime to
    manage (ADVICE r2 #3). The operator's OUTPUT stays lazy: the caller's
    action pays for the final joins once, with no extra materialization
    pass."""
    return df.localCheckpoint(eager=True)
