"""Sequence packing: group documents into token-budget bins for LLM
training batches.

Training consumes fixed-size context windows; feeding one short document
per window wastes most of the tokens. Packing assigns documents to bins
whose token totals approach the budget. Optimal bin packing is NP-hard
and needs global coordination — at 100 TB the correct trade is
best-fit-decreasing WITHIN each partition: embarrassingly parallel (no
shuffle beyond an optional spread), deterministic for a fixed
partitioning, and BFD shares FFD's classic asymptotic guarantee
(≤ 11/9·OPT + O(1) bins per partition), bounding the waste. Cross-
partition waste is at most one underfull bin per partition — negligible
when partitions hold thousands of documents.

North-star addition (SURVEY.md §2.2); no analogue in the reference
notes' surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_note_spark.operators.runtime import _spread_for_python_stage


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 4096,
    spread: bool = True,
) -> DataFrame:
    """Assign each document to a bin with sum(tokens) ≤ ``budget``.

    Output: ``(id_col, tokens_col, bin_id, oversize)``. ``bin_id`` is
    globally unique (partition id in the high 32 bits, local bin index
    in the low 32). Documents with more tokens than the budget get a
    bin of their own with ``oversize = true`` — the caller decides
    whether to truncate or drop; silently splitting them here would
    invent semantics the trainer may not want.

    Each partition is packed independently with best-fit-decreasing:
    sort its documents by descending token count (done JVM-side with
    ``sortWithinPartitions`` so the Python stage only walks presorted
    Arrow batches), then place each document into the tightest open bin
    that fits (``bisect`` over a capacity-sorted list → O(n log bins)
    per partition, vs first-fit's O(n·bins) scan). The per-partition
    memory is two ints per open bin plus the partition's rows — bounded
    by partition sizing, which Spark already controls via
    ``spark.sql.files.maxPartitionBytes``.

    Determinism: for a fixed partitioning the result is a pure function
    of the data (ties broken by id). Callers wanting cross-run stability
    should pre-``repartition(n, id_col)`` so the partition assignment
    itself is hash-determined rather than split-determined.

    Parallelism: a single-row-group parquet input scans as ONE task, so
    the input is routed through ``_spread_for_python_stage`` first —
    already-parallel (or already-shuffled) inputs pass through untouched
    and the plan stays shuffle-free (both shapes asserted in
    tests/test_packing.py). Pass ``spread=False`` to pack exactly the
    input's partitioning (e.g. a deliberate ``coalesce(1)`` for one
    globally-packed bin set). Rows with NULL or negative token counts
    are rejected with an explicit error: a NULL would otherwise surface
    as a NaN-cast crash deep in the pandas stage, and a negative count
    silently INFLATES bin capacity (ADVICE r4).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    src = df.select(id_col, tokens_col)
    if spread:
        src = _spread_for_python_stage(src)
    src = src.sortWithinPartitions(
        F.col(tokens_col).desc(), F.col(id_col).asc()
    )
    out_schema = (
        f"{id_col} {dict(df.dtypes)[id_col]}, "
        f"{tokens_col} {dict(df.dtypes)[tokens_col]}, "
        "bin_id long, oversize boolean"
    )

    def packer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bisect import bisect_left, insort

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid << 32
        # Open bins as (remaining_capacity, local_bin_id) kept sorted by
        # capacity; bisect finds the TIGHTEST bin that still fits.
        open_bins: list[tuple[int, int]] = []
        n_bins = 0
        for pdf in batches:
            ids = pdf[id_col]
            toks = pdf[tokens_col]
            if toks.isnull().any():
                bad = ids[toks.isnull()].head(3).tolist()
                raise ValueError(
                    f"pack_sequences: NULL {tokens_col!r} for "
                    f"{id_col}={bad} — filter or impute token counts "
                    "before packing"
                )
            if (toks < 0).any():
                bad = ids[toks < 0].head(3).tolist()
                raise ValueError(
                    f"pack_sequences: negative {tokens_col!r} for "
                    f"{id_col}={bad} — negative counts would inflate "
                    "bin capacity"
                )
            bin_ids = []
            oversize = []
            for t in toks:
                t = int(t)
                if t > budget:
                    bin_ids.append(base + n_bins)  # closed solo bin
                    n_bins += 1
                    oversize.append(True)
                    continue
                i = bisect_left(open_bins, (t, -1))
                if i < len(open_bins):
                    cap, b = open_bins.pop(i)
                    if cap > t:
                        insort(open_bins, (cap - t, b))
                    bin_ids.append(base + b)
                else:
                    open_bins_entry = (budget - t, n_bins)
                    if open_bins_entry[0] > 0:
                        insort(open_bins, open_bins_entry)
                    bin_ids.append(base + n_bins)
                    n_bins += 1
                oversize.append(False)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    tokens_col: toks,
                    "bin_id": pd.Series(bin_ids, dtype="int64"),
                    "oversize": pd.Series(oversize, dtype="bool"),
                }
            )

    return src.mapInPandas(packer, out_schema)


def packing_stats(packed: DataFrame, tokens_col: str = "n_tokens", budget: int = 4096) -> DataFrame:
    """One-row utilization summary of a :func:`pack_sequences` result:
    bins, docs, token fill ratio over non-oversize bins."""
    per_bin = packed.groupBy("bin_id").agg(
        F.sum(tokens_col).alias("bin_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.max(F.col("oversize").cast("int")).alias("oversize"),
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.round(
            F.avg(F.when(F.col("oversize") == 0, F.col("bin_tokens") / budget)), 4
        ).alias("fill_ratio"),
    )
