"""Multi-dimensional data layout — Z-order (Morton) clustering for
data-skipping at rest.

The 100 TB problem this solves: parquet row-group pruning works off
per-file min/max statistics, and a table sorted by ONE column has tight
stats on that column only — every query filtering on a second dimension
scans everything. Interleaving the bits of several rank-normalized
columns (the Morton curve) gives every clustered column a bounded
min/max span per file, so selective filters on ANY of them prune (the
same layout Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order
z-ordering produce; Morton 1966).

Spark-first shape: the z-value is a pure Catalyst expression (bit
arithmetic over normalized longs — whole-stage codegen, no UDF), the
clustering is one ``repartitionByRange`` + ``sortWithinPartitions`` on
it (one range-exchange, the same cost as any global sort), and the
normalization bounds come from ONE tiny min/max aggregate (O(cols)
driver result, never row data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_value",
    "with_zorder",
    "zorder_repartition",
    "write_with_stats",
    "read_manifest",
    "pruned_read",
]

#: Overflow guard: normalization computes (v - min) * 2^bits, which must
#: stay inside int64 — (max - min) * 2^bits < 2^63.
_INT64_MAX = (1 << 63) - 1


def zorder_value(
    cols: list[str],
    mins: dict[str, int],
    maxs: dict[str, int],
    bits: int = 16,
) -> Column:
    """The Morton z-value expression for integer-valued columns with
    KNOWN global bounds: each column rank-normalizes to ``[0, 2^bits)``
    by integer arithmetic (``(v - min) * 2^bits div (max - min + 1)`` —
    exact, engine-portable, no float rounding), then bit ``i`` of
    column ``c`` lands at z-bit ``i * n_cols + c`` (little-endian
    interleave). NULLs normalize to slot 0 (they cluster together at
    the curve's origin).

    Pure Catalyst bit arithmetic — ``bits × n_cols`` shift/mask terms,
    all inside whole-stage codegen."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) must fit in a signed long, got "
            f"{bits}*{len(cols)}"
        )
    n = len(cols)
    norm: list[Column] = []
    for c in cols:
        lo, hi = int(mins[c]), int(maxs[c])
        if hi < lo:
            raise ValueError(f"max < min for column {c!r}")
        if (hi - lo) > _INT64_MAX >> bits:
            raise ValueError(
                f"range of {c!r} too wide for bits={bits} (overflow); "
                "pre-scale the column (e.g. epoch days, not micros)"
            )
        span = hi - lo + 1
        # `div` = exact integer division (the `/` operator is FLOAT
        # division in Spark SQL and would round for wide ranges)
        norm.append(
            F.expr(
                f"(coalesce(cast(`{c}` as bigint), {lo}) - {lo}) "
                f"* {1 << bits} div {span}"
            )
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, v in enumerate(norm):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), i * n + ci)
            )
    return z


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zvalue",
) -> DataFrame:
    """Attach the z-value with bounds computed from the data: one
    min/max aggregate (a scan producing O(cols) numbers at the driver —
    the only collect, and it is size-bounded by the column count)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"__max_{c}"))
    row = df.agg(*aggs).collect()[0]
    mins = {c: row[f"__min_{c}"] for c in cols}
    maxs = {c: row[f"__max_{c}"] for c in cols}
    for c in cols:
        if mins[c] is None:
            raise ValueError(f"column {c!r} is all-NULL; cannot z-order")
    return df.withColumn(out_col, zorder_value(cols, mins, maxs, bits))


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """OPTIMIZE ZORDER analogue: cluster the frame along the Morton
    curve of ``cols`` — range-partition on the z-value, sort within
    partitions, drop the helper column. Writing the result gives every
    file a bounded min/max span on EVERY clustered column (the
    data-skipping contract; asserted quantitatively in
    ``tests/test_scale.py``).

    One range exchange (sampled boundaries — the standard Spark global
    sort machinery, skew-tolerant because z-values are near-uniform
    when the inputs are)."""
    zdf = with_zorder(df, cols, bits, out_col="__zorder")
    parts = num_partitions or zdf.rdd.getNumPartitions()
    return (
        zdf.repartitionByRange(parts, F.col("__zorder"))
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )


def write_with_stats(
    df: DataFrame, path: str, stat_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write parquet AND a per-file min/max manifest over ``stat_cols``
    — the data-skipping half of the Delta/Iceberg table format, enough
    to make the Z-order layout's payoff consumable at query time.

    The manifest (``{path}/_manifest``) is computed DISTRIBUTED: one
    columnar re-scan of the written files grouped by
    ``input_file_name()`` — O(files) output rows, no driver loop over
    footers. At 100 TB the manifest is the only thing a planner reads
    before deciding which files to open."""
    if not stat_cols:
        raise ValueError("stat_cols must be non-empty")
    df.write.mode(mode).parquet(path)
    spark = df.sparkSession
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    manifest = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), *stat_cols)
        .groupBy("file")
        .agg(*aggs)
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")


def read_manifest(spark, path: str) -> DataFrame:
    """The per-file stats manifest written by :func:`write_with_stats`."""
    return spark.read.parquet(f"{path}/_manifest")


def pruned_read(
    spark, path: str, ranges: dict[str, tuple], report: dict | None = None
) -> DataFrame:
    """Read only the files whose manifest [min, max] span INTERSECTS
    every requested range — file-level skipping on top of parquet's
    row-group pruning (which still applies inside the kept files).

    ``ranges`` maps column → ``(lo, hi)`` inclusive bounds (``None`` for
    open ends). The predicate itself is ALSO applied to the kept rows —
    pruning is a performance decision, never a correctness one (pinned:
    pruned == plain filtered read). Pass a dict as ``report`` to
    receive ``{"files_total": n, "files_kept": m}`` — the skip rate a
    Z-ordered layout earns on EVERY clustered column vs a single-column
    sort's one (measured in tests/test_scale.py).

    Driver cost: the manifest collect is O(files kept + dropped) paths —
    the same listing the reader does anyway; row data never reaches the
    driver."""
    man = read_manifest(spark, path)
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if f"{c}__min" not in man.columns:
            raise ValueError(f"column {c!r} not in manifest")
        if hi is not None:
            cond = cond & (F.col(f"{c}__min") <= F.lit(hi))
        if lo is not None:
            cond = cond & (F.col(f"{c}__max") >= F.lit(lo))
    total = man.count()
    kept = [r.file for r in man.filter(cond).select("file").collect()]
    if report is not None:
        report["files_total"] = total
        report["files_kept"] = len(kept)
    row_cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            row_cond = row_cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            row_cond = row_cond & (F.col(c) <= F.lit(hi))
    if not kept:
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*kept).filter(row_cond)
