"""Sampling operators for training-data pipelines: deterministic splits,
stratified sampling, per-key reservoirs, and source-mixture sampling.

A 100 TB corpus is never consumed whole: it is split (train/val/test),
rebalanced across sources, and down-sampled per stratum. Doing that
reproducibly at scale means NO ``rand()`` in the row path — Spark's
``rand(seed)`` draws depend on partition id and intra-partition row
order, so the "same" sample changes whenever file splits or AQE
coalescing change. Every operator here keys its randomness off
``xxhash64(id, seed)`` instead: the decision for a row is a pure
function of the row's identity, stable across cluster sizes, partition
layouts and reruns, and needs no shuffle to evaluate (the split/sample
predicates are narrow, codegen'd column expressions that combine with
scan pushdown).

Reference anchor: the notes' runtime has no sampling surface — these
are north-star additions (SURVEY.md §2.2, LLM-pipeline operators).

NULL ids: ``xxhash64(NULL, seed)`` is a constant, so every NULL-id row
lands in the same split/sample decision. Ids are expected non-null
(they are the corpus primary key); run ``exact_dedup`` or filter NULLs
upstream if that does not hold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Granularity of the deterministic [0, 1) bucket grid. One in a
#: billion — fraction rounding error is at most 1e-9 per row.
_BUCKETS = 1_000_000_000


def _unit_hash(
    id_col: str | Column, seed: int, hash_fn: str = "xxhash64"
) -> Column:
    """Deterministic value in [0, 1) from a row id — the reproducible
    stand-in for ``rand()``.

    ``hash_fn="md5"`` derives the unit value from the first 15 hex
    chars (60 bits) of ``md5("<id>:<seed>")`` instead of ``xxhash64``.
    It is slower (string round-trip, no codegen long path) but PORTABLE:
    any engine with ``md5`` (DuckDB, Trino, Postgres) reproduces the
    exact split assignment, which makes the split itself — not just its
    invariants — auditable by an independent engine (the q91 oracle).
    """
    if hash_fn == "xxhash64":
        h = F.xxhash64(id_col, F.lit(seed))
    elif hash_fn == "md5":
        c = F.col(id_col) if isinstance(id_col, str) else id_col
        key = F.concat_ws(":", c.cast("string"), F.lit(str(seed)))
        h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    return F.pmod(h, F.lit(_BUCKETS)) / F.lit(float(_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Assign every row to a named split by cumulative hash ranges.

    ``fractions`` maps split name → fraction; they must sum to 1 (±1e-9).
    Rows with equal ids land in the same split ALWAYS — across reruns,
    repartitions and growing corpora (new documents never move old ones
    between splits, the property that keeps eval sets uncontaminated as
    a corpus accretes). Narrow projection: no shuffle, no action.

    ``hash_fn="md5"`` swaps the hash family for one any engine can
    reproduce (see :func:`_unit_hash`) — use it when the split
    assignment must be auditable outside Spark; the default
    ``xxhash64`` stays the fast codegen path.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = _unit_hash(id_col, seed, hash_fn)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sample at deterministic hash thresholds.

    Same contract as ``DataFrame.sampleBy`` but reproducible under
    repartitioning (see module docstring). Strata absent from
    ``fractions`` are kept at ``default_fraction`` (0 = dropped —
    the usual corpus-curation default where unlisted sources are
    excluded). Row counts per stratum are Binomial around
    fraction × n, not exact; use :func:`reservoir_per_key` for exact-k.
    """
    u = _unit_hash(id_col, seed)
    thresh = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        thresh = (
            F.when(cond, F.lit(float(frac)))
            if thresh is None
            else thresh.when(cond, F.lit(float(frac)))
        )
    thresh = (
        F.lit(float(default_fraction))
        if thresh is None
        else thresh.otherwise(F.lit(float(default_fraction)))
    )
    return df.filter(u < thresh)


def reservoir_per_key(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly ``min(k, n)`` rows per key, chosen uniformly (up to the
    hash family) and deterministically.

    Implementation is the distributed reservoir: order each key's rows
    by ``xxhash64(id, seed)`` and keep the first k — one shuffle on the
    key plus a per-partition sort, the same cost shape as any top-k per
    group (``operators/windows.topk_per_group``). The hash order is a
    uniform random permutation for any id set the hash family treats
    pseudo-randomly, and it is stable across reruns/cluster layouts.
    Skew note: a pathologically hot key serializes into one task's
    sort; salt the key upstream (``operators/scale.salted_join``
    pattern) if a single key's row count exceeds a task's memory.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.xxhash64(id_col, F.lit(seed)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rs_rn", F.row_number().over(w))
        .filter(F.col("__rs_rn") <= k)
        .drop("__rs_rn")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Rebalance a corpus to target source proportions ("data mixture").

    ``weights`` maps source value → target share (normalized
    internally). The operator computes per-source counts (one map-side
    combinable aggregation collected to the driver — one row per
    source, never per document), finds the largest output size at which
    no source is oversampled (sampling is without replacement), and
    down-samples each source to its target share with the deterministic
    hash threshold. Sources not in ``weights`` are dropped.

    Example: counts {web: 90, books: 10}, weights {web: 0.5,
    books: 0.5} → books binds (10 / 0.5 = 20 total), output ≈ 10 web +
    10 books.

    Degenerate corners (ADVICE r4 #3): if no POSITIVE-weight source has
    any rows the result is empty (zero-weight sources are excluded by
    definition and can't carry the mixture). A positive-weight source
    with ZERO rows gets a ``UserWarning`` — the mixture it binds is the
    empty one, so the output silently shrinking to nothing is almost
    always a data/config mismatch the caller wants to hear about.
    """
    import warnings

    wtotal = float(sum(weights.values()))
    if wtotal <= 0:
        raise ValueError("weights must sum to a positive value")
    shares = {k: v / wtotal for k, v in weights.items()}
    counts = {
        r["src"]: r["n"]
        for r in df.filter(F.col(source_col).isin(list(weights)))
        .groupBy(F.col(source_col).alias("src"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    absent = [s for s, v in shares.items() if v > 0 and s not in counts]
    if absent:
        warnings.warn(
            f"mixture_sample: positive-weight source(s) {absent} have no "
            f"rows in {source_col!r}; they bind the mixture, so the "
            "output is empty",
            UserWarning,
            stacklevel=2,
        )
    if not counts or absent:
        # Without every positive-weight source present, the largest
        # mixture-respecting sample is the empty one (sampling is
        # without replacement — nothing can stand in for the missing
        # source).
        return df.filter(F.lit(False))
    positive = [s for s in counts if shares[s] > 0]
    if not positive:
        # Every PRESENT source has weight zero: excluded by definition.
        return df.filter(F.lit(False))
    # Largest total where every source can supply its share.
    total = min(counts[s] / shares[s] for s in positive)
    fractions = {
        s: min(1.0, (shares[s] * total) / counts[s]) for s in counts
    }
    return stratified_sample(
        df, source_col, fractions, id_col=id_col, seed=seed, default_fraction=0.0
    )
