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


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    budget_tokens: float,
    *,
    weights: dict | None = None,
    alpha: float | None = None,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
    n_buckets: int = 1024,
) -> DataFrame:
    """Sample a corpus DOWN TO A TOKEN BUDGET with per-group target
    shares — the token-denominated mixture sampler (training mixtures
    are specified in tokens, not documents: a 50/50 doc split between a
    books source and a tweets source is nowhere near 50/50 tokens).

    Exactly one of ``weights`` / ``alpha`` selects the share rule:

    - ``weights``: explicit group value → target token share (normalized
      internally; groups absent from the dict are DROPPED, the
      :func:`mixture_sample` convention).
    - ``alpha``: temperature smoothing over the EMPIRICAL token shares —
      share_g ∝ (T_g)**alpha with T_g the group's total tokens.
      ``alpha=1`` keeps the natural mixture, ``alpha=0`` is uniform;
      intermediate values flatten head groups and boost tail groups
      (the multilingual-training rebalancing rule, Conneau et al.
      arXiv:1911.02116 §3.1).

    Sampling is WITHOUT replacement: the realized total is
    ``min(budget_tokens, min_g T_g / share_g)`` — the largest
    mixture-respecting budget (no group oversampled), exactly the
    :func:`mixture_sample` shrink doctrine, token-denominated. Within a
    group, documents are taken in deterministic ``_unit_hash`` order
    (uniform up to the hash family, stable across reruns/layouts) while
    the group's running token total is below its target — the document
    that CROSSES the target is kept (first-fit overshoot ≤ one
    document), so a group's realized tokens sit in
    ``[target, target + max_doc_tokens)``.

    Scale design — NO full-corpus window. A naive cumulative sum over
    hash order serializes each group through one window partition; at
    100 TB a single web-crawl group is the whole corpus. Instead the
    hash order is cut into ``n_buckets`` range buckets (bucket id =
    ``floor(u * n_buckets)``, monotone in the hash order):

    1. ONE map-side-combinable aggregation computes per-(group, bucket)
       token sums — ``O(groups * n_buckets)`` rows to the driver, never
       per-document.
    2. The driver prefix-scans each group's buckets to find the CUTOFF
       bucket (where the target lands) and the remaining budget at its
       start — all integer arithmetic on exact token sums.
    3. Buckets strictly before the cutoff are kept by a PURE FILTER
       (scan-stage predicate, no shuffle); only the cutoff bucket —
       ~1/n_buckets of the group — pays a window cumsum, partitioned by
       group and ordered by ``(u, id)``.

    The bucketed keep-set equals the naive single-window prefix exactly
    (bucket order is monotone in ``u``; ties share a bucket), which the
    suite pins via ``n_buckets=1`` — that degenerate setting IS the
    naive path. ``hash_fn="md5"`` makes the selection reproducible by
    any engine with ``md5`` (the q91 doctrine) at string-hash cost;
    the default ``xxhash64`` is the codegen fast path.

    Determinism note: with binary-exact weights (0.5, 0.125, ...) and
    integer budgets every target is an exact double, so an independent
    engine reproduces the row set bit-for-bit (q131's oracle does);
    ``alpha`` mode goes through ``pow`` — last-ulp portable in practice
    but pinned by the pytest suite rather than the cross-engine oracle.
    """
    import warnings

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    if (weights is None) == (alpha is None):
        raise ValueError("pass exactly one of weights= / alpha=")
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if alpha is not None and not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")

    if token_col is not None:
        tok = F.col(token_col).cast("long")
    else:
        from flink_note_spark.functions.scalar import words

        tok = F.size(
            F.filter(words(text_col), lambda x: x != "")
        ).cast("long")

    u = _unit_hash(id_col, seed, hash_fn)
    work = df
    if weights is not None:
        work = work.filter(F.col(group_col).isin(list(weights)))
    work = (
        work.withColumn("__tb_u", u)
        .withColumn("__tb_b", F.floor(F.col("__tb_u") * n_buckets).cast("int"))
        .withColumn("__tb_tok", tok)
    )

    # O(groups * n_buckets) rows — the only driver-side state.
    stats = (
        work.groupBy(F.col(group_col).alias("g"), F.col("__tb_b").alias("b"))
        .agg(F.sum("__tb_tok").alias("t"))
        .collect()
    )
    per_group: dict = {}
    for r in stats:
        per_group.setdefault(r["g"], {})[r["b"]] = int(r["t"])
    totals = {g: sum(bs.values()) for g, bs in per_group.items()}

    if weights is not None:
        wtotal = float(sum(weights.values()))
        if wtotal <= 0:
            raise ValueError("weights must sum to a positive value")
        shares = {g: v / wtotal for g, v in weights.items() if v > 0}
        absent = [g for g in shares if g not in totals]
        if absent:
            warnings.warn(
                f"token_budget_sample: positive-weight group(s) {absent} "
                f"have no rows in {group_col!r}; they bind the mixture, "
                "so the output is empty",
                UserWarning,
                stacklevel=2,
            )
            return df.filter(F.lit(False))
    else:
        shares_raw = {g: float(t) ** alpha for g, t in totals.items() if t > 0}
        stotal = sum(shares_raw.values())
        shares = {g: v / stotal for g, v in shares_raw.items()} if stotal else {}
    shares = {g: s for g, s in shares.items() if g in totals and s > 0}
    if not shares:
        return df.filter(F.lit(False))

    total_budget = min(
        float(budget_tokens), min(totals[g] / shares[g] for g in shares)
    )

    # Per group: cutoff bucket = first bucket where the running total
    # reaches the target; earlier buckets are fully kept, later ones
    # fully dropped (see the equivalence argument in the docstring).
    spec_rows = []
    for g, share in shares.items():
        target = share * total_budget
        cum = 0
        cutoff, remaining = n_buckets, 0.0  # keep-all default
        for b in sorted(per_group[g]):
            if cum + per_group[g][b] >= target:
                cutoff, remaining = b, target - cum
                break
            cum += per_group[g][b]
        spec_rows.append((g, int(cutoff), float(remaining)))

    spark = df.sparkSession
    gtype = df.schema[group_col].dataType
    spec = spark.createDataFrame(
        spec_rows,
        StructType(
            [
                StructField(group_col, gtype),
                StructField("__tb_cut", IntegerType()),
                StructField("__tb_r", DoubleType()),
            ]
        ),
    )
    joined = work.join(F.broadcast(spec), on=group_col, how="inner")
    prefix = joined.filter(F.col("__tb_b") < F.col("__tb_cut"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("__tb_u").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = (
        joined.filter(F.col("__tb_b") == F.col("__tb_cut"))
        .withColumn("__tb_cb", F.coalesce(F.sum("__tb_tok").over(w), F.lit(0)))
        .filter(F.col("__tb_cb") < F.col("__tb_r"))
        .drop("__tb_cb")
    )
    helper = ["__tb_u", "__tb_b", "__tb_tok", "__tb_cut", "__tb_r"]
    return prefix.unionByName(boundary).drop(*helper).select(*df.columns)
