"""Similarity search over embedding columns (array<float>).

North-star operator (SURVEY.md §2.2): brute-force cosine top-k as the
exact baseline, plus an LSH-bucketed variant (random hyperplane /
signed-random-projection) as the 100 TB scale path — candidates meet in a
bucket equi-join, never a full cross join.

Two execution styles, chosen per operator from measurement:

- The brute-force kernels (:func:`cosine_topk`,
  :func:`embedding_near_dup_pairs`) collect the SMALL side to the driver
  once and run Arrow-batched numpy matmuls over the streaming corpus —
  vectorized BLAS beats Catalyst's interpreted higher-order functions
  ~3× on this shape, at the cost of the small side fitting in driver
  memory (the contract; batch your queries).
- The LSH variants stay JVM-side (``zip_with``/``aggregate`` in double)
  because their per-candidate arrays are short and the bucket join
  dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from flink_note_spark.functions.scalar import l2_norm_sq, vec_dot
from flink_note_spark.operators.dedup import _computed_once, _lcg


def _guard_driver_collect(
    df: DataFrame, what: str, max_rows: int | None, alternative: str
) -> None:
    """Refuse to collect an unbounded side to the driver (same contract
    as ``theta_join``'s size guard, ``operators/joins.py``): a silent
    driver OOM at 100 TB is a plan error, not a runtime hiccup. ``limit``
    short-circuits the count, so the probe costs one partial scan."""
    if max_rows is None:
        return
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what}: the side collected to the driver has >{max_rows} "
            f"rows; at this size a driver-collect kernel is a plan error "
            f"— {alternative}, or pass max_collect_rows=None if the rows "
            "are known to fit in driver memory"
        )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_collect_rows: int | None = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    The query matrix (small side by contract — at scale you batch
    queries; ``max_collect_rows`` refuses bigger, like theta_join's size
    guard) is collected once and shipped via ``sparkContext.broadcast``
    (one block-manager transfer per executor, NOT re-pickled into every
    task closure); the corpus streams through ONE ``mapInPandas`` pass
    doing a blocked numpy matmul — vectorized BLAS instead of Catalyst's
    per-element *interpreted* higher-order functions (measured ~3×).
    Each partition emits only its LOCAL top-k per query, so the shuffle
    carries O(partitions · |queries| · k) rows — never O(|corpus|·|q|) —
    before the global window picks the true top-k. No corpus shuffle at
    any scale.

    Output: query_id, neighbor_id, cos_sim (rounded 6), rank.
    Works for any orderable id type (the output schema inherits it).
    """
    import numpy as np
    import pandas as pd

    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, __sim double"
    empty_schema = f"query_id {id_type}, neighbor_id {id_type}, cos_sim double, rank int"

    _guard_driver_collect(
        queries,
        "cosine_topk",
        max_collect_rows,
        "batch the query set, or bucket both sides with lsh_cosine_topk",
    )
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).collect()
    if not qrows:
        return queries.sparkSession.createDataFrame([], empty_schema)
    q_ids = np.array([r["query_id"] for r in qrows])
    qm = np.array([r["__qv"] for r in qrows], dtype=np.float64)
    nq = len(q_ids)
    bc = queries.sparkSession.sparkContext.broadcast(
        (q_ids, qm / np.linalg.norm(qm, axis=1, keepdims=True))
    )

    def score(batches):
        q_ids, qm_unit = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy()
            cm = np.array(pdf["__cv"].tolist(), dtype=np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qm_unit.T                       # (n, nq)
            if exclude_self:
                sims[ids[:, None] == q_ids[None, :]] = -np.inf
            # local top-k per query (argpartition, then exact sort later)
            kk = min(k, sims.shape[0])
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            out_q, out_n, out_s = [], [], []
            for j in range(nq):
                rows = part[:, j]
                out_q.extend([q_ids[j]] * len(rows))
                out_n.extend(ids[rows])
                out_s.extend(sims[rows, j])
            opdf = pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "__sim": out_s}
            )
            yield opdf[opdf["__sim"] > -np.inf]

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = c.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_collect_rows: int | None = 100_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (cos ≥ threshold).

    The whole corpus matrix is collected once (small-corpus / per-bucket
    regime; at 100 TB this exact kernel runs INSIDE LSH buckets via
    :func:`lsh_embedding_near_dup_pairs`, never corpus-wide —
    ``max_collect_rows`` enforces that contract instead of trusting the
    docstring) and shipped via ``sparkContext.broadcast`` (one transfer
    per executor, not per task); each partition scores its rows against
    it with one numpy matmul, emitting only pairs ``d1 < d2`` above the
    threshold — a blocked O(n²/P) all-pairs with no Spark cross join and
    no shuffle of the corpus.

    Output: d1, d2, cos_sim (rounded 6). Any orderable id type.
    """
    import numpy as np
    import pandas as pd

    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"d1 {id_type}, d2 {id_type}, cos_sim double"

    _guard_driver_collect(
        corpus,
        "embedding_near_dup_pairs",
        max_collect_rows,
        "use lsh_embedding_near_dup_pairs (bucketed candidates + exact "
        "verify) for corpus-wide near-dup at scale",
    )
    rows = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).collect()
    if not rows:
        return corpus.sparkSession.createDataFrame([], out_schema)
    all_ids = np.array([r["__id"] for r in rows])
    m = np.array([r["__v"] for r in rows], dtype=np.float64)
    bc = corpus.sparkSession.sparkContext.broadcast(
        (all_ids, m / np.linalg.norm(m, axis=1, keepdims=True))
    )

    def score(batches):
        all_ids, m = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            cm = np.array(pdf["__v"].tolist(), dtype=np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ m.T                                  # (b, n)
            bi, bj = np.nonzero(
                (sims >= threshold) & (ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "d1": ids[bi],
                    "d2": all_ids[bj],
                    "cos_sim": np.round(sims[bi, bj], 6),
                }
            )

    c = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    return c.mapInPandas(score, out_schema)


def lsh_embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 12,
    seed: int = 42,
    max_bucket: int = 2000,
) -> DataFrame:
    """Approximate embedding near-dup pairs: SRP-LSH bucket self-join →
    exact cosine verification on candidates only — the 100 TB scale path
    (candidates meet in a bucket equi-join, hot buckets are dropped by an
    anti-join, the full n² matrix is never formed).

    ``tests/test_lsh_recall.py`` asserts recall vs the exact operator.
    Output: d1, d2, cos_sim (rounded 6) — verified exact values.
    """
    b = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    buckets = []
    for t in range(n_tables):
        bits = _srp_bits("__v", dim, n_bits, seed + 7919 * t)
        key = F.concat_ws("", *[x.cast("string") for x in bits])
        buckets.append(F.struct(F.lit(t).alias("table_id"), key.alias("bucket_key")))
    banded = b.select(
        "__id", "__v", F.explode(F.array(*buckets)).alias("bk")
    ).select("__id", "__v", "bk.table_id", "bk.bucket_key")

    hot = (
        banded.groupBy("table_id", "bucket_key")
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") > max_bucket)
        .select("table_id", "bucket_key")
    )
    # unhinted anti-join: AQE broadcasts the hot set only when it is
    # actually small; computed once because both self-join sides read it
    # (localCheckpoint blocks, freed on GC — no CacheManager entry).
    banded = _computed_once(banded.join(hot, ["table_id", "bucket_key"], "left_anti"))

    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.table_id") == F.col("y.table_id"))
            & (F.col("x.bucket_key") == F.col("y.bucket_key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("d1"),
            F.col("y.__id").alias("d2"),
            F.col("x.__v").alias("v1"),
            F.col("y.__v").alias("v2"),
        )
        .dropDuplicates(["d1", "d2"])
    )
    sim = vec_dot("v1", "v2") / (F.sqrt(l2_norm_sq("v1")) * F.sqrt(l2_norm_sq("v2")))
    return (
        cand.withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("d1", "d2", "cos_sim")
    )


def _srp_bits(vec_col: str, dim: int, n_bits: int, seed: int):
    """Signed-random-projection bit columns for a vector column.

    Hyperplanes are deterministic (seed-derived LCG, values in [-1, 1)),
    generated once on the driver and folded into the plan as literals —
    cheap for n_bits·dim ≤ a few thousand.
    """
    rnd = _lcg(seed)
    bits = []
    for b in range(n_bits):
        plane = [((next(rnd) % 2_000_001) / 1_000_000.0) - 1.0 for _ in range(dim)]
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, 1).otherwise(0).alias(f"__bit{b}"))
    return bits


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-hyperplane LSH.

    Each vector gets ``n_tables`` bucket keys (each = ``n_bits`` sign
    bits); query and corpus meet through a bucket equi-join, then exact
    cosine re-ranks candidates. Recall rises with n_tables; cost is
    bounded by bucket occupancy instead of |corpus|·|queries|. This is
    the plan shape that survives 100 TB: shuffle on bucket key, broadcast
    nothing big, never cross-join.
    """
    def with_buckets(df: DataFrame, idname: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(idname), F.col(vec_col).alias(f"__v_{idname}")
        )
        buckets = []
        for t in range(n_tables):
            bits = _srp_bits(f"__v_{idname}", dim, n_bits, seed + 7919 * t)
            key = F.concat_ws(
                "", *[b.cast("string") for b in bits]
            )
            buckets.append(
                F.struct(F.lit(t).alias("table_id"), key.alias("bucket_key"))
            )
        return out.select(
            idname,
            f"__v_{idname}",
            F.explode(F.array(*buckets)).alias("b"),
        ).select(idname, f"__v_{idname}", "b.table_id", "b.bucket_key")

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(corpus, "neighbor_id")
    cand = (
        cb.join(broadcast(qb), ["table_id", "bucket_key"])
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))

    sim = vec_dot("__v_query_id", "__v_neighbor_id") / (
        F.sqrt(l2_norm_sq("__v_query_id")) * F.sqrt(l2_norm_sq("__v_neighbor_id"))
    )
    scored = cand.select("query_id", "neighbor_id", sim.alias("__sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__sim", 6).alias("cos_sim"),
            "rank",
        )
    )
