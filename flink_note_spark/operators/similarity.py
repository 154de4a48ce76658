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
- The bulk per-vector kernels — SRP-LSH bucket assignment
  (:func:`_srp_bucket_rows`) and IVF cell assignment/training
  (:func:`_ivf_assign_cells`, :func:`_ivf_train_centroids`) — are ONE
  Arrow-batched matmul pass against a broadcast matrix (r5: the old
  per-hyperplane interpreted ``zip_with``/``aggregate`` chains measured
  4.6× slower on the q52 shape). Only the short per-CANDIDATE exact
  re-scoring after a bucket join stays in JVM expressions
  (``vec_dot``), where the candidate count, not the corpus, bounds the
  work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from flink_note_spark.functions.scalar import l2_norm_sq, vec_dot
from flink_note_spark.operators.dedup import (
    _computed_once,
    _lcg,
    _spread_for_python_stage,
)


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

    Precondition: ``corpus`` has ONE row per ``id_col``. Duplicate ids
    with differing embeddings are collapsed by an arbitrary pick at the
    vector-attach stage (a defensive guard, not a semantics) — dedup
    upstream if your corpus can carry conflicting vectors per id.
    """
    # vec_out=None (r14): since the r13 restructure below, nothing reads
    # a vector off the banded rows — they exist only to meet in buckets.
    # Carrying ``__v`` shipped every vector back across the Arrow
    # boundary n_tables times and wrote all those copies into the
    # checkpoint blocks, ~10× the bytes of the (id, table, key) rows
    # actually used (guide §4.1: control how many columns cross).
    banded = _srp_bucket_rows(
        corpus, id_col, vec_col, dim, n_bits, n_tables, seed,
        id_out="__id",
    )

    # Materialize the RAW bucket rows BEFORE the hot cap (r14, same
    # restructure as minhash_lsh_pairs — see the note there): the cap
    # anti-join over the unmaterialized frame ran the SRP matmul kernel
    # TWICE inside the checkpoint job (hot side + left side; runtime
    # plan showed no exchange reuse). Blocks first — the kernel runs
    # once, and with vec_out gone the stored rows are 24-byte triples.
    banded = _computed_once(banded)
    hot = (
        banded.groupBy("table_id", "bucket_key")
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") > max_bucket)
        .select("table_id", "bucket_key")
    )
    # unhinted anti-join, LAZY over the blocks: AQE broadcasts the hot
    # set only when it is actually small; each self-join side re-runs
    # only a block scan + the combine-shrunk count + the anti-join.
    banded = banded.join(hot, ["table_id", "bucket_key"], "left_anti")

    # Decide with small rows, move big rows once (guide §8). The old
    # shape self-joined the FULL banded rows (id + 64-dim vector ≈
    # 0.5 KB/row), so every bucket-collision row carried two vectors
    # (~1 KB) into a dropDuplicates whose ``first(array)`` buffers force
    # SortAggregate — the collision stream (duplication factor ≈ the
    # expected shared-table count, ×6 on the fixture) was sorted at
    # full width on both sides of the pair exchange. Scoring before the
    # dedup instead was ALSO measured (+70%: cos_sim over 64-dim
    # vectors is an interpreted zip_with/aggregate chain, and the
    # duplication factor multiplies it). The shape that wins: the
    # self-join and the pair dedup see ONLY the 16-byte id pair
    # (HashAggregate, map-side combining — the collision stream
    # collapses to distinct pairs before it is ever shuffled), and the
    # vectors are attached ONCE per surviving pair from the n-sized
    # corpus frame (AQE broadcasts it when small; never forced).
    # Per-id norms ride the same attach (``l2_norm_sq`` evaluated
    # n times instead of 2× per pair — identical expression on
    # identical arrays, so cos_sim stays bit-exact).
    bandk = banded.select("table_id", "bucket_key", "__id")
    x, y = bandk.alias("x"), bandk.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.table_id") == F.col("y.table_id"))
            & (F.col("x.bucket_key") == F.col("y.bucket_key"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(F.col("x.__id").alias("d1"), F.col("y.__id").alias("d2"))
        .dropDuplicates(["d1", "d2"])
    )
    # Duplicate-id contract (ADVICE r13 #3): upstream operators
    # guarantee one row per id; the dropDuplicates below is a defensive
    # guard that picks an ARBITRARY vector if a corpus ever violates
    # that — same contract as before the r13 restructure, now stated.
    # _computed_once (r14, VERDICT r13 #4): both attach joins read this
    # n-sized frame; unmaterialized, each join re-ran the corpus scan +
    # per-id dedup + norm (the after-plan's duplicated SortAggregate
    # subtree) — one barrier buys one scan.
    vecs = _computed_once(
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .dropDuplicates(["__id"])
        .withColumn("__nsq", l2_norm_sq("__v"))
    )
    cand = cand.join(
        vecs.select(
            F.col("__id").alias("d1"),
            F.col("__v").alias("v1"),
            F.col("__nsq").alias("nsq1"),
        ),
        "d1",
    ).join(
        vecs.select(
            F.col("__id").alias("d2"),
            F.col("__v").alias("v2"),
            F.col("__nsq").alias("nsq2"),
        ),
        "d2",
    )
    sim = vec_dot("v1", "v2") / (F.sqrt(F.col("nsq1")) * F.sqrt(F.col("nsq2")))
    return (
        cand.withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("d1", "d2", "cos_sim")
    )


def _srp_bits(vec_col: str, dim: int, n_bits: int, seed: int):
    """Signed-random-projection bit columns for a vector column —
    LEGACY interpreted-expression formulation, retained as the
    equivalence oracle for the vectorized kernel
    (tests/test_lsh_recall.py::test_srp_kernel_matches_expressions).

    The hot path is :func:`_srp_bucket_rows`: Catalyst interprets these
    zip_with/aggregate lambda chains per element (no codegen), which at
    q34's 24 tables × 4 bits × 64 dims means thousands of interpreted
    expression evaluations per corpus vector (VERDICT r4 "What's wrong"
    #1) — the matmul kernel computes the same bits in one BLAS pass.

    Hyperplanes are deterministic (seed-derived LCG, values in [-1, 1)),
    generated once on the driver and folded into the plan as literals.
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


def _srp_planes(dim: int, n_bits: int, n_tables: int, seed: int):
    """The (n_tables·n_bits, dim) hyperplane matrix, row t·n_bits+b
    holding exactly the plane the legacy :func:`_srp_bits` builds for
    table t (seed + 7919·t), bit b — same LCG draw order, so the two
    formulations compute identical sign bits."""
    import numpy as np

    planes = np.empty((n_tables * n_bits, dim), dtype=np.float64)
    for t in range(n_tables):
        rnd = _lcg(seed + 7919 * t)
        for b in range(n_bits):
            planes[t * n_bits + b] = [
                ((next(rnd) % 2_000_001) / 1_000_000.0) - 1.0 for _ in range(dim)
            ]
    return planes


def _srp_bucket_rows(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bits: int,
    n_tables: int,
    seed: int,
    id_out: str,
    vec_out: str | None = None,
) -> DataFrame:
    """All SRP bucket keys of every vector in ONE Arrow-batched matmul
    pass (the ``_ivf_assign_cells`` pattern): the batch's (n, dim)
    matrix multiplies the broadcast (n_tables·n_bits, dim) hyperplane
    matrix once, signs become bits, bits pack into an int64 bucket key
    per table. Replaces n_tables·n_bits interpreted ``zip_with`` +
    ``aggregate`` chains per row — the r4 verdict's top kernel finding;
    this is the 100 TB ANN ingest path, every corpus vector pays it.

    Output: (id_out[, vec_out], table_id int, bucket_key long) —
    ``n_tables`` rows per input row. Bit b of table t is
    ``dot(vec, plane[t·n_bits+b]) >= 0``, identical to the legacy
    expression formulation (asserted in tests/test_lsh_recall.py); the
    key packs bit b at weight 2^b (a bijection of the old bit-string
    concat, and an 8-byte join key instead of an n_bits-char string).
    """
    import numpy as np

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(_srp_planes(dim, n_bits, n_tables, seed))
    id_type = dict(df.dtypes)[id_col]
    fields = [f"{id_out} {id_type}"]
    if vec_out is not None:
        fields.append(f"{vec_out} {dict(df.dtypes)[vec_col]}")
    fields += ["table_id int", "bucket_key long"]
    schema = ", ".join(fields)
    T, B = n_tables, n_bits

    def assign(batches):
        import pandas as pd

        planes = bc.value
        weights = 1 << np.arange(B, dtype=np.int64)
        tables = np.arange(T, dtype=np.int32)
        for pdf in batches:
            nrows = len(pdf)
            if not nrows:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if v.ndim != 2 or v.shape[1] != planes.shape[1]:
                got = v.shape[1] if v.ndim == 2 else "ragged"
                raise ValueError(
                    f"srp bucket kernel: vectors in {vec_col!r} have "
                    f"dim {got}, hyperplanes expect {planes.shape[1]} — "
                    "pass the column's true dim (and fix ragged rows "
                    "upstream)"
                )
            bits = (v @ planes.T) >= 0                       # (n, T·B)
            keys = bits.reshape(nrows, T, B).astype(np.int64) @ weights
            data = {id_out: pdf[id_col].to_numpy().repeat(T)}
            if vec_out is not None:
                data[vec_out] = pdf[vec_col].to_numpy().repeat(T)
            data["table_id"] = np.tile(tables, nrows)
            data["bucket_key"] = keys.ravel()
            yield pd.DataFrame(data)

    src = _spread_for_python_stage(df.select(id_col, vec_col))
    return src.mapInPandas(assign, schema)


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
        return _srp_bucket_rows(
            df, id_col, vec_col, dim, n_bits, n_tables, seed,
            id_out=idname, vec_out=f"__v_{idname}",
        )

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(corpus, "neighbor_id")
    # Score BEFORE the candidate dedup (same restructure as
    # dedup.minhash_lsh_pairs — see the note there): __sim is a pure
    # function of the two vectors, identical on every duplicate
    # (query, neighbor) table collision, so the dedup aggregates three
    # fixed-width columns (HashAggregate) instead of sorting collision
    # rows that carry both embedding vectors.
    sim = vec_dot("__v_query_id", "__v_neighbor_id") / (
        F.sqrt(l2_norm_sq("__v_query_id")) * F.sqrt(l2_norm_sq("__v_neighbor_id"))
    )
    scored = (
        cb.join(broadcast(qb), ["table_id", "bucket_key"])
        .select("query_id", "neighbor_id", sim.alias("__sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
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


def _ivf_train_centroids(vecs: DataFrame, n_cells: int, iters: int, seed: int,
                         id_alias: str, vec_alias: str):
    """Train unit-normalized IVF centroids with SHUFFLE-FREE distributed
    Lloyd steps over a materialized (id, vec) frame.

    Init picks ``n_cells`` corpus vectors by deterministic pseudo-random
    order (``xxhash64(id, seed)`` — no ``random`` module, reproducible
    across processes). Each refinement iteration is ONE ``mapInPandas``
    pass: every partition assigns its vectors to the nearest broadcast
    centroid and emits per-partition PARTIAL SUMS — at most ``n_cells``
    (cell_id, Σvec, count) rows per partition, reduced on the driver
    into the new (n_cells, dim) matrix. The corpus never shuffles and
    never reaches the driver (r4 verdict "What's wrong" #3: the old
    formulation re-shuffled all vectors through a ``groupBy(cell)``
    ``applyInPandas`` every iteration). Empty cells keep their previous
    centroid.
    """
    import numpy as np

    init = (
        vecs.select(vec_alias)
        .orderBy(F.xxhash64(F.col(id_alias).cast("string"), F.lit(seed)))
        .limit(n_cells)
        .collect()
    )
    if not init:
        return None  # empty corpus — caller returns a typed empty frame
    cents = np.array([r[vec_alias] for r in init], dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    sc = vecs.sparkSession.sparkContext
    for _ in range(iters):
        bc = sc.broadcast(cents)

        def partials(batches):
            import pandas as pd

            cm = bc.value
            sums = np.zeros_like(cm)
            cnts = np.zeros(len(cm), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(pdf[vec_alias].tolist(), dtype=np.float64)
                vn = v / np.maximum(
                    np.linalg.norm(v, axis=1, keepdims=True), 1e-12
                )
                cells = np.argmax(vn @ cm.T, axis=1)
                np.add.at(sums, cells, v)  # raw vectors — cell MEAN, as before
                cnts += np.bincount(cells, minlength=len(cm))
            nz = np.flatnonzero(cnts)
            yield pd.DataFrame(
                {
                    "cell_id": nz.astype("int32"),
                    "s": list(sums[nz]),
                    "n": cnts[nz],
                }
            )

        rows = vecs.select(vec_alias).mapInPandas(
            partials, "cell_id int, s array<double>, n long"
        ).collect()
        new = cents.copy()
        agg_s = np.zeros_like(cents)
        agg_n = np.zeros(len(cents), dtype=np.int64)
        for r in rows:
            agg_s[r["cell_id"]] += np.asarray(r["s"])
            agg_n[r["cell_id"]] += r["n"]
        nz = agg_n > 0
        new[nz] = agg_s[nz] / agg_n[nz, None]
        new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cents = new
    return cents


def _ivf_assign_cells(df: DataFrame, cents, vec_col: str) -> DataFrame:
    """Append ``__cell`` = argmax cosine(centroid, vec). One Arrow pass;
    the (n_cells, dim) centroid matrix rides a broadcast variable."""
    import numpy as np

    bc = df.sparkSession.sparkContext.broadcast(np.asarray(cents))
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", __cell int"

    def assign(batches):
        cm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            pdf = pdf.copy()
            pdf["__cell"] = np.argmax(v @ cm.T, axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(assign, schema)


class IvfIndex:
    """A built IVF index: the trained (n_cells, dim) centroid matrix +
    the cell-assigned corpus, MATERIALIZED once (GC-owned
    ``localCheckpoint`` blocks — the r4 verdict's "persist the
    cell-assigned corpus and amortize it across query batches" item).
    Repeated :func:`ivf_query` calls re-read the blocks; no retraining,
    no re-assignment (tests/test_lsh_recall.py asserts the plan is a
    block scan). For cross-session reuse at 100 TB, write ``assigned``
    through ``operators/scale.write_bucketed`` keyed on ``cell_id`` and
    rebuild the index from that table."""

    def __init__(self, centroids, assigned: DataFrame | None, id_type: str):
        self.centroids = centroids        # np.ndarray | None (empty corpus)
        self.assigned = assigned          # (neighbor_id, __cv, cell_id)
        self.id_type = id_type

    @property
    def n_cells(self) -> int:
        return 0 if self.centroids is None else len(self.centroids)


def ivf_build(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
) -> IvfIndex:
    """Build an IVF index over the corpus: shuffle-free distributed
    Lloyd training (per-partition partial sums — see
    :func:`_ivf_train_centroids`), then ONE assignment pass against the
    broadcast centroids, materialized so every later query batch reuses
    it. The projected (id, vec) frame is itself materialized first so
    training iterations and the final assignment read executor blocks,
    not the source scan, ``iters + 1`` times.

    ``materialize=False`` keeps both frames lazy — the right mode for a
    single-shot query (:func:`ivf_topk`), where the two eager
    checkpoint jobs are pure overhead (measured +23% on the sf0.1
    one-shot shape); reuse across query batches wants the default."""
    c = _spread_for_python_stage(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    if materialize:
        c = _computed_once(c)
    id_type = dict(corpus.dtypes)[id_col]
    cents = _ivf_train_centroids(c, n_cells, iters, seed, "neighbor_id", "__cv")
    if cents is None:
        return IvfIndex(None, None, id_type)
    assigned = _ivf_assign_cells(c, cents, "__cv").withColumnRenamed(
        "__cell", "cell_id"
    )
    if materialize:
        assigned = _computed_once(assigned)
    return IvfIndex(cents, assigned, id_type)


def ivf_save(index: IvfIndex, table: str, buckets: int = 16,
             path: str | None = None) -> None:
    """Persist a built IVF index across sessions: the cell-assigned
    corpus goes to a table BUCKETED on ``cell_id``
    (``operators/scale.write_bucketed``) and the centroid matrix to a
    ``<table>__centroids`` side table (n_cells tiny rows). Bucketing is
    the 100 TB move: the corpus is hash-laid-out by cell ONCE at write
    time, so every future session's query joins read co-located buckets
    instead of re-assigning (Python pass) and re-shuffling the corpus.

    ``path`` keeps ALL tables external (corpus at ``path``, centroids
    at ``path + "__centroids"``, meta at ``path + "__meta"``) so the
    index travels as one unit. Always overwrites: appending would
    accumulate duplicate ``cell_id`` centroid rows that load silently
    last-wins. (Incremental corpus growth goes through
    :func:`ivf_index_append`, which appends bucketed files to the
    CORPUS table only — the centroid matrix stays fixed by design.)

    ``<table>__meta`` (r13) records the geometry (vector dim, n_cells,
    save-time bucket count, id type) and is written LAST — its presence
    implies the corpus and centroid writes both landed (the
    ``minhash_index_save`` crash-window discipline), and it is what
    :func:`ivf_index_register` reads to re-declare the bucketed layout
    in a fresh session's catalog.
    """
    from flink_note_spark.operators.scale import write_bucketed

    if index.centroids is None:
        raise ValueError("ivf_save: empty index (corpus had no rows)")
    spark = index.assigned.sparkSession
    write_bucketed(
        index.assigned, table, buckets, ["cell_id"], path=path,
        mode="overwrite",
    )
    _write_small_table(
        spark, _centroid_rows(index.centroids),
        "cell_id int, centroid array<double>", f"{table}__centroids",
        f"{path}__centroids" if path else None,
    )
    _write_small_table(
        spark,
        [(int(index.centroids.shape[1]), int(index.n_cells), int(buckets),
          index.id_type)],
        "dim int, n_cells int, table_buckets int, id_type string",
        f"{table}__meta", f"{path}__meta" if path else None,
    )


def ivf_load(spark, table: str) -> IvfIndex:
    """Rebuild an :class:`IvfIndex` from :func:`ivf_save` output —
    no training, no assignment pass; ``assigned`` is the bucketed table
    scan, so downstream ``cell_id`` joins skip the corpus-side
    exchange. Refreshes the catalog's cached file listing first (r13):
    appends from another session — a streaming query's cloned
    micro-batch session (:func:`~flink_note_spark.pipelines.
    ivf_ingest_stream`), a concurrent job — invalidate only the
    writer's own relation cache, so a session that read the table
    BEFORE the append would otherwise silently serve the stale
    listing."""
    import numpy as np

    _refresh_tables(spark, table, f"{table}__centroids")
    rows = spark.table(f"{table}__centroids").collect()
    if not rows:
        raise ValueError(
            f"ivf_load: centroid table {table}__centroids is empty — "
            "not an ivf_save output (or the save was interrupted)"
        )
    cents = np.empty((len(rows), len(rows[0]["centroid"])), dtype=np.float64)
    for r in rows:
        cents[r["cell_id"]] = r["centroid"]
    assigned = spark.table(table)
    id_type = dict(assigned.dtypes)["neighbor_id"]
    return IvfIndex(cents, assigned, id_type)


def _refresh_tables(spark, *tables: str) -> None:
    """Invalidate the session's cached file listings for ``tables``
    (those that exist) — the stale-relation-cache guard every index
    ``*_load`` runs: Spark caches a table's file listing per session,
    and an append from ANY other session (a streaming clone, a second
    job) refreshes only the writer's cache. Listing is re-done lazily
    on the next scan, so the refresh itself is metadata-only."""
    for t in tables:
        if spark.catalog.tableExists(t):
            spark.catalog.refreshTable(t)


def _external_location(spark, table: str) -> "str | None":
    """The table's storage location when it is EXTERNAL, else None —
    what the ``*_index_rebuild`` verbs default their ``path`` to, so an
    in-place retrain keeps the files where a later session's register
    expects them instead of silently recreating the table MANAGED."""
    is_ext, loc = False, None
    for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect():
        key = (r["col_name"] or "").strip()
        if key == "Type":
            is_ext = (r["data_type"] or "").strip().upper() == "EXTERNAL"
        elif key == "Location":
            loc = r["data_type"]
    return loc if is_ext else None


def _write_small_table(spark, rows, schema: str, table: str,
                       path: "str | None") -> None:
    """Overwrite a tiny driver-built side table (centroids, codebooks,
    meta), external at ``path`` when given — the shared writer of every
    index save verb."""
    w = spark.createDataFrame(rows, schema).write.mode("overwrite")
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def _centroid_rows(centroids) -> list:
    return [
        (i, [float(x) for x in row]) for i, row in enumerate(centroids)
    ]


def _codebook_rows(books) -> list:
    mm, kk, _ = books.shape
    return [
        (j, c, [float(x) for x in books[j, c]])
        for j in range(mm)
        for c in range(kk)
    ]


def _register_clustered_layout(
    spark, table: str, path: str, what: str,
    plain_suffixes: "tuple[str, ...]", buckets: "int | None",
):
    """Shared body of ``ivf_index_register``/``ivfpq_index_register``:
    read the bucket count from ``{path}__meta`` (``buckets`` overrides
    only for meta-less saves — a WRONG count would silently mis-bucket
    every future co-located join, so absent both it refuses), declare
    the corpus table ``CLUSTERED BY (cell_id)`` over the existing files
    (Spark's bucketed file names carry their bucket ids, so declared
    metadata is exact), and declare each plain side table. Idempotent
    per session: already-registered tables are left alone."""
    try:
        rows = spark.read.parquet(f"{path}__meta").collect()
    except Exception:
        rows = None
    if rows is not None:
        if len(rows) != 1:
            raise ValueError(
                f"{what}: {path}__meta has {len(rows)} rows — not a "
                "saved index layout"
            )
        b = rows[0]["table_buckets"]
    elif buckets:
        b = buckets
    else:
        raise ValueError(
            f"{what}: no meta at {path}__meta — pass buckets= with the "
            "ORIGINAL save-time count (a wrong count silently "
            "mis-buckets every future co-located join), or re-save "
            "with the current save verb"
        )

    def _ddl_cols(p: str) -> str:
        return ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in spark.read.parquet(p).schema.fields
        )

    if not spark.catalog.tableExists(table):
        spark.sql(
            f"CREATE TABLE {table} ({_ddl_cols(path)}) USING PARQUET "
            f"CLUSTERED BY (cell_id) INTO {int(b)} BUCKETS "
            f"LOCATION '{path}'"
        )
    for suffix in plain_suffixes:
        if not spark.catalog.tableExists(f"{table}{suffix}"):
            spark.sql(
                f"CREATE TABLE {table}{suffix} USING PARQUET "
                f"LOCATION '{path}{suffix}'"
            )
    if rows is not None and not spark.catalog.tableExists(f"{table}__meta"):
        spark.sql(
            f"CREATE TABLE {table}__meta USING PARQUET "
            f"LOCATION '{path}__meta'"
        )


def _guard_index_increment(
    increment: DataFrame,
    indexed_ids: DataFrame,
    id_col: str,
    vec_col: str,
    id_type: str,
    dim: int,
    what: str,
    on_conflict: str,
) -> "DataFrame | None":
    """The shared refusal/skip contract of every persisted-index append
    (``ivf_index_append`` / ``pq_index_append`` / ``ivfpq_index_append``):
    id-type mismatch and wrong vector dim refuse loudly; already-indexed
    ids refuse (``on_conflict="error"``) or anti-join out
    (``on_conflict="skip"`` — the idempotent streaming-ingest mode).
    ``indexed_ids`` is the index's single id column (``neighbor_id``) —
    either presence check is a column-pruned scan against the broadcast
    increment ids, no shuffle, no corpus-row read. Returns the
    (possibly filtered) increment, or None when nothing remains to
    append."""
    inc_id_type = dict(increment.dtypes)[id_col]
    if inc_id_type != id_type:
        raise ValueError(
            f"{what}: increment id type {inc_id_type!r} != index id "
            f"type {id_type!r} — appended files would split the corpus "
            "table's schema"
        )
    probe = increment.select(F.size(F.col(vec_col)).alias("d")).first()
    if probe is None:
        return None  # empty increment — nothing to append
    if probe["d"] != dim:
        raise ValueError(
            f"{what}: increment vectors have dim {probe['d']} but the "
            f"index quantizes dim {dim} — wrong embedding family "
            "(rebuild the index if the family changed)"
        )
    inc_ids = F.broadcast(
        increment.select(F.col(id_col).alias("neighbor_id")).distinct()
    )
    if on_conflict == "skip":
        present = (
            indexed_ids.join(inc_ids, "neighbor_id", "semi")
            .withColumnRenamed("neighbor_id", id_col)
        )
        # eager blocks: the anti-join's broadcast side is an index
        # id-column scan — without materialization the append's write
        # would re-run it a second time, and the emptiness probe a
        # third (review r13 finding)
        increment = increment.join(
            F.broadcast(present), id_col, "anti"
        ).localCheckpoint(eager=True)
        if increment.select(id_col).first() is None:
            return None  # every increment id already indexed
    elif on_conflict == "error":
        clash = (
            indexed_ids.join(inc_ids, "neighbor_id", "semi")
            .limit(5)
            .collect()
        )
        if clash:
            raise ValueError(
                f"{what}: increment ids already in the index "
                f"(e.g. {[r[0] for r in clash]}) — appending them "
                "would duplicate their rows; dedup or re-key the "
                "increment"
            )
    else:
        raise ValueError(
            f"{what}: on_conflict={on_conflict!r} — use 'error' or "
            "'skip'"
        )
    return increment


def ivf_index_append(
    increment: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_conflict: str = "error",
) -> None:
    """Accrete an embedding increment into a PERSISTED IVF index IN
    PLACE (r13 — the ``minhash_index_append`` operational loop for the
    similarity family): assign the increment against the index's SAVED
    centroids (no retraining — one Arrow pass over the increment only)
    and append its rows as ADDITIONAL bucketed files into the corpus
    table. Spark's bucket layout is per-file, so the co-located
    ``cell_id`` query join survives appends; the existing corpus is
    never rescanned and every existing byte is untouched. Composes with
    streaming ingest the same way the corpus pipeline accretes its
    MinHash index: call it from ``foreachBatch`` on each micro-batch's
    new vectors.

    Refusals are loud: an increment id already present in the index
    (appending would duplicate its neighbor rows — the check semi-joins
    the bucketed id column against the broadcast increment ids), an id
    type differing from the saved corpus (the appended files would
    split the table's schema), and a vector dimensionality differing
    from the trained centroids (probed on one row — a wrong embedding
    family, the common operational mistake; per-row raggedness inside
    one increment surfaces in the assignment pass).

    ``on_conflict="skip"`` (r13 — the streaming-ingest mode,
    :func:`~flink_note_spark.pipelines.ivf_ingest_stream`) anti-joins
    already-indexed ids OUT instead of raising — which makes the
    append IDEMPOTENT: replaying the same increment converges instead
    of failing, the property a micro-batch retry needs. Either way the
    presence check is a column-pruned scan of the index's id column
    against the broadcast increment ids — no shuffle, no corpus-row
    read (the ``minhash_index_append`` check's cost shape).

    Honest drift caveat (the ``minhash_index_append`` cap caveat's
    analogue): centroids stay FIXED across appends, so if the
    appended distribution drifts from the training corpus, cells grow
    imbalanced and partial-probe recall decays until the next
    :func:`ivf_index_rebuild` — appended==same-centroid equality is
    exact (pinned in tests/test_lsh_recall.py), but the centroids are
    only as good as the corpus they were trained on."""
    import numpy as np

    spark = increment.sparkSession
    idx = ivf_load(spark, table)
    increment = _guard_index_increment(
        increment, idx.assigned.select("neighbor_id"), id_col, vec_col,
        idx.id_type, int(np.asarray(idx.centroids).shape[1]),
        "ivf_index_append", on_conflict,
    )
    if increment is None:
        return
    from flink_note_spark.operators.dedup import _table_buckets
    from flink_note_spark.operators.scale import write_bucketed

    c = _spread_for_python_stage(
        increment.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    assigned = _ivf_assign_cells(c, idx.centroids, "__cv").withColumnRenamed(
        "__cell", "cell_id"
    )
    write_bucketed(
        assigned, table, _table_buckets(spark, table), ["cell_id"],
        mode="append",
    )


def ivf_index_register(
    spark, table: str, path: str, buckets: int | None = None
) -> IvfIndex:
    """Re-register a persisted :func:`ivf_save` layout in a FRESH
    session's catalog (the ``minhash_index_register`` doctrine, r12):
    ``saveAsTable`` records the bucket spec in the session catalog,
    which an in-memory metastore loses on restart — without
    re-registration the bucketed files still read, but every query's
    ``cell_id`` join pays the corpus-side exchange the layout exists to
    avoid. Reads the geometry from ``{path}__meta``, issues ``CREATE
    TABLE ... USING PARQUET CLUSTERED BY (cell_id) INTO n BUCKETS
    LOCATION ...`` over the existing files (Spark's bucketed file names
    carry their bucket ids, so declared metadata is exact), and returns
    the loaded index. ``buckets`` overrides for pre-r13 saves that have
    no meta — a WRONG count would silently mis-bucket every future
    co-located join, so absent both it refuses.

    Idempotent per session: already-registered tables are left alone."""
    _register_clustered_layout(
        spark, table, path, "ivf_index_register", ("__centroids",),
        buckets,
    )
    return ivf_load(spark, table)


def ivf_index_rebuild(
    spark,
    table: str,
    path: str | None = None,
    n_cells: int | None = None,
    iters: int = 2,
    seed: int = 42,
    buckets: int | None = None,
) -> IvfIndex:
    """Retrain a persisted IVF index from its own corpus and swap it in
    place — the scheduled verb that closes :func:`ivf_index_append`'s
    drift caveat (the ``compact_corpus_output(rebuild_index=True)``
    pattern): appends keep centroids fixed, so a drifted corpus wants a
    periodic retrain. Reads the bucketed corpus table (ids + vectors —
    the ORIGINAL text/embedding source is never needed), retrains with
    the usual shuffle-free Lloyd passes, and overwrites via
    :func:`ivf_save` with the same bucket count (or ``buckets``) and
    ``path``. The rebuilt assignment is materialized (eager
    ``localCheckpoint``) BEFORE the overwrite, severing lineage from
    the table being replaced — without that Spark would refuse the
    self-overwrite. ``n_cells`` defaults to the saved geometry.

    Offline verb: run it from the scheduled maintenance job, not
    concurrently with appends — ``ivf_save`` overwrites are not
    transactional against a concurrent writer (the same discipline as
    the MinHash index rebuild). ``path`` defaults to the saved layout's
    own location when the corpus table is EXTERNAL — omitting it would
    otherwise recreate the table MANAGED in the warehouse and leave the
    external files stale for the next session's register."""
    from flink_note_spark.operators.dedup import _table_buckets

    idx = ivf_load(spark, table)
    if n_cells is None:
        n_cells = idx.n_cells
    if buckets is None:
        buckets = _table_buckets(spark, table)
    if path is None:
        path = _external_location(spark, table)
    rebuilt = ivf_build(
        idx.assigned.select("neighbor_id", "__cv"),
        n_cells=n_cells, iters=iters, seed=seed,
        id_col="neighbor_id", vec_col="__cv", materialize=True,
    )
    ivf_save(rebuilt, table, buckets=buckets, path=path)
    return ivf_load(spark, table)


def ivf_query(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Query a built :class:`IvfIndex`: each query probes its
    ``n_probe`` nearest cells (one Arrow pass over the
    small-by-contract query side), candidates meet the materialized
    assigned corpus in a ``cell_id`` equi-join, exact cosine re-ranks.

    Output: query_id, neighbor_id, cos_sim (rounded 6), rank.
    """
    import numpy as np

    if index.centroids is None:  # empty corpus: typed empty result
        return queries.sparkSession.createDataFrame(
            [],
            f"query_id {index.id_type}, neighbor_id {index.id_type}, "
            "cos_sim double, rank int",
        )
    cents = index.centroids
    n_probe = min(n_probe, len(cents))
    c = index.assigned

    # Unhinted — AQE broadcasts the query side when its measured size
    # allows.
    bc = queries.sparkSession.sparkContext.broadcast(np.asarray(cents))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    q_schema = f"query_id {index.id_type}, __qv array<double>, cell_id int"

    def probe(batches):
        import pandas as pd

        cm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf["__qv"].tolist(), dtype=np.float64)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(vn @ cm.T), axis=1)[:, :n_probe]  # (nq, n_probe)
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy().repeat(n_probe),
                    "__qv": [row for row, cells in zip(v.tolist(), order) for _ in cells],
                    "cell_id": order.ravel().astype("int32"),
                }
            )
            yield out

    qp = q.mapInPandas(probe, q_schema)

    cand = qp.join(c, "cell_id")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    sim = vec_dot("__qv", "__cv") / (
        F.sqrt(l2_norm_sq("__qv")) * F.sqrt(l2_norm_sq("__cv"))
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


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF (inverted-file)
    index: k-means cells over the corpus, each query probes only its
    ``n_probe`` nearest cells, exact cosine re-ranks inside them.

    One-shot convenience over the build/query split — equals
    ``ivf_query(ivf_build(corpus, ...), queries, ...)``. Batch-querying
    callers should hold the :class:`IvfIndex` from :func:`ivf_build`
    and call :func:`ivf_query` per batch: the index materializes the
    cell-assigned corpus once, so later batches skip training AND
    assignment entirely.

    The 100 TB shape: the corpus is partitioned by cell assignment (one
    Arrow pass against broadcast centroids), training is shuffle-free
    per-partition partial sums, candidates meet in a ``cell_id``
    equi-join, and the scored set is bounded by ``n_probe``/``n_cells``
    of the corpus instead of |corpus|·|queries|. Recall rises with
    ``n_probe``; ``n_probe == n_cells`` degenerates to exhaustive exact
    search (asserted in tests/test_lsh_recall.py).

    Output: query_id, neighbor_id, cos_sim (rounded 6), rank.
    """
    index = ivf_build(
        corpus, n_cells=n_cells, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col, materialize=False,
    )
    return ivf_query(
        index, queries, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, exclude_self=exclude_self,
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC — Jégou et al., "Product Quantization for
# Nearest Neighbor Search", IEEE TPAMI 2011; public algorithm, fresh
# implementation against the PySpark Arrow APIs)


class PqIndex:
    """A built PQ index: per-subspace codebooks (``(m, n_codes, dsub)``,
    trained on UNIT-normalized vectors so inner-product tables score
    cosine) plus the encoded corpus — ``(neighbor_id, __codes, __cv)``,
    8–32 bytes of codes per vector instead of ``8·dim``; the raw vector
    column rides along only for the exact re-rank stage and can be
    dropped for a pure-memory-bound deployment (``refine=False``).

    The 100 TB posture: codes are ~``dim·8/m``× smaller than raw
    vectors, the scoring kernel reads ONLY the code column (columnar
    prune), each Arrow batch scores against broadcast lookup tables
    with numpy fancy indexing (no per-row Python), and the shuffle
    carries O(partitions · |queries| · shortlist) candidate rows —
    never |corpus|·|queries|."""

    def __init__(self, codebooks, encoded: DataFrame | None, id_type: str):
        self.codebooks = codebooks    # np.ndarray | None (empty corpus)
        self.encoded = encoded
        self.id_type = id_type

    @property
    def m(self) -> int:
        return 0 if self.codebooks is None else self.codebooks.shape[0]


def _pq_train_codebooks(vecs: DataFrame, m: int, n_codes: int, iters: int,
                        seed: int, id_alias: str, vec_alias: str):
    """Per-subspace k-means codebooks with the same SHUFFLE-FREE
    partial-sum Lloyd scheme as :func:`_ivf_train_centroids`, all ``m``
    subspaces refined in ONE ``mapInPandas`` pass per iteration (the
    per-partition summary is ≤ ``m · n_codes`` rows). Init takes
    ``n_codes`` corpus vectors in deterministic ``xxhash64`` order and
    slices them per subspace; vectors are unit-normalized before
    splitting (cosine == inner product downstream). Empty codes keep
    their previous codeword."""
    import numpy as np

    init = (
        vecs.select(vec_alias)
        .orderBy(F.xxhash64(F.col(id_alias).cast("string"), F.lit(seed)))
        .limit(n_codes)
        .collect()
    )
    if not init:
        return None
    v0 = np.array([r[vec_alias] for r in init], dtype=np.float64)
    v0 /= np.maximum(np.linalg.norm(v0, axis=1, keepdims=True), 1e-12)
    dim = v0.shape[1]
    if dim % m != 0:
        raise ValueError(
            f"pq: dim {dim} is not divisible by m={m} subspaces"
        )
    dsub = dim // m
    # (m, n_codes, dsub); short corpora repeat rows (still valid init)
    reps = -(-n_codes // len(v0))
    v0 = np.tile(v0, (reps, 1))[:n_codes]
    books = v0.reshape(n_codes, m, dsub).transpose(1, 0, 2).copy()

    sc = vecs.sparkSession.sparkContext
    for _ in range(iters):
        bc = sc.broadcast(books)

        def partials(batches):
            import pandas as pd

            cb = bc.value          # (m, K, dsub)
            mm, kk, dd = cb.shape
            sums = np.zeros_like(cb)
            cnts = np.zeros((mm, kk), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(pdf[vec_alias].tolist(), dtype=np.float64)
                v /= np.maximum(
                    np.linalg.norm(v, axis=1, keepdims=True), 1e-12
                )
                sv = v.reshape(len(v), mm, dd)
                for j in range(mm):
                    # L2 assignment in the subspace
                    d2 = (
                        (sv[:, j, None, :] - cb[j][None, :, :]) ** 2
                    ).sum(axis=2)
                    code = np.argmin(d2, axis=1)
                    np.add.at(sums[j], code, sv[:, j])
                    cnts[j] += np.bincount(code, minlength=kk)
            idx = np.argwhere(cnts > 0)
            if len(idx):
                yield pd.DataFrame(
                    {
                        "sub": idx[:, 0].astype("int32"),
                        "code": idx[:, 1].astype("int32"),
                        "s": [sums[a, b].tolist() for a, b in idx],
                        "n": [int(cnts[a, b]) for a, b in idx],
                    }
                )

        rows = vecs.select(vec_alias).mapInPandas(
            partials, "sub int, code int, s array<double>, n long"
        ).collect()
        agg_s = np.zeros_like(books)
        agg_n = np.zeros(books.shape[:2], dtype=np.int64)
        for r in rows:
            agg_s[r["sub"], r["code"]] += np.asarray(r["s"])
            agg_n[r["sub"], r["code"]] += r["n"]
        new = books.copy()
        nz = agg_n > 0
        new[nz] = agg_s[nz] / agg_n[nz][:, None]
        books = new
    return books


def pq_build(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
) -> PqIndex:
    """Build a PQ index: train per-subspace codebooks (shuffle-free
    Lloyd), then ONE Arrow encode pass appending the ``m`` uint8-ish
    codes per vector. ``materialize=True`` backs the encoded corpus
    with executor blocks so repeated query batches skip the encode
    (the :func:`ivf_build` contract)."""
    c = _spread_for_python_stage(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    if materialize:
        c = _computed_once(c)
    id_type = dict(corpus.dtypes)[id_col]
    books = _pq_train_codebooks(
        c, m, n_codes, iters, seed, "neighbor_id", "__cv"
    )
    if books is None:
        return PqIndex(None, None, id_type)
    encoded = _pq_encode(c, books, id_type)
    if materialize:
        encoded = _computed_once(encoded)
    return PqIndex(books, encoded, id_type)


def _pq_encode(c: DataFrame, books, id_type: str) -> DataFrame:
    """ONE Arrow pass appending the ``m`` subspace codes per vector
    against broadcast codebooks — shared by :func:`pq_build` and
    :func:`pq_index_append` (an increment MUST encode with the saved
    codebooks, never retrained ones, or its codes are meaningless
    against the index)."""
    bc = c.sparkSession.sparkContext.broadcast(books)
    schema = (
        f"neighbor_id {id_type}, __cv array<double>, __codes array<int>"
    )

    def encode(batches):
        import numpy as np

        cb = bc.value
        mm, _, dd = cb.shape
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf["__cv"].tolist(), dtype=np.float64)
            vn = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12
            )
            sv = vn.reshape(len(v), mm, dd)
            codes = np.empty((len(v), mm), dtype=np.int32)
            for j in range(mm):
                d2 = ((sv[:, j, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            pdf = pdf.copy()
            pdf["__codes"] = list(codes)
            yield pdf

    return c.mapInPandas(encode, schema)


def pq_query(
    index: PqIndex,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    refine: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_collect_rows: int | None = 100_000,
) -> DataFrame:
    """Query a built :class:`PqIndex` with asymmetric distance
    computation (ADC): per query, an inner-product lookup table
    ``(m, n_codes)`` against the codebooks; each corpus code vector
    scores as ``Σ_m table[m, code_m]`` — one numpy fancy-indexing pass
    per Arrow batch over the CODE column only. The top-``shortlist``
    ADC candidates per query are then exactly re-ranked
    (``refine=True``, output ``cos_sim``) or returned with their ADC
    scores (``refine=False``, output ``adc_sim`` — honest naming: ADC
    approximates cosine). ``shortlist >= |corpus|`` with refine is
    EXACT (equals :func:`cosine_topk` — the oracle contract q94 uses).
    """
    import numpy as np

    empty_schema = (
        f"query_id {index.id_type}, neighbor_id {index.id_type}, "
        + ("cos_sim double, rank int" if refine else "adc_sim double, rank int")
    )
    if index.codebooks is None:
        return queries.sparkSession.createDataFrame([], empty_schema)

    _guard_driver_collect(
        queries, "pq_query", max_collect_rows,
        "batch the query set (the ADC tables are per-query state)",
    )
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).collect()
    if not qrows:
        return queries.sparkSession.createDataFrame([], empty_schema)
    q_ids = np.array([r["query_id"] for r in qrows])
    qm = np.array([r["__qv"] for r in qrows], dtype=np.float64)
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    cb = index.codebooks                     # (m, K, dsub)
    mm, kk, dd = cb.shape
    sq = qm.reshape(len(qm), mm, dd)
    # ADC inner-product tables: (Q, m, K)
    tables = np.einsum("qmd,mkd->qmk", sq, cb)
    bc = queries.sparkSession.sparkContext.broadcast((q_ids, tables))
    nq = len(q_ids)
    sl = shortlist

    out_schema = (
        f"query_id {index.id_type}, neighbor_id {index.id_type}, __adc double"
    )

    def score(batches):
        import pandas as pd

        q_ids, tables = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy()
            codes = np.array(pdf["__codes"].tolist(), dtype=np.int64)
            # (Q, B): sum over subspaces of per-code table entries
            sims = tables[:, np.arange(mm)[None, :], codes].sum(axis=2)
            if exclude_self:
                sims[q_ids[:, None] == ids[None, :]] = -np.inf
            bk = min(sl, sims.shape[1])
            part = np.argpartition(-sims, bk - 1, axis=1)[:, :bk]
            out_q, out_n, out_s = [], [], []
            for j in range(nq):
                cols = part[j]
                out_q.extend([q_ids[j]] * len(cols))
                out_n.extend(ids[cols])
                out_s.extend(sims[j, cols])
            opdf = pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "__adc": out_s}
            )
            yield opdf[opdf["__adc"] > -np.inf]

    scored = index.encoded.select("neighbor_id", "__codes").mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__adc").desc(), F.col("neighbor_id").asc()
    )
    short = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= sl)
        .drop("__r")
    )
    if not refine:
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("__adc").desc(), F.col("neighbor_id").asc()
        )
        return (
            short.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id",
                F.round("__adc", 6).alias("adc_sim"), "rank",
            )
        )
    # exact re-rank: the shortlist meets the encoded corpus (neighbor_id
    # equi-join, shortlist side is tiny) and the broadcast query vectors
    qv = queries.sparkSession.createDataFrame(
        [(r["query_id"], [float(x) for x in r["__qv"]]) for r in qrows],
        f"query_id {index.id_type}, __qv array<double>",
    )
    cand = (
        short.join(index.encoded.select("neighbor_id", "__cv"), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
    )
    sim = vec_dot("__qv", "__cv") / (
        F.sqrt(l2_norm_sq("__qv")) * F.sqrt(l2_norm_sq("__cv"))
    )
    rescored = cand.select("query_id", "neighbor_id", sim.alias("__sim"))
    w3 = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w3))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("__sim", 6).alias("cos_sim"), "rank",
        )
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    refine: bool = True,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """One-shot PQ/ADC approximate top-k cosine neighbors — the
    memory-bound scale path of the similarity family (brute force →
    SRP-LSH → IVF → PQ): the corpus compresses to ``m`` small codes
    per vector, queries score code columns against broadcast lookup
    tables, and an exact re-rank fixes the shortlist. Equals
    ``pq_query(pq_build(corpus, ...), queries, ...)``; batch-querying
    callers should hold the :class:`PqIndex` (encode-once contract,
    same as :func:`ivf_build`)."""
    index = pq_build(
        corpus, m=m, n_codes=n_codes, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col, materialize=False,
    )
    return pq_query(
        index, queries, k=k, shortlist=shortlist, refine=refine,
        id_col=id_col, vec_col=vec_col, exclude_self=exclude_self,
    )


def ivfpq_build(
    corpus: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
) -> "IvfPqIndex":
    """Build an IVF-PQ index (r13 build/query split of the former
    one-shot ``ivfpq_topk`` body): train IVF centroids AND per-subspace
    PQ codebooks over the same materialized projection (both
    shuffle-free partial-sum Lloyd), then ONE Arrow pass appending the
    cell assignment and the ``m`` subspace codes per vector
    (:func:`_ivfpq_encode`). ``materialize=True`` backs the encoded
    corpus with executor blocks — BOTH the ADC scoring pass and the
    ``__cv`` re-rank join read it, so without blocks the encode kernel
    would run twice per query call (review r6 finding #6)."""
    c = _spread_for_python_stage(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    if materialize:
        c = _computed_once(c)
    id_type = dict(corpus.dtypes)[id_col]
    cents = _ivf_train_centroids(c, n_cells, iters, seed, "neighbor_id", "__cv")
    if cents is None:
        return IvfPqIndex(None, None, None, id_type)
    books = _pq_train_codebooks(c, m, n_codes, iters, seed,
                                "neighbor_id", "__cv")
    encoded = _ivfpq_encode(c, cents, books, id_type)
    if materialize:
        encoded = _computed_once(encoded)
    return IvfPqIndex(cents, books, encoded, id_type)


class IvfPqIndex:
    """A built (optionally persisted) IVF-PQ index — the canonical
    billion-scale ANN artifact (Jégou et al. 2011 §IV): IVF centroids
    bound the candidate set, per-subspace PQ codes bound the memory per
    candidate. ``encoded``: ``(neighbor_id, __cv, cell_id, __codes)``
    — the raw vector rides along for the exact re-rank stage."""

    def __init__(self, centroids, codebooks, encoded: "DataFrame | None",
                 id_type: str):
        self.centroids = centroids    # np.ndarray | None (empty corpus)
        self.codebooks = codebooks    # np.ndarray (m, n_codes, dsub) | None
        self.encoded = encoded
        self.id_type = id_type

    @property
    def n_cells(self) -> int:
        return 0 if self.centroids is None else len(self.centroids)


def _ivfpq_encode(c: DataFrame, cents, books, id_type: str) -> DataFrame:
    """ONE Arrow pass appending cell assignment + PQ codes against the
    broadcast centroid matrix and codebooks — shared by
    :func:`ivfpq_build` and :func:`ivfpq_index_append` (an increment
    MUST assign and encode with the saved parameters)."""
    import numpy as np

    sc = c.sparkSession.sparkContext
    bc_cents = sc.broadcast(np.asarray(cents))
    bc_books = sc.broadcast(books)
    enc_schema = (
        f"neighbor_id {id_type}, __cv array<double>, cell_id int, "
        "__codes array<int>"
    )

    def encode(batches):
        cm = bc_cents.value
        cb = bc_books.value
        mm, _, dd = cb.shape
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf["__cv"].tolist(), dtype=np.float64)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sv = vn.reshape(len(v), mm, dd)
            codes = np.empty((len(v), mm), dtype=np.int32)
            for j in range(mm):
                d2 = ((sv[:, j, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            pdf = pdf.copy()
            pdf["cell_id"] = np.argmax(vn @ cm.T, axis=1).astype("int32")
            pdf["__codes"] = list(codes)
            yield pdf

    return c.mapInPandas(encode, enc_schema)


def ivfpq_query(
    index: "IvfPqIndex",
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_collect_rows: int | None = 100_000,
) -> DataFrame:
    """Query a built :class:`IvfPqIndex`: each query probes its
    ``n_probe`` nearest cells, candidates are ADC-scored (broadcast
    per-query lookup tables over the code column only), the shortlist
    re-ranks by exact cosine. Candidates meet in a ``cell_id``
    equi-join, never a cross join; the probed cells additionally push
    down as a ``cell_id IN (...)`` scan filter, so a query batch over a
    PERSISTED index (:func:`ivfpq_save` — bucketed on ``cell_id``)
    reads ONLY the probed buckets (bucket pruning), not the corpus.

    Output: query_id, neighbor_id, cos_sim (rounded 6), rank.
    """
    import numpy as np

    empty_schema = (
        f"query_id {index.id_type}, neighbor_id {index.id_type}, "
        "cos_sim double, rank int"
    )
    if index.centroids is None:  # empty corpus: typed empty result
        return queries.sparkSession.createDataFrame([], empty_schema)
    cents = index.centroids
    books = index.codebooks
    n_probe = min(n_probe, len(cents))
    encoded = index.encoded
    sc = queries.sparkSession.sparkContext

    # query side: guarded collect -> ADC tables + probed cells
    _guard_driver_collect(
        queries, "ivfpq_query", max_collect_rows,
        "batch the query set (per-query ADC tables are driver state)",
    )
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).collect()
    if not qrows:
        return queries.sparkSession.createDataFrame([], empty_schema)
    q_ids = np.array([r["query_id"] for r in qrows])
    qm = np.array([r["__qv"] for r in qrows], dtype=np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    mm, kk, dd = books.shape
    tables = np.einsum("qmd,mkd->qmk", qn.reshape(len(qn), mm, dd), books)
    probed = np.argsort(-(qn @ np.asarray(cents).T), axis=1)[:, :n_probe]
    bc_tab = sc.broadcast({qid: tables[i] for i, qid in enumerate(q_ids)})

    probe_rows = [
        (qid.item() if hasattr(qid, "item") else qid, int(cell))
        for i, qid in enumerate(q_ids)
        for cell in probed[i]
    ]
    qp = queries.sparkSession.createDataFrame(
        probe_rows, f"query_id {index.id_type}, cell_id int"
    )

    # probed-cell pushdown: a filter, not just a join key, so the scan
    # of a bucketed persisted index prunes to the probed buckets
    cells = sorted({int(cell) for row in probed for cell in row})
    cand = F.broadcast(qp).join(
        encoded.filter(F.col("cell_id").isin(cells)), "cell_id"
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))

    adc_schema = (
        f"query_id {index.id_type}, neighbor_id {index.id_type}, "
        "__adc double"
    )

    def adc(batches):
        import pandas as pd

        tabs = bc_tab.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf["__codes"].tolist(), dtype=np.int64)
            out = np.empty(len(pdf))
            qcol = pdf["query_id"].to_numpy()
            for qid in pd.unique(qcol):
                mask = qcol == qid
                t = tabs[qid]
                out[mask] = t[np.arange(mm)[None, :], codes[mask]].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "__adc": out,
                }
            )

    scored = cand.select("query_id", "neighbor_id", "__codes").mapInPandas(
        adc, adc_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__adc").desc(), F.col("neighbor_id").asc()
    )
    short = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shortlist)
        .drop("__r", "__adc")
    )
    qv = queries.sparkSession.createDataFrame(
        [(r["query_id"], [float(x) for x in r["__qv"]]) for r in qrows],
        f"query_id {index.id_type}, __qv array<double>",
    )
    rer = (
        short.join(encoded.select("neighbor_id", "__cv"), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
    )
    sim = vec_dot("__qv", "__cv") / (
        F.sqrt(l2_norm_sq("__qv")) * F.sqrt(l2_norm_sq("__cv"))
    )
    rescored = rer.select("query_id", "neighbor_id", sim.alias("__sim"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("__sim", 6).alias("cos_sim"), "rank",
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_collect_rows: int | None = 100_000,
) -> DataFrame:
    """IVF routing + PQ codes (the canonical billion-scale ANN combo,
    Jégou et al. 2011 §IV): k-means cells bound the candidate set,
    per-subspace PQ codes bound the memory per candidate, exact cosine
    re-ranks the ADC shortlist. Compared to :func:`ivf_topk` the cell
    scan reads ``m`` int codes instead of the raw vector; compared to
    :func:`pq_topk` only ``n_probe/n_cells`` of the corpus is scored.

    One-shot convenience over the r13 build/query split — equals
    ``ivfpq_query(ivfpq_build(corpus, ...), queries, ...)``;
    batch-querying callers should hold the :class:`IvfPqIndex` (or
    persist it with :func:`ivfpq_save`) and call :func:`ivfpq_query`
    per batch. With ``n_probe == n_cells`` AND ``shortlist >= |corpus|``
    the pipeline degenerates to exact brute force (the q97 oracle
    contract).

    Output: query_id, neighbor_id, cos_sim (rounded 6), rank.
    """
    index = ivfpq_build(
        corpus, n_cells=n_cells, m=m, n_codes=n_codes, iters=iters,
        seed=seed, id_col=id_col, vec_col=vec_col, materialize=True,
    )
    return ivfpq_query(
        index, queries, k=k, n_probe=n_probe, shortlist=shortlist,
        id_col=id_col, vec_col=vec_col, exclude_self=exclude_self,
        max_collect_rows=max_collect_rows,
    )


def pq_save(index: PqIndex, table: str, path: str | None = None) -> None:
    """Persist a built PQ index across sessions: the encoded corpus
    (id + codes + raw vector for the re-rank stage) to ``table`` and
    the codebooks to a ``<table>__codebooks`` side table
    (``m · n_codes`` tiny rows). The codes column is the artifact that
    matters at 100 TB — ``m`` ints per vector; re-encoding a 100 TB
    corpus per session is the cost this avoids. Always overwrites
    (same contract as :func:`ivf_save`)."""
    if index.codebooks is None:
        raise ValueError("pq_save: empty index (corpus had no rows)")
    spark = index.encoded.sparkSession
    writer = index.encoded.write.mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    _write_small_table(
        spark, _codebook_rows(index.codebooks),
        "sub int, code int, word array<double>", f"{table}__codebooks",
        f"{path}__codebooks" if path else None,
    )


def pq_load(spark, table: str) -> PqIndex:
    """Rebuild a :class:`PqIndex` from :func:`pq_save` output — no
    training, no encode pass. Refreshes the catalog's cached file
    listing first (the :func:`ivf_load` stale-cache guard — appends
    from another session invalidate only the writer's own cache)."""
    import numpy as np

    _refresh_tables(spark, table, f"{table}__codebooks")
    rows = spark.table(f"{table}__codebooks").collect()
    if not rows:
        raise ValueError(
            f"pq_load: codebook table {table}__codebooks is empty — "
            "not a pq_save output (or the save was interrupted)"
        )
    mm = max(r["sub"] for r in rows) + 1
    kk = max(r["code"] for r in rows) + 1
    dd = len(rows[0]["word"])
    books = np.empty((mm, kk, dd), dtype=np.float64)
    for r in rows:
        books[r["sub"], r["code"]] = r["word"]
    encoded = spark.table(table)
    id_type = dict(encoded.dtypes)["neighbor_id"]
    return PqIndex(books, encoded, id_type)


def pq_index_append(
    increment: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_conflict: str = "error",
) -> None:
    """Accrete an embedding increment into a PERSISTED PQ index IN
    PLACE (r13 — completes the ANN-family accretion story alongside
    :func:`ivf_index_append` and ``minhash_index_append``): encode the
    increment against the index's SAVED codebooks (no retraining — one
    Arrow pass over the increment only) and append its rows to the
    encoded-corpus table. No bucketing is involved — PQ scoring is a
    columnar scan of the code column, not a keyed join — so a plain
    file append preserves the read path exactly; the existing corpus
    is never re-encoded and every existing byte is untouched.

    Refusals are loud (the :func:`ivf_index_append` contract, shared
    via ``_guard_index_increment``): an increment id already in the
    index (``on_conflict="skip"`` anti-joins it out instead — the
    idempotent streaming-ingest mode), an id type differing from the
    saved corpus, and a vector dimensionality differing from
    ``m · dsub`` of the trained codebooks (probed on one row — the
    wrong-embedding-family mistake).

    Honest drift caveat: codebooks stay FIXED across appends, so an
    increment whose distribution drifts from the training corpus
    quantizes with higher error — ADC shortlists degrade (the exact
    re-rank stage still corrects what the shortlist retains) until the
    next :func:`pq_index_rebuild`. Appended == same-codebook encoding
    is exact (pinned in tests/test_lsh_recall.py)."""
    import numpy as np

    spark = increment.sparkSession
    idx = pq_load(spark, table)
    books = np.asarray(idx.codebooks)
    increment = _guard_index_increment(
        increment, idx.encoded.select("neighbor_id"), id_col, vec_col,
        idx.id_type, int(books.shape[0] * books.shape[2]),
        "pq_index_append", on_conflict,
    )
    if increment is None:
        return
    c = _spread_for_python_stage(
        increment.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    _pq_encode(c, books, idx.id_type).write.mode("append").saveAsTable(table)


def pq_index_register(spark, table: str, path: str) -> PqIndex:
    """Re-register a persisted :func:`pq_save` layout in a FRESH
    session's catalog (the ``ivf_index_register`` doctrine, minus the
    bucket spec — PQ's read path is a columnar scan, so plain external
    tables over the existing files are exact). Idempotent per session:
    already-registered tables are left alone."""

    def _ddl(t: str, p: str) -> None:
        if not spark.catalog.tableExists(t):
            spark.sql(f"CREATE TABLE {t} USING PARQUET LOCATION '{p}'")

    _ddl(table, path)
    _ddl(f"{table}__codebooks", f"{path}__codebooks")
    return pq_load(spark, table)


def pq_index_rebuild(
    spark,
    table: str,
    path: str | None = None,
    m: int | None = None,
    n_codes: int | None = None,
    iters: int = 2,
    seed: int = 42,
) -> PqIndex:
    """Retrain a persisted PQ index from its own corpus and swap it in
    place — closes :func:`pq_index_append`'s codebook-drift caveat (the
    :func:`ivf_index_rebuild` pattern). Requires the raw vector column
    (``__cv``) in the saved corpus — a pure-memory-bound deployment
    that dropped it cannot retrain from the index alone and refuses
    loudly. Geometry (``m``, ``n_codes``) defaults to the saved
    codebooks'; the rebuilt encoding is materialized before the
    overwrite (lineage severed from the table being replaced), and
    ``path`` defaults to the saved layout's own location when the
    corpus table is EXTERNAL. Offline verb — not concurrent-safe
    against appends (the ``ivf_index_rebuild`` discipline)."""
    idx = pq_load(spark, table)
    if "__cv" not in idx.encoded.columns:
        raise ValueError(
            "pq_index_rebuild: the saved corpus has no __cv column "
            "(raw vectors were dropped for a memory-bound deployment) "
            "— rebuild from the original embedding source instead"
        )
    if m is None:
        m = int(idx.codebooks.shape[0])
    if n_codes is None:
        n_codes = int(idx.codebooks.shape[1])
    if path is None:
        path = _external_location(spark, table)
    rebuilt = pq_build(
        idx.encoded.select("neighbor_id", "__cv"),
        m=m, n_codes=n_codes, iters=iters, seed=seed,
        id_col="neighbor_id", vec_col="__cv", materialize=True,
    )
    pq_save(rebuilt, table, path=path)
    return pq_load(spark, table)


def ivfpq_save(index: "IvfPqIndex", table: str, buckets: int = 16,
               path: str | None = None) -> None:
    """Persist a built IVF-PQ index across sessions — the index a
    100 TB similarity deployment actually operates: the encoded corpus
    (id + raw vector + cell + codes) goes to a table BUCKETED on
    ``cell_id`` (so :func:`ivfpq_query`'s probed-cell pushdown prunes
    to the probed buckets), centroids and codebooks to tiny side
    tables, and a ``__meta`` geometry table written LAST (the
    :func:`ivf_save` crash-window discipline). Always overwrites;
    incremental growth goes through :func:`ivfpq_index_append`."""
    from flink_note_spark.operators.scale import write_bucketed

    if index.centroids is None:
        raise ValueError("ivfpq_save: empty index (corpus had no rows)")
    spark = index.encoded.sparkSession
    write_bucketed(
        index.encoded, table, buckets, ["cell_id"], path=path,
        mode="overwrite",
    )
    _write_small_table(
        spark, _centroid_rows(index.centroids),
        "cell_id int, centroid array<double>", f"{table}__centroids",
        f"{path}__centroids" if path else None,
    )
    mm, kk, _ = index.codebooks.shape
    _write_small_table(
        spark, _codebook_rows(index.codebooks),
        "sub int, code int, word array<double>", f"{table}__codebooks",
        f"{path}__codebooks" if path else None,
    )
    _write_small_table(
        spark,
        [(int(index.centroids.shape[1]), int(index.n_cells), int(mm),
          int(kk), int(buckets), index.id_type)],
        "dim int, n_cells int, m int, n_codes int, table_buckets int, "
        "id_type string",
        f"{table}__meta", f"{path}__meta" if path else None,
    )


def ivfpq_load(spark, table: str) -> "IvfPqIndex":
    """Rebuild an :class:`IvfPqIndex` from :func:`ivfpq_save` output —
    no training, no encode pass; ``encoded`` is the bucketed table
    scan. Refreshes the catalog's cached file listings first (the
    :func:`ivf_load` stale-cache guard)."""
    import numpy as np

    _refresh_tables(
        spark, table, f"{table}__centroids", f"{table}__codebooks",
    )
    crows = spark.table(f"{table}__centroids").collect()
    if not crows:
        raise ValueError(
            f"ivfpq_load: centroid table {table}__centroids is empty — "
            "not an ivfpq_save output (or the save was interrupted)"
        )
    cents = np.empty(
        (len(crows), len(crows[0]["centroid"])), dtype=np.float64
    )
    for r in crows:
        cents[r["cell_id"]] = r["centroid"]
    brows = spark.table(f"{table}__codebooks").collect()
    if not brows:
        raise ValueError(
            f"ivfpq_load: codebook table {table}__codebooks is empty — "
            "not an ivfpq_save output (or the save was interrupted)"
        )
    mm = max(r["sub"] for r in brows) + 1
    kk = max(r["code"] for r in brows) + 1
    dd = len(brows[0]["word"])
    books = np.empty((mm, kk, dd), dtype=np.float64)
    for r in brows:
        books[r["sub"], r["code"]] = r["word"]
    encoded = spark.table(table)
    id_type = dict(encoded.dtypes)["neighbor_id"]
    return IvfPqIndex(cents, books, encoded, id_type)


def ivfpq_index_append(
    increment: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_conflict: str = "error",
) -> None:
    """Accrete an embedding increment into a PERSISTED IVF-PQ index IN
    PLACE — assign AND encode against the SAVED centroids/codebooks
    (one Arrow pass over the increment only, ``_ivfpq_encode``) and
    append bucketed files; the existing corpus is never rescanned.
    Same refusal/skip contract as :func:`ivf_index_append`
    (``_guard_index_increment``), same drift caveat on BOTH fixed
    parameter sets (cells imbalance AND quantization error grow with
    distribution drift) — :func:`ivfpq_index_rebuild` closes it."""
    spark = increment.sparkSession
    idx = ivfpq_load(spark, table)
    increment = _guard_index_increment(
        increment, idx.encoded.select("neighbor_id"), id_col, vec_col,
        idx.id_type, int(idx.centroids.shape[1]),
        "ivfpq_index_append", on_conflict,
    )
    if increment is None:
        return
    from flink_note_spark.operators.dedup import _table_buckets
    from flink_note_spark.operators.scale import write_bucketed

    c = _spread_for_python_stage(
        increment.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    write_bucketed(
        _ivfpq_encode(c, idx.centroids, idx.codebooks, idx.id_type),
        table, _table_buckets(spark, table), ["cell_id"], mode="append",
    )


def ivfpq_index_register(
    spark, table: str, path: str, buckets: int | None = None
) -> "IvfPqIndex":
    """Re-register a persisted :func:`ivfpq_save` layout in a FRESH
    session's catalog (the :func:`ivf_index_register` doctrine) —
    without it the bucketed files still read, but the probed-cell
    pushdown loses its bucket pruning. Reads the geometry from
    ``{path}__meta``; ``buckets`` overrides only for meta-less saves."""
    _register_clustered_layout(
        spark, table, path, "ivfpq_index_register",
        ("__centroids", "__codebooks"), buckets,
    )
    return ivfpq_load(spark, table)


def ivfpq_index_rebuild(
    spark,
    table: str,
    path: str | None = None,
    n_cells: int | None = None,
    m: int | None = None,
    n_codes: int | None = None,
    iters: int = 2,
    seed: int = 42,
    buckets: int | None = None,
) -> "IvfPqIndex":
    """Retrain a persisted IVF-PQ index from its own corpus (the raw
    ``__cv`` column rides along exactly for this) and swap it in place
    — closes the drift caveat on both fixed parameter sets (the
    :func:`ivf_index_rebuild` pattern and discipline: offline verb,
    lineage severed by materialization before the overwrite, ``path``
    defaults to the external location). Geometry defaults to the saved
    index's."""
    from flink_note_spark.operators.dedup import _table_buckets

    idx = ivfpq_load(spark, table)
    if n_cells is None:
        n_cells = idx.n_cells
    if m is None:
        m = int(idx.codebooks.shape[0])
    if n_codes is None:
        n_codes = int(idx.codebooks.shape[1])
    if buckets is None:
        buckets = _table_buckets(spark, table)
    if path is None:
        path = _external_location(spark, table)
    rebuilt = ivfpq_build(
        idx.encoded.select("neighbor_id", "__cv"),
        n_cells=n_cells, m=m, n_codes=n_codes, iters=iters, seed=seed,
        id_col="neighbor_id", vec_col="__cv", materialize=True,
    )
    ivfpq_save(rebuilt, table, buckets=buckets, path=path)
    return ivfpq_load(spark, table)


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 4,
    seed: int = 42,
    centroids: "DataFrame | None" = None,
    max_cell: int | None = 5000,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (r9 — Abbas et
    al., "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication", arXiv:2303.09540): CLUSTER the embedding
    space and verify cosine only WITHIN each cluster — the clustered
    alternative to SRP-LSH bucketing
    (:func:`lsh_embedding_near_dup_pairs`): semantically close pairs
    share a cell with high probability and the pairwise work is
    bounded per cell, never corpus-wide.

    Two assignment paths, one verify:

    - ``centroids=None`` (the scale default): k-means cells via the
      shuffle-free partial-sum Lloyd trainer
      (:func:`_ivf_train_centroids`) + the Arrow assignment kernel —
      the 100 TB path; k-means is iterative, so this variant is
      rows-only for the oracle harness (the deterministic twin below
      is the exact gate).
    - ``centroids=<DataFrame (cell_id int, vec)>`` (the deterministic
      twin): assignment stays a PURE PLAN — the centroid frame is
      broadcast-crossed with the corpus, cosine evaluates in JVM
      expressions (``vec_dot``; sequential fold, so an independent SQL
      engine reproduces the argmax bit-for-bit — the q76 doctrine),
      and ties break to the smallest ``cell_id``. Fully
      SQL-expressible → DuckDB-oracle-backed.

    Verify: a ``cell``-keyed self-join (``d1 < d2``) + exact JVM
    cosine ≥ ``threshold``; cells above ``max_cell`` rows are dropped
    by anti-join (the flood doctrine — pass ``None`` to disable).
    Output: ``d1, d2, cos_sim`` (rounded 6).
    """
    base = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    if centroids is None:
        cents = _ivf_train_centroids(
            base, n_cells, iters, seed, "__id", "__v"
        )
        if cents is None:
            id_type = dict(corpus.dtypes)[id_col]
            return corpus.sparkSession.createDataFrame(
                [], f"d1 {id_type}, d2 {id_type}, cos_sim double"
            )
        assigned = _ivf_assign_cells(base, cents, "__v")
    else:
        c = centroids.select(
            F.col("cell_id").alias("__cell0"),
            F.col(centroids.columns[1]).alias("__cv"),
        )
        cos = vec_dot("__v", "__cv") / (
            F.sqrt(l2_norm_sq("__v")) * F.sqrt(l2_norm_sq("__cv"))
        )
        w = Window.partitionBy("__id").orderBy(
            F.col("__cos").desc(), F.col("__cell0").asc()
        )
        assigned = (
            base.crossJoin(F.broadcast(c))
            .withColumn("__cos", cos)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("__id", "__v", F.col("__cell0").alias("__cell"))
        )
    if max_cell is not None:
        hot = (
            assigned.groupBy("__cell")
            .agg(F.count(F.lit(1)).alias("__csz"))
            .filter(F.col("__csz") > max_cell)
            .select("__cell")
        )
        assigned = _computed_once(
            assigned.join(hot, ["__cell"], "left_anti")
        )
    x, y = assigned.alias("x"), assigned.alias("y")
    sim = vec_dot("v1", "v2") / (
        F.sqrt(l2_norm_sq("v1")) * F.sqrt(l2_norm_sq("v2"))
    )
    return (
        x.join(
            y,
            (F.col("x.__cell") == F.col("y.__cell"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("d1"),
            F.col("y.__id").alias("d2"),
            F.col("x.__v").alias("v1"),
            F.col("y.__v").alias("v2"),
        )
        .withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("d1", "d2", "cos_sim")
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_collect_rows: int | None = 100_000,
    keep_contaminated: bool = False,
) -> DataFrame:
    """EMBEDDING-space decontamination (r10) — the semantic complement
    of the 5-gram :func:`operators.dedup.decontaminate`: drop every
    corpus row whose cosine similarity to ANY benchmark vector reaches
    ``threshold`` (paraphrased eval leakage that no lexical n-gram
    overlap catches). ``keep_contaminated=True`` returns the REMOVED
    rows instead (the audit view), each with ``bench_max_sim``.

    Scale shape: the benchmark is small BY CONTRACT (eval suites are
    thousands of rows — ``max_collect_rows`` refuses bigger, the
    cosine_topk guard doctrine); it broadcasts once as a unit-
    normalized float64 matrix and the corpus streams through ONE
    ``mapInPandas`` blocked matmul — ZERO shuffles, no corpus
    collect, no join. The per-row verdict compares the SIX-DECIMAL-
    ROUNDED max similarity against the threshold so the decision is
    engine-portable (the q33 float doctrine).

    Output: the corpus columns plus ``bench_max_sim`` (rounded 6;
    −1.0 when the benchmark is empty — nothing can be contaminated).
    """
    import numpy as np
    import pandas as pd

    _guard_driver_collect(
        benchmark,
        "semantic_decontaminate",
        max_collect_rows,
        "shard the benchmark and union the per-shard removals",
    )
    from pyspark.sql.types import DoubleType, StructField, StructType

    brows = benchmark.select(F.col(vec_col).alias("__bv")).collect()
    # NOTE: StructType.add MUTATES in place — it would corrupt the
    # DataFrame's cached schema; build a fresh copy instead
    out_schema = StructType(
        list(corpus.schema.fields)
        + [StructField("bench_max_sim", DoubleType())]
    )
    if not brows:
        out = corpus.withColumn("bench_max_sim", F.lit(-1.0))
        return out.filter(F.lit(False)) if keep_contaminated else out
    bm = np.array([r["__bv"] for r in brows], dtype=np.float64)
    bm /= np.linalg.norm(bm, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast(bm)

    def score(batches):
        bmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(cm, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (cm / norms) @ bmat.T
            pdf = pdf.copy()
            pdf["bench_max_sim"] = np.round(sims.max(axis=1), 6)
            yield pdf

    scored = corpus.mapInPandas(score, out_schema)
    cond = F.col("bench_max_sim") >= float(threshold)
    return scored.filter(cond if keep_contaminated else ~cond)
