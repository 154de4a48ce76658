"""Sampling operators: determinism under repartitioning, split
stability, exact reservoir counts, mixture proportions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_note_spark.operators.sampling import (
    hash_split,
    mixture_sample,
    reservoir_per_key,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, source string").cache()


def test_hash_split_partitions_everything_once(corpus):
    out = hash_split(corpus, fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 3000
    assert set(counts) == {"train", "val", "test"}
    assert 2200 <= counts["train"] <= 2600  # Binomial around 2400


def test_hash_split_stable_under_repartition(corpus):
    a = {r.doc_id: r.split for r in hash_split(corpus).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(corpus.repartition(17)).collect()
    }
    assert a == b


def test_hash_split_new_rows_never_move_old_ones(spark):
    """Accretion safety: adding documents must not reassign existing ids
    (the property rand()-based splits lack)."""
    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r.doc_id: r.split for r in hash_split(small, fractions={"train": 0.9, "test": 0.1}).collect()}
    b = {r.doc_id: r.split for r in hash_split(big, fractions={"train": 0.9, "test": 0.1}).collect()}
    assert all(b[i] == a[i] for i in a)


def test_hash_split_rejects_bad_fractions(corpus):
    with pytest.raises(ValueError):
        hash_split(corpus, fractions={"a": 0.5, "b": 0.6})


def test_hash_split_md5_portable_family(corpus, spark):
    """hash_fn='md5' keeps every split invariant (total partition,
    repartition stability, accretion safety) and reproduces the
    documented cross-engine formula — 60 bits of md5('<id>:<seed>') —
    verified against DuckDB in the q91 driver oracle; here against a
    pure-Python md5 reference."""
    import hashlib

    out = hash_split(
        corpus, fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        hash_fn="md5",
    )
    got = {r.doc_id: r.split for r in out.collect()}
    assert len(got) == 3000

    def ref(i):
        u = (int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:15], 16)
             % 1_000_000_000) / 1_000_000_000
        return "train" if u < 0.8 else ("val" if u < 0.9 else "test")

    assert all(got[i] == ref(i) for i in range(3000))
    b = {
        r.doc_id: r.split
        for r in hash_split(
            corpus.repartition(13),
            fractions={"train": 0.8, "val": 0.1, "test": 0.1},
            hash_fn="md5",
        ).collect()
    }
    assert b == got
    with pytest.raises(ValueError, match="hash_fn"):
        hash_split(corpus, hash_fn="sha9000")


def test_stratified_sample_rates_and_determinism(corpus):
    out = stratified_sample(corpus, "source", {"web": 0.5, "books": 0.1})
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= {"web", "books"}  # code dropped (default 0)
    assert 400 <= counts["web"] <= 600      # ~500 of 1000
    assert 60 <= counts["books"] <= 140     # ~100 of 1000
    again = stratified_sample(corpus.repartition(13), "source", {"web": 0.5, "books": 0.1})
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_reservoir_exact_k_per_key(corpus):
    out = reservoir_per_key(corpus, ["source"], k=7)
    counts = [r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert counts == [7, 7, 7]
    # keys with fewer than k rows return all of them
    tiny = corpus.filter(F.col("doc_id") < 2)
    assert reservoir_per_key(tiny, ["source"], k=7).count() == 2


def test_reservoir_deterministic_and_uniformish(corpus):
    a = sorted(r.doc_id for r in reservoir_per_key(corpus, ["source"], 50).collect())
    b = sorted(
        r.doc_id
        for r in reservoir_per_key(corpus.repartition(11), ["source"], 50).collect()
    )
    assert a == b
    # different seed -> different sample (sanity that seed matters)
    c = sorted(
        r.doc_id for r in reservoir_per_key(corpus, ["source"], 50, seed=7).collect()
    )
    assert a != c


def test_mixture_sample_hits_target_shares(corpus):
    """3000 rows at 1000/source; weights 3:1 between web and books →
    books binds: take all 1000 books and ~ web at 3000 target... web
    has only 1000 < 3000 share → web binds instead: total = 1000/0.75
    = 1333 → books ≈ 333."""
    out = mixture_sample(corpus, "source", {"web": 0.75, "books": 0.25})
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"web", "books"}
    assert counts["web"] == 1000              # binding source: fraction 1.0 keeps all
    assert 260 <= counts["books"] <= 420      # ~333 Binomial


def test_mixture_sample_empty_weights_value_error(corpus):
    with pytest.raises(ValueError):
        mixture_sample(corpus, "source", {"web": 0.0})


def test_mixture_sample_unknown_sources_only(corpus):
    with pytest.warns(UserWarning, match="nonexistent"):
        out = mixture_sample(corpus, "source", {"nonexistent": 1.0})
    assert out.count() == 0


def test_mixture_sample_zero_weight_present_positive_absent(corpus):
    """ADVICE r4 #3: positive weight ONLY on an absent source used to
    crash with an opaque `min() arg is an empty sequence`; now it warns
    (the absent source binds the mixture) and returns empty."""
    with pytest.warns(UserWarning, match="ghost"):
        out = mixture_sample(
            corpus, "source", {"web": 0.0, "ghost": 1.0}
        )
    assert out.count() == 0


def test_mixture_sample_all_present_sources_zero_weight(corpus):
    """Zero-weight sources are excluded by definition — all-zero on the
    present ones (positive elsewhere) must be empty, not a crash."""
    with pytest.warns(UserWarning):
        out = mixture_sample(
            corpus, "source", {"web": 0.0, "books": 0.0, "ghost": 2.0}
        )
    assert out.count() == 0


def test_sampling_predicates_are_narrow(corpus):
    """Scale guard: hash_split and stratified_sample must add no
    Exchange — pure projection/filter over the scan."""
    for df in (
        hash_split(corpus),
        stratified_sample(corpus, "source", {"web": 0.5}),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


@pytest.fixture(scope="module")
def token_corpus(spark):
    """Docs with controlled token counts: source decides the vocabulary
    size bucket so per-source token totals differ sharply."""
    rows = []
    for i in range(600):
        src = ["web", "books", "code"][i % 3]
        n = {"web": 5, "books": 20, "code": 2}[src] + (i % 4)
        rows.append((i, src, " ".join(f"w{j}" for j in range(n))))
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).cache()


def _tbs_ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_token_budget_bucketed_equals_naive(token_corpus):
    """n_buckets=1 IS the naive single-window prefix rule; the bucketed
    default must select the identical row set (the decomposition
    equivalence argued in the operator docstring), in both hash
    families."""
    from flink_note_spark.operators.sampling import token_budget_sample

    w = {"web": 0.5, "books": 0.25, "code": 0.25}
    for hash_fn in ("xxhash64", "md5"):
        fast = token_budget_sample(
            token_corpus, "source", 1500, weights=w, hash_fn=hash_fn
        )
        naive = token_budget_sample(
            token_corpus, "source", 1500, weights=w, hash_fn=hash_fn,
            n_buckets=1,
        )
        assert _tbs_ids(fast) == _tbs_ids(naive), hash_fn


def test_token_budget_prefix_rule_exact(token_corpus, spark):
    """The selected set is EXACTLY the hash-order prefix: recompute the
    rule in Python from the collected (u, tokens) and compare ids."""
    from flink_note_spark.operators.sampling import (
        _unit_hash,
        token_budget_sample,
    )

    w = {"web": 0.5, "books": 0.25, "code": 0.25}
    budget = 1500.0
    rows = (
        token_corpus.withColumn("u", _unit_hash("doc_id", 42))
        .withColumn(
            "tok", F.size(F.split("text", r"\s+")).cast("long")
        )
        .select("doc_id", "source", "u", "tok")
        .collect()
    )
    totals = {}
    for r in rows:
        totals[r.source] = totals.get(r.source, 0) + r.tok
    shares = {k: v / 1.0 for k, v in w.items()}
    total = min(budget, min(totals[g] / shares[g] for g in shares))
    expected = []
    for g in shares:
        target = shares[g] * total
        cum = 0
        for r in sorted(
            (r for r in rows if r.source == g),
            key=lambda r: (r.u, r.doc_id),
        ):
            if cum < target:
                expected.append(r.doc_id)
            cum += r.tok
    out = token_budget_sample(token_corpus, "source", budget, weights=w)
    assert _tbs_ids(out) == sorted(expected)


def test_token_budget_shares_and_overshoot(token_corpus):
    """Each group's realized tokens land in [target, target + max_doc):
    the first-fit overshoot bound, and the binding group is fully kept
    when the budget exceeds corpus capacity."""
    from flink_note_spark.operators.sampling import token_budget_sample

    tok = F.size(F.split("text", r"\s+")).cast("long")
    w = {"web": 0.5, "books": 0.25, "code": 0.25}
    out = token_budget_sample(token_corpus, "source", 2000, weights=w)
    got = {
        r.source: r.t
        for r in out.withColumn("t", tok)
        .groupBy("source").agg(F.sum("t").alias("t")).collect()
    }
    max_doc = {
        r.source: r.m
        for r in token_corpus.withColumn("t", tok)
        .groupBy("source").agg(F.max("t").alias("m")).collect()
    }
    targets = {"web": 1000.0, "books": 500.0, "code": 500.0}
    for g, t in targets.items():
        assert t <= got[g] < t + max_doc[g], (g, got[g], t)

    # Budget way past capacity: total shrinks to min_g T_g/share_g and
    # the BINDING group (argmin of that ratio) keeps every document —
    # its target equals its total exactly.
    totals = {
        r.source: r.t
        for r in token_corpus.withColumn("t", tok)
        .groupBy("source").agg(F.sum("t").alias("t")).collect()
    }
    binding = min(w, key=lambda g: totals[g] / w[g])
    big = token_budget_sample(token_corpus, "source", 10**9, weights=w)
    kept = big.filter(F.col("source") == binding).count()
    assert kept == token_corpus.filter(F.col("source") == binding).count()


def test_token_budget_alpha_temperature(token_corpus):
    """alpha=0 targets a UNIFORM token mixture regardless of the skewed
    empirical shares; alpha=1 keeps the natural mixture (shares ∝ group
    totals)."""
    from flink_note_spark.operators.sampling import token_budget_sample

    tok = F.size(F.split("text", r"\s+")).cast("long")

    def sums(df):
        return {
            r.source: r.t
            for r in df.withColumn("t", tok)
            .groupBy("source").agg(F.sum("t").alias("t")).collect()
        }

    flat = sums(token_budget_sample(token_corpus, "source", 1200, alpha=0.0))
    assert max(flat.values()) - min(flat.values()) < 30  # ~400 each ± one doc

    natural = sums(token_budget_sample(token_corpus, "source", 1200, alpha=1.0))
    totals = sums(token_corpus)
    grand = sum(totals.values())
    for g, t in natural.items():
        target = 1200 * totals[g] / grand
        assert target <= t < target + 30, (g, t, target)


def test_token_budget_token_col_and_determinism(token_corpus):
    """A precomputed token column is honored; the selection is stable
    under repartitioning (pure function of row identity)."""
    from flink_note_spark.operators.sampling import token_budget_sample

    pre = token_corpus.withColumn(
        "n_tok", F.size(F.split("text", r"\s+"))
    )
    a = token_budget_sample(
        pre, "source", 900, weights={"web": 1.0}, token_col="n_tok"
    )
    b = token_budget_sample(
        pre.repartition(13), "source", 900,
        weights={"web": 1.0}, token_col="n_tok",
    )
    assert _tbs_ids(a) == _tbs_ids(b)
    assert all(r.source == "web" for r in a.select("source").collect())
    # schema passthrough: original columns, helper columns gone
    assert a.columns == pre.columns


def test_token_budget_weight_corners(token_corpus):
    """mixture_sample doctrine: zero-weight groups are excluded; a
    positive-weight group with no rows warns and empties the output."""
    from flink_note_spark.operators.sampling import token_budget_sample

    out = token_budget_sample(
        token_corpus, "source", 500,
        weights={"web": 1.0, "books": 0.0},
    )
    assert all(r.source == "web" for r in out.select("source").collect())
    assert out.count() > 0

    with pytest.warns(UserWarning, match="bind the mixture"):
        empty = token_budget_sample(
            token_corpus, "source", 500,
            weights={"web": 0.5, "papers": 0.5},
        )
    assert empty.count() == 0


def test_token_budget_validation(token_corpus):
    from flink_note_spark.operators.sampling import token_budget_sample

    with pytest.raises(ValueError, match="exactly one"):
        token_budget_sample(token_corpus, "source", 100)
    with pytest.raises(ValueError, match="exactly one"):
        token_budget_sample(
            token_corpus, "source", 100, weights={"web": 1.0}, alpha=0.5
        )
    with pytest.raises(ValueError, match="positive"):
        token_budget_sample(token_corpus, "source", 0, weights={"web": 1.0})
    with pytest.raises(ValueError, match="alpha"):
        token_budget_sample(token_corpus, "source", 100, alpha=1.5)
    with pytest.raises(ValueError, match="n_buckets"):
        token_budget_sample(
            token_corpus, "source", 100, weights={"web": 1.0}, n_buckets=0
        )
    with pytest.raises(ValueError, match="sum to a positive"):
        token_budget_sample(
            token_corpus, "source", 100, weights={"web": 0.0}
        )


def test_q58_oracle_hash_is_sparks_xxhash64(spark):
    """The r14 q58 DuckDB oracle replays Spark's ``xxhash64(long, 42)``
    in HUGEINT arithmetic; pin the hash stage bit-for-bit on ids the
    fixture never exercises (zero, negatives, both int64 extremes)."""
    import duckdb

    from flink_note_spark.queries.llm import _Q58_SQL

    # -(2**63) exactly is excluded: DuckDB 1.0 trips an INT128→INT64
    # conversion corner on the unsigned-wrap expression for that single
    # value (u0 == 2**63); one off the edge exercises the same wrap.
    ids = [
        0, 1, -1, 2, 42, -42, 999_999_937, -999_999_937,
        2**31 - 1, -(2**31), 2**32, 2**62, -(2**62),
        2**63 - 1, -(2**63) + 1, 1234567890123456789,
    ]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    want = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", F.xxhash64("doc_id", F.lit(42)).alias("h")
        ).collect()
    }

    hash_cte = _Q58_SQL[: _Q58_SQL.rindex("SELECT split,")]
    probe = hash_cte + (
        "SELECT doc_id, CAST((hu + 9223372036854775808::HUGEINT) "
        "% 18446744073709551616::HUGEINT "
        "- 9223372036854775808::HUGEINT AS BIGINT) AS h "
        "FROM x20"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}::BIGINT)" for i in ids)
        + ") t(doc_id)"
    )
    got = dict(con.execute(probe).fetchall())
    assert got == want
