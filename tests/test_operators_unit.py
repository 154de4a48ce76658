"""Per-operator unit tests on small inline DataFrames (SURVEY.md §5.3):
null, empty-input, duplicate-key and boundary edge cases that the
fixture-driven differential suite can't isolate.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_note_spark.operators.dedup import exact_dedup, jaccard_pairs
from flink_note_spark.operators.joins import asof_join, range_join
from flink_note_spark.operators.windows import sessionize, topk_per_group


def _ts(m: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


# --- asof_join -----------------------------------------------------------

def _asof_frames(spark):
    trades = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 101.0), (2, _ts(15), 200.0)],
        "sym long, t timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [(1, _ts(9), 99.5), (1, _ts(10), 99.9), (1, _ts(19), 100.5),
         (2, _ts(30), 201.0)],
        "sym long, qt timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_exact_match_and_no_match(spark):
    trades, quotes = _asof_frames(spark)
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt",
        right_cols=["bid"],
    )
    rows = {(r.sym, r.t.minute, r.bid) for r in out.collect()}
    # trade@10 sees quote@10 (equal timestamps match backward);
    # trade@20 sees quote@19; sym 2's only quote is in the FUTURE → null
    assert rows == {(1, 10, 99.9), (1, 20, 100.5), (2, 15, None)}


def test_asof_forward(spark):
    trades, quotes = _asof_frames(spark)
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt",
        right_cols=["bid"], direction="forward",
    )
    rows = {(r.sym, r.t.minute, r.bid) for r in out.collect()}
    assert rows == {(1, 10, 99.9), (1, 20, None), (2, 15, 201.0)}


def test_asof_rejects_colliding_columns(spark):
    trades, quotes = _asof_frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades, quotes.withColumnRenamed("bid", "px"),
            on="sym", left_time="t", right_time="qt", right_cols=["px"],
        )


def test_asof_empty_right(spark):
    trades, quotes = _asof_frames(spark)
    out = asof_join(
        trades, quotes.filter(F.lit(False)), on="sym",
        left_time="t", right_time="qt", right_cols=["bid"],
    )
    assert out.count() == 3
    assert all(r.bid is None for r in out.collect())


# --- temporal_join (FOR SYSTEM_TIME AS OF, r7) ---------------------------

def _temporal_frames(spark):
    # versioned dimension: key 1 has price 10 from t=0, 20 from t=20;
    # key 2's first version only appears at t=50
    dim = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(20), 20.0), (2, _ts(50), 99.0)],
        "k long, vfrom timestamp, price double",
    )
    fact = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(20), "b"), (1, _ts(25), "c"),
         (2, _ts(40), "d"), (3, _ts(10), "e")],
        "k long, t timestamp, tag string",
    )
    return fact, dim


@pytest.mark.parametrize("strategy", ["union_window", "interval"])
def test_temporal_join_inner(spark, strategy):
    from flink_note_spark.operators.joins import temporal_join

    fact, dim = _temporal_frames(spark)
    out = temporal_join(
        fact, dim, on="k", fact_time="t", valid_from="vfrom",
        how="inner", strategy=strategy,
    )
    rows = {(r.k, r.tag, r.price) for r in out.collect()}
    # t=20 picks the version effective AT 20 (inclusive lower bound);
    # key 2's fact predates its first version; key 3 has no versions
    assert rows == {(1, "a", 10.0), (1, "b", 20.0), (1, "c", 20.0)}


@pytest.mark.parametrize("strategy", ["union_window", "interval"])
def test_temporal_join_left(spark, strategy):
    from flink_note_spark.operators.joins import temporal_join

    fact, dim = _temporal_frames(spark)
    out = temporal_join(
        fact, dim, on="k", fact_time="t", valid_from="vfrom",
        how="left", strategy=strategy,
    )
    rows = {(r.k, r.tag, r.price) for r in out.collect()}
    assert rows == {
        (1, "a", 10.0), (1, "b", 20.0), (1, "c", 20.0),
        (2, "d", None), (3, "e", None),
    }


def test_temporal_join_strategies_agree_randomized(spark):
    """The two physical strategies are INDEPENDENT plans (running
    window fill vs interval equi-join) — they must agree on a
    randomized versioned history (seeded, deterministic)."""
    import random

    from flink_note_spark.operators.joins import temporal_join

    rng = random.Random(7)
    dim_rows = [
        (k, _ts(m), float(k * 100 + i))
        for k in range(1, 6)
        for i, m in enumerate(sorted(rng.sample(range(100), 6)))
    ]
    fact_rows = [
        (rng.randint(1, 7), _ts(rng.randint(0, 110)), j)
        for j in range(80)
    ]
    dim = spark.createDataFrame(
        dim_rows, "k long, vfrom timestamp, price double"
    )
    fact = spark.createDataFrame(fact_rows, "k long, t timestamp, j long")
    got = {}
    for s in ("union_window", "interval"):
        out = temporal_join(
            fact, dim, on="k", fact_time="t", valid_from="vfrom",
            how="left", strategy=s,
        )
        got[s] = sorted((r.k, r.j, r.price) for r in out.collect())
    assert got["union_window"] == got["interval"]
    assert len(got["interval"]) == 80  # left join preserves every fact


def test_temporal_join_rejects_collisions_and_bad_args(spark):
    from flink_note_spark.operators.joins import temporal_join

    fact, dim = _temporal_frames(spark)
    with pytest.raises(ValueError, match="collide"):
        temporal_join(
            fact, dim.withColumnRenamed("price", "tag"),
            on="k", fact_time="t", valid_from="vfrom",
        )
    with pytest.raises(ValueError, match="how"):
        temporal_join(fact, dim, "k", "t", "vfrom", how="outer")
    with pytest.raises(ValueError, match="strategy"):
        temporal_join(fact, dim, "k", "t", "vfrom", strategy="bogus")


# --- range_join ----------------------------------------------------------

def test_range_join_boundaries(spark):
    """lo is inclusive, hi exclusive — exactly as composed by the caller."""
    left = spark.createDataFrame([(1, 10), (1, 20), (1, 30)], "k long, v long")
    right = spark.createDataFrame([(1, 10, 20)], "k long, lo long, hi long")
    out = range_join(
        left, right,
        equi=left.k == right.k,
        lo=F.col("v") >= F.col("lo"),
        hi=F.col("v") < F.col("hi"),
    )
    assert [r.v for r in out.collect()] == [10]


# --- sessionize ----------------------------------------------------------

def test_sessionize_gap_boundary(spark):
    """A gap of EXACTLY gap_seconds does not split; one microsecond more
    does."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(20.0000001))],
        "uid long, ts timestamp",
    )
    out = sessionize(df, key="uid", ts="ts", gap_seconds=600)
    sess = [r.session_id for r in out.orderBy("ts").collect()]
    assert sess == [1, 1, 2]


def test_sessionize_single_and_empty(spark):
    one = spark.createDataFrame([(1, _ts(0))], "uid long, ts timestamp")
    assert sessionize(one, "uid", "ts", 60).collect()[0].session_id == 1
    empty = one.filter(F.lit(False))
    assert sessionize(empty, "uid", "ts", 60).count() == 0


# --- topk_per_group ------------------------------------------------------

def test_topk_deterministic_under_ties(spark):
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 5.0), ("b", 4, 1.0)],
        "g string, id long, score double",
    )
    out = topk_per_group(
        df, ["g"], [F.desc("score"), F.asc("id")], k=2
    )
    got = {(r.g, r.id, r.rn) for r in out.collect()}
    assert got == {("a", 1, 1), ("a", 2, 2), ("b", 4, 1)}


# --- exact_dedup ---------------------------------------------------------

def test_exact_dedup_normalization_toggle(spark):
    df = spark.createDataFrame(
        [(1, "Hello "), (2, "hello"), (3, "other")], "doc_id long, text string"
    )
    norm = exact_dedup(df, "text", "doc_id", normalize=True)
    assert {(r.keep_doc_id, r.n_copies) for r in norm.collect()} == {(1, 2), (3, 1)}
    raw = exact_dedup(df, "text", "doc_id", normalize=False)
    assert raw.count() == 3  # no rows collapse without normalization


def test_exact_dedup_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = exact_dedup(df, "text", "doc_id").collect()
    by_hash = {r.content_hash: r.n_copies for r in out}
    # two empty strings collapse; NULL text hashes to NULL (its own row)
    assert sorted(by_hash.values()) == [1, 2]


# --- jaccard_pairs -------------------------------------------------------

def test_cosine_topk_string_ids_and_empty_queries(spark):
    """The numpy-backed scorer inherits the id type (not hardcoded long)
    and returns an empty frame for an empty query set instead of
    crashing."""
    from flink_note_spark.operators.similarity import cosine_topk

    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    out = cosine_topk(
        corpus.filter(F.col("vec_id") == "a"), corpus, k=1
    ).collect()
    assert [(r.query_id, r.neighbor_id) for r in out] == [("a", "b")]

    empty = cosine_topk(corpus.filter(F.lit(False)), corpus, k=1)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]


def test_cosine_topk_guard_refuses_big_query_side(spark):
    """The driver-collect kernels refuse unbounded sides (theta_join-style
    guard, VERDICT r2 item 3) instead of silently OOMing the driver at
    scale; max_collect_rows=None is the explicit opt-out."""
    from flink_note_spark.operators.similarity import (
        cosine_topk,
        embedding_near_dup_pairs,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="cosine_topk"):
        cosine_topk(corpus, corpus, k=1, max_collect_rows=5)
    with pytest.raises(ValueError, match="embedding_near_dup_pairs"):
        embedding_near_dup_pairs(corpus, threshold=0.5, max_collect_rows=5)
    # opt-out still works, and the broadcast path returns correct pairs
    out = embedding_near_dup_pairs(corpus, threshold=0.999, max_collect_rows=None)
    assert out.count() > 0


def test_pairwise_dedup_defends_against_duplicate_ids(spark):
    """ADVICE r2 #2: a corpus with a repeated doc id must not corrupt
    pair scores — the public entry points collapse to one row per id by
    default (ids_unique=True skips the defensive shuffle)."""
    from flink_note_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    txt = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        [("a", txt), ("a", txt), ("b", txt)],  # id "a" appears twice
        "doc_id string, text string",
    )
    jp = jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert [(r.d1, r.d2, r.jaccard) for r in jp] == [("a", "b", 1.0)]
    mh = minhash_lsh_pairs(df, num_hashes=16, bands=4, threshold=0.5).collect()
    assert [(r.d1, r.d2) for r in mh] == [("a", "b")]
    sp = simhash_pairs(df, max_hamming=3).collect()
    assert [(r.d1, r.d2, r.hamming) for r in sp] == [("a", "b", 0)]


def test_pairwise_ops_leave_no_cached_frames(spark):
    """ADVICE r2 #3: the persisted intermediates (shingles, band rows,
    LSH buckets) must be unpersisted before the operator returns — a
    long-lived session running many dedup jobs must not accumulate
    CacheManager entries."""
    from flink_note_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
    from flink_note_spark.operators.similarity import lsh_embedding_near_dup_pairs

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"tok{i} " * 3 + "w1 w2 w3 w4 w5") for i in range(20)],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5, 0.1]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    jaccard_pairs(docs, threshold=0.5).collect()
    minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.5).collect()
    simhash_pairs(docs).collect()
    lsh_embedding_near_dup_pairs(vecs, threshold=0.9, dim=4, n_bits=4).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "a pairwise operator left a persisted frame behind"
    )


def test_jaccard_short_docs_produce_no_shingles(spark):
    """Documents shorter than n words generate nothing — no crash, no
    pairs."""
    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "")], "doc_id long, text string"
    )
    assert jaccard_pairs(df, n=3, threshold=0.1).count() == 0


def test_jaccard_identical_docs_score_one(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z y x w v")],
        "doc_id long, text string",
    )
    rows = jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert [(r.d1, r.d2, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_ivf_topk_empty_corpus_returns_typed_empty(spark):
    """Empty corpus → typed empty result (same contract as cosine_topk),
    not a numpy AxisError from centroid training."""
    from flink_note_spark.operators.similarity import ivf_topk

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    out = ivf_topk(q, emb, k=3, n_cells=4, n_probe=2)
    assert out.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]
    assert out.count() == 0


def test_python_stage_spread_skips_rdd_probe_on_shuffled_input(spark):
    """Probing .rdd on an adaptive plan with an upstream Exchange forces
    AQE to EXECUTE the shuffle stages at plan-construction time (the
    dropDuplicates would run twice). The spread helper must therefore
    never touch .rdd when the plan already shuffles — asserted by making
    the probe explode."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from flink_note_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e"), (1, "a b c d e"), (2, "a b c d f")],
        "doc_id long, text string",
    )

    def _boom(self):
        raise AssertionError(".rdd probed on a shuffled plan")

    with mock.patch.object(DataFrame, "rdd", property(_boom)):
        # ids_unique=False adds a dropDuplicates Exchange upstream of the
        # Python stage in both operators — the probe must be skipped.
        minhash_lsh_pairs(
            df, "doc_id", "text", n=2, num_hashes=8, bands=4,
            threshold=0.1, verify=False, ids_unique=False,
        )
        simhash_pairs(df, "doc_id", "text", ids_unique=False)


def test_clean_text_redacts_and_collapses(spark):
    from flink_note_spark.operators.text import clean_text

    df = spark.createDataFrame(
        [
            (1, "see https://example.com/x?q=1 and mail bob@test.org  now"),
            (2, "tabs\tand\x00control\x07chars   here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.text for r in clean_text(df).collect()}
    assert rows[1] == "see <url> and mail <email> now"
    assert rows[2] == "tabs and control chars here"
    assert rows[3] is None


def test_clean_text_is_scan_stage_only(spark):
    from flink_note_spark.operators.text import clean_text

    df = spark.createDataFrame([(1, "a  b")], "doc_id long, text string")
    plan = clean_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_clean_text_out_col_and_toggles(spark):
    from flink_note_spark.operators.text import clean_text

    df = spark.createDataFrame(
        [(1, "keep https://u.rl here")], "doc_id long, text string"
    )
    out = clean_text(df, out_col="cleaned", redact_urls=False).collect()[0]
    assert out.text == "keep https://u.rl here"
    assert out.cleaned == "keep https://u.rl here"
    red = clean_text(df, out_col="cleaned").collect()[0]
    assert red.cleaned == "keep <url> here"


def test_cogroup_apply_outer_groups(spark):
    """Keys on only one side still fire with an empty opposite group —
    Flink CoGroupFunction semantics. The example computes per-key
    set-difference sizes, which a join cannot express without double
    aggregation."""
    import pandas as pd

    from flink_note_spark.operators.cogroup import cogroup_apply

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    right = spark.createDataFrame(
        [(1, "b"), (3, "z")], "k long, v string"
    )

    def diff_sizes(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        k = (lg if len(lg) else rg)["k"].iloc[0]
        ls, rs = set(lg["v"]), set(rg["v"])
        return pd.DataFrame(
            {"k": [k], "only_left": [len(ls - rs)], "only_right": [len(rs - ls)]}
        )

    out = {
        r.k: (r.only_left, r.only_right)
        for r in cogroup_apply(
            left, right, ["k"], diff_sizes, "k long, only_left int, only_right int"
        ).collect()
    }
    assert out == {1: (1, 0), 2: (1, 0), 3: (0, 1)}


def test_cogroup_apply_bucketed_equals_raw(spark):
    """buckets=n bounds Spark-level Python calls by construction while
    keeping per-key outer-group semantics identical to the raw mode —
    including one-side-only keys landing in a bucket with an empty
    opposite slice, and results stable across bucket counts."""
    import pandas as pd

    from flink_note_spark.operators.cogroup import cogroup_apply

    left = spark.createDataFrame(
        [(k, f"l{k}_{i}") for k in range(20) for i in range(k % 3 + 1)],
        "k long, v string",
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(10, 30)], "k long, v string"
    )

    def summarize(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        k = (lg if len(lg) else rg)["k"].iloc[0]
        return pd.DataFrame(
            {"k": [k], "nl": [len(lg)], "nr": [len(rg)]}
        )

    schema = "k long, nl int, nr int"
    raw = sorted(
        map(tuple, cogroup_apply(left, right, ["k"], summarize, schema)
            .collect())
    )
    assert len(raw) == 30  # keys 0..29, outer
    for n in (1, 4, 64):  # incl. buckets >> keys and a single bucket
        got = sorted(
            map(tuple, cogroup_apply(
                left, right, ["k"], summarize, schema, buckets=n
            ).collect())
        )
        assert got == raw, f"buckets={n}"


def test_cogroup_apply_bucketed_empty_and_errors(spark):
    import pandas as pd

    from flink_note_spark.operators.cogroup import cogroup_apply

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(2, "b")], "k long, v string")

    def nothing(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [], "n": []})

    # a bucket whose every per-key call returns empty must still yield a
    # well-formed empty frame
    assert cogroup_apply(
        left, right, ["k"], nothing, "k long, n int", buckets=2
    ).count() == 0
    with pytest.raises(ValueError, match="buckets"):
        cogroup_apply(left, right, ["k"], nothing, "k long, n int", buckets=0)


def test_tagged_union_connect_pattern(spark):
    from flink_note_spark.streaming.ops import tagged_union

    orders = spark.createDataFrame([(1, 10.0)], "user_id long, amount double")
    clicks = spark.createDataFrame([(1, "home")], "user_id long, page string")
    merged = tagged_union(orders, clicks)
    rows = sorted(
        ((r.user_id, r["__source"], r.amount, r.page) for r in merged.collect()),
        key=lambda t: t[1],
    )
    assert rows == [(1, "left", 10.0, None), (1, "right", None, "home")]


def test_frequent_tokens_orders_and_caps(spark):
    from flink_note_spark.operators.text import frequent_tokens

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog and the bird"),
            (2, "the dog runs"),
        ],
        "doc_id long, text string",
    )
    rows = frequent_tokens(df, k=3, min_count=2).collect()
    assert [(r.token, r.n) for r in rows] == [("the", 4), ("and", 2), ("dog", 2)]
    # min_count filters singletons even within k
    all_rows = frequent_tokens(df, k=100, min_count=2).collect()
    assert all(r.n >= 2 for r in all_rows)


def test_frequent_tokens_raw_whitespace(spark):
    """ADVICE r4 #2: whitespace runs must not yield "" tokens, and
    tabs/newlines must split — raw (uncleaned) corpora previously put
    "" and newline-glued pseudo-tokens at the top of the list."""
    from flink_note_spark.operators.text import frequent_tokens

    df = spark.createDataFrame(
        [
            (1, "the  cat\tthe dog\nthe bird"),
            (2, "  the fox  "),
        ],
        "doc_id long, text string",
    )
    rows = frequent_tokens(df, k=10, min_count=1).collect()
    toks = {r.token: r.n for r in rows}
    assert "" not in toks
    assert toks["the"] == 4
    assert not any("\n" in t or "\t" in t for t in toks)


def test_exact_dedup_rows_keeps_smallest_id_full_row(spark):
    from flink_note_spark.operators.dedup import exact_dedup_rows

    df = spark.createDataFrame(
        [
            (3, "Hello World ", "a"),
            (1, "hello world", "b"),     # same normalized content, min id
            (2, "other", "c"),
            (9, "HELLO WORLD", "d"),
        ],
        "doc_id long, text string, payload string",
    )
    rows = {(r.doc_id, r.payload) for r in exact_dedup_rows(df).collect()}
    assert rows == {(1, "b"), (2, "c")}
    # normalize=False treats the variants as distinct
    raw = exact_dedup_rows(df, normalize=False)
    assert raw.count() == 4
    # partitioning-independent
    rows2 = {
        (r.doc_id, r.payload)
        for r in exact_dedup_rows(df.repartition(5)).collect()
    }
    assert rows2 == rows


def test_exact_dedup_rows_null_text_rows_all_pass_through(spark):
    """NULL text is absent content, not duplicate content: every
    NULL-text row survives (sha2(NULL) is NULL and would otherwise
    gather them into one window partition and drop all but one)."""
    from flink_note_spark.operators.dedup import exact_dedup_rows

    df = spark.createDataFrame(
        [(1, None, "a"), (2, None, "b"), (3, "x", "c"), (4, "x", "d")],
        "doc_id long, text string, payload string",
    )
    rows = {(r.doc_id, r.payload) for r in exact_dedup_rows(df).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_cogroup_bucketed_null_keys_one_group(spark):
    """Review r6 #2: a NULL key present on both sides must reach fn as
    ONE outer group in bucketed mode, exactly like the raw path."""
    import pandas as pd

    from flink_note_spark.operators.cogroup import cogroup_apply

    left = spark.createDataFrame([(None, 1.0), (1, 2.0)], "k long, v double")
    right = spark.createDataFrame([(None, 10.0), (1, 20.0)], "k long, v double")

    def counts(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        src = lg if len(lg) else rg
        k = src["k"].iloc[0]
        k = None if pd.isna(k) else int(k)
        return pd.DataFrame({"k": [k], "nl": [len(lg)], "nr": [len(rg)]})

    schema = "k long, nl int, nr int"
    raw = sorted(
        map(tuple, cogroup_apply(left, right, ["k"], counts, schema)
            .collect()),
        key=repr,
    )
    bucketed = sorted(
        map(tuple, cogroup_apply(left, right, ["k"], counts, schema,
                                 buckets=2).collect()),
        key=repr,
    )
    assert bucketed == raw
    assert (None, 1, 1) in bucketed


def test_cogroup_schema_names_nested_types(spark):
    """Review r6 #5: empty-bucket frames must use bracket-aware DDL
    parsing — map/struct/decimal commas are not field separators."""
    import pandas as pd

    from flink_note_spark.operators.cogroup import _schema_names, cogroup_apply

    assert _schema_names("k long, m map<string,int>, d decimal(10,2)") == [
        "k", "m", "d"
    ]
    assert _schema_names("`k` long, s struct<a:int,b:int>") == ["k", "s"]

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(2, "b")], "k long, v string")

    def nothing(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [], "m": []})

    out = cogroup_apply(
        left, right, ["k"], nothing, "k long, m map<string,int>", buckets=2
    )
    assert out.count() == 0


# --- iterate (Flink iterate() analogue) ----------------------------------

def test_iterate_converges_transitive_closure(spark):
    """Pointer-jumping min-label propagation over a 6-node chain reaches
    the fixpoint and stops BEFORE max_iters (checksum criterion), with
    per-round materialization keeping lineage flat."""
    from flink_note_spark.operators.iterate import iterate

    # chain 0<-1<-2<-3<-4<-5: label[i] starts at i; each round takes
    # min(label[i], label[parent(i)]) -> converges to all-zeros in
    # ceil(log2(5)) pointer-jumping rounds... we do simple propagation
    # (one hop per round): 5 rounds to converge, 6th detects fixpoint
    df = spark.createDataFrame(
        [(i, i, max(i - 1, 0)) for i in range(6)],
        "node long, label long, parent long",
    )

    calls = []

    def step(d, i):
        calls.append(i)
        lbl = d.select(
            F.col("node").alias("p"), F.col("label").alias("plabel")
        )
        return (
            d.join(lbl, d.parent == F.col("p"), "left")
            .select(
                "node",
                F.least("label", "plabel").alias("label"),
                "parent",
            )
        )

    out = iterate(df, step, max_iters=20)
    assert [r.label for r in out.orderBy("node").collect()] == [0] * 6
    # fixpoint detected: 5 productive rounds + 1 no-change round, not 20
    assert len(calls) <= 7


def test_iterate_edge_cases(spark):
    from flink_note_spark.operators.iterate import iterate

    df = spark.createDataFrame([(1,)], "x long")
    assert iterate(df, lambda d, i: d, 0).collect() == df.collect()
    with pytest.raises(ValueError, match="max_iters"):
        iterate(df, lambda d, i: d, -1)
    with pytest.raises(ValueError, match="schema"):
        iterate(df, lambda d, i: d.withColumn("y", F.lit(1)), 3)

    # custom convergence criterion wins over the checksum
    ran = []

    def step(d, i):
        ran.append(i)
        return d.select((F.col("x") + 1).alias("x"))

    out = iterate(
        df, step, max_iters=10,
        converged=lambda prev, cur: cur.collect()[0].x >= 3,
    )
    assert out.collect()[0].x == 3 and len(ran) == 2


def test_count_window_batch_semantics(spark):
    """Tumbling count windows: deterministic (ts, tiebreak) order,
    0-based ids, final partial window kept; size validation."""
    from flink_note_spark.operators.windows import count_window

    df = spark.createDataFrame(
        [(1, _ts(i), i) for i in range(5)] + [(2, _ts(0), 99)],
        "k long, ts timestamp, eid long",
    )
    out = count_window(df, key="k", ts="ts", size=2, tiebreak="eid")
    got = {(r.k, r.eid): r.window_id for r in out.collect()}
    assert got == {(1, 0): 0, (1, 1): 0, (1, 2): 1, (1, 3): 1,
                   (1, 4): 2, (2, 99): 0}
    # repartition-stable
    got2 = {
        (r.k, r.eid): r.window_id
        for r in count_window(
            df.repartition(7), key="k", ts="ts", size=2, tiebreak="eid"
        ).collect()
    }
    assert got2 == got
    with pytest.raises(ValueError, match="size"):
        count_window(df, key="k", ts="ts", size=0)


def test_sliding_count_window_memberships(spark):
    """countWindow(size=3, slide=1): row at position p belongs to
    windows max(0, p-2)..p; trailing partial windows included."""
    from pyspark.sql import functions as F

    from flink_note_spark.operators.windows import sliding_count_window

    df = spark.createDataFrame(
        [(1, _ts(i), i) for i in range(4)], "k long, ts timestamp, eid long"
    )
    out = sliding_count_window(df, key="k", ts="ts", size=3, slide=1,
                               tiebreak="eid")
    got = sorted((r.eid, r.window_id) for r in out.collect())
    assert got == [
        (0, 0),
        (1, 0), (1, 1),
        (2, 0), (2, 1), (2, 2),
        (3, 1), (3, 2), (3, 3),
    ]
    counts = {
        r.window_id: r.n
        for r in out.groupBy("window_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {0: 3, 1: 3, 2: 2, 3: 1}  # trailing partials
    # slide == size degenerates to tumbling
    from flink_note_spark.operators.windows import count_window

    a = sorted(
        (r.eid, r.window_id)
        for r in sliding_count_window(
            df, key="k", ts="ts", size=2, slide=2, tiebreak="eid"
        ).collect()
    )
    b = sorted(
        (r.eid, r.window_id)
        for r in count_window(
            df, key="k", ts="ts", size=2, tiebreak="eid"
        ).collect()
    )
    assert a == b
    import pytest as _pytest
    with _pytest.raises(ValueError, match="slide"):
        sliding_count_window(df, key="k", ts="ts", size=2, slide=0)


def test_rotation_order_covers_any_registry_size():
    """LRU rotation soundness at >100 entries (VERDICT r6 item 4): with
    a 50-wide driver window, simulating rounds over a 130-query
    registry verifies EVERY query within ceil(130/50) = 3 rounds, and
    keeps doing so forever; never-verified queries always sort first."""
    from flink_note_spark.queries import _rotation_order

    W, names = 50, [f"q{i:03d}" for i in range(130)]
    histories: list[set[str]] = []

    # round 0: fresh registry, natural order
    assert _rotation_order(names, histories) == names

    seen_rounds: dict[str, list[int]] = {n: [] for n in names}
    for rnd in range(10):
        order = _rotation_order(names, histories)
        window = set(order[:W])
        # the window always holds the stalest entries: nothing outside
        # it is staler than anything inside it
        last = {}
        for i, h in enumerate(histories):
            for n in h:
                last[n] = i
        max_in = max(last.get(n, -1) for n in window)
        min_out = min(last.get(n, -1) for n in set(names) - window)
        assert max_in <= min_out
        histories.append(window)
        for n in window:
            seen_rounds[n].append(rnd)

    import math

    n_cover = math.ceil(len(names) / W)
    for n, rounds in seen_rounds.items():
        assert rounds, n  # every query verified at least once
        # gap between consecutive verifications never exceeds the bound
        gaps = [b - a for a, b in zip(rounds, rounds[1:])]
        assert all(g <= n_cover for g in gaps), (n, rounds)
        assert rounds[0] < n_cover, (n, rounds)


# --- cumulate_window (Flink SQL CUMULATE TVF, r7) -------------------------

def test_cumulate_window_memberships(spark):
    from flink_note_spark.operators.windows import cumulate_window

    # size 4 min, step 1 min: span [0,4); an event at minute m belongs
    # to windows ending at m+1..4 minutes
    df = spark.createDataFrame(
        [(1, _ts(0.0)), (2, _ts(1.5)), (3, _ts(3.9)), (4, _ts(4.0))],
        "id long, t timestamp",
    )
    out = cumulate_window(df, "t", "1 minute", "4 minutes")
    got = sorted(
        (r.id, int(r.win_start.timestamp() // 60) % 100,
         int(r.win_end.timestamp() // 60) % 100)
        for r in out.collect()
    )
    base = int(_ts(0).timestamp() // 60) % 100
    want = sorted(
        [(1, base, base + j) for j in (1, 2, 3, 4)]
        + [(2, base, base + j) for j in (2, 3, 4)]
        + [(3, base, base + 4)]
        + [(4, base + 4, base + 5), (4, base + 4, base + 6),
           (4, base + 4, base + 7), (4, base + 4, base + 8)]
    )
    assert got == want


def test_cumulate_window_equals_tumble_at_final_step(spark):
    """The size-length cumulative window of each span must equal a
    plain tumbling-window aggregate — the CUMULATE invariant."""
    import random

    from flink_note_spark.operators.windows import cumulate_window

    rng = random.Random(3)
    df = spark.createDataFrame(
        [(i, _ts(rng.uniform(0, 60)), rng.uniform(-5, 5))
         for i in range(200)],
        "id long, t timestamp, v double",
    )
    cum = (
        cumulate_window(df, "t", "5 minutes", "15 minutes")
        .groupBy("win_start", "win_end")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 4).alias("s"))
    )
    final = {
        (r.win_start, r.n, r.s)
        for r in cum.collect()
        if (r.win_end - r.win_start).total_seconds() == 900
    }
    tumble = {
        (r["window"].start, r["n"], r["s"])
        for r in df.groupBy(F.window("t", "15 minutes").alias("window"))
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 4).alias("s"))
        .collect()
    }
    assert final == tumble


def test_cumulate_window_validation(spark):
    from flink_note_spark.operators.windows import cumulate_window

    df = spark.createDataFrame([(1, _ts(0))], "id long, t timestamp")
    with pytest.raises(ValueError, match="multiple"):
        cumulate_window(df, "t", "7 minutes", "15 minutes")
    with pytest.raises(ValueError, match="duration"):
        cumulate_window(df, "t", "1 fortnight", "2 fortnights")


# --- window_join (Flink DataStream window join, r7) -----------------------

def test_window_join_same_tumbling_window_only(spark):
    from flink_note_spark.operators.joins import window_join

    left = spark.createDataFrame(
        [(1, _ts(1), "a"), (1, _ts(16), "b"), (2, _ts(2), "c")],
        "k long, lt timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 10.0), (1, _ts(14), 11.0), (1, _ts(17), 12.0),
         (2, _ts(40), 13.0)],
        "k long, rt timestamp, v double",
    )
    out = window_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        window="15 minutes",
    )
    got = sorted((r.k, r.tag, r.v) for r in out.collect())
    # window [0,15): a pairs with 10.0 and 11.0; window [15,30): b with
    # 12.0; key 2's right row is in [30,45) — no pair
    assert got == [(1, "a", 10.0), (1, "a", 11.0), (1, "b", 12.0)]
    assert "window" in out.columns


def test_window_join_left_outer(spark):
    from flink_note_spark.operators.joins import window_join

    left = spark.createDataFrame(
        [(1, _ts(1), "a"), (2, _ts(2), "c")], "k long, lt timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 10.0)], "k long, rt timestamp, v double"
    )
    out = window_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        window="15 minutes", how="left",
    )
    got = sorted((r.k, r.tag, r.v) for r in out.collect())
    assert got == [(1, "a", 10.0), (2, "c", None)]


def test_interval_join_bounds_and_negative_lower(spark):
    """Flink intervalJoin semantics (r8): inclusive bounds on both
    sides; a negative lower bound looks BACKWARD from the left time."""
    import datetime as dt

    from pyspark.sql import functions as F

    from flink_note_spark.operators.joins import interval_join

    T0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return T0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(60)), (2, ts(60))], "k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(55)), (1, ts(60)), (1, ts(65)), (1, ts(120)),
         (1, ts(121)), (2, ts(54))],
        "k long, rt timestamp",
    )
    out = interval_join(
        left, right, on="k", left_time="lt", right_time="rt",
        lower="-5 minutes", upper="1 hour",
    )
    got = sorted(
        (r["k"], int((r["rt"] - T0).total_seconds() // 60))
        for r in out.collect()
    )
    # k=1: [55, 120] inclusive both ends; 121 out; k=2: 54 < 55 out
    assert got == [(1, 55), (1, 60), (1, 65), (1, 120)]
    # plan stays an equi join (no cartesian)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- window top-n / window dedup (Flink SQL windowing TVFs, r8) ----------

def test_window_top_n_per_window_and_key(spark):
    from flink_note_spark.operators.windows import window_top_n

    # two 60-min windows, two types; top-2 by value desc
    rows = [
        (1, 1, _ts(5), "A", 10.0), (1, 2, _ts(10), "A", 30.0),
        (1, 3, _ts(20), "A", 20.0), (1, 4, _ts(30), "B", 5.0),
        (1, 5, _ts(70), "A", 7.0), (1, 6, _ts(80), "A", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string, value double"
    )
    out = window_top_n(
        df, "ts", "60 minutes",
        [F.col("value").desc(), F.col("event_id").asc()],
        n=2, partition_cols=["event_type"],
    )
    got = sorted(
        (r.event_type, int(r.win.start.timestamp() // 60) % 1000,
         r.rn, r.value)
        for r in out.collect()
    )
    base = int(_ts(0).timestamp() // 60) % 1000
    assert got == [
        ("A", base, 1, 30.0), ("A", base, 2, 20.0),
        ("A", base + 60, 1, 9.0), ("A", base + 60, 2, 7.0),
        ("B", base, 1, 5.0),
    ]


def test_window_top_n_validation(spark):
    from flink_note_spark.operators.windows import window_top_n

    df = spark.createDataFrame([(1, _ts(0))], "id long, ts timestamp")
    with pytest.raises(ValueError, match="n must be"):
        window_top_n(df, "ts", "1 hour", [F.col("id")], n=0)


def test_window_dedup_first_and_last(spark):
    from flink_note_spark.operators.windows import window_dedup

    rows = [
        (1, 1, _ts(5), "A", 1.0), (1, 2, _ts(10), "A", 2.0),
        (1, 3, _ts(70), "A", 3.0), (2, 4, _ts(8), "A", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string, value double"
    )
    first = window_dedup(
        df, "ts", "60 minutes", ["user_id"], keep="first",
        tiebreak=["event_id"],
    )
    last = window_dedup(
        df, "ts", "60 minutes", ["user_id"], keep="last",
        tiebreak=["event_id"],
    )
    assert sorted((r.user_id, r.event_id) for r in first.collect()) == [
        (1, 1), (1, 3), (2, 4)
    ]
    assert sorted((r.user_id, r.event_id) for r in last.collect()) == [
        (1, 2), (1, 3), (2, 4)
    ]
    with pytest.raises(ValueError, match="first|last"):
        window_dedup(df, "ts", "60 minutes", ["user_id"], keep="best")


def test_window_offset_shifts_grid(spark):
    """Flink window OFFSET: a 60-min tumble with a 15-min offset puts
    minute 10 in the window starting at -15min rather than 0."""
    from flink_note_spark.operators.windows import window_dedup

    rows = [(1, 1, _ts(10), "A", 1.0), (1, 2, _ts(20), "A", 2.0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string, value double"
    )
    plain = window_dedup(df, "ts", "60 minutes", ["user_id"])
    offs = window_dedup(
        df, "ts", "60 minutes", ["user_id"], offset="15 minutes"
    )
    p = plain.collect()[0]
    o = offs.collect()[0]
    # the offset grid starts windows at :15 — minute 10 falls in the
    # window [prev :15, :15) instead of [:00, :60)
    assert p.win.start.minute == 0
    assert o.win.start.minute == 15
    assert (o.win.end - o.win.start).total_seconds() == 3600
    # the plain grid holds both events in one window; the :15 grid
    # splits them across the boundary at minute 15
    assert plain.count() == 1
    assert offs.count() == 2


# ------------------------------------------------- static disjointness (r9)


def test_provably_disjoint_numeric_ranges():
    """The CEP probe prover: numeric range conjunctions with empty
    intersections are disjoint WITHOUT a data scan; anything richer
    than its atom classes (ORs, functions) conservatively is not."""
    from flink_note_spark.operators.cep import _provably_disjoint as d

    assert d("value >= 100", "value < 80")
    assert d("value < 80", "value >= 150")
    assert d("value > 10 AND value < 20", "value >= 20")
    assert d("value = 5", "value > 5")
    assert not d("value >= 20", "value > 10 AND value < 25")
    assert not d("value <= 20", "value >= 20")  # touch at a closed point
    assert d("value < 20", "value >= 20")
    assert not d("value >= 100", "price < 80")  # different columns
    assert not d("value >= 100 OR value < 0", "value < 80")  # OR bails
    assert d("(value >= 100)", "value < 80")  # r10: paren conjunct parses
    assert not d("value >= 100", None)
    assert not d(None, None)
    assert not d("upper(k) = 'A'", "value < 80")  # function bails


def test_provably_disjoint_widened_atoms():
    """r10 widening (VERDICT r9 #2): string equality / IN-set
    literals, multi-column conjunctions of provable atoms, BETWEEN,
    and self-contradictory predicates — each a static accept that was
    a scan probe (batch) or a refusal (stream) before."""
    from flink_note_spark.operators.cep import _provably_disjoint as d

    # string equality — the "type-column constant" shape
    assert d("etype = 'view'", "etype = 'click'")
    assert not d("etype = 'view'", "etype = 'view'")
    assert d("etype == 'view'", "etype == 'click'")
    # escaped quote in a literal
    assert d("name = 'o''brien'", "name = 'smith'")
    assert not d("name = 'o''brien'", "name = 'o''brien'")
    # IN-sets: string and numeric, vs equality and vs ranges
    assert d("etype IN ('view', 'scroll')", "etype = 'click'")
    assert not d("etype IN ('view', 'click')", "etype = 'click'")
    assert d("code IN (1, 2, 3)", "code IN (4, 5)")
    assert not d("code IN (1, 2, 3)", "code IN (3, 4)")
    assert d("code IN (1, 2)", "code >= 5")
    assert not d("code IN (1, 7)", "code >= 5")
    # multi-column conjunctions: ANY commonly-constrained column with
    # an empty intersection proves the pair
    assert d("etype = 'up' AND value > 0", "etype = 'down' AND value > 0")
    assert d("etype = 'x' AND value < 10", "etype = 'x' AND value >= 10")
    assert not d("etype = 'x' AND value < 10", "etype = 'x' AND value < 5")
    # unparseable conjuncts are skipped, parseable ones still prove
    assert d("upper(k) = 'A' AND value < 10", "value >= 10")
    # BETWEEN rewrites to two comparisons
    assert d("value BETWEEN 1 AND 5", "value > 5")
    assert not d("value BETWEEN 1 AND 5", "value >= 5")
    # self-contradictory predicate is disjoint from anything
    assert d("value > 10 AND value < 5", "price = 3")
    assert d("etype = 'a' AND etype = 'b'", "value > 0")
    # string-vs-numeric on the same column is never used to prove
    assert not d("v = 'a'", "v > 5")
    # OR/NOT outside literals still bail; inside literals they don't
    assert not d("etype = 'a' OR etype = 'b'", "etype = 'c'")
    assert not d("NOT etype = 'a'", "etype = 'a'")
    assert d("etype = 'a or b'", "etype = 'c'")
    assert d("note = 'do not match'", "note = 'other'")


# ----------------------------------------- persisted minhash index (r10)


def test_dedup_against_index_equals_full_corpus_cross_pairs(
    spark, sf_dir
):
    """Increment-vs-index == the one-shot full-corpus pipeline's pairs
    restricted to cross-set (one doc in the corpus, one in the
    increment): signatures depend only on a doc's own text, so the
    same band keys collide whether or not the other side was present
    at hash time. Exact with max_df=None (df stats are per-side by
    design — documented in minhash_index_build)."""
    from pyspark.sql import functions as F

    from flink_note_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
        minhash_lsh_pairs,
    )
    from flink_note_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    inc = d.filter(F.col("doc_id") % 5 == 0)
    idx = minhash_index_build(corpus, ids_unique=True)
    got = sorted(
        (r.d1, r.d2, r.est_jaccard, r.jaccard)
        for r in dedup_against_index(
            inc, idx, threshold=0.4, ids_unique=True
        ).collect()
    )
    want = sorted(
        ((r.d2, r.d1) if r.d1 % 5 == 0 else (r.d1, r.d2))
        + (r.est_jaccard, r.jaccard)
        for r in minhash_lsh_pairs(
            d, threshold=0.4, ids_unique=True
        ).collect()
        if (r.d1 % 5 == 0) != (r.d2 % 5 == 0)
    )
    assert got == want and got


def test_dedup_against_index_excludes_reingested_ids(spark):
    """Re-ingesting an already-indexed id must not report a self-pair;
    genuinely new near-dups still surface."""
    from flink_note_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base), (2, "an entirely different document about engines")],
        "doc_id long, text string",
    )
    inc = spark.createDataFrame(
        [(1, base), (3, base + " tail")], "doc_id long, text string"
    )
    idx = minhash_index_build(corpus, ids_unique=True)
    pairs = dedup_against_index(
        inc, idx, threshold=0.3, ids_unique=True
    ).collect()
    assert {(r.d1, r.d2) for r in pairs} == {(1, 3)}


# ------------------------------------------------------------------ r10:
# changelog compaction / upsert materialization


def test_upsert_latest_picks_greatest_version(spark):
    from flink_note_spark.operators.changelog import upsert_latest

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "c"), (1, 20, "b"), (2, 5, "x")],
        "k long, v long, payload string",
    )
    got = {
        r["k"]: (r["v"], r["payload"])
        for r in upsert_latest(df, ["k"], "v").collect()
    }
    assert got == {1: (30, "c"), 2: (5, "x")}


def test_upsert_latest_tiebreak_decides_equal_versions(spark):
    from flink_note_spark.operators.changelog import upsert_latest

    df = spark.createDataFrame(
        [(1, 10, 1, "first"), (1, 10, 9, "last"), (1, 5, 99, "old")],
        "k long, v long, seq long, payload string",
    )
    (row,) = upsert_latest(df, ["k"], "v", tiebreak="seq").collect()
    assert (row["payload"], row["seq"]) == ("last", 9)


def test_upsert_latest_composite_key_and_schema(spark):
    from flink_note_spark.operators.changelog import upsert_latest

    df = spark.createDataFrame(
        [(1, "a", 1, 1.0), (1, "b", 2, 2.0), (1, "a", 3, 3.0)],
        "k1 long, k2 string, v long, x double",
    )
    out = upsert_latest(df, ["k1", "k2"], "v")
    assert out.columns == ["k1", "k2", "v", "x"]
    got = {(r["k1"], r["k2"]): r["x"] for r in out.collect()}
    assert got == {(1, "a"): 3.0, (1, "b"): 2.0}


def test_apply_changelog_tombstone_removes_key(spark):
    from flink_note_spark.operators.changelog import apply_changelog

    df = spark.createDataFrame(
        [
            (1, 1, "U", "v1"),
            (1, 2, "D", None),       # latest for key 1 → deleted
            (2, 1, "D", None),
            (2, 2, "U", "alive"),    # re-inserted after the delete
            (3, 1, "U", "only"),
        ],
        "k long, v long, op string, payload string",
    )
    got = {
        r["k"]: r["payload"]
        for r in apply_changelog(df, ["k"], "v").collect()
    }
    assert got == {2: "alive", 3: "only"}
    # op column dropped from the materialized table
    assert "op" not in apply_changelog(df, ["k"], "v").columns


def test_changelog_refusals(spark):
    import pytest as _pt

    from flink_note_spark.operators.changelog import (
        apply_changelog,
        upsert_latest,
    )

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with _pt.raises(ValueError, match="key_cols"):
        upsert_latest(df, [], "v")
    with _pt.raises(ValueError, match="version"):
        upsert_latest(df, ["k"], "nope")
    with _pt.raises(ValueError, match="op column"):
        apply_changelog(df, ["k"], "v", op_col="op")


def test_upsert_latest_single_aggregate_plan(spark):
    """The compaction is ONE hash aggregate with partial combine — no
    Window sort, no join, exactly one Exchange."""
    from flink_note_spark.operators.changelog import upsert_latest

    df = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") * 2).alias("x"),
    )
    plan = (
        upsert_latest(df, ["k"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("Exchange") == 1


# ------------------------------------------------------------------ r10:
# duplicated-span removal (the ExactSubstr transform)


def test_remove_dup_spans_known_values(spark):
    from flink_note_spark.operators.dedup import remove_dup_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x y a b c d e z"),
            (3, "unique tokens only here"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_kept_tokens"])
        for r in remove_dup_spans(df, n=5, min_count=2).collect()
    }
    assert got[1] == ("f g h", 8, 3)        # 'a b c d e' stripped
    assert got[2] == ("x y z", 8, 3)
    assert got[3] == ("unique tokens only here", 4, 4)
    assert got[4] == ("", 0, 0)


def test_remove_dup_spans_overlapping_intervals_merge(spark):
    """Two overlapping duplicated grams cover one merged interval —
    the array fold must extend, not double-count."""
    from flink_note_spark.operators.dedup import remove_dup_spans

    # 'a b c' at 0 and 'b c d' at 1 both duplicated -> covers [0, 4)
    df = spark.createDataFrame(
        [
            (1, "a b c d TAIL1"),
            (2, "a b c d TAIL2"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_dup_spans(df, n=3, min_count=2).collect()
    }
    assert got == {1: "TAIL1", 2: "TAIL2"}


def test_remove_dup_spans_within_document_duplication(spark):
    """A gram repeated INSIDE one document counts toward min_count
    (same rule as dup_span_stats — corpus-wide occurrences)."""
    from flink_note_spark.operators.dedup import remove_dup_spans

    df = spark.createDataFrame(
        [(1, "p q r MID p q r END")], "doc_id long, text string"
    )
    (row,) = remove_dup_spans(df, n=3, min_count=2).collect()
    assert row["clean_text"] == "MID END"
    assert row["n_kept_tokens"] == 2


def test_remove_dup_spans_refusals(spark):
    import pytest as _pt

    from flink_note_spark.operators.dedup import remove_dup_spans

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pt.raises(ValueError, match="min_count"):
        remove_dup_spans(df, n=0)
    with _pt.raises(ValueError, match="min_count"):
        remove_dup_spans(df, min_count=1)


def test_semantic_decontaminate_known_geometry(spark):
    from flink_note_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 1.0]),     # cos 0.7071 to bench
            (4, [0.0, 0.0]),     # zero vector: sim 0, never NaN
        ],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(9, [3.0, 0.0])], "vec_id long, embedding array<double>"
    )
    kept = semantic_decontaminate(corpus, bench, threshold=0.9)
    assert {r.vec_id for r in kept.collect()} == {2, 3, 4}
    removed = semantic_decontaminate(
        corpus, bench, threshold=0.7, keep_contaminated=True
    )
    got = {r.vec_id: r.bench_max_sim for r in removed.collect()}
    assert set(got) == {1, 3}
    assert got[1] == 1.0 and abs(got[3] - 0.707107) < 1e-6
    # kept + removed partition the corpus at any threshold
    k2 = semantic_decontaminate(corpus, bench, threshold=0.7)
    assert {r.vec_id for r in k2.collect()} == {2, 4}


def test_semantic_decontaminate_empty_benchmark_keeps_all(spark):
    from flink_note_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    bench = corpus.filter("vec_id < 0")
    kept = semantic_decontaminate(corpus, bench, threshold=0.5)
    rows = kept.collect()
    assert [r.vec_id for r in rows] == [1]
    assert rows[0]["bench_max_sim"] == -1.0
    assert semantic_decontaminate(
        corpus, bench, threshold=0.5, keep_contaminated=True
    ).count() == 0


def test_semantic_decontaminate_guard_refuses_big_benchmark(spark):
    import pytest as _pt

    from flink_note_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0])], "vec_id long, embedding array<double>"
    )
    big = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0)).alias("embedding"),
    )
    with _pt.raises(ValueError, match="semantic_decontaminate"):
        semantic_decontaminate(corpus, big, max_collect_rows=5)


def test_scd2_intervals_basic_and_collapse(spark):
    from flink_note_spark.operators.changelog import scd2_intervals

    df = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, "b"),
         (2, 5, 4, "x")],
        "k long, v long, seq long, payload string",
    )
    plain = scd2_intervals(df, ["k"], "v", tiebreak="seq")
    got = sorted(
        (r.k, r.valid_from, r.valid_to, r.payload)
        for r in plain.collect()
    )
    assert got == [
        (1, 10, 20, "a"), (1, 20, 30, "a"), (1, 30, None, "b"),
        (2, 5, None, "x"),
    ]
    # collapse: the repeated 'a' folds into ONE interval [10, 30)
    col = scd2_intervals(
        df, ["k"], "v", tiebreak="seq", collapse_unchanged=True
    )
    got = sorted(
        (r.k, r.valid_from, r.valid_to, r.payload)
        for r in col.collect()
    )
    assert got == [
        (1, 10, 30, "a"), (1, 30, None, "b"), (2, 5, None, "x"),
    ]


def test_scd2_intervals_feed_temporal_join(spark):
    """The SCD2 output IS the q103 dimension shape: a fact row joined
    FOR SYSTEM_TIME AS OF picks the version live at its timestamp."""
    from flink_note_spark.operators.changelog import scd2_intervals
    from flink_note_spark.operators.joins import temporal_join

    dim = scd2_intervals(
        spark.createDataFrame(
            [(1, 10, "bronze"), (1, 20, "silver"), (1, 40, "gold")],
            "user_id long, ts long, tier string",
        ),
        ["user_id"], "ts",
    ).select("user_id", F.col("valid_from").alias("vfrom"), "tier")
    fact = spark.createDataFrame(
        [(1, 15), (1, 25), (1, 99), (1, 5)],
        "user_id long, fact_ts long",
    )
    got = {
        r.fact_ts: r.tier
        for r in temporal_join(
            fact, dim, on="user_id", fact_time="fact_ts",
            valid_from="vfrom", how="left",
        ).collect()
    }
    assert got == {15: "bronze", 25: "silver", 99: "gold", 5: None}


def test_scd2_intervals_refusals(spark):
    import pytest as _pt

    from flink_note_spark.operators.changelog import scd2_intervals

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with _pt.raises(ValueError, match="key_cols"):
        scd2_intervals(df, [], "v")
    with _pt.raises(ValueError, match="version"):
        scd2_intervals(df, ["k"], "nope")
    with _pt.raises(ValueError, match="payload"):
        scd2_intervals(df, ["k"], "v", collapse_unchanged=True)
    df2 = spark.createDataFrame(
        [(1, 2, 3)], "k long, v long, valid_from long"
    )
    with _pt.raises(ValueError, match="already exists"):
        scd2_intervals(df2, ["k"], "v")


def test_minhash_index_append_equals_rebuilt(spark, sf_dir, tmp_path):
    """r10 accretion loop: save(index(A)) + append(B) probes EXACTLY
    like a fresh index over A∪B — the appended band/doc rows land as
    additional bucketed files, and signatures depend only on each
    document's own text."""
    import uuid

    from flink_note_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_append,
        minhash_index_build,
        minhash_index_load,
        minhash_index_save,
    )
    from flink_note_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 5 == 1)
    b = d.filter(F.col("doc_id") % 5 == 2)
    c = d.filter(F.col("doc_id") % 5 == 0)   # the probe increment
    t = f"mh_app_{uuid.uuid4().hex[:8]}"
    minhash_index_save(
        minhash_index_build(a, ids_unique=True), t, buckets=4,
        path=str(tmp_path / t),
    )
    minhash_index_append(b, t, ids_unique=True)

    got = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in dedup_against_index(
            c, minhash_index_load(spark, t), threshold=0.4,
            ids_unique=True,
        ).collect()
    )
    fresh = minhash_index_build(a.unionByName(b), ids_unique=True)
    want = sorted(
        (r.d1, r.d2, r.jaccard)
        for r in dedup_against_index(
            c, fresh, threshold=0.4, ids_unique=True
        ).collect()
    )
    assert got == want and got


def test_minhash_index_append_refuses_id_collision(spark, tmp_path):
    import uuid

    import pytest as _pt

    from flink_note_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build,
        minhash_index_save,
    )

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i))
         for i in range(10)],
        "doc_id long, text string",
    )
    t = f"mh_clash_{uuid.uuid4().hex[:8]}"
    minhash_index_save(
        minhash_index_build(docs, ids_unique=True), t, buckets=2,
        path=str(tmp_path / t),
    )
    with _pt.raises(ValueError, match="already in the index"):
        minhash_index_append(docs.filter("doc_id < 3"), t,
                             ids_unique=True)


def test_minhash_index_register_fresh_catalog(spark, sf_dir, tmp_path):
    """r12: a persisted index survives a catalog wipe (fresh session
    over an in-memory metastore) — minhash_index_register re-declares
    the bucketed layout from the meta parquet and probes are
    value-identical to the live registration."""
    import uuid

    from flink_note_spark.operators.dedup import (
        _table_buckets,
        dedup_against_index,
        minhash_index_build,
        minhash_index_load,
        minhash_index_register,
        minhash_index_save,
    )
    from flink_note_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 5 == 1)
    probe = d.filter(F.col("doc_id") % 5 == 0)
    t = f"mh_reg_{uuid.uuid4().hex[:8]}"
    p = str(tmp_path / t)
    minhash_index_save(
        minhash_index_build(a, ids_unique=True), t, buckets=4, path=p
    )
    before = sorted(
        tuple(r)
        for r in dedup_against_index(
            probe, minhash_index_load(spark, t), threshold=0.2,
            ids_unique=True,
        ).select("d1", "d2").collect()
    )
    # simulate the fresh session: the catalog forgets, the files stay
    for suffix in ("", "__docs", "__meta"):
        spark.sql(f"DROP TABLE {t}{suffix}")
    idx = minhash_index_register(spark, t, p)
    assert _table_buckets(spark, t) == 4          # bucket spec restored
    assert idx.params["num_hashes"] == 32
    after = sorted(
        tuple(r)
        for r in dedup_against_index(
            probe, idx, threshold=0.2, ids_unique=True
        ).select("d1", "d2").collect()
    )
    assert after == before and len(after) >= 0
    # idempotent: a second register over live tables is a no-op
    minhash_index_register(spark, t, p)


def test_minhash_index_register_refusals(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from flink_note_spark.operators.dedup import minhash_index_register

    # meta without table_buckets (pre-r12 save) and no explicit count
    import os

    p = str(tmp_path / "old_idx")
    os.makedirs(f"{p}__meta", exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist([{
            "id_col": "doc_id", "n": 3, "num_hashes": 32, "bands": 8,
            "seed": 42, "max_df": None, "max_bucket": 1000,
        }]),
        f"{p}__meta/part-0.parquet",
    )
    with _pt.raises(ValueError, match="table_buckets"):
        minhash_index_register(spark, "mh_reg_old", p)
