"""Property-based spot checks (SURVEY.md §5.5) — invariants that must
hold for ANY input, exercised over hypothesis-generated micro-tables.

Example counts are deliberately small (Spark job per example); these are
sanity invariants, not fuzzing.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_note_spark.operators.dedup import exact_dedup
from flink_note_spark.operators.windows import sessionize

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key
        st.integers(min_value=-1000, max_value=1000),   # value
    ),
    min_size=0,
    max_size=30,
)


@given(a=rows_strategy, b=rows_strategy)
@settings(**_SETTINGS)
def test_union_count_is_sum_of_counts(spark, a, b):
    schema = "k long, v long"
    da = spark.createDataFrame(a, schema) if a else spark.createDataFrame([], schema)
    db = spark.createDataFrame(b, schema) if b else spark.createDataFrame([], schema)
    assert da.unionByName(db).count() == len(a) + len(b)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_drop_duplicates_subset_and_idempotent(spark, rows):
    schema = "k long, v long"
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    dd = df.dropDuplicates()
    assert dd.count() == len(set(rows))
    assert dd.dropDuplicates().count() == dd.count()
    # subset: every surviving row was an input row
    assert dd.exceptAll(df).count() == 0


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_running_window_sum_ends_at_group_sum(spark, rows):
    """The last running-frame value per key equals the plain group sum —
    windows and aggregations agree."""
    if not rows:
        return
    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)], "k long, seq long, v long"
    )
    w = Window.partitionBy("k").orderBy("seq")
    run = df.select(
        "k",
        "seq",
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("rs"),
    )
    last = (
        run.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("k").orderBy(F.desc("seq"))),
        )
        .filter(F.col("rn") == 1)
        .select("k", "rs")
    )
    grouped = df.groupBy("k").agg(F.sum("v").alias("gs"))
    joined = last.join(grouped, "k").collect()
    assert all(r.rs == r.gs for r in joined)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_exact_dedup_copies_partition_input(spark, rows):
    """sum(n_copies) over dedup clusters == input row count (every row is
    in exactly one cluster)."""
    if not rows:
        return
    df = spark.createDataFrame(
        [(i, f"text {k}") for i, (k, _) in enumerate(rows)],
        "doc_id long, text string",
    )
    out = exact_dedup(df, "text", "doc_id")
    assert out.agg(F.sum("n_copies")).collect()[0][0] == len(rows)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)),
        min_size=1, max_size=15,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000), st.integers(-99, 99)),
        min_size=0, max_size=15,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join agrees with pandas.merge_asof (an INDEPENDENT reference
    implementation) on arbitrary keyed event sequences — backward
    direction, equal timestamps match."""
    import datetime as dt

    import pandas as pd

    from flink_note_spark.operators.joins import asof_join

    base = dt.datetime(2024, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    # dedupe (key, ts) on the right: with ties merge_asof picks the last
    # row, asof_join picks via last() — make the reference unambiguous
    rmap = {(k, s): v for k, s, v in right}
    ldf = spark.createDataFrame(
        [(k, t(s)) for k, s in left], "k long, lt timestamp"
    )
    rdf = spark.createDataFrame(
        [(k, t(s), float(v)) for (k, s), v in rmap.items()],
        "k long, rt timestamp, rv double",
    ) if rmap else spark.createDataFrame([], "k long, rt timestamp, rv double")

    got = asof_join(ldf, rdf, on="k", left_time="lt", right_time="rt",
                    right_cols=["rv"]).toPandas()
    got = got.sort_values(["k", "lt"], ignore_index=True)[["k", "lt", "rv"]]

    lp = pd.DataFrame([(k, t(s)) for k, s in left], columns=["k", "lt"]).sort_values(
        ["lt", "k"], ignore_index=True
    )
    rp = pd.DataFrame(
        [(k, t(s), float(v)) for (k, s), v in rmap.items()],
        columns=["k", "rt", "rv"],
    ).sort_values(["rt", "k"], ignore_index=True)
    if len(rp):
        want = pd.merge_asof(
            lp, rp, left_on="lt", right_on="rt", by="k", direction="backward"
        )[["k", "lt", "rv"]]
    else:
        want = lp.assign(rv=float("nan"))[["k", "lt", "rv"]]
    want = want.sort_values(["k", "lt"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=20
    )
)
@settings(**_SETTINGS)
def test_sessionize_partitions_events(spark, offsets):
    """Sessions partition a key's events: per-session counts sum to the
    event count and session ids are 1..n_sessions."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=o), i) for i, o in enumerate(offsets)],
        "uid long, ts timestamp, eid long",
    )
    out = sessionize(df, key="uid", ts="ts", gap_seconds=300, tiebreak="eid")
    per = out.groupBy("session_id").count().collect()
    assert sum(r["count"] for r in per) == len(offsets)
    ids = sorted(r.session_id for r in per)
    assert ids == list(range(1, len(ids) + 1))


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=12,
    )
)
@settings(**_SETTINGS)
def test_srp_kernel_matches_numpy_reference(spark, vecs):
    """The distributed SRP bucket kernel must equal an independent pure-
    numpy reimplementation (same LCG hyperplanes, sign-bit packing at
    2^b) for ANY vector set — differential beyond the fixture corpus."""
    import numpy as np

    from flink_note_spark.operators.similarity import (
        _srp_bucket_rows,
        _srp_planes,
    )

    dim, n_bits, n_tables, seed = 4, 3, 2, 7
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (int(r.vid), int(r.table_id)): int(r.bucket_key)
        for r in _srp_bucket_rows(
            df, "vec_id", "embedding", dim, n_bits, n_tables, seed, id_out="vid"
        ).collect()
    }

    planes = _srp_planes(dim, n_bits, n_tables, seed)  # (T*B, dim)
    m = np.array(vecs, dtype=np.float32).astype(np.float64)
    bits = (m @ planes.T) >= 0
    keys = bits.reshape(len(vecs), n_tables, n_bits).astype(np.int64) @ (
        1 << np.arange(n_bits, dtype=np.int64)
    )
    want = {
        (i, t): int(keys[i, t])
        for i in range(len(vecs))
        for t in range(n_tables)
    }
    assert got == want


@given(
    toks=st.lists(st.integers(min_value=1, max_value=3000), min_size=0, max_size=40),
    budget=st.integers(min_value=100, max_value=2500),
)
@settings(**_SETTINGS)
def test_pack_sequences_invariants_hold_for_any_input(spark, toks, budget):
    """For ANY token distribution and budget: every doc lands in exactly
    one bin, non-oversize bins respect the budget, and oversize flags
    appear exactly on docs with tokens > budget (solo bins)."""
    from flink_note_spark.operators.packing import pack_sequences

    rows = [(i, t) for i, t in enumerate(toks)]
    df = (
        spark.createDataFrame(rows, "doc_id long, n_tokens int")
        if rows
        else spark.createDataFrame([], "doc_id long, n_tokens int")
    )
    out = pack_sequences(df, budget=budget).collect()
    assert sorted(r.doc_id for r in out) == sorted(i for i, _ in rows)
    by_bin: dict[int, list] = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
        assert r.oversize == (r.n_tokens > budget)
    for rows_in_bin in by_bin.values():
        if any(r.oversize for r in rows_in_bin):
            assert len(rows_in_bin) == 1
        else:
            assert sum(r.n_tokens for r in rows_in_bin) <= budget


@given(
    records=st.lists(
        st.tuples(
            st.text(min_size=0, max_size=8),
            st.text(min_size=0, max_size=20),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_topic_round_trip_any_strings(spark, records, tmp_path_factory):
    """Producer→consumer round trip must survive ANY string payload —
    newlines, tabs, quotes, unicode — because records are JSON-encoded
    one per line (the newline-framed log format never sees raw payload
    newlines)."""
    from flink_note_spark.sources.custom import (
        register_custom_sources,
        topic_produce,
    )

    register_custom_sources(spark)
    topic = str(tmp_path_factory.mktemp("topics") / "t")
    df = spark.createDataFrame(records, "key string, value string")
    topic_produce(df, topic, n_partitions=2)
    back = (
        spark.read.format("flink_note_topic")
        .option("path", topic)
        .load()
        .collect()
    )
    assert sorted((r.key, r.value) for r in back) == sorted(records)


# --- CEP pattern matching differential -----------------------------------

_cep_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key
        st.integers(min_value=0, max_value=50),   # seconds offset
        st.sampled_from(["A", "B", "C"]),         # event type
    ),
    min_size=0,
    max_size=40,
)


@given(rows=_cep_events, pattern=st.sampled_from(
    [["A", "B"], ["A", "B", "C"], ["B", "B"], ["C"]]
))
@settings(**_SETTINGS)
def test_cep_matches_naive_reference(spark, rows, pattern):
    """Both contiguity modes equal a brute-force Python matcher on
    arbitrary event soups (duplicate timestamps included — event_id
    tie-break totalizes the order for strict)."""
    from flink_note_spark.operators.cep import match_pattern

    epoch = dt.datetime(2024, 6, 1)
    data = [
        (k, epoch + dt.timedelta(seconds=s), t, i)
        for i, (k, s, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long"
    )
    k = len(pattern)
    cols = ["user_id"] + [f"ts_{i}" for i in range(1, k + 1)]

    def collect(out):
        return sorted(
            tuple([r["user_id"]] + [(r[c] - epoch).total_seconds() for c in cols[1:]])
            for r in out.select(*cols).collect()
        )

    # single source of truth for the reference semantics: the naive
    # matchers defined next to the CEP unit tests
    from tests.test_cep import _naive_relaxed, _naive_strict

    rows4 = [(kk, s, t, i) for i, (kk, s, t) in enumerate(rows)]
    got_strict = collect(
        match_pattern(df, pattern, contiguity="strict", tiebreak=["event_id"])
    )
    assert got_strict == sorted(_naive_strict(rows4, pattern))
    got_relaxed = collect(match_pattern(df, pattern, contiguity="relaxed"))
    assert got_relaxed == sorted(_naive_relaxed(rows4, pattern))


_QUANT_PATTERNS = [
    ["A", {"type": "B", "times": 2}],
    [{"type": "B", "one_or_more": True}, "C"],
    ["A", {"type": "B", "one_or_more": True}, "C"],
    ["A", {"type": "C", "negate": True}, "B"],
]


@given(rows=_cep_events, pattern=st.sampled_from(_QUANT_PATTERNS))
@settings(**_SETTINGS)
def test_cep_quantified_matches_naive_reference(spark, rows, pattern):
    """Round-6 surface (times / one_or_more / negation) equals the
    general brute-force matchers on arbitrary event soups, both
    contiguity modes."""
    from flink_note_spark.operators.cep import match_pattern

    from tests.test_cep import (
        _collect_cols,
        _naive_general_relaxed,
        _naive_general_strict,
    )

    epoch = dt.datetime(2024, 6, 1)
    data = [
        (k, epoch + dt.timedelta(seconds=s), t, i)
        for i, (k, s, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long"
    )
    rows4 = [(kk, s, t, i) for i, (kk, s, t) in enumerate(rows)]
    got_strict = _collect_cols(
        match_pattern(df, pattern, contiguity="strict", tiebreak=["event_id"]),
        epoch=epoch,
    )
    assert got_strict == _naive_general_strict(rows4, pattern)
    got_relaxed = _collect_cols(
        match_pattern(df, pattern, contiguity="relaxed"), epoch=epoch
    )
    assert got_relaxed == _naive_general_relaxed(rows4, pattern)


_MIXED_PATTERNS = [
    [{"type": "A"}, {"type": "B", "mode": "strict"},
     {"type": "C", "mode": "relaxed"}],
    [{"type": "A"}, {"type": "B", "mode": "relaxed"},
     {"type": "C", "mode": "strict"}],
    [{"type": "A"}, {"type": "C", "mode": "strict", "negate": True},
     {"type": "B", "mode": "relaxed"}],
    [{"type": "A"}, {"type": "B", "mode": "strict", "one_or_more": True},
     {"type": "C", "mode": "relaxed"}],
]


@given(rows=_cep_events, pattern=st.sampled_from(_MIXED_PATTERNS))
@settings(**_SETTINGS)
def test_cep_mixed_matches_naive_reference(spark, rows, pattern):
    """Per-step (mixed) contiguity equals the positional brute-force
    matcher on arbitrary event soups (duplicate timestamps included —
    the positional engine totalizes order via the event_id tiebreak)."""
    from flink_note_spark.operators.cep import match_pattern

    from tests.test_cep import _collect_cols, _naive_mixed

    epoch = dt.datetime(2024, 6, 1)
    data = [
        (k, epoch + dt.timedelta(seconds=s), t, i)
        for i, (k, s, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long"
    )
    rows4 = [(kk, s, t, i) for i, (kk, s, t) in enumerate(rows)]
    got = _collect_cols(
        match_pattern(df, pattern, tiebreak=["event_id"]), epoch=epoch
    )
    assert got == _naive_mixed(rows4, pattern)
    got_w = _collect_cols(
        match_pattern(
            df, pattern, tiebreak=["event_id"], within="25 seconds"
        ),
        epoch=epoch,
    )
    assert got_w == _naive_mixed(rows4, pattern, within_s=25)


_SKIP_PATTERNS = [
    ["A", {"type": "B", "times": 2}],
    [{"type": "B", "one_or_more": True}, "C"],
    ["A", {"type": "B", "one_or_more": True}, "C"],
    [{"type": "A", "times": 2}],
]


@given(
    rows=_cep_events,
    pattern=st.sampled_from(_SKIP_PATTERNS),
    strategy=st.sampled_from(
        ["no_skip", "skip_to_next", "skip_past_last_event"]
    ),
)
@settings(**_SETTINGS)
def test_cep_skip_strategies_match_naive_reference(
    spark, rows, pattern, strategy
):
    """Round-7 AfterMatchSkipStrategy surface equals the recursive
    prefix-emission matchers + Python skip filters on arbitrary event
    soups, both contiguity modes."""
    from flink_note_spark.operators.cep import match_pattern

    from tests.test_cep import (
        _collect_cols,
        _naive_noskip_relaxed,
        _naive_noskip_strict,
        _naive_skip_filter,
    )

    epoch = dt.datetime(2024, 6, 1)
    data = [
        (k, epoch + dt.timedelta(seconds=s), t, i)
        for i, (k, s, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long"
    )
    rows4 = [(kk, s, t, i) for i, (kk, s, t) in enumerate(rows)]
    for contiguity, naive in (
        ("strict", _naive_noskip_strict),
        ("relaxed", _naive_noskip_relaxed),
    ):
        got = _collect_cols(
            match_pattern(
                df, pattern, contiguity=contiguity,
                tiebreak=["event_id"] if contiguity == "strict" else None,
                skip_strategy=strategy,
            ),
            epoch=epoch,
        )
        want = naive(rows4, pattern)
        if strategy != "no_skip":
            want = _naive_skip_filter(want, pattern, strategy)
        assert got == want, f"{contiguity} {strategy} {pattern}"


# --- decontamination invariants ------------------------------------------

_decon_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),                  # doc id
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8),  # words
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: r[0],
)


@given(docs=_decon_docs, bench=_decon_docs)
@settings(**_SETTINGS)
def test_decontaminate_invariants(spark, docs, bench):
    """For ANY corpus/benchmark: output ⊆ input (schema and rows), a doc
    survives iff it shares no word n-gram with the benchmark (checked
    against a set-based Python reference), and docs shorter than n
    always survive."""
    from flink_note_spark.operators.dedup import decontaminate

    n = 2
    ddf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs] or [(99_999, "placeholder x")],
        "doc_id long, text string",
    )
    bdf = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in bench] or [(88_888, "zz qq")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in decontaminate(ddf, bdf, n=n).collect())

    def grams(ws):
        return {tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    bench_grams = set()
    for _, ws in bench or [(0, ["zz", "qq"])]:
        bench_grams |= grams(ws)
    expect = sorted(
        i
        for i, ws in (docs or [(99_999, ["placeholder", "x"])])
        if not (grams(ws) & bench_grams)
    )
    assert kept == expect


# --- PQ/ADC invariants ----------------------------------------------------

_pq_vectors = st.lists(
    st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False,
                  allow_infinity=False, width=32),
        min_size=8, max_size=8,
    ).filter(lambda v: any(abs(x) > 1e-3 for x in v)),
    min_size=3,
    max_size=20,
)


@given(vecs=_pq_vectors)
@settings(**_SETTINGS)
def test_pq_exhaustive_equals_exact_property(spark, vecs):
    """For ANY small corpus: PQ with shortlist >= |corpus| + exact
    re-rank equals brute-force cosine top-k exactly (the q94 oracle
    contract, generalized beyond the fixture)."""
    from flink_note_spark.operators.similarity import cosine_topk, pq_topk

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 3)
    exact = sorted(map(tuple, cosine_topk(q, df, k=3).collect()))
    pq = sorted(
        map(tuple, pq_topk(q, df, k=3, m=4, n_codes=4, shortlist=10_000,
                           refine=True, iters=1).collect())
    )
    assert pq == exact


# --- bucketed cogroup == raw cogroup --------------------------------------

_cg_side = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=6)),  # key
        st.integers(min_value=-99, max_value=99),
    ),
    min_size=0,
    max_size=15,
)


@given(left=_cg_side, right=_cg_side,
       buckets=st.sampled_from([1, 3, 16]))
@settings(**_SETTINGS)
def test_cogroup_bucketed_equals_raw_property(spark, left, right, buckets):
    """For ANY two keyed frames (NULL keys, one-side-only keys,
    duplicates) and ANY bucket count, bucketed cogroup_apply returns
    exactly the raw path's rows."""
    import pandas as pd

    from flink_note_spark.operators.cogroup import cogroup_apply

    schema_in = "k long, v long"
    ldf = (spark.createDataFrame(left, schema_in) if left
           else spark.createDataFrame([], schema_in))
    rdf = (spark.createDataFrame(right, schema_in) if right
           else spark.createDataFrame([], schema_in))

    def summarize(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        src = lg if len(lg) else rg
        k = src["k"].iloc[0]
        k = None if pd.isna(k) else int(k)
        return pd.DataFrame({
            "k": [k],
            "nl": [len(lg)],
            "nr": [len(rg)],
            "sv": [int(lg["v"].sum() + rg["v"].sum())],
        })

    schema = "k long, nl int, nr int, sv long"
    raw = sorted(
        map(tuple, cogroup_apply(ldf, rdf, ["k"], summarize, schema)
            .collect()),
        key=repr,
    )
    got = sorted(
        map(tuple, cogroup_apply(ldf, rdf, ["k"], summarize, schema,
                                 buckets=buckets).collect()),
        key=repr,
    )
    assert got == raw


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7200),  # seconds offset
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=0,
        max_size=30,
    ),
    shape=st.sampled_from([(300, 1200), (600, 1800), (900, 900)]),
)
@settings(**_SETTINGS)
def test_cumulate_window_matches_bruteforce(spark, rows, shape):
    """CUMULATE memberships equal a brute-force Python derivation on
    arbitrary event soups (spans, partial prefixes, boundary events)."""
    from flink_note_spark.operators.windows import cumulate_window

    step_s, size_s = shape
    epoch = dt.datetime(2024, 6, 1)
    df = spark.createDataFrame(
        [(epoch + dt.timedelta(seconds=s), v) for s, v in rows],
        "t timestamp, v long",
    )
    out = cumulate_window(
        df, "t", f"{step_s} seconds", f"{size_s} seconds"
    )
    got = sorted(
        (
            int((r.win_start - epoch).total_seconds()),
            int((r.win_end - epoch).total_seconds()),
            int(r.v),
        )
        for r in out.collect()
    )
    base = int(epoch.timestamp())
    want = []
    for s, v in rows:
        abs_s = base + s
        start = (abs_s // size_s) * size_s
        jmin = (abs_s - start) // step_s + 1
        for j in range(jmin, size_s // step_s + 1):
            want.append((start - base, start + j * step_s - base, v))
    assert got == sorted(want)


@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=0, max_size=20,
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=0, max_size=20,
    ),
)
@settings(**_SETTINGS)
def test_window_join_matches_bruteforce(spark, lrows, rrows):
    """Window join equals the brute-force same-bucket pairing on
    arbitrary two-sided soups (15-minute tumbling buckets)."""
    from flink_note_spark.operators.joins import window_join

    epoch = dt.datetime(2024, 6, 1)
    left = spark.createDataFrame(
        [(k, epoch + dt.timedelta(minutes=m), i)
         for i, (k, m) in enumerate(lrows)],
        "k long, lt timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(k, epoch + dt.timedelta(minutes=m), i)
         for i, (k, m) in enumerate(rrows)],
        "k long, rt timestamp, rid long",
    )
    out = window_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        window="15 minutes",
    )
    got = sorted((r.k, r.lid, r.rid) for r in out.collect())
    want = sorted(
        (lk, li, ri)
        for li, (lk, lm) in enumerate(lrows)
        for ri, (rk, rm) in enumerate(rrows)
        if lk == rk and lm // 15 == rm // 15
    )
    assert got == want


# --- static disjointness prover soundness (r9) ---------------------------

_cmp_ops = st.sampled_from([">=", "<=", ">", "<", "="])
_vals = st.integers(min_value=-50, max_value=50)


@st.composite
def _range_pred(draw):
    """A 1-or-2 atom conjunction over column `value`."""
    n = draw(st.integers(min_value=1, max_value=2))
    atoms = [
        f"value {draw(_cmp_ops)} {draw(_vals)}" for _ in range(n)
    ]
    return " AND ".join(atoms)


@given(a=_range_pred(), b=_range_pred(),
       probe=st.one_of(_vals, st.floats(min_value=-51, max_value=51,
                                        allow_nan=False)))
@settings(max_examples=300, deadline=None)
def test_provably_disjoint_is_sound(a, b, probe):
    """SOUNDNESS of the CEP/MATCH_RECOGNIZE probe prover: whenever it
    claims two predicates are disjoint, NO value satisfies both —
    checked against a direct Python evaluation of the conjunction.
    (Completeness is not required: a False verdict only falls back to
    the data probe / batch refusal.) The prover gates correctness-
    critical paths — the MATCH_RECOGNIZE greedy fast path and the
    streaming quantifier acceptance — so a false-positive here would
    be a wrong-answer bug, not a slowdown."""
    from flink_note_spark.operators.cep import _provably_disjoint

    if not _provably_disjoint(a, b):
        return  # conservative verdicts are always safe

    def holds(pred: str, v) -> bool:
        for atom in pred.split(" AND "):
            _c, op, lit = atom.split()
            lit = float(lit)
            ok = {
                ">=": v >= lit, "<=": v <= lit, ">": v > lit,
                "<": v < lit, "=": v == lit,
            }[op]
            if not ok:
                return False
        return True

    assert not (holds(a, probe) and holds(b, probe)), (a, b, probe)


# r10 atom classes: string equality / IN-sets / numeric IN / BETWEEN
# over TWO columns — the prover must stay sound under any conjunction
# of them (VERDICT r9 #2).

_str_vals = st.sampled_from(["a", "b", "c", "o'x"])
_cols = st.sampled_from(["value", "etype"])


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@st.composite
def _wide_atom(draw):
    """One provable atom → (sql, python evaluator over a row dict)."""
    col = draw(_cols)
    kind = draw(st.sampled_from(
        ["cmp", "streq", "strin", "numin", "between"]
    ))
    if kind == "cmp":
        op, v = draw(_cmp_ops), draw(_vals)
        py = {">=": lambda x: x >= v, "<=": lambda x: x <= v,
              ">": lambda x: x > v, "<": lambda x: x < v,
              "=": lambda x: x == v}[op]
        return f"{col} {op} {v}", col, ("num", py)
    if kind == "streq":
        s = draw(_str_vals)
        return f"{col} = {_sql_str(s)}", col, ("str", lambda x: x == s)
    if kind == "strin":
        items = draw(st.lists(_str_vals, min_size=1, max_size=3))
        sql = f"{col} IN ({', '.join(_sql_str(s) for s in items)})"
        return sql, col, ("str", lambda x: x in items)
    if kind == "numin":
        items = draw(st.lists(_vals, min_size=1, max_size=3))
        sql = f"{col} IN ({', '.join(str(v) for v in items)})"
        return sql, col, ("num", lambda x: x in items)
    lo, hi = draw(_vals), draw(_vals)
    return (f"{col} BETWEEN {lo} AND {hi}", col,
            ("num", lambda x: lo <= x <= hi))


@st.composite
def _wide_pred(draw):
    atoms = draw(st.lists(_wide_atom(), min_size=1, max_size=3))
    sql = " AND ".join(
        draw(st.booleans()) and f"({a[0]})" or a[0] for a in atoms
    )
    return sql, atoms


@given(pa=_wide_pred(), pb=_wide_pred(),
       nv=st.tuples(_vals, _vals), sv=st.tuples(_str_vals, _str_vals))
@settings(max_examples=400, deadline=None)
def test_provably_disjoint_widened_is_sound(pa, pb, nv, sv):
    """Soundness over the r10 atom classes: when the prover claims
    disjoint, no (numeric, string) assignment of the two columns
    satisfies both predicates. A column's draw is numeric OR string
    per probe — an atom of the other kind simply never matches it
    (SQL would coerce/NULL there, which can only REMOVE satisfying
    rows, so the Python check is the harder one)."""
    from flink_note_spark.operators.cep import _provably_disjoint

    if not _provably_disjoint(pa[0], pb[0]):
        return

    def holds(atoms, row) -> bool:
        for _sql, col, (kind, py) in atoms:
            v = row[(col, kind)]
            if not py(v):
                return False
        return True

    for vkind in range(4):  # each column independently num-or-str
        row = {
            ("value", "num"): nv[0], ("etype", "num"): nv[1],
            ("value", "str"): sv[0], ("etype", "str"): sv[1],
        }
        # a probe row assigns ONE kind per column; atoms of the other
        # kind on that column are vacuously false for it
        val_is_num = bool(vkind & 1)
        et_is_num = bool(vkind & 2)

        def alive(atoms) -> bool:
            for _sql, col, (kind, _py) in atoms:
                is_num = val_is_num if col == "value" else et_is_num
                if (kind == "num") != is_num:
                    return False
            return True

        if alive(pa[1]) and alive(pb[1]):
            assert not (holds(pa[1], row) and holds(pb[1], row)), (
                pa[0], pb[0], row,
            )


# ---------------------------------------------------------------------------
# time-series family (late-r10)

_ts_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # key
        st.integers(min_value=0, max_value=4000),    # seconds offset
        st.integers(min_value=-50, max_value=50),    # value
    ),
    min_size=1,
    max_size=25,
)


def _ts_frame(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (f"k{k}", base + dt.timedelta(seconds=s), float(v), i)
            for i, (k, s, v) in enumerate(rows)
        ],
        "k string, ts timestamp, v double, i long",
    )


@given(rows=_ts_rows)
@settings(**_SETTINGS)
def test_gapfill_series_is_dense_and_locf_sound(spark, rows):
    """For ANY input: per key the output buckets are exactly the dense
    range [first, last] with step = width; LOCF values on gap rows equal
    the nearest preceding present bucket's value; present buckets carry
    their own aggregate."""
    from flink_note_spark.operators.timeseries import gapfill

    df = _ts_frame(spark, rows)
    w = 600
    out = gapfill(
        df, ["k"], "ts", w,
        aggs={"s": F.sum("v"), "n": F.count(F.lit(1))},
        fills={"s": "locf", "n": "zero"},
    ).collect()
    per_key: dict = {}
    for r in out:
        per_key.setdefault(r.k, []).append(r)
    for k, rs in per_key.items():
        rs.sort(key=lambda r: r.bucket_s)
        buckets = [r.bucket_s for r in rs]
        assert buckets == list(range(buckets[0], buckets[-1] + w, w))
        last_present = None
        for r in rs:
            if r.is_gap == 0:
                assert r.n >= 1
                last_present = r.s
            else:
                assert r.n == 0
                assert r.s == last_present  # locf
    # row-count conservation: sum of per-bucket n == input rows per key
    for k, rs in per_key.items():
        assert sum(r.n for r in rs) == sum(
            1 for (kk, _, _) in rows if f"k{kk}" == k
        )


@given(rows=_ts_rows)
@settings(**_SETTINGS)
def test_gapfill_month_grain_dense_and_conserving(spark, rows):
    """Calendar-grain invariant (r11): for ANY input, spreading the
    second-offsets across DAYS makes months span a wide range — the
    month-grain output is a dense month-index sequence per key (every
    consecutive pair of bucket starts differs by exactly one calendar
    month) and zero-filled counts conserve input rows."""
    import datetime as _dt

    from flink_note_spark.operators.timeseries import gapfill

    base = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (f"k{k}", base + _dt.timedelta(days=s // 10), float(v))
            for (k, s, v) in rows
        ],
        "k string, ts timestamp, v double",
    )
    out = gapfill(
        df, ["k"], "ts", "1 month",
        aggs={"n": F.count(F.lit(1))}, fills={"n": "zero"},
    ).collect()
    per_key: dict = {}
    for r in out:
        per_key.setdefault(r.k, []).append(r)
    for k, rs in per_key.items():
        rs.sort(key=lambda r: r.bucket_s)
        starts = [
            _dt.datetime.fromtimestamp(r.bucket_s, _dt.timezone.utc)
            for r in rs
        ]
        for a in starts:
            assert a.day == 1 and a.hour == 0  # month starts only
        for a, b in zip(starts, starts[1:]):
            assert (b.year * 12 + b.month) - (a.year * 12 + a.month) == 1
        assert sum(r.n for r in rs) == sum(
            1 for (kk, _, _) in rows if f"k{kk}" == k
        )


@given(rows=_ts_rows, nb=st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_interval_concurrency_matches_bruteforce(spark, rows, nb):
    """Bucketed sweep-line max concurrency == an O(n²) brute force over
    boundary instants, for ANY intervals (duration = |v| + 1 seconds)."""
    from flink_note_spark.functions.scalar import epoch_us
    from flink_note_spark.operators.timeseries import max_concurrency

    df = _ts_frame(spark, rows)
    dur_us = (F.abs(F.col("v")).cast("long") + 1) * 1_000_000
    got = {
        r.k: r.max_concurrent
        for r in max_concurrency(
            df, ["k"], epoch_us("ts"), epoch_us("ts") + dur_us,
            tiebreak="i", time_buckets=nb,
        ).collect()
    }
    base = dt.datetime(2024, 1, 1)
    per_key: dict = {}
    for k, s, v in rows:
        start = int((base + dt.timedelta(seconds=s)).timestamp() * 1e6)
        per_key.setdefault(f"k{k}", []).append(
            (start, start + (abs(v) + 1) * 1_000_000)
        )
    for k, iv in per_key.items():
        want = max(
            sum(1 for (s2, e2) in iv if s2 <= s < e2) for (s, _) in iv
        )
        assert got[k] == want, k


@given(rows=_ts_rows)
@settings(**_SETTINGS)
def test_rollup_cascade_counts_conserved_any_widths(spark, rows):
    """count/min/max survive ANY two-level fold exactly (10 s -> 60 s ->
    600 s) for arbitrary inputs."""
    from flink_note_spark.operators.timeseries import (
        rollup_finalize,
        rollup_partials,
        rollup_up,
    )

    m = {"n": ("*", "count"), "mn": ("v", "min"), "mx": ("v", "max")}
    df = _ts_frame(spark, rows)
    fine = rollup_partials(df, ["k"], "ts", 10, m)
    coarse = rollup_finalize(
        rollup_up(rollup_up(fine, ["k"], 60, m), ["k"], 600, m), ["k"], m
    )
    direct = rollup_finalize(
        rollup_partials(df, ["k"], "ts", 600, m), ["k"], m
    )
    a = sorted(tuple(r) for r in coarse.collect())
    b = sorted(tuple(r) for r in direct.collect())
    assert a == b


@given(rows=_ts_rows)
@settings(**_SETTINGS)
def test_gapfill_linear_values_bounded_by_neighbours(spark, rows):
    """Linear-interpolated gap values always lie between (inclusive) the
    neighbouring present buckets' values, for ANY input."""
    from flink_note_spark.operators.timeseries import gapfill

    df = _ts_frame(spark, rows)
    out = gapfill(
        df, ["k"], "ts", 600, {"av": F.avg("v")}, fills={"av": "linear"}
    ).collect()
    per_key: dict = {}
    for r in out:
        per_key.setdefault(r.k, []).append(r)
    for rs in per_key.values():
        rs.sort(key=lambda r: r.bucket_s)
        prev = None
        for i, r in enumerate(rs):
            if r.is_gap == 0:
                prev = r.av
            else:
                nxt = next(
                    (x.av for x in rs[i + 1:] if x.is_gap == 0), None
                )
                assert prev is not None and nxt is not None
                lo, hi = min(prev, nxt), max(prev, nxt)
                assert lo - 1e-9 <= r.av <= hi + 1e-9


@given(rows=_ts_rows)
@settings(**_SETTINGS)
def test_lttb_one_row_per_bucket_and_endpoints(spark, rows):
    """LTTB emits exactly one row per (key, present bucket); the first
    bucket keeps its earliest row and the last bucket its latest, for
    ANY input."""
    from flink_note_spark.operators.timeseries import (
        lttb_downsample,
        time_bucket_s,
    )

    df = _ts_frame(spark, rows)
    out = lttb_downsample(df, ["k"], "ts", "v", 600, tiebreak="i").collect()
    buckets = {
        (r.k, r.b)
        for r in df.select("k", time_bucket_s("ts", 600, "b")).collect()
    }
    got = [(r.k, r.bucket_s) for r in out]
    assert sorted(got) == sorted(buckets)  # exactly one per present bucket
    pts = {}
    for r in df.select("k", "ts", "i", time_bucket_s("ts", 600, "b")).collect():
        pts.setdefault(r.k, []).append(r)
    chosen = {}
    for r in out:
        chosen.setdefault(r.k, []).append(r)
    for k, rs in chosen.items():
        rs.sort(key=lambda r: r.bucket_s)
        key_pts = sorted(pts[k], key=lambda r: (r.ts, r.i))
        first_b, last_b = rs[0].bucket_s, rs[-1].bucket_s
        first_in = [p for p in key_pts if p.b == first_b]
        assert (rs[0].ts, rs[0].i) == (first_in[0].ts, first_in[0].i)
        if last_b != first_b:
            last_in = [p for p in key_pts if p.b == last_b]
            assert (rs[-1].ts, rs[-1].i) == (last_in[-1].ts, last_in[-1].i)
