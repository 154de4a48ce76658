"""Unit tests for the round-5 text-pipeline operators: TF-IDF top
terms, PII scan/redaction, repetition stats, benchmark decontamination.
(Fixture-scale oracle parity runs in test_oracle_parity via q70–q73;
these tests pin the operator semantics on crafted corners.)"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_note_spark.operators.dedup import decontaminate
from flink_note_spark.operators.text import (
    pii_scan,
    repetition_stats,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_unique_term_wins(spark):
    df = _docs(
        spark,
        [
            (1, "the cat sat zyzzyva"),
            (2, "the cat sat"),
            (3, "the dog ran"),
        ],
    )
    out = tfidf_top_terms(df, k=1).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # doc 1's corpus-unique word dominates its common ones
    assert by_doc[1]["token"] == "zyzzyva"
    # score check: tf=1, N=3, df=1 → ln(4/2)
    assert by_doc[1]["tfidf"] == round(math.log(2.0), 4)
    assert all(r["rank"] == 1 for r in out)


def test_tfidf_tie_breaks_on_token(spark):
    df = _docs(spark, [(1, "b a"), (2, "x y")])
    out = tfidf_top_terms(df, k=2).filter(F.col("doc_id") == 1).collect()
    # equal tf and df for both tokens → alphabetical order
    assert [r["token"] for r in sorted(out, key=lambda r: r["rank"])] == ["a", "b"]


def test_pii_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            (
                1,
                "mail a.b@ex.org or c@d.io, call 555-123-4567, "
                "host 10.0.0.1 and https://x.io/p?u=e@f.gg end",
            ),
            (2, "clean text only"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scan(df, "text", out_col="red").collect()}
    r1 = out[1]
    assert (r1["n_email"], r1["n_phone"], r1["n_ipv4"]) == (3, 1, 1)
    assert r1["n_url"] == 1
    red = r1["red"]
    assert "<email>" in red and "<phone>" in red and "<ipv4>" in red
    assert "<url>" in red
    # URL redacts FIRST, so the embedded e@f.gg vanished inside <url>
    assert "e@f.gg" not in red and "a.b@ex.org" not in red
    assert "555-123-4567" not in red and "10.0.0.1" not in red
    r2 = out[2]
    assert (r2["n_url"], r2["n_email"], r2["n_phone"], r2["n_ipv4"]) == (0, 0, 0, 0)
    assert r2["red"] == "clean text only"


def test_pii_no_redact_keeps_text(spark):
    df = _docs(spark, [(1, "mail a@b.cc now")])
    r = pii_scan(df, "text", redact=False).collect()[0]
    assert r["n_email"] == 1 and r["text"] == "mail a@b.cc now"


def test_repetition_stats_hand_computed(spark):
    df = _docs(spark, [(1, "a a a b"), (2, "x y z"), (3, "solo")])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_distinct_words"]) == (4, 2)
    assert r1["dup_word_ratio"] == 0.5
    assert r1["top_word_frac"] == 0.75
    # bigrams: "a a" ×2, "a b" ×1 → 2/3
    assert r1["top_bigram_frac"] == round(2 / 3, 6)
    r2 = out[2]
    # "x y z": bigrams "x y","y z" → max 1 of 2
    assert r2["dup_word_ratio"] == 0.0 and r2["top_bigram_frac"] == 0.5
    # single-word doc: no bigrams → NULL share, not a crash
    r3 = out[3]
    assert r3["n_words"] == 1 and r3["top_bigram_frac"] is None


def test_decontaminate_drops_overlap(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),       # shares 3-gram w/ bench
            (2, "one two three four five"),              # clean
            (3, "beta gamma delta unrelated tail"),      # shares 3-gram
            (4, "al be"),                                # shorter than n → safe
        ],
    )
    bench = spark.createDataFrame(
        [(100, "xx alpha beta gamma yy"), (101, "beta gamma delta")],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()
    )
    assert kept == [2, 4]


def test_decontaminate_whitespace_run_tokenization(spark):
    """Tabs/newlines tokenize exactly like single spaces across the
    hygiene operators (ADVICE r5: shingle kernel now splits \\s+ like
    tfidf/repetition/frequent_tokens) — an overlap n-gram spanning a
    newline still decontaminates."""
    docs = _docs(
        spark,
        [
            (1, "alpha\tbeta\ngamma  delta epsilon"),  # mixed whitespace
            (2, "one two three four five"),
        ],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()
    )
    assert kept == [2]


def test_decontaminate_custom_bench_columns(spark):
    docs = _docs(spark, [(1, "p q r s"), (2, "t u v w")])
    bench = spark.createDataFrame(
        [("b1", "zz p q r zz")], "bid string, btext string"
    )
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(
            docs, bench, n=3, bench_id_col="bid", bench_text_col="btext"
        ).collect()
    )
    assert kept == [2]


def test_decontaminate_keeps_schema(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d", "en")], "doc_id long, text string, lang string"
    )
    bench = _docs(spark, [(9, "nothing shared here at all")])
    out = decontaminate(docs, bench, n=3)
    assert out.columns == ["doc_id", "text", "lang"]
    assert out.count() == 1


def test_decontaminate_splits_protects_eval(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "train"),   # leaks val 3-gram → dropped
            (2, "one two three", "train"),      # clean → kept
            (3, "alpha beta gamma", "val"),     # protected, passes through
            (4, "four five six", "test"),       # protected, passes through
            (5, "four five six", "train"),      # leaks test 3-gram → dropped
        ],
        "doc_id long, text string, split string",
    )
    from flink_note_spark.operators.dedup import decontaminate_splits

    out = decontaminate_splits(docs, split_col="split", n=3)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [2, 3, 4]
    # schema passes through unchanged
    assert out.columns == ["doc_id", "text", "split"]


def test_frequent_tokens_sketch_equals_exact_when_roomy(spark, sf_dir):
    """With a summary far larger than the vocabulary, the MG candidate
    set is lossless and the sketch output must equal the exact operator
    bit-for-bit."""
    from flink_note_spark.operators.text import (
        frequent_tokens,
        frequent_tokens_sketch,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = [tuple(r) for r in frequent_tokens(d, "text", k=20, min_count=2).collect()]
    sketch = [
        tuple(r)
        for r in frequent_tokens_sketch(
            d, "text", k=20, min_count=2, summary_size=100_000
        ).collect()
    ]
    assert sketch == exact


def test_frequent_tokens_sketch_finds_hitters_under_pressure(spark):
    """Tiny summary (8 counters) over a skewed stream: the guaranteed
    heavy hitters (freq > n/(m+1)) must all survive with EXACT counts,
    even though the long tail can't fit."""
    from flink_note_spark.operators.text import frequent_tokens_sketch

    # 400 "hot" tokens vs a 200-token distinct tail, single partition so
    # n/(m+1) is easy to reason about: n = 600, m = 8 → threshold 66.7
    rows = [(i, "hot_a hot_b") for i in range(200)] + [
        (1000 + i, f"tail{i}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    got = {
        r["token"]: r["n"]
        for r in frequent_tokens_sketch(
            df, "text", k=5, min_count=1, summary_size=8
        ).collect()
    }
    assert got.get("hot_a") == 200 and got.get("hot_b") == 200


def test_frequent_tokens_sketch_guarantee_column(spark):
    """with_guarantee=True surfaces the MG boundary (ADVICE r5): rows
    with corpus frequency > n/(m+1) are provably complete; lower ranks
    are flagged best-effort so the caller can detect possible top-k
    truncation instead of trusting a silently incomplete list."""
    from flink_note_spark.operators.text import frequent_tokens_sketch

    # n = 600, m = 8 → threshold 66.7: hot tokens (200 each) guaranteed,
    # any surfaced tail token (1 each) is not
    rows = [(i, "hot_a hot_b") for i in range(200)] + [
        (1000 + i, f"tail{i}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    got = {
        r["token"]: (r["n"], r["mg_guaranteed"])
        for r in frequent_tokens_sketch(
            df, "text", k=10, min_count=1, summary_size=8,
            with_guarantee=True,
        ).collect()
    }
    assert got["hot_a"] == (200, True) and got["hot_b"] == (200, True)
    assert all(g is False for t, (n, g) in got.items()
               if t.startswith("tail"))
    # default schema is unchanged (oracle q78 contract)
    cols = frequent_tokens_sketch(df, "text", k=3).columns
    assert cols == ["token", "n"]


def test_pii_scan_rejects_count_column_clash(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "x", 9)], "doc_id long, text string, n_url int"
    )
    with pytest.raises(ValueError, match="n_url"):
        pii_scan(df, "text")


def test_decontaminate_splits_null_split_is_train(spark):
    """NULL split rows must be decontaminated as train, not silently
    dropped by three-valued logic."""
    from flink_note_spark.operators.dedup import decontaminate_splits

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", None),   # NULL split, leaks val → dropped
            (2, "one two three", None),      # NULL split, clean → KEPT
            (3, "alpha beta gamma", "val"),  # protected
        ],
        "doc_id long, text string, split string",
    )
    kept = sorted(
        r["doc_id"]
        for r in decontaminate_splits(docs, split_col="split", n=3).collect()
    )
    assert kept == [2, 3]


def test_ngram_novelty_hand_computed(spark):
    """Docs sharing a 3-gram get it counted as shared on BOTH sides;
    short docs (< n words) come back with 0 shingles and NULL novelty."""
    from flink_note_spark.operators.text import ngram_novelty

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),   # shingles: a-b-g, b-g-d
            (2, "alpha beta gamma zz"),      # shares a-b-g with doc 1
            (3, "one two three"),            # 1 unique shingle
            (4, "xy zz"),                    # too short
        ],
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"], r["novelty"])
        for r in ngram_novelty(docs, "text", "doc_id", n=3).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (1, 0, 1.0)
    assert got[4] == (0, 0, None)


def test_unified_whitespace_tokenization(spark):
    """r8 (VERDICT r7 nit): words() splits on \\s+ runs, so tabs,
    newlines, and double spaces no longer create phantom tokens in the
    quality family — and the Spark kernel agrees token-for-token with
    the oracle expression regexp_split_to_array(text, '\\s+') that
    every tokenizing driver oracle now uses."""
    import duckdb

    from flink_note_spark.functions.scalar import words
    from flink_note_spark.operators.text import quality_columns, token_stats

    rows = [
        (1, "the  cat\tsat\non a   mat"),     # runs of space/tab/newline
        (2, " leading and trailing "),         # edge whitespace
        (3, "single space only"),
        (4, "no_whitespace"),
    ]
    df = _docs(spark, rows)

    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", words("text").alias("w"),
            *[e.alias(n) for n, e in quality_columns("text").items()],
        ).collect()
    }
    # \s+ runs collapse: no "" tokens BETWEEN words (only at the edges)
    assert got[1]["w"] == ["the", "cat", "sat", "on", "a", "mat"]
    assert got[1]["n_words"] == 6
    assert got[2]["w"] == ["", "leading", "and", "trailing", ""]
    assert got[3]["w"] == ["single", "space", "only"]
    assert got[4]["w"] == ["no_whitespace"]
    # avg_word_len is exact from the tokens (not chars-minus-separators)
    assert abs(got[1]["avg_word_len"] - (3 + 3 + 3 + 2 + 1 + 3) / 6) < 1e-9
    # stopword ratio counts real tokens only: {the, a} / 6
    assert abs(got[1]["stopword_ratio"] - 2 / 6) < 1e-9

    # token-for-token parity with the oracle-side expression
    con = duckdb.connect()
    for doc_id, text in rows:
        want = con.execute(
            "SELECT regexp_split_to_array(?, '\\s+')", [text]
        ).fetchone()[0]
        assert got[doc_id]["w"] == want, (doc_id, got[doc_id]["w"], want)

    # n_ws_tokens rides the same kernel
    ws = {
        r["doc_id"]: r["n_ws_tokens"]
        for r in token_stats(df).select("doc_id", "n_ws_tokens").collect()
    }
    assert ws[1] == 6 and ws[2] == 5 and ws[4] == 1


# --- duplicated-span stats (substring-level dedup signal, r8) ------------

def test_dup_span_stats_coverage_and_edges(spark):
    from flink_note_spark.operators.dedup import dup_span_stats

    docs = spark.createDataFrame([
        (1, "a b c d e f g h"),   # shares 3 grams with doc 2
        (2, "a b c d e x y z"),
        (3, "p p p p p p"),       # fully self-duplicated
        (4, ""),                  # empty -> NULL fraction
        (5, "q r"),               # shorter than n -> 0.0
    ], "doc_id long, text string")
    got = {
        tuple(r)
        for r in dup_span_stats(docs, n=3, min_count=2).collect()
    }
    assert got == {
        (1, 8, 3, 5, 0.625),   # grams at pos 0..2 cover tokens [0, 5)
        (2, 8, 3, 5, 0.625),
        (3, 6, 4, 6, 1.0),
        (4, 0, 0, 0, None),
        (5, 2, 0, 0, 0.0),
    }


def test_dup_span_stats_interval_union_not_double_counted(spark):
    """Two dup runs with a gap: coverage is the union of spans, not
    the sum of n per gram."""
    from flink_note_spark.operators.dedup import dup_span_stats

    docs = spark.createDataFrame([
        (1, "x1 x2 x3 u1 u2 u3 u4 y1 y2 y3"),
        (2, "x1 x2 x3 q1 q2 q3 q4 y1 y2 y3"),
    ], "doc_id long, text string")
    got = {
        tuple(r)
        for r in dup_span_stats(docs, n=3, min_count=2).collect()
    }
    # each doc: dup grams at pos 0 (x1 x2 x3) and pos 7 (y1 y2 y3) ->
    # union coverage 6 of 10 tokens
    assert got == {(1, 10, 2, 6, 0.6), (2, 10, 2, 6, 0.6)}


def test_dup_span_stats_within_doc_repeats_count(spark):
    from flink_note_spark.operators.dedup import dup_span_stats

    docs = spark.createDataFrame(
        [(1, "a b c z a b c")], "doc_id long, text string"
    )
    got = {
        tuple(r)
        for r in dup_span_stats(docs, n=3, min_count=2).collect()
    }
    # "a b c" occurs at pos 0 and 4 within the one doc
    assert got == {(1, 7, 2, 6, round(6 / 7, 6))}


def test_dup_span_stats_validation(spark):
    from flink_note_spark.operators.dedup import dup_span_stats

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_count"):
        dup_span_stats(docs, n=3, min_count=1)


# --- token-window chunking (r9) ------------------------------------------


def test_chunk_documents_windows_and_overlap(spark):
    from flink_note_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # 10 tokens
            (2, "x y"),                   # short: one chunk
            (3, ""),                      # empty: no chunk
            (4, "   "),                   # whitespace only: no chunk
            (5, " ".join(f"t{i}" for i in range(8))),  # exactly 2 windows
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "text", "doc_id", max_tokens=4, overlap=2)
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in out.collect()
    }
    # doc 1: stride 2 → starts 0,2,4,6 (1 + ceil((10-4)/2) = 4 chunks)
    assert got[(1, 0)] == ("a b c d", 4)
    assert got[(1, 1)] == ("c d e f", 4)
    assert got[(1, 2)] == ("e f g h", 4)
    assert got[(1, 3)] == ("g h i j", 4)
    assert (1, 4) not in got
    # doc 2: single short chunk
    assert got[(2, 0)] == ("x y", 2)
    # docs 3/4: no chunks at all
    assert not any(k[0] in (3, 4) for k in got)
    # doc 5 (8 tokens): starts 0,2,4 → 1+ceil(4/2)=3 chunks, last full
    assert got[(5, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(5, 2)] == ("t4 t5 t6 t7", 4)
    assert (5, 3) not in got
    # every token of doc 1 is covered by some window
    covered = " ".join(got[(1, i)][0] for i in range(4)).split()
    assert set(covered) == set("a b c d e f g h i j".split())


def test_chunk_documents_no_overlap_and_validation(spark):
    import pytest

    from flink_note_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    out = chunk_documents(docs, "text", "doc_id", max_tokens=2, overlap=0)
    got = sorted(
        (r.chunk_id, r.chunk_text, r.n_tokens) for r in out.collect()
    )
    assert got == [(0, "a b", 2), (1, "c d", 2), (2, "e", 1)]
    with pytest.raises(ValueError, match="must be smaller"):
        chunk_documents(docs, max_tokens=4, overlap=4)
    # the plan is scan-stage only: no exchange before the explode
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------- paragraph dedup

def test_paragraph_dedup_first_occurrence_wins(spark):
    """late-r10 paragraph_dedup (the RefinedWeb boilerplate pass):
    corpus-wide first (doc_id, pos) occurrence survives, normalized
    variants collapse, in-doc repeats drop, a fully-deduped document
    disappears, and reassembly preserves original order."""
    from flink_note_spark.operators.dedup import (
        paragraph_dedup,
        split_paragraphs,
    )

    docs = spark.createDataFrame(
        [
            (1, "Intro text.\n\nCookie banner here.\n\nUnique one."),
            (2, "Cookie banner here.\n\nUnique two.\n\n"
                "cookie   BANNER here."),
            (3, "Cookie banner here."),
            (4, "x\n\nx\n\ny"),
        ],
        "doc_id int, text string",
    )
    out = paragraph_dedup(split_paragraphs(docs))
    got = {tuple(r) for r in out.collect()}
    assert got == {
        (1, "Intro text.\n\nCookie banner here.\n\nUnique one.", 3, 0),
        (2, "Unique two.", 1, 2),
        (4, "x\n\ny", 2, 1),
    }


def test_paragraph_dedup_min_len_exempts_short(spark):
    from flink_note_spark.operators.dedup import (
        paragraph_dedup,
        split_paragraphs,
    )

    docs = spark.createDataFrame(
        [(1, "x\n\nx\n\nlong enough paragraph"),
         (2, "long enough paragraph\n\nx")],
        "doc_id int, text string",
    )
    out = paragraph_dedup(split_paragraphs(docs), min_len=2)
    got = {tuple(r) for r in out.collect()}
    # every "x" survives (below min_len); the long paragraph dedups
    assert got == {
        (1, "x\n\nx\n\nlong enough paragraph", 3, 0),
        (2, "x", 1, 1),
    }


def test_paragraph_dedup_normalize_off(spark):
    from flink_note_spark.operators.dedup import (
        paragraph_dedup,
        split_paragraphs,
    )

    docs = spark.createDataFrame(
        [(1, "Same Para"), (2, "same para")],
        "doc_id int, text string",
    )
    raw = paragraph_dedup(split_paragraphs(docs), normalize=False)
    assert raw.count() == 2  # case difference keeps both
    norm = paragraph_dedup(split_paragraphs(docs), normalize=True)
    got = {tuple(r) for r in norm.collect()}
    assert got == {(1, "Same Para", 1, 0)}


def test_paragraph_dedup_plan_no_cartesian(spark):
    """Two keyed exchanges (digest window + reassembly groupBy), no
    join of any kind — the no-cross-join dedup-family contract."""
    from flink_note_spark.operators.dedup import (
        paragraph_dedup,
        split_paragraphs,
    )

    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "b\n\nc")], "doc_id int, text string"
    )
    out = paragraph_dedup(split_paragraphs(docs))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in physical


def _gq(spark, texts, **kw):
    from flink_note_spark.operators.text import gopher_quality_filter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = gopher_quality_filter(df, **kw).orderBy("doc_id").collect()
    return rows


def test_gopher_each_rule_fails_independently(spark):
    """One crafted document per rule, each failing EXACTLY that rule
    (plus keep); a clean doc passes everything."""
    clean = "the cat sat and the dog ran off to the big red barn " * 5
    texts = [
        clean,                                   # 0: passes all
        "the and of",                            # 1: too few words
        clean.replace("cat", "c#t#s#"),          # 2: symbol ratio (hashes)
        "\n".join(["- the cat and dog"] * 10),   # 3: bullet lines
        # 4: ellipsis lines (lines long enough that the ten '...'
        # occurrences stay under the 0.1 symbol ratio)
        "\n".join(["the cat and dog ran far away home again now more ..."] * 10),
        " ".join(["123 456 789 000 111 the and"] * 10),  # 5: alpha frac
        "cat dog bird fish goat lamb pony mule " * 8,    # 6: no stopwords
    ]
    rows = _gq(
        spark, texts,
        min_words=10, max_words=1000,
        min_mean_word_len=1.0, max_mean_word_len=10.0,
        min_stopwords=2, stopwords=("the", "and", "of", "to"),
    )
    flags = [
        "gq_words_ok", "gq_symbol_ok", "gq_bullet_ok",
        "gq_ellipsis_ok", "gq_alpha_ok", "gq_stopword_ok",
    ]
    assert rows[0]["gq_keep"] is True
    expect_fail = {
        1: "gq_words_ok", 2: "gq_symbol_ok", 3: "gq_bullet_ok",
        4: "gq_ellipsis_ok", 5: "gq_alpha_ok", 6: "gq_stopword_ok",
    }
    for i, failing in expect_fail.items():
        r = rows[i]
        assert r["gq_keep"] is False, i
        assert r[failing] is False, (i, failing)
        for f in flags:
            if f != failing:
                assert r[f] is True, (i, f)


def test_gopher_mean_word_length_bounds(spark):
    short = " ".join(["a b c d"] * 20)            # mean 1
    long = " ".join(["extraordinarily"] * 60)     # mean 15
    mid = " ".join(["the cat sat"] * 20)          # mean 3
    rows = _gq(
        spark, [short, long, mid],
        min_words=3, min_mean_word_len=2.0, max_mean_word_len=10.0,
        min_stopwords=0,
    )
    assert [r["gq_word_len_ok"] for r in rows] == [False, False, True]


def test_gopher_zero_word_doc_null_safe(spark):
    """Empty/whitespace docs fail words_ok and the ratio rules as FALSE
    (never NULL), so keep is a real boolean."""
    rows = _gq(spark, ["", "   "], min_words=1, min_stopwords=0)
    for r in rows:
        assert r["gq_words_ok"] is False
        assert r["gq_word_len_ok"] is False
        assert r["gq_alpha_ok"] is False
        assert r["gq_keep"] is False


def test_gopher_unicode_ellipsis_and_overlap_counting(spark):
    """U+2026 counts as a symbol and as a line-ending ellipsis; four
    dots count as ONE non-overlapping '...' occurrence."""
    many = "the and " * 30
    rows = _gq(
        spark,
        [many + "x….… y…", "the cat and dog ….\nthe end …"],
        min_words=2, min_stopwords=0, max_symbol_ratio=0.01,
    )
    assert rows[0]["gq_symbol_ok"] is False
    # second doc: line 2 ends with unicode ellipsis → 1/2 lines > 0.3
    assert rows[1]["gq_ellipsis_ok"] is False


def test_gopher_prefix_and_schema(spark):
    from flink_note_spark.operators.text import gopher_quality_filter

    df = spark.createDataFrame([(1, "the cat and dog")], "doc_id long, text string")
    out = gopher_quality_filter(df, prefix="g_")
    added = [c for c in out.columns if c not in df.columns]
    assert sorted(added) == sorted(
        ["g_words_ok", "g_word_len_ok", "g_symbol_ok", "g_bullet_ok",
         "g_ellipsis_ok", "g_alpha_ok", "g_stopword_ok", "g_keep"]
    )


def test_gopher_filter_is_scan_stage_only(spark, sf_dir):
    """All seven rules fold into the scan: no Exchange in the plan."""
    from flink_note_spark.operators.text import gopher_quality_filter

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        gopher_quality_filter(d)
        .filter(F.col("gq_keep"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------- r10:
# CCNet perplexity bucketing + fastText-style lexicon quality scorer


def test_perplexity_buckets_exact_populations(spark):
    """ntile mode: per-language bucket populations differ by at most
    one and head holds the HIGHEST mean_logp (most typical docs)."""
    from flink_note_spark.operators.text import perplexity_buckets

    rows = [
        (i, "en", ("the of and " * (i % 7 + 1)) + f"tok{i} " * (i % 3 + 1))
        for i in range(20)
    ] + [(100 + i, "fr", f"le des mot{i} " * (i % 5 + 1)) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = perplexity_buckets(df, "text", "doc_id", "lang", 3).toPandas()
    for lang, grp in out.groupby("lang"):
        sizes = grp.groupby("bucket").size()
        assert sizes.max() - sizes.min() <= 1
        head_min = grp[grp.bucket == 1].mean_logp.min()
        tail_max = grp[grp.bucket == 3].mean_logp.max()
        assert head_min >= tail_max
    assert set(out.bucket_label) == {"head", "middle", "tail"}


def test_perplexity_buckets_thresholds_agrees_off_boundary(spark):
    """The scale twin (approx-quantile thresholds, no per-language
    sort) assigns the same bucket as exact ntile for every document
    whose score is not exactly ON a boundary quantile — the only place
    the two can legitimately disagree."""
    from flink_note_spark.operators.text import perplexity_buckets

    # distinct scores: doc i = (i+2) copies of "the" + one unique token
    # (ties would make BOTH conventions legitimately ambiguous)
    rows = [
        (i, "en", "the " * (i + 2) + f"tok{i}") for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    exact = perplexity_buckets(df, "text", "doc_id", "lang", 3).toPandas()
    thr = perplexity_buckets(
        df, "text", "doc_id", "lang", 3, mode="thresholds"
    ).toPandas()
    merged = exact.merge(thr, on="doc_id", suffixes=("_e", "_t"))
    # the conventions may differ exactly AT a bucket edge value — the
    # edges are each bucket's min/max score in either output
    boundary = set()
    for pdf, col in ((exact, "bucket"), (thr, "bucket")):
        for _, grp in pdf.groupby(col):
            boundary.add(grp.mean_logp.min())
            boundary.add(grp.mean_logp.max())
    off = merged[~merged.mean_logp_e.isin(boundary)]
    assert len(off) >= 10
    assert (off.bucket_e == off.bucket_t).all()


def test_perplexity_buckets_bad_mode(spark):
    import pytest as _pt

    from flink_note_spark.operators.text import perplexity_buckets

    df = spark.createDataFrame([(1, "en", "the")], "doc_id long, lang string, text string")
    with _pt.raises(ValueError, match="mode"):
        perplexity_buckets(df, mode="nope").collect()


def test_lexicon_quality_score_known_values(spark):
    """Hand-computed sigmoid scores; empty doc scores exactly 0.5."""
    import math

    from flink_note_spark.operators.text import lexicon_quality_score

    df = spark.createDataFrame(
        [(1, "the the spam"), (2, ""), (3, "zz yy")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["quality_score"]
        for r in lexicon_quality_score(
            df, {"the": 1.0, "spam": -2.0}
        ).collect()
    }
    expected1 = 1.0 / (1.0 + math.exp(-((1.0 + 1.0 - 2.0) / 3)))
    assert out[1] == round(expected1, 6)
    assert out[2] == 0.5  # no tokens -> mean weight 0 -> sigmoid(0)
    assert out[3] == 0.5  # tokens outside the lexicon weigh 0


def test_lexicon_quality_big_lexicon_path_matches_map_path(spark):
    """Forcing the broadcast-join path (max_map_literal=1) must score
    identically to the Catalyst MAP-literal path."""
    from flink_note_spark.operators.text import lexicon_quality_score

    df = spark.createDataFrame(
        [(1, "the cat spam"), (2, "the the the"), (3, "")],
        "doc_id long, text string",
    )
    lex = {"the": 0.7, "spam": -1.3, "cat": 0.1}
    a = lexicon_quality_score(df, lex).select("doc_id", "quality_score")
    b = lexicon_quality_score(df, lex, max_map_literal=1).select(
        "doc_id", "quality_score"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lexicon_quality_map_path_is_scan_stage_only(spark, sf_dir):
    """The MAP-literal path folds into the parquet scan: no Exchange."""
    from flink_note_spark.operators.text import lexicon_quality_score

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        lexicon_quality_score(d, {"the": 1.0})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_lexicon_quality_empty_lexicon_refuses(spark):
    import pytest as _pt

    from flink_note_spark.operators.text import lexicon_quality_score

    df = spark.createDataFrame([(1, "the")], "doc_id long, text string")
    with _pt.raises(ValueError, match="lexicon"):
        lexicon_quality_score(df, {})
