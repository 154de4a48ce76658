"""Curation pipeline tests: composition semantics on inline frames plus
the two-stage plan contract (SURVEY.md §2.2 ledger: composed pipeline).
"""

from __future__ import annotations

from flink_note_spark.pipelines.curate import CurationConfig, curate_corpus
from flink_note_spark.plans.inspect import shuffle_count
from flink_note_spark.queries import QUERIES


def test_curate_dedup_keeps_smallest_id_and_filters(spark):
    df = spark.createDataFrame(
        [
            (5, "the quick brown fox jumps clean"),     # en, keeps (dup winner)
            (9, "The Quick Brown Fox Jumps Clean "),    # dup of 5 → dropped
            (2, "too short"),                           # < min_words → dropped
            (3, "la casa es un lugar muy bonito hoy"),  # es, kept
            (4, "the the the the the the"),             # stop_ratio 1.0 → dropped
        ],
        "doc_id long, text string",
    )
    out = curate_corpus(
        df, config=CurationConfig(min_words=5, max_stop_ratio=0.9)
    )
    rows = {r.doc_id: r.lang_pred for r in out.collect()}
    assert rows == {5: "en", 3: "es"}


def test_curate_no_dedup_mode(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    assert curate_corpus(df, config=CurationConfig(dedup=False)).count() == 2
    assert curate_corpus(df, config=CurationConfig(dedup=True)).count() == 1


def test_q53_pipeline_is_two_stages(spark, sf_dir):
    """The whole composed pipeline = scan stage + dedup-window shuffle +
    final agg shuffle: Catalyst fuses every filter/signal into the scan."""
    df = QUERIES["q53_curation_pipeline"](spark, sf_dir)
    assert shuffle_count(df) <= 2, f"pipeline shuffles {shuffle_count(df)}×"


def test_prepare_training_corpus_end_to_end(spark):
    """curate -> near-dup collapse -> split: the near-identical pair
    collapses to its min id, every surviving doc gets a split, and the
    assignment is stable under repartitioning."""
    from flink_note_spark.pipelines import prepare_training_corpus

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),                      # near-dup of 1
            (3, "an entirely different document about spark and flink engines"),
            (4, "ein deutscher satz der lang genug ist um zu bestehen hier"),
        ],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        df,
        config=CurationConfig(min_words=5, lang_allow=("en", "de")),
        near_dup_threshold=0.4,
        splits={"train": 0.8, "test": 0.2},
    )
    rows = {r.doc_id: r.split for r in out.collect()}
    assert set(rows) == {1, 3, 4}          # 2 collapsed into 1's cluster
    assert set(rows.values()) <= {"train", "test"}

    again = prepare_training_corpus(
        df.repartition(7),
        config=CurationConfig(min_words=5, lang_allow=("en", "de")),
        near_dup_threshold=0.4,
        splits={"train": 0.8, "test": 0.2},
    )
    assert {r.doc_id: r.split for r in again.collect()} == rows


def test_prepare_training_corpus_skips_near_dup_stage(spark):
    from flink_note_spark.pipelines import prepare_training_corpus

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, base + " tail")], "doc_id long, text string"
    )
    out = prepare_training_corpus(df, near_dup_threshold=None)
    assert out.count() == 2                # both survive without the stage


def test_prepare_training_corpus_extended_stages(spark):
    """The r5 opt-in stages compose: PII redaction rewrites text before
    hashing, the repetition gate drops degenerate docs, and benchmark
    decontamination removes n-gram leaks — while default-off keeps the
    original flow byte-identical."""
    from flink_note_spark.pipelines import CurationConfig, prepare_training_corpus

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spam spam spam spam spam spam ham"),            # repetitive
            (3, "alpha beta gamma delta epsilon zeta eta"),      # leaks bench
            (4, "mail me at a.b@ex.org for the quick details now"),  # PII
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, "xx alpha beta gamma delta epsilon yy")], "doc_id long, text string"
    )
    out = prepare_training_corpus(
        df,
        config=CurationConfig(min_words=3),
        near_dup_threshold=None,
        pii_redact=True,
        max_dup_word_ratio=0.5,
        benchmark=bench,
        decontaminate_n=5,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 2 (dup ratio 5/7 > 0.5) and doc 3 (5-gram leak) are gone
    assert sorted(rows) == [1, 4]
    # doc 4's email was redacted BEFORE any downstream hashing
    assert "<email>" in rows[4]["text"] and "a.b@ex.org" not in rows[4]["text"]
    assert rows[4]["n_email"] == 1

    # defaults leave the original flow untouched: all four docs survive
    legacy = prepare_training_corpus(
        df, config=CurationConfig(min_words=3), near_dup_threshold=None
    )
    assert legacy.count() == 4


def test_novelty_gate_drops_shared_shingle_docs(spark):
    """max_shared_shingle_ratio (r6): a doc made entirely of shingles
    another doc also has is dropped before the pairwise stage; unique
    docs and sub-n docs (no signal) survive; default-off is unchanged."""
    from flink_note_spark.pipelines import CurationConfig, prepare_training_corpus

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zz alpha beta gamma delta epsilon yy"),  # shares all of 1's
            (3, "one two three four five six"),           # unique shingles
            (4, "aa bb"),                                 # sub-n: no signal
        ],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        df,
        config=CurationConfig(min_words=1),
        near_dup_threshold=None,
        max_shared_shingle_ratio=0.5,
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # doc 1: every shingle also in doc 2 → shared ratio 1.0 → dropped;
    # doc 2 has unique zz/yy edge shingles (2 of 5 shared... ratio 3/5
    # > 0.5) → also dropped; 3 and 4 survive
    assert kept == [3, 4]

    legacy = prepare_training_corpus(
        df, config=CurationConfig(min_words=1), near_dup_threshold=None
    )
    assert legacy.count() == 4


def test_repetition_gate_corner_cases(spark):
    """The gate must not clash with a caller's own dup_word_ratio
    column, must not leak an extra column into the output, and must
    KEEP zero-signal docs (no repetition evidence is not repetition)."""
    from flink_note_spark.pipelines import CurationConfig, prepare_training_corpus

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", 0.99),  # caller's own column
            (2, "spam spam spam spam spam", 0.0),    # repetitive → dropped
        ],
        "doc_id long, text string, dup_word_ratio double",
    )
    out = prepare_training_corpus(
        df,
        config=CurationConfig(min_words=3),
        near_dup_threshold=None,
        max_dup_word_ratio=0.5,
    )
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    # caller's column untouched, no leaked internal column
    assert rows[0]["dup_word_ratio"] == 0.99
    assert "__dup_ratio" not in out.columns
