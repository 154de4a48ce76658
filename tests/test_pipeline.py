"""Curation pipeline tests: composition semantics on inline frames plus
the two-stage plan contract (SURVEY.md §2.2 ledger: composed pipeline).
"""

from __future__ import annotations

import pytest

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


# --------------------------------------------- semantic stage (r10)


def _semantic_fixture(spark):
    """Docs + 2-D embeddings with hand-checkable clusters: ids 1-3 are
    one semantic cluster (cos ≈ 1 pairwise), ids 4-5 another, 6-7
    singletons in embedding space; ids 2 (11 words) and 5 (9 words)
    carry the most words in their clusters (the merit
    representatives); min-id picks 1 and 4 instead."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat today"),
            (2, "the cat sat on the mat today and then slept all day"),
            (3, "the dog ran in the park quickly"),
            (4, "a completely different story about engines and pipelines"),
            (5, "another unrelated tale of ships and seas and storms"),
            (6, "short but valid english sentence here now"),
            (7, "one more independent document with enough words in it"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.998, 0.02]),
            (4, [0.0, 1.0]), (5, [0.01, 0.999]),
            (6, [0.7, -0.7]), (7, [-0.7, 0.7]),
        ],
        "doc_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.7, -0.7]),
         (3, [-0.7, 0.7])],
        "cell_id int, embedding array<double>",
    )
    return docs, emb, cents


def test_prepare_training_corpus_semantic_merit_reps(spark):
    """Semantic collapse keeps the MERIT representative per cluster
    (most words, ties to smallest id): cluster {1,2,3} -> 2, cluster
    {4,5} -> 5, singletons survive. Output is a subset of the
    semantic-off run."""
    from flink_note_spark.pipelines import prepare_training_corpus

    docs, emb, cents = _semantic_fixture(spark)
    kw = dict(
        config=CurationConfig(min_words=5),
        near_dup_threshold=None,
    )
    off = prepare_training_corpus(docs, **kw)
    on = prepare_training_corpus(
        docs, **kw,
        semantic_threshold=0.95, embeddings=emb,
        semantic_keep_by="n_words", semantic_centroids=cents,
        semantic_max_cell=None,
    )
    off_ids = {r.doc_id for r in off.collect()}
    on_rows = {r.doc_id: r.split for r in on.collect()}
    assert set(on_rows) == {2, 5, 6, 7}
    assert set(on_rows) <= off_ids
    # default representative (no merit): smallest id per cluster
    on_min = prepare_training_corpus(
        docs, **kw,
        semantic_threshold=0.95, embeddings=emb,
        semantic_centroids=cents, semantic_max_cell=None,
    )
    assert {r.doc_id for r in on_min.collect()} == {1, 4, 6, 7}


def test_prepare_training_corpus_semantic_survivor_edges_only(spark):
    """Edges never resurrect or bridge through documents an earlier
    stage removed: with id 2 killed by the quality gate (too few
    words), the {1,3} pair must still collapse via their own edge —
    and a doc whose ONLY semantic neighbor was removed survives."""
    from flink_note_spark.pipelines import prepare_training_corpus

    docs, emb, cents = _semantic_fixture(spark)
    # min_words=8 removes id 1 (7 words) and id 3 (7 words) upstream;
    # 2 survives alone in its cell -> no pair, stays
    out = prepare_training_corpus(
        docs,
        config=CurationConfig(min_words=8),
        near_dup_threshold=None,
        semantic_threshold=0.95, embeddings=emb,
        semantic_keep_by="n_words", semantic_centroids=cents,
        semantic_max_cell=None,
    )
    ids = {r.doc_id for r in out.collect()}
    assert 2 in ids  # its former near-dups were gone before the stage


def test_prepare_training_corpus_semantic_kmeans_default(spark):
    """The scale default (no injected centroids, shuffle-free Lloyd
    cells) collapses the same obvious clusters on this fixture and
    stays a subset of the semantic-off run."""
    from flink_note_spark.pipelines import prepare_training_corpus

    docs, emb, _ = _semantic_fixture(spark)
    out = prepare_training_corpus(
        docs,
        config=CurationConfig(min_words=5),
        near_dup_threshold=None,
        semantic_threshold=0.95, embeddings=emb,
        semantic_keep_by="n_words", semantic_n_cells=4,
    )
    ids = {r.doc_id for r in out.collect()}
    # pairs within a k-means cell at cos >= 0.95: {1,2,3} and {4,5}
    # must each collapse to ONE representative whichever cells Lloyd
    # picked (cells only ever SPLIT clusters, never merge reps), and
    # the singletons always survive
    assert {6, 7} <= ids
    assert len(ids & {1, 2, 3}) >= 1 and len(ids & {4, 5}) >= 1
    assert len(ids) <= 5


def test_prepare_training_corpus_semantic_requires_embeddings(spark):
    from flink_note_spark.pipelines import prepare_training_corpus

    docs, _emb, _ = _semantic_fixture(spark)
    with pytest.raises(ValueError, match="embeddings"):
        prepare_training_corpus(
            docs, near_dup_threshold=None, semantic_threshold=0.9,
        )


# ------------------------------------------------------------------ r10:
# ExactSubstr strip stage + embedding-space decontamination stage


def test_prepare_training_corpus_remove_spans_stage(spark):
    """remove_spans_n strips corpus-duplicated n-grams BEFORE every
    other signal: the stripped text drives quality stats, and the
    stage equals applying the operator first by hand."""
    from flink_note_spark.operators.dedup import remove_dup_spans
    from flink_note_spark.pipelines import prepare_training_corpus

    boiler = "the subscribe footer of and to this site"
    docs = spark.createDataFrame(
        [
            (1, f"the quick brown fox of and to jumps {boiler}"),
            (2, f"a slow green turtle of and to walks {boiler}"),
            (3, "the completely unique document of and to words here"),
        ],
        "doc_id long, text string",
    )
    kw = dict(
        config=CurationConfig(min_words=3),
        near_dup_threshold=None,
    )
    on = prepare_training_corpus(docs, **kw, remove_spans_n=6)
    by_hand = remove_dup_spans(
        docs, n=6, min_count=2, out_col="text2"
    )
    hand_txt = {r.doc_id: r.text2 for r in by_hand.collect()}
    got = {r.doc_id: (r.text, r.n_words) for r in on.collect()}
    for i in (1, 2, 3):
        assert got[i][0] == hand_txt[i]
        assert got[i][1] == len(hand_txt[i].split())
    # the boiler footer is gone from docs 1/2, intact in 3
    assert "subscribe" not in got[1][0]
    assert "unique" in got[3][0]


def test_prepare_training_corpus_semantic_decontaminate_stage(spark):
    """benchmark_embeddings removes survivors whose embedding matches
    a benchmark vector at the threshold — and ONLY those."""
    from flink_note_spark.pipelines import prepare_training_corpus

    docs = spark.createDataFrame(
        [(i, f"document number {i} with plenty of the words to count")
         for i in range(1, 5)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.707, 0.707, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ],
        "doc_id long, vec array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(99, [2.0, 0.0, 0.0])], "doc_id long, v array<double>"
    )
    kw = dict(
        config=CurationConfig(min_words=3), near_dup_threshold=None,
        embeddings=emb, benchmark_embeddings=bench_emb,
    )
    # cos to bench: doc1=1.0, doc3=0.707, docs 2/4=0.0
    strict = prepare_training_corpus(
        docs, **kw, semantic_decontaminate_threshold=0.9
    )
    assert {r.doc_id for r in strict.collect()} == {2, 3, 4}
    loose = prepare_training_corpus(
        docs, **kw, semantic_decontaminate_threshold=0.5
    )
    assert {r.doc_id for r in loose.collect()} == {2, 4}


def test_prepare_training_corpus_semantic_decontaminate_refusals(spark):
    import pytest as _pt

    from flink_note_spark.pipelines import prepare_training_corpus

    docs = spark.createDataFrame(
        [(1, "some words here to keep")], "doc_id long, text string"
    )
    bench_emb = spark.createDataFrame(
        [(9, [1.0])], "doc_id long, v array<double>"
    )
    with _pt.raises(ValueError, match="embeddings"):
        prepare_training_corpus(
            docs, config=CurationConfig(min_words=2),
            near_dup_threshold=None,
            benchmark_embeddings=bench_emb,
        )


# -- streaming prepare_training_corpus (r12 — VERDICT r11 #1) ----------------

BASE = "the quick brown fox jumps over the lazy dog again and again"
STREAM_DOCS = [
    (1, BASE),                                   # kept (cluster rep)
    (2, BASE + " tail"),                         # near-dup of 1 (in-chunk)
    (3, "an entirely different document about spark and flink engines"),
    (4, "An Entirely Different Document ABOUT spark and flink engines"),
    #                                    exact dup of 3 (later chunk)
    (5, "tiny doc"),                             # quality-fail OWNER
    (6, "tiny doc"),                             # exact dup of 5 → dropped
    #    even though 5 itself fails quality (dedup runs BEFORE filters)
    (7, BASE + " extra tail words"),             # near-dup of 1, later
    #                                              chunk → index probe
    (8, "ein deutscher satz der lang genug ist um zu bestehen hier"),
]
STREAM_CFG = dict(min_words=5, lang_allow=("en", "de"))


def _doc_chunks(tmp_path, docs, per=3):
    """Id-ordered parquet chunk files with strictly increasing mtimes
    (the file source orders micro-batches by mtime — test-harness
    doctrine)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "doc_chunks"
    d.mkdir(exist_ok=True)
    schema = pa.schema([
        ("doc_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("text", pa.string()),
    ])
    base = time.time() - len(docs) - 60
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    for j in range(0, len(docs), per):
        t = pa.Table.from_pylist(
            [
                {"doc_id": i, "ts": t0 + dt.timedelta(seconds=i),
                 "text": s}
                for i, s in docs[j:j + per]
            ],
            schema=schema,
        )
        path = str(d / f"c{j:03d}.parquet")
        pq.write_table(t, path)
        os.utime(path, (base + j, base + j))
    return d


DOC_SCHEMA = "doc_id long, ts timestamp, text string"


def _run_corpus_stream(spark, chunks, state, ckpt, **kw):
    from flink_note_spark.pipelines import prepare_training_corpus_stream

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    q = prepare_training_corpus_stream(
        stream,
        state_dir=str(state),
        checkpoint=str(ckpt),
        index_table=kw.pop("index_table"),
        config=CurationConfig(**STREAM_CFG),
        near_dup_threshold=kw.pop("near_dup_threshold", 0.4),
        splits={"train": 0.8, "test": 0.2},
        **kw,
    )
    q.processAllAvailable()
    q.stop()


def _batch_kept(spark, docs, **kw):
    from flink_note_spark.pipelines import prepare_training_corpus

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = prepare_training_corpus(
        df,
        config=CurationConfig(**STREAM_CFG),
        near_dup_threshold=kw.pop("near_dup_threshold", 0.4),
        splits={"train": 0.8, "test": 0.2},
        **kw,
    )
    return {r.doc_id: r.split for r in out.collect()}


def test_corpus_stream_equals_batch(spark, tmp_path):
    """The ==batch contract: an id-ordered replay through the streaming
    pipeline keeps exactly the batch pipeline's set — exact dups dropped
    across chunks, ownership accrued by quality-failing docs, near-dups
    collapsed in-chunk AND against the accreted index — with identical
    split assignments (hash_split is a pure function of the id)."""
    from flink_note_spark.pipelines import read_corpus_stream_output

    chunks = _doc_chunks(tmp_path, STREAM_DOCS)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_eq",
    )
    got = {
        r.doc_id: r.split
        for r in read_corpus_stream_output(spark, str(state)).collect()
    }
    want = _batch_kept(spark, STREAM_DOCS)
    assert got == want
    assert set(got) == {1, 3, 8}


def test_corpus_stream_index_accretes_survivors(spark, tmp_path):
    """The persisted MinHash index ends holding exactly the kept docs'
    band/doc rows (pre-decontamination universe), so the NEXT ingest's
    probe join sees the whole history without any corpus recompute."""
    from flink_note_spark.operators.dedup import minhash_index_load

    chunks = _doc_chunks(tmp_path, STREAM_DOCS)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_acc",
    )
    idx = minhash_index_load(spark, "t_corpus_idx_acc")
    ids = {r[0] for r in idx.docs.select("doc_id").collect()}
    assert ids == {1, 3, 8}
    assert idx.params["n"] == 3 and idx.params["bands"] == 8


def test_corpus_stream_restart_resumes_exactly_once(spark, tmp_path):
    """run → stop → new chunks land → restart from the SAME checkpoint:
    nothing reprocessed (ids stay unique), late near-dups still collapse
    against the index built before the restart, final set == batch."""
    from flink_note_spark.pipelines import read_corpus_stream_output

    first, rest = STREAM_DOCS[:4], STREAM_DOCS[4:]
    chunks = _doc_chunks(tmp_path, first, per=2)
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    _run_corpus_stream(
        spark, chunks, state, ckpt, index_table="t_corpus_idx_rs"
    )
    mid = read_corpus_stream_output(spark, str(state))
    assert {r.doc_id for r in mid.collect()} == {1, 3}

    # new chunks land while the query is down (mtimes keep increasing)
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    schema = pa.schema([
        ("doc_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("text", pa.string()),
    ])
    t0 = dt.datetime(2024, 1, 1)
    for k, (i, s) in enumerate(rest):
        p = str(chunks / f"late{k}.parquet")
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": i, "ts": t0 + dt.timedelta(seconds=i),
                  "text": s}],
                schema=schema,
            ),
            p,
        )
        os.utime(p, (time.time() + k + 1, time.time() + k + 1))
    _run_corpus_stream(
        spark, chunks, state, ckpt, index_table="t_corpus_idx_rs"
    )
    out = read_corpus_stream_output(spark, str(state)).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))  # exactly-once: no duplicates
    assert {r.doc_id: r.split for r in out} == _batch_kept(
        spark, STREAM_DOCS
    )


def test_corpus_stream_chain_cluster_is_superset(spark, tmp_path):
    """The documented greedy-vs-transitive divergence, pinned from both
    sides: a chain A~B, B~C with no A~C edge spanning chunks — batch
    keeps {A}, the stream keeps {A, C} (it cannot retract B's removal
    when C arrives, and C pairs with no KEPT doc). Stream ⊇ batch,
    never the reverse."""
    from flink_note_spark.pipelines import read_corpus_stream_output

    # nested-suffix growth: J(a,b)=18/22=.82, J(b,c)=22/26=.85, both
    # over the 0.7 threshold; J(a,c)=18/26=.69 falls UNDER it, so the
    # exact-jaccard verify guarantees no (a,c) edge at any band luck
    a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lamb mu nu xi omicron pi rho sigma tau upsilon")
    b = a + " one two three four"                # ~a
    c = b + " north south east west"             # ~b, under-thr vs a
    docs = [(1, a), (2, b), (3, c)]
    # verify the chain shape at this threshold before pinning the policy
    from flink_note_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r.d1, r.d2)
        for r in minhash_lsh_pairs(
            spark.createDataFrame(docs, "doc_id long, text string"),
            threshold=0.7, ids_unique=True,
        ).collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs

    chunks = _doc_chunks(tmp_path, docs, per=1)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_chain", near_dup_threshold=0.7,
    )
    got = {
        r.doc_id
        for r in read_corpus_stream_output(spark, str(state)).collect()
    }
    want = set(_batch_kept(spark, docs, near_dup_threshold=0.7))
    assert want == {1}
    assert got == {1, 3}
    assert got >= want


def test_corpus_stream_refusals(spark, tmp_path):
    from flink_note_spark.pipelines import prepare_training_corpus_stream

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    with pytest.raises(ValueError, match="checkpoint"):
        prepare_training_corpus_stream(
            stream, state_dir=str(tmp_path / "s"), checkpoint="",
            index_table="t_x",
        )
    with pytest.raises(ValueError, match="max_df"):
        prepare_training_corpus_stream(
            stream, state_dir=str(tmp_path / "s"),
            checkpoint=str(tmp_path / "c"), index_table="t_x",
            minhash_params={"max_df": 5},
        )
    with pytest.raises(ValueError, match="unknown minhash_params"):
        prepare_training_corpus_stream(
            stream, state_dir=str(tmp_path / "s"),
            checkpoint=str(tmp_path / "c"), index_table="t_x",
            minhash_params={"bogus": 1},
        )


def test_corpus_stream_fresh_catalog_reregisters(spark, tmp_path):
    """A FRESH session's catalog has forgotten the bucketed index
    tables (in-memory metastore) while the files persist: the pipeline
    re-registers the layout (minhash_index_register, r12) instead of
    refusing or clobbering, and the resumed run still equals batch."""
    from flink_note_spark.pipelines import read_corpus_stream_output

    first, rest = STREAM_DOCS[:4], STREAM_DOCS[4:]
    chunks = _doc_chunks(tmp_path, first, per=2)
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    _run_corpus_stream(
        spark, chunks, state, ckpt, index_table="t_corpus_idx_fc"
    )
    # simulate the fresh session: catalog wiped, files intact
    for suffix in ("", "__docs", "__meta"):
        spark.sql(f"DROP TABLE t_corpus_idx_fc{suffix}")

    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        ("doc_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("text", pa.string()),
    ])
    t0 = dt.datetime(2024, 1, 1)
    for k, (i, s) in enumerate(rest):
        p = str(chunks / f"late{k}.parquet")
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": i, "ts": t0 + dt.timedelta(seconds=i),
                  "text": s}],
                schema=schema,
            ),
            p,
        )
        os.utime(p, (time.time() + k + 1, time.time() + k + 1))
    _run_corpus_stream(
        spark, chunks, state, ckpt, index_table="t_corpus_idx_fc"
    )
    out = read_corpus_stream_output(spark, str(state)).collect()
    assert {r.doc_id: r.split for r in out} == _batch_kept(
        spark, STREAM_DOCS
    )


def test_corpus_stream_digest_store_touched_buckets(spark, tmp_path):
    """r13 (VERDICT r12 #1): the digest store is bucket-partitioned on
    the digest hash. Write side: an epoch writes ONLY the bucket dirs
    its batch touches (≤ batch digests, the retract-state shape). Read
    side: the ownership probe's scan carries a PartitionFilters entry
    on ``bucket`` (directory pruning, not post-scan filtering) plus
    the strictly-earlier ``epoch`` fence."""
    import glob

    from flink_note_spark.pipelines.curate import (
        _digest_meta,
        _digest_store_read,
    )

    chunks = _doc_chunks(tmp_path, STREAM_DOCS, per=1)  # 8 one-doc epochs
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_tb", digest_buckets=8,
    )
    gen, fence, nb = _digest_meta(spark, str(state))
    assert (gen, fence, nb) == (-1, -1, 8)
    epoch_dirs = sorted(glob.glob(f"{state}/digests/epoch=*"))
    assert len(epoch_dirs) == 8
    for d in epoch_dirs:
        buckets = glob.glob(f"{d}/bucket=*")
        assert len(buckets) <= 1  # one-doc batches: ≤1 touched bucket
    # exact-dup epochs (docs 4 and 6) own nothing new -> no bucket dir
    n_empty = sum(
        1 for d in epoch_dirs if not glob.glob(f"{d}/bucket=*")
    )
    assert n_empty == 2
    from pyspark.sql import functions as F

    frame, _ = _digest_store_read(spark, str(state), before_epoch=5)
    probe = frame.filter(F.col("bucket").isin([3]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "bucket" in pf and "epoch" in pf


def test_corpus_stream_digest_compaction_bounds_files(spark, tmp_path):
    """r13 (VERDICT r12 #1): digest_compact_every folds epoch dirs into
    one bucket-partitioned base — the per-epoch small-file growth is
    bounded, the newest epoch survives (retry fence), a second manual
    compaction is a no-op, and the kept set still equals batch."""
    import glob

    from flink_note_spark.pipelines import read_corpus_stream_output
    from flink_note_spark.pipelines.curate import (
        _digest_meta,
        compact_digest_store,
    )

    chunks = _doc_chunks(tmp_path, STREAM_DOCS, per=1)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_cp", digest_buckets=4,
        digest_compact_every=3,
    )
    # 8 epochs, folds after epochs 2,5 -> epochs ≤4 folded, ≥5 remain
    epochs = sorted(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{state}/digests/epoch=*")
    )
    assert epochs == [5, 6, 7]
    gen, fence, nb = _digest_meta(spark, str(state))
    assert (gen, fence, nb) == (1, 4, 4)
    base_files = glob.glob(f"{state}/digests_base/gen=1/bucket=*/*.parquet")
    assert 0 < len(base_files) <= 4  # ≤ one file per bucket
    assert not glob.glob(f"{state}/digests_base/gen=0")  # old gen removed
    # manual fold now: epochs 5,6 fold, newest (7) survives
    out = compact_digest_store(spark, str(state))
    assert out["epochs_folded"] == 2
    assert compact_digest_store(spark, str(state)) == {
        "epochs_folded": 0, "files_folded": 0,
    }
    got = {
        r.doc_id: r.split
        for r in read_corpus_stream_output(spark, str(state)).collect()
    }
    assert got == _batch_kept(spark, STREAM_DOCS)


def test_fs_probes_scheme_agnostic(spark, tmp_path):
    """r13 (ADVICE): durable-state presence checks go through the
    Hadoop FileSystem API, so explicit ``file:`` URIs (the stand-in
    for any remote scheme) resolve exactly like bare local paths —
    os.path would have silently read False on a scheme'd path."""
    from flink_note_spark.pipelines.curate import _fs_exists, _fs_list

    d = tmp_path / "probe"
    d.mkdir()
    (d / "x.parquet").write_text("stub")
    assert _fs_exists(spark, str(d))
    assert _fs_exists(spark, f"file://{d}")
    assert not _fs_exists(spark, str(tmp_path / "ghost"))
    assert not _fs_exists(spark, f"file://{tmp_path}/ghost")
    assert _fs_list(spark, f"file://{d}") == ["x.parquet"]


def test_corpus_stream_bloom_equals_store_path(spark, tmp_path):
    """r13 (VERDICT r12 #8): with a reasonably sized filter (no false
    positives at this corpus size) the bloom exact-dedup path keeps
    exactly the batch pipeline's set — the ==batch equality transfers
    whenever the FP rate is negligible."""
    from flink_note_spark.pipelines import read_corpus_stream_output

    chunks = _doc_chunks(tmp_path, STREAM_DOCS, per=3)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_bl", exact_dedup="bloom",
    )
    got = {
        r.doc_id: r.split
        for r in read_corpus_stream_output(spark, str(state)).collect()
    }
    assert got == _batch_kept(spark, STREAM_DOCS)
    assert not (state / "digests").exists()  # no ownership store


def test_corpus_stream_bloom_fp_trade_and_safety(spark, tmp_path):
    """r13 (VERDICT r12 #8): the one-sided-error contract, forced.
    A 1-shard 8-bit filter with one probe per digest saturates by
    pigeonhole over 9 distinct docs (one per epoch): at least one
    NOVEL doc is wrongly dropped (the documented FP trade for fixed
    state), while the true exact duplicate is still dropped (no false
    negatives — the safety direction), and shadowed filter snapshots
    compact away."""
    import glob

    from flink_note_spark.pipelines import read_corpus_stream_output

    docs = [
        (i, f"distinct filler document number {i} with enough english "
            "words to pass every quality gate")
        for i in range(1, 10)
    ] + [(10, "distinct filler document number 1 with enough english "
              "words to pass every quality gate")]  # exact dup of 1
    chunks = _doc_chunks(tmp_path, docs, per=1)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_fp", exact_dedup="bloom",
        near_dup_threshold=None,
        bloom_params={"n_shards": 1, "bits_per_shard": 8, "n_hashes": 1},
        digest_compact_every=4,
    )
    kept = {
        r.doc_id
        for r in read_corpus_stream_output(spark, str(state)).collect()
    }
    assert 10 not in kept          # true duplicate always dropped
    assert kept <= set(range(1, 10))
    assert len(kept) < 9           # >= 1 novel doc wrongly dropped
    assert 1 in kept               # the first doc always survives
    # shadowed snapshots were dropped by the inline compaction
    assert len(glob.glob(f"{state}/bloom/epoch=*")) < 10
    # refusal parity: bloom_params without the bloom path is loud
    from flink_note_spark.pipelines import prepare_training_corpus_stream

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(str(chunks))
    )
    with pytest.raises(ValueError, match="bloom_params"):
        prepare_training_corpus_stream(
            stream, state_dir=str(tmp_path / "s2"),
            checkpoint=str(tmp_path / "c2"), index_table="t_x",
            bloom_params={"n_shards": 2},
        )
    with pytest.raises(ValueError, match="power of two"):
        prepare_training_corpus_stream(
            stream, state_dir=str(tmp_path / "s2"),
            checkpoint=str(tmp_path / "c2"), index_table="t_x",
            exact_dedup="bloom", bloom_params={"bits_per_shard": 12},
        )


def test_compact_corpus_output_rebuild_index_probe_equal(spark, tmp_path):
    """r13 (VERDICT r12 #3), non-flooded corpus: rebuilding the
    persisted index from the kept corpus is PROBE-EQUIVALENT to the
    appended index — signatures are pure functions of text + the
    meta's params, so a fresh increment's candidate pairs are
    identical before and after the rebuild, and membership equals the
    kept ids."""
    from flink_note_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_load,
    )
    from flink_note_spark.pipelines import compact_corpus_output

    chunks = _doc_chunks(tmp_path, STREAM_DOCS, per=3)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_rb",
    )
    inc = spark.createDataFrame(
        [(100, BASE + " fresh tail"), (101, "wholly unrelated words "
          "about databases and storage engines at scale")],
        "doc_id long, text string",
    )

    def probe(idx):
        return sorted(
            (r.d1, r.d2) for r in dedup_against_index(
                inc, idx, threshold=0.4, ids_unique=True
            ).collect()
        )

    before = probe(minhash_index_load(spark, "t_corpus_idx_rb"))
    compact_corpus_output(
        spark, str(state), str(tmp_path / "snap"),
        rebuild_index=True, index_table="t_corpus_idx_rb",
    )
    idx2 = minhash_index_load(spark, "t_corpus_idx_rb")
    assert probe(idx2) == before and before  # doc 100 pairs with 1
    assert {r[0] for r in idx2.docs.select("doc_id").collect()} == {
        1, 3, 8,
    }
    with pytest.raises(ValueError, match="index_table"):
        compact_corpus_output(
            spark, str(state), str(tmp_path / "snap2"),
            rebuild_index=True,
        )


def test_compact_corpus_output_rebuild_enforces_bucket_cap(spark, tmp_path):
    """r13 (VERDICT r12 #3), flooded corpus: per-batch accretion
    enforces max_bucket only within each increment, so two docs from
    DIFFERENT epochs sharing a band bucket flood past a cap of 1 in
    the appended index; the rebuild re-counts globally and drops the
    flooded buckets."""
    from pyspark.sql import functions as F

    from flink_note_spark.operators.dedup import minhash_index_load
    from flink_note_spark.pipelines import compact_corpus_output

    # single-word difference -> shingle Jaccard 0.6: band-bucket
    # sharing near-certain at 16 bands (r=2), exact verify still
    # far below the 0.95 keep-both threshold
    a = ("the quick brown fox jumps over the lazy dog near the old "
         "stone bridge")
    b = ("the quick brown fox jumps over the lazy cat near the old "
         "stone bridge")
    chunks = _doc_chunks(tmp_path, [(1, a), (2, b)], per=1)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_fl",
        near_dup_threshold=0.95,  # candidates verify-fail: both kept
        minhash_params={"bands": 16, "max_bucket": 1},
    )

    def max_bucket_size(idx):
        top = (
            idx.bands.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("m"))
            .first()
        )
        return int(top.m)

    appended = minhash_index_load(spark, "t_corpus_idx_fl")
    assert {r[0] for r in appended.docs.select("doc_id").collect()} == {
        1, 2,
    }
    assert max_bucket_size(appended) > 1  # flooded past the cap
    compact_corpus_output(
        spark, str(state), str(tmp_path / "snap"),
        rebuild_index=True, index_table="t_corpus_idx_fl",
    )
    assert max_bucket_size(
        minhash_index_load(spark, "t_corpus_idx_fl")
    ) == 1


def test_compact_corpus_output_runs_global_stages(spark, tmp_path):
    """Batch compaction (r12) over the accumulated stream output: the
    ExactSubstr span strip and the n-gram novelty gate — the stages the
    ingest pipeline refuses by absence — run over the WHOLE kept
    corpus; the snapshot lands at out_path and the stream's durable
    state is untouched (no feedback)."""
    from flink_note_spark.pipelines import compact_corpus_output

    boiler = "subscribe to our newsletter for daily updates"
    docs = [
        (1, f"an interesting article about spark engines {boiler}"),
        (2, f"another long piece on flink runtimes here {boiler}"),
        (3, "a fully unique document with original phrasing inside"),
        # novelty victim: its 3-grams are a subset of doc 5's, but no
        # 6-gram repeats (the span strip must not touch this pair)
        (4, "red orange yellow green blue"),
        (5, "zz red orange yellow green blue yy"),
    ]
    chunks = _doc_chunks(tmp_path, docs, per=2)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_corpus_idx_cc", near_dup_threshold=None,
    )
    import glob

    digests_before = len(
        glob.glob(str(state / "digests" / "*.parquet"))
    )
    out = compact_corpus_output(
        spark, str(state), str(tmp_path / "snap"),
        remove_spans_n=6, remove_spans_min_count=2,
        max_shared_shingle_ratio=0.7,
    )
    rows = {r.doc_id: r.text for r in out.collect()}
    # the shared boilerplate 5-gram span is stripped from BOTH docs
    assert all(boiler not in t for t in rows.values())
    assert 3 in rows and "original phrasing" in rows[3]
    # novelty: doc 4 shares every 3-gram with doc 5 -> dropped; 5 keeps
    assert 4 not in rows and 5 in rows
    # no feedback into stream state; snapshot is re-readable
    assert len(glob.glob(str(state / "digests" / "*.parquet"))) \
        == digests_before
    assert spark.read.parquet(str(tmp_path / "snap")).count() == len(rows)
    # idempotent overwrite
    again = compact_corpus_output(
        spark, str(state), str(tmp_path / "snap"),
        remove_spans_n=6, remove_spans_min_count=2,
        max_shared_shingle_ratio=0.7,
    )
    assert {r.doc_id for r in again.collect()} == set(rows)


def test_compact_corpus_output_semantic_refusal(spark, tmp_path):
    from flink_note_spark.pipelines import compact_corpus_output

    with pytest.raises(ValueError, match="embeddings frame"):
        compact_corpus_output(
            spark, str(tmp_path / "nostate"), str(tmp_path / "o"),
            semantic_threshold=0.9,
        )


# ---------------------------------------------------------------------------
# Streaming IVF-index maintenance (r13 — pipelines/embed.py)


def _emb_vec(i: int, dim: int = 8) -> list[float]:
    """Deterministic non-degenerate embedding for vec_id i."""
    return [((i * 31 + j * 7) % 17) / 17.0 + 0.01 for j in range(dim)]


def _emb_chunks(tmp_path, ids_per_chunk, dim: int = 8, name="emb_chunks"):
    """Parquet chunk files with strictly increasing mtimes (the file
    source orders micro-batches by mtime — test-harness doctrine).
    ``ids_per_chunk``: list of id-lists, one chunk each."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir(exist_ok=True)
    schema = pa.schema([
        ("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64())),
    ])
    base = time.time() - len(ids_per_chunk) - 60
    for j, ids in enumerate(ids_per_chunk):
        t = pa.Table.from_pylist(
            [{"vec_id": i, "embedding": _emb_vec(i, dim)} for i in ids],
            schema=schema,
        )
        path = str(d / f"c{j:03d}.parquet")
        pq.write_table(t, path)
        os.utime(path, (base + j, base + j))
    return d


EMB_SCHEMA = "vec_id long, embedding array<double>"


def _run_ivf_stream(spark, chunks, ckpt, index_table, index_path, **kw):
    from flink_note_spark.pipelines import ivf_ingest_stream

    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    q = ivf_ingest_stream(
        stream, checkpoint=str(ckpt), index_table=index_table,
        index_path=str(index_path), n_cells=4, iters=1,
        index_buckets=2, **kw,
    )
    q.processAllAvailable()
    q.stop()


def _drop_ivf(spark, table):
    for t in (table, f"{table}__centroids", f"{table}__meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivf_ingest_stream_accretes_and_matches_union(spark, tmp_path):
    """First batch bootstraps (train + save), later batches accrete by
    assignment against the SAVED centroids — so the final index must
    EQUAL the union corpus assigned against the loaded centroids,
    pinned at partial probe (sensitive to appended rows' cells), and
    hold every id exactly once."""
    from pyspark.sql import functions as F

    from flink_note_spark.operators.similarity import (
        IvfIndex,
        _ivf_assign_cells,
        ivf_load,
        ivf_query,
    )

    ids = list(range(24))
    chunks = _emb_chunks(tmp_path, [ids[:8], ids[8:16], ids[16:]])
    table = "t_ivf_stream_acc"
    try:
        _run_ivf_stream(
            spark, chunks, tmp_path / "ckpt", table, tmp_path / "idx"
        )
        loaded = ivf_load(spark, table)
        got_ids = [r[0] for r in loaded.assigned.select("neighbor_id").collect()]
        assert sorted(got_ids) == ids  # every id exactly once

        all_rows = spark.createDataFrame(
            [(i, _emb_vec(i)) for i in ids], EMB_SCHEMA
        )
        c = all_rows.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cv"),
        )
        union_idx = IvfIndex(
            loaded.centroids,
            _ivf_assign_cells(c, loaded.centroids, "__cv")
            .withColumnRenamed("__cell", "cell_id"),
            loaded.id_type,
        )
        q = all_rows.filter(F.col("vec_id") < 6)
        want = {
            (int(r.query_id), int(r.neighbor_id), int(r.rank))
            for r in ivf_query(union_idx, q, k=3, n_probe=2).collect()
        }
        got = {
            (int(r.query_id), int(r.neighbor_id), int(r.rank))
            for r in ivf_query(loaded, q, k=3, n_probe=2).collect()
        }
        assert want and got == want
    finally:
        _drop_ivf(spark, table)


def test_ivf_ingest_stream_restart_reingest_first_write_wins(
    spark, tmp_path
):
    """run → stop → a late chunk lands carrying RE-INGESTED ids (with
    changed vectors) plus new ids → restart from the SAME checkpoint:
    ids stay unique, the re-ingested ids keep their ORIGINAL vectors
    (first-write-wins — the skip-mode guard), the new ids append."""
    import os
    import time

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_note_spark.operators.similarity import ivf_load

    chunks = _emb_chunks(tmp_path, [list(range(8)), list(range(8, 12))])
    table = "t_ivf_stream_rs"
    ckpt = tmp_path / "ckpt"
    try:
        _run_ivf_stream(spark, chunks, ckpt, table, tmp_path / "idx")
        assert ivf_load(spark, table).assigned.count() == 12

        schema = pa.schema([
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float64())),
        ])
        late = [
            # id 3 re-ingested with a DIFFERENT vector + two new ids
            {"vec_id": 3, "embedding": [9.0] * 8},
            {"vec_id": 12, "embedding": _emb_vec(12)},
            {"vec_id": 13, "embedding": _emb_vec(13)},
        ]
        p = str(chunks / "late.parquet")
        pq.write_table(pa.Table.from_pylist(late, schema=schema), p)
        now = time.time()
        os.utime(p, (now, now))

        _run_ivf_stream(spark, chunks, ckpt, table, tmp_path / "idx")
        loaded = ivf_load(spark, table)
        rows = {
            r["neighbor_id"]: r["__cv"]
            for r in loaded.assigned.collect()
        }
        assert sorted(rows) == list(range(14))  # unique, new ids in
        # first-write-wins: id 3 kept its original vector
        assert np.allclose(rows[3], _emb_vec(3))
        assert np.allclose(rows[12], _emb_vec(12))
    finally:
        _drop_ivf(spark, table)


def test_ivf_ingest_stream_refuses_tiny_bootstrap(spark, tmp_path):
    """A bootstrap batch smaller than n_cells refuses loudly instead of
    silently training a smaller (and unrepresentative) index."""
    import pytest as _pytest

    from pyspark.errors.exceptions.captured import StreamingQueryException

    chunks = _emb_chunks(tmp_path, [[0, 1]])  # 2 rows < n_cells=4
    table = "t_ivf_stream_tiny"
    try:
        with _pytest.raises(
            StreamingQueryException, match="bootstrap batch"
        ):
            _run_ivf_stream(
                spark, chunks, tmp_path / "ckpt", table, tmp_path / "idx"
            )
    finally:
        _drop_ivf(spark, table)


def test_pq_ingest_stream_accretes_and_matches_union(spark, tmp_path):
    """PQ streaming twin: first batch trains codebooks, later batches
    encode against them — the final index must EQUAL the union corpus
    encoded against the loaded codebooks, pinned at a partial
    shortlist."""
    from pyspark.sql import functions as F

    from flink_note_spark.operators.similarity import (
        PqIndex,
        _pq_encode,
        pq_load,
        pq_query,
    )
    from flink_note_spark.pipelines import pq_ingest_stream

    ids = list(range(24))
    chunks = _emb_chunks(tmp_path, [ids[:8], ids[8:16], ids[16:]])
    table = "t_pq_stream_acc"
    try:
        stream = (
            spark.readStream.schema(EMB_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(chunks))
        )
        q = pq_ingest_stream(
            stream, checkpoint=str(tmp_path / "ckpt"), index_table=table,
            index_path=str(tmp_path / "idx"), m=4, n_codes=4, iters=1,
        )
        q.processAllAvailable()
        q.stop()

        loaded = pq_load(spark, table)
        got_ids = [r[0] for r in loaded.encoded.select("neighbor_id").collect()]
        assert sorted(got_ids) == ids

        all_rows = spark.createDataFrame(
            [(i, _emb_vec(i)) for i in ids], EMB_SCHEMA
        )
        c = all_rows.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cv"),
        )
        union_idx = PqIndex(
            loaded.codebooks,
            _pq_encode(c, loaded.codebooks, loaded.id_type),
            loaded.id_type,
        )
        qf = all_rows.filter(F.col("vec_id") < 6)
        want = {
            (int(r.query_id), int(r.neighbor_id), int(r.rank))
            for r in pq_query(union_idx, qf, k=3, shortlist=8).collect()
        }
        got = {
            (int(r.query_id), int(r.neighbor_id), int(r.rank))
            for r in pq_query(loaded, qf, k=3, shortlist=8).collect()
        }
        assert want and got == want
    finally:
        for t in (table, f"{table}__codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivfpq_ingest_stream_accretes_and_matches_union(spark, tmp_path):
    """IVF-PQ streaming twin: the final index must EQUAL the union
    corpus assigned+encoded against the loaded centroids AND codebooks,
    pinned at partial probe + partial shortlist."""
    from pyspark.sql import functions as F

    from flink_note_spark.operators.similarity import (
        IvfPqIndex,
        _ivfpq_encode,
        ivfpq_load,
        ivfpq_query,
    )
    from flink_note_spark.pipelines import ivfpq_ingest_stream

    ids = list(range(24))
    chunks = _emb_chunks(tmp_path, [ids[:8], ids[8:16], ids[16:]])
    table = "t_ivfpq_stream_acc"
    try:
        stream = (
            spark.readStream.schema(EMB_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(chunks))
        )
        q = ivfpq_ingest_stream(
            stream, checkpoint=str(tmp_path / "ckpt"), index_table=table,
            index_path=str(tmp_path / "idx"), n_cells=4, m=4, n_codes=4,
            iters=1, index_buckets=2,
        )
        q.processAllAvailable()
        q.stop()

        loaded = ivfpq_load(spark, table)
        got_ids = [r[0] for r in loaded.encoded.select("neighbor_id").collect()]
        assert sorted(got_ids) == ids

        all_rows = spark.createDataFrame(
            [(i, _emb_vec(i)) for i in ids], EMB_SCHEMA
        )
        c = all_rows.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cv"),
        )
        union_idx = IvfPqIndex(
            loaded.centroids, loaded.codebooks,
            _ivfpq_encode(c, loaded.centroids, loaded.codebooks,
                          loaded.id_type),
            loaded.id_type,
        )
        qf = all_rows.filter(F.col("vec_id") < 6)
        want = {
            (int(r.query_id), int(r.neighbor_id), int(r.rank))
            for r in ivfpq_query(
                union_idx, qf, k=3, n_probe=2, shortlist=8
            ).collect()
        }
        got = {
            (int(r.query_id), int(r.neighbor_id), int(r.rank))
            for r in ivfpq_query(
                loaded, qf, k=3, n_probe=2, shortlist=8
            ).collect()
        }
        assert want and got == want
    finally:
        for t in (table, f"{table}__centroids", f"{table}__codebooks",
                  f"{table}__meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


# ---------------------------------------------------------------------------
# r13 review fixes: durable-state guards + compaction orphan sweep


def test_corpus_stream_state_guards(spark, tmp_path):
    """Start-time refusals over the durable exact-dedup state: bloom
    geometry persists and a mismatched resume refuses; mode flips
    (store<->bloom) refuse; a pre-r13 flat digest layout refuses."""
    chunks = _doc_chunks(tmp_path, STREAM_DOCS[:4], per=2)
    state = tmp_path / "state_bl"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt_bl",
        index_table="t_guard_bl", exact_dedup="bloom",
    )
    assert (state / "bloom_geom").exists()  # geometry persisted

    def rerun(**kw):
        _run_corpus_stream(
            spark, chunks, state, tmp_path / "ckpt_bl",
            index_table="t_guard_bl", **kw,
        )

    with pytest.raises(ValueError, match="geometry mismatch"):
        rerun(exact_dedup="bloom",
              bloom_params={"bits_per_shard": 1 << 22})
    with pytest.raises(ValueError, match="BLOOM state"):
        rerun(exact_dedup="store")

    # store state refuses a bloom resume
    state2 = tmp_path / "state_st"
    _run_corpus_stream(
        spark, chunks, state2, tmp_path / "ckpt_st",
        index_table="t_guard_st",
    )
    with pytest.raises(ValueError, match="ownership STORE"):
        _run_corpus_stream(
            spark, chunks, state2, tmp_path / "ckpt_st",
            index_table="t_guard_st", exact_dedup="bloom",
        )

    # pre-r13 flat digest layout refuses with migration guidance
    state3 = tmp_path / "state_flat"
    (state3 / "digests").mkdir(parents=True)
    (state3 / "digests" / "part-00000.parquet").write_bytes(b"x")
    with pytest.raises(ValueError, match="FLAT digest"):
        _run_corpus_stream(
            spark, chunks, state3, tmp_path / "ckpt_flat",
            index_table="t_guard_flat",
        )


def test_compact_digest_store_sweeps_crash_orphans(spark, tmp_path):
    """A crash between a compaction's meta flip and its deletions
    leaves folded epoch dirs (<= fence) and a superseded gen dir that
    the reader ignores but nothing removed — the next compaction now
    sweeps them, bounding listing growth across crashes."""
    from flink_note_spark.pipelines.curate import (
        _digest_meta,
        compact_digest_store,
    )

    chunks = _doc_chunks(tmp_path, STREAM_DOCS, per=2)
    state = tmp_path / "state"
    _run_corpus_stream(
        spark, chunks, state, tmp_path / "ckpt",
        index_table="t_sweep_idx", digest_compact_every=2,
    )
    gen, fence, _nb = _digest_meta(spark, str(state))
    assert gen >= 0 and fence >= 0  # a compaction ran

    orphan_ep = state / "digests" / f"epoch={fence}" / "bucket=0"
    orphan_ep.mkdir(parents=True)
    (orphan_ep / "stale.parquet").write_bytes(b"x")
    orphan_gen = state / "digests_base" / f"gen={gen + 7}"
    orphan_gen.mkdir(parents=True)
    (orphan_gen / "stale.parquet").write_bytes(b"x")

    compact_digest_store(spark, str(state))
    assert not (state / "digests" / f"epoch={fence}").exists()
    assert not orphan_gen.exists()
