"""Corpus curation pipeline: the composed LLM-training-data flow
(dedup → language filter → quality filter) expressed as one declarative
DataFrame chain, so Catalyst sees the WHOLE pipeline and can fuse
filters into the scan, prune columns, and pick join/agg strategies
globally — the reason operators compose instead of materializing
between steps.

Every stage is a pure column expression or a single keyed window, so the
pipeline runs in two stages at any scale: scan (+ all filters, language
ID, quality signals, hashing) → one shuffle on the content hash for
keep-first dedup.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_note_spark.functions.scalar import words
from flink_note_spark.operators.text import STOPWORDS, language_id


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for :func:`curate_corpus` (defaults mirror common
    pretraining-corpus hygiene)."""

    min_words: int = 5
    max_words: int = 100_000
    lang_allow: tuple[str, ...] = ("en", "es", "fr", "de", "zh")
    max_stop_ratio: float = 0.9
    dedup: bool = True


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: CurationConfig = CurationConfig(),
) -> DataFrame:
    """Curate a document table for training: exact-dedup (keep the
    smallest id per normalized content), heuristic language allowlist,
    and word-count / stopword-ratio quality gates.

    Returns the curated DataFrame with ``lang_pred``, ``n_words`` and
    ``stop_ratio`` columns attached (callers chain further operators —
    near-dup removal, tokenization — on top). Deterministic: same input
    → same output set, independent of partitioning.
    """
    w = words(text_col)
    out = language_id(df, text_col).withColumn("n_words", F.size(w)).withColumn(
        "stop_ratio",
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
        / F.greatest(F.size(w), F.lit(1)),
    )

    if config.dedup:
        from flink_note_spark.operators.dedup import exact_dedup_rows

        out = exact_dedup_rows(out, text_col, id_col)

    return out.filter(
        F.col("lang_pred").isin(*config.lang_allow)
        & F.col("n_words").between(config.min_words, config.max_words)
        & (F.col("stop_ratio") <= config.max_stop_ratio)
    )


def prepare_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: CurationConfig = CurationConfig(),
    near_dup_threshold: float | None = 0.7,
    splits: dict[str, float] | None = None,
    seed: int = 42,
    pii_redact: bool = False,
    max_dup_word_ratio: float | None = None,
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 5,
    max_shared_shingle_ratio: float | None = None,
    semantic_threshold: float | None = None,
    embeddings: DataFrame | None = None,
    semantic_keep_by: "str | None" = None,
    semantic_centroids: DataFrame | None = None,
    semantic_n_cells: int = 16,
    semantic_max_cell: int | None = 5000,
    split_hash_fn: str = "xxhash64",
    remove_spans_n: int | None = None,
    remove_spans_min_count: int = 2,
    benchmark_embeddings: DataFrame | None = None,
    semantic_decontaminate_threshold: float = 0.95,
) -> DataFrame:
    """The full corpus-preparation flow: [PII redaction →] curate (exact
    dedup + language + quality) → [repetition gate →] near-dup cluster
    collapse → [semantic dedup →] [benchmark decontamination →]
    deterministic train/val/test split. Bracketed stages are opt-in
    (r5/r10) and default OFF, preserving the original flow.

    ``semantic_threshold`` (r10 — VERDICT r9 #4) enables SemDeDup-style
    semantic collapse AFTER the lexical MinHash stage: ``embeddings``
    (an ``(id_col, vector)`` frame, REQUIRED with the stage) is
    semi-joined to the surviving ids — edges never resurrect documents
    an earlier stage removed — then
    :func:`~flink_note_spark.operators.similarity.semantic_dedup_pairs`
    buckets the embedding space into cells (k-means by default;
    ``semantic_centroids`` injects fixed centroids for the
    deterministic/oracle twin) and verifies cosine ≥ threshold within
    each cell, and :func:`~flink_note_spark.operators.components.
    canonical_docs` keeps one representative per transitive cluster —
    by smallest id, or by the ``semantic_keep_by`` MERIT column (e.g.
    ``"n_words"``; curation's quality columns are in scope here). The
    stage adds the cell equi-self-join (cells capped by
    ``semantic_max_cell``), the O(log n) components rounds over the
    pair list, and one id anti-join — ids and vectors shuffle, never
    document payloads; no stage is corpus-wide n².

    ``pii_redact`` rewrites ``text_col`` through the
    :func:`~flink_note_spark.operators.text.pii_scan` codegen chain
    BEFORE anything hashes it (redaction must precede dedup/shingling so
    placeholders, not raw PII, define content identity); the ``n_<kind>``
    count columns ride along. ``max_dup_word_ratio`` drops documents
    whose :func:`~flink_note_spark.operators.text.repetition_stats`
    duplicate-word ratio (rounded 6) exceeds the gate. ``benchmark``
    (any (id, text) frame) removes docs sharing a ``decontaminate_n``
    word-gram with it — the don't-train-on-eval pass, placed AFTER
    near-dup collapse so the (cheap) shingle semi-join sees the already
    shrunken corpus.

    Near-dup removal pairs documents with :func:`minhash_lsh_pairs` at
    ``near_dup_threshold`` (None skips the stage), groups them
    transitively with :func:`connected_components`, and keeps one
    representative per cluster (``canonical_docs``). The split column is
    :func:`hash_split` — reproducible under repartitioning and corpus
    accretion. Callers chain :func:`~flink_note_spark.operators.packing.
    pack_sequences` per split if they need token-budget bins.

    Stage shuffles at scale: one content-hash window (exact dedup), one
    doc-keyed aggregation + id join for the repetition gate, the
    LSH band pipeline (bounded by its bucket caps), the components
    rounds (O(log n), edge-list sized), the decontamination shingle
    semi-join (benchmark side broadcastable), and ZERO for the split
    (narrow hash predicate). Document payloads cross a shuffle only in
    the exact dedup window; every later stage ships ids. PII redaction
    and curation fuse into the scan stage.
    """
    from flink_note_spark.operators.components import canonical_docs
    from flink_note_spark.operators.dedup import decontaminate, minhash_lsh_pairs
    from flink_note_spark.operators.sampling import hash_split
    from flink_note_spark.operators.text import pii_scan, repetition_stats

    src = df
    if remove_spans_n is not None:
        # r10: the ExactSubstr strip runs FIRST — every later signal
        # (quality stats, shingles, hashes) must see the cleaned text,
        # exactly as RefinedWeb orders its boilerplate removal
        from flink_note_spark.operators.dedup import remove_dup_spans

        src = remove_dup_spans(
            src, n=remove_spans_n, min_count=remove_spans_min_count,
            id_col=id_col, text_col=text_col, out_col="__rs_clean",
        )
        src = (
            src.drop(text_col, "n_tokens", "n_kept_tokens")
            .withColumnRenamed("__rs_clean", text_col)
        )
    if pii_redact:
        src = pii_scan(src, text_col, redact=True)
    cur = curate_corpus(src, text_col, id_col, config)
    if max_dup_word_ratio is not None:
        # internal alias + LEFT join + drop: the gate must not clash
        # with a caller's own dup_word_ratio column, must not leak a new
        # column into the output schema, and must not silently drop
        # zero-token docs (repetition_stats emits no row for them — no
        # repetition signal means KEEP, not discard).
        rep = repetition_stats(
            cur.select(id_col, text_col), text_col, id_col
        ).select(id_col, F.col("dup_word_ratio").alias("__dup_ratio"))
        cur = (
            cur.join(rep, id_col, "left")
            .filter(
                F.coalesce(F.col("__dup_ratio"), F.lit(0.0))
                <= max_dup_word_ratio
            )
            .drop("__dup_ratio")
        )
    if max_shared_shingle_ratio is not None:
        from flink_note_spark.operators.text import ngram_novelty

        nov = ngram_novelty(
            cur.select(id_col, text_col), text_col, id_col, n=3
        ).select(id_col, "novelty")
        cur = (
            cur.join(nov, id_col, "left")
            .filter(
                # novelty NULL (sub-n doc) → no signal → keep
                F.coalesce(F.lit(1.0) - F.col("novelty"), F.lit(0.0))
                <= max_shared_shingle_ratio
            )
            .drop("novelty")
        )
    if near_dup_threshold is not None:
        # ids are unique after curate_corpus' keep-first dedup window.
        pairs = minhash_lsh_pairs(
            cur,
            id_col,
            text_col,
            threshold=near_dup_threshold,
            seed=seed,
            ids_unique=True,
        )
        cur = canonical_docs(cur, pairs, id_col)
    if semantic_threshold is not None:
        if embeddings is None:
            raise ValueError(
                "semantic_threshold requires an embeddings frame "
                f"({id_col!r} + one vector column)"
            )
        from flink_note_spark.operators.similarity import (
            semantic_dedup_pairs,
        )

        vec_cols = [c for c in embeddings.columns if c != id_col]
        if not vec_cols:
            raise ValueError(
                f"embeddings frame must carry {id_col!r} and a vector "
                f"column, got {embeddings.columns}"
            )
        # survivors only: an edge through an already-removed document
        # must not bridge two surviving clusters
        emb = embeddings.select(id_col, vec_cols[0]).join(
            cur.select(id_col), id_col, "semi"
        )
        spairs = semantic_dedup_pairs(
            emb,
            threshold=semantic_threshold,
            id_col=id_col,
            vec_col=vec_cols[0],
            n_cells=semantic_n_cells,
            seed=seed,
            centroids=semantic_centroids,
            max_cell=semantic_max_cell,
        )
        cur = canonical_docs(
            cur, spairs, id_col, keep_by=semantic_keep_by
        )
    if benchmark is not None:
        cur = decontaminate(
            cur, benchmark, n=decontaminate_n, id_col=id_col,
            text_col=text_col, ids_unique=True,
        )
    if benchmark_embeddings is not None:
        # r10: embedding-space decontamination — paraphrased eval
        # leakage the lexical 5-gram pass cannot catch. Requires the
        # corpus embeddings frame; the benchmark embeddings broadcast
        # (eval suites are small by contract), survivors stream
        # through one matmul pass, and only the REMOVED ids anti-join
        # back — document payloads never shuffle.
        if embeddings is None:
            raise ValueError(
                "benchmark_embeddings requires the corpus embeddings "
                f"frame too ({id_col!r} + one vector column)"
            )
        from flink_note_spark.operators.similarity import (
            semantic_decontaminate,
        )

        vec_cols = [c for c in embeddings.columns if c != id_col]
        bvec = [
            c for c in benchmark_embeddings.columns if c != id_col
        ]
        if not vec_cols or not bvec:
            raise ValueError(
                "embeddings frames must carry the id column and a "
                "vector column"
            )
        emb = embeddings.select(id_col, vec_cols[0]).join(
            cur.select(id_col), id_col, "semi"
        )
        removed = semantic_decontaminate(
            emb,
            benchmark_embeddings.select(
                F.col(bvec[0]).alias(vec_cols[0])
            ),
            threshold=semantic_decontaminate_threshold,
            id_col=id_col,
            vec_col=vec_cols[0],
            keep_contaminated=True,
        ).select(id_col)
        cur = cur.join(removed, id_col, "anti")
    return hash_split(
        cur,
        id_col,
        fractions=splits or {"train": 0.98, "val": 0.01, "test": 0.01},
        seed=seed,
        hash_fn=split_hash_fn,
    )
