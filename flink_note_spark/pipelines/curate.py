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

from pyspark.sql import DataFrame, Window
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
        h = F.sha2(F.lower(F.trim(F.col(text_col))), 256)
        keep = Window.partitionBy(h).orderBy(F.col(id_col).asc())
        out = (
            out.withColumn("__rn", F.row_number().over(keep))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    return out.filter(
        F.col("lang_pred").isin(*config.lang_allow)
        & F.col("n_words").between(config.min_words, config.max_words)
        & (F.col("stop_ratio") <= config.max_stop_ratio)
    )
