"""Composed pipelines: end-to-end flows built purely from the operator
library — the way a training-data user actually consumes the engine.
"""

from flink_note_spark.pipelines.embed import (
    ivf_ingest_stream,
    ivfpq_ingest_stream,
    pq_ingest_stream,
)
from flink_note_spark.pipelines.curate import (
    CurationConfig,
    compact_corpus_output,
    curate_corpus,
    prepare_training_corpus,
    prepare_training_corpus_stream,
    read_corpus_stream_output,
)

__all__ = [
    "CurationConfig",
    "compact_corpus_output",
    "curate_corpus",
    "ivf_ingest_stream",
    "ivfpq_ingest_stream",
    "pq_ingest_stream",
    "prepare_training_corpus",
    "prepare_training_corpus_stream",
    "read_corpus_stream_output",
]
