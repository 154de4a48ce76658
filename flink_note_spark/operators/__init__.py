"""Operator library — reusable DataFrame → DataFrame transformations.

Each operator is a *composition of built-in Spark operators* wherever the
semantics allow (SURVEY.md §7.2); pandas-UDF paths exist only where bit
manipulation per document genuinely can't be expressed relationally
(SimHash) or where the work is opaque-binary decoding (multimodal stubs).
"""

from flink_note_spark.operators.components import (
    canonical_docs,
    connected_components,
    dedup_clusters,
)
from flink_note_spark.operators.cogroup import cogroup_apply
from flink_note_spark.operators.cep import match_pattern
from flink_note_spark.operators.match_recognize import match_recognize
from flink_note_spark.operators.enrich import batched_enrich, lookup_join
from flink_note_spark.operators.iterate import iterate
from flink_note_spark.operators.joins import (
    asof_join,
    range_join,
    theta_join,
)
from flink_note_spark.operators.windows import (
    count_window,
    sessionize,
    sliding_count_window,
    topk_per_group,
    window_dedup,
    window_top_n,
)
from flink_note_spark.operators.dedup import (
    decontaminate,
    dup_span_stats,
    decontaminate_splits,
    exact_dedup,
    exact_dedup_rows,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from flink_note_spark.operators.packing import pack_sequences, packing_stats
from flink_note_spark.operators.sampling import (
    hash_split,
    mixture_sample,
    reservoir_per_key,
    stratified_sample,
)
from flink_note_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from flink_note_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    IvfIndex,
    ivf_build,
    ivf_load,
    ivf_query,
    ivf_save,
    ivf_topk,
    lsh_cosine_topk,
    lsh_embedding_near_dup_pairs,
    PqIndex,
    pq_build,
    pq_query,
    pq_topk,
    pq_save,
    pq_load,
    ivfpq_topk,
)
from flink_note_spark.operators.timeseries import (
    ewma,
    gapfill,
    interval_concurrency,
    lttb_downsample,
    max_concurrency,
    merge_partials,
    retention_cohorts,
    rollup_compact,
    rollup_finalize,
    rollup_partials,
    rollup_read,
    rollup_stream_start,
    rollup_up,
    time_bucket_s,
)
from flink_note_spark.operators.text import (
    clean_text,
    doc_fingerprint,
    frequent_tokens,
    frequent_tokens_sketch,
    language_id,
    pii_scan,
    repetition_stats,
    text_quality,
    tfidf_top_terms,
    token_stats,
)

__all__ = [
    "canonical_docs",
    "connected_components",
    "dedup_clusters",
    "cogroup_apply",
    "match_pattern",
    "match_recognize",
    "iterate",
    "batched_enrich",
    "lookup_join",
    "asof_join",
    "range_join",
    "theta_join",
    "sessionize",
    "count_window",
    "sliding_count_window",
    "topk_per_group",
    "window_dedup",
    "window_top_n",
    "decontaminate",
    "dup_span_stats",
    "decontaminate_splits",
    "exact_dedup",
    "exact_dedup_rows",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "pack_sequences",
    "packing_stats",
    "hash_split",
    "mixture_sample",
    "reservoir_per_key",
    "stratified_sample",
    "bucketed_join",
    "salted_join",
    "write_bucketed",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "IvfIndex",
    "ivf_build",
    "ivf_load",
    "ivf_query",
    "ivf_save",
    "ivf_topk",
    "PqIndex",
    "pq_build",
    "pq_query",
    "pq_topk",
    "pq_save",
    "pq_load",
    "ivfpq_topk",
    "lsh_cosine_topk",
    "lsh_embedding_near_dup_pairs",
    "ewma",
    "gapfill",
    "interval_concurrency",
    "lttb_downsample",
    "max_concurrency",
    "merge_partials",
    "retention_cohorts",
    "rollup_compact",
    "rollup_finalize",
    "rollup_partials",
    "rollup_read",
    "rollup_stream_start",
    "rollup_up",
    "time_bucket_s",
    "clean_text",
    "doc_fingerprint",
    "frequent_tokens",
    "frequent_tokens_sketch",
    "language_id",
    "pii_scan",
    "repetition_stats",
    "text_quality",
    "tfidf_top_terms",
    "token_stats",
]
