"""LLM training-data pipeline queries over documents/embeddings
(north-star operators, SURVEY.md §2.2; BASELINE.json:north_star).

Oracle-checked where the algorithm is SQL-expressible (exact dedup,
n-gram Jaccard, brute-force cosine top-k, text analysis). MinHash/SimHash/
LSH variants have no DuckDB oracle (they hinge on engine-specific hash
functions) — the driver records rows-only checks, and the pytest suite
validates them against the exact operators (recall/precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_note_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from flink_note_spark.operators.multimodal import (
    attach_binary_column,
    extract_image_features,
)
from flink_note_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_cosine_topk,
    lsh_embedding_near_dup_pairs,
)
from flink_note_spark.operators.text import (
    STOPWORDS,
    TOKEN_RE,
    doc_fingerprint,
    language_id,
)
from flink_note_spark.functions.scalar import words
from flink_note_spark.session import load_table as _t

JACCARD_THRESHOLD = 0.4

#: Document-frequency cap for shingles in the dedup entry queries — the
#: 100 TB skew guard (SURVEY.md §7.3): one boilerplate shingle shared by
#: millions of docs would otherwise make the shingle self-join quadratic.
#: Any shingle on more than this fraction-independent absolute number of
#: docs carries no near-dup signal and is dropped BEFORE the join. The
#: oracle SQL applies the identical cap so results still hash-match.
SHINGLE_MAX_DF = 5000


def q29_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    return exact_dedup(d, "text", "doc_id").select(
        "content_hash", "keep_doc_id", "n_copies"
    )


_Q29_SQL = """
SELECT sha256(lower(trim(text))) AS content_hash,
       min(doc_id)               AS keep_doc_id,
       count(*)                  AS n_copies
FROM documents GROUP BY 1
"""


def q30_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs — the verification-path dedup
    (shingle equi-join, no cross join)."""
    d = _t(spark, sf, "documents")
    return jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=JACCARD_THRESHOLD,
        max_df=SHINGLE_MAX_DF,
        # doc_id is the documents table's primary key — skip the
        # defensive one-row-per-id shuffle the operator defaults to.
        ids_unique=True,
    )


_Q30_SQL = f"""
WITH w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS wlist
       FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(0, len(wlist) - 2),
                               i -> array_to_string(wlist[i+1:i+3], ' '))) AS shingle
  FROM w WHERE len(wlist) >= 3
),
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
    FROM sh0
  ) WHERE df <= {SHINGLE_MAX_DF}
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pair_inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_int
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2,
       round(n_int / (s1.sz + s2.sz - n_int), 6) AS jaccard
FROM pair_inter
JOIN sizes s1 ON s1.doc_id = d1
JOIN sizes s2 ON s2.doc_id = d2
WHERE n_int / (s1.sz + s2.sz - n_int) >= {JACCARD_THRESHOLD}
"""


def q31_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified by exact Jaccard. No SQL
    oracle (xxhash64-based signatures); rows-only driver check +
    ``tests/test_lsh_recall.py`` recall/precision assertions vs q30."""
    d = _t(spark, sf, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=32, bands=8,
        threshold=JACCARD_THRESHOLD, verify=True, max_df=SHINGLE_MAX_DF,
        ids_unique=True,  # doc_id is the table's primary key
    )


def q32_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3, pigeonhole band join). No SQL
    oracle (blake2b bit-voting); rows-only check + pytest."""
    d = _t(spark, sf, "documents")
    # ids_unique: doc_id is the table's primary key
    return simhash_pairs(d, "doc_id", "text", max_hamming=3, ids_unique=True)


def q33_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force exact cosine top-5 for query vectors vec_id < 10 —
    the ANN baseline (SURVEY.md §2.2 'Similarity search')."""
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return cosine_topk(q, e, k=5, id_col="vec_id", vec_col="embedding").withColumnRenamed(
        "rank", "rnk"
    )


_Q33_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
         AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim, rnk
FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 5
"""


def q34_lsh_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ANN variant: random-hyperplane LSH bucket join then exact re-rank.
    No SQL oracle (bucket keys are seed-derived);
    ``tests/test_lsh_recall.py`` asserts ≥0.9 recall against q33.

    Band sizing: P(bit agrees) = 1 − θ/π. The fixture corpus is
    near-uniform — true top-5 cosine ≈ 0.27–0.39 → p ≈ 0.59 — so
    recall ≥ 0.9 needs short keys and many tables: 4 bits × 24 tables
    gives 1 − (1 − p⁴)²⁴ ≈ 0.95 at the worst case. On a real clustered
    embedding corpus (near-dup cosine ≥ 0.85 → p ≥ 0.82) the same
    recall is reached with far cheaper 8–16-bit keys; the parameters are
    the knob, the plan shape (bucket equi-join, no cross join) is fixed.
    """
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return lsh_cosine_topk(
        q, e, k=5, id_col="vec_id", vec_col="embedding",
        dim=64, n_bits=4, n_tables=24,
    ).withColumnRenamed("rank", "rnk")


#: Cosine threshold for the embedding near-dup entry queries. The fixture
#: embeddings are near-uniform (max pairwise cosine ≈ 0.5), so the
#: threshold exercises the operator on a non-empty pair set; a real
#: near-dup corpus would run the same plan at ~0.9.
EMBED_DUP_THRESHOLD = 0.4


def q53_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The composed training-data flow (pipelines.curate): exact dedup →
    language allowlist → quality gates, then per-language corpus stats.
    One scan stage + one dedup shuffle at any scale."""
    from flink_note_spark.pipelines.curate import CurationConfig, curate_corpus

    d = _t(spark, sf, "documents")
    cur = curate_corpus(
        d, "text", "doc_id",
        CurationConfig(min_words=5, lang_allow=("en", "es", "fr", "de", "zh"),
                       max_stop_ratio=0.9),
    )
    return cur.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
        F.min("doc_id").alias("first_doc"),
    )


_Q53_SQL = """
WITH sig AS (
  SELECT doc_id, text,
         CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('el','la','los','las','es','un','una'))) > 0 THEN 'es'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('le','les','des','est','une','et'))) > 0 THEN 'fr'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('der','die','das','und','ist','ein'))) > 0 THEN 'de'
              ELSE 'en' END AS lang_pred,
         len(regexp_split_to_array(text, '\\s+')) AS n_words,
         len(list_filter(regexp_split_to_array(text, '\\s+'),
             x -> x IN ('the','a','of','and','to')))
           / CAST(greatest(len(regexp_split_to_array(text, '\\s+')), 1) AS DOUBLE) AS stop_ratio,
         sha256(lower(trim(text))) AS h
  FROM documents
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM sig
  ) WHERE rn = 1
)
SELECT lang_pred,
       count(*)                          AS n_docs,
       CAST(sum(n_words) AS BIGINT)      AS total_words,
       round(avg(stop_ratio), 6)         AS avg_stop_ratio,
       min(doc_id)                       AS first_doc
FROM deduped
WHERE lang_pred IN ('en','es','fr','de','zh')
  AND n_words BETWEEN 5 AND 100000
  AND stop_ratio <= 0.9
GROUP BY lang_pred
"""


def q51_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (blocked numpy all-pairs;
    the per-bucket exact kernel of the scale path)."""
    e = _t(spark, sf, "embeddings")
    return embedding_near_dup_pairs(
        e, threshold=EMBED_DUP_THRESHOLD, id_col="vec_id", vec_col="embedding"
    )


_Q51_SQL = f"""
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS d1, b.vec_id AS d2,
       round(list_sum(list_transform(range(1, len(a.v) + 1),
             i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cos_sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, len(a.v) + 1),
      i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) >= {EMBED_DUP_THRESHOLD}
"""


def q52_lsh_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """SRP-LSH bucketed embedding near-dup: candidates meet in a bucket
    equi-join, exact cosine verifies. No SQL oracle (seed-derived bucket
    keys); ``tests/test_lsh_recall.py`` asserts recall vs q51.

    Band sizing for the near-uniform fixture (pair cosine ≈ 0.4 →
    p_bit ≈ 0.63): 3 bits × 24 tables ⇒ recall ≈ 1 − (1 − 0.63³)²⁴ ≈
    0.999. A true near-dup corpus (cos ≥ 0.9 → p_bit ≈ 0.93) gets the
    same recall from far cheaper 8–16-bit keys."""
    e = _t(spark, sf, "embeddings")
    return lsh_embedding_near_dup_pairs(
        e, threshold=EMBED_DUP_THRESHOLD, id_col="vec_id",
        vec_col="embedding", dim=64, n_bits=3, n_tables=24,
    )


def q35_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-signal aggregates per language (length/stopword stats)."""
    d = _t(spark, sf, "documents")
    w = words("text")
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    per_doc = d.select(
        "lang",
        n_words.alias("n_words"),
        F.length("text").alias("n_chars_calc"),
        n_stop.alias("n_stop"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_words"), 4).alias("avg_words"),
        F.round(F.avg("n_chars_calc"), 4).alias("avg_chars"),
        F.round(F.sum("n_stop") / F.sum("n_words"), 6).alias("stop_ratio"),
    )


_Q35_SQL = f"""
SELECT lang,
       count(*) AS n_docs,
       round(avg(len(regexp_split_to_array(text, '\\s+'))), 4) AS avg_words,
       round(avg(length(text)), 4)                 AS avg_chars,
       round(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x IN {STOPWORDS})))
             / sum(len(regexp_split_to_array(text, '\\s+'))), 6) AS stop_ratio
FROM documents GROUP BY lang
"""


def q36_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting per source: whitespace + BPE-ish regex tokens."""
    d = _t(spark, sf, "documents")
    return (
        d.select(
            "source",
            F.size(words("text")).alias("ws"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)).alias("re_"),
            F.col("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("n_ws_tokens"),
            F.sum("re_").alias("n_re_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


_Q36_SQL = f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)                AS n_ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT) AS n_re_tokens,
       round(avg(n_chars), 4)                             AS avg_chars
FROM documents GROUP BY source
"""


def q37_language_id(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language ID → confusion matrix vs the labeled lang."""
    d = _t(spark, sf, "documents")
    return (
        language_id(d, "text")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_Q37_SQL = """
SELECT lang,
       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
            WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                 x -> x IN ('el','la','los','las','es','un','una'))) > 0 THEN 'es'
            WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                 x -> x IN ('le','les','des','est','une','et'))) > 0 THEN 'fr'
            WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                 x -> x IN ('der','die','das','und','ist','ein'))) > 0 THEN 'de'
            ELSE 'en' END AS lang_pred,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


def q38_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """64-bit content fingerprints (hex) per document."""
    d = _t(spark, sf, "documents")
    return doc_fingerprint(d, "text", "doc_id").select("doc_id", "fingerprint")


_Q38_SQL = """
SELECT doc_id, substring(sha256(lower(trim(text))), 1, 16) AS fingerprint
FROM documents
"""


def q39_wordcount(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's canonical job (WordCount — flink_arch-yarn per job
    启动流程.png box 1; SURVEY.md §2.1 O2): top-20 words."""
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


_Q39_SQL = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20
"""


def q40_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing, oracle-checkable slice: opaque binary payload
    + typed metadata (byte length, digest) — SURVEY.md §2.2 'Multimodal'."""
    d = _t(spark, sf, "documents")
    b = attach_binary_column(d, "text", "payload")
    return b.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha256").alias("payload_sha"),
    )


_Q40_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text)               AS payload_sha
FROM documents
"""


def q41_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """mapInPandas decode/feature-extract pipeline over binary payloads
    (deterministic fake codec — real decode stubbed per environment
    contract). ORACLE-BACKED since r6: the fixture corpus is pure ASCII
    (bytes == code points, verified), so the fake decoder's rolling
    hash (h = fold(h*131 + byte) over the first 64 bytes, mod 2^32) and
    the magic-byte sniff are both expressible in DuckDB SQL
    (``list_reduce`` over ``ord(substr(...))``) — the driver now
    hash-checks the actual Arrow-batched numpy kernel, not just row
    counts. The real-codec seam stays env-stubbed as documented."""
    d = _t(spark, sf, "documents")
    b = attach_binary_column(d, "text", "payload").withColumnRenamed("doc_id", "id")
    return extract_image_features(b, id_col="id", binary_col="payload")


_Q41_SQL = """
WITH h AS (
  SELECT doc_id, text,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, least(length(text), 64) + 1),
                            i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1))
                                      AS BIGINT))),
           (acc, b) -> (acc * 131 + b) % 4294967296) AS rh
  FROM documents)
SELECT doc_id AS id,
       CAST(length(text) AS INTEGER) AS n_bytes,
       CASE WHEN text IS NULL OR length(text) = 0 THEN 'empty'
            WHEN substr(text, 1, 4) = 'RIFF' THEN 'riff'
            WHEN substr(text, 1, 4) = 'GIF8' THEN 'gif'
            ELSE 'unknown' END AS format,
       CAST(64 + rh % 1024 AS INTEGER) AS width,
       CAST(64 + (rh // 65536) % 1024 AS INTEGER) AS height,
       TRUE AS ok
FROM h
"""


def q57_ivf_exhaustive_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN with ``n_probe == n_cells`` (exhaustive probing): the cell
    partition becomes pure routing, so the result must EQUAL exact
    brute-force top-k — which makes the IVF pipeline (shuffle-free Lloyd
    training, broadcast-centroid assignment, cell equi-join, re-rank)
    fully ORACLE-CHECKABLE against DuckDB, not just recall-tested.
    Partial-probe recall is pytest-gated (tests/test_lsh_recall.py)."""
    from flink_note_spark.operators.similarity import ivf_topk

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return ivf_topk(
        q, e, k=5, id_col="vec_id", vec_col="embedding",
        n_cells=8, n_probe=8, iters=1,
    ).withColumnRenamed("rank", "rnk")


def q158_ivf_index_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted-IVF-index operational lifecycle (r13 — the
    ``q125_incremental_dedup`` shape for the similarity family): build
    the index over HALF the corpus (even vec_ids), ``ivf_save`` it
    bucketed on ``cell_id`` to a throwaway external path, accrete the
    other half via ``ivf_index_append`` (assignment against the SAVED
    centroids only — no retraining, the existing corpus untouched),
    ``ivf_load``, and query with ``n_probe == n_cells``. Exhaustive
    probing makes cell routing semantics-free, so the result must EQUAL
    exact brute-force top-k over the UNION corpus — the whole
    save → append → load → query path is oracle-checked against the
    q33 DuckDB brute force (the q57 exhaustive-IVF trick). The
    partial-probe accretion contract (appended == same-centroid union
    assignment, sensitive to rows landing in the right cells) and the
    bucketed-layout survival across appends are pytest-gated
    (tests/test_lsh_recall.py)."""
    import tempfile

    from flink_note_spark.operators.similarity import (
        ivf_build,
        ivf_index_append,
        ivf_load,
        ivf_query,
        ivf_save,
    )

    e = _t(spark, sf, "embeddings")
    table = "q158_ivf_idx"
    for t in (table, f"{table}__centroids", f"{table}__meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    path = tempfile.mkdtemp(prefix="q158_ivf_") + "/idx"
    idx = ivf_build(
        e.filter(F.col("vec_id") % 2 == 0), n_cells=8, iters=1,
        id_col="vec_id", vec_col="embedding",
    )
    ivf_save(idx, table, buckets=4, path=path)
    ivf_index_append(
        e.filter(F.col("vec_id") % 2 == 1), table,
        id_col="vec_id", vec_col="embedding",
    )
    loaded = ivf_load(spark, table)
    q = e.filter(F.col("vec_id") < 10)
    return ivf_query(loaded, q, k=5, n_probe=8).withColumnRenamed(
        "rank", "rnk"
    )


def q94_pq_exhaustive_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ/ADC ANN with ``shortlist >= |corpus|`` + exact re-rank: the
    ADC stage becomes pure shortlist routing and the output must EQUAL
    exact brute force — which makes the whole PQ pipeline (shuffle-free
    per-subspace Lloyd codebooks, Arrow encode pass, broadcast
    lookup-table scoring, re-rank join) fully ORACLE-CHECKABLE against
    DuckDB (the q57 exhaustive-IVF trick). Partial-shortlist recall is
    pytest-gated (tests/test_lsh_recall.py)."""
    from flink_note_spark.operators.similarity import pq_topk

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return pq_topk(
        q, e, k=5, m=8, n_codes=16, shortlist=1_000_000, refine=True,
        id_col="vec_id", vec_col="embedding",
    ).withColumnRenamed("rank", "rnk")


def q159_pq_index_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted-PQ-index operational lifecycle (r13 — the q158 shape
    for the ADC family): build codebooks over HALF the corpus (even
    vec_ids), ``pq_save``, accrete the other half via
    ``pq_index_append`` (encoding against the SAVED codebooks only —
    no retraining, the existing corpus never re-encoded), ``pq_load``,
    and query with an exhaustive shortlist + exact re-rank. The
    exhaustive shortlist makes ADC routing semantics-free, so the
    result must EQUAL exact brute-force top-k over the UNION corpus —
    the whole save → append → load → query path is oracle-checked
    against the q33 DuckDB brute force (the q94 trick). The
    partial-shortlist accretion contract (appended == same-codebook
    union encoding) and refusals are pytest-gated
    (tests/test_lsh_recall.py)."""
    import tempfile

    from flink_note_spark.operators.similarity import (
        pq_build,
        pq_index_append,
        pq_load,
        pq_query,
        pq_save,
    )

    e = _t(spark, sf, "embeddings")
    table = "q159_pq_idx"
    for t in (table, f"{table}__codebooks"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    path = tempfile.mkdtemp(prefix="q159_pq_") + "/idx"
    idx = pq_build(
        e.filter(F.col("vec_id") % 2 == 0), m=8, n_codes=16, iters=1,
        id_col="vec_id", vec_col="embedding",
    )
    pq_save(idx, table, path=path)
    pq_index_append(
        e.filter(F.col("vec_id") % 2 == 1), table,
        id_col="vec_id", vec_col="embedding",
    )
    loaded = pq_load(spark, table)
    q = e.filter(F.col("vec_id") < 10)
    return pq_query(
        loaded, q, k=5, shortlist=1_000_000, refine=True
    ).withColumnRenamed("rank", "rnk")


def q95_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ/ADC ANN, honest approximate configuration (m=8 subspaces,
    64 codes, shortlist 100, exact re-rank) — the memory-bound scale
    path of the similarity family: the corpus scores as 8 int codes
    per vector against broadcast lookup tables. Rows-only driver check
    (ADC shortlist has no SQL twin); ≥0.9 recall vs exact brute force
    is pytest-gated."""
    from flink_note_spark.operators.similarity import pq_topk

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return pq_topk(
        q, e, k=5, m=8, n_codes=64, shortlist=100, refine=True,
        id_col="vec_id", vec_col="embedding",
    ).withColumnRenamed("rank", "rnk")


def q97_ivfpq_exhaustive_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ (cell routing + PQ codes — the canonical billion-scale
    ANN combo) with ``n_probe == n_cells`` and an exhaustive shortlist:
    both approximations degenerate and the output must EQUAL exact
    brute force, making the composed pipeline (Lloyd cells + PQ
    codebooks + cell equi-join + ADC tables + re-rank) fully
    oracle-checkable. Partial-probe recall is pytest-gated."""
    from flink_note_spark.operators.similarity import ivfpq_topk

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return ivfpq_topk(
        q, e, k=5, n_cells=8, n_probe=8, m=8, n_codes=16,
        shortlist=1_000_000, id_col="vec_id", vec_col="embedding",
    ).withColumnRenamed("rank", "rnk")


def q160_ivfpq_index_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted-IVF-PQ-index operational lifecycle (r13 — the q158/
    q159 shape for the composed billion-scale index, the configuration
    a 100 TB similarity deployment actually persists): build over HALF
    the corpus (even vec_ids), ``ivfpq_save`` bucketed on ``cell_id``,
    accrete the other half via ``ivfpq_index_append`` (assign + encode
    against the SAVED centroids AND codebooks, one Arrow pass, no
    retraining), ``ivfpq_load``, query with ``n_probe == n_cells`` and
    an exhaustive shortlist — both approximations degenerate, so the
    result must EQUAL exact brute force over the UNION corpus (the q97
    trick). Partial-probe/partial-shortlist accretion equality,
    refusals, register and rebuild are pytest-gated
    (tests/test_lsh_recall.py)."""
    import tempfile

    from flink_note_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_index_append,
        ivfpq_load,
        ivfpq_query,
        ivfpq_save,
    )

    e = _t(spark, sf, "embeddings")
    table = "q160_ivfpq_idx"
    for t in (table, f"{table}__centroids", f"{table}__codebooks",
              f"{table}__meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    path = tempfile.mkdtemp(prefix="q160_ivfpq_") + "/idx"
    idx = ivfpq_build(
        e.filter(F.col("vec_id") % 2 == 0), n_cells=8, m=8, n_codes=16,
        iters=1, id_col="vec_id", vec_col="embedding",
    )
    ivfpq_save(idx, table, buckets=4, path=path)
    ivfpq_index_append(
        e.filter(F.col("vec_id") % 2 == 1), table,
        id_col="vec_id", vec_col="embedding",
    )
    loaded = ivfpq_load(spark, table)
    q = e.filter(F.col("vec_id") < 10)
    return ivfpq_query(
        loaded, q, k=5, n_probe=8, shortlist=1_000_000
    ).withColumnRenamed("rank", "rnk")


def q96_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document n-gram novelty (share of 3-gram shingles unique to
    the doc) — the corpus-pressure signal that decides which documents
    even enter pairwise near-dup search. One shingle scan + one df agg
    over hashed shingles + one shingle-keyed join; definitionally
    consistent with the MinHash/decontamination tokenization (shared
    kernel)."""
    from flink_note_spark.operators.text import ngram_novelty

    d = _t(spark, sf, "documents")
    return ngram_novelty(d, "text", "doc_id", n=3).orderBy("doc_id")


_Q96_SQL = """
WITH w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS wlist
       FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(0, len(wlist) - 2),
                               i -> array_to_string(wlist[i+1:i+3], ' ')))
           AS shingle
  FROM w WHERE len(wlist) >= 3
),
dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
per AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared
  FROM sh s JOIN dfreq d USING (shingle) GROUP BY s.doc_id)
SELECT doc.doc_id,
       CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(p.n_shared, 0) AS BIGINT) AS n_shared,
       round(1.0 - p.n_shared / CAST(p.n_shingles AS DOUBLE), 6) AS novelty
FROM documents doc LEFT JOIN per p USING (doc_id)
ORDER BY doc.doc_id
"""


def q58_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic corpus split audit: per-split row counts and id
    checksum from ``sampling.hash_split``. Values are a pure function of
    (doc_id, seed) — stable across partitionings, reruns and corpus
    accretion. Oracle-backed since r14 (VERDICT r13 item 7): Spark's
    ``xxhash64(long, int)`` has a closed form (two XXH64 block rounds +
    avalanche) that ``_Q58_SQL`` replays in DuckDB HUGEINT arithmetic —
    32-bit-split multiplies mod 2^64, rotates as shift pairs — so the
    driver now verifies the ACTUAL per-row split assignment of the
    production hash family, not just row counts (the q91 md5 twin keeps
    covering the split-logic portability story). Determinism and
    fraction properties stay pytest-gated (tests/test_sampling.py)."""
    from flink_note_spark.operators.sampling import hash_split

    d = _t(spark, sf, "documents")
    split = hash_split(d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("split")
    )


# DuckDB replay of Spark's xxhash64(doc_id BIGINT, 42 INT): seed 42,
# one XXH64 8-byte round for the long child, one 4-byte round for the
# int literal, then the avalanche — each 64-bit multiply is split into
# 32-bit halves so HUGEINT (signed 128-bit) never overflows, rotations
# are shift pairs, xor/shifts run on UBIGINT. Verified bit-for-bit
# against F.xxhash64 (tests/test_sampling.py::test_q58_oracle_hash_is_sparks_xxhash64)
# and value-for-value by tests/test_oracle_parity.py.
_Q58_SQL = """WITH x0 AS (
  SELECT doc_id,
         (CAST(doc_id AS HUGEINT) + 18446744073709551616) % 18446744073709551616 AS u0
  FROM documents
),
x1 AS (
  SELECT *,
         (u0 % 4294967296 * 668265295::HUGEINT
         + (u0 % 4294967296 * 3266489917::HUGEINT + u0 // 4294967296 * 668265295::HUGEINT)
           % 4294967296 * 4294967296) % 18446744073709551616 AS a1
  FROM x0
),
x2 AS (
  SELECT *,
         (a1 % 8589934592 * 2147483648 + a1 // 8589934592) AS a2
  FROM x1
),
x3 AS (
  SELECT *,
         (a2 % 4294967296 * 2246822535::HUGEINT
         + (a2 % 4294967296 * 2654435761::HUGEINT + a2 // 4294967296 * 2246822535::HUGEINT)
           % 4294967296 * 4294967296) % 18446744073709551616 AS a3
  FROM x2
),
x4 AS (
  SELECT *,
         xor((2870177450012600311)::UBIGINT, (a3)::UBIGINT)::HUGEINT AS a4
  FROM x3
),
x5 AS (
  SELECT *,
         (a4 % 137438953472 * 134217728 + a4 // 137438953472) AS a5
  FROM x4
),
x6 AS (
  SELECT *,
         ((a5 % 4294967296 * 2246822535::HUGEINT
         + (a5 % 4294967296 * 2654435761::HUGEINT + a5 // 4294967296 * 2246822535::HUGEINT)
           % 4294967296 * 4294967296) % 18446744073709551616 + 9650029242287828579) % 18446744073709551616 AS a6
  FROM x5
),
x7 AS (
  SELECT *,
         xor((a6)::UBIGINT, (a6 // 8589934592)::UBIGINT)::HUGEINT AS a7
  FROM x6
),
x8 AS (
  SELECT *,
         (a7 % 4294967296 * 668265295::HUGEINT
         + (a7 % 4294967296 * 3266489917::HUGEINT + a7 // 4294967296 * 668265295::HUGEINT)
           % 4294967296 * 4294967296) % 18446744073709551616 AS a8
  FROM x7
),
x9 AS (
  SELECT *,
         xor((a8)::UBIGINT, (a8 // 536870912)::UBIGINT)::HUGEINT AS a9
  FROM x8
),
x10 AS (
  SELECT *,
         (a9 % 4294967296 * 2654435833::HUGEINT
         + (a9 % 4294967296 * 374761393::HUGEINT + a9 // 4294967296 * 2654435833::HUGEINT)
           % 4294967296 * 4294967296) % 18446744073709551616 AS aa
  FROM x9
),
x11 AS (
  SELECT *,
         xor((aa)::UBIGINT, (aa // 4294967296)::UBIGINT)::HUGEINT AS h0
  FROM x10
),
x12 AS (
  SELECT *,
         (h0 + 2870177450012600265) % 18446744073709551616 AS b1
  FROM x11
),
x13 AS (
  SELECT *,
         xor((b1)::UBIGINT, (17661419130398390822)::UBIGINT)::HUGEINT AS b2
  FROM x12
),
x14 AS (
  SELECT *,
         (b2 % 2199023255552 * 8388608 + b2 // 2199023255552) AS b3
  FROM x13
),
x15 AS (
  SELECT *,
         ((b3 % 4294967296 * 668265295::HUGEINT
         + (b3 % 4294967296 * 3266489917::HUGEINT + b3 // 4294967296 * 668265295::HUGEINT)
           % 4294967296 * 4294967296) % 18446744073709551616 + 1609587929392839161) % 18446744073709551616 AS b4
  FROM x14
),
x16 AS (
  SELECT *,
         xor((b4)::UBIGINT, (b4 // 8589934592)::UBIGINT)::HUGEINT AS b5
  FROM x15
),
x17 AS (
  SELECT *,
         (b5 % 4294967296 * 668265295::HUGEINT
         + (b5 % 4294967296 * 3266489917::HUGEINT + b5 // 4294967296 * 668265295::HUGEINT)
           % 4294967296 * 4294967296) % 18446744073709551616 AS b6
  FROM x16
),
x18 AS (
  SELECT *,
         xor((b6)::UBIGINT, (b6 // 536870912)::UBIGINT)::HUGEINT AS b7
  FROM x17
),
x19 AS (
  SELECT *,
         (b7 % 4294967296 * 2654435833::HUGEINT
         + (b7 % 4294967296 * 374761393::HUGEINT + b7 // 4294967296 * 2654435833::HUGEINT)
           % 4294967296 * 4294967296) % 18446744073709551616 AS b8
  FROM x18
),
x20 AS (
  SELECT *,
         xor((b8)::UBIGINT, (b8 // 4294967296)::UBIGINT)::HUGEINT AS hu
  FROM x19
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM (
  SELECT doc_id,
         CASE WHEN u < 0.9 THEN 'train'
              WHEN u < 0.9500000000000001 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
           CAST(((hs % 1000000000) + 1000000000) % 1000000000 AS DOUBLE)
           / 1000000000.0 AS u
    FROM (
      SELECT doc_id,
             CASE WHEN hu >= 9223372036854775808
                  THEN hu - 18446744073709551616 ELSE hu END AS hs
      FROM x20
    )
  )
)
GROUP BY split ORDER BY split"""


def q90_lsh_verified_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Oracle-backed companion to q31 (VERDICT r5 task 7): the
    MinHash-LSH + exact-verify pair set projected to ``(d1, d2,
    jaccard)``. The verify stage guarantees precision 1.0 (every output
    pair really has exact Jaccard ≥ threshold), so the output is always
    a SUBSET of the exact pair set; at q31's parameters (32 hashes × 8
    bands) recall on this corpus is 1.0 (asserted in
    tests/test_lsh_recall.py), making the output EQUAL to the exact set
    — which IS SQL-expressible. The q30 exact-Jaccard oracle therefore
    hash-checks the whole candidates-then-verify path: an LSH recall
    regression becomes a driver HASH MISMATCH here instead of a silent
    rows-only pass on q31."""
    d = _t(spark, sf, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=32, bands=8,
        threshold=JACCARD_THRESHOLD, verify=True, max_df=SHINGLE_MAX_DF,
        ids_unique=True,
    ).select("d1", "d2", "jaccard")


def q91_md5_split(spark: SparkSession, sf: str) -> DataFrame:
    """Oracle-backed companion to q58 (VERDICT r5 task 7): the same
    split audit with ``hash_fn="md5"`` — a hash family DuckDB can
    reproduce bit-for-bit (first 60 bits of ``md5("<id>:<seed>")``), so
    the driver verifies the ACTUAL per-row split assignment, not just
    fraction invariants. q58 stays as the production xxhash64 path
    (faster, codegen long arithmetic); this query proves the split
    LOGIC (cumulative ranges, determinism, accretion stability) against
    an independent engine."""
    from flink_note_spark.operators.sampling import hash_split

    d = _t(spark, sf, "documents")
    split = hash_split(
        d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
        hash_fn="md5",
    )
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("split")
    )


_Q91_SQL = """
WITH u AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5(doc_id || ':42'), 1, 15)) AS BIGINT)
          % 1000000000) / 1000000000.0 AS u
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN u < 0.9 THEN 'train'
              WHEN u < 0.95 THEN 'val'
              ELSE 'test' END AS split
  FROM u
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM s GROUP BY split ORDER BY split
"""


def q131_token_budget_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Token-denominated mixture sampling (r10): rebalance the corpus to
    explicit per-language TOKEN shares under a 2000-token budget, taking
    documents in deterministic md5-hash order until each language's
    target is reached (first-fit overshoot ≤ one document). The operator
    runs the BUCKETED two-level plan (per-(group, range-bucket) token
    sums + a window cumsum over ONLY the cutoff bucket — no full-corpus
    window; `operators/sampling.py:token_budget_sample`); the oracle is
    the naive single-window prefix rule in DuckDB, so the hash-match
    proves the bucketed decomposition AND the per-row selection. Binary-
    exact weights (0.5/0.125) make every target an exact double — the
    row set is bit-reproducible across engines (the q91 doctrine)."""
    from flink_note_spark.operators.sampling import token_budget_sample

    d = _t(spark, sf, "documents")
    sampled = token_budget_sample(
        d,
        "lang",
        2000,
        weights={"en": 0.5, "de": 0.125, "fr": 0.125, "es": 0.125, "zh": 0.125},
        hash_fn="md5",
    )
    tok = F.size(F.filter(words("text"), lambda x: x != "")).cast("long")
    return (
        sampled.withColumn("tok", tok)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


_Q131_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
         AS BIGINT) AS tok,
    (CAST(concat('0x', substr(md5(doc_id || ':42'), 1, 15)) AS BIGINT)
     % 1000000000) / 1000000000.0 AS u
  FROM documents
  WHERE lang IN ('en','de','fr','es','zh')
), shares AS (
  SELECT lang,
         CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                   ELSE CAST(0.125 AS DOUBLE) END AS share,
         CAST(SUM(tok) AS DOUBLE) AS t
  FROM toks GROUP BY lang
), bound AS (
  SELECT LEAST(CAST(2000 AS DOUBLE), MIN(t / share)) AS total FROM shares
), cum AS (
  SELECT t.doc_id, t.lang, t.tok,
    COALESCE(SUM(t.tok) OVER (PARTITION BY t.lang ORDER BY t.u, t.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
    s.share * b.total AS target
  FROM toks t JOIN shares s USING (lang) CROSS JOIN bound b
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS n_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM cum WHERE cb < target GROUP BY lang ORDER BY lang
"""


def q132_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher quality-rule battery (r10; Rae et al. arXiv:2112.11446
    §A1.1) with thresholds tuned to discriminate on the fixture corpus:
    per-language audit of document counts, survivors, per-rule failure
    counts, and the kept-id checksum. All seven rules are pure Catalyst
    expressions folded into the scan stage
    (`operators/text.py:gopher_quality_filter`); the oracle mirrors
    every rule — tokenization, mean-word-length arithmetic, line
    regexes, distinct-stopword counting — in independent DuckDB SQL."""
    from flink_note_spark.operators.text import STOPWORDS, gopher_quality_filter

    d = _t(spark, sf, "documents")
    out = gopher_quality_filter(
        d,
        min_words=30,
        max_words=80,
        min_mean_word_len=3.5,
        max_mean_word_len=4.5,
        min_stopwords=2,
        stopwords=STOPWORDS,
    )
    fail = lambda c: F.sum((~F.col(c)).cast("long"))  # noqa: E731
    return (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("gq_keep").cast("long")).alias("n_kept"),
            F.sum(
                F.when(F.col("gq_keep"), F.col("doc_id")).otherwise(F.lit(0))
            ).alias("kept_id_sum"),
            fail("gq_words_ok").alias("fail_words"),
            fail("gq_word_len_ok").alias("fail_word_len"),
            fail("gq_symbol_ok").alias("fail_symbol"),
            fail("gq_bullet_ok").alias("fail_bullet"),
            fail("gq_ellipsis_ok").alias("fail_ellipsis"),
            fail("gq_alpha_ok").alias("fail_alpha"),
            fail("gq_stopword_ok").alias("fail_stopword"),
        )
        .orderBy("lang")
    )


_Q132_SQL = r"""
WITH base AS (
  SELECT doc_id, lang,
    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w,
    string_split(text, chr(10)) AS lines,
    text
  FROM documents
), sig AS (
  SELECT doc_id, lang,
    len(w) AS n_words,
    CASE WHEN len(w) > 0
         THEN list_sum(list_transform(w, x -> len(x))) / len(w) END
      AS mean_wlen,
    CASE WHEN len(w) > 0 THEN
      ((len(text) - len(replace(text, '#', '')))
       + (len(text) - len(replace(text, '...', ''))) / 3.0
       + (len(text) - len(replace(text, '…', '')))) / len(w) END
      AS symbol_ratio,
    CAST(len(list_filter(lines, x -> regexp_matches(x, '^\s*[-*•]')))
         AS DOUBLE) / len(lines) AS bullet_frac,
    CAST(len(list_filter(lines, x -> regexp_matches(x, '(\.\.\.|…)\s*$')))
         AS DOUBLE) / len(lines) AS ellipsis_frac,
    CASE WHEN len(w) > 0
         THEN CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
              AS DOUBLE) / len(w) END AS alpha_frac,
    len(list_filter(['the','a','of','and','to'],
                    s -> list_contains(w, s))) AS n_stop
  FROM base
), flags AS (
  SELECT doc_id, lang,
    COALESCE(n_words >= 30 AND n_words <= 80, FALSE) AS words_ok,
    COALESCE(mean_wlen >= 3.5 AND mean_wlen <= 4.5, FALSE) AS word_len_ok,
    COALESCE(symbol_ratio <= 0.1, FALSE) AS symbol_ok,
    COALESCE(bullet_frac <= 0.9, FALSE) AS bullet_ok,
    COALESCE(ellipsis_frac <= 0.3, FALSE) AS ellipsis_ok,
    COALESCE(alpha_frac >= 0.8, FALSE) AS alpha_ok,
    COALESCE(n_stop >= 2, FALSE) AS stopword_ok
  FROM sig
), k AS (
  SELECT *,
    (words_ok AND word_len_ok AND symbol_ok AND bullet_ok
     AND ellipsis_ok AND alpha_ok AND stopword_ok) AS keep
  FROM flags
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
  CAST(COALESCE(SUM(doc_id) FILTER (WHERE keep), 0) AS BIGINT)
    AS kept_id_sum,
  CAST(COUNT(*) FILTER (WHERE NOT words_ok) AS BIGINT) AS fail_words,
  CAST(COUNT(*) FILTER (WHERE NOT word_len_ok) AS BIGINT) AS fail_word_len,
  CAST(COUNT(*) FILTER (WHERE NOT symbol_ok) AS BIGINT) AS fail_symbol,
  CAST(COUNT(*) FILTER (WHERE NOT bullet_ok) AS BIGINT) AS fail_bullet,
  CAST(COUNT(*) FILTER (WHERE NOT ellipsis_ok) AS BIGINT) AS fail_ellipsis,
  CAST(COUNT(*) FILTER (WHERE NOT alpha_ok) AS BIGINT) AS fail_alpha,
  CAST(COUNT(*) FILTER (WHERE NOT stopword_ok) AS BIGINT) AS fail_stopword
FROM k GROUP BY lang ORDER BY lang
"""


def q133_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet head/middle/tail bucketing (r10; arXiv:1911.00359 §4.3):
    per-language equal-frequency split of the corpus by the unigram
    perplexity proxy (`operators/text.py:perplexity_buckets`, exact
    ntile mode — the thresholds scale twin is pytest-pinned against
    it). Output: per (lang, bucket) population, id checksum, and mean
    score. Scoring is the q79 kernel (two map-side-combinable aggs, one
    token-keyed join); the bucketing window sorts six-decimal-rounded
    scores with doc_id tiebreak so both engines order identically."""
    from flink_note_spark.operators.text import perplexity_buckets

    d = _t(spark, sf, "documents")
    b = perplexity_buckets(d, "text", "doc_id", "lang", 3, mode="exact")
    return (
        b.groupBy("lang", "bucket", "bucket_label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.round(F.avg("mean_logp"), 6).alias("avg_logp"),
        )
        .orderBy("lang", "bucket")
    )


_Q133_SQL = r"""
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
    FROM documents
  ) WHERE token <> ''
), freq AS (
  SELECT token, count(*) AS c FROM tok GROUP BY 1
), total AS (SELECT count(*) AS n FROM tok),
lp AS (
  SELECT doc_id,
         round(avg(ln(freq.c / CAST(total.n AS DOUBLE))), 6) AS mean_logp
  FROM tok JOIN freq USING (token) CROSS JOIN total
  GROUP BY doc_id
), b AS (
  SELECT d.lang, lp.doc_id, lp.mean_logp,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY lp.mean_logp DESC, lp.doc_id ASC)
           AS bucket
  FROM lp JOIN documents d USING (doc_id)
)
SELECT lang, bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket_label,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       round(avg(mean_logp), 6) AS avg_logp
FROM b GROUP BY lang, bucket ORDER BY lang, bucket
"""


#: Fixed linear-scorer weights for q134 — stands in for a published
#: fastText quality head; values chosen to discriminate on the fixture
#: vocabulary (STOPWORDS present = prose-like, digits/symbols = junk).
QUALITY_LEXICON = {
    "the": 1.0,
    "of": 0.8,
    "and": 0.8,
    "a": 0.6,
    "to": 0.6,
    "is": 0.4,
    "error": -1.5,
    "click": -1.2,
    "free": -1.0,
    "buy": -1.0,
}


def q134_lexicon_quality(spark: SparkSession, sf: str) -> DataFrame:
    """fastText-style linear quality scoring with fixed weights (r10;
    `operators/text.py:lexicon_quality_score`, MAP-literal scan-stage
    path — zero joins, zero shuffles before the final top-k). Output:
    the 10 lowest-scoring documents. The oracle replays the identical
    linear model via an unnest + VALUES join."""
    from flink_note_spark.operators.text import lexicon_quality_score

    d = _t(spark, sf, "documents")
    s = lexicon_quality_score(d, QUALITY_LEXICON, "text", "doc_id")
    return (
        s.select("doc_id", "quality_score")
        .orderBy(F.col("quality_score").asc(), F.col("doc_id").asc())
        .limit(10)
    )


_Q134_SQL = r"""
WITH lex(token, wgt) AS (
  VALUES ('the', 1.0), ('of', 0.8), ('and', 0.8), ('a', 0.6),
         ('to', 0.6), ('is', 0.4), ('error', -1.5), ('click', -1.2),
         ('free', -1.0), ('buy', -1.0)
), tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
    FROM documents
  ) WHERE token <> ''
), scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-(sum(COALESCE(wgt, 0.0))
                                  / count(*)))), 6) AS quality_score
  FROM tok LEFT JOIN lex USING (token)
  GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(s.quality_score, 0.5) AS quality_score
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY quality_score ASC, doc_id ASC
LIMIT 10
"""


def q139_remove_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-substring REMOVAL (r10 — the ExactSubstr transform,
    Lee et al. 2022, the mutation half of q117's measurement): every
    token covered by a corpus-duplicated 5-gram is dropped;
    reconstruction pinned per document by an md5 checksum of the
    cleaned text (`operators/dedup.py:remove_dup_spans` — the shared
    positional kernel + one interval-merging array fold; the oracle
    replays tokenization, positional grams, coverage and re-joining
    independently in DuckDB)."""
    from flink_note_spark.operators.dedup import remove_dup_spans

    d = _t(spark, sf, "documents")
    out = remove_dup_spans(d, n=5, min_count=2)
    return out.select(
        "doc_id",
        F.md5("clean_text").alias("clean_md5"),
        "n_tokens",
        "n_kept_tokens",
    ).orderBy("doc_id")


_Q139_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> x <> '') AS w
  FROM documents
), tok AS (
  SELECT doc_id, unnest(range(len(w))) AS q, w FROM base
), tok2 AS (
  SELECT doc_id, q, w[q + 1] AS tok FROM tok
), grams AS (
  SELECT doc_id, q AS pos,
         array_to_string(list_slice(w, q + 1, q + 5), ' ') AS g
  FROM tok WHERE q + 5 <= len(w)
), dupg AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), dup AS (
  SELECT doc_id, pos FROM grams JOIN dupg USING (g)
), covered AS (
  SELECT DISTINCT t.doc_id, t.q
  FROM tok2 t JOIN dup d
    ON d.doc_id = t.doc_id AND t.q BETWEEN d.pos AND d.pos + 4
), kept AS (
  SELECT t.doc_id,
         string_agg(t.tok, ' ' ORDER BY t.q) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM tok2 t ANTI JOIN covered c
    ON c.doc_id = t.doc_id AND c.q = t.q
  GROUP BY t.doc_id
)
SELECT b.doc_id,
       md5(COALESCE(k.clean_text, '')) AS clean_md5,
       CAST(len(b.w) AS BIGINT) AS n_tokens,
       COALESCE(k.n_kept, 0) AS n_kept_tokens
FROM base b LEFT JOIN kept k USING (doc_id)
ORDER BY doc_id
"""


def q141_semantic_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """EMBEDDING-space decontamination (r10 — the semantic complement
    of q73's 5-gram lexical pass: paraphrased eval leakage that shares
    no n-gram): corpus rows whose cosine to ANY benchmark vector
    reaches 0.35 are removed; this query returns the AUDIT view (the
    removed rows with their max benchmark similarity).
    `operators/similarity.py:semantic_decontaminate` — the benchmark
    (eval suites are small by contract, guarded) broadcasts as one
    unit-normalized float64 matrix; the corpus streams through ONE
    mapInPandas blocked matmul, zero shuffles/joins. Verdicts compare
    the six-decimal-rounded max sim (the q33 float doctrine), so the
    kept/removed SET is engine-portable — the oracle replays the full
    scoring in DuckDB list arithmetic."""
    from flink_note_spark.operators.similarity import (
        semantic_decontaminate,
    )

    e = _t(spark, sf, "embeddings")
    bench = e.filter(F.pmod("vec_id", F.lit(50)) == 0)
    corpus = e.filter(F.pmod("vec_id", F.lit(50)) != 0)
    removed = semantic_decontaminate(
        corpus, bench, threshold=0.35, keep_contaminated=True
    )
    return removed.select("vec_id", "bench_max_sim").orderBy("vec_id")


_Q141_SQL = """
WITH bench AS (
  SELECT embedding AS bv FROM embeddings WHERE vec_id % 50 = 0
), corpus AS (
  SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id % 50 <> 0
), s AS (
  SELECT c.vec_id,
         round(max(
           list_sum(list_transform(range(1, len(cv) + 1),
                    i -> CAST(cv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                    i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))
            * sqrt(list_sum(list_transform(range(1, len(bv) + 1),
                    i -> CAST(bv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE)))))
         ), 6) AS bench_max_sim
  FROM corpus c, bench GROUP BY c.vec_id
)
SELECT vec_id, bench_max_sim FROM s
WHERE bench_max_sim >= 0.35 ORDER BY vec_id
"""


def q60_reservoir_exact_k(spark: SparkSession, sf: str) -> DataFrame:
    """Per-key reservoir sampling, driver-checkable invariant: the
    sample is EXACTLY min(k, n) rows per key (the property that
    distinguishes the reservoir from Bernoulli sampling), which the
    oracle computes directly from the raw table — the xxhash64 pick
    order itself has no DuckDB twin and is pinned by golden/pytest."""
    from flink_note_spark.operators.sampling import reservoir_per_key

    d = _t(spark, sf, "documents")
    s = reservoir_per_key(d, ["lang"], k=20, id_col="doc_id")
    return (
        s.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


_Q60_SQL = """
SELECT lang, CAST(least(20, count(*)) AS BIGINT) AS n_sampled
FROM documents GROUP BY lang ORDER BY lang
"""


def q61_packing_invariants(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-packing conservation audit: packing must move every
    document into exactly one bin (doc and token totals conserved) and
    no non-oversize bin may exceed the budget — the bin assignment
    itself is partition-dependent (pytest BFD differential), but these
    invariants are corpus-level facts the oracle states directly."""
    from flink_note_spark.operators.packing import pack_sequences

    d = _t(spark, sf, "documents").withColumn(
        "n_tokens", F.size(words("text"))
    )
    packed = pack_sequences(d, "doc_id", "n_tokens", budget=2048)
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("bt"),
        F.max(F.col("oversize").cast("int")).alias("ov"),
        F.count(F.lit(1)).alias("nd"),
    )
    return per_bin.agg(
        F.sum("nd").cast("long").alias("n_docs"),
        F.sum("bt").cast("long").alias("total_tokens"),
        F.sum(
            F.when((F.col("ov") == 0) & (F.col("bt") > 2048), 1).otherwise(0)
        ).cast("long").alias("over_budget_bins"),
    )


_Q61_SQL = """
SELECT CAST(count(*) AS BIGINT)                              AS n_docs,
       CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)     AS total_tokens,
       CAST(0 AS BIGINT)                                     AS over_budget_bins
FROM documents
"""


def q62_connected_components(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components over a deterministic synthetic edge list
    (doc i links i−1 except every 8th: consecutive-id chains), so the
    component STRUCTURE — count, node total, size histogram extremes —
    is oracle-computable arithmetically while the Spark side actually
    runs the large-star/small-star rounds. Labels are component minima;
    the summary is label-free so both sides agree."""
    from flink_note_spark.operators.components import connected_components

    d = _t(spark, sf, "documents")
    edges = (
        d.select(F.col("doc_id").alias("d1"))
        .filter(F.pmod("d1", F.lit(8)) != 0)
        .withColumn("d2", F.col("d1") - 1)
    )
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum("sz").cast("long").alias("n_nodes"),
        F.min("sz").cast("long").alias("min_size"),
        F.max("sz").cast("long").alias("max_size"),
    )


_Q62_SQL = """
WITH nodes AS (
  SELECT DISTINCT x FROM (
    SELECT doc_id AS x FROM documents WHERE doc_id % 8 <> 0
    UNION ALL
    SELECT doc_id - 1 AS x FROM documents WHERE doc_id % 8 <> 0
  )
), blocks AS (
  SELECT x // 8 AS blk, count(*) AS sz FROM nodes GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT)  AS n_components,
       CAST(sum(sz) AS BIGINT)   AS n_nodes,
       CAST(min(sz) AS BIGINT)   AS min_size,
       CAST(max(sz) AS BIGINT)   AS max_size
FROM blocks
"""


def q63_cogroup_counts(spark: SparkSession, sf: str) -> DataFrame:
    """CoGroupFunction through the driver gate: per-key whole groups
    from customer and orders meet in one pandas call that emits both
    sides' group sizes — outer groups included (a key present on one
    side only still fires, with 0 for the absent side), which is
    exactly a full-outer join of grouped counts in the oracle."""
    import pandas as pd

    from flink_note_spark.operators.cogroup import cogroup_apply

    c = _t(spark, sf, "customer").select(
        F.pmod("c_custkey", F.lit(64)).alias("k")
    )
    o = _t(spark, sf, "orders").select(
        F.pmod("o_custkey", F.lit(64)).alias("k")
    )

    def sizes(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        key = lg["k"].iloc[0] if len(lg) else rg["k"].iloc[0]
        return pd.DataFrame(
            {"k": [int(key)], "n_cust": [len(lg)], "n_ord": [len(rg)]}
        )

    return cogroup_apply(
        c, o, ["k"], sizes, "k long, n_cust long, n_ord long"
    ).orderBy("k")


_Q63_SQL = """
WITH c AS (SELECT c_custkey % 64 AS k, count(*) AS n_cust FROM customer GROUP BY 1),
     o AS (SELECT o_custkey % 64 AS k, count(*) AS n_ord FROM orders GROUP BY 1)
SELECT COALESCE(c.k, o.k)                 AS k,
       CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(n_ord, 0) AS BIGINT)  AS n_ord
FROM c FULL OUTER JOIN o ON c.k = o.k
ORDER BY k
"""


def q64_theta_join(spark: SparkSession, sf: str) -> DataFrame:
    """Opt-in theta (arbitrary-predicate, no equi-conjunct) join through
    the driver gate: nation × region on a strict inequality — the
    guarded broadcast nested-loop the wrapper makes explicit."""
    from flink_note_spark.operators.joins import theta_join

    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return theta_join(
        n.select("n_name", "n_regionkey"),
        r.select("r_name", "r_regionkey"),
        F.col("n_regionkey") < F.col("r_regionkey"),
    ).select("n_name", "r_name").orderBy("n_name", "r_name")


_Q64_SQL = """
SELECT n_name, r_name
FROM nation JOIN region ON n_regionkey < r_regionkey
ORDER BY n_name, r_name
"""


def q65_clean_text(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-hygiene cleaning through the driver gate. The fixture text
    is already clean (no URLs/emails/control chars/whitespace runs), so
    both sides first append a deterministic dirty suffix — URL with
    query string, dotted-local email at a hyphenated domain, a tab, a
    double space — and the oracle replays the same regexp_replace chain
    (control strip → URL → email → whitespace collapse) in DuckDB's RE2
    dialect. Hash-match proves the two dialects agree on the chain, not
    just that cleaning is idempotent on clean text."""
    from flink_note_spark.operators.text import clean_text

    d = _t(spark, sf, "documents")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Visit https://ex.com/"),
            F.col("doc_id").cast("string"),
            F.lit("?a=1 or mail a.b"),
            F.col("doc_id").cast("string"),
            F.lit("@c-d.de"),
            F.lit("\t"),
            F.lit("end  here"),
        ).alias("text"),
    )
    return clean_text(dirty, "text", out_col="cleaned").select("doc_id", "cleaned")


_Q65_SQL = r"""
SELECT doc_id,
  trim(regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          text || ' Visit https://ex.com/' || doc_id || '?a=1 or mail a.b'
               || doc_id || '@c-d.de' || chr(9) || 'end  here',
          '[[:cntrl:]]', ' ', 'g'),
        '(?i)\bhttps?://\S+', '<url>', 'g'),
      '(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b', '<email>', 'g'),
    '\s+', ' ', 'g')) AS cleaned
FROM documents
"""


def q66_frequent_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy-hitter token discovery (the boilerplate pass feeding
    max_df-style caps): exact corpus-wide counts, whitespace-run
    tokenization, empty tokens dropped, top-20 with a deterministic
    tie order."""
    from flink_note_spark.operators.text import frequent_tokens

    d = _t(spark, sf, "documents")
    return frequent_tokens(d, "text", k=20, min_count=2)


_Q66_SQL = r"""
SELECT token, count(*) AS n
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents)
WHERE token <> ''
GROUP BY token HAVING count(*) >= 2
ORDER BY n DESC, token ASC
LIMIT 20
"""


def q67_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew salting through the driver gate: the salted inner join must
    be RESULT-IDENTICAL to the plain join (every left row meets every
    matching right row exactly once, salt spread notwithstanding), so
    the oracle is simply the unsalted join — run here over a key
    deliberately collapsed onto a hot value to exercise the spread."""
    from flink_note_spark.operators.scale import salted_join

    # 2% of keys collapse onto one hot value; the aggregate is an
    # integer-valued sum (quantities are whole numbers) so it is EXACT
    # in both engines regardless of summation order — a float product
    # sum over the hot key's join blowup cannot hash-match to any
    # rounding (summation-order error grows with match count).
    li = _t(spark, sf, "lineitem").select(
        F.when(F.pmod("l_orderkey", F.lit(50)) == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_quantity",
    )
    o = _t(spark, sf, "orders").select(
        F.when(F.pmod("o_orderkey", F.lit(50)) == 0, F.lit(0))
        .otherwise(F.col("o_orderkey"))
        .alias("k"),
    )
    return (
        salted_join(li, o, on="k", salt_buckets=8)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("l_quantity").cast("long").alias("qty_sum"),
        )
        .orderBy("k")
    )


_Q67_SQL = """
WITH li AS (
  SELECT CASE WHEN l_orderkey % 50 = 0 THEN 0 ELSE l_orderkey END AS k,
         l_quantity
  FROM lineitem
), o AS (
  SELECT CASE WHEN o_orderkey % 50 = 0 THEN 0 ELSE o_orderkey END AS k
  FROM orders
)
SELECT li.k AS k,
       CAST(count(*) AS BIGINT)        AS n_matches,
       CAST(sum(l_quantity) AS BIGINT) AS qty_sum
FROM li JOIN o ON li.k = o.k
GROUP BY li.k ORDER BY li.k
"""


def q70_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document characteristic terms by smoothed TF-IDF (top-3):
    corpus df/N statistics via map-side-combinable aggs, token-keyed
    join, windowed top-k with token tie-break."""
    from flink_note_spark.operators.text import tfidf_top_terms

    d = _t(spark, sf, "documents")
    return tfidf_top_terms(d, "text", "doc_id", k=3).orderBy("doc_id", "rank")


_Q70_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> ''
  GROUP BY 1, 2
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) AS s,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) DESC,
                    tf.token ASC
         ) AS rank
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
       round(s, 4) AS tfidf, CAST(rank AS INT) AS rank
FROM scored WHERE rank <= 3
ORDER BY doc_id, rank
"""


def q71_pii_scan(spark: SparkSession, sf: str) -> DataFrame:
    """PII detection + redaction through the driver gate. The fixture
    text is clean, so both sides append the same deterministic dirty
    suffix (URL with query string, doc-id-derived email, phone,
    dotted-quad IP) and the oracle replays the identical
    regexp_count/regexp_replace chain in DuckDB's RE2 dialect —
    hash-match proves the two dialects agree on patterns AND
    redaction order, not just that clean text scans to zero."""
    from flink_note_spark.operators.text import pii_scan

    d = _t(spark, sf, "documents")
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" call 555-"),
            F.lpad(F.pmod("doc_id", F.lit(1000)).cast("string"), 3, "0"),
            F.lit("-1234 from 10.0."),
            F.pmod("doc_id", F.lit(256)).cast("string"),
            F.lit(".7 mail u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex.org see https://x.io/p?q="),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return pii_scan(dirty, "text", redact=True, out_col="redacted").select(
        "doc_id", "n_url", "n_email", "n_phone", "n_ipv4", "redacted"
    )


_Q71_SQL = r"""
WITH dirty AS (
  SELECT doc_id,
         text || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-1234 from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 mail u'
              || CAST(doc_id AS VARCHAR) || '@ex.org see https://x.io/p?q='
              || CAST(doc_id AS VARCHAR) AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '(?i)\bhttps?://\S+')) AS INT) AS n_url,
  CAST(len(regexp_extract_all(text, '(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b')) AS INT) AS n_email,
  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phone,
  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(text, '(?i)\bhttps?://\S+', '<url>', 'g'),
        '(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b', '<email>', 'g'),
      '\b\d{3}-\d{3}-\d{4}\b', '<phone>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<ipv4>', 'g') AS redacted
FROM dirty
"""


def q72_repetition_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    ratio, top-word share, top-bigram share — one explode, two
    doc-keyed aggregations sharing a partitioning."""
    from flink_note_spark.operators.text import repetition_stats

    d = _t(spark, sf, "documents")
    return repetition_stats(d, "text", "doc_id").orderBy("doc_id")


_Q72_SQL = r"""
WITH tok AS (
  SELECT doc_id, token AS word, pos
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(text, '\s+')) AS token,
           generate_subscripts(regexp_split_to_array(text, '\s+'), 1) AS pos
    FROM documents
  ) WHERE token <> ''
), wc AS (
  SELECT doc_id, word, count(*) AS c FROM tok GROUP BY 1, 2
), ws AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct_words,
         max(c) AS top_word
  FROM wc GROUP BY 1
), bi AS (
  SELECT doc_id, word || ' ' || lead(word) OVER (
           PARTITION BY doc_id ORDER BY pos
         ) AS bigram
  FROM tok
), bc AS (
  SELECT doc_id, bigram, count(*) AS c FROM bi WHERE bigram IS NOT NULL
  GROUP BY 1, 2
), bs AS (
  SELECT doc_id, sum(c) AS n_bi, max(c) AS top_bi FROM bc GROUP BY 1
)
SELECT ws.doc_id, ws.n_words, ws.n_distinct_words,
       round(1 - ws.n_distinct_words / CAST(ws.n_words AS DOUBLE), 6)
         AS dup_word_ratio,
       round(ws.top_word / CAST(ws.n_words AS DOUBLE), 6) AS top_word_frac,
       round(bs.top_bi / CAST(bs.n_bi AS DOUBLE), 6) AS top_bigram_frac
FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
ORDER BY ws.doc_id
"""


def q73_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination through the driver gate: every 50th
    document plays the eval set; any document sharing a word 5-gram
    with it (the benchmark docs themselves, plus their near-duplicates
    planted in the fixture) is dropped. Shingle semi-join + id
    anti-join — the corpus-side plan is broadcast-joinable at scale."""
    from flink_note_spark.operators.dedup import decontaminate

    d = _t(spark, sf, "documents")
    bench = d.filter(F.pmod("doc_id", F.lit(50)) == 0).select("doc_id", "text")
    return (
        decontaminate(d, bench, n=5,
                      ids_unique=True)  # doc_id is the table's primary key
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_Q73_SQL = """
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t FROM documents),
grams AS (
  SELECT doc_id, array_to_string(t[i.i:i.i+4], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) AS i(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
contaminated AS (
  SELECT DISTINCT doc_id FROM grams WHERE g IN (SELECT g FROM bench)
)
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
ORDER BY doc_id
"""


def q77_split_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """In-corpus split decontamination through the driver gate: docs are
    assigned train/val/test by a modulo rule (deterministic in BOTH
    engines — hash_split's xxhash64 has no DuckDB twin), then train rows
    leaking a val/test 5-gram are dropped while val/test pass through.
    Output counts per split plus the surviving id checksum so the hash
    compare pins WHICH rows survived, not just how many."""
    from flink_note_spark.operators.dedup import decontaminate_splits

    d = _t(spark, sf, "documents")
    split = (
        F.when(F.pmod("doc_id", F.lit(20)) == 0, "val")
        .when(F.pmod("doc_id", F.lit(20)) == 1, "test")
        .otherwise("train")
    )
    out = decontaminate_splits(
        d.withColumn("split", split), split_col="split", n=5,
        ids_unique=True,  # doc_id is the table's primary key
    )
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("split")
    )


_Q77_SQL = """
WITH labeled AS (
  SELECT *, CASE WHEN doc_id % 20 = 0 THEN 'val'
                 WHEN doc_id % 20 = 1 THEN 'test'
                 ELSE 'train' END AS split
  FROM documents
),
toks AS (SELECT doc_id, split, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t FROM labeled),
grams AS (
  SELECT doc_id, split, array_to_string(t[i.i:i.i+4], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) AS i(i)
),
prot AS (SELECT DISTINCT g FROM grams WHERE split <> 'train'),
leaky AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE split = 'train' AND g IN (SELECT g FROM prot)
),
kept AS (
  SELECT * FROM labeled
  WHERE split <> 'train' OR doc_id NOT IN (SELECT doc_id FROM leaky)
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM kept GROUP BY split ORDER BY split
"""


def q78_frequent_tokens_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """The Misra–Gries heavy-hitter sketch through the driver gate,
    summary sized so the candidate set is lossless at this scale — the
    exact verify pass then makes the output identical to q66, so the
    SAME oracle applies (what's under test is that the sketch's
    candidate stage loses nothing it shouldn't)."""
    from flink_note_spark.operators.text import frequent_tokens_sketch

    d = _t(spark, sf, "documents")
    return frequent_tokens_sketch(
        d, "text", k=20, min_count=2, summary_size=100_000
    )


def q79_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Perplexity-proxy quality score: per-document mean unigram
    log-probability under the corpus's own token distribution (the
    model-free stand-in for a KenLM-style LM filter — no model files in
    this container). Two map-side-combinable aggregations (corpus token
    counts, per-doc means over a token-keyed join); the shuffle carries
    (token) and (doc, token) aggregate rows, never text. Output: the 5
    lowest-scoring (most atypical) documents — the filter's natural
    consumers are tail reviews."""
    d = _t(spark, sf, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", "\\s+")).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = tok.select(F.count(F.lit(1)).alias("__n"))
    return (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("c") / F.col("__n"))), 6).alias(
                "mean_logp"
            ),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy(F.col("mean_logp").asc(), F.col("doc_id").asc())
        .limit(5)
    )


_Q79_SQL = r"""
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
    FROM documents
  ) WHERE token <> ''
), freq AS (
  SELECT token, count(*) AS c FROM tok GROUP BY 1
), total AS (SELECT count(*) AS n FROM tok)
SELECT doc_id,
       round(avg(ln(freq.c / CAST(total.n AS DOUBLE))), 6) AS mean_logp,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM tok JOIN freq USING (token) CROSS JOIN total
GROUP BY doc_id
ORDER BY mean_logp ASC, doc_id ASC
LIMIT 5
"""


def q84_full_corpus_prep(spark: SparkSession, sf: str) -> DataFrame:
    """The EXTENDED composed corpus-preparation flow through the driver
    gate: PII redaction → curate (exact dedup + language + quality) →
    repetition gate → 5-gram decontamination against an eval subset →
    corpus summary. The LSH near-dup stage is disabled here (its hash
    functions have no DuckDB twin — covered by q31/q53's composition
    path and rows-only checks); PII redaction runs but is a no-op on
    the clean fixture, so the oracle replays every OTHER stage
    faithfully: the composition contract under test is that five
    chained operators produce exactly the documents the independent SQL
    formulation keeps."""
    from flink_note_spark.pipelines.curate import (
        CurationConfig,
        prepare_training_corpus,
    )

    d = _t(spark, sf, "documents")
    bench = d.filter(F.pmod("doc_id", F.lit(50)) == 0).select("doc_id", "text")
    out = prepare_training_corpus(
        d,
        "text",
        "doc_id",
        CurationConfig(min_words=5, max_stop_ratio=0.9),
        near_dup_threshold=None,
        pii_redact=True,
        max_dup_word_ratio=0.9,
        benchmark=bench,
        decontaminate_n=5,
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.sum("n_words").cast("long").alias("total_words"),
    )


_Q84_SQL = """
WITH sig AS (
  SELECT doc_id, text,
         CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('el','la','los','las','es','un','una'))) > 0 THEN 'es'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('le','les','des','est','une','et'))) > 0 THEN 'fr'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('der','die','das','und','ist','ein'))) > 0 THEN 'de'
              ELSE 'en' END AS lang_pred,
         len(regexp_split_to_array(text, '\\s+')) AS n_words,
         len(list_filter(regexp_split_to_array(text, '\\s+'),
             x -> x IN ('the','a','of','and','to')))
           / CAST(greatest(len(regexp_split_to_array(text, '\\s+')), 1) AS DOUBLE) AS stop_ratio,
         sha256(lower(trim(text))) AS h
  FROM documents
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM sig
  ) WHERE rn = 1
), cur AS (
  SELECT * FROM deduped
  WHERE lang_pred IN ('en','es','fr','de','zh')
    AND n_words BETWEEN 5 AND 100000 AND stop_ratio <= 0.9
), rep AS (
  SELECT doc_id,
         round(1 - count(DISTINCT w) / CAST(count(*) AS DOUBLE), 6)
           AS dup_word_ratio
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w FROM cur)
  WHERE w <> '' GROUP BY doc_id
), gated AS (
  SELECT cur.* FROM cur JOIN rep USING (doc_id)
  WHERE rep.dup_word_ratio <= 0.9
), grams AS (
  SELECT g.doc_id, array_to_string(g.t[i.i:i.i+4], ' ') AS gram
  FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM gated) g,
       LATERAL (SELECT unnest(range(1, len(g.t) - 3)) AS i) AS i(i)
), bgrams AS (
  SELECT DISTINCT array_to_string(t[i.i:i.i+4], ' ') AS gram
  FROM (SELECT regexp_split_to_array(text, '\\s+') AS t FROM documents
        WHERE doc_id % 50 = 0) b,
       LATERAL (SELECT unnest(range(1, len(b.t) - 3)) AS i) AS i(i)
), leaky AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE gram IN (SELECT gram FROM bgrams)
), final AS (
  SELECT * FROM gated WHERE doc_id NOT IN (SELECT doc_id FROM leaky)
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(n_words) AS BIGINT) AS total_words
FROM final
"""


def q75_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding centroids in long format (label, dim, c):
    one posexplode feeding a map-side-combinable (label, dim) average —
    the shuffle carries n_labels·dim aggregate rows, never vectors.
    Long format keeps the oracle compare scalar (array stringification
    differs between engines). ``dim`` is 1-based to match DuckDB's
    ``generate_subscripts``."""
    e = _t(spark, sf, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("c"))
        .orderBy("label", "dim")
    )


_Q75_SQL = """
WITH e AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT label, CAST(dim AS INT) AS dim, round(avg(v), 6) AS c
FROM e GROUP BY label, dim ORDER BY label, dim
"""


def q76_centroid_classify(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-centroid classification confusion counts: per-label
    centroids rebuilt as ARRAYS (sorted struct collect), broadcast-
    crossed with the corpus (n_labels rows — AQE broadcasts), cosine via
    JVM ``vec_dot``, argmax per vector by window. The 100 TB shape: the
    corpus never explodes per-dimension for scoring and never shuffles —
    only (vec, label-count) aggregates do. Oracle recomputes everything
    in exploded SQL — two independent formulations hash-matching."""
    from flink_note_spark.functions.scalar import l2_norm_sq, vec_dot

    e = _t(spark, sf, "embeddings")
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy(F.col("label").alias("clabel"), "pos")
        .agg(F.avg("v").alias("c"))
        .groupBy("clabel")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.c,
            ).alias("centroid")
        )
    )
    sim = vec_dot("embedding", "centroid") / (
        F.sqrt(l2_norm_sq("embedding")) * F.sqrt(l2_norm_sq("centroid"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__cos").desc(), F.col("clabel").asc()
    )
    return (
        e.select("vec_id", "label", "embedding")
        .crossJoin(F.broadcast(cent))
        .withColumn("__cos", sim)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .groupBy("label", F.col("clabel").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred_label")
    )


_Q76_SQL = """
WITH e AS (
  SELECT vec_id, label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
), cent AS (
  SELECT label AS clabel, dim, avg(v) AS c FROM e GROUP BY 1, 2
), scored AS (
  SELECT e.vec_id, e.label, cent.clabel,
         sum(e.v * cent.c)
           / (sqrt(sum(e.v * e.v)) * sqrt(sum(cent.c * cent.c))) AS cos
  FROM e JOIN cent ON e.dim = cent.dim
  GROUP BY 1, 2, 3
), best AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY cos DESC, clabel ASC
         ) AS r
  FROM scored
)
SELECT label, clabel AS pred_label, CAST(count(*) AS BIGINT) AS n
FROM best WHERE r = 1 GROUP BY 1, 2 ORDER BY 1, 2
"""


def q117_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-level duplication stats (r8) — the scalable
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the fraction of tokens covered by word 5-grams occurring
    ≥2 times anywhere in the corpus (``operators/dedup.
    dup_span_stats``). Positional shingle scan + hashed-gram count +
    one window interval-union; complements q96 (novelty = set-level
    sharing, this = occurrence-level coverage)."""
    from flink_note_spark.operators.dedup import dup_span_stats

    d = _t(spark, sf, "documents")
    return dup_span_stats(d, n=5, min_count=2).orderBy("doc_id")


_Q117_SQL = """
WITH w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(text, '\\s+'),
                          x -> x <> '') AS wlist
       FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(wlist) - 4),
                i -> struct_pack(pos := i,
                     g := array_to_string(wlist[i+1:i+5], ' ')))) AS s
  FROM w WHERE len(wlist) >= 5),
pg AS (SELECT doc_id, s.pos AS pos, s.g AS g FROM sh),
cnt AS (SELECT g, count(*) AS c FROM pg GROUP BY g),
dup AS (SELECT pg.doc_id, pg.pos FROM pg
        JOIN cnt USING (g) WHERE cnt.c >= 2),
cov AS (SELECT doc_id, pos,
          max(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prev_end
        FROM dup),
per AS (SELECT doc_id,
          CAST(count(*) AS BIGINT) AS n_dup_grams,
          CAST(sum(greatest(0,
               pos + 5 - greatest(pos, coalesce(prev_end, pos))))
            AS BIGINT) AS dup_tokens
        FROM cov GROUP BY doc_id)
SELECT w.doc_id,
       CAST(len(w.wlist) AS BIGINT) AS n_tokens,
       CAST(coalesce(per.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(per.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CASE WHEN len(w.wlist) > 0
            THEN round(coalesce(per.dup_tokens, 0)
                       / CAST(len(w.wlist) AS DOUBLE), 6)
       END AS dup_fraction
FROM w LEFT JOIN per USING (doc_id)
ORDER BY w.doc_id
"""


def q121_chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Token-window document chunking (r9,
    ``operators/text.py:chunk_documents``) — the standard pre-packing
    splitter: 64-token windows with a 16-token overlap (stride 48),
    last chunk short, whitespace tokens. Pure Catalyst (split +
    posexplode over a per-doc sequence of starts) — a flatMap at scan
    speed, zero shuffles before the presentation sort; at 100 TB the
    output is ∝ total chunks and each document chunks independently.
    Summarized per doc for a bounded result (n_chunks, token total,
    and an md5-portable chunk-text checksum (the q91 doctrine) that pins exact window contents)."""
    from flink_note_spark.operators.text import chunk_documents

    d = _t(spark, sf, "documents")
    ch = chunk_documents(
        d, "text", "doc_id", max_tokens=64, overlap=16
    )
    return (
        ch.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(
                F.conv(
                    F.substring(F.md5(F.col("chunk_text")), 1, 15),
                    16, 10,
                ).cast("long")
                * (F.col("chunk_id") + 1)
            ).alias("chunk_checksum"),
        )
        .orderBy("doc_id")
    )


_Q121_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS t
  FROM documents
), sized AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
), chunks AS (
  SELECT doc_id, t, n, u.i AS chunk_id
  FROM sized,
       LATERAL UNNEST(generate_series(
         0,
         greatest(0, CAST(ceil((n - 64) / 48.0) AS INT))
       )) AS u(i)
), rendered AS (
  SELECT doc_id, chunk_id,
         array_to_string(
           list_slice(t, chunk_id * 48 + 1,
                      least(chunk_id * 48 + 64, n)), ' ') AS chunk_text,
         least(64, n - chunk_id * 48) AS n_tokens
  FROM chunks
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(CAST(concat('0x', substr(md5(chunk_text), 1, 15))
                     AS BIGINT) * (chunk_id + 1)) AS BIGINT)
         AS chunk_checksum
FROM rendered
GROUP BY doc_id
ORDER BY doc_id
"""


def q122_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (r9,
    ``operators/similarity.py:semantic_dedup_pairs``): cluster-bucketed
    embedding dedup — cosine verified only WITHIN each cell, never
    corpus-wide. This is the operator's DETERMINISTIC twin (injected
    centroids = the 8 smallest vec_ids' vectors, assignment as a pure
    JVM plan with ties to the smallest cell), so DuckDB reproduces the
    assignment and the pair set exactly; the k-means path
    (``centroids=None``) is the scale default, pinned against this
    twin in pytest."""
    from flink_note_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    e = _t(spark, sf, "embeddings")
    cents = (
        e.orderBy("vec_id").limit(8)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .alias("cell_id"),
            F.col("embedding"),
        )
    )
    return semantic_dedup_pairs(
        e, threshold=EMBED_DUP_THRESHOLD, id_col="vec_id",
        vec_col="embedding", centroids=cents, max_cell=None,
    ).orderBy("d1", "d2")


_Q122_SQL = f"""
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, v AS cv
  FROM n ORDER BY vec_id LIMIT 8
), scored AS (
  SELECT e.vec_id, e.v, c.cell_id,
         list_reduce(list_transform(range(1, len(e.v) + 1),
                     i -> e.v[i] * c.cv[i]), (x, y) -> x + y)
           / (sqrt(list_reduce(list_transform(e.v, x -> x * x),
                               (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(c.cv, x -> x * x),
                                 (x, y) -> x + y))) AS cos
  FROM n e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, v, cell_id
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cell_id ASC) AS rn
        FROM scored)
  WHERE rn = 1
), pairs AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2,
         round(list_reduce(list_transform(range(1, len(a.v) + 1),
                           i -> a.v[i] * b.v[i]), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(a.v, x -> x * x),
                                   (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(b.v, x -> x * x),
                                     (x, y) -> x + y))), 6) AS cos_sim
  FROM assigned a JOIN assigned b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
)
SELECT d1, d2, cos_sim FROM pairs
WHERE cos_sim >= {EMBED_DUP_THRESHOLD}
ORDER BY d1, d2
"""


def q125_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental dedup against a MinHash index (r10 — VERDICT r9
    #5): the corpus (doc_id % 5 != 0) builds a
    :class:`~flink_note_spark.operators.dedup.MinHashIndex` ONCE; the
    increment (doc_id % 5 == 0) hashes only itself and joins its band
    rows against the index — the operational ingest shape where the
    corpus is never recomputed. At q90's full-recall parameters
    (32 hashes × 8 bands, exact verify, no df cap) the output EQUALS
    the exact cross-set Jaccard pair set, which IS SQL-expressible —
    so the whole build → probe → verify path is oracle-checked, and an
    LSH recall regression on the index path becomes a driver HASH
    MISMATCH (the q90 doctrine). Save/load persistence round-trip and
    the bucketed zero-exchange probe plan are pytest-gated
    (tests/test_operators_unit.py, tests/test_scale.py)."""
    from flink_note_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
    )

    d = _t(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    inc = d.filter(F.col("doc_id") % 5 == 0)
    idx = minhash_index_build(corpus, ids_unique=True)
    return (
        dedup_against_index(
            inc, idx, threshold=JACCARD_THRESHOLD, ids_unique=True
        )
        .select("d1", "d2", "jaccard")
        .orderBy("d1", "d2")
    )


_Q125_SQL = f"""
WITH w AS (SELECT doc_id,
              list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS wlist
       FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(0, len(wlist) - 2),
                               i -> array_to_string(wlist[i+1:i+3], ' '))) AS shingle
  FROM w WHERE len(wlist) >= 3
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pair_inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_int
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
  GROUP BY 1, 2
)
SELECT d1, d2,
       round(n_int / (s1.sz + s2.sz - n_int), 6) AS jaccard
FROM pair_inter
JOIN sizes s1 ON s1.doc_id = d1
JOIN sizes s2 ON s2.doc_id = d2
WHERE n_int / (s1.sz + s2.sz - n_int) >= {JACCARD_THRESHOLD}
ORDER BY d1, d2
"""


def q124_semantic_corpus_prep(spark: SparkSession, sf: str) -> DataFrame:
    """The composed corpus flow WITH the semantic stage (r10 — VERDICT
    r9 #4): curate (exact dedup + language + quality) → SemDeDup
    collapse (cell-bucketed cosine pairs → connected components →
    MERIT representative by ``n_words``, ties to the smallest id) →
    md5 train/val/test split — ``prepare_training_corpus`` end to end,
    per-document output so every kept id, its metadata AND its split
    assignment are value-checked. Deterministic twin configuration
    (the q122 doctrine): centroids injected as the 8 smallest vec_ids'
    vectors makes cell assignment a pure JVM plan DuckDB replays
    bit-for-bit; the k-means path is the scale default, pinned against
    this twin in pytest. The lexical MinHash stage is off here (no SQL
    twin — q31/q84 cover it); the semantic stage's pair join is
    cell-keyed, components are O(log n) id-list rounds, and the split
    is a narrow projection — nothing corpus-wide n²."""
    from flink_note_spark.pipelines.curate import prepare_training_corpus

    d = _t(spark, sf, "documents")
    e = _t(spark, sf, "embeddings")
    cents = (
        e.orderBy("vec_id").limit(8)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .alias("cell_id"),
            F.col("embedding"),
        )
    )
    out = prepare_training_corpus(
        d,
        "text",
        "doc_id",
        near_dup_threshold=None,
        splits={"train": 0.9, "val": 0.05, "test": 0.05},
        semantic_threshold=EMBED_DUP_THRESHOLD,
        embeddings=e.select(F.col("vec_id").alias("doc_id"), "embedding"),
        semantic_keep_by="n_words",
        semantic_centroids=cents,
        semantic_max_cell=None,
        split_hash_fn="md5",
    )
    return (
        out.select(
            "doc_id",
            "lang_pred",
            F.col("n_words").cast("long").alias("n_words"),
            "split",
        )
        .orderBy("doc_id")
    )


_Q124_SQL = f"""
WITH RECURSIVE sig AS (
  SELECT doc_id, text,
         CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('el','la','los','las','es','un','una'))) > 0 THEN 'es'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('le','les','des','est','une','et'))) > 0 THEN 'fr'
              WHEN len(list_filter(regexp_split_to_array(text, '\\s+'),
                   x -> x IN ('der','die','das','und','ist','ein'))) > 0 THEN 'de'
              ELSE 'en' END AS lang_pred,
         len(regexp_split_to_array(text, '\\s+')) AS n_words,
         len(list_filter(regexp_split_to_array(text, '\\s+'),
             x -> x IN ('the','a','of','and','to')))
           / CAST(greatest(len(regexp_split_to_array(text, '\\s+')), 1) AS DOUBLE) AS stop_ratio,
         sha256(lower(trim(text))) AS h
  FROM documents
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM sig
  ) WHERE rn = 1
), cur AS (
  SELECT * FROM deduped
  WHERE lang_pred IN ('en','es','fr','de','zh')
    AND n_words BETWEEN 5 AND 100000 AND stop_ratio <= 0.9
), n AS (
  SELECT e.vec_id AS id,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings e JOIN cur ON cur.doc_id = e.vec_id
), cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
), scored AS (
  SELECT e.id, e.v, c.cell_id,
         list_reduce(list_transform(range(1, len(e.v) + 1),
                     i -> e.v[i] * c.cv[i]), (x, y) -> x + y)
           / (sqrt(list_reduce(list_transform(e.v, x -> x * x),
                               (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(c.cv, x -> x * x),
                                 (x, y) -> x + y))) AS cos
  FROM n e CROSS JOIN cents c
), assigned AS (
  SELECT id, v, cell_id
  FROM (SELECT *, row_number() OVER (
          PARTITION BY id ORDER BY cos DESC, cell_id ASC) AS rn
        FROM scored)
  WHERE rn = 1
), sp AS (
  SELECT a.id AS d1, b.id AS d2
  FROM assigned a JOIN assigned b
    ON a.cell_id = b.cell_id AND a.id < b.id
  WHERE round(list_reduce(list_transform(range(1, len(a.v) + 1),
                          i -> a.v[i] * b.v[i]), (x, y) -> x + y)
              / (sqrt(list_reduce(list_transform(a.v, x -> x * x),
                                  (x, y) -> x + y))
                 * sqrt(list_reduce(list_transform(b.v, x -> x * x),
                                    (x, y) -> x + y))), 6)
        >= {EMBED_DUP_THRESHOLD}
), edges AS (
  SELECT d1 AS a, d2 AS b FROM sp
  UNION ALL SELECT d2, d1 FROM sp
), r AS (
  SELECT DISTINCT a AS id, a AS lab FROM edges
  UNION
  SELECT e.b, r.lab FROM r JOIN edges e ON e.a = r.id
), comp AS (
  SELECT id, min(lab) AS component FROM r GROUP BY id
), ranked AS (
  SELECT cur.doc_id,
         row_number() OVER (PARTITION BY comp.component
                            ORDER BY cur.n_words DESC, cur.doc_id ASC)
           AS krn
  FROM cur JOIN comp ON comp.id = cur.doc_id
), final AS (
  SELECT * FROM cur
  WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE krn > 1)
), u AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5(doc_id || ':42'), 1, 15)) AS BIGINT)
          % 1000000000) / 1000000000.0 AS u
  FROM final
)
SELECT f.doc_id, f.lang_pred, CAST(f.n_words AS BIGINT) AS n_words,
       CASE WHEN u.u < 0.9 THEN 'train'
            WHEN u.u < 0.95 THEN 'val'
            ELSE 'test' END AS split
FROM final f JOIN u USING (doc_id)
ORDER BY f.doc_id
"""


def q130_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Paragraph-level corpus-wide dedup (late-r10 — the RefinedWeb/
    FineWeb boilerplate-removal pass, ``operators/dedup.py:
    paragraph_dedup``): a paragraph occurring anywhere else in the
    corpus survives only at its first (doc_id, pos) occurrence;
    documents are reassembled from their survivors in order. The
    synthetic documents are single-line, so "paragraphs" here come
    from the token-window chunker (16-token disjoint windows — the
    splitter is an input contract, any real pipeline feeds
    ``split_paragraphs``). One window shuffle on the paragraph digest
    + one reassembly groupBy — never a cross join; at 100 TB hot
    boilerplate keys bound each reducer by that paragraph's corpus
    frequency. Result pinned per doc by the reassembled text's md5
    (the q91/q121 checksum doctrine)."""
    from flink_note_spark.operators.dedup import paragraph_dedup
    from flink_note_spark.operators.text import chunk_documents

    d = _t(spark, sf, "documents")
    paras = chunk_documents(
        d, "text", "doc_id", max_tokens=16, overlap=0
    ).select(
        "doc_id",
        F.col("chunk_id").alias("pos"),
        F.col("chunk_text").alias("para"),
    )
    return (
        paragraph_dedup(paras, sep=" ")
        .select(
            "doc_id", "n_kept", "n_dropped",
            F.md5("text").alias("text_md5"),
        )
        .orderBy("doc_id")
    )


_Q130_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS t
  FROM documents
), sized AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
), chunks AS (
  SELECT doc_id, t, n, u.i AS pos
  FROM sized,
       LATERAL UNNEST(generate_series(
         0,
         greatest(0, CAST(ceil((n - 16) / 16.0) AS INT))
       )) AS u(i)
), rendered AS (
  SELECT doc_id, pos,
         array_to_string(
           list_slice(t, pos * 16 + 1,
                      least(pos * 16 + 16, n)), ' ') AS para
  FROM chunks
), flagged AS (
  SELECT doc_id, pos, para,
         row_number() OVER (
           PARTITION BY md5(regexp_replace(trim(lower(para)),
                                           '\\s+', ' ', 'g'))
           ORDER BY doc_id, pos) = 1 AS keep
  FROM rendered
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
       md5(string_agg(para, ' ' ORDER BY pos)
             FILTER (WHERE keep)) AS text_md5
FROM flagged
GROUP BY doc_id
HAVING count(*) FILTER (WHERE keep) > 0
ORDER BY doc_id
"""


QUERIES = {
    "q29_exact_dedup": q29_exact_dedup,
    "q30_jaccard_pairs": q30_jaccard_pairs,
    "q31_minhash_lsh": q31_minhash_lsh,
    "q32_simhash_pairs": q32_simhash_pairs,
    "q33_cosine_topk": q33_cosine_topk,
    "q34_lsh_cosine_topk": q34_lsh_cosine_topk,
    "q57_ivf_exhaustive_topk": q57_ivf_exhaustive_topk,
    "q158_ivf_index_lifecycle": q158_ivf_index_lifecycle,
    "q159_pq_index_lifecycle": q159_pq_index_lifecycle,
    "q160_ivfpq_index_lifecycle": q160_ivfpq_index_lifecycle,
    "q94_pq_exhaustive_topk": q94_pq_exhaustive_topk,
    "q95_pq_topk": q95_pq_topk,
    "q96_ngram_novelty": q96_ngram_novelty,
    "q121_chunk_documents": q121_chunk_documents,
    "q122_semantic_dedup": q122_semantic_dedup,
    "q124_semantic_corpus_prep": q124_semantic_corpus_prep,
    "q125_incremental_dedup": q125_incremental_dedup,
    "q130_paragraph_dedup": q130_paragraph_dedup,
    "q117_dup_spans": q117_dup_spans,
    "q97_ivfpq_exhaustive_topk": q97_ivfpq_exhaustive_topk,
    "q58_hash_split": q58_hash_split,
    "q90_lsh_verified_pairs": q90_lsh_verified_pairs,
    "q91_md5_split": q91_md5_split,
    "q131_token_budget_mixture": q131_token_budget_mixture,
    "q132_gopher_quality": q132_gopher_quality,
    "q133_ccnet_buckets": q133_ccnet_buckets,
    "q134_lexicon_quality": q134_lexicon_quality,
    "q139_remove_dup_spans": q139_remove_dup_spans,
    "q141_semantic_decontaminate": q141_semantic_decontaminate,
    "q60_reservoir_exact_k": q60_reservoir_exact_k,
    "q61_packing_invariants": q61_packing_invariants,
    "q62_connected_components": q62_connected_components,
    "q63_cogroup_counts": q63_cogroup_counts,
    "q64_theta_join": q64_theta_join,
    "q65_clean_text": q65_clean_text,
    "q66_frequent_tokens": q66_frequent_tokens,
    "q67_salted_join": q67_salted_join,
    "q70_tfidf_top_terms": q70_tfidf_top_terms,
    "q71_pii_scan": q71_pii_scan,
    "q72_repetition_stats": q72_repetition_stats,
    "q73_decontaminate": q73_decontaminate,
    "q75_label_centroids": q75_label_centroids,
    "q77_split_decontaminate": q77_split_decontaminate,
    "q78_frequent_tokens_sketch": q78_frequent_tokens_sketch,
    "q84_full_corpus_prep": q84_full_corpus_prep,
    "q79_unigram_logprob": q79_unigram_logprob,
    "q76_centroid_classify": q76_centroid_classify,
    "q51_embedding_near_dup": q51_embedding_near_dup,
    "q52_lsh_embedding_near_dup": q52_lsh_embedding_near_dup,
    "q53_curation_pipeline": q53_curation_pipeline,
    "q35_text_quality": q35_text_quality,
    "q36_token_stats": q36_token_stats,
    "q37_language_id": q37_language_id,
    "q38_fingerprint": q38_fingerprint,
    "q39_wordcount": q39_wordcount,
    "q40_binary_meta": q40_binary_meta,
    "q41_multimodal_features": q41_multimodal_features,
}

# LSH/SimHash/multimodal entries intentionally absent: non-SQL-expressible
# (driver records rows-only checks; pytest covers semantics).
ORACLES = {
    "q29_exact_dedup": _Q29_SQL,
    "q30_jaccard_pairs": _Q30_SQL,
    # verified-LSH pair set == exact set at these params (recall 1.0,
    # precision by construction) — the exact oracle checks the LSH path
    "q58_hash_split": _Q58_SQL,
    "q90_lsh_verified_pairs": _Q30_SQL,
    "q91_md5_split": _Q91_SQL,
    "q131_token_budget_mixture": _Q131_SQL,
    "q132_gopher_quality": _Q132_SQL,
    "q133_ccnet_buckets": _Q133_SQL,
    "q134_lexicon_quality": _Q134_SQL,
    "q139_remove_dup_spans": _Q139_SQL,
    "q141_semantic_decontaminate": _Q141_SQL,
    "q33_cosine_topk": _Q33_SQL,
    # exhaustive probe == exact brute force, so the q33 oracle applies
    "q57_ivf_exhaustive_topk": _Q33_SQL,
    # save -> append -> load -> exhaustive query == exact brute force
    "q158_ivf_index_lifecycle": _Q33_SQL,
    "q159_pq_index_lifecycle": _Q33_SQL,
    "q160_ivfpq_index_lifecycle": _Q33_SQL,
    # exhaustive shortlist + exact re-rank == exact brute force
    "q94_pq_exhaustive_topk": _Q33_SQL,
    "q96_ngram_novelty": _Q96_SQL,
    "q121_chunk_documents": _Q121_SQL,
    "q122_semantic_dedup": _Q122_SQL,
    "q124_semantic_corpus_prep": _Q124_SQL,
    "q125_incremental_dedup": _Q125_SQL,
    "q130_paragraph_dedup": _Q130_SQL,
    # exhaustive probe + exhaustive shortlist == exact brute force
    "q97_ivfpq_exhaustive_topk": _Q33_SQL,
    "q60_reservoir_exact_k": _Q60_SQL,
    "q61_packing_invariants": _Q61_SQL,
    "q62_connected_components": _Q62_SQL,
    "q63_cogroup_counts": _Q63_SQL,
    "q64_theta_join": _Q64_SQL,
    "q65_clean_text": _Q65_SQL,
    "q66_frequent_tokens": _Q66_SQL,
    "q67_salted_join": _Q67_SQL,
    "q70_tfidf_top_terms": _Q70_SQL,
    "q71_pii_scan": _Q71_SQL,
    "q72_repetition_stats": _Q72_SQL,
    "q73_decontaminate": _Q73_SQL,
    "q75_label_centroids": _Q75_SQL,
    "q77_split_decontaminate": _Q77_SQL,
    # sketch's exact verify stage makes it equal the exact operator here
    "q78_frequent_tokens_sketch": _Q66_SQL,
    # ASCII corpus: the fake decoder's rolling hash + magic sniff are
    # SQL-expressible, so the kernel is fully oracle-checked (r6)
    "q41_multimodal_features": _Q41_SQL,
    "q84_full_corpus_prep": _Q84_SQL,
    "q79_unigram_logprob": _Q79_SQL,
    "q76_centroid_classify": _Q76_SQL,
    "q51_embedding_near_dup": _Q51_SQL,
    "q53_curation_pipeline": _Q53_SQL,
    "q35_text_quality": _Q35_SQL,
    "q36_token_stats": _Q36_SQL,
    "q37_language_id": _Q37_SQL,
    "q38_fingerprint": _Q38_SQL,
    "q39_wordcount": _Q39_SQL,
    "q40_binary_meta": _Q40_SQL,
    "q117_dup_spans": _Q117_SQL,
}
