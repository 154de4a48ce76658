"""Text-analysis operators over document tables.

North-star LLM-pipeline text ops (SURVEY.md §2.2): token counting,
quality scoring, heuristic language ID, content fingerprinting. All pure
Catalyst expressions — these run at scan speed and fold into the same
stage as the parquet read (filter/projection pushdown applies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_note_spark.functions.scalar import words

#: Tiny function-word list used for quality/stopword ratios (the fixture
#: corpus vocabulary includes these — FIXTURES.md "documents").
STOPWORDS = ("the", "a", "of", "and", "to")

#: BPE-ish token regex: runs of letters, runs of digits, or single
#: non-space symbols — a deterministic proxy for subword tokenization.
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds token-count columns: whitespace tokens and regex tokens."""
    w = words(text_col)
    return df.withColumn("n_ws_tokens", F.size(w)).withColumn(
        "n_re_tokens", F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0))
    )


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Quality-signal expressions for a text column (length, word stats,
    stopword ratio, alpha ratio) — compose into select/agg freely."""
    w = words(text_col)
    n_words = F.size(w)
    n_chars = F.length(F.col(text_col))
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    # avg word length from the tokens themselves (r8): the old
    # chars-minus-separators closed form was exact only for
    # single-space text; with \s+ tokenization it would drift on
    # tabs/newlines/double spaces
    nonempty = F.filter(w, lambda x: x != "")
    total_wlen = F.aggregate(
        nonempty, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return {
        "n_words": n_words,
        "n_chars": n_chars,
        "avg_word_len": total_wlen / F.size(nonempty),
        "stopword_ratio": n_stop / n_words,
        "alpha_ratio": n_alpha / n_chars,
    }


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-document quality-signal columns."""
    cols = quality_columns(text_col)
    out = df
    for name, expr in cols.items():
        out = out.withColumn(name, expr)
    return out


#: Heuristic n-gram/charset profiles per language. Real language ID needs
#: a trained model; this is the deterministic, SQL-expressible stand-in
#: (the fixture corpus is synthetic word soup — FIXTURES.md).
def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``lang_pred``: charset/function-word heuristic language guess.

    Order of tests: CJK charset → language-specific function words →
    default 'en'. Pure expressions, so it runs in the scan stage.
    """
    t = F.col(text_col)
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    words_arr = words(text_col)

    def has_any(ws: tuple[str, ...]) -> Column:
        return F.size(F.filter(words_arr, lambda x: x.isin(*ws))) > 0

    pred = (
        F.when(has_cjk, "zh")
        .when(has_any(("el", "la", "los", "las", "es", "un", "una")), "es")
        .when(has_any(("le", "les", "des", "est", "une", "et")), "fr")
        .when(has_any(("der", "die", "das", "und", "ist", "ein")), "de")
        .otherwise("en")
    )
    return df.withColumn("lang_pred", pred)


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """Adds ``fingerprint``: hex content fingerprint (prefix of SHA-256 of
    normalized text). 64 bits default — collision-safe into the trillions
    of documents (birthday bound ~2^32)."""
    hexchars = bits // 4
    return df.withColumn(
        "fingerprint",
        F.substring(F.sha2(F.lower(F.trim(F.col(text_col))), 256), 1, hexchars),
    )


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    redact_urls: bool = True,
    redact_emails: bool = True,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Corpus-hygiene text normalization as a JVM ``regexp_replace``
    chain: strip control characters, redact URLs/emails to stable
    placeholder tokens, and collapse whitespace runs.

    Every step is a codegen'd expression fused into the scan stage —
    cleaning 100 TB costs exactly one pass over the text column with no
    shuffle and no Python. Redaction uses placeholder TOKENS rather
    than deletion so downstream token counts and n-gram shingles stay
    aligned with document structure (a deleted URL would glue its
    neighbors into a spurious shingle).

    Order matters and is fixed: control-strip → URL → email →
    whitespace collapse (URLs may contain control-adjacent bytes;
    whitespace collapse must see the placeholders, not raw runs).
    """
    out_col = out_col or text_col
    t = F.col(text_col)
    if strip_control:
        t = F.regexp_replace(t, "[\\p{Cntrl}]", " ")
    if redact_urls:
        t = F.regexp_replace(t, "(?i)\\bhttps?://\\S+", "<url>")
    if redact_emails:
        t = F.regexp_replace(
            t, "(?i)\\b[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}\\b", "<email>"
        )
    if collapse_whitespace:
        t = F.trim(F.regexp_replace(t, "\\s+", " "))
    return df.withColumn(out_col, t)


def frequent_tokens_sketch(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_count: int = 2,
    summary_size: int = 4096,
    with_guarantee: bool = False,
) -> DataFrame:
    """Heavy-hitter tokens via per-partition Misra–Gries summaries +
    an exact verification pass — the sketch-path twin of
    :func:`frequent_tokens` for corpora whose DISTINCT-token set is too
    large to shuffle (the regime where the exact operator's
    one-row-per-distinct-token-per-partition exchange stops being
    "small"; at 100 TB of web text that set is billions of n-gram-ish
    tokens).

    Stage 1 (candidates): each partition streams its tokens through a
    Misra–Gries summary of ``summary_size`` counters (batch counts via
    pandas ``value_counts`` in C, merged with the standard
    subtract-the-overflow-quantile decrement). MG guarantees every
    token with partition frequency > n_p/(summary_size+1) survives, so
    every token with CORPUS frequency > n/(summary_size+1) survives in
    at least one partition — completeness for true heavy hitters. The
    shuffle carries at most partitions × summary_size candidate rows,
    independent of vocabulary size.

    Stage 2 (verify): candidates get EXACT corpus counts via a second
    scan whose aggregation is semi-joined to the (small, broadcastable)
    candidate set — the same candidates-then-verify doctrine as the
    MinHash/LSH dedup family. Output is therefore EXACT counts in exact
    order, identical to :func:`frequent_tokens` whenever the top-k all
    clear the MG threshold (asserted in tests); the sketch only decides
    WHICH tokens get counted.

    Output: token, n (exact), ordered (n desc, token asc), limit k.

    **Guarantee boundary (ADVICE r5):** MG only guarantees a token's
    survival when its corpus frequency exceeds ``n/(summary_size+1)``;
    a true top-k token at or below that threshold may never surface as
    a candidate, and the verify stage cannot count what it never saw —
    the caller would get a plausible-looking but incomplete top-k with
    no signal. ``with_guarantee=True`` appends a ``mg_guaranteed``
    boolean per row (``n > total_tokens/(summary_size+1)``): rows with
    ``true`` are provably the exact top of the corpus; once a ``false``
    row appears, every row from that rank down is only
    best-effort — re-run with a larger ``summary_size`` (or the exact
    :func:`frequent_tokens`) if those ranks matter. Costs one extra
    map-side-combinable ``count`` over the token scan; the default
    schema is unchanged.
    """
    tok = df.select(
        F.explode(F.split(F.col(text_col), "\\s+")).alias("token")
    ).filter(F.col("token") != "")

    m = summary_size

    def mg_partials(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for token, c in pdf["token"].value_counts().items():
                counters[token] = counters.get(token, 0) + int(c)
            if len(counters) > m:
                # subtract the overflow quantile from everything and
                # drop non-positive — (len-m) decrement steps at once
                vals = sorted(counters.values())
                d = vals[len(counters) - m - 1]
                counters = {
                    t: c - d for t, c in counters.items() if c - d > 0
                }
        if counters:
            yield pd.DataFrame({"token": list(counters.keys())})

    cand = tok.mapInPandas(mg_partials, "token string").distinct()
    out = (
        tok.join(cand, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    if with_guarantee:
        total = tok.agg(F.count(F.lit(1)).alias("__N"))
        out = (
            out.crossJoin(F.broadcast(total))  # 1-row total: bounded
            .withColumn(
                "mg_guaranteed",
                F.col("n") > F.col("__N") / F.lit(m + 1),
            )
            .drop("__N")
        )
    return out.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    ``tf · ln((N+1)/(df+1))`` with whitespace-run tokenization (empty
    tokens dropped, same contract as :func:`frequent_tokens`).

    Three map-side-combinable aggregations and one token-keyed join —
    all shuffles carry (doc, token) / (token) rows bounded by the
    corpus's distinct-token structure, never raw text. The corpus size
    ``N`` rides in on a one-row cross join (broadcast by AQE), not a
    driver constant, so the plan stays a single lazy DAG. Ties break on
    token order; ``rank`` makes the output deterministic.

    Output: id_col, token, tf (long), tfidf (rounded 4), rank.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(F.count(F.lit(1)).alias("__n_docs"))
    score = F.col("tf") * F.log(
        (F.col("__n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    )
    w = Window.partitionBy(id_col).orderBy(
        score.desc(), F.col("token").asc()
    )
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))  # 1-row total: bounded (r9 — the
        # explicit hint matches the sibling at frequent_tokens and
        # keeps the no-cartesian contract independent of AQE)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "token",
            "tf",
            F.round(score, 4).alias("tfidf"),
            "rank",
        )
    )


#: PII patterns — RE2-compatible (no lookaround/backrefs) so the same
#: pattern runs verbatim in Spark (Java regex) and the DuckDB oracle.
#: Order of redaction is fixed: URL first (may embed digits/@), then
#: email, phone, IPv4.
PII_PATTERNS = {
    "url": r"(?i)\bhttps?://\S+",
    "email": r"(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    redact: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Detect (and optionally redact) PII spans: URLs, emails,
    NNN-NNN-NNNN phone numbers, dotted-quad IPs.

    Adds ``n_<kind>`` counts per row and, with ``redact=True``, a
    redacted text column where each span becomes a stable ``<kind>``
    placeholder token (placeholders, not deletion — the
    :func:`clean_text` doctrine: token counts and shingles must stay
    aligned with document structure). Counts are taken BEFORE any
    redaction so overlapping kinds (an email inside a URL query string)
    are counted as written.

    Everything is a codegen ``regexp_count`` / ``regexp_replace``
    chain fused into the scan stage — scanning 100 TB for PII costs one
    pass over the text column, no shuffle, no Python.

    Input columns named ``n_<kind>`` would be silently overwritten by
    the counts — refused instead (same contract as
    ``operators/enrich.batched_enrich``).
    """
    out_col = out_col or text_col
    clash = {f"n_{kind}" for kind in PII_PATTERNS} & set(df.columns)
    if clash:
        raise ValueError(
            f"pii_scan: count columns {sorted(clash)} already exist on "
            "the input — rename them first (they would be silently "
            "overwritten)"
        )
    t = F.col(text_col)
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{kind}", F.regexp_count(t, F.lit(pat)))
    if redact:
        red = t
        for kind, pat in PII_PATTERNS.items():
            red = F.regexp_replace(red, pat, f"<{kind}>")
        out = out.withColumn(out_col, red)
    return out


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repetition signals (the Gopher/RefinedWeb-style
    repetitious-text filters, word-level so they work on corpora
    without line structure):

    - ``n_words`` / ``n_distinct_words`` and ``dup_word_ratio`` =
      ``1 - distinct/total`` — how much of the document is repeated
      vocabulary;
    - ``top_word_frac`` — occurrence share of the single most frequent
      word (a high value ⇒ degenerate repetition);
    - ``top_bigram_frac`` — share of word bigrams taken by the most
      frequent bigram (catches looping phrases single-word stats miss).

    Tokenization: whitespace runs, empty tokens dropped. Plan shape:
    one explode feeding two map-side-combinable aggregations keyed on
    the document id (bigrams come from a ``lead`` over the in-document
    position — the same key, so the window sort and both groupBys share
    one partitioning). Shuffles carry (doc, word) count rows, never
    the text. Ratios round to 6.
    """
    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    bi = (
        tok.withColumn("__next", F.lead("word").over(w))
        .filter(F.col("__next").isNotNull())
        .withColumn("bigram", F.concat_ws(" ", F.col("word"), F.col("__next")))
    )

    word_counts = tok.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("c")
    )
    word_stats = word_counts.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("__top_word"),
    )
    bi_stats = (
        bi.groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("__n_bi"), F.max("c").alias("__top_bi"))
    )
    return (
        word_stats.join(bi_stats, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_distinct_words",
            F.round(
                1 - F.col("n_distinct_words") / F.col("n_words"), 6
            ).alias("dup_word_ratio"),
            F.round(F.col("__top_word") / F.col("n_words"), 6).alias(
                "top_word_frac"
            ),
            F.round(F.col("__top_bi") / F.col("__n_bi"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )


def frequent_tokens(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_count: int = 2,
) -> DataFrame:
    """Top-k most frequent whitespace tokens across the corpus —
    the boilerplate/stopword discovery pass that feeds ``max_df``-style
    caps in the dedup operators.

    Exact, one wide aggregation: explode feeds a map-side-combinable
    count (the shuffle carries one row per DISTINCT token per partition,
    not per occurrence), then a single ordered limit. At 100 TB the
    distinct-token set, not the corpus, bounds the shuffle; ``k`` bounds
    the result. For sketch-based per-ROW frequent items over arbitrary
    columns, Spark's native ``df.freqItems(cols, support)`` is already
    the public surface — this operator exists for the token-level case
    it cannot express.

    Tokenization splits on WHITESPACE RUNS (``\\s+``) and drops empty
    tokens — since r8 the shared contract of the whole engine: the
    ``words()`` primitive (quality/lang-ID/WordCount family) moved to
    ``\\s+`` too (VERDICT r7 nit), so there is one tokenizer.
    """
    return (
        df.select(
            F.explode(F.split(F.col(text_col), "\\s+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: what fraction of a doc's distinct
    word n-grams appear in NO other document — the corpus-pressure
    signal dedup pipelines threshold on before paying for pairwise
    near-dup search (a doc whose shingles are mostly shared is either a
    near-duplicate or boilerplate; one whose shingles are mostly unique
    is safe to fast-path).

    Shares the vectorized whitespace-run shingle kernel with the dedup
    family (``dedup._shingle_rows`` — ONE tokenization across all
    hygiene operators), so "novelty" here is definitionally consistent
    with what MinHash/decontamination would see. Scale shape: one
    shingle scan, one map-side-combinable document-frequency agg over
    8-byte hashed shingles, one shingle-keyed equi-join back, one
    per-doc agg — no pairwise work at any point.

    Output: ``id_col, n_shingles, n_shared, novelty`` where ``novelty``
    = 1 − n_shared/n_shingles (rounded 6), NULL for docs shorter than
    ``n`` words (no shingles — nothing to judge).

    PRECONDITION (inherited from the kernel): one row per ``id_col``.
    """
    from flink_note_spark.operators.dedup import _computed_once, _shingle_rows

    # Both the document-frequency agg and the join's left side read the
    # shingle rows — materialize once (16-byte longs) so the Python
    # shingle kernel runs ONCE, not once per plan branch (r13
    # optimization round — the _positional_dup_rows fix, same class).
    sh = _computed_once(_shingle_rows(df, id_col, text_col, n, None))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("__df") >= 2).cast("long")).alias("n_shared"),
        )
        .withColumn(
            "novelty",
            F.round(
                F.lit(1.0) - F.col("n_shared") / F.col("n_shingles"), 6
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .fillna({"n_shingles": 0, "n_shared": 0})
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Token-window document chunking (r9 — the standard pre-packing
    splitter in an LLM data pipeline: long documents become fixed-size
    overlapping windows; :func:`operators.packing.pack_sequences` then
    bins the chunks).

    Semantics: whitespace tokens (the shared :func:`words` contract,
    empty tokens dropped); chunk ``i`` covers token positions
    ``[i·stride, i·stride + max_tokens)`` with
    ``stride = max_tokens − overlap``; the last chunk may be shorter;
    an empty document emits no chunk and a document with
    ``≤ max_tokens`` tokens emits exactly one. Output: ``id_col,
    chunk_id (0-based), chunk_text, n_tokens``.

    Scale shape: pure Catalyst — one ``split`` + one ``posexplode``
    over a per-document ``sequence`` of chunk starts; output rows ∝
    total chunks, no shuffle at all (the operator is a flatMap at scan
    speed; downstream groupBys shuffle chunk rows, never raw text
    twice)."""
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_tokens "
            f"({max_tokens}) — the window must advance"
        )
    stride = max_tokens - overlap
    toks = F.filter(words(text_col), lambda t: t != "")
    n = F.size(toks)
    # number of chunks: 1 + ceil((n - max_tokens) / stride) for
    # n > max_tokens, else 1 (0 tokens → no chunk via the explode of
    # an empty sequence)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.greatest(
            F.lit(0),
            F.ceil((n - F.lit(max_tokens)) / F.lit(stride)),
        ).cast("int")
    )
    starts = F.when(
        n_chunks > 0,
        F.sequence(F.lit(0), (n_chunks - 1) * F.lit(stride),
                   F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    out = df.select(
        F.col(id_col),
        F.col(text_col),
        toks.alias("__toks"),
    ).select(
        id_col,
        F.posexplode(starts).alias("chunk_id", "__start"),
        F.col("__toks"),
    ).select(
        id_col,
        "chunk_id",
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + 1,
                    F.lit(max_tokens)),
            " ",
        ).alias("chunk_text"),
        F.least(
            F.lit(max_tokens), F.size("__toks") - F.col("__start")
        ).alias("n_tokens"),
    )
    return out


#: Gopher's stopword-presence list (Rae et al. arXiv:2112.11446 §A1.1):
#: a document must contain at least ``min_stopwords`` distinct entries.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    prefix: str = "gq_",
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. arXiv:2112.11446
    §A1.1) as one composed scan-stage operator: per-document boolean
    flag columns — one per rule — plus ``<prefix>keep`` (their
    conjunction). Defaults are the paper's published thresholds; every
    threshold is a parameter because real pipelines re-tune them per
    corpus.

    Rules (flag TRUE = document passes):

    - ``words_ok``     word count in [min_words, max_words]
    - ``word_len_ok``  mean word length in [min_mean_word_len, max_...]
    - ``symbol_ok``    (hash + ellipsis symbols) / words <= max_symbol_ratio
    - ``bullet_ok``    <= max_bullet_line_frac of lines start with a bullet
    - ``ellipsis_ok``  <= max_ellipsis_line_frac of lines end with ellipsis
    - ``alpha_ok``     >= min_alpha_word_frac of words contain a letter
    - ``stopword_ok``  >= min_stopwords DISTINCT stopword-list entries occur

    Everything is a pure Catalyst expression over one ``\\s+``
    tokenization (shared with the dedup/TF-IDF kernel) and one ``\\n``
    line split — the filter folds into the parquet scan stage, zero
    shuffles at any scale, and each rule is independently auditable
    (keep the flags, aggregate failure counts per source, THEN drop).
    Zero-word documents fail ``words_ok`` and fail the ratio rules by
    definition (flags are null-safe FALSE, never NULL).
    """
    w = F.filter(words(text_col), lambda x: x != "")
    n_words = F.size(w)
    has_words = n_words > 0
    mean_wlen = F.when(
        has_words,
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
        / n_words,
    )
    t = F.col(text_col)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    # non-overlapping '...' occurrences via length difference / 3; the
    # one-char U+2026 ellipsis counts directly
    n_dots = (
        F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))
    ) / 3
    n_uni = F.length(t) - F.length(F.regexp_replace(t, "…", ""))
    symbol_ratio = F.when(has_words, (n_hash + n_dots + n_uni) / n_words)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
        / n_lines
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))
        )
        / n_lines
    )
    alpha_frac = F.when(
        has_words,
        F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))) / n_words,
    )
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stopwords]),
            lambda s: F.array_contains(w, s),
        )
    )

    def safe(cond: Column) -> Column:
        return F.coalesce(cond, F.lit(False))

    flags = {
        "words_ok": safe((n_words >= min_words) & (n_words <= max_words)),
        "word_len_ok": safe(
            (mean_wlen >= min_mean_word_len)
            & (mean_wlen <= max_mean_word_len)
        ),
        "symbol_ok": safe(symbol_ratio <= max_symbol_ratio),
        "bullet_ok": safe(bullet_frac <= max_bullet_line_frac),
        "ellipsis_ok": safe(ellipsis_frac <= max_ellipsis_line_frac),
        "alpha_ok": safe(alpha_frac >= min_alpha_word_frac),
        "stopword_ok": safe(n_stop >= min_stopwords),
    }
    out = df
    keep = F.lit(True)
    for name, flag in flags.items():
        out = out.withColumn(prefix + name, flag)
        keep = keep & F.col(prefix + name)
    return out.withColumn(prefix + "keep", keep)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    token distribution — the model-free perplexity proxy (the factored
    kernel behind q79; CCNet's KenLM scoring stage, arXiv:1911.00359
    §4.3, with the corpus itself standing in for the LM since no model
    files ship in this container).

    Output: ``id_col, mean_logp (rounded), n_tokens``. Scale shape: two
    map-side-combinable aggregations (corpus token frequencies; per-doc
    means over a token-keyed join) — shuffles carry (token) and
    (doc, token) aggregate rows only, never document text.
    """
    tok = df.select(
        F.col(id_col), F.explode(words(text_col)).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("__c"))
    total = tok.select(F.count(F.lit(1)).alias("__n"))
    return (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(F.log(F.col("__c") / F.col("__n"))), round_to
            ).alias("mean_logp"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
    mode: str = "exact",
) -> DataFrame:
    """CCNet-style head/middle/tail corpus partitioning
    (arXiv:1911.00359 §4.3): score every document with the
    :func:`unigram_logprob` perplexity proxy, then split each language
    into ``n_buckets`` equal-frequency buckets — bucket 1 ("head") is
    the most-typical (highest mean log-probability / lowest perplexity)
    third, "tail" the least. Real pipelines keep head+middle for
    pretraining and route tail to a quality re-review.

    Output: the input's ``id_col``/``lang_col`` plus ``mean_logp,
    n_tokens, bucket (1-based), bucket_label`` (head/middle/tail when
    ``n_buckets == 3``, ``b<k>`` otherwise).

    Modes — the exact/scale twin doctrine (SURVEY.md §7.3):

    - ``exact``: ``ntile(n)`` over ``(mean_logp DESC, id)`` within each
      language — deterministic, oracle-checkable, but the window sorts
      each language on ONE reducer. Fine at gate SF; at 100 TB the
      dominant language would serialize.
    - ``thresholds``: per-language ``percentile_approx`` boundaries
      broadcast back as a range join — two small aggregations and a
      broadcast, NO per-language global sort; bucket populations are
      approximate at the boundaries (the CCNet paper's own production
      shape: thresholds are computed once on a sample).
    """
    scored = df.select(id_col, lang_col, text_col)
    lp = unigram_logprob(scored, text_col, id_col)
    scored = scored.join(lp, id_col).drop(text_col)
    if n_buckets == 3:
        label = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    else:
        label = F.concat(F.lit("b"), F.col("bucket"))
    if mode == "exact":
        w = Window.partitionBy(lang_col).orderBy(
            F.col("mean_logp").desc(), F.col(id_col).asc()
        )
        return scored.withColumn(
            "bucket", F.ntile(n_buckets).over(w)
        ).withColumn("bucket_label", label)
    if mode != "thresholds":
        raise ValueError(f"mode must be exact|thresholds, got {mode!r}")
    # scale path: equal-frequency boundaries from one approx-quantile
    # aggregation per language, broadcast back; docs bucket by simple
    # comparison — no global sort anywhere.
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = scored.groupBy(lang_col).agg(
        F.percentile_approx("mean_logp", probs, 10_000).alias("__qs")
    )
    joined = scored.join(F.broadcast(bounds), lang_col)
    # bucket = 1 + number of ascending quantile boundaries strictly
    # above this score: the top third clears every boundary (bucket 1 =
    # head), the bottom third clears none (bucket n = tail)
    bucket = F.lit(1) + F.size(
        F.filter(F.col("__qs"), lambda q: q > F.col("mean_logp"))
    )
    return (
        joined.withColumn("bucket", bucket.cast("int"))
        .withColumn("bucket_label", label)
        .drop("__qs")
    )


def lexicon_quality_score(
    df: DataFrame,
    lexicon: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
    round_to: int = 6,
    max_map_literal: int = 10_000,
) -> DataFrame:
    """fastText-style LINEAR quality classifier with fixed published
    weights (the shape of CCNet/RedPajama's quality heads: a linear
    model over token features; the learned weights arrive as data, the
    engine's job is the scoring pass). Score =
    ``sigmoid(bias + mean(weight(token)))`` with weight 0 for tokens
    outside the lexicon.

    Output: input columns plus ``quality_score`` (rounded). Scale
    shape: lexicons up to ``max_map_literal`` entries compile to a
    Catalyst MAP literal folded into the scan stage — zero shuffles,
    zero joins at ANY corpus size. Larger lexicons fall back to a
    token-explode + broadcast hash join (one doc-keyed re-aggregation
    shuffle carrying (doc, token) rows, never text)."""
    if not lexicon:
        raise ValueError("lexicon must be non-empty")
    toks = F.filter(words(text_col), lambda t: t != "")
    n = F.size(toks)
    if len(lexicon) <= max_map_literal:
        pairs: list[Column] = []
        for tok, wgt in lexicon.items():
            pairs.extend([F.lit(tok), F.lit(float(wgt))])
        m = F.create_map(*pairs)
        wsum = F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc
            + F.coalesce(F.element_at(m, t), F.lit(0.0)),
        )
        mean_w = F.when(n > 0, wsum / n).otherwise(F.lit(0.0))
        score = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-(F.lit(float(bias)) + mean_w))
        )
        return df.withColumn("quality_score", F.round(score, round_to))
    # big-lexicon path: broadcast join on exploded tokens
    spark = df.sparkSession
    lex = spark.createDataFrame(
        [(t, float(w)) for t, w in lexicon.items()],
        "token string, __wgt double",
    )
    tok_rows = df.select(
        F.col(id_col), F.explode(toks).alias("token")
    )
    scored = (
        tok_rows.join(F.broadcast(lex), "token", "left")
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.coalesce("__wgt", F.lit(0.0)))
                / F.count(F.lit(1))
            ).alias("__mean_w")
        )
    )
    score = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(float(bias)) + F.col("__mean_w")))
    )
    return (
        df.join(scored, id_col, "left")
        .withColumn(
            "quality_score",
            F.round(
                F.when(
                    F.col("__mean_w").isNotNull(), score
                ).otherwise(
                    F.lit(
                        round(
                            1.0 / (1.0 + __import__("math").exp(-bias)),
                            round_to,
                        )
                    )
                ),
                round_to,
            ),
        )
        .drop("__mean_w")
    )
