"""Catalyst expression builders shared by operators and queries.

Design rule (SURVEY.md §7.3): built-in expressions first, Arrow-batched
pandas UDFs second, row-at-a-time Python never. Every helper here returns
a Column built purely from ``pyspark.sql.functions`` / SQL expressions so
it stays inside whole-stage codegen — the Spark analogue of the operator
chaining the reference traces (``flink_arch-StreamGraph-JobGraph-
ExecutorGraph生成过程.png``, ``setChaining``/``createChain``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fmt_ts(col: str | Column, name: str | None = None) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss.SSSSSS' string (microsecond, UTC).

    Output timestamps are serialized to strings so differential results
    are engine-representation independent (SURVEY.md §5.1 normalization).
    """
    out = F.date_format(_c(col), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return out.alias(name) if name else out


def fmt_date(col: str | Column, name: str | None = None) -> Column:
    """Timestamp/date → 'yyyy-MM-dd' string."""
    out = F.date_format(_c(col), "yyyy-MM-dd")
    return out.alias(name) if name else out


def epoch_us(col: str | Column, name: str | None = None) -> Column:
    """Timestamp → microseconds since epoch (int64).

    Works for both TIMESTAMP and TIMESTAMP_NTZ under a UTC session
    timezone (session.py pins it), matching DuckDB's ``epoch_us``.
    """
    out = F.unix_micros(_c(col).cast("timestamp"))
    return out.alias(name) if name else out


def json_int(col: str | Column, path: str, name: str | None = None) -> Column:
    """Extract an integer field from a JSON string column.

    Covers the reference-closure JSON surface (SURVEY.md §2.2) needed for
    ``events.props``.
    """
    out = F.get_json_object(_c(col), path).cast("int")
    return out.alias(name) if name else out


def words(col: str | Column) -> Column:
    """Whitespace tokenization (the WordCount primitive — reference
    canonical job, ``flink_arch-yarn per job 启动流程.png`` box 1).

    Splits on ``\\s+`` runs (r8, VERDICT r7 nit): a raw corpus with
    tabs/newlines/double spaces no longer yields phantom empty tokens,
    and the quality/lang-ID/WordCount family now shares one
    tokenization with the dedup/TF-IDF/novelty kernel
    (``operators/dedup.py``). Leading whitespace still produces one
    leading empty token (Java and DuckDB regex-split agree); callers
    that must not count it filter ``x <> ''`` — as the oracles do."""
    return F.split(_c(col), "\\s+")


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Array of n-word shingles of a text column (empty array when the
    document has fewer than ``n`` words).

    Pure Catalyst: split → sequence → transform(slice ∘ concat_ws), so
    shingling scales out with no Python in the loop — the building block
    for n-gram Jaccard and MinHash dedup (SURVEY.md §2.2 north-star ops).
    """
    w = words(col)
    gen = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return F.when(F.size(w) >= n, gen).otherwise(F.array().cast("array<string>"))


def vec_dot(a: str | Column, b: str | Column) -> Column:
    """Dot product of two float-array columns, accumulated in double.

    Sequential left-to-right accumulation (``aggregate``) makes the result
    bit-reproducible and comparable with an oracle that sums in the same
    order. JVM-side; no UDF.
    """
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm_sq(a: str | Column) -> Column:
    """Squared L2 norm of a float-array column (double accumulation)."""
    return F.aggregate(
        _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def vec_cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two float-array columns (double math)."""
    return vec_dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def approx_quantile(
    col: str | Column, prob: float, accuracy: int = 10_000
) -> Column:
    """``approx_percentile`` (GK summary) with a USER-SIZED default
    accuracy.

    ``accuracy = 10_000`` bounds rank error at 1/accuracy = 0.01% of
    the group — the error budget a 100 TB user actually wants, with a
    sketch buffer ~50× smaller than what exact-equality testing needs.
    Oracle-equality callers (q43) pin ``accuracy`` explicitly instead:
    the GK summary compresses on a multiple of the buffer, so exactness
    does NOT follow from ``accuracy >= group size`` — it must be
    measured at the gate's data scale (VERDICT r6 item 5; sizing table
    in q43's docstring).
    """
    return F.percentile_approx(_c(col), prob, int(accuracy))


def variant_field(
    col: str | Column, path: str, dtype: str
) -> Column:
    """Typed JSON field read through Spark 4's VARIANT path:
    ``try_parse_json`` → ``try_variant_get`` (binary shredded encoding,
    SIMD-friendly) instead of a schema'd ``from_json`` struct parse.

    Measured on events.props at 32× sf0.1 (3.2M rows, cached input,
    interleaved reps): variant 0.93 s median / 0.76 s min vs from_json
    1.06 s / 0.98 s — ~12% faster at the median, ~23% at the minimum
    (VERDICT r6 item 2; full row in BASELINE.md). Width caveat (r9,
    measured — BASELINE.md "Round-9 width A/B"): ``try_parse_json``
    materializes the FULL document's variant binary, so on WIDE
    documents with few requested paths it loses badly (~70% slower
    than a pruned ``from_json`` at 49 fields); use this for narrow
    docs or parse-once-read-many access, and a schema-pruned
    ``from_json`` / ``get_json_object`` for wide-doc single-path
    pulls.
    The ``try_`` pair returns NULL on malformed input (``parse_json``
    proper is FAILFAST and throws) and on type mismatch — same
    contract as ``from_json``'s null-on-corrupt default
    (pinned in tests/test_scalar_surface.py).
    """
    return F.try_variant_get(F.try_parse_json(_c(col)), path, dtype)
