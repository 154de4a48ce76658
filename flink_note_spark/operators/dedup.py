"""Document deduplication operators: exact, n-gram Jaccard, MinHash-LSH,
SimHash.

North-star LLM-pipeline operators (SURVEY.md §2.2). Design constraints at
100 TB (SURVEY.md §7.3):

- **never** a cross join — every pairwise comparison goes through a
  bucket/band equi-join so only colliding documents meet;
- hot buckets (boilerplate shingles, spam clusters) are dropped by a
  document-frequency / bucket-size cap instead of being allowed to
  produce O(n²) pairs;
- all shingling/hashing is Catalyst expressions (JVM, codegen); the one
  pandas UDF (SimHash bit-voting) is Arrow-batched.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_note_spark.functions.scalar import word_shingles

# Prime modulus for the universal hash family (fits in 31 bits so
# a*h+b stays inside signed-64 arithmetic with no overflow).
_MERSENNE31 = (1 << 31) - 1


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact duplicate clustering on a content hash.

    Normalization = lower + trim (configurable off). Output: one row per
    distinct content (``keep`` = smallest id), with ``n_copies``. One
    hash-shuffle on the 256-bit digest; group-by combines map-side, so at
    100 TB the shuffle carries one row per *distinct* document per
    partition, not per input row.
    """
    txt = F.col(text_col)
    if normalize:
        txt = F.lower(F.trim(txt))
    h = F.sha2(txt, 256)
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int, max_df: int | None
) -> DataFrame:
    """(id, shingle) rows, distinct per doc; optionally drop shingles with
    document frequency > max_df (boilerplate guard — the 100 TB skew
    mitigation, SURVEY.md §7.3).

    The frequency cap is a window count over the shingle key — one shuffle
    shared with nothing else, instead of a groupBy + equi-join back
    (two shuffles plus a join fan-in)."""
    sh = (
        df.select(F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )
    if max_df is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
    return sh


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram (word shingle) Jaccard similarity pairs ≥ threshold.

    Relational plan: shingle-explode → self equi-join **on the shingle**
    (only docs sharing ≥1 shingle ever meet) → per-pair intersection count
    → |A∪B| from per-doc sizes. Output columns: d1, d2, jaccard.

    This is the exact (verification) path; at 100 TB run
    :func:`minhash_lsh_pairs` to pre-filter candidates and only verify
    those. ``max_df`` drops ultra-common shingles, bounding the join
    fan-out per shingle.
    """
    # Shingles feed three plan branches (sizes + both self-join sides) —
    # persist so explode+distinct runs once, not three times.
    sh = _shingle_rows(df, id_col, text_col, n, max_df).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
    max_df: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: (id, signature array<int>).

    Universal hash family h_i(x) = (a_i·xxhash64(x) + b_i) mod (2^31-1)
    with deterministic (seed-derived) a_i, b_i — all JVM expressions.
    ``num_hashes`` min-aggregates are one map-side-combinable groupBy.

    ``shingles`` lets the caller pass precomputed (persisted)
    ``_shingle_rows`` output so LSH + verification share one scan.
    """
    rnd = _lcg(seed)
    params = [(next(rnd) % (_MERSENNE31 - 1) + 1, next(rnd) % _MERSENNE31)
              for _ in range(num_hashes)]

    sh = shingles if shingles is not None else _shingle_rows(
        df, id_col, text_col, n, max_df
    )
    base = F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE31))
    hashed = sh.select(
        id_col,
        *[
            F.pmod(F.lit(a) * base + F.lit(b), F.lit(_MERSENNE31))
            .cast("int")
            .alias(f"h{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        id_col, F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    max_df: int | None = None,
    max_bucket: int = 1000,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    Pipeline: signature → split into ``bands`` bands of r = num_hashes/bands
    rows → band-key equi-join (docs meet only when a whole band matches) →
    candidate pairs → (optionally) verify exact shingle Jaccard and keep
    pairs ≥ threshold. Buckets larger than ``max_bucket`` are discarded
    (near-identical boilerplate floods; the cap converts O(n²) blowup into
    an explicit, logged policy). Output: d1, d2, est_jaccard[, jaccard].
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    # One shingle scan for the whole operator: signatures, doc sizes and
    # the verification join all read this persisted frame (previously the
    # explode+distinct ran twice — ~2× of q31's wall time).
    sh = _shingle_rows(df, id_col, text_col, n, max_df)
    if verify:
        sh = sh.persist()
    sig = minhash_signatures(
        df, id_col, text_col, n, num_hashes, seed, max_df, shingles=sh
    )

    band_rows = sig.select(
        id_col,
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("signature", i * r + j + 1).cast("string")
                                    for j in range(r)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "signature", "band.band_id", "band.band_key")

    # Hot-bucket cap: window count over the bucket key (one shuffle that
    # the pair join below reuses — no aggregate + join-back), drop floods.
    from pyspark.sql import Window

    bw = Window.partitionBy("band_id", "band_key")
    band_rows = (
        band_rows.withColumn("__bsz", F.count(F.lit(1)).over(bw))
        .filter(F.col("__bsz") <= max_bucket)
        .drop("__bsz")
    )

    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            F.col("a.signature").alias("sig1"),
            F.col("b.signature").alias("sig2"),
        )
        .dropDuplicates(["d1", "d2"])
    )
    est = F.aggregate(
        F.zip_with("sig1", "sig2", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    cand = cand.select("d1", "d2", F.round(est, 6).alias("est_jaccard"))

    if not verify:
        return cand

    # Verify candidates with exact shingle Jaccard (only candidate pairs
    # are scored — the LSH join has already bounded the pair count).
    # ``sh`` is the persisted shingle frame computed above.
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col(id_col).alias("d1"), F.col("shingle").alias("s1"))
    sb = sh.select(F.col(id_col).alias("d2"), F.col("shingle").alias("s2"))
    inter = (
        cand.join(sa, "d1")
        .join(sb, "d2")
        .filter(F.col("s1") == F.col("s2"))
        .groupBy("d1", "d2", "est_jaccard")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "est_jaccard", F.round("jaccard", 6).alias("jaccard"))
    )


def _simhash64_impl(texts: pd.Series) -> pd.Series:
    """64-bit SimHash of whitespace-tokenized text (Arrow-batched).

    Token hash = blake2b-64 (deterministic across processes, unlike
    Python's builtin ``hash``). Bit-voting per document is genuinely
    non-relational, so this is the sanctioned pandas-UDF escape hatch
    (SURVEY.md §2.1 M6 ``transform()`` analogue).
    """
    out = []
    for text in texts:
        votes = [0] * 64
        if text:
            for tok in text.split(" "):
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
                    "big",
                )
                for j in range(64):
                    votes[j] += 1 if (h >> j) & 1 else -1
        fp = 0
        for j in range(64):
            if votes[j] > 0:
                fp |= 1 << j
        # to signed 64-bit
        out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
    return pd.Series(out, dtype="int64")


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash int64) per document."""
    # pandas_udf registration requires an active session → wrap lazily.
    udf = pandas_udf(_simhash64_impl, "long")
    return df.select(F.col(id_col), udf(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Banding: split the 64-bit fingerprint into ``max_hamming + 1`` chunks —
    by pigeonhole, any pair within the distance agrees exactly on ≥1 chunk,
    so a chunk-key equi-join finds all such pairs with no cross join.
    Hamming distance is JVM ``bit_count(a XOR b)``.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    fp = simhash_fingerprints(df, id_col, text_col)

    bands = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        (
                            F.shiftright("simhash", i * width)
                            .bitwiseAND(F.lit((1 << width) - 1))
                        ).alias("chunk_key"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk_key")

    from pyspark.sql import Window

    bw = Window.partitionBy("chunk_id", "chunk_key")
    bands = (
        bands.withColumn("__bsz", F.count(F.lit(1)).over(bw))
        .filter(F.col("__bsz") <= max_bucket)
        .drop("__bsz")
    )

    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_key") == F.col("b.chunk_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["d1", "d2"])
    )


def _lcg(seed: int):
    """Deterministic 63-bit LCG (no ``random`` module → reproducible
    across Python versions/processes)."""
    state = seed & ((1 << 63) - 1)
    while True:
        state = (6364136223846793005 * state + 1442695040888963407) & ((1 << 63) - 1)
        yield state
