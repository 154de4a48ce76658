"""Scale-out layout operators: bucketed (co-located) joins and skew
salting.

These are the two levers the DataFrame API doesn't apply automatically
(SURVEY.md §7.3 watch list):

- **Bucketing** pre-shuffles a table ONCE at write time; any later join
  or aggregation on the bucket key reads co-located buckets and skips
  the exchange entirely. At 100 TB this turns every fact⋈fact join on a
  shared key from a full-network shuffle into a local merge.
- **Salting** spreads one pathological hot key over N sub-keys when even
  AQE's skew-join splitting can't help (a single mega-key on BOTH sides
  of the shuffle boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    keys: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``keys`` into ``buckets`` files per
    partition (Spark bucketing metadata requires ``saveAsTable``; pass
    ``path`` to keep the data external). ``sort_cols`` additionally sorts
    within buckets so sort-merge joins skip their sort too.

    Both sides of a future join must use the SAME bucket count and keys
    to get the exchange-free plan (asserted in tests/test_scale.py).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables written via :func:`write_bucketed` on their bucket
    key: with matching bucket specs Catalyst plans a SortMergeJoin with
    ZERO Exchange operators — the co-located join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def _row_salt(cols: list[str], salt_buckets: int, seed: int):
    """Deterministic salt in ``[0, salt_buckets)`` from row content:
    ``pmod(xxhash64(cols..., seed), n)``. Unlike ``F.rand(seed)`` — whose
    draws depend on partition id and intra-partition row order — this is
    a pure function of the row, so the salt survives repartitioning,
    AQE re-planning and task retries bit-for-bit (the same determinism
    doctrine as ``operators/sampling``). Rows identical in ``cols``
    share a salt; salt over columns with per-row entropy (default: all
    of them)."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols], F.lit(seed)),
        F.lit(salt_buckets),
    ).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join with hot-key salting.

    The (large, skewed) ``left`` side gets a deterministic row-content
    salt in ``[0, salt_buckets)`` (see :func:`_row_salt` — retry- and
    repartition-stable, unlike ``F.rand``); the ``right`` side is
    replicated once per salt value (explode over a sequence — cost =
    |right| · salt_buckets rows, so keep the smaller side right). The
    shuffle key becomes (key, salt), spreading a mega-key over
    ``salt_buckets`` reducers. Results are identical to the plain join
    for inner/left joins (every left row still meets every matching
    right row exactly once).

    ``salt_on`` picks the columns hashed for the salt (default: every
    left column). Rows identical in those columns land on one reducer —
    pass a high-entropy subset (e.g. a unique id) when the left side
    carries many fully-duplicate rows.

    Reach for this only when AQE skew splitting
    (``spark.sql.adaptive.skewJoin``) can't break the skew — i.e. the
    hot key is hot on BOTH sides or inside an aggregation feeding the
    join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left (got {how!r}): other kinds "
            "change null-extension semantics under replication"
        )
    salt = _row_salt(salt_on or left.columns, salt_buckets, seed)
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return lhs.join(rhs, [on, "__salt"], how).drop("__salt")
