"""Changelog / upsert table maintenance — Flink's retract-stream and
upsert-sink semantics (the notes' dynamic-table story: a keyed changelog
compacts to its latest row per key; an upsert-kafka-style sink
materializes exactly that).

Spark-first rendering: compaction is ONE ``max_by`` aggregation — a
single keyed shuffle carrying full rows once, no window sort, no join.
The streaming twin is the same aggregate under update output mode (state
= one row per live key), tested equal-to-batch and restart-safe in
``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["upsert_latest", "apply_changelog", "scd2_intervals"]


def _ord_struct(version_col: str, tiebreak: str | None) -> Column:
    cols = [F.col(version_col)]
    if tiebreak:
        cols.append(F.col(tiebreak))
    return F.struct(*cols)


def upsert_latest(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Compact a keyed changelog to its LATEST row per key (upsert
    materialization): for each key, the row with the greatest
    ``version_col`` (ties broken by ``tiebreak`` when given — pass one
    whenever versions can repeat, or the winner is nondeterministic).

    Output: one row per key with the original columns. Scale shape: a
    single ``max_by(struct(payload), struct(version[, tiebreak]))``
    aggregation — map-side partial combine keeps per-partition state at
    one row per key seen, the exchange carries one candidate row per
    (partition, key), and no sort or self-join ever materializes the
    full history per key (the window-rank formulation would sort every
    key group; at 100 TB of CDC history that is the difference between
    a combine-shrunk shuffle and a full-table sort)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    payload = [c for c in df.columns if c not in key_cols]
    if version_col not in df.columns:
        raise ValueError(f"version column {version_col!r} not in frame")
    latest = df.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*payload), _ord_struct(version_col, tiebreak)
        ).alias("__latest")
    )
    return latest.select(
        *key_cols, *[F.col(f"__latest.{c}").alias(c) for c in payload]
    )


def apply_changelog(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    op_col: str = "op",
    delete_ops: tuple[str, ...] = ("D", "-D"),
    tiebreak: str | None = None,
) -> DataFrame:
    """Materialize a changelog WITH delete markers (Flink's retract
    semantics): per key, the latest-versioned row decides — if its op
    is a delete the key vanishes from the materialized table, otherwise
    the row's payload is the current state.

    Same one-aggregation scale shape as :func:`upsert_latest` — the
    delete filter runs on the already-compacted one-row-per-key frame,
    so tombstones cost nothing extra."""
    if op_col not in df.columns:
        raise ValueError(f"op column {op_col!r} not in frame")
    latest = upsert_latest(df, key_cols, version_col, tiebreak)
    return latest.filter(~F.col(op_col).isin(*delete_ops)).drop(op_col)


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak: str | None = None,
    collapse_unchanged: bool = False,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build (r10): turn a keyed
    changelog into VALIDITY INTERVALS — each version row gains
    ``start_col`` (its own version) and ``end_col`` (the NEXT
    version, NULL for the current row). The output is exactly the
    dimension shape :func:`~flink_note_spark.operators.joins.
    temporal_join` consumes for ``FOR SYSTEM_TIME AS OF`` queries.

    ``collapse_unchanged=True`` first drops a version whose payload
    equals its predecessor's (CDC feeds re-emit unchanged rows on
    snapshot; keeping them splits intervals for nothing) — one lag()
    over the payload struct in the same window, so it costs no extra
    shuffle.

    Scale shape: ONE keyed window sort (lag + lead share it) — the
    standard SCD2 build; no join, no second shuffle. Versions must be
    unique per key (pass ``tiebreak`` otherwise, the upsert_latest
    doctrine)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if version_col not in df.columns:
        raise ValueError(f"version column {version_col!r} not in frame")
    for c in (start_col, end_col):
        if c in df.columns:
            raise ValueError(f"output column {c!r} already exists")
    payload = [
        c for c in df.columns
        if c not in key_cols and c not in (version_col, tiebreak)
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        _ord_struct(version_col, tiebreak)
    )
    out = df
    if collapse_unchanged:
        if not payload:
            raise ValueError(
                "collapse_unchanged needs at least one payload column"
            )
        prev = F.lag(F.struct(*payload)).over(w)
        out = out.withColumn(
            "__scd_same",
            prev.isNotNull()
            & (prev.eqNullSafe(F.struct(*payload))),
        ).filter(~F.col("__scd_same")).drop("__scd_same")
        # re-derive the window over the COLLAPSED rows: the next
        # retained version closes the interval
        w = Window.partitionBy(*key_cols).orderBy(
            _ord_struct(version_col, tiebreak)
        )
    return out.withColumn(
        start_col, F.col(version_col)
    ).withColumn(end_col, F.lead(version_col).over(w))
