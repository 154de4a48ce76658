"""Incremental batch replay — stream ANY batch-only operator whose match
set is a LOCAL function of a bounded event-time window.

The native streaming CEP / MATCH_RECOGNIZE engines (``streaming/ops.py``)
cover the shapes whose per-key state can be maintained incrementally;
the documented residue (mixed variants + pruning skips, non-greedy
any-loops, iterative conditions over variants, terminal strict loops)
refuses loudly toward batch. This module closes that residue the honest
way: run the REAL batch operator, incrementally.

Mechanism (log-structured, the ``rollup_stream_start`` doctrine):

1. every micro-batch lands as an immutable epoch directory
   ``{log}/events/epoch={id}`` (replay of an epoch OVERWRITES its own
   directory — idempotent);
2. a per-epoch meta row records the monotone event-time watermark
   ``wm = max(wm_prev, max(batch ts) − delay)``;
3. the batch operator runs over the slice
   ``wm_prev − within < ts ≤ wm_new`` — every match that becomes FINAL
   in this epoch lies wholly inside it, because a match spans at most
   ``within``;
4. only matches whose ``final_expr`` lands in the half-open interval
   ``(wm_prev, wm_new]`` emit — each match emits in exactly one epoch,
   and a retried epoch recomputes the identical interval from identical
   inputs (exactly-once without a transaction log).

Soundness boundary for the RAW :func:`stream_batch_replay_start` API
(enforced, not hoped): the batch operator must be HORIZON-LOCAL — its
matches over the slice equal its matches over the full history
restricted to the emission interval. That holds for non-pruning
after-match semantics (``no_skip`` / ``skip_to_next``, where one match
never suppresses another). PRUNING chains (``skip_past_last_event`` /
``skip_to_first/last``), whose consumed-prefix state reaches
arbitrarily far back, need the CHAINED variant the
:func:`match_pattern_replay_stream` router engages — per-key
epoch-versioned bound snapshots implement the consumption exactly
(:func:`_replay_epoch_chained`).

``final_expr`` is the caller's finality statement in epoch-µs:

- closed patterns: the match's LAST event time (e.g. ``F.col("ts_3")``)
  — final when the watermark passes it (the native engines' rule);
- patterns ending in an OPEN quantifier (the terminal strict loop the
  native engine proves undecidable row-by-row): ``anchor + within``
  (e.g. ``F.col("ts_1") + within_us``) — no extension can fit once the
  watermark passes the anchor's whole window, so the run is maximal at
  horizon close. The pinned counterexample (no PREFIX decision is ever
  final) is about deciding before the window closes; waiting the full
  ``within`` sidesteps it at the documented cost of that much latency;
- patterns ending in a NEGATED step (terminal ``notFollowedBy``) are
  open too: the match asserts ABSENCE through ``anchor + within``, so
  finality at the last positive event would emit phantoms a later
  negating event retracts in batch — use ``anchor + within`` (the
  router does this automatically).

Late data: events at or below the current watermark that arrive later
still land in the log, but matches they complete may have a finality
time at or below an already-advanced watermark — those are dropped,
exactly the semantics every watermarked operator in this repo has.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "stream_batch_replay_start",
    "replay_emissions",
    "match_pattern_replay_stream",
    "match_recognize_replay_stream",
    "retract_stream_start",
    "compact_replay_log",
    "compact_retract_state",
    "retract_state_read",
    "finality_last_event",
    "finality_anchor_within",
    "finality_measure",
]

_LONG_MIN = -(2**63)

_TS_COL = re.compile(r"ts_\d+(_last)?")


def _match_ts_cols(columns: list[str]) -> list[str]:
    """The per-step event-time columns of a CEP match frame
    (``ts_i`` / ``ts_i_last``), excluding loop counts (``n_i``) and
    carried payload columns (``ts_i_<payload>``, which are DOUBLEs)."""
    return [c for c in columns if _TS_COL.fullmatch(c)]


def finality_last_event(ts_cols: list[str]) -> Column:
    """CLOSED-pattern finality strategy: the match's LAST bound event
    time in epoch-µs — ``greatest`` over the per-step time columns,
    absent optional branches coalesced to −∞ so they never win. Final
    once the watermark passes it (the native engines' rule)."""
    if not ts_cols:
        raise ValueError("finality_last_event needs at least one ts column")
    parts = [
        F.coalesce(F.unix_micros(F.col(c).cast("timestamp")), F.lit(_LONG_MIN))
        for c in ts_cols
    ]
    return parts[0] if len(parts) == 1 else F.greatest(*parts)


def finality_anchor_within(ts_cols: list[str], within: str) -> Column:
    """OPEN-terminal finality strategy (loop / optional / times-range /
    trailing negation): the match's FIRST BOUND event + ``within`` —
    no extension can fit once the watermark passes the anchor's whole
    window. The anchor is ``least`` over the per-step time columns
    (``least`` skips NULLs), NOT ``ts_1`` alone: variant expansion
    yields ``ts_1 = NULL`` when an optional first step is absent, and a
    NULL finality would silently drop those matches (ADVICE r10)."""
    if not ts_cols:
        raise ValueError("finality_anchor_within needs at least one ts column")
    within_us = _parse_delay_us(within)
    parts = [F.unix_micros(F.col(c).cast("timestamp")) for c in ts_cols]
    anchor = parts[0] if len(parts) == 1 else F.least(*parts)
    return anchor + within_us


def finality_measure(col: str) -> Column:
    """MEASURE finality strategy (MATCH_RECOGNIZE): a timestamp the
    query itself projects (e.g. a ``LAST(ts)`` / ``P.ts`` measure),
    converted to epoch-µs."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _require_checkpoint(checkpoint: str | None, fn: str) -> None:
    """Every epoch-log writer keys its idempotent-overwrite design on
    STABLE ``foreachBatch`` epoch ids. A restart without a checkpoint
    restarts ids at 0 and reprocesses the source from scratch, leaving
    stale higher-numbered epoch directories that the log readers merge
    into duplicated or corrupt output — so a checkpoint is REQUIRED
    (ADVICE r10). To intentionally restart fresh, wipe the log
    directory AND pass a new checkpoint path."""
    if not checkpoint:
        raise ValueError(
            f"{fn} requires checkpoint= — epoch-log exactly-once relies "
            f"on stable foreachBatch epoch ids across restarts; a "
            f"checkpoint-less restart would renumber epochs from 0 and "
            f"corrupt the log (wipe log_path AND use a fresh checkpoint "
            f"to start over)"
        )


def _parse_delay_us(text: str) -> int:
    from flink_note_spark.streaming.ops import _parse_duration_ms

    return _parse_duration_ms(text) * 1_000


def _prev_wm(spark: SparkSession, meta_path: str, epoch_id: int) -> int:
    """Greatest recorded watermark of any epoch BEFORE this one (a
    retried epoch must exclude its own stale meta)."""
    try:
        meta = spark.read.parquet(meta_path)
    except Exception:
        return _LONG_MIN
    row = (
        meta.filter(F.col("epoch") < epoch_id)
        .agg(F.max("wm_us").alias("w"))
        .first()
    )
    return _LONG_MIN if row is None or row.w is None else int(row.w)


def _default_sink(log_path: str) -> Callable[[DataFrame | None, int], None]:
    """Epoch-overwriting parquet emitter at ``{log}/out/epoch={id}`` —
    the layout :func:`replay_emissions` reads."""

    def sink(df: DataFrame | None, epoch_id: int) -> None:
        if df is not None:
            df.write.mode("overwrite").parquet(f"{log_path}/out/epoch={epoch_id}")

    return sink


def _land_batch(
    batch_df: DataFrame,
    epoch_id: int,
    time_col: str,
    log_path: str,
    delay_us: int,
) -> tuple[SparkSession, int, int]:
    """Persist the batch as an epoch, advance the monotone watermark,
    record meta; returns (spark, wm_prev, wm_new)."""
    spark = batch_df.sparkSession
    batch_df.write.mode("overwrite").parquet(
        f"{log_path}/events/epoch={epoch_id}"
    )
    wm_prev = _prev_wm(spark, f"{log_path}/meta", epoch_id)
    mx = batch_df.agg(
        F.max(F.unix_micros(F.col(time_col).cast("timestamp"))).alias("m")
    ).first()
    batch_wm = _LONG_MIN if mx is None or mx.m is None else int(mx.m) - delay_us
    wm_new = max(wm_prev, batch_wm)
    spark.createDataFrame(
        [(epoch_id, wm_new)], "epoch long, wm_us long"
    ).write.mode("overwrite").parquet(f"{log_path}/meta/epoch={epoch_id}")
    return spark, wm_prev, wm_new


def _log_slice(
    spark: SparkSession,
    log_path: str,
    time_col: str,
    wm_prev: int,
    wm_new: int,
    lookback_us: int,
) -> DataFrame:
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    cond = t_us <= wm_new
    if wm_prev != _LONG_MIN:  # first epoch: lower bound is -infinity
        cond = cond & (t_us > wm_prev - lookback_us)
    return spark.read.parquet(f"{log_path}/events").drop("epoch").filter(cond)


def _replay_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    *,
    batch_op: Callable[[DataFrame], DataFrame],
    final_expr: Column,
    time_col: str,
    log_path: str,
    within_us: int,
    delay_us: int,
    sink: Callable[[DataFrame, int], None],
) -> None:
    """One epoch of the replay loop — module-level so tests can drive
    it directly (including double invocation for the retry contract)."""
    spark, wm_prev, wm_new = _land_batch(
        batch_df, epoch_id, time_col, log_path, delay_us
    )
    if wm_new <= wm_prev:
        sink(None, epoch_id)  # nothing can be newly final
        return
    slice_df = _log_slice(spark, log_path, time_col, wm_prev, wm_new, within_us)
    matches = batch_op(slice_df)
    fin = final_expr.alias("__final_us")
    emit = (
        matches.select("*", fin)
        .filter((F.col("__final_us") > wm_prev) & (F.col("__final_us") <= wm_new))
        .drop("__final_us")
    )
    sink(emit, epoch_id)


def _prev_bounds(spark: SparkSession, log_path: str, epoch_id: int):
    """Per-key chain bounds as of the latest epoch before this one
    (epoch-versioned snapshots — the retract-state pattern)."""
    try:
        meta = spark.read.parquet(f"{log_path}/bound_meta")
    except Exception:
        return None
    row = (
        meta.filter(F.col("epoch") < epoch_id).agg(F.max("epoch").alias("e")).first()
    )
    if row is None or row.e is None:
        return None
    return spark.read.parquet(f"{log_path}/bounds/epoch={int(row.e)}").drop("epoch")


def _replay_epoch_chained(
    batch_df: DataFrame,
    epoch_id: int,
    *,
    batch_op: Callable[[DataFrame], DataFrame],
    end_expr: Column,
    thr_expr: Column,
    strict_after: bool,
    key_col: str,
    time_col: str,
    log_path: str,
    within_us: int,
    delay_us: int,
    sink: Callable[[DataFrame, int], None],
) -> None:
    """One epoch of PRUNING-strategy replay: the per-key consumed-prefix
    chain state is a single threshold timestamp (`bound_us`), persisted
    as epoch-versioned snapshots. Soundness:

    - event filtering implements consumption exactly — a match's events
      all lie at/after its anchor, so dropping events at/below the bound
      removes precisely the matches the chain already pruned and never
      changes a surviving match's bindings (even under relaxed
      earliest-successor semantics, a successor below the bound would
      imply an anchor below the bound);
    - a match's chain decision is stable once ``end + within ≤ wm``:
      any match that could precede it in completion order has
      ``end' ≤ end``, hence ``anchor' + within ≤ end' + within ≤ wm`` —
      decided (this also covers open-terminal runs, whose computed end
      cannot be extended by any event beyond ``anchor + within``);
    - so emission keys on ``τ = end + within`` ∈ (wm_prev, wm_new], the
      slice reaches back ``2·within`` (start > τ − 2·within), and the
      new bound is the max emitted threshold (thresholds are monotone
      along the chain), merged with the previous bound per key."""
    spark, wm_prev, wm_new = _land_batch(
        batch_df, epoch_id, time_col, log_path, delay_us
    )
    if wm_new <= wm_prev:
        sink(None, epoch_id)
        return
    slice_df = _log_slice(
        spark, log_path, time_col, wm_prev, wm_new, 2 * within_us
    )
    bounds = _prev_bounds(spark, log_path, epoch_id)
    if bounds is not None:
        t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
        keep = F.col("__bound_us").isNull() | (
            (t_us > F.col("__bound_us"))
            if strict_after
            else (t_us >= F.col("__bound_us"))
        )
        slice_df = (
            slice_df.join(
                F.broadcast(bounds.withColumnRenamed("bound_us", "__bound_us")),
                key_col,
                "left",
            )
            .filter(keep)
            .drop("__bound_us")
        )
    matches = batch_op(slice_df)
    tau = (end_expr + within_us).alias("__tau")
    emit = (
        matches.select("*", tau, thr_expr.alias("__thr_us"))
        .filter((F.col("__tau") > wm_prev) & (F.col("__tau") <= wm_new))
    )
    # the batch CEP plan is the epoch's dominant cost — materialize it
    # once for both the bounds aggregation and the sink
    emit = emit.persist()
    try:
        new_bounds = emit.groupBy(key_col).agg(
            F.max("__thr_us").alias("bound_us")
        )
        if bounds is not None:
            new_bounds = (
                bounds.unionByName(new_bounds)
                .groupBy(key_col)
                .agg(F.max("bound_us").alias("bound_us"))
            )
        new_bounds.write.mode("overwrite").parquet(
            f"{log_path}/bounds/epoch={epoch_id}"
        )
        spark.createDataFrame([(epoch_id,)], "epoch long").write.mode(
            "overwrite"
        ).parquet(f"{log_path}/bound_meta/epoch={epoch_id}")
        sink(emit.drop("__tau", "__thr_us"), epoch_id)
    finally:
        emit.unpersist()


def stream_batch_replay_start(
    stream: DataFrame,
    batch_op: Callable[[DataFrame], DataFrame],
    final_expr: Column,
    time_col: str,
    log_path: str,
    within: str,
    watermark: str = "5 minutes",
    sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Stream a horizon-local batch operator by incremental replay.

    ``batch_op(events_slice) -> matches`` is the UNMODIFIED batch
    operator (e.g. a ``match_pattern``/``match_recognize`` closure);
    ``final_expr`` names each match's finality time in epoch-µs (see
    module docstring for the closed vs open-terminal rule); ``within``
    must equal (or dominate) the pattern's own window — it bounds both
    the slice and the open-terminal finality. ``sink`` receives each
    epoch's newly-final matches (``None`` when the watermark did not
    advance); the default sink lands them at ``{log}/out/epoch={id}``
    for ``replay_emissions`` to read. Returns the ``StreamingQuery``.

    Cost model at scale: every epoch re-reads the log slice of width
    ``within + delay + batch span`` and re-runs the batch plan over it —
    O(active window), not O(history); the log itself grows until
    compacted — :func:`compact_replay_log` drops epoch directories
    wholly below ``wm − within − delay`` (immutable-file bookkeeping,
    run it between batches or from a cron). ``compact_every=N`` (r11)
    makes the log SELF-MAINTAINING: every N-th epoch runs the
    compaction inline after its emission — only provably-dead epochs
    drop, so retries and restarts are unaffected."""
    within_us = _parse_delay_us(within)
    delay_us = _parse_delay_us(watermark)
    if time_col not in stream.columns:
        raise ValueError(f"time column {time_col!r} not in the stream")
    _require_checkpoint(checkpoint, "stream_batch_replay_start")

    if sink is None:
        sink = _default_sink(log_path)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        _replay_epoch(
            batch_df,
            epoch_id,
            batch_op=batch_op,
            final_expr=final_expr,
            time_col=time_col,
            log_path=log_path,
            within_us=within_us,
            delay_us=delay_us,
            sink=sink,
        )
        if compact_every and epoch_id % compact_every == compact_every - 1:
            compact_replay_log(
                batch_df.sparkSession, log_path, within, watermark, time_col
            )

    writer = stream.writeStream.foreachBatch(_process).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def replay_emissions(spark: SparkSession, log_path: str) -> DataFrame:
    """All matches emitted so far by the default sink (union of the
    epoch output directories; each match appears exactly once)."""
    return spark.read.parquet(f"{log_path}/out").drop("epoch")


def compact_replay_log(
    spark: SparkSession,
    log_path: str,
    within: str,
    watermark: str = "5 minutes",
    time_col: str = "ts",
) -> dict:
    """Drop event-epoch directories that can no longer contribute to
    any future emission: an epoch whose MAX event time is at or below
    ``wm − within − delay`` lies wholly outside every future slice
    (slices start above ``wm_prev − within``, and ``wm_prev`` only
    grows). Meta directories for dropped epochs are kept — the
    watermark chain must stay monotone across a restart.

    Safe to run between micro-batches or from a cron; returns
    ``{"epochs_total": n, "epochs_dropped": m, "wm_us": wm}``. Uses
    driver-side directory removal (O(files) bookkeeping on immutable
    dirs — the same operation a table format's vacuum performs).

    The floor is ``wm − 2·within − delay``: the pruning-strategy replay
    path slices back ``2·within`` (matches pend one extra ``within``
    for chain decisions), and using the deeper floor unconditionally
    keeps compaction safe for BOTH paths at the cost of one extra
    ``within`` of retained log.

    Retry fence (r11): the floor watermark EXCLUDES the newest epoch's
    meta — a crash between that epoch's foreachBatch and its commit
    replays it against the PREVIOUS watermark, whose slice may reach
    below a floor that counted the new (possibly far-jumped) watermark.
    Using the second-newest watermark keeps every possible retry's
    slice intact, which is also what makes the inline
    ``compact_every`` hook safe."""
    import shutil

    within_us = _parse_delay_us(within)
    delay_us = _parse_delay_us(watermark)
    events_path = f"{log_path}/events"
    try:
        meta = spark.read.parquet(f"{log_path}/meta")
        top = meta.agg(F.max("epoch").alias("m")).first()
    except Exception:
        top = None
    newest = None if top is None or top.m is None else int(top.m)
    out = {"epochs_total": 0, "epochs_dropped": 0, "wm_us": _LONG_MIN}
    if newest is None:
        return out
    wm = _prev_wm(spark, f"{log_path}/meta", newest)
    out["wm_us"] = wm
    if wm == _LONG_MIN:
        return out
    floor = wm - 2 * within_us - delay_us
    events = spark.read.parquet(events_path)
    if time_col not in events.columns:
        raise ValueError(f"time column {time_col!r} not in the event log")
    per_epoch = events.groupBy("epoch").agg(
        F.max(F.unix_micros(F.col(time_col).cast("timestamp"))).alias("mx")
    )
    rows = per_epoch.collect()
    out["epochs_total"] = len(rows)
    for r in rows:
        if r.mx is not None and int(r.mx) <= floor:
            shutil.rmtree(f"{events_path}/epoch={r.epoch}", ignore_errors=True)
            out["epochs_dropped"] += 1
    return out


def suggest_state_buckets(
    live_keys: int,
    keys_per_epoch: int,
    max_bucket_keys: int = 1_000_000,
    max_buckets: int = 4096,
) -> int:
    """Size ``retract_stream_start``'s ``state_buckets`` from observed
    workload shape (r12 — VERDICT r11 #8: the bucketed-state win
    evaporates for uniform large batches, and a user who guesses
    configures themselves onto BASELINE's measured 91 s full-rewrite
    line). The bucket count is part of the persisted hash layout — it
    CANNOT change once the log exists — so size it up front from the
    expected steady state and re-log (not re-configure) if the shape
    changes an order of magnitude.

    ``live_keys``: expected total distinct keys the aggregate holds.
    ``keys_per_epoch``: expected distinct keys per micro-batch.

    Two regimes (the BASELINE probe's physics):

    - **Uniform large batches** (``keys_per_epoch`` within 2× of
      ``live_keys``): every hash layout rewrites ~all live keys per
      epoch — the Delta/Hudi-merge physics; extra buckets are pure
      metadata overhead (the reader's bucket-resolution scan is
      O(epochs × buckets) driver-side). Buckets exist only so one
      bucket's keys fit an executor: ``ceil(live / max_bucket_keys)``.
    - **Hot-key batches** (``keys_per_epoch ≪ live_keys``): epoch I/O
      ≈ touched_buckets × live/B, so more buckets help until
      collisions stop mattering — ``B = 4 × keys_per_epoch`` makes a
      batch key's bucket-collision probability ≤ ~22 % (1−(1−1/B)^k),
      keeping touched ≈ distinct keys; floored at the executor-fit
      count, capped at ``max_buckets`` (the metadata-scan bound).

    Pure arithmetic — call it with numbers you measured (e.g.
    ``approx_count_distinct`` over a sample window), not guesses.
    """
    if live_keys < 1 or keys_per_epoch < 1:
        raise ValueError(
            "live_keys and keys_per_epoch must be >= 1 (measure them; "
            f"got {live_keys}, {keys_per_epoch})"
        )
    if max_bucket_keys < 1 or max_buckets < 1:
        raise ValueError("max_bucket_keys and max_buckets must be >= 1")
    fit = -(-live_keys // max_bucket_keys)  # ceil
    if 2 * keys_per_epoch >= live_keys:
        return max(1, min(fit, max_buckets))
    return max(1, min(max_buckets, max(fit, 4 * keys_per_epoch)))


def retract_stream_start(
    agg_stream: DataFrame,
    key_cols: list[str],
    log_path: str,
    checkpoint: str | None = None,
    trigger: dict | None = None,
    sink: Callable[[DataFrame, int], None] | None = None,
    state_buckets: int = 64,
    delete_where=None,
    compact_every: int | None = None,
):
    """Flink's ``toRetractStream`` for an UPDATE-mode streaming
    aggregate: emit an op-tagged changelog (``+I`` first value for a
    key, ``-U`` old / ``+U`` new on change, ``-D`` on deletion) that a
    downstream ``apply_changelog`` consumer reconstructs the aggregate
    from — round-trip pinned in tests (changelog → materialize ==
    batch agg).

    Mechanism (the epoch-log doctrine): per micro-batch, the updated
    rows diff against the previous state, the op rows land at
    ``{log}/out/epoch={id}``, and the new state writes as this epoch's
    snapshot — every write OVERWRITES its own epoch directory, and the
    diff reads only epochs strictly before this one, so a retried epoch
    reproduces identical output (exactly-once).

    State is HASH-BUCKETED (r11, VERDICT r10 #2): keys shard into
    ``state_buckets`` via ``pmod(xxhash64(keys))`` and each epoch
    writes ``{log}/state/epoch={id}/bucket={b}`` ONLY for buckets
    containing keys present in the batch; ``{log}/state_meta`` records
    ``(epoch, bucket)`` rows and the reader resolves, per touched
    bucket, the latest strictly-earlier epoch that wrote it. Per-epoch
    state I/O is therefore O(keys living in touched buckets), not
    O(all live keys) — the structural fix for billions of keys (size
    ``state_buckets`` so one bucket's keys fit an executor; the
    ``minhash_index`` bucketing doctrine). Untouched buckets are never
    read or rewritten. Size it with :func:`suggest_state_buckets`
    (r12) from measured live-key / per-epoch-key counts — the count is
    part of the persisted layout and cannot change later, and uniform
    large batches rewrite ~all live keys under ANY count (BASELINE's
    91 s line), where only executor-fit sizing matters.

    ``delete_where`` (r11, VERDICT r10 #3) completes the changelog
    alphabet: an aggregate row matching the predicate (SQL string or
    Column, evaluated on the batch row; NULL → not a delete) is a
    TOMBSTONE — the key's previous value emits as ``-D`` and the key
    leaves the state (a tombstone for a key never seen emits nothing).
    Spark update-mode aggregates never delete on their own, so the
    predicate is how TTL/sentinel deletions enter the stream (e.g. a
    count column driven to a sentinel, or an expiry flag the aggregate
    computes)."""
    _require_checkpoint(checkpoint, "retract_stream_start")
    if state_buckets < 1:
        raise ValueError(f"state_buckets must be >= 1, got {state_buckets}")
    val_cols: list[str] | None = None
    bucket_expr = F.pmod(F.xxhash64(*key_cols), F.lit(state_buckets)).cast(
        "int"
    )
    del_cond = None
    if delete_where is not None:
        del_cond = (
            F.expr(delete_where) if isinstance(delete_where, str) else delete_where
        )

    def _prev_state(spark: SparkSession, epoch_id: int, touched: list[int]):
        """Union of the latest strictly-earlier snapshot of each
        TOUCHED bucket (None when no touched bucket has state). The
        bucket→epoch resolution is an O(epochs·buckets) metadata read
        collected driver-side — the manifest-pruning cost model."""
        if not touched:
            return None
        try:
            meta = spark.read.parquet(f"{log_path}/state_meta")
        except Exception:
            return None
        rows = (
            meta.filter(
                (F.col("epoch") < epoch_id) & F.col("bucket").isin(touched)
            )
            .groupBy("bucket")
            .agg(F.max("epoch").alias("e"))
            .collect()
        )
        if not rows:
            return None
        parts = []
        for r in rows:
            try:
                parts.append(
                    spark.read.parquet(
                        f"{log_path}/state/epoch={int(r.e)}/bucket={int(r.bucket)}"
                    )
                )
            except Exception:
                # meta records the bucket as WRITTEN by that epoch but
                # partitionBy drops empty partitions: every key in the
                # bucket was deleted there. The (epoch, bucket) meta
                # row must still exist — it shadows older epochs'
                # copies of the deleted keys — and reads as empty.
                pass
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        nonlocal val_cols
        spark = batch_df.sparkSession
        if val_cols is None:
            val_cols = [c for c in batch_df.columns if c not in key_cols]
        upd_all = batch_df.dropDuplicates(key_cols)  # update mode: 1 row/key
        if del_cond is not None:
            is_del = F.coalesce(del_cond.cast("boolean"), F.lit(False))
            dels = upd_all.filter(is_del).select(*key_cols)
            upd = upd_all.filter(~is_del)
        else:
            dels, upd = None, upd_all
        touched = sorted(
            r.b
            for r in upd_all.select(bucket_expr.alias("b")).distinct().collect()
        )
        prev = _prev_state(spark, epoch_id, touched)
        if prev is None:
            out = upd.select(F.lit("+I").alias("op"), "*")
            state = upd
        else:
            old = prev.select(
                *key_cols,
                F.lit(1).alias("__present"),
                *[F.col(c).alias(f"__old_{c}") for c in val_cols],
            )
            j = upd.join(old, key_cols, "left")
            news = F.struct(*[F.col(c) for c in val_cols])
            olds = F.struct(*[F.col(f"__old_{c}") for c in val_cols])
            is_new = F.col("__present").isNull()
            changed = j.filter(is_new | ~news.eqNullSafe(olds))
            ins = changed.filter(is_new).select(
                F.lit("+I").alias("op"), *key_cols, *val_cols
            )
            ret = changed.filter(~is_new).select(
                F.lit("-U").alias("op"),
                *key_cols,
                *[F.col(f"__old_{c}").alias(c) for c in val_cols],
            )
            new = changed.filter(~is_new).select(
                F.lit("+U").alias("op"), *key_cols, *val_cols
            )
            out = ins.unionByName(ret).unionByName(new)
            gone = upd.select(*key_cols)
            if dels is not None:
                dl = prev.join(dels, key_cols, "semi").select(
                    F.lit("-D").alias("op"), *key_cols, *val_cols
                )
                out = out.unionByName(dl)
                gone = gone.unionByName(dels)
            state = prev.join(gone, key_cols, "anti").unionByName(upd)
        _emit(out, epoch_id)
        # only touched buckets rewrite; partitionBy lays them out as
        # state/epoch={id}/bucket={b} in one write
        state.withColumn("bucket", bucket_expr).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(f"{log_path}/state/epoch={epoch_id}")
        spark.createDataFrame(
            [(epoch_id, int(b)) for b in touched], "epoch long, bucket int"
        ).write.mode("overwrite").parquet(
            f"{log_path}/state_meta/epoch={epoch_id}"
        )
        if compact_every and epoch_id % compact_every == compact_every - 1:
            compact_retract_state(spark, log_path)

    if sink is None:

        def _emit(df: DataFrame, epoch_id: int) -> None:
            df.write.mode("overwrite").parquet(f"{log_path}/out/epoch={epoch_id}")

    else:
        _emit = sink

    writer = agg_stream.writeStream.foreachBatch(_process).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def match_pattern_replay_stream(
    stream: DataFrame,
    pattern,
    log_path: str,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    watermark: str = "5 minutes",
    contiguity: str | None = None,
    skip_strategy: str | None = None,
    carry_payload: dict[str, list[str]] | None = None,
    sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Stream ANY batch-supported CEP pattern by incremental replay —
    the convenience router over :func:`stream_batch_replay_start` that
    derives the batch closure and the finality expression itself.

    Finality: a pattern ending in a PLAIN step is final at its last
    event time (``greatest`` over the per-step time columns, absent
    optional branches coalesced away); a pattern ending in an OPEN
    quantifier (loop / optional / times-range) is final at
    ``anchor + within`` — which is why ``within`` is REQUIRED here (it
    also bounds the replay slice).

    PRUNING skip strategies (``skip_past_last_event`` /
    ``skip_to_first/last:i``) stream too (late-r10): the chain's
    consumed-prefix state is ONE threshold timestamp per key, carried
    as epoch-versioned bound snapshots; events at/below the bound are
    filtered before the batch kernel runs (equivalent to consumption —
    see :func:`_replay_epoch_chained`), matches hold pending until
    ``end + within ≤ wm`` so every potentially-preceding chain member
    has decided, at the documented cost of up to one extra ``within``
    of latency (the native engine's pend rule).
    """
    from flink_note_spark.operators.cep import (
        Pattern,
        _expand_group_variants,
        _normalize,
        _out_cols,
        _parse_skip,
    )

    if isinstance(pattern, Pattern):
        # builder fields are defaults, explicit arguments win — the
        # match_pattern / match_pattern_stream resolution rule
        if contiguity is None and pattern.contiguity is not None:
            contiguity = pattern.contiguity
        if within is None:
            within = pattern.within_
        if skip_strategy is None:
            skip_strategy = pattern.skip_
    if within is None:
        raise ValueError(
            "match_pattern_replay_stream requires within= — it bounds "
            "both the replay slice and open-terminal finality"
        )
    skip = _parse_skip(skip_strategy)
    pruning = skip is not None and skip[0] not in ("no_skip", "skip_to_next", "greedy")
    from flink_note_spark.operators.cep import (
        _loop_group_entries,
        _loop_group_template,
    )

    loop_entries = _loop_group_entries(pattern)
    if loop_entries is not None:
        # group one_or_more (r12): the batch operator expands it to the
        # data-implied within-bound per epoch; the COLLAPSED geometry
        # makes the schema epoch-stable, and terminality reads off the
        # collapsed template (a terminal loop group is a terminal loop
        # step — horizon-open)
        if pruning:
            raise ValueError(
                "skip strategies over group loops are unsupported (the "
                "batch operator refuses them too — the union of "
                "repetition counts has no single positional geometry)"
            )
        grp = None
        steps = _loop_group_template(loop_entries)
    else:
        grp = _expand_group_variants(pattern)
    if grp is not None:
        variants, _pm, template = grp
        if pruning and len(variants) > 1:
            raise ValueError(
                "skip strategies over RANGED/optional group patterns "
                "are unsupported (the batch operator refuses them too "
                "— the pruning chain needs one positional geometry)"
            )
        # finality/terminality read off the max-count template; each
        # union row is final at its OWN last bound event (rows never
        # extend — longer counts are separate rows)
        steps = template
    elif loop_entries is None:
        steps = _normalize(pattern)
    last = [s for s in steps if not s.negate][-1]
    # a trailing NEGATED step (notFollowedBy) is also horizon-open: the
    # match asserts ABSENCE in (last_pos, anchor + within], which only
    # the watermark passing anchor + within can confirm — finality at
    # the last positive event would emit a phantom match that a
    # negating event arriving later (but above the old watermark)
    # would retract in batch
    terminal_open = bool(
        last.loop
        or last.optional
        or last.times_max is not None
        or steps[-1].negate
    )
    within_us = _parse_delay_us(within)

    def batch_op(events: DataFrame) -> DataFrame:
        from flink_note_spark.operators.cep import match_pattern

        return match_pattern(
            events,
            pattern,
            key_col=key_col,
            time_col=time_col,
            type_col=type_col,
            within=within,
            contiguity=contiguity,
            skip_strategy=skip_strategy,
            carry_payload=carry_payload,
        )

    def final_expr_for(matches: DataFrame) -> Column:
        ts_cols = _match_ts_cols(matches.columns)
        if terminal_open:
            return finality_anchor_within(ts_cols, within)
        return finality_last_event(ts_cols)

    # probe the batch output schema on an empty frame to fix final_expr
    empty = stream.sparkSession.createDataFrame([], stream.schema)
    probe_out = batch_op(empty)
    final_expr = final_expr_for(probe_out)

    if not pruning:
        return stream_batch_replay_start(
            stream,
            batch_op,
            final_expr,
            time_col,
            log_path,
            within=within,
            watermark=watermark,
            sink=sink,
            checkpoint=checkpoint,
            trigger=trigger,
            compact_every=compact_every,
        )

    # pruning path: end/threshold exprs from the batch output schema
    out_cols = _out_cols(steps)
    ts_cols = _match_ts_cols(out_cols)
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    end_expr = finality_last_event(ts_cols)
    kind, step_i = skip
    if kind == "skip_past_last_event":
        thr_expr, strict_after = end_expr, True
    else:
        n_pos = sum(1 for s in steps if not s.negate)
        if step_i is None or not (1 <= step_i <= n_pos):
            raise ValueError(
                f"{kind} step index must be in 1..{n_pos} "
                f"(1-based positive-step index), got {step_i}"
            )
        base, last = f"ts_{step_i}", f"ts_{step_i}_last"
        col = last if (kind == "skip_to_last" and last in out_cols) else base
        thr_expr, strict_after = us(col), False
    within_us_i = within_us
    delay_us = _parse_delay_us(watermark)
    _require_checkpoint(checkpoint, "match_pattern_replay_stream")

    if sink is None:
        sink = _default_sink(log_path)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        _replay_epoch_chained(
            batch_df,
            epoch_id,
            batch_op=batch_op,
            end_expr=end_expr,
            thr_expr=thr_expr,
            strict_after=strict_after,
            key_col=key_col,
            time_col=time_col,
            log_path=log_path,
            within_us=within_us_i,
            delay_us=delay_us,
            sink=sink,
        )
        if compact_every and epoch_id % compact_every == compact_every - 1:
            compact_replay_log(
                batch_df.sparkSession, log_path, within, watermark, time_col
            )

    writer = stream.writeStream.foreachBatch(_process).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def match_recognize_replay_stream(
    stream: DataFrame,
    *,
    log_path: str,
    partition_by: str,
    order_by: str,
    pattern: str,
    define: dict | None = None,
    measures: dict[str, str] | None = None,
    after_match: str = "skip past last row",
    within: str | None = None,
    watermark: str = "5 minutes",
    rows_per_match: str = "one row per match",
    subset: dict | None = None,
    tiebreak: list[str] | None = None,
    sink: Callable[[DataFrame, int], None] | None = None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
    compact_every: int | None = None,
):
    """Stream ANY batch-supported ``MATCH_RECOGNIZE`` query by
    incremental replay — the MR twin of
    :func:`match_pattern_replay_stream`, closing the native-engine
    refusals (ALL ROWS PER MATCH, non-numeric payload measures,
    non-disjoint quantifiers under pruning AFTER MATCH, …) at the
    documented extra-``within`` latency. NEXT() navigation stays
    refused HERE TOO — see the in-function error text for the
    horizon-locality argument; PREV resolves within the replay slice
    (the native greedy engine's window-bounded navigation semantics),
    which can differ from batch only when a PREV reference reaches
    further than ``within`` behind the previous watermark.

    Finality cannot come from the user's MEASURES (they need not
    project any time at all): the router INJECTS per-variable
    ``FIRST/LAST(V.<order_by>)`` measures, derives finality / chain
    thresholds from them, and drops them before the sink —

    - last variable unquantified / ``{n}``-exact → CLOSED: final at the
      match's last row (greatest of the injected LASTs);
    - last variable ``+ * ? {n,m}`` → OPEN: final at first bound row +
      ``within`` (the terminal-run horizon rule);
    - AFTER MATCH SKIP PAST LAST ROW / SKIP TO FIRST|LAST V are PRUNING
      chains → the epoch-versioned bound path
      (:func:`_replay_epoch_chained`), threshold = match end / the
      referenced variable's injected first/last time.

    ``within`` is REQUIRED (slice + open-terminal finality bound).
    Output schema equals the batch operator's exactly (timestamps, any
    payload type, ALL ROWS PER MATCH row geometry)."""
    from flink_note_spark.operators.match_recognize import (
        _parse_after_match,
        _parse_pattern,
        _quant_step,
        match_recognize,
    )

    if within is None:
        raise ValueError(
            "match_recognize_replay_stream requires within= — it bounds "
            "both the replay slice and open-terminal finality"
        )
    _require_checkpoint(checkpoint, "match_recognize_replay_stream")
    parsed = _parse_pattern(pattern)
    names = [v for v, _q, _r in parsed]
    var_index = {v: k for k, v in enumerate(names, start=1)}
    from flink_note_spark.operators.match_recognize import _rewrite_nav

    _, navs = _rewrite_nav(dict(define or {}), var_index)
    if any(d == "next" for d, _n, _c in navs):
        raise ValueError(
            "NEXT(...) navigation cannot stream, not even by replay: "
            "the physical successor row has no event-time bound, so a "
            "match's verdict can change after ANY watermark, and the "
            "match's own events can age out of the replay slice before "
            "the successor arrives (not horizon-local). Evaluate "
            "NEXT-navigating queries in batch; PREV streams (it "
            "resolves within the replay slice, like the native greedy "
            "engine's window-bounded navigation)."
        )
    skip = _parse_after_match(after_match, var_index)
    pruning = skip not in ("no_skip", "skip_to_next")
    last_step = _quant_step(*parsed[-1][:2], None)
    terminal_open = bool(
        last_step.loop or last_step.optional or last_step.times_max is not None
    )

    # injected time measures — FIRST/LAST of order_by per variable
    # (FINAL semantics; NULL when an absent-able variable is absent)
    inj = {}
    for v, k in var_index.items():
        inj[f"__rts_f{k}"] = f"FIRST({v}.{order_by})"
        inj[f"__rts_l{k}"] = f"LAST({v}.{order_by})"
    user_measures = dict(measures or {})
    clash = set(user_measures) & set(inj)
    if clash:
        raise ValueError(f"measure names collide with router internals: {sorted(clash)}")

    def batch_op(events: DataFrame) -> DataFrame:
        return match_recognize(
            events,
            partition_by=partition_by,
            order_by=order_by,
            pattern=pattern,
            define=define,
            measures={**user_measures, **inj},
            after_match=after_match,
            within=within,
            tiebreak=tiebreak,
            rows_per_match=rows_per_match,
            subset=subset,
        )

    first_cols = [f"__rts_f{k}" for k in sorted(var_index.values())]
    last_cols = [f"__rts_l{k}" for k in sorted(var_index.values())]
    end_expr = finality_last_event(last_cols)
    final_expr = (
        finality_anchor_within(first_cols, within)
        if terminal_open
        else end_expr
    )

    inner_sink = sink if sink is not None else _default_sink(log_path)

    def drop_sink(df: DataFrame | None, epoch_id: int) -> None:
        inner_sink(None if df is None else df.drop(*inj), epoch_id)

    if not pruning:
        return stream_batch_replay_start(
            stream,
            batch_op,
            final_expr,
            order_by,
            log_path,
            within=within,
            watermark=watermark,
            sink=drop_sink,
            checkpoint=checkpoint,
            trigger=trigger,
            compact_every=compact_every,
        )

    if skip == "skip_past_last_event":
        thr_expr, strict_after = end_expr, True
    else:
        kind, k = skip
        col = f"__rts_f{k}" if kind == "skip_to_first" else f"__rts_l{k}"
        thr_expr, strict_after = finality_measure(col), False
    within_us = _parse_delay_us(within)
    delay_us = _parse_delay_us(watermark)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        _replay_epoch_chained(
            batch_df,
            epoch_id,
            batch_op=batch_op,
            end_expr=end_expr,
            thr_expr=thr_expr,
            strict_after=strict_after,
            key_col=partition_by,
            time_col=order_by,
            log_path=log_path,
            within_us=within_us,
            delay_us=delay_us,
            sink=drop_sink,
        )
        if compact_every and epoch_id % compact_every == compact_every - 1:
            compact_replay_log(
                batch_df.sparkSession, log_path, within, watermark, order_by
            )

    writer = stream.writeStream.foreachBatch(_process).outputMode("append")
    writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def compact_retract_state(spark: SparkSession, log_path: str) -> dict:
    """Drop retract-stream state snapshots that are fully SHADOWED: the
    reader resolves each bucket to its latest recorded epoch, so any
    ``state/epoch={e}/bucket={b}`` with a newer ``(e', b)`` meta row can
    never be read again. Whole epoch directories vanish once every
    bucket they wrote is shadowed; meta rows stay (they are O(rows) and
    the latest-per-bucket resolution never reads shadowed ones, but a
    retried CURRENT epoch must still see the full chain strictly before
    it). Safe between micro-batches — the running query only reads
    epochs strictly before the one it is processing, and the newest
    snapshot per bucket is always kept.

    Returns ``{"buckets_total": n, "bucket_dirs_dropped": m,
    "epoch_dirs_removed": k}`` — immutable-dir bookkeeping, the
    ``compact_replay_log`` doctrine.

    Retry fence (r11): shadowing by the NEWEST epoch does not count —
    a crash between that epoch's foreachBatch and its commit replays
    it, and the replay diffs against the latest snapshot strictly
    BEFORE it, which must therefore survive. One extra generation per
    bucket is retained; that is what makes the inline
    ``compact_every`` hook safe."""
    import os
    import shutil

    out = {"buckets_total": 0, "bucket_dirs_dropped": 0, "epoch_dirs_removed": 0}
    try:
        meta = spark.read.parquet(f"{log_path}/state_meta")
        top = meta.agg(F.max("epoch").alias("m")).first()
    except Exception:
        return out
    if top is None or top.m is None:
        return out
    meta = meta.filter(F.col("epoch") < int(top.m))
    latest = {
        int(r.bucket): int(r.e)
        for r in meta.groupBy("bucket").agg(F.max("epoch").alias("e")).collect()
    }
    out["buckets_total"] = len(latest)
    for r in meta.select("epoch", "bucket").distinct().collect():
        e, b = int(r.epoch), int(r.bucket)
        p = f"{log_path}/state/epoch={e}/bucket={b}"
        # shadowed AND still on disk (meta rows outlive dropped dirs,
        # and empty-on-write buckets never had a dir)
        if e < latest.get(b, e) and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            out["bucket_dirs_dropped"] += 1
    state_root = f"{log_path}/state"
    if os.path.isdir(state_root):
        for d in os.listdir(state_root):
            p = os.path.join(state_root, d)
            if d.startswith("epoch=") and os.path.isdir(p):
                if not any(x.startswith("bucket=") for x in os.listdir(p)):
                    shutil.rmtree(p, ignore_errors=True)
                    out["epoch_dirs_removed"] += 1
    return out


def retract_state_read(spark: SparkSession, log_path: str) -> DataFrame:
    """Materialize a retract stream's CURRENT state offline — Flink's
    State Processor API use-case (reading operator state out of a
    savepoint) made trivial by the epoch-log design: state is already
    columnar parquet, so the read is just the per-bucket resolution
    the running stream itself uses (latest recorded epoch per bucket,
    missing dirs = bucket emptied by deletes). Works while the stream
    runs (epochs are immutable; at worst you see the previous epoch's
    snapshot of a bucket mid-write) and after it stops."""
    try:
        meta = spark.read.parquet(f"{log_path}/state_meta")
    except Exception:
        raise ValueError(
            f"no retract state under {log_path!r} (state_meta missing — "
            "not a retract_stream_start log, or no epoch completed yet)"
        ) from None
    rows = (
        meta.groupBy("bucket").agg(F.max("epoch").alias("e")).collect()
    )
    parts = []
    for r in rows:
        try:
            parts.append(
                spark.read.parquet(
                    f"{log_path}/state/epoch={int(r.e)}/bucket={int(r.bucket)}"
                )
            )
        except Exception:
            pass  # bucket emptied by deletes in its latest epoch
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
