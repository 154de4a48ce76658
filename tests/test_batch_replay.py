"""streaming/replay.py — incremental batch replay: stream the batch
CEP shapes the native engine refuses, correct by construction."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_note_spark.operators.cep import match_pattern
from flink_note_spark.streaming.replay import (
    _replay_epoch,
    replay_emissions,
    stream_batch_replay_start,
)

WITHIN_US = 10 * 60 * 1_000_000


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


_SCHEMA = "user_id long, ts timestamp, event_type string"

# A B+ under STRICT contiguity with within: the terminal-loop shape the
# native stream engine refuses with the pinned no-prefix-decision
# counterexample. Finality here is anchor + within (horizon close).
_TERMINAL_LOOP = ["A", {"type": "B", "one_or_more": True}]


def _batch_op(df):
    return match_pattern(
        df, _TERMINAL_LOOP, contiguity="strict", within="10 minutes"
    )


def _final():
    return F.unix_micros(F.col("ts_1")) + WITHIN_US


def _rows():
    return [
        # key 1: A B B then a later B INSIDE the within window (extends
        # the same anchor's run across micro-batches)
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "B"), (1, _t(8), "B"),
        # key 1 again, far later: a second independent match
        (1, _t(40), "A"), (1, _t(41), "B"),
        # key 2: run broken by a non-B — match stops before it
        (2, _t(0), "A"), (2, _t(1), "B"), (2, _t(3), "C"), (2, _t(4), "B"),
        # key 3: A with no B — no match
        (3, _t(5), "A"),
        # flush: advances the watermark far past every anchor's horizon
        (9, _t(24 * 60), "Z"),
    ]


def test_native_engine_still_refuses_terminal_loop(spark, tmp_path):
    """Parity pin: the shape replay streams is genuinely refused by the
    native engine (if this ever starts passing natively, replay's
    raison d'etre for it should be revisited)."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    src = tmp_path / "src0"
    src.mkdir()
    spark.createDataFrame(_rows()[:3], _SCHEMA).write.parquet(
        str(src / "c0.parquet")
    )
    stream = spark.readStream.schema(_SCHEMA).parquet(str(src / "c0.parquet"))
    with pytest.raises(ValueError, match="[Tt]erminal"):
        match_pattern_stream(
            stream, _TERMINAL_LOOP, contiguity="strict", within="10 minutes"
        )


def test_replay_streams_terminal_loop_equals_batch(spark, tmp_path):
    rows = _rows()
    src = tmp_path / "src"
    src.mkdir()
    # 3 micro-batches in event-time order; the key-1 anchor at t0 spans
    # the first two (its late B at t8 arrives in chunk 2)
    chunks = [rows[0:3] + rows[6:9], [rows[3]] + rows[9:11], rows[4:6] + rows[11:]]
    for i, c in enumerate(chunks):
        # flat FILES (not Spark output dirs): the file stream source
        # does not recurse into subdirectories
        pdf = spark.createDataFrame(c, _SCHEMA).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(str(src / f"c{i}.parquet"), index=False)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    log = str(tmp_path / "replay_log")
    q = stream_batch_replay_start(
        stream,
        _batch_op,
        _final(),
        "ts",
        log,
        within="10 minutes",
        watermark="1 minute",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        tuple(r) for r in replay_emissions(spark, log).collect()
    }
    full = spark.createDataFrame(rows, _SCHEMA)
    batch = {tuple(r) for r in _batch_op(full).collect()}
    assert streamed == batch
    # the run that straddled micro-batches captured its late extension
    assert (1, _t(0), _t(1), _t(8), 3) in streamed


def test_replay_epoch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch retries an epoch with identical input — the replay
    must recompute the identical emission interval and rows."""
    rows = _rows()
    log = str(tmp_path / "log")
    got: list = []

    def sink(df, eid):
        got.append(
            None if df is None else sorted(tuple(r) for r in df.collect())
        )

    kw = dict(
        batch_op=_batch_op,
        final_expr=_final(),
        time_col="ts",
        log_path=log,
        within_us=WITHIN_US,
        delay_us=60 * 1_000_000,
        sink=sink,
    )
    b0 = spark.createDataFrame(rows[:6], _SCHEMA)
    b1 = spark.createDataFrame(rows[6:], _SCHEMA)
    _replay_epoch(b0, 0, **kw)
    _replay_epoch(b1, 1, **kw)
    first = list(got)
    got.clear()
    _replay_epoch(b1, 1, **kw)  # retry of the latest epoch
    assert got == [first[1]]


def test_replay_no_watermark_advance_emits_nothing(spark, tmp_path):
    log = str(tmp_path / "log")
    got: list = []

    def sink(df, eid):
        got.append(None if df is None else df.count())

    kw = dict(
        batch_op=_batch_op,
        final_expr=_final(),
        time_col="ts",
        log_path=log,
        within_us=WITHIN_US,
        delay_us=60 * 1_000_000,
        sink=sink,
    )
    _replay_epoch(spark.createDataFrame(_rows(), _SCHEMA), 0, **kw)
    # an epoch of only OLD events cannot move the watermark
    _replay_epoch(spark.createDataFrame([(7, _t(1), "A")], _SCHEMA), 1, **kw)
    assert got[1] is None


def test_match_pattern_replay_wrapper_equals_batch(spark, tmp_path):
    """The convenience router derives batch_op + finality itself; same
    terminal-loop scenario, wrapper API."""
    from flink_note_spark.streaming.replay import match_pattern_replay_stream

    rows = _rows()
    src = tmp_path / "src"
    src.mkdir()
    pdf = spark.createDataFrame(rows, _SCHEMA).toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(src / "all.parquet"), index=False)
    stream = spark.readStream.schema(_SCHEMA).parquet(str(src))
    log = str(tmp_path / "log")
    q = match_pattern_replay_stream(
        stream,
        _TERMINAL_LOOP,
        log,
        contiguity="strict",
        within="10 minutes",
        watermark="1 minute",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {tuple(r) for r in replay_emissions(spark, log).collect()}
    batch = {
        tuple(r)
        for r in _batch_op(spark.createDataFrame(rows, _SCHEMA)).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_match_pattern_replay_validation(spark, tmp_path):
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.replay import match_pattern_replay_stream

    (tmp_path / "s").mkdir()
    stream = spark.readStream.schema(_SCHEMA).parquet(str(tmp_path / "s"))
    with pytest.raises(ValueError, match="within"):
        match_pattern_replay_stream(stream, _TERMINAL_LOOP, str(tmp_path / "l"))
    # a Pattern builder's own within()/skip() resolve like the native
    # engine's — this must NOT raise the within error (it fails later
    # on the missing checkpoint instead, proving within was taken)
    p = (
        Pattern.begin("A").next("B").one_or_more().within("10 minutes")
    )
    with pytest.raises(ValueError, match="checkpoint"):
        match_pattern_replay_stream(
            stream, p, str(tmp_path / "l"), contiguity="strict"
        )
    with pytest.raises(ValueError, match="step index"):
        match_pattern_replay_stream(
            stream, ["A", "B"], str(tmp_path / "l"),
            within="10 minutes", skip_strategy="skip_to_first:7",
        )


def _stream_chunks(spark, tmp_path, chunk_rows):
    src = tmp_path / "src"
    src.mkdir()
    for i, c in enumerate(chunk_rows):
        pdf = spark.createDataFrame(c, _SCHEMA).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(str(src / f"c{i}.parquet"), index=False)
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def _null_safe(t):
    # rows may carry NULL ts_i (absent optional variants) — sortable key
    return tuple((v is None, 0 if v is None else v) for v in t)


def _run_replay(spark, tmp_path, rows, chunk_rows, pattern, **kw):
    from flink_note_spark.streaming.replay import match_pattern_replay_stream

    stream = _stream_chunks(spark, tmp_path, chunk_rows)
    log = str(tmp_path / "log")
    stream_only = {
        k: kw.pop(k) for k in ("compact_every",) if k in kw
    }
    q = match_pattern_replay_stream(
        stream, pattern, log, watermark="1 minute",
        checkpoint=str(tmp_path / "ckpt"), **stream_only, **kw,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = sorted(
        (tuple(r) for r in replay_emissions(spark, log).collect()),
        key=_null_safe,
    )
    batch = sorted(
        (
            tuple(r)
            for r in match_pattern(
                spark.createDataFrame(rows, _SCHEMA), pattern, **kw
            ).collect()
        ),
        key=_null_safe,
    )
    return streamed, batch


def test_pruning_replay_skip_past_last_terminal_loop(spark, tmp_path):
    """skip_past_last_event on the natively-impossible terminal strict
    loop: the chain crosses micro-batch epochs via the persisted bound;
    streamed == batch with the same strategy."""
    rows = [
        # key 1: overlapping A B B A B B — past-last must consume the
        # first match's events before admitting the second
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "B"),
        (1, _t(3), "A"), (1, _t(4), "B"), (1, _t(5), "B"),
        # another chain link far later (separate epoch)
        (1, _t(40), "A"), (1, _t(41), "B"),
        (2, _t(0), "A"), (2, _t(1), "B"),
        (9, _t(24 * 60), "Z"),
    ]
    chunks = [rows[0:6] + rows[8:10], rows[6:8], rows[10:]]
    streamed, batch = _run_replay(
        spark, tmp_path, rows, chunks, _TERMINAL_LOOP,
        contiguity="strict", within="10 minutes",
        skip_strategy="skip_past_last_event",
    )
    assert streamed == batch and len(streamed) > 0


def test_pruning_replay_skip_to_first_relaxed(spark, tmp_path):
    """skip_to_first:2 on a relaxed 3-step pattern — the >= (not >)
    bound semantics and the ts_2 threshold column, across epochs."""
    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "C"),
        (1, _t(3), "A"), (1, _t(4), "B"), (1, _t(5), "C"),
        (1, _t(30), "A"), (1, _t(31), "B"), (1, _t(32), "C"),
        (2, _t(0), "A"), (2, _t(2), "B"), (2, _t(4), "C"),
        (9, _t(24 * 60), "Z"),
    ]
    chunks = [rows[0:6] + rows[9:12], rows[6:9], rows[12:]]
    streamed, batch = _run_replay(
        spark, tmp_path, rows, chunks, ["A", "B", "C"],
        contiguity="relaxed", within="10 minutes",
        skip_strategy="skip_to_first:2",
    )
    assert streamed == batch and len(streamed) > 0


def test_epoch_log_writers_require_checkpoint(spark, tmp_path):
    """ADVICE r10: exactly-once rests on STABLE foreachBatch epoch ids —
    a checkpoint-less restart renumbers from 0 and corrupts the log, so
    every epoch-log start function refuses without one."""
    from flink_note_spark.operators.timeseries import rollup_stream_start
    from flink_note_spark.streaming.replay import (
        match_pattern_replay_stream,
        retract_stream_start,
    )

    (tmp_path / "s").mkdir()
    stream = spark.readStream.schema(_SCHEMA).parquet(str(tmp_path / "s"))
    log = str(tmp_path / "l")
    with pytest.raises(ValueError, match="checkpoint"):
        stream_batch_replay_start(
            stream, _batch_op, _final(), "ts", log, within="10 minutes"
        )
    with pytest.raises(ValueError, match="checkpoint"):
        match_pattern_replay_stream(
            stream, _TERMINAL_LOOP, log, contiguity="strict",
            within="10 minutes",
        )
    with pytest.raises(ValueError, match="checkpoint"):
        match_pattern_replay_stream(
            stream, ["A", "B"], log, contiguity="relaxed",
            within="10 minutes", skip_strategy="skip_past_last_event",
        )
    with pytest.raises(ValueError, match="checkpoint"):
        retract_stream_start(stream, ["user_id"], log)
    with pytest.raises(ValueError, match="checkpoint"):
        rollup_stream_start(
            stream, log, ["user_id"], "ts", "1 hour", {"n": ("*", "count")}
        )


def test_replay_validates_time_column(spark, tmp_path):
    (tmp_path / "empty_src").mkdir()
    stream = (
        spark.readStream.schema(_SCHEMA).parquet(str(tmp_path / "empty_src"))
    )
    with pytest.raises(ValueError, match="time column"):
        stream_batch_replay_start(
            stream, _batch_op, _final(), "t_missing", str(tmp_path / "log"),
            within="10 minutes",
        )


def test_retract_stream_round_trips_to_batch_aggregate(spark, tmp_path):
    """toRetractStream semantics: the op-tagged changelog, materialized
    by the repo's own apply_changelog consumer, reconstructs the batch
    aggregate exactly; every -U carries the value the key previously
    held."""
    from flink_note_spark.operators.changelog import upsert_latest
    from flink_note_spark.streaming.replay import retract_stream_start

    rows = _rows()
    src = tmp_path / "src"
    src.mkdir()
    chunks = [rows[0:4], rows[4:8], rows[8:]]
    for i, c in enumerate(chunks):
        pdf = spark.createDataFrame(c, _SCHEMA).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(str(src / f"c{i}.parquet"), index=False)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s")
    )
    log = str(tmp_path / "retract_log")
    q = retract_stream_start(
        agg, ["event_type"], log, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # epoch is the version; within an epoch a key emits at most +I or
    # (-U, +U) — drop the retract half, upsert the rest
    ch = spark.read.parquet(f"{log}/out")
    upserts = ch.filter(F.col("op") != "-U")
    mat = upsert_latest(upserts, ["event_type"], version_col="epoch").drop(
        "op", "epoch"
    )
    full = spark.createDataFrame(rows, _SCHEMA)
    want = full.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s")
    )
    assert {tuple(r) for r in mat.collect()} == {
        tuple(r) for r in want.collect()
    }
    # every -U equals the key's previous emitted value
    prev = {}
    retract_first = F.when(F.col("op") == "-U", 0).otherwise(1)
    for r in ch.orderBy("epoch", retract_first).collect():
        k = r.event_type
        if r.op == "-U":
            assert prev[k] == (r.n, r.s), k
        else:
            prev[k] = (r.n, r.s)
    # first epoch inserts, later epochs retract/update
    ops = {r.op for r in ch.collect()}
    assert ops == {"+I", "-U", "+U"}


def _retract_run(spark, tmp_path, chunks, schema=_SCHEMA, **kw):
    from flink_note_spark.streaming.replay import retract_stream_start

    src = tmp_path / "src"
    src.mkdir()
    for i, c in enumerate(chunks):
        pdf = spark.createDataFrame(c, schema).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(str(src / f"c{i}.parquet"), index=False)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s")
    )
    log = str(tmp_path / "retract_log")
    q = retract_stream_start(
        agg, ["event_type"], log, checkpoint=str(tmp_path / "ckpt"), **kw
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return log, spark.read.parquet(f"{log}/out")


def test_retract_state_rewrites_only_touched_buckets(spark, tmp_path):
    """VERDICT r10 #2: per-epoch state cost must track TOUCHED buckets,
    not total live keys. An epoch whose batch touches one key writes
    exactly that key's bucket directory; untouched buckets resolve from
    their older epoch snapshots, and the materialized table still
    equals the batch aggregate over everything."""
    import glob

    from flink_note_spark.operators.changelog import upsert_latest

    rows = _rows()
    # chunk 0: many event types; chunk 1: ONLY type "B" rows
    chunks = [rows[:10], [(5, _t(50), "B")], rows[10:]]
    log, ch = _retract_run(spark, tmp_path, chunks, state_buckets=16)
    epochs = sorted(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{log}/state/epoch=*")
    )
    buckets = {
        e: sorted(glob.glob(f"{log}/state/epoch={e}/bucket=*")) for e in epochs
    }
    assert len(buckets[epochs[0]]) > 1  # first epoch: several types
    assert len(buckets[epochs[1]]) == 1  # only B's bucket rewritten
    # resolution across epochs: materialized == batch aggregate
    full = spark.createDataFrame(
        rows[:10] + [(5, _t(50), "B")] + rows[10:], _SCHEMA
    )
    want = full.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s")
    )
    mat = upsert_latest(
        ch.filter(F.col("op") != "-U"), ["event_type"], version_col="epoch"
    ).drop("op", "epoch")
    assert {tuple(r) for r in mat.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_retract_delete_tombstones_full_alphabet(spark, tmp_path):
    """VERDICT r10 #3: delete_where completes the op alphabet — a
    matching aggregate row emits -D carrying the key's PREVIOUS value,
    the key leaves the state (a later re-insert is a fresh +I), and the
    repo's own apply_changelog consumer materializes the survivor set.
    A tombstone for a never-seen key emits nothing."""
    from flink_note_spark.operators.changelog import apply_changelog

    # sum(user_id) drives s negative for type "A" in chunk 1 -> delete;
    # chunk 2 swings A's cumulative sum positive again -> fresh +I;
    # "Q" is tombstoned while never having been emitted
    chunks = [
        [(1, _t(0), "A"), (2, _t(1), "B")],
        [(-10, _t(2), "A"), (-5, _t(3), "Q")],
        [(20, _t(4), "A"), (1, _t(5), "B")],
    ]
    log, ch = _retract_run(
        spark, tmp_path, chunks, delete_where="s < 0", state_buckets=8
    )
    rows = sorted(
        (tuple(r) for r in ch.collect()), key=lambda t: (t[4], t[0])
    )  # (op, event_type, n, s, epoch)
    ops = {r[0] for r in rows}
    assert ops == {"+I", "-U", "+U", "-D"}
    # the -D for A carries A's previously emitted value (n=1, s=1)
    d_rows = [r for r in rows if r[0] == "-D"]
    assert d_rows == [("-D", "A", 1, 1, 1)]
    # unknown-key tombstone (Q) emitted nothing
    assert not [r for r in rows if r[1] == "Q"]
    # epoch 2 re-inserts A as +I (state forgot it), updates B
    e2_ops = {(r[0], r[1]) for r in rows if r[4] == 2}
    assert ("+I", "A") in e2_ops and ("-U", "B") in e2_ops
    # materialize via the repo's delete-aware consumer
    mat = apply_changelog(
        ch.filter(F.col("op") != "-U"), ["event_type"],
        version_col="epoch", tiebreak=None,
    ).drop("epoch")
    got = {tuple(r) for r in mat.collect()}
    assert got == {("A", 3, 11), ("B", 2, 3)}
    # offline state read (Flink State Processor API analogue): the
    # bucketed snapshots resolve to the same live table — deleted keys
    # absent, re-inserts present
    from flink_note_spark.streaming.replay import retract_state_read

    state = retract_state_read(spark, log)
    assert {tuple(r) for r in state.collect()} == got
    with pytest.raises(ValueError, match="state_meta"):
        retract_state_read(spark, str(tmp_path / "nonexistent"))


def test_compact_retract_state_drops_shadowed_buckets(spark, tmp_path):
    """Shadowed bucket snapshots (a newer epoch re-wrote the bucket)
    vanish; the newest snapshot per bucket survives and the
    materialized table is unchanged after compaction."""
    import glob

    from flink_note_spark.operators.changelog import upsert_latest
    from flink_note_spark.streaming.replay import compact_retract_state

    rows = _rows()
    # chunk 1 re-touches types from chunk 0 -> their chunk-0 snapshots
    # are shadowed; chunk 2 exists so the retry fence (newest epoch
    # never counts as a shadower) still lets epoch-0 dirs drop
    chunks = [rows[:10], rows[10:] + [(7, _t(60), "A")], [(3, _t(70), "B")]]
    log, ch = _retract_run(spark, tmp_path, chunks, state_buckets=16)
    before = len(glob.glob(f"{log}/state/epoch=*/bucket=*"))
    rep = compact_retract_state(spark, log)
    after = len(glob.glob(f"{log}/state/epoch=*/bucket=*"))
    assert rep["bucket_dirs_dropped"] > 0
    assert after == before - rep["bucket_dirs_dropped"]
    # materialization unchanged after compaction
    full_rows = rows[:10] + rows[10:] + [(7, _t(60), "A"), (3, _t(70), "B")]
    full = spark.createDataFrame(full_rows, _SCHEMA)
    want = full.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s")
    )
    mat = upsert_latest(
        ch.filter(F.col("op") != "-U"), ["event_type"], version_col="epoch"
    ).drop("op", "epoch")
    assert {tuple(r) for r in mat.collect()} == {
        tuple(r) for r in want.collect()
    }
    # idempotent: a second compaction drops nothing
    assert compact_retract_state(spark, log)["bucket_dirs_dropped"] == 0


def test_compact_replay_log_drops_only_dead_epochs(spark, tmp_path):
    """Compaction removes epochs wholly below wm - within - delay and
    the survivors still reproduce the exact emission set on the next
    epoch (no future slice ever needed the dropped events)."""
    import glob

    from flink_note_spark.streaming.replay import compact_replay_log

    rows = _rows()
    log = str(tmp_path / "log")
    emitted: list = []

    def sink(df, eid):
        if df is not None:
            emitted.extend(tuple(r) for r in df.collect())

    kw = dict(
        batch_op=_batch_op,
        final_expr=_final(),
        time_col="ts",
        log_path=log,
        within_us=WITHIN_US,
        delay_us=60 * 1_000_000,
        sink=sink,
    )
    # epoch 0: the early cluster; epoch 1: the t40 match
    _replay_epoch(spark.createDataFrame(rows[:4] + rows[6:11], _SCHEMA), 0, **kw)
    _replay_epoch(spark.createDataFrame(rows[4:6], _SCHEMA), 1, **kw)
    # retry fence (r11): the NEWEST epoch's watermark never drives the
    # floor — a crash before epoch 1's commit replays it against
    # epoch 0's watermark, so nothing may drop yet
    rep = compact_replay_log(
        spark, log, within="10 minutes", watermark="1 minute"
    )
    assert rep["epochs_dropped"] == 0
    # the flush epoch emits the t40 match, then compaction (now behind
    # the fence) drops exactly the dead early epoch
    before = set(emitted)
    _replay_epoch(spark.createDataFrame(rows[11:], _SCHEMA), 2, **kw)
    new = set(emitted) - before
    assert new == {(1, _t(40), _t(41), _t(41), 1)}
    rep = compact_replay_log(
        spark, log, within="10 minutes", watermark="1 minute"
    )
    assert rep["epochs_total"] == 3
    assert rep["epochs_dropped"] == 1  # epoch 0 is wholly below the floor
    assert len(glob.glob(f"{log}/events/epoch=*")) == 2


def test_replay_inline_compaction_preserves_emissions(spark, tmp_path):
    """compact_every=1 runs the log compaction inside every epoch; the
    retry fence makes that safe, and the emission set still equals
    batch while dead epochs disappear from the log."""
    import glob

    rows = _rows() + [(9, _t(24 * 60 + 10), "Z")]
    chunks = [
        rows[0:3] + rows[6:9], [rows[3]] + rows[9:11],
        rows[4:6] + rows[11:12],
        rows[12:],  # one more epoch so the fence lets the flush's
                    # watermark drive a drop of the early epochs
    ]
    streamed, batch = _run_replay(
        spark, tmp_path, rows, chunks, _TERMINAL_LOOP,
        contiguity="strict", within="10 minutes", compact_every=1,
    )
    assert streamed == batch and len(streamed) > 0
    left = len(glob.glob(str(tmp_path / "log" / "events" / "epoch=*")))
    assert left == 2  # the two pre-flush epochs are gone


def test_replay_survives_checkpoint_restart(spark, tmp_path):
    """Stop after the early chunks, restart from the same checkpoint
    with the flush chunk added: emissions across both runs equal batch,
    with no duplicates (the epoch meta chain continues across the
    restart)."""
    rows = _rows()
    src = tmp_path / "src"
    src.mkdir()
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")

    def write_chunk(name, c):
        pdf = spark.createDataFrame(c, _SCHEMA).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(str(src / name), index=False)

    def run_once():
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = stream_batch_replay_start(
            stream, _batch_op, _final(), "ts", log,
            within="10 minutes", watermark="1 minute", checkpoint=ckpt,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_chunk("c0.parquet", rows[0:4] + rows[6:11])
    run_once()
    write_chunk("c1.parquet", rows[4:6] + rows[11:])
    run_once()
    streamed = sorted(tuple(r) for r in replay_emissions(spark, log).collect())
    batch = sorted(
        tuple(r)
        for r in _batch_op(spark.createDataFrame(rows, _SCHEMA)).collect()
    )
    assert streamed == batch  # sorted lists: duplicates would differ


def test_trailing_negation_no_phantom_emission(spark, tmp_path):
    """A match asserting terminal ABSENCE (A B notFollowedBy X) must not
    emit before the watermark passes anchor + within: an X arriving in a
    later epoch (above the old watermark) retracts it in batch, and the
    stream must agree."""
    pat = ["A", "B", {"type": "X", "negate": True}]

    def op(df):
        return match_pattern(df, pat, contiguity="relaxed", within="10 minutes")

    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"),   # epoch 0: looks like a match
        (1, _t(5), "X"),                     # epoch 1: negates it
        (2, _t(0), "A"), (2, _t(1), "B"),   # key 2: genuinely no X
        (9, _t(24 * 60), "Z"),
    ]
    chunks = [rows[0:2] + rows[3:5], [rows[2]], rows[5:]]
    streamed, batch = _run_replay(
        spark, tmp_path, rows, chunks, pat,
        contiguity="relaxed", within="10 minutes",
    )
    assert streamed == batch
    assert all(r[0] == 2 for r in streamed)  # only key 2's match survives


def test_finality_strategy_helpers(spark):
    """Unit pins for the named finality recipes the routers compose:
    closed-pattern last-event, open-terminal anchor+within (NULL-skipping
    anchor), MR ts-measure — and the ts-column selector that excludes
    loop counts and payload columns."""
    from flink_note_spark.streaming.replay import (
        _match_ts_cols,
        finality_anchor_within,
        finality_last_event,
        finality_measure,
    )

    df = spark.createDataFrame(
        [(None, _t(5), _t(7), 2, 1.5)],
        "ts_1 timestamp, ts_2 timestamp, ts_2_last timestamp, "
        "n_2 long, ts_2_price double",
    )
    assert _match_ts_cols(df.columns) == ["ts_1", "ts_2", "ts_2_last"]
    cols = ["ts_1", "ts_2", "ts_2_last"]
    r = df.select(
        finality_last_event(cols).alias("closed"),
        finality_anchor_within(cols, "10 minutes").alias("open"),
        finality_measure("ts_2").alias("m2"),
        finality_measure("ts_2_last").alias("m2l"),
    ).first()
    assert r.closed == r.m2l  # last bound event wins, NULL ts_1 ignored
    # anchor skips the NULL ts_1 and lands on ts_2; +10 minutes in µs
    assert r.open == r.m2 + 10 * 60 * 1_000_000
    with pytest.raises(ValueError, match="ts column"):
        finality_last_event([])
    with pytest.raises(ValueError, match="ts column"):
        finality_anchor_within([], "10 minutes")


def test_replay_optional_first_open_terminal_equals_batch(spark, tmp_path):
    """ADVICE r10: an optional() FIRST step with an OPEN terminal (loop)
    expands variants whose ts_1 is NULL — finality anchored on ts_1
    alone silently dropped those matches. The anchor must be the match's
    first BOUND event (least over the per-step times, NULL-skipping)."""
    pat = [{"type": "A", "optional": True}, {"type": "B", "one_or_more": True}]
    rows = [
        # key 1: B-run with NO A — every match here has ts_1 NULL
        (1, _t(0), "B"), (1, _t(1), "B"),
        # key 2: A then Bs — the full variant binds ts_1; the A-absent
        # variants still emit NULL-ts_1 rows (batch semantics)
        (2, _t(0), "A"), (2, _t(1), "B"), (2, _t(2), "B"),
        (9, _t(24 * 60), "Z"),
    ]
    chunks = [rows[0:1] + rows[2:4], rows[1:2] + rows[4:5], rows[5:]]
    streamed, batch = _run_replay(
        spark, tmp_path, rows, chunks, pat,
        contiguity="strict", within="10 minutes",
    )
    assert streamed == batch and len(streamed) > 0
    # the NULL-ts_1 variants are present, not silently dropped
    assert any(r[1] is None for r in streamed)


def test_replay_streams_batch_only_match_recognize(spark, tmp_path):
    """The replay engine is operator-agnostic: a MATCH_RECOGNIZE shape
    with a STRING payload measure (non-numeric payloads refuse on the
    native stream engines) streams by replaying the unmodified batch
    operator; finality comes from a ts measure the query itself
    projects."""
    from flink_note_spark.operators.match_recognize import match_recognize
    from flink_note_spark.operators.match_recognize import match_recognize_stream

    schema = "user_id long, ts timestamp, event_type string, label string"
    rows = [
        (1, _t(0), "view", "home"), (1, _t(1), "click", "promo"),
        (1, _t(2), "purchase", "sku1"),
        (1, _t(20), "view", "search"), (1, _t(21), "click", "ad"),
        (1, _t(22), "purchase", "sku2"),
        (2, _t(0), "view", "home"), (2, _t(1), "click", "banner"),
        (2, _t(2), "purchase", "sku3"),
        (9, _t(24 * 60), "flush", "z"),
    ]
    kw = dict(
        partition_by="user_id", order_by="ts",
        pattern="V C P",
        define={"V": "event_type = 'view'", "C": "event_type = 'click'",
                "P": "event_type = 'purchase'"},
        measures={"end_us": "P.ts", "sku": "P.label", "page": "V.label"},
        within="10 minutes",
    )

    def op(df):
        return match_recognize(df, **kw)

    # parity pin: the native streaming twin refuses the string payloads
    src0 = tmp_path / "src0"
    src0.mkdir()
    stream0 = spark.readStream.schema(schema).parquet(str(src0))
    with pytest.raises(ValueError, match="numeric|NUMERIC"):
        match_recognize_stream(stream0, watermark="1 minute", **kw)

    src = tmp_path / "src"
    src.mkdir()
    chunks = [rows[0:3] + rows[6:9], rows[3:6], rows[9:]]
    for i, c in enumerate(chunks):
        pdf = spark.createDataFrame(c, schema).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(str(src / f"c{i}.parquet"), index=False)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    log = str(tmp_path / "log")
    q = stream_batch_replay_start(
        stream,
        op,
        F.unix_micros(F.col("end_us").cast("timestamp")),
        "ts",
        log,
        within="10 minutes",
        watermark="1 minute",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = sorted(
        tuple(r) for r in replay_emissions(spark, log).collect()
    )
    batch = sorted(
        tuple(r) for r in op(spark.createDataFrame(rows, schema)).collect()
    )
    assert streamed == batch and len(streamed) == 3
    assert {r[2] for r in streamed} == {"sku1", "sku2", "sku3"}


def test_suggest_state_buckets_regimes():
    """Sizing helper (r12 — VERDICT r11 #8): uniform large batches get
    executor-fit-only bucketing (any layout rewrites ~all live keys —
    the 91 s-line physics), hot-key batches get collision-avoiding
    counts, and both respect the fit floor and the metadata cap."""
    from flink_note_spark.streaming.replay import suggest_state_buckets

    # uniform regime: batch keys ~ live keys -> fit-only
    assert suggest_state_buckets(2_000_000, 2_000_000) == 2
    assert suggest_state_buckets(500_000, 400_000) == 1
    # hot-key regime: B = 4 x per-epoch keys
    assert suggest_state_buckets(2_000_000, 16) == 64
    assert suggest_state_buckets(2_000_000, 1) == 4
    # fit floor wins when live keys dominate
    assert suggest_state_buckets(50_000_000, 2) == 50
    # metadata cap
    assert suggest_state_buckets(10_000_000_000, 100_000) == 4096
    # refusals: measured numbers required
    import pytest

    with pytest.raises(ValueError, match="measure"):
        suggest_state_buckets(0, 5)
    with pytest.raises(ValueError, match=">= 1"):
        suggest_state_buckets(10, 5, max_buckets=0)
