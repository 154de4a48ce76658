"""End-to-end streaming correctness suite (SURVEY.md §5.4).

Drives every declared streaming capability (SURVEY.md §2.2 "Streaming-
only") through a real micro-batch pipeline: timestamped chunk files →
``sources.files.read_file_stream`` (one file per trigger, so watermarks
advance batch-by-batch like a live stream) → the operator under test →
memory or file sink — then asserts the result equals the batch twin on
the same bounded input.

Covers: tumbling/sliding/session windows, watermark late-data drop,
streaming dedup, stream–static join, stream–stream join, stateful
sessionization (applyInPandasWithState), and checkpoint → restart
resume without duplicates (reference C2 savepoint semantics).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flink_note_spark.sources.files import (
    foreach_batch_sink,
    read_file_stream,
    read_rate,
    write_stream_sink,
)
from flink_note_spark.streaming.ops import (
    session_window_agg,
    sliding_window_agg,
    stateful_sessionize,
    stream_dedup,
    stream_static_join,
    stream_stream_join,
    tumbling_window_agg,
)

EVENT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, event_type string, value double"
)

_ARROW_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("event_type", pa.string()),
        ("value", pa.float64()),
    ]
)


def _ts(minute: float) -> dt.datetime:
    """Event time `minute` minutes after a fixed UTC epoch."""
    return dt.datetime(2024, 3, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


def _write_chunk(dirpath, name: str, rows: list[tuple]) -> None:
    """One parquet chunk file = one source micro-batch (maxFilesPerTrigger=1)."""
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "event_type", "value"]
    )
    table = pa.Table.from_pandas(pdf, schema=_ARROW_SCHEMA, preserve_index=False)
    pq.write_table(table, str(dirpath / name))


def _run_to_memory(df, name: str, output_mode: str, tmp_path) -> None:
    """Start → drain all available input → stop. ``name`` becomes the
    in-memory table."""
    q = (
        write_stream_sink(
            df, "memory", path=None,
            checkpoint=str(tmp_path / f"ckpt_{name}"),
            output_mode=output_mode, query_name=name,
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _run_many_to_memory(runs, tmp_path) -> None:
    """Drain INDEPENDENT streams concurrently: start every ``(df, name,
    output_mode)`` query, then ``processAllAvailable`` + stop each.

    Every micro-batch pays a fixed ~0.3–0.6 s harness floor (offset WAL,
    state commit, Python-runner roundtrip — measured r14, independent
    of row count and shuffle partitions), so a parameter sweep that
    drains N pattern variants sequentially costs N × batches × floor.
    The variants are independent queries over the same static chunk
    dir; Spark's scheduler overlaps their micro-batches (guide §2.6),
    making the sweep cost ~max instead of ~sum. Queries, sinks and
    assertions are UNCHANGED — only the drain order is concurrent."""
    qs = []
    try:
        for df, name, output_mode in runs:
            qs.append(
                write_stream_sink(
                    df, "memory", path=None,
                    checkpoint=str(tmp_path / f"ckpt_{name}"),
                    output_mode=output_mode, query_name=name,
                ).start()
            )
        for q in qs:
            q.processAllAvailable()
    finally:
        for q in qs:
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — stop the rest regardless
                pass


@pytest.fixture()
def chunk_dir(tmp_path):
    d = tmp_path / f"stream_src_{uuid.uuid4().hex[:8]}"
    d.mkdir()
    return d


# --- windowed aggregations (streaming twin == batch twin) ---------------


def _window_fixture(chunk_dir):
    """Three micro-batches spanning three 10-minute windows."""
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(4), "view", 2.0),
        (1, 3, _ts(9), "click", 3.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (2, 4, _ts(12), "view", 4.0),
        (1, 5, _ts(18), "view", 5.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [
        (3, 6, _ts(25), "view", 6.0),
    ])


def test_tumbling_window_stream_equals_batch(spark, chunk_dir, tmp_path):
    _window_fixture(chunk_dir)
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ]
    out = tumbling_window_agg(
        stream, "ts", "10 minutes", "5 minutes", keys=["event_type"], aggs=aggs
    ).select(
        F.col("window.start").alias("win_start"), "event_type",
        "n_events", "sum_value",
    )
    _run_to_memory(out, "tumbling_out", "complete", tmp_path)

    got = spark.sql("SELECT * FROM tumbling_out").toPandas()
    want = (
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
        .groupBy(F.window("ts", "10 minutes").alias("window"), "event_type")
        .agg(*aggs)
        .select(
            F.col("window.start").alias("win_start"), "event_type",
            "n_events", "sum_value",
        )
        .toPandas()
    )
    key = ["win_start", "event_type"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True),
        want.sort_values(key, ignore_index=True),
        check_dtype=False,
    )


def test_sliding_window_stream_equals_batch(spark, chunk_dir, tmp_path):
    _window_fixture(chunk_dir)
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    out = sliding_window_agg(
        stream, "ts", "10 minutes", "5 minutes", "5 minutes", keys=[], aggs=aggs
    ).select(F.col("window.start").alias("win_start"), "n_events")
    _run_to_memory(out, "sliding_out", "complete", tmp_path)

    got = spark.sql("SELECT * FROM sliding_out").toPandas()
    want = (
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("window"))
        .agg(*aggs)
        .select(F.col("window.start").alias("win_start"), "n_events")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.sort_values("win_start", ignore_index=True),
        want.sort_values("win_start", ignore_index=True),
        check_dtype=False,
    )


def test_session_window_stream_equals_batch(spark, chunk_dir, tmp_path):
    """Per-user sessions with a 6-minute inactivity gap: user 1's events at
    0/9/18 chain into ONE session only if gaps < 6 min — here 9→18 splits."""
    _window_fixture(chunk_dir)
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    out = session_window_agg(
        stream, "ts", "6 minutes", "5 minutes", keys=["user_id"], aggs=aggs
    ).select(
        "user_id",
        F.col("session_window.start").alias("sess_start"),
        "n_events",
    )
    _run_to_memory(out, "session_out", "complete", tmp_path)

    got = spark.sql("SELECT * FROM session_out").toPandas()
    want = (
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
        .groupBy(F.session_window("ts", "6 minutes").alias("session_window"), "user_id")
        .agg(*aggs)
        .select(
            "user_id",
            F.col("session_window.start").alias("sess_start"),
            "n_events",
        )
        .toPandas()
    )
    key = ["user_id", "sess_start"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True),
        want.sort_values(key, ignore_index=True),
        check_dtype=False,
    )
    # sanity: the 6-min gap split user 1 into >= 2 sessions
    assert (got["user_id"] == 1).sum() >= 2


# --- watermark late-data handling ---------------------------------------


def test_watermark_drops_late_row(spark, chunk_dir, tmp_path):
    """Append-mode tumbling count with a 5-minute watermark, fed like a
    live stream (files arrive BETWEEN drain cycles, so no-data batches
    finalize windows the moment the watermark passes them).

    Chunk 1 fills window [00:00, 00:10). Chunk 2 jumps event time to
    00:30, pushing the watermark (30 - 5 = 00:25) past that window's end —
    the window is finalized and emitted with count 2. Chunk 3 then
    delivers a LATE row stamped 00:02:30, far below the watermark: Spark
    guarantees it cannot touch the finalized window (state already
    evicted) — no second emission, no recount.
    """
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (1, 2, _ts(2), "view", 1.0),
    ])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = tumbling_window_agg(
        stream, "ts", "10 minutes", "5 minutes", keys=[],
        aggs=[F.count(F.lit(1)).alias("n_events")],
    ).select(F.col("window.start").alias("win_start"), "n_events")
    q = (
        write_stream_sink(
            out, "memory", path=None, checkpoint=str(tmp_path / "ckpt_late"),
            output_mode="append", query_name="late_out",
        )
        .start()
    )
    try:
        q.processAllAvailable()
        # advance event time → watermark 00:25 finalizes [00:00, 00:10)
        _write_chunk(chunk_dir, "c2.parquet", [(1, 3, _ts(30), "view", 1.0)])
        q.processAllAvailable()
        emitted = spark.sql(
            "SELECT n_events FROM late_out WHERE win_start = timestamp'2024-03-01 00:00:00'"
        ).collect()
        assert [r.n_events for r in emitted] == [2]

        # late row arrives AFTER finalization → dropped, never re-emitted
        _write_chunk(chunk_dir, "c3.parquet", [
            (1, 4, _ts(2.5), "view", 1.0),
            (1, 5, _ts(35), "view", 1.0),
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql("SELECT * FROM late_out").toPandas()
    first = got[got["win_start"] == _ts(0)]
    assert len(first) == 1
    assert int(first["n_events"].iloc[0]) == 2


# --- streaming dedup ----------------------------------------------------


def test_stream_dedup_keeps_one_row_per_key(spark, chunk_dir, tmp_path):
    """Keys-only dedup: the same user_id at DIFFERENT timestamps still
    collapses to one row (the q26 batch-twin contract)."""
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(1), "view", 1.0),
        (1, 3, _ts(2), "click", 1.0),   # dup key, later ts — must drop
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (2, 4, _ts(3), "view", 1.0),    # dup key in a later batch — drop
        (3, 5, _ts(4), "view", 1.0),
    ])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = stream_dedup(stream, keys=["user_id"], ts_col="ts", watermark="10 minutes")
    _run_to_memory(out, "dedup_out", "append", tmp_path)

    got = spark.sql("SELECT * FROM dedup_out").toPandas()
    assert sorted(got["user_id"].tolist()) == [1, 2, 3]
    # first arrival survives
    assert set(got["event_id"]) == {1, 2, 5}


# --- joins --------------------------------------------------------------


def test_stream_static_join(spark, chunk_dir, tmp_path):
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(1), "view", 2.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (3, 3, _ts(2), "view", 3.0),
    ])
    static = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = stream_static_join(stream, static, on=["user_id"], how="inner").select(
        "user_id", "event_id", "tier"
    )
    _run_to_memory(out, "ssj_out", "append", tmp_path)

    got = spark.sql("SELECT * FROM ssj_out").toPandas()
    assert sorted(got["user_id"].tolist()) == [1, 2]
    assert set(got["tier"]) == {"gold", "silver"}


def test_temporal_join_stream_equals_batch(spark, chunk_dir, tmp_path):
    """Streaming rendering of Flink's ``FOR SYSTEM_TIME AS OF`` (r7):
    ``temporal_join(strategy='interval')`` on a live fact stream
    against a VERSIONED static dimension — micro-batched facts must
    produce exactly the batch operator's rows, and the batch-only
    ``union_window`` strategy must refuse a streaming fact loudly."""
    import pytest

    from flink_note_spark.operators.joins import temporal_join

    fact_rows_1 = [(1, 1, _ts(5), "click", 1.0),
                   (1, 2, _ts(25), "click", 1.0)]
    fact_rows_2 = [(2, 3, _ts(40), "click", 1.0),
                   (1, 4, _ts(60), "click", 1.0),
                   (3, 5, _ts(10), "click", 1.0)]
    _write_chunk(chunk_dir, "f1.parquet", fact_rows_1)
    _write_chunk(chunk_dir, "f2.parquet", fact_rows_2)
    dim = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(20), 20.0), (2, _ts(50), 99.0)],
        "user_id long, vfrom timestamp, price double",
    )
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = temporal_join(
        stream, dim, on="user_id", fact_time="ts", valid_from="vfrom",
        how="inner", strategy="interval",
    ).select("user_id", "event_id", "price")
    _run_to_memory(out, "tmpj_out", "append", tmp_path)
    got = sorted(
        map(tuple, spark.sql(
            "SELECT user_id, event_id, price FROM tmpj_out"
        ).collect())
    )

    batch = spark.createDataFrame(
        fact_rows_1 + fact_rows_2, EVENT_SCHEMA
    )
    want = sorted(
        map(tuple, temporal_join(
            batch, dim, on="user_id", fact_time="ts",
            valid_from="vfrom", how="inner", strategy="union_window",
        ).select("user_id", "event_id", "price").collect())
    )
    assert got == want
    assert got == [(1, 1, 10.0), (1, 2, 20.0), (1, 4, 20.0)]

    with pytest.raises(ValueError, match="batch-only"):
        temporal_join(
            stream, dim, on="user_id", fact_time="ts",
            valid_from="vfrom", strategy="union_window",
        )


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Two live streams (views ⋈ clicks within 10 minutes after the view),
    both watermarked so join state is evictable."""
    vdir = tmp_path / "views_src"
    cdir = tmp_path / "clicks_src"
    vdir.mkdir()
    cdir.mkdir()
    _write_chunk(vdir, "v1.parquet", [
        (1, 10, _ts(0), "view", 1.0),
        (2, 11, _ts(5), "view", 1.0),
    ])
    _write_chunk(cdir, "c1.parquet", [
        (1, 20, _ts(4), "click", 1.0),    # within 10 min of view@0 → match
        (2, 21, _ts(30), "click", 1.0),   # 25 min after view@5 → no match
    ])

    views = read_file_stream(spark, "parquet", str(vdir), EVENT_SCHEMA).select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = read_file_stream(spark, "parquet", str(cdir), EVENT_SCHEMA).select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    out = stream_stream_join(
        views, clicks,
        left_ts="view_ts", right_ts="click_ts",
        left_watermark="10 minutes", right_watermark="10 minutes",
        equi=F.col("v_user") == F.col("c_user"),
        time_bound=(
            (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 10 MINUTES"))
        ),
    ).select("v_user", "view_id", "click_id")
    _run_to_memory(out, "ssj2_out", "append", tmp_path)

    got = spark.sql("SELECT * FROM ssj2_out").toPandas()
    assert got[["v_user", "view_id", "click_id"]].values.tolist() == [[1, 10, 20]]


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """r9: Flink intervalJoin on unbounded streams — the streaming
    twin equals operators/joins.interval_join on a seeded two-stream
    soup split into micro-batches, including a negative lower bound
    (the backward window) and both-bounds inclusivity."""
    import random

    from flink_note_spark.operators.joins import interval_join
    from flink_note_spark.streaming.ops import interval_join_stream

    rng = random.Random(77)
    vdir = tmp_path / "iv_views"
    cdir = tmp_path / "iv_clicks"
    vdir.mkdir()
    cdir.mkdir()
    vrows = sorted(
        [(rng.randrange(1, 5), 100 + i, _ts(rng.randrange(0, 120)),
          "view", 1.0) for i in range(30)],
        key=lambda r: r[2],
    )
    crows = sorted(
        [(rng.randrange(1, 5), 200 + i, _ts(rng.randrange(0, 120)),
          "click", 1.0) for i in range(30)],
        key=lambda r: r[2],
    )
    for i in range(3):
        _write_chunk(vdir, f"v{i}.parquet", vrows[i * 10:(i + 1) * 10])
        _write_chunk(cdir, f"c{i}.parquet", crows[i * 10:(i + 1) * 10])
    # watermark drivers so the tail pairs decide
    _write_chunk(vdir, "v9.parquet", [(99, 999, _ts(900), "view", 1.0)])
    _write_chunk(cdir, "c9.parquet", [(99, 998, _ts(900), "click", 1.0)])

    def _views(df):
        return df.select(
            "user_id", F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )

    def _clicks(df):
        return df.select(
            F.col("user_id"), F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )

    batch_v = _views(spark.read.schema(EVENT_SCHEMA).parquet(str(vdir)))
    batch_c = _clicks(spark.read.schema(EVENT_SCHEMA).parquet(str(cdir)))
    want = sorted(
        (int(r["user_id"]), int(r["view_id"]), int(r["click_id"]))
        for r in interval_join(
            batch_v, batch_c, on="user_id",
            left_time="view_ts", right_time="click_ts",
            lower="-5 minutes", upper="15 minutes",
        ).collect()
    )

    sv = _views(read_file_stream(
        spark, "parquet", str(vdir), EVENT_SCHEMA, max_files_per_trigger=1
    ))
    sc = _clicks(read_file_stream(
        spark, "parquet", str(cdir), EVENT_SCHEMA, max_files_per_trigger=1
    ))
    out = interval_join_stream(
        sv, sc, on="user_id",
        left_time="view_ts", right_time="click_ts",
        lower="-5 minutes", upper="15 minutes",
        left_watermark="3 minutes", right_watermark="3 minutes",
    ).select("user_id", "view_id", "click_id")
    _run_to_memory(out, "ivj_out", "append", tmp_path)
    got = sorted(
        (int(r["user_id"]), int(r["view_id"]), int(r["click_id"]))
        for r in spark.sql("SELECT * FROM ivj_out").collect()
    )
    assert got == want
    assert got


# --- stateful per-key processing (applyInPandasWithState) ---------------


def test_stateful_sessionize_event_time_close(spark, chunk_dir, tmp_path):
    """Sessions extend across micro-batches and close deterministically
    when the watermark passes last_event + gap (event-time timers — the
    KeyedProcessFunction pattern)."""
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (1, 2, _ts(3), "view", 1.0),
        (2, 3, _ts(1), "view", 1.0),
    ])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = stateful_sessionize(
        stream, key="user_id", ts_col="ts", gap="6 minutes", watermark="5 minutes"
    )
    q = (
        write_stream_sink(
            out, "memory", path=None, checkpoint=str(tmp_path / "ckpt_sess"),
            output_mode="update", query_name="sess_state_out",
        )
        .start()
    )
    try:
        q.processAllAvailable()
        # session for user 1 still open, extended within one batch
        snap = spark.sql(
            "SELECT * FROM sess_state_out WHERE user_id = 1"
        ).toPandas()
        assert int(snap["n_events"].max()) == 2
        assert not snap["closed"].any()

        # another event extends user 1's session in a later batch
        _write_chunk(chunk_dir, "c2.parquet", [(1, 4, _ts(6), "view", 1.0)])
        q.processAllAvailable()

        # sentinel far in the future: watermark (60-5=55 min) passes every
        # timer (last+gap ≤ 12 min) → closed=true rows fire
        _write_chunk(chunk_dir, "c3.parquet", [(99, 5, _ts(60), "view", 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql("SELECT * FROM sess_state_out").toPandas()
    closed = got[got["closed"]]
    us = lambda m: int(_ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    u1 = closed[closed["user_id"] == 1].iloc[0]
    assert int(u1["n_events"]) == 3          # 0, 3 and 6-minute events
    assert int(u1["session_start"]) == us(0)
    assert int(u1["session_end"]) == us(6)
    u2 = closed[closed["user_id"] == 2].iloc[0]
    assert int(u2["n_events"]) == 1


def test_job_control_verbs(spark, chunk_dir, tmp_path):
    """run / list / status / graceful stop / resume — the reference's CLI
    job verbs on the Structured Streaming lifecycle (C1/C2)."""
    from flink_note_spark.streaming.control import (
        get_query,
        last_progress,
        list_queries,
        query_status,
        stop_query,
    )

    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "view", 1.0)])
    sink = tmp_path / "ctl_sink"
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA
    ).select("user_id", "event_id")

    def launch():
        return (
            write_stream_sink(
                stream, "parquet", str(sink),
                checkpoint=str(tmp_path / "ckpt_ctl"),
                output_mode="append", query_name="ctl_job",
            )
            .start()
        )

    q = launch()
    try:
        q.processAllAvailable()
        listed = list_queries(spark)
        assert any(j["name"] == "ctl_job" and j["is_active"] for j in listed)
        assert get_query(spark, "ctl_job").id == q.id
        assert "message" in query_status(q)
        prog = last_progress(q)
        assert prog is not None and "batchId" in prog
    finally:
        stop_query(spark, "ctl_job")
    assert not any(j["name"] == "ctl_job" for j in list_queries(spark))

    # resume from the same checkpoint picks up new input only (C2):
    # the sink gains exactly the new file's rows, never a replay
    _write_chunk(chunk_dir, "c2.parquet", [(2, 2, _ts(1), "view", 1.0)])
    q2 = launch()
    try:
        q2.processAllAvailable()
        got = spark.read.parquet(str(sink)).toPandas()
        assert sorted(got["event_id"].tolist()) == [1, 2]
    finally:
        q2.stop()


def test_stateful_sessionize_splits_in_batch_gap(spark, chunk_dir, tmp_path):
    """Two events separated by more than the gap INSIDE one micro-batch
    must close the first session immediately — not merge into one (the
    timer only owns the final open session)."""
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (1, 2, _ts(2), "view", 1.0),
        (1, 3, _ts(30), "view", 1.0),   # 28-min gap > 6-min session gap
    ])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = stateful_sessionize(
        stream, key="user_id", ts_col="ts", gap="6 minutes", watermark="5 minutes"
    )
    _run_to_memory(out, "sess_split_out", "update", tmp_path)

    got = spark.sql(
        "SELECT * FROM sess_split_out WHERE closed ORDER BY session_start"
    ).toPandas()
    us = lambda m: int(_ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert len(got) == 1  # first session closed by the in-batch split
    assert int(got["session_start"].iloc[0]) == us(0)
    assert int(got["session_end"].iloc[0]) == us(2)
    assert int(got["n_events"].iloc[0]) == 2
    open_snap = spark.sql(
        "SELECT * FROM sess_split_out WHERE NOT closed ORDER BY session_start DESC"
    ).toPandas()
    assert int(open_snap["session_start"].iloc[0]) == us(30)


def test_stateful_sessionize_string_key(spark, chunk_dir, tmp_path):
    """ADVICE r2 #5: the output schema must inherit the INPUT key's name
    and type — a string-keyed stream sessionizes under its own column
    name, not a hardcoded ``user_id long``."""
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (1, 2, _ts(3), "view", 1.0),
        (2, 3, _ts(1), "view", 1.0),
    ])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    ).select(F.concat(F.lit("u"), F.col("user_id")).alias("uname"), "ts")
    out = stateful_sessionize(
        stream, key="uname", ts_col="ts", gap="6 minutes", watermark="5 minutes"
    )
    assert dict(out.dtypes)["uname"] == "string"
    _run_to_memory(out, "sess_str_out", "update", tmp_path)

    got = spark.sql("SELECT * FROM sess_str_out").toPandas()
    assert set(got["uname"]) == {"u1", "u2"}
    assert int(got.loc[got["uname"] == "u1", "n_events"].max()) == 2


def test_streaming_document_dedup(spark, tmp_path):
    """LLM-pipeline × streaming: exact content-hash dedup over a document
    STREAM — arriving duplicates (same normalized text, different ids /
    arrival times) are dropped with watermark-bounded state, mirroring
    the batch operator q29 builds on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ddir = tmp_path / "docs_src"
    ddir.mkdir()
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("ts", pa.timestamp("us"))]
    )

    def chunk(name, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            str(ddir / name),
        )

    chunk("c1.parquet", [
        (1, "the quick fox", _ts(0)),
        (2, "lazy dog", _ts(1)),
        (3, "The Quick Fox ", _ts(2)),   # dup of 1 after normalization
    ])
    chunk("c2.parquet", [
        (4, "lazy dog", _ts(3)),         # dup of 2, later batch
        (5, "fresh text", _ts(4)),
    ])
    stream = read_file_stream(
        spark, "parquet", str(ddir), "doc_id long, text string, ts timestamp",
        max_files_per_trigger=1,
    ).withColumn("content_hash", F.sha2(F.lower(F.trim("text")), 256))
    out = stream_dedup(
        stream, keys=["content_hash"], ts_col="ts", watermark="10 minutes"
    )
    _run_to_memory(out, "docdedup_out", "append", tmp_path)

    got = spark.sql("SELECT doc_id FROM docdedup_out").toPandas()
    assert sorted(got["doc_id"].tolist()) == [1, 2, 5]


def test_streaming_json_parse_agg_equals_batch(spark, tmp_path):
    """Typed from_json parse + keyed aggregation on a LIVE stream equals
    the batch twin — the q45 surface under streaming execution."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    jdir = tmp_path / "json_src"
    jdir.mkdir()
    schema = pa.schema(
        [("event_type", pa.string()), ("props", pa.string()), ("ts", pa.timestamp("us"))]
    )

    def chunk(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_type", "props", "ts"])
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            str(jdir / name),
        )

    chunk("c1.parquet", [
        ("view", '{"k": 3}', _ts(0)),
        ("click", '{"k": 5}', _ts(1)),
    ])
    chunk("c2.parquet", [
        ("view", '{"k": 7}', _ts(2)),
    ])
    stream = read_file_stream(
        spark, "parquet", str(jdir),
        "event_type string, props string, ts timestamp", max_files_per_trigger=1,
    )
    parsed = stream.select(
        "event_type", F.from_json("props", "k int").alias("p")
    ).groupBy("event_type").agg(F.sum("p.k").alias("sum_k"))
    _run_to_memory(parsed, "json_stream_out", "complete", tmp_path)

    got = {
        r.event_type: r.sum_k
        for r in spark.sql("SELECT * FROM json_stream_out").collect()
    }
    assert got == {"view": 10, "click": 5}


# --- rate source + foreachBatch sink ------------------------------------


def test_rate_source_emits_rows(spark, tmp_path):
    """The synthetic rate source produces monotonically-valued rows
    through a full operator chain into a memory sink."""
    import time

    stream = read_rate(spark, rows_per_second=100, num_partitions=2).select(
        "timestamp", (F.col("value") * 2).alias("doubled")
    )
    q = (
        write_stream_sink(
            stream, "memory", path=None, checkpoint=str(tmp_path / "ckpt_rate"),
            output_mode="append", query_name="rate_out",
        )
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM rate_out").collect()[0].n
            if n >= 10:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n >= 10
    vals = spark.sql("SELECT doubled FROM rate_out").toPandas()["doubled"]
    assert (vals % 2 == 0).all()


def test_foreach_batch_sink(spark, chunk_dir, tmp_path):
    """foreachBatch gives each micro-batch to arbitrary batch-API code;
    every input row lands exactly once across batch invocations."""
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(1), "view", 2.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (3, 3, _ts(2), "view", 3.0),
    ])
    out_dir = tmp_path / "fb_out"
    seen_batches = []

    def handle(batch_df, batch_id):
        seen_batches.append(batch_id)
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(str(out_dir))

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    q = foreach_batch_sink(
        stream, handle, checkpoint=str(tmp_path / "ckpt_fb")
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(str(out_dir)).toPandas()
    assert sorted(got["event_id"].tolist()) == [1, 2, 3]
    assert len(seen_batches) >= 2  # one per chunk file


# --- checkpoint → restart resume (reference C2 savepoint semantics) -----


def test_checkpoint_restart_no_duplicates(spark, chunk_dir, tmp_path):
    """Run → stop → add input → restart from the SAME checkpoint: the
    second run must process only the new file; the exactly-once file sink
    (manifest under _spark_metadata) never shows duplicates."""
    sink = tmp_path / "restart_sink"
    ckpt = tmp_path / "restart_ckpt"
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(1), "view", 1.0),
    ])

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
        ).select("user_id", "event_id", "ts", "event_type", "value")
        q = write_stream_sink(
            stream, "parquet", str(sink), checkpoint=str(ckpt),
            output_mode="append",
        ).start()
        q.processAllAvailable()
        q.stop()

    run_once()
    first = spark.read.parquet(str(sink))
    assert first.count() == 2

    # new data lands while the query is DOWN; restart resumes from offsets
    _write_chunk(chunk_dir, "c2.parquet", [
        (3, 3, _ts(2), "view", 1.0),
    ])
    run_once()
    final = spark.read.parquet(str(sink)).toPandas()
    assert sorted(final["event_id"].tolist()) == [1, 2, 3]  # no dupes, no loss
    assert (tmp_path / "restart_sink" / "_spark_metadata").exists()


def test_savepoint_restore_no_duplicates(spark, chunk_dir, tmp_path):
    """C1 savepoint verbs: savepoint() gracefully stops a running
    file-stream query and snapshots its checkpoint; restore_from()
    materializes the snapshot as a fresh checkpoint dir; restarting the
    writer against it resumes exactly-once — new input is processed,
    nothing from before the savepoint is duplicated or lost."""
    import time as _time

    from flink_note_spark.streaming.control import restore_from, savepoint

    sink = tmp_path / "sp_sink"
    ckpt1 = tmp_path / "sp_ckpt1"
    ckpt2 = tmp_path / "sp_ckpt2"
    spdir = tmp_path / "sp_snap"
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(1), "view", 1.0),
    ])

    def launch(ckpt):
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
        ).select("user_id", "event_id", "ts", "event_type", "value")
        return write_stream_sink(
            stream, "parquet", str(sink), checkpoint=str(ckpt),
            output_mode="append", query_name="sp_job",
        ).start()

    q = launch(ckpt1)
    q.processAllAvailable()  # c1 fully committed before the savepoint
    savepoint(spark, "sp_job", str(ckpt1), str(spdir), timeout_sec=30.0)
    assert not q.isActive  # savepoint stopped the query
    assert (spdir / "offsets").is_dir()  # snapshot carries the offsets log

    # "new deployment": data lands while the job is down; the restore
    # seeds a FRESH checkpoint dir from the immutable snapshot
    _write_chunk(chunk_dir, "c2.parquet", [(3, 3, _ts(2), "view", 1.0)])
    restored = restore_from(str(spdir), str(ckpt2))
    q2 = launch(restored)
    q2.processAllAvailable()
    q2.stop()

    final = spark.read.parquet(str(sink)).toPandas()
    assert sorted(final["event_id"].tolist()) == [1, 2, 3]  # no dupes, no loss

    # the snapshot is reusable and refuses to clobber a live checkpoint
    with pytest.raises(FileExistsError):
        restore_from(str(spdir), str(ckpt2))


def test_stop_query_bounded_on_rate_source(spark, tmp_path):
    """stop_query must return within its deadline on a CONTINUOUS source
    (rate) — the shape where processAllAvailable() never returns
    (ADVICE r2 #1): the drain poll gives up at the deadline and stops."""
    import time as _time

    from flink_note_spark.streaming.control import stop_query

    rate = read_rate(spark, rows_per_second=1_000_000)
    q = (
        rate.writeStream.format("noop")
        .queryName("rate_job")
        .option("checkpointLocation", str(tmp_path / "rate_ckpt"))
        .start()
    )
    try:
        t0 = _time.monotonic()
        stop_query(spark, "rate_job", timeout_sec=3.0)
        elapsed = _time.monotonic() - t0
        assert not q.isActive
        assert elapsed < 20.0, f"stop_query took {elapsed:.1f}s on a rate source"
    finally:
        if q.isActive:
            q.stop()


# --- side outputs (OutputTag routing) -----------------------------------


def test_side_outputs_batch_routing(spark):
    from flink_note_spark.streaming.ops import side_outputs

    df = spark.createDataFrame(
        [(1, "view", 10.0), (2, "click", 5.0), (3, "error", 0.0), (4, "view", 99.0)],
        "user_id long, event_type string, value double",
    )
    outs = side_outputs(
        df,
        {
            "errors": F.col("event_type") == "error",
            "big": F.col("value") > 50,
        },
    )
    assert sorted(r.user_id for r in outs["errors"].collect()) == [3]
    assert sorted(r.user_id for r in outs["big"].collect()) == [4]
    # main = rows matching NO tag
    assert sorted(r.user_id for r in outs["main"].collect()) == [1, 2]


def test_side_outputs_row_can_reach_multiple_tags(spark):
    from flink_note_spark.streaming.ops import side_outputs

    df = spark.createDataFrame(
        [(1, "error", 99.0)], "user_id long, event_type string, value double"
    )
    outs = side_outputs(
        df,
        {"errors": F.col("event_type") == "error", "big": F.col("value") > 50},
    )
    assert outs["errors"].count() == 1 and outs["big"].count() == 1
    assert outs["main"].count() == 0


def test_side_outputs_tag_name_collision(spark):
    from flink_note_spark.streaming.ops import side_outputs

    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError):
        side_outputs(df, {"main": F.lit(True)})


def test_side_outputs_streaming_twin(spark, chunk_dir, tmp_path):
    """Each tagged output runs as its own streaming query over the same
    file source and lands the rows its predicate selects."""
    from flink_note_spark.streaming.ops import side_outputs

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(1), "error", 2.0),
        (3, 3, _ts(2), "view", 80.0),
    ])
    stream = read_file_stream(spark, "parquet", str(chunk_dir), EVENT_SCHEMA)
    outs = side_outputs(
        stream,
        {"errors": F.col("event_type") == "error", "big": F.col("value") > 50},
    )
    assert all(df.isStreaming for df in outs.values())
    _run_to_memory(outs["errors"], "so_errors", "append", tmp_path)
    _run_to_memory(outs["main"], "so_main", "append", tmp_path)
    errs = spark.sql("select user_id from so_errors").collect()
    mains = spark.sql("select user_id from so_main").collect()
    assert sorted(r.user_id for r in errs) == [2]
    assert sorted(r.user_id for r in mains) == [1]


def test_route_to_sinks_single_materialization_no_loss(spark, chunk_dir, tmp_path):
    """route_to_sinks must (a) deliver every row to exactly the sinks
    whose predicates match — same routing as batch side_outputs,
    including rows matching several tags and NULL→main — and (b)
    materialize each micro-batch ONCE for all sinks: an accumulator
    bumped per evaluated row must equal the row count, not
    n_sinks × rows (the naive per-tag-query fan-out pays the latter)."""
    from flink_note_spark.streaming.ops import route_to_sinks, side_outputs

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(1), "error", 2.0),
        (3, 3, _ts(2), "error", 80.0),   # matches BOTH tags
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (4, 4, _ts(3), "view", 99.0),
        (5, 5, _ts(4), "view", None),    # NULL predicate → main
    ])

    acc = spark.sparkContext.accumulator(0)

    @F.udf("double")
    def probe(v):
        acc.add(1)
        return v

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    ).withColumn("value", probe(F.col("value")))

    tags = {"errors": F.col("event_type") == "error", "big": F.col("value") > 50}
    got: dict[str, list] = {"errors": [], "big": [], "main": []}

    def make_sink(name):
        def sink(batch_df, batch_id):
            got[name].extend(r.event_id for r in batch_df.collect())
        return sink

    q = route_to_sinks(
        stream, tags, {n: make_sink(n) for n in got},
        checkpoint=str(tmp_path / "ckpt_route"),
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # routing equals the batch side_outputs oracle on the same data
    static = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    oracle = side_outputs(static, tags)
    for name in got:
        want = sorted(r.event_id for r in oracle[name].collect())
        assert sorted(got[name]) == want, name
    assert sorted(got["errors"]) == [2, 3]
    assert sorted(got["big"]) == [3, 4]
    assert sorted(got["main"]) == [1, 5]
    # one materialization per batch: 5 rows evaluated once each
    assert acc.value == 5


def test_route_to_sinks_rejects_unknown_tag_sink(spark, chunk_dir):
    from flink_note_spark.streaming.ops import route_to_sinks

    stream = read_file_stream(spark, "parquet", str(chunk_dir), EVENT_SCHEMA)
    with pytest.raises(ValueError, match="unknown tags"):
        route_to_sinks(
            stream, {"errors": F.col("event_type") == "error"},
            {"nope": lambda df, bid: None},
        )


def test_side_outputs_null_predicate_rows_reach_main(spark):
    """A row whose tag predicate evaluates to NULL (e.g. NULL column)
    matches no tag and must land in main — not vanish to three-valued
    logic."""
    from flink_note_spark.streaming.ops import side_outputs

    df = spark.createDataFrame(
        [(1, None), (2, 99.0)], "user_id long, value double"
    )
    outs = side_outputs(df, {"big": F.col("value") > 50})
    assert sorted(r.user_id for r in outs["big"].collect()) == [2]
    assert sorted(r.user_id for r in outs["main"].collect()) == [1]


# --- streaming CEP (strict contiguity) ----------------------------------


def test_cep_stream_equals_batch(spark, chunk_dir, tmp_path):
    """Strict-contiguity pattern matches emit exactly once, across
    micro-batch boundaries, equal to the batch operator on the same
    bounded input; a too-slow sequence is excluded by within()."""
    from flink_note_spark.operators.cep import match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    # key 1: A(0) B(2) in batch 1, C(4) in batch 2  → one cross-batch match
    # key 2: A(0) X(2) B(4) C(6)                    → noise breaks adjacency
    # key 3: A(0) B(30) C(31)                       → breaches within=20min
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),
        (1, 2, _ts(2), "B", 1.0),
        (2, 3, _ts(0), "A", 1.0),
        (2, 4, _ts(2), "X", 1.0),
        (3, 5, _ts(0), "A", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 6, _ts(4), "C", 1.0),
        (2, 7, _ts(4), "B", 1.0),
        (2, 8, _ts(6), "C", 1.0),
        (3, 9, _ts(30), "B", 1.0),
        (3, 10, _ts(31), "C", 1.0),
    ])
    # sentinel pushes the watermark past every buffered event + timer
    _write_chunk(chunk_dir, "c3.parquet", [(99, 11, _ts(120), "Z", 1.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(
        stream, ["A", "B", "C"], within="20 minutes", watermark="5 minutes"
    )
    _run_to_memory(out, "cep_stream_out", "update", tmp_path)
    got = spark.sql("SELECT * FROM cep_stream_out").toPandas()

    batch = match_pattern(
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)),
        ["A", "B", "C"],
        within="20 minutes",
        contiguity="strict",
        tiebreak=["event_type"],
    ).toPandas()

    us = lambda m: int(
        _ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    got_rows = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]), int(r["ts_3"]))
        for _, r in got.iterrows()
    )
    batch_rows = sorted(
        (
            int(r["user_id"]),
            int(r["ts_1"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
            int(r["ts_2"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
            int(r["ts_3"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
        )
        for _, r in batch.iterrows()
    )
    assert got_rows == batch_rows == [(1, us(0), us(2), us(4))]


def test_cep_stream_no_reemission_on_overlap(spark, chunk_dir, tmp_path):
    """Overlapping matches all emit, each exactly once, even when the
    watermark finalizes them across several batches."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    # A B A B A B → strict A-B matches at (0,1) (4,5) (8,9)
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),
        (1, 2, _ts(1), "B", 1.0),
        (1, 3, _ts(4), "A", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 4, _ts(5), "B", 1.0),
        (1, 5, _ts(8), "A", 1.0),
        (1, 6, _ts(9), "B", 1.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 7, _ts(60), "Z", 1.0)])
    _write_chunk(chunk_dir, "c4.parquet", [(99, 8, _ts(120), "Z", 1.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(stream, ["A", "B"], watermark="2 minutes")
    _run_to_memory(out, "cep_overlap_out", "update", tmp_path)
    got = spark.sql("SELECT * FROM cep_overlap_out").toPandas()

    us = lambda m: int(
        _ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    rows = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]))
        for _, r in got.iterrows()
    )
    assert rows == [
        (1, us(0), us(1)),
        (1, us(4), us(5)),
        (1, us(8), us(9)),
    ]


def test_cep_stream_times_quantifier(spark, chunk_dir, tmp_path):
    """A times(n)-quantified Pattern runs on the incremental matcher via
    positional expansion (output columns are the EXPANDED positions
    ts_1..ts_k); loop/negation steps raise — batch-only."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),
        (1, 2, _ts(1), "B", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 3, _ts(2), "B", 1.0),
        (2, 4, _ts(0), "A", 1.0),
        (2, 5, _ts(1), "B", 1.0),
        (2, 6, _ts(2), "X", 1.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 7, _ts(120), "Z", 1.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    p = Pattern.begin("A").next("B").times(2)
    out = match_pattern_stream(stream, p, watermark="2 minutes")
    _run_to_memory(out, "cep_times_out", "update", tmp_path)
    got = spark.sql("SELECT * FROM cep_times_out").toPandas()

    us = lambda m: int(
        _ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    rows = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]), int(r["ts_3"]))
        for _, r in got.iterrows()
    )
    assert rows == [(1, us(0), us(1), us(2))]

    batch = match_pattern(
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)),
        ["A", {"type": "B", "times": 2}],
        contiguity="strict",
        tiebreak=["event_type"],
    ).toPandas()
    batch_rows = sorted(
        (
            int(r["user_id"]),
            int(r["ts_1"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
            int(r["ts_2"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
            int(r["ts_2_last"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
        )
        for _, r in batch.iterrows()
    )
    assert rows == batch_rows

    with pytest.raises(ValueError, match="batch-only"):
        match_pattern_stream(
            stream,
            ["A", {"type": "B", "one_or_more": True}],
            watermark="2 minutes",
        )


def test_cep_stream_dict_spec_mode_decides_contiguity(spark, chunk_dir, tmp_path):
    """Review r6 #3: step-level 'mode' in dict specs decides the
    streaming matcher (a relaxed-mode spec used to silently run the
    strict matcher). A X B only matches relaxed."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),
        (1, 2, _ts(1), "X", 1.0),
        (1, 3, _ts(2), "B", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [(99, 4, _ts(120), "Z", 1.0)])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(
        stream,
        [{"type": "A", "mode": "relaxed"}, {"type": "B", "mode": "relaxed"}],
        within="20 minutes",
        watermark="2 minutes",
    )
    _run_to_memory(out, "cep_mode_out", "update", tmp_path)
    got = spark.sql("SELECT * FROM cep_mode_out").toPandas()
    us = lambda m: int(
        _ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    rows = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]))
        for _, r in got.iterrows()
    )
    assert rows == [(1, us(0), us(2))]  # strict would find nothing


def test_cep_stream_event_at_exact_watermark_still_matches(spark, chunk_dir, tmp_path):
    """ADVICE r5 boundary pin: Spark's late filter drops only ts < wm,
    so an event with ts EXACTLY == the previous watermark can still
    arrive — a relaxed match completing at ts_k == wm_prev must emit
    (the old `wm_prev < ts_k` gate silently never emitted it)."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    # batch 1: A@0 (key 1) + W@10 (other key) → wm = 10 − 5 = 5 min
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),
        (7, 2, _ts(10), "W", 1.0),
    ])
    # batch 2: B arrives with ts EXACTLY == the current watermark (5)
    _write_chunk(chunk_dir, "c2.parquet", [(1, 3, _ts(5), "B", 1.0)])
    # batch 3: sentinel pushes the watermark far past everything
    _write_chunk(chunk_dir, "c3.parquet", [(99, 4, _ts(120), "Z", 1.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(
        stream, ["A", "B"], within="20 minutes", watermark="5 minutes",
        contiguity="relaxed",
    )
    _run_to_memory(out, "cep_boundary_out", "update", tmp_path)
    got = spark.sql("SELECT * FROM cep_boundary_out").toPandas()
    us = lambda m: int(
        _ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    rows = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]))
        for _, r in got.iterrows()
    )
    assert rows == [(1, us(0), us(5))], (
        "the boundary match at ts_k == wm_prev was dropped or duplicated"
    )


def test_cep_stream_contiguity_resolution_matches_batch(spark):
    """Review r6 parity: identical specs must resolve to the same
    contiguity in both engines — first-step-only mode acts as the
    pattern default, step modes beat the argument, mixed raises."""
    from flink_note_spark.operators.cep import (
        _normalize,
        _resolve_contiguity,
    )

    cases = [
        ([{"type": "A", "mode": "relaxed"}, {"type": "B"}], None, "relaxed"),
        ([{"type": "A"}, {"type": "B"}], None, "strict"),
        ([{"type": "A", "mode": "relaxed"},
          {"type": "B", "mode": "relaxed"}], "strict", "relaxed"),
        ([{"type": "A", "mode": "strict"},
          {"type": "B", "mode": "relaxed"}], None, "relaxed"),
        ([{"type": "A"}, {"type": "B", "mode": "strict"},
          {"type": "C", "mode": "relaxed"}], None, "mixed"),
    ]
    for spec, arg, want in cases:
        got = _resolve_contiguity(_normalize(spec), arg)
        assert got == want, f"{spec} arg={arg}: {got} != {want}"


def test_tag_late_data_flags_late_rows(spark, chunk_dir, tmp_path):
    """sideOutputLateData analogue: rows older than the engine watermark
    surface with is_late=true instead of disappearing."""
    from flink_note_spark.streaming.ops import tag_late_data

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (1, 2, _ts(30), "view", 1.0),   # advances watermark to 30-5=25
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 3, _ts(10), "view", 1.0),   # ts 10 <= wm 25 → late
        (1, 4, _ts(40), "view", 1.0),   # on time
    ])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = tag_late_data(stream, "user_id", "ts", watermark="5 minutes")
    _run_to_memory(out, "late_tag_out", "update", tmp_path)
    got = spark.sql("SELECT event_id, is_late FROM late_tag_out").toPandas()
    flags = dict(zip(got["event_id"].astype(int), got["is_late"]))
    assert len(flags) == 4, f"late rows were dropped, not tagged: {flags}"
    assert flags[3] is True or flags[3] == True  # noqa: E712
    assert not flags[1] and not flags[2] and not flags[4]


def test_stream_static_join_picks_up_rule_updates(spark, chunk_dir, tmp_path):
    """Flink broadcast-state analogue, Spark idiom: dynamic rule
    distribution = a fresh read of the rules table INSIDE foreachBatch
    (a static DataFrame captures its file listing at plan time, so
    overwriting the directory under a long-lived plan is a
    FAILED_READ_FILE, not an update — re-reading per batch is the
    documented pattern for slowly-changing enrichment)."""
    rules_dir = str(tmp_path / "rules")
    spark.createDataFrame(
        [("view", "low")], "event_type string, severity string"
    ).write.mode("overwrite").parquet(rules_dir)

    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "view", 1.0)])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    seen: list[tuple[int, str]] = []

    def enrich(batch_df, batch_id):
        rules = batch_df.sparkSession.read.parquet(rules_dir)
        for r in batch_df.join(rules, "event_type", "left").collect():
            seen.append((int(r["event_id"]), r["severity"]))

    q = (
        foreach_batch_sink(
            stream, enrich, checkpoint=str(tmp_path / "ckpt_rules")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        # rule flip between batches: view is now HIGH severity
        spark.createDataFrame(
            [("view", "high")], "event_type string, severity string"
        ).write.mode("overwrite").parquet(rules_dir)
        _write_chunk(chunk_dir, "c2.parquet", [(1, 2, _ts(1), "view", 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    assert sorted(seen) == [(1, "low"), (2, "high")]


def test_session_window_dynamic_gap(spark, chunk_dir, tmp_path):
    """Per-row dynamic session gaps (Flink's session windows with a gap
    extractor): purchase events hold sessions open 3x longer than other
    types, so the same inter-event spacing merges for purchases and
    splits for views. One query; the sentinel chunk advances the
    watermark in a later micro-batch of the same drain so append mode
    emits the closed sessions."""
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "view", 1.0),
        (1, 2, _ts(8), "view", 1.0),
        (2, 3, _ts(0), "purchase", 1.0),
        (2, 4, _ts(8), "purchase", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [(99, 9, _ts(120), "view", 1.0)])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    gap = F.when(F.col("event_type") == "purchase", "15 minutes").otherwise(
        "5 minutes"
    )
    out = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _run_to_memory(out, "dyn_gap_out", "append", tmp_path)
    rows = spark.sql(
        "SELECT user_id, n FROM dyn_gap_out WHERE user_id < 99"
    ).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(int(r["user_id"]), []).append(int(r["n"]))
    # user 1: 8-minute spacing beats the 5-minute view gap -> two sessions
    assert sorted(per_user[1]) == [1, 1]
    # user 2: the 15-minute purchase gap bridges the same spacing -> one
    assert per_user[2] == [2]


def test_cep_stream_relaxed_equals_batch(spark, chunk_dir, tmp_path):
    """Relaxed (followedBy) streaming CEP equals the batch operator on
    the same bounded input, across micro-batch boundaries: noise between
    steps is skipped, each step binds the earliest later event, matches
    emit exactly once as the watermark passes them."""
    from flink_note_spark.operators.cep import match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    # key 1: A X B noise sequence completing across batches
    # key 2: two As sharing the same (earliest) B and C
    # key 3: sequence breaches within=20min
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),
        (1, 2, _ts(2), "X", 1.0),
        (1, 3, _ts(4), "B", 1.0),
        (2, 4, _ts(0), "A", 1.0),
        (2, 5, _ts(1), "A", 1.0),
        (3, 6, _ts(0), "A", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 7, _ts(6), "C", 1.0),
        (2, 8, _ts(3), "B", 1.0),
        (2, 9, _ts(5), "C", 1.0),
        (3, 10, _ts(30), "B", 1.0),
        (3, 11, _ts(31), "C", 1.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 12, _ts(120), "Z", 1.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(
        stream, ["A", "B", "C"], within="20 minutes",
        watermark="5 minutes", contiguity="relaxed",
    )
    _run_to_memory(out, "cep_relaxed_out", "update", tmp_path)
    got = spark.sql("SELECT * FROM cep_relaxed_out").toPandas()

    batch = match_pattern(
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)),
        ["A", "B", "C"],
        within="20 minutes",
        contiguity="relaxed",
    ).toPandas()

    us = lambda m: int(
        _ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    got_rows = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]), int(r["ts_3"]))
        for _, r in got.iterrows()
    )
    batch_rows = sorted(
        (
            int(r["user_id"]),
            int(r["ts_1"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
            int(r["ts_2"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
            int(r["ts_3"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6),
        )
        for _, r in batch.iterrows()
    )
    # noise-skipping match for key 1; BOTH key-2 starts complete with
    # the shared earliest successors; key 3 excluded by within
    assert got_rows == batch_rows == [
        (1, us(0), us(4), us(6)),
        (2, us(0), us(3), us(5)),
        (2, us(1), us(3), us(5)),
    ]


def test_cep_stream_relaxed_requires_within(spark, chunk_dir):
    from flink_note_spark.streaming.ops import match_pattern_stream

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    with pytest.raises(ValueError, match="within"):
        match_pattern_stream(stream, ["A", "B"], contiguity="relaxed")


def test_cep_stream_survives_checkpoint_restart(spark, chunk_dir, tmp_path):
    """Streaming CEP state (event buffer + watermark bookkeeping) must
    survive a stop/restart from the checkpoint: a match whose prefix
    arrived BEFORE the stop and whose completion arrives AFTER must
    emit exactly once, with no duplicate of matches already emitted."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    sink = tmp_path / "cep_restart_sink"
    ckpt = tmp_path / "cep_restart_ckpt"

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(
            stream, ["A", "B"], within="30 minutes",
            watermark="2 minutes", contiguity="relaxed",
        )

        # update-mode stateful op → append file sink is rejected; write
        # each micro-batch's (final, exactly-once) matches via
        # foreachBatch instead
        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    # run 1: a completed match (0,1) finalized by the sentinel's
    # watermark, plus a dangling A at minute 10 awaiting its B
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),
        (1, 2, _ts(1), "B", 1.0),
        (1, 3, _ts(10), "A", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [(99, 4, _ts(20), "Z", 1.0)])
    run_once()
    us = lambda m: int(
        _ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    first = spark.read.parquet(str(sink))
    assert sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]))
        for r in first.collect()
    ) == [(1, us(0), us(1))]

    # while DOWN: the dangling A's B arrives, plus a fresh sentinel
    _write_chunk(chunk_dir, "c3.parquet", [(1, 5, _ts(21), "B", 1.0)])
    _write_chunk(chunk_dir, "c4.parquet", [(99, 6, _ts(60), "Z", 1.0)])
    run_once()
    final = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    # restored buffer completed (10 -> 21); run-1 match NOT re-emitted
    assert final == [(1, us(0), us(1)), (1, us(10), us(21))]


def test_count_window_stream_matches_batch_on_bounded_input(spark, chunk_dir, tmp_path):
    """countWindow twin: full windows emit with exact aggregates; the
    partial tail stays buffered (Flink's open count window); on one
    bounded batch the assignment equals the batch count_window."""
    from flink_note_spark.operators.windows import count_window
    from flink_note_spark.streaming.ops import count_window_stream

    rows = [
        (1, i, _ts(i), "view", float(i)) for i in range(7)   # 7 events: 3+3+1
    ] + [(2, 10 + i, _ts(i), "view", 1.0) for i in range(3)]  # exactly one window
    _write_chunk(chunk_dir, "c1.parquet", rows)

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA
    )
    out = count_window_stream(stream, key="user_id", ts_col="ts", size=3)
    _run_to_memory(out, "cw_out", "update", tmp_path)
    got = sorted(
        (int(r["user_id"]), int(r["window_id"]), int(r["n_events"]),
         float(r["sum_value"]))
        for _, r in spark.sql("SELECT * FROM cw_out").toPandas().iterrows()
    )
    assert got == [
        (1, 0, 3, 3.0),    # 0+1+2
        (1, 1, 3, 12.0),   # 3+4+5; event 6 stays buffered (partial)
        (2, 0, 3, 3.0),
    ]

    batch = count_window(
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)),
        key="user_id", ts="ts", size=3, tiebreak="event_id",
    )
    from pyspark.sql import functions as F
    bagg = sorted(
        (int(r["user_id"]), int(r["window_id"]), int(r["n"]),
         float(r["sv"]))
        for r in batch.groupBy("user_id", "window_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .filter(F.col("n") == 3)
        .collect()
    )
    assert got == bagg


# --- general streaming CEP: negation + greedy loops (r7) ----------------


def _us(minute: float) -> int:
    return int(
        _ts(minute).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


def _stream_rows(spark, table: str, cols: list[str]):
    got = spark.sql(f"SELECT * FROM {table}").toPandas()
    return sorted(
        tuple(int(r[c]) for c in cols) for _, r in got.iterrows()
    )


def _batch_rows(batch_df, cols: list[str]):
    out = []
    for _, r in batch_df.toPandas().iterrows():
        vals = []
        for c in cols:
            v = r[c]
            if hasattr(v, "timestamp"):
                v = int(
                    v.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
                )
            vals.append(int(v))
        out.append(tuple(vals))
    return sorted(out)


def test_cep_stream_not_followed_by_equals_batch(spark, chunk_dir, tmp_path):
    """q87's relaxed negation pattern (V ¬C P within) runs incrementally:
    absence verdicts finalize at the anchor's within-horizon, across
    micro-batch boundaries; a click at exactly the purchase timestamp
    does NOT break the match (open interval, batch rule)."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 1.0),          # match: no click before P(4)
        (2, 2, _ts(0), "V", 1.0),          # broken by C(2)
        (2, 3, _ts(2), "C", 1.0),
        (3, 4, _ts(0), "V", 1.0),          # C at exactly P's ts: match
        (5, 5, _ts(0), "V", 1.0),          # P lands in a LATER batch
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 6, _ts(4), "P", 1.0),
        (2, 7, _ts(4), "P", 1.0),
        (3, 8, _ts(4), "C", 1.0),
        (3, 9, _ts(4), "P", 1.0),
        (4, 10, _ts(0), "V", 1.0),         # P beyond within: no match
        (4, 11, _ts(30), "P", 1.0),
        (5, 12, _ts(6), "P", 1.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 13, _ts(120), "Z", 1.0)])

    p = (
        Pattern.begin("V").not_followed_by("C").followed_by("P")
        .within("20 minutes")
    )
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(stream, p, watermark="2 minutes")
    _run_to_memory(out, "cep_neg_out", "update", tmp_path)

    cols = ["user_id", "ts_1", "ts_2"]
    got = _stream_rows(spark, "cep_neg_out", cols)
    batch = match_pattern(
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)), p
    )
    assert got == _batch_rows(batch, cols)
    assert got == [
        (1, _us(0), _us(4)),
        (3, _us(0), _us(4)),
        (5, _us(0), _us(6)),
    ]


def test_cep_stream_one_or_more_until_equals_batch(spark, chunk_dir, tmp_path):
    """q88's relaxed greedy loop (V C+ until P, then P, within): loop
    runs finalize at the anchor horizon — a run that grows across
    micro-batches emits once, with the full count."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 1.0),
        (1, 2, _ts(2), "C", 1.0),
        (1, 3, _ts(3), "C", 1.0),
        (2, 4, _ts(0), "V", 1.0),          # no click: no match
        (3, 5, _ts(0), "V", 1.0),          # clicks stop at first P
        (3, 6, _ts(2), "C", 1.0),
        (4, 7, _ts(0), "V", 1.0),          # run split across batches
        (4, 8, _ts(1), "C", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 9, _ts(5), "P", 1.0),
        (2, 10, _ts(3), "P", 1.0),
        (3, 11, _ts(4), "P", 1.0),
        (3, 12, _ts(6), "C", 1.0),
        (3, 13, _ts(8), "P", 1.0),
        (4, 14, _ts(3), "C", 1.0),
        (4, 15, _ts(6), "P", 1.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 16, _ts(120), "Z", 1.0)])

    p = (
        Pattern.begin("V")
        .followed_by("C").one_or_more().until("P")
        .followed_by("P")
        .within("20 minutes")
    )
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(stream, p, watermark="2 minutes")
    _run_to_memory(out, "cep_oom_out", "update", tmp_path)

    cols = ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"]
    got = _stream_rows(spark, "cep_oom_out", cols)
    batch = match_pattern(
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)), p
    )
    assert got == _batch_rows(batch, cols)
    assert got == [
        (1, _us(0), _us(2), _us(3), 2, _us(5)),
        (3, _us(0), _us(2), _us(2), 1, _us(4)),
        (4, _us(0), _us(1), _us(3), 2, _us(6)),
    ]


def test_cep_stream_strict_not_next_equals_batch(spark, chunk_dir, tmp_path):
    """Strict non-terminal negation (A ¬X B): the assertion's position
    is consumed by B, so finality is the plain strict rule — across
    batches, with no within required."""
    from flink_note_spark.operators.cep import match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),          # A B adjacent: match
        (2, 2, _ts(0), "A", 1.0),          # A X B: negation breaks it
        (2, 3, _ts(1), "X", 1.0),
        (3, 4, _ts(0), "A", 1.0),          # B arrives next batch
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 5, _ts(1), "B", 1.0),
        (2, 6, _ts(2), "B", 1.0),
        (3, 7, _ts(3), "B", 1.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 8, _ts(120), "Z", 1.0)])

    spec = ["A", {"type": "X", "negate": True}, "B"]
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(
        stream, spec, watermark="2 minutes", contiguity="strict"
    )
    _run_to_memory(out, "cep_nn_out", "update", tmp_path)

    cols = ["user_id", "ts_1", "ts_2"]
    got = _stream_rows(spark, "cep_nn_out", cols)
    batch = match_pattern(
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)), spec,
        contiguity="strict", tiebreak=["event_type"],
    )
    assert got == _batch_rows(batch, cols)
    assert got == [(1, _us(0), _us(1)), (3, _us(0), _us(3))]


def test_cep_stream_strict_one_or_more_equals_batch(spark, chunk_dir, tmp_path):
    """Strict greedy loop (A B+ C, within): the maximal consecutive run
    is capped by its consumed successor, so a run growing across the
    batch boundary emits once with the full length."""
    from flink_note_spark.operators.cep import match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "A", 1.0),
        (1, 2, _ts(1), "B", 1.0),
        (1, 3, _ts(2), "B", 1.0),
        (2, 4, _ts(0), "A", 1.0),          # noise caps the run before C
        (2, 5, _ts(1), "B", 1.0),
        (2, 6, _ts(2), "X", 1.0),
        (3, 7, _ts(0), "A", 1.0),          # run continues next batch
        (3, 8, _ts(1), "B", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 9, _ts(3), "C", 1.0),
        (2, 10, _ts(3), "C", 1.0),
        (3, 11, _ts(3), "B", 1.0),
        (3, 12, _ts(4), "C", 1.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 13, _ts(120), "Z", 1.0)])

    spec = ["A", {"type": "B", "one_or_more": True}, "C"]
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA, max_files_per_trigger=1
    )
    out = match_pattern_stream(
        stream, spec, within="20 minutes", watermark="2 minutes",
        contiguity="strict",
    )
    _run_to_memory(out, "cep_soom_out", "update", tmp_path)

    cols = ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"]
    got = _stream_rows(spark, "cep_soom_out", cols)
    batch = match_pattern(
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)), spec,
        within="20 minutes", contiguity="strict", tiebreak=["event_type"],
    )
    assert got == _batch_rows(batch, cols)
    assert got == [
        (1, _us(0), _us(1), _us(2), 2, _us(3)),
        (3, _us(0), _us(1), _us(3), 2, _us(4)),
    ]


def test_cep_stream_general_random_soup_equals_batch(spark, chunk_dir, tmp_path):
    """Seeded event soup, 4 micro-batches: the general streaming engine
    equals batch for BOTH q87-shape negation and q88-shape loops —
    the boundary/eviction/exactly-once cases a handcrafted fixture
    misses."""
    import random

    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    rng = random.Random(77)
    minutes = rng.sample(range(0, 300), 90)   # distinct event times
    rows = sorted(
        [
            (
                rng.randrange(1, 7),
                i,
                _ts(m),
                rng.choice(["V", "C", "P", "Z"]),
                1.0,
            )
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    chunks = [rows[:25], rows[25:50], rows[50:75], rows[75:]]
    for i, ch in enumerate(chunks):
        _write_chunk(chunk_dir, f"c{i}.parquet", ch)
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 1.0)])

    pats = {
        "neg": Pattern.begin("V").not_followed_by("C")
        .followed_by("P").within("45 minutes"),
        "loop": Pattern.begin("V").followed_by("C").one_or_more()
        .until("P").followed_by("P").within("45 minutes"),
    }
    cols = {
        "neg": ["user_id", "ts_1", "ts_2"],
        "loop": ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
    }
    runs = []
    for name, p in pats.items():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="3 minutes")
        runs.append((out, f"cep_soup_{name}", "update"))
    _run_many_to_memory(runs, tmp_path)
    for name, p in pats.items():
        got = _stream_rows(spark, f"cep_soup_{name}", cols[name])
        batch = match_pattern(
            spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)), p
        )
        assert got == _batch_rows(batch, cols[name]), name
        assert got, name  # non-vacuous: the soup contains matches


def test_cep_stream_general_survives_checkpoint_restart(spark, chunk_dir, tmp_path):
    """General-engine state (buffer + horizon bookkeeping) survives a
    stop/restart: a loop run whose completion arrives after the restart
    emits exactly once; pre-restart emissions are not duplicated."""
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    sink = tmp_path / "cep_gen_restart_sink"
    ckpt = tmp_path / "cep_gen_restart_ckpt"
    p = (
        Pattern.begin("V")
        .followed_by("C").one_or_more().until("P")
        .followed_by("P")
        .within("30 minutes")
    )

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="2 minutes")

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    # run 1: one decided match (anchor 0, horizon 30 < wm 58), one
    # anchor at 35 still inside its horizon when the run stops
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 1.0),
        (1, 2, _ts(1), "C", 1.0),
        (1, 3, _ts(2), "P", 1.0),
        (1, 4, _ts(35), "V", 1.0),
        (1, 5, _ts(36), "C", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [(99, 6, _ts(60), "Z", 1.0)])
    run_once()
    first = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["n_2"]), int(r["ts_3"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert first == [(1, _us(0), 1, _us(2))]

    # while DOWN: the second anchor's run extends and completes (ts
    # strictly above the restored watermark 58 — an event at exactly
    # ts == wm is dropped by the engine's late filter)
    _write_chunk(chunk_dir, "c3.parquet", [
        (1, 7, _ts(59), "C", 1.0),
        (1, 8, _ts(62), "P", 1.0),
    ])
    _write_chunk(chunk_dir, "c4.parquet", [(99, 9, _ts(180), "Z", 1.0)])
    run_once()
    final = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["n_2"]), int(r["ts_3"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert final == [
        (1, _us(0), 1, _us(2)),
        (1, _us(35), 2, _us(62)),
    ]


def test_cep_stream_general_rejections(spark, chunk_dir, tmp_path):
    """The general engine's documented batch-only edges fail loudly."""
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "A", 1.0)])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA
    )
    with pytest.raises(ValueError, match="end with a positive"):
        match_pattern_stream(
            stream, Pattern.begin("A").not_next("X"), watermark="1 minutes"
        )
    with pytest.raises(ValueError, match="end with a positive"):
        match_pattern_stream(
            stream,
            Pattern.begin("A").next("B").one_or_more().within("5 minutes"),
            watermark="1 minutes",
        )
    with pytest.raises(ValueError, match="requires\\s+within"):
        match_pattern_stream(
            stream,
            ["A", {"type": "B", "one_or_more": True}, "C"],
            watermark="1 minutes", contiguity="strict",
        )
    # optional() is ACCEPTED since r8 (variants engine; equality tests
    # in test_cep_stream_optional_*); plain mixed contiguity is
    # ACCEPTED since late-r8 and mixed LOOPS since r9 (positional
    # engine; equality tests in test_cep_stream_mixed_*) — only a
    # TERMINAL strict loop stays refused (run maximality asserts on
    # the event after it)
    with pytest.raises(ValueError, match="batch-only"):
        match_pattern_stream(
            stream,
            [{"type": "A", "mode": "relaxed"},
             {"type": "B", "mode": "strict", "one_or_more": True}],
            within="5 minutes", watermark="1 minutes",
        )


def test_cep_stream_carry_payload_equals_batch_attach(
    spark, chunk_dir, tmp_path
):
    """r9 carry_payload on the strict general engine: captured payload
    values (incl. across a negation, which shifts positive indices)
    equal the batch operator + attach_event_payload join, across
    micro-batch boundaries."""
    from flink_note_spark.operators.cep import (
        attach_event_payload,
        match_pattern,
    )
    from flink_note_spark.streaming.ops import match_pattern_stream

    rows = [
        (1, 1, _ts(0), "V", 10.0),
        (1, 2, _ts(1), "C", 20.0),
        (1, 3, _ts(2), "P", 30.0),
        (2, 4, _ts(0), "V", 1.0),
        (2, 5, _ts(1), "Z", 2.0),   # negation hit: no match for key 2
        (2, 6, _ts(2), "C", 3.0),
        (2, 7, _ts(3), "P", 4.0),
        (1, 8, _ts(10), "V", 50.0),
        (1, 9, _ts(11), "C", 60.0),
        (1, 10, _ts(12), "P", 70.0),
    ]
    _write_chunk(chunk_dir, "c1.parquet", rows[:5])
    _write_chunk(chunk_dir, "c2.parquet", rows[5:])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 99, _ts(120), "Q", 0.0)])
    pat = [
        {"type": "V"}, {"type": "Z", "negate": True},
        {"type": "C"}, {"type": "P"},
    ]
    cols = ["user_id", "ts_1", "ts_2", "ts_3",
            "ts_1_value", "ts_3_value"]

    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    m = match_pattern(
        batch_df, pat, contiguity="strict", within="30 minutes"
    )
    want = sorted(
        (int(r["user_id"]), int(r["ts_1"].timestamp() * 1e6),
         float(r["ts_1_value"]), float(r["ts_3_value"]))
        for r in attach_event_payload(
            m, batch_df.select("user_id", "ts", "value"),
            ["ts_1", "ts_3"], payload_cols=["value"],
        ).collect()
    )

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_stream(
        stream, pat, contiguity="strict", within="30 minutes",
        watermark="2 minutes",
        carry_payload={"ts_1": ["value"], "ts_3": ["value"]},
    )
    assert out.columns == cols
    _run_to_memory(out, "cep_carry", "update", tmp_path)
    got = sorted(
        (int(r["user_id"]), int(r["ts_1"]),
         float(r["ts_1_value"]), float(r["ts_3_value"]))
        for r in spark.sql("SELECT * FROM cep_carry").collect()
    )
    assert got == want
    assert got == [
        (1, _us(0), 10.0, 30.0),
        (1, _us(10), 50.0, 70.0),
    ]


def test_cep_stream_terminal_loop_refusal_counterexample(spark):
    """PINNED counterexample (r9, VERDICT r8 item 4) for the strict
    TERMINAL-loop refusal: no watermark horizon can finalize ``A B+``
    — the run's maximality hinges on the NEXT positional event, which
    may arrive at any later event time (or never). Batch over a prefix
    emits (n=2); one more B flips the same anchor's capture to (n=3):
    no prefix decision is ever final, so the streaming refusal is
    semantic, not an implementation gap."""
    from flink_note_spark.operators.cep import match_pattern

    def run(rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        return {
            tuple(r) for r in match_pattern(
                df, ["A", {"type": "B", "one_or_more": True}],
                contiguity="strict",
            ).collect()
        }

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    prefix = [(1, t(0), "A"), (1, t(1), "B"), (1, t(2), "B")]
    with_late_b = prefix + [(1, t(59), "B")]  # arbitrarily later
    got_prefix = run(prefix)
    got_full = run(with_late_b)
    assert got_prefix == {(1, t(0), t(1), t(2), 2)}
    assert got_full == {(1, t(0), t(1), t(59), 3)}
    assert got_prefix != got_full  # the prefix decision was not final


def test_cep_stream_skip_strategies_equal_batch(spark, chunk_dir, tmp_path):
    """r7 streaming AfterMatchSkipStrategy: on a seeded soup split
    into micro-batches, every relaxed-mode strategy equals the batch
    operator run with the same skip_strategy (prefix emission via the
    per-anchor recursion; sequential pruning via the carried bound)."""
    import random

    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    rng = random.Random(41)
    minutes = rng.sample(range(0, 300), 90)
    rows = sorted(
        [
            (rng.randrange(1, 7), i, _ts(m),
             rng.choice(["V", "C", "P", "Z"]), 1.0)
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet",
                     rows[i * 25:(i + 1) * 25])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 1.0)])

    p = (
        Pattern.begin("V")
        .followed_by("C").one_or_more()
        .followed_by("P")
        .within("45 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    strategies = (
        ("noskip", "no_skip"),
        ("stonext", "skip_to_next"),
        ("sple", "skip_past_last_event"),
        ("stofirst", ("skip_to_first", 2)),
        ("stolast", ("skip_to_last", 2)),
    )
    runs = []
    for tag, strat in strategies:
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(
            stream, p, watermark="3 minutes", skip_strategy=strat
        )
        runs.append((out, f"cep_skip_{tag}", "update"))
    _run_many_to_memory(runs, tmp_path)
    for tag, strat in strategies:
        got = _stream_rows(spark, f"cep_skip_{tag}", cols)
        want = _batch_rows(
            match_pattern(batch_df, p, skip_strategy=strat), cols
        )
        assert got == want, strat
        assert got, strat


def test_cep_stream_strict_skip_strategies_equal_batch(
    spark, chunk_dir, tmp_path
):
    """late-r8: skip strategies on STRICT streaming patterns. Strict
    matches decide exactly when their end passes the watermark, so
    ends are globally monotone across windows and the sequential prune
    chain runs per window on the carried bound alone. Dense
    same-key runs make matches overlap so every strategy prunes
    differently; each equals the batch operator. Covers a loop
    pattern (prefix emission feeding the chain) and a plain pattern
    (skip_to_next included — deterministic single bind per anchor)."""
    import random

    from flink_note_spark.operators.cep import match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    rng = random.Random(53)
    rows = sorted(
        [
            (rng.randrange(1, 4), i, _ts(i * 2),
             rng.choice(["V", "C", "P"]),
             rng.choice([30.0, 60.0, 120.0]))
            for i in range(90)
        ],
        key=lambda r: r[2],
    )
    for i in range(3):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 30:(i + 1) * 30])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 1.0)])

    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    cases = [
        (
            "plain",
            [{"type": "V"}, {"type": "C"}],
            ["user_id", "ts_1", "ts_2"],
            ["no_skip", "skip_to_next", "skip_past_last_event",
             ("skip_to_first", 2), ("skip_to_last", 2)],
        ),
        (
            "loop",
            [{"type": "V"}, {"type": "C", "one_or_more": True},
             {"type": "P"}],
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
            # skip_to_next on a strict loop (r9): the anchor's
            # earliest-end prefix is the first to decide at the
            # watermark; later-window prefixes are suppressed by the
            # pend-carried anchor set
            ["skip_past_last_event", "skip_to_next",
             ("skip_to_first", 2), ("skip_to_last", 2)],
        ),
        (
            # r9: OVERLAPPING loop/follower predicates (a 60.0 C row
            # is both) give anchors several completing prefixes with
            # distinct ends — the case where skip_to_next genuinely
            # selects, across watermark windows
            "loopwhere",
            [{"type": "V"},
             {"type": "C", "one_or_more": True, "where": "value < 80"},
             {"type": "C", "where": "value >= 50"}],
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
            ["no_skip", "skip_to_next", "skip_past_last_event"],
        ),
    ]
    flat = [
        (f"{shape}_{strat if isinstance(strat, str) else strat[0]}",
         pat, cols, strat)
        for shape, pat, cols, strats in cases
        for strat in strats
    ]
    runs = []
    for tag, pat, cols, strat in flat:
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(
            stream, pat, contiguity="strict", within="45 minutes",
            watermark="3 minutes", skip_strategy=strat,
        )
        runs.append((out, f"cep_sskip_{tag}", "update"))
    _run_many_to_memory(runs, tmp_path)
    for tag, pat, cols, strat in flat:
        got = _stream_rows(spark, f"cep_sskip_{tag}", cols)
        want = _batch_rows(
            match_pattern(
                batch_df, pat, contiguity="strict",
                within="45 minutes", skip_strategy=strat,
                ),
            cols,
        )
        assert got == want, tag
        assert got, tag


def test_cep_stream_strict_no_skip_equals_batch(spark, chunk_dir, tmp_path):
    """Strict streaming no_skip: every prefix of a consecutive run
    followed by the next step emits — equals batch across micro-batch
    boundaries (a prefix whose adjacent event is still the loop type
    dies, exactly the batch strict semantics)."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 1.0),
        (1, 2, _ts(1), "C", 1.0),
        (1, 3, _ts(2), "C", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 4, _ts(3), "C", 1.0),
        (1, 5, _ts(4), "P", 1.0),
        (2, 6, _ts(0), "C", 1.0),   # loop at start, run of 2
        (2, 7, _ts(1), "C", 1.0),
        (2, 8, _ts(2), "P", 1.0),
    ])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 9, _ts(120), "Z", 1.0)])

    p = (
        Pattern.begin("V")
        .next("C").one_or_more()
        .next("P")
        .within("20 minutes")
        .skip("no_skip")
    )
    p2 = [{"type": "C", "one_or_more": True}, {"type": "P"}]
    cols = ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"]
    cols2 = ["user_id", "ts_1", "ts_1_last", "n_1", "ts_2"]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_stream(stream, p, watermark="2 minutes")
    _run_to_memory(out, "cep_sns1", "update", tmp_path)
    got = _stream_rows(spark, "cep_sns1", cols)
    want = _batch_rows(
        match_pattern(batch_df, p, tiebreak=["event_id"]), cols
    )
    assert got == want
    # only the FULL run's prefix reaches P under strict adjacency
    assert got == [(1, _us(0), _us(1), _us(3), 3, _us(4))]

    stream2 = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out2 = match_pattern_stream(
        stream2, p2, contiguity="strict", within="20 minutes",
        watermark="2 minutes", skip_strategy="no_skip",
    )
    _run_to_memory(out2, "cep_sns2", "update", tmp_path)
    got2 = _stream_rows(spark, "cep_sns2", cols2)
    want2 = _batch_rows(
        match_pattern(
            batch_df, p2, contiguity="strict", within="20 minutes",
            tiebreak=["event_id"], skip_strategy="no_skip",
        ),
        cols2,
    )
    assert got2 == want2
    # for a NON-terminal strict loop, a shorter prefix's adjacent
    # event is still the loop type, so it can never reach P — no_skip
    # equals greedy here by construction (every anchor's maximal run);
    # the value of no_skip on strict is uniform engine semantics, the
    # extra matches appear with relaxed following steps
    assert got2 == _batch_rows(match_pattern(
        batch_df, p2, contiguity="strict", within="20 minutes",
        tiebreak=["event_id"],
    ), cols2)


def test_cep_stream_skip_rejections(spark, chunk_dir):
    """The remaining skip refusals fail loudly: malformed strategies
    and out-of-range step indices (skip_to_next on a strict loop is
    SUPPORTED since r9 — see the strict equality matrix)."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "A", 1.0)])
    stream = read_file_stream(spark, "parquet", str(chunk_dir), EVENT_SCHEMA)
    with pytest.raises(ValueError, match="skip_strategy"):
        match_pattern_stream(
            stream, ["A", "B"], watermark="1 minutes",
            skip_strategy="bogus",
        )
    # step-index range check happens at CONSTRUCTION (ADVICE r7): an
    # out-of-range index would otherwise hit Python negative indexing
    # (silently wrong pruning) or an executor-side IndexError
    for bad in (0, -1, 3):
        with pytest.raises(ValueError, match="step index must be in 1..2"):
            match_pattern_stream(
                stream, ["A", "B"], contiguity="relaxed",
                within="10 minutes", watermark="1 minutes",
                skip_strategy=("skip_to_first", bad),
            )
    with pytest.raises(ValueError, match="step index must be in 1..2"):
        match_pattern_stream(
            stream, ["A", "B"], contiguity="relaxed",
            within="10 minutes", watermark="1 minutes",
            skip_strategy=("skip_to_last", 99),
        )


def test_cep_stream_skip_bound_survives_restart(spark, chunk_dir, tmp_path):
    """The sequential skip chain's state — the carried threshold
    (``bound``) AND the decided-but-unreleased match captures
    (``pend``, r8 completion-order release) — survives a checkpoint
    restart: a pending cap that starts at-or-before the pre-restart
    emission's end stays pruned after the restart, and one that starts
    after it emits after the restart."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    sink = tmp_path / "cep_skipb_sink"
    ckpt = tmp_path / "cep_skipb_ckpt"
    pat = ["V", {"type": "C", "one_or_more": True}]

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(
            stream, pat, contiguity="relaxed",
            within="30 minutes", watermark="2 minutes",
            skip_strategy="skip_past_last_event",
        )

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    # run 1 (wm ends at 42): both keys' anchors decide; only the
    # end@10 branches release (end + within < wm ⇔ end < 12) and
    # emit, setting bound=10; the end@12/end@20 branches stay PENDING
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 1.0),
        (1, 2, _ts(10), "C", 1.0),
        (1, 3, _ts(20), "C", 1.0),
        (4, 4, _ts(0), "V", 1.0),
        (4, 5, _ts(10), "C", 1.0),
        (4, 6, _ts(11), "V", 1.0),
        (4, 7, _ts(12), "C", 1.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [(99, 8, _ts(44), "Z", 1.0)])
    run_once()
    first = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2_last"]),
         int(r["n_2"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert first == [(1, _us(0), _us(10), 1), (4, _us(0), _us(10), 1)]

    # restart: key 1's pending (0, ..20) starts at 0 <= restored
    # bound 10 -> pruned; key 4's pending (11, 12) starts after the
    # restored bound -> released and emitted (pend survived), while
    # its (0, ..12) branch is pruned (bound survived)
    _write_chunk(chunk_dir, "c3.parquet", [(99, 9, _ts(120), "Z", 1.0)])
    run_once()
    final = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2_last"]),
         int(r["n_2"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert final == [
        (1, _us(0), _us(10), 1),
        (4, _us(0), _us(10), 1),
        (4, _us(11), _us(12), 1),
    ]


def test_cep_stream_strict_loop_skip_to_next_survives_restart(
    spark, chunk_dir, tmp_path
):
    """r9 skip_to_next on a strict loop: the emitted-anchor set rides
    ``pend`` through the checkpoint — an anchor whose earliest prefix
    emitted BEFORE the restart keeps its longer prefixes suppressed
    when they decide after the restart, exactly once. Multi-prefix
    anchors need the loop and follower conditions to OVERLAP (a pure
    type-keyed follower breaks the run), so the steps are
    where-predicated over one event type."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    sink = tmp_path / "cep_stnl_sink"
    ckpt = tmp_path / "cep_stnl_ckpt"
    # anchor: value >= 100; loop: value < 80; follower: value >= 50 —
    # a 50..79 row is BOTH loop element and follower, so an anchor's
    # run yields several completing prefixes with distinct ends
    pat = [
        {"type": "E", "where": "value >= 100"},
        {"type": "E", "one_or_more": True, "where": "value < 80"},
        {"type": "E", "where": "value >= 50"},
    ]

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(
            stream, pat, contiguity="strict",
            within="60 minutes", watermark="2 minutes",
            skip_strategy="skip_to_next",
        )

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    # anchor@0 run = [60@2, 60@4, 70@6]; prefixes end @4, @6 (each cut
    # row doubles as follower), and the @9 anchor row (120 >= 50) even
    # completes the FULL run as a third prefix ending @9. Run 1's
    # watermark (10 − 2 = 8) decides only the earliest end @4 → emit.
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "E", 120.0),
        (1, 2, _ts(2), "E", 60.0),
        (1, 3, _ts(4), "E", 60.0),
        (1, 4, _ts(6), "E", 70.0),
    ])
    _write_chunk(chunk_dir, "c2.parquet", [(99, 8, _ts(7), "Z", 1.0)])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 9, _ts(10), "Z", 1.0)])
    run_once()
    first = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["n_2"]), int(r["ts_3"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert first == [(1, _us(0), 1, _us(4))]

    # run 2 (same checkpoint): the @6/@9 prefixes decide now and must
    # stay suppressed (the anchor emitted pre-restart); the fresh
    # anchor@9 still matches its own run
    _write_chunk(chunk_dir, "c4.parquet", [
        (1, 5, _ts(9), "E", 120.0),
        (1, 6, _ts(11), "E", 60.0),
        (1, 7, _ts(13), "E", 55.0),
    ])
    _write_chunk(chunk_dir, "c5.parquet", [(99, 10, _ts(120), "Z", 1.0)])
    _write_chunk(chunk_dir, "c6.parquet", [(99, 11, _ts(121), "Z", 1.0)])
    run_once()
    final = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["n_2"]), int(r["ts_3"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert final == [
        (1, _us(0), 1, _us(4)),
        (1, _us(9), 1, _us(13)),
    ]


def test_cumulate_window_stream_equals_batch(spark, chunk_dir, tmp_path):
    """Streaming CUMULATE (r7): step boundaries fire exactly once as
    the watermark passes them — on bounded input the emitted cumulative
    rows equal the batch cumulate_window + groupBy rendering, including
    a span whose events arrive across micro-batches."""
    from flink_note_spark.operators.windows import cumulate_window
    from flink_note_spark.streaming.ops import cumulate_window_stream

    rows1 = [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(3), "view", 2.0),
        (1, 3, _ts(11), "view", 4.0),
    ]
    rows2 = [
        (3, 4, _ts(17), "view", 8.0),
        (1, 5, _ts(22), "view", 16.0),   # second span [20, 40)
    ]
    _write_chunk(chunk_dir, "c1.parquet", rows1)
    _write_chunk(chunk_dir, "c2.parquet", rows2)
    _write_chunk(chunk_dir, "c3.parquet", [(99, 9, _ts(120), "z", 0.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = cumulate_window_stream(
        stream, "ts", step="5 minutes", size="20 minutes",
        watermark="2 minutes",
    )
    _run_to_memory(out, "cumulate_out", "update", tmp_path)
    got = sorted(
        (int(r["win_start_us"]), int(r["win_end_us"]),
         int(r["n_events"]), float(r["sum_value"]))
        for r in spark.sql("SELECT * FROM cumulate_out").collect()
    )

    batch = (
        cumulate_window(
            spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)),
            "ts", "5 minutes", "20 minutes",
        )
        .groupBy("win_start", "win_end")
        .agg(
            F.count("*").cast("int").alias("n"),
            F.round(F.sum("value"), 4).alias("s"),
        )
    )
    want = sorted(
        (
            int(r["win_start"].replace(tzinfo=dt.timezone.utc)
                .timestamp() * 1_000_000),
            int(r["win_end"].replace(tzinfo=dt.timezone.utc)
                .timestamp() * 1_000_000),
            int(r["n"]), float(r["s"]),
        )
        for r in batch.collect()
        # the sentinel span [120, 140) is still open (wm stops at 118)
        if r["win_start"].minute != 0 or r["win_start"].hour != 2
    )
    assert got == want
    # cumulative growth within the first span [0, 20): events at
    # minutes 0, 3, 11, 17 → prefixes 2 (the empty 5-10 stretch adds
    # nothing), 2, 3, 4
    first_span = [g for g in got if g[0] == _us(0)]
    assert [g[2] for g in first_span] == [2, 2, 3, 4]
    assert first_span[-1][3] == 15.0


def test_window_join_stream_stream_equals_batch(spark, tmp_path):
    """Flink DataStream window join, streaming rendering (r7): two
    watermarked streams equi-joined on (key, tumbling window) — Spark
    derives state eviction from the window-equality conjunct; results
    equal the batch operator on bounded input."""
    from flink_note_spark.operators.joins import window_join

    ldir, rdir = tmp_path / "wj_l", tmp_path / "wj_r"
    ldir.mkdir(), rdir.mkdir()
    lrows = [(1, 1, _ts(1), "view", 1.0), (1, 2, _ts(16), "view", 2.0),
             (2, 3, _ts(2), "view", 3.0)]
    rrows = [(1, 4, _ts(3), "click", 10.0), (1, 5, _ts(14), "click", 11.0),
             (1, 6, _ts(17), "click", 12.0), (2, 7, _ts(40), "click", 13.0)]
    _write_chunk(ldir, "l1.parquet", lrows[:2])
    _write_chunk(ldir, "l2.parquet", lrows[2:])
    _write_chunk(ldir, "l3.parquet", [(99, 8, _ts(120), "z", 0.0)])
    _write_chunk(rdir, "r1.parquet", rrows[:2])
    _write_chunk(rdir, "r2.parquet", rrows[2:])
    _write_chunk(rdir, "r3.parquet", [(99, 9, _ts(120), "z", 0.0)])

    ls = read_file_stream(
        spark, "parquet", str(ldir), EVENT_SCHEMA, max_files_per_trigger=1
    ).withWatermark("ts", "2 minutes").select(
        "user_id", F.col("ts").alias("lt"), F.col("event_id").alias("lid")
    )
    rs = read_file_stream(
        spark, "parquet", str(rdir), EVENT_SCHEMA, max_files_per_trigger=1
    ).withWatermark("ts", "2 minutes").select(
        "user_id", F.col("ts").alias("rt"), F.col("event_id").alias("rid")
    )
    out = window_join(
        ls, rs, on="user_id", left_ts="lt", right_ts="rt",
        window="15 minutes",
    ).select("user_id", "lid", "rid")
    _run_to_memory(out, "wj_out", "append", tmp_path)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM wj_out").collect())
    )

    lb = spark.createDataFrame(
        lrows + [(99, 8, _ts(120), "z", 0.0)], EVENT_SCHEMA
    ).select("user_id", F.col("ts").alias("lt"),
             F.col("event_id").alias("lid"))
    rb = spark.createDataFrame(
        rrows + [(99, 9, _ts(120), "z", 0.0)], EVENT_SCHEMA
    ).select("user_id", F.col("ts").alias("rt"),
             F.col("event_id").alias("rid"))
    want = sorted(map(tuple, window_join(
        lb, rb, on="user_id", left_ts="lt", right_ts="rt",
        window="15 minutes",
    ).select("user_id", "lid", "rid").collect()))
    assert got == want
    assert got == [(1, 1, 4), (1, 1, 5), (1, 2, 6), (99, 8, 9)]


def test_temporal_join_foreachbatch_reread_slowly_changing_dim(
    spark, chunk_dir, tmp_path
):
    """The documented streaming rendering of FOR SYSTEM_TIME AS OF
    against a SLOWLY-CHANGING dimension: foreachBatch re-reads the
    versioned dim every micro-batch (interval strategy), so versions added
    between batches are visible to later batches — Flink's
    processing-time temporal join behaviour."""
    from flink_note_spark.operators.joins import temporal_join

    dim_dir = tmp_path / "dim"
    sink = tmp_path / "ttj_sink"
    dim_dir.mkdir()
    _DIM_ARROW = pa.schema(
        [("user_id", pa.int64()), ("vfrom", pa.timestamp("us")),
         ("price", pa.float64())]
    )

    def write_dim(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "vfrom", "price"])
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=_DIM_ARROW,
                                 preserve_index=False),
            str(dim_dir / name),
        )

    write_dim("v1.parquet", [(1, _ts(0), 10.0)])

    _write_chunk(chunk_dir, "f1.parquet", [(1, 1, _ts(5), "click", 0.0)])
    _write_chunk(chunk_dir, "f2.parquet", [(1, 2, _ts(30), "click", 0.0)])

    def handle(batch_df, batch_id):
        dim = spark.read.parquet(str(dim_dir))
        out = temporal_join(
            batch_df, dim, on="user_id", fact_time="ts",
            valid_from="vfrom", how="inner", strategy="interval",
        ).select("user_id", "event_id", "price")
        if out.count():
            out.write.mode("append").parquet(str(sink))
        if batch_id == 0:
            # a new version lands between micro-batches
            write_dim("v2.parquet", [(1, _ts(20), 20.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    q = foreach_batch_sink(
        stream, handle, checkpoint=str(tmp_path / "ttj_ckpt"),
        output_mode="append",
    ).start()
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (int(r["user_id"]), int(r["event_id"]), float(r["price"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    # batch 0's fact (ts=5) sees only v1; batch 1's fact (ts=30) sees
    # the v2 version effective from ts=20
    assert got == [(1, 1, 10.0), (1, 2, 20.0)]


def test_cep_stream_where_equals_batch(spark, chunk_dir, tmp_path):
    """r8 streaming where() value predicates (Flink SimpleCondition):
    on a seeded soup with payload values split into micro-batches, a
    relaxed pattern whose steps carry value predicates — including a
    predicated oneOrMore loop and a predicated negation — matches the
    batch operator exactly. The predicate never reaches Python: it is
    folded into the per-step candidate mask by Catalyst before the
    stream enters the state buffer."""
    import random

    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    rng = random.Random(43)
    minutes = rng.sample(range(0, 300), 90)
    rows = sorted(
        [
            (rng.randrange(1, 7), i, _ts(m),
             rng.choice(["V", "C", "P", "Z"]), round(rng.random(), 3))
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 25:(i + 1) * 25])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 1.0)])

    pats = [
        (
            "w_simple",
            Pattern.begin("V")
            .followed_by("P").where("value > 0.5")
            .within("45 minutes"),
            ["user_id", "ts_1", "ts_2"],
        ),
        (
            "w_loop",
            Pattern.begin("V").where("value < 0.9")
            .followed_by("C").where("value < 0.7").one_or_more()
            .followed_by("P")
            .within("45 minutes"),
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
        ),
        (
            "w_neg",
            Pattern.begin("V")
            .not_followed_by("Z").where("value > 0.2")
            .followed_by("P").where("value > 0.3")
            .within("45 minutes"),
            ["user_id", "ts_1", "ts_2"],
        ),
    ]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    runs = []
    for tag, p, cols in pats:
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="3 minutes")
        runs.append((out, f"cep_where_{tag}", "update"))
    _run_many_to_memory(runs, tmp_path)
    for tag, p, cols in pats:
        got = _stream_rows(spark, f"cep_where_{tag}", cols)
        want = _batch_rows(match_pattern(batch_df, p), cols)
        assert got == want, tag
        assert got, tag


def test_cep_stream_where_strict_equals_batch(spark, chunk_dir, tmp_path):
    """Strict (next()) contiguity with a value predicate: an event of
    the right type that FAILS the predicate breaks adjacency, exactly
    as in the batch lead-chain engine."""
    import random

    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    rng = random.Random(44)
    minutes = rng.sample(range(0, 200), 80)
    rows = sorted(
        [
            (rng.randrange(1, 5), i, _ts(m),
             rng.choice(["A", "B"]), round(rng.random(), 3))
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 20:(i + 1) * 20])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(600), "Q", 1.0)])

    p = (
        Pattern.begin("A")
        .next("B").where("value > 0.4")
        .within("60 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2"]
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_stream(stream, p, watermark="3 minutes")
    _run_to_memory(out, "cep_where_strict", "update", tmp_path)
    got = _stream_rows(spark, "cep_where_strict", cols)
    want = _batch_rows(
        match_pattern(batch_df := spark.read.schema(EVENT_SCHEMA)
                      .parquet(str(chunk_dir)),
                      p, tiebreak=["event_id"]),
        cols,
    )
    assert got == want
    assert got


def test_cep_stream_where_survives_restart(spark, chunk_dir, tmp_path):
    """A predicated pattern's candidate masks live in checkpointed
    state: matches spanning a stop/restart boundary still honor the
    value predicate."""
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    sink = tmp_path / "cep_where_sink"
    ckpt = tmp_path / "cep_where_ckpt"
    p = (
        Pattern.begin("V")
        .followed_by("P").where("value > 0.5")
        .within("30 minutes")
    )

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="2 minutes")

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    # V@0 buffered in run 1; its only qualifying P arrives after the
    # restart (P@5 fails the predicate and must be skipped over)
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 1.0),
        (1, 2, _ts(5), "P", 0.2),
    ])
    run_once()
    assert not (sink).exists()

    _write_chunk(chunk_dir, "c2.parquet", [(1, 3, _ts(10), "P", 0.9)])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 9, _ts(120), "Z", 1.0)])
    run_once()
    final = sorted(
        (int(r["user_id"]), int(r["ts_1"]), int(r["ts_2"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert final == [(1, _us(0), _us(10))]


# --- streaming optional()/times(n, m) — variant expansion (r8) ----------


def _rows_nullable(pdf, cols):
    """Null-aware row collector: absent optional steps are NULL in
    both the batch frame (NaT/None) and the streaming memory table
    (NaN-backed nullable longs)."""
    out = []
    for _, r in pdf.iterrows():
        vals = []
        for c in cols:
            v = r[c]
            if v is None or pd.isna(v):
                vals.append(None)
            elif hasattr(v, "timestamp"):
                vals.append(int(
                    v.replace(tzinfo=dt.timezone.utc).timestamp()
                    * 1_000_000
                ))
            else:
                vals.append(int(v))
        out.append(tuple(vals))
    return sorted(
        out, key=lambda t: tuple((v is None, v or 0) for v in t)
    )


def _variant_soup(chunk_dir, seed, n=90, types=("V", "C", "P", "Z")):
    import random

    rng = random.Random(seed)
    minutes = rng.sample(range(0, 300), n)
    rows = sorted(
        [
            (rng.randrange(1, 7), i, _ts(m), rng.choice(types),
             round(rng.random(), 3))
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    per = (n + 3) // 4
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet",
                     rows[i * per:(i + 1) * per])
    # watermark flusher far in the future
    _write_chunk(chunk_dir, "c9.parquet",
                 [(99, 999, _ts(900), "Q", 1.0)])


def test_cep_stream_optional_equals_batch(spark, chunk_dir, tmp_path):
    """r8 streaming optional(): the q92 shape (V, optional C, P) runs
    as parallel variant state machines over one shared buffer —
    stream == batch across micro-batch boundaries, absent branch
    emitting ts_2 NULL."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _variant_soup(chunk_dir, seed=51)
    p = (
        Pattern.begin("V")
        .followed_by("C").optional()
        .followed_by("P")
        .within("45 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_3"]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_stream(stream, p, watermark="3 minutes")
    _run_to_memory(out, "cep_var_opt", "update", tmp_path)
    got = _rows_nullable(
        spark.sql("SELECT * FROM cep_var_opt").toPandas(), cols
    )
    want = _rows_nullable(match_pattern(batch_df, p).toPandas(), cols)
    assert got == want
    assert got
    # both branches occur on the soup
    assert any(r[2] is None for r in got)
    assert any(r[2] is not None for r in got)


def test_cep_stream_times_range_equals_batch(spark, chunk_dir, tmp_path):
    """times(1, 2): each count variant emits (count-1 repeats ts_i as
    ts_i_last — the batch union rule)."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _variant_soup(chunk_dir, seed=52)
    p = (
        Pattern.begin("V")
        .followed_by("C").times(1, 2)
        .followed_by("P")
        .within("60 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_2_last", "ts_3"]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_stream(stream, p, watermark="3 minutes")
    _run_to_memory(out, "cep_var_times", "update", tmp_path)
    got = _rows_nullable(
        spark.sql("SELECT * FROM cep_var_times").toPandas(), cols
    )
    want = _rows_nullable(match_pattern(batch_df, p).toPandas(), cols)
    assert got == want
    assert got


def test_cep_stream_zero_or_more_equals_batch(spark, chunk_dir, tmp_path):
    """zeroOrMore (optional greedy loop): the absent branch leaves
    ts_2/ts_2_last/n_2 NULL; the present branch is the greedy run."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _variant_soup(chunk_dir, seed=53)
    p = (
        Pattern.begin("V")
        .followed_by("C").zero_or_more()
        .followed_by("P")
        .within("45 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_stream(stream, p, watermark="3 minutes")
    _run_to_memory(out, "cep_var_zom", "update", tmp_path)
    got = _rows_nullable(
        spark.sql("SELECT * FROM cep_var_zom").toPandas(), cols
    )
    want = _rows_nullable(match_pattern(batch_df, p).toPandas(), cols)
    assert got == want
    assert got


def test_cep_stream_optional_strict_equals_batch(spark, chunk_dir,
                                                 tmp_path):
    """Strict contiguity with an optional middle step: adjacency is
    positional per variant ([A, B, C] and [A, C])."""
    import random

    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    rng = random.Random(54)
    minutes = rng.sample(range(0, 200), 80)
    rows = sorted(
        [
            (rng.randrange(1, 5), i, _ts(m), rng.choice(["A", "B", "C"]),
             1.0)
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 20:(i + 1) * 20])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(600), "Q", 1.0)])

    p = (
        Pattern.begin("A")
        .next("B").optional()
        .next("C")
        .within("60 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_3"]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_stream(stream, p, watermark="3 minutes")
    _run_to_memory(out, "cep_var_strict", "update", tmp_path)
    got = _rows_nullable(
        spark.sql("SELECT * FROM cep_var_strict").toPandas(), cols
    )
    want = _rows_nullable(match_pattern(batch_df, p).toPandas(), cols)
    assert got == want
    assert got


def test_cep_stream_optional_survives_restart(spark, chunk_dir, tmp_path):
    """Variant state (shared buffer) is checkpointed: matches spanning
    a stop/restart boundary emit exactly once, on both branches."""
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    sink = tmp_path / "cep_var_sink"
    ckpt = tmp_path / "cep_var_ckpt"
    p = (
        Pattern.begin("V")
        .followed_by("C").optional()
        .followed_by("P")
        .within("30 minutes")
    )

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="2 minutes")

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 1.0),
        (1, 2, _ts(5), "C", 1.0),
    ])
    run_once()
    assert not sink.exists()

    _write_chunk(chunk_dir, "c2.parquet", [(1, 3, _ts(10), "P", 1.0)])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 9, _ts(120), "Z", 1.0)])
    run_once()
    got = _rows_nullable(
        spark.read.parquet(str(sink)).toPandas(),
        ["user_id", "ts_1", "ts_2", "ts_3"],
    )
    # both variants fire: with the C and skipping it (the null-aware
    # sort puts the absent branch after the bound one)
    assert got == [
        (1, _us(0), _us(5), _us(10)),
        (1, _us(0), None, _us(10)),
    ]


def test_cep_stream_variant_guards(spark, chunk_dir, tmp_path):
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    # skip strategies compose with LOOP-FREE variants since r10
    # (equality tests in test_cep_stream_variants_skip_*); variants
    # CONTAINING loops under a strategy keep the refusal — the batch
    # twin expands loop prefixes non-greedily before pruning
    p = (
        Pattern.begin("V")
        .followed_by("C").one_or_more()
        .followed_by("P").optional()
        .within("30 minutes")
        .skip("skip_to_next")
    )
    with pytest.raises(ValueError, match="batch-only"):
        match_pattern_stream(stream, p, watermark="2 minutes")
    # strict variant exposing a terminal loop via absent optional tail
    p2 = (
        Pattern.begin("A")
        .next("B").one_or_more()
        .next("C").optional()
        .within("30 minutes")
    )
    with pytest.raises(ValueError, match="variant"):
        match_pattern_stream(stream, p2, watermark="2 minutes")


def test_cep_stream_iterative_equals_batch(spark, chunk_dir, tmp_path):
    """r8 streaming IterativeCondition (cross-step ``s<k>./first./
    prev.`` refs): on a seeded payload soup split into micro-batches,
    every batch-supported composition — relaxed ref bind, strict
    prev-adjacency, iterative conjunct ON a oneOrMore loop, iterative
    negation, times(2), multi-ref, followedByAny branch — matches the
    batch operator exactly. The referenced payload columns ride the
    state buffer as doubles; the predicate evaluates at binding time
    inside the per-key engine (``_make_iter_cep_fn``)."""
    import random

    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    rng = random.Random(47)
    minutes = rng.sample(range(0, 300), 150)
    rows = sorted(
        [
            (rng.randrange(1, 5), i, _ts(m),
             rng.choice(["V", "C", "P", "Z"]), round(rng.random(), 3))
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(5):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 30:(i + 1) * 30])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 1.0)])

    pats = [
        (
            "relaxed_ref",
            Pattern.begin("V")
            .followed_by("P").where("value > s1.value")
            .within("60 minutes"),
            ["user_id", "ts_1", "ts_2"],
        ),
        (
            "strict_prev",
            Pattern.begin("V")
            .next("C").where("value > prev.value")
            .within("60 minutes"),
            ["user_id", "ts_1", "ts_2"],
        ),
        (
            "loop_iter",
            Pattern.begin("V")
            .followed_by("C").where("value > s1.value").one_or_more()
            .followed_by("P")
            .within("90 minutes"),
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
        ),
        (
            "neg_iter",
            Pattern.begin("V")
            .not_followed_by("Z").where("value > s1.value")
            .followed_by("P")
            .within("60 minutes"),
            ["user_id", "ts_1", "ts_2"],
        ),
        (
            "times_iter",
            Pattern.begin("V")
            .followed_by("C").where("value < first.value + 0.5").times(2)
            .within("90 minutes"),
            ["user_id", "ts_1", "ts_2", "ts_2_last"],
        ),
        (
            "multi_ref",
            Pattern.begin("V")
            .followed_by("C")
            .followed_by("P").where(
                "value > s1.value AND value <> s2.value"
            )
            .within("60 minutes"),
            ["user_id", "ts_1", "ts_2", "ts_3"],
        ),
        (
            "any_iter",
            Pattern.begin("V")
            .followed_by_any("C").where("value > s1.value")
            .within("60 minutes"),
            ["user_id", "ts_1", "ts_2"],
        ),
    ]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    runs = []
    for tag, p, cols in pats:
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="3 minutes")
        runs.append((out, f"cep_iter_{tag}", "update"))
    _run_many_to_memory(runs, tmp_path)
    for tag, p, cols in pats:
        got = _stream_rows(spark, f"cep_iter_{tag}", cols)
        want = _batch_rows(match_pattern(batch_df, p), cols)
        assert got == want, tag
        assert got, tag


def test_cep_stream_mixed_equals_batch(spark, chunk_dir, tmp_path):
    """late-r8 MIXED-contiguity streaming (Flink's natural
    begin().next().followedBy() shape, the positional engine's
    streaming twin): on a seeded soup split into micro-batches, every
    supported composition — the canonical strict-then-relaxed funnel,
    strict/relaxed negations, relaxed-then-strict, times(2), terminal
    relaxed negation — equals the batch positional engine exactly
    under the same within bound."""
    import random

    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    rng = random.Random(31)
    rows = [
        (rng.randrange(1, 4), i, _ts(i), rng.choice(["V", "C", "P", "Z"]),
         1.0)
        for i in range(150)
    ]
    for i in range(5):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 30:(i + 1) * 30])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 1.0)])

    pats = [
        (
            "funnel",
            Pattern.begin("V").next("C").followed_by("P")
            .within("45 minutes"),
            ["user_id", "ts_1", "ts_2", "ts_3"],
        ),
        (
            "neg_strict",
            [{"type": "V"}, {"type": "Z", "mode": "strict",
              "negate": True}, {"type": "C", "mode": "strict"},
             {"type": "P", "mode": "relaxed"}],
            ["user_id", "ts_1", "ts_2", "ts_3"],
        ),
        (
            "neg_relaxed",
            [{"type": "V"}, {"type": "C", "mode": "strict"},
             {"type": "Z", "mode": "relaxed", "negate": True},
             {"type": "P", "mode": "relaxed"}],
            ["user_id", "ts_1", "ts_2", "ts_3"],
        ),
        (
            "relaxed_then_strict",
            [{"type": "V"}, {"type": "C", "mode": "relaxed"},
             {"type": "P", "mode": "strict"}],
            ["user_id", "ts_1", "ts_2", "ts_3"],
        ),
        (
            "times_strict",
            [{"type": "V"}, {"type": "C", "mode": "strict", "times": 2},
             {"type": "P", "mode": "relaxed"}],
            ["user_id", "ts_1", "ts_2", "ts_2_last", "ts_3"],
        ),
        (
            "terminal_neg",
            # short horizon: at this soup density a Z lands inside any
            # 45-minute window, so the absence assertion needs a
            # window it can actually win
            [{"type": "V"}, {"type": "C", "mode": "strict"},
             {"type": "Z", "mode": "relaxed", "negate": True,
              "within_override": "6 minutes"}],
            ["user_id", "ts_1", "ts_2"],
        ),
        # --- r9: mixed loops stream (terminal strict loops excluded) ---
        (
            "strict_loop_relaxed_next",
            [{"type": "V"},
             {"type": "C", "mode": "strict", "one_or_more": True},
             {"type": "P", "mode": "relaxed"}],
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
        ),
        (
            "strict_loop_strict_next",
            [{"type": "V"},
             {"type": "C", "mode": "strict", "one_or_more": True},
             {"type": "P", "mode": "strict"}],
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
        ),
        (
            "anchor_strict_loop",
            [{"type": "C", "mode": "strict", "one_or_more": True},
             {"type": "P", "mode": "relaxed"}],
            ["user_id", "ts_1", "ts_1_last", "n_1", "ts_2"],
        ),
        (
            "relaxed_loop_then_strict",
            [{"type": "V"},
             {"type": "C", "mode": "relaxed", "one_or_more": True},
             {"type": "P", "mode": "strict"}],
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
        ),
        (
            "relaxed_loop_until",
            [{"type": "V"},
             {"type": "C", "mode": "relaxed", "one_or_more": True,
              "until": "Z"},
             {"type": "P", "mode": "relaxed"}],
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2", "ts_3"],
        ),
        (
            "terminal_relaxed_loop",
            [{"type": "V"},
             {"type": "C", "mode": "relaxed", "one_or_more": True}],
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2"],
        ),
    ]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    runs = []
    for tag, p, cols in pats:
        w = None if isinstance(p, Pattern) else "45 minutes"
        if not isinstance(p, Pattern):
            w = next(
                (st.pop("within_override") for st in p
                 if "within_override" in st), w,
            )
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(
            stream, p, watermark="3 minutes", within=w
        )
        runs.append((tag, p, cols, w, out))
    _run_many_to_memory(
        [(out, f"cep_mixed_{tag}", "update") for tag, _, _, _, out in runs],
        tmp_path,
    )
    for tag, p, cols, w, _ in runs:
        got = _stream_rows(spark, f"cep_mixed_{tag}", cols)
        want = _batch_rows(match_pattern(batch_df, p, within=w), cols)
        assert got == want, tag
        assert got, tag


def test_cep_stream_mixed_survives_restart(spark, chunk_dir, tmp_path):
    """Mixed positional state is checkpointed: a funnel whose relaxed
    tail arrives after a stop/restart boundary still emits exactly
    once, with the strict prefix bound from the restored buffer."""
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    sink = tmp_path / "cep_mixed_sink"
    ckpt = tmp_path / "cep_mixed_ckpt"
    p = Pattern.begin("V").next("C").followed_by("P").within("30 minutes")

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="2 minutes")

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 1.0),
        (1, 2, _ts(1), "C", 1.0),
    ])
    run_once()
    assert not sink.exists()

    _write_chunk(chunk_dir, "c2.parquet", [(1, 3, _ts(10), "P", 1.0)])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 9, _ts(120), "Z", 1.0)])
    run_once()
    got = sorted(
        tuple(int(r[c]) for c in ["user_id", "ts_1", "ts_2", "ts_3"])
        for _, r in spark.read.parquet(str(sink)).toPandas().iterrows()
    )
    assert got == [(1, _us(0), _us(1), _us(10))]


def test_cep_stream_mixed_rejections(spark, chunk_dir):
    """Mixed streaming refusals: terminal STRICT loops (run maximality
    asserts on the event after the run — see the pinned counterexample
    test), strict negation before a relaxed positive, missing within,
    skip strategies, where(). Non-terminal loops are SUPPORTED since
    r9 (equality tests in test_cep_stream_mixed_loops_equal_batch)."""
    from flink_note_spark.streaming.ops import match_pattern_stream

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    base = [{"type": "V"}, {"type": "C", "mode": "strict"},
            {"type": "P", "mode": "relaxed"}]
    with pytest.raises(ValueError, match="requires within"):
        match_pattern_stream(stream, base, watermark="2 minutes")
    with pytest.raises(ValueError, match="batch-only"):
        match_pattern_stream(
            stream,
            [{"type": "V", "mode": "relaxed"},
             {"type": "C", "mode": "strict", "one_or_more": True}],
            within="30 minutes", watermark="2 minutes",
        )
    with pytest.raises(ValueError, match="until applies to relaxed"):
        match_pattern_stream(
            stream,
            [{"type": "V"},
             {"type": "C", "mode": "strict", "one_or_more": True,
              "until": "Z"},
             {"type": "P", "mode": "relaxed"}],
            within="30 minutes", watermark="2 minutes",
        )
    with pytest.raises(ValueError, match="strict-mode positive"):
        match_pattern_stream(
            stream,
            [{"type": "V"}, {"type": "Z", "mode": "strict",
              "negate": True}, {"type": "P", "mode": "relaxed"}],
            within="30 minutes", watermark="2 minutes",
        )
    with pytest.raises(ValueError, match="batch-only"):
        match_pattern_stream(
            stream, base, within="30 minutes", watermark="2 minutes",
            skip_strategy="skip_past_last_event",
        )


def test_cep_stream_iterative_survives_restart(spark, chunk_dir, tmp_path):
    """Iterative-condition state (ts + mask + carried payload values)
    is checkpointed: a match whose referenced binding arrived before a
    stop/restart boundary still evaluates the predicate correctly
    after restart, and emits exactly once."""
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    sink = tmp_path / "cep_iter_sink"
    ckpt = tmp_path / "cep_iter_ckpt"
    p = (
        Pattern.begin("V")
        .followed_by("P").where("value > s1.value")
        .within("30 minutes")
    )

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="2 minutes")

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(0), "V", 0.4),
        (1, 2, _ts(3), "P", 0.2),  # fails the predicate — skipped
    ])
    run_once()
    assert not sink.exists()

    _write_chunk(chunk_dir, "c2.parquet", [(1, 3, _ts(10), "P", 0.9)])
    _write_chunk(chunk_dir, "c3.parquet", [(99, 9, _ts(120), "Z", 1.0)])
    run_once()
    got = sorted(
        tuple(int(r[c]) for c in ["user_id", "ts_1", "ts_2"])
        for _, r in spark.read.parquet(str(sink)).toPandas().iterrows()
    )
    # the 0.2 P was skipped at binding (qualifying-candidate scan);
    # the 0.9 P, arriving after the restart, bound against the
    # checkpointed V payload
    assert got == [(1, _us(0), _us(10))]


def test_cep_stream_iterative_rejections(spark, chunk_dir):
    """Compositions whose batch twin refuses (variants, strict loops)
    refuse identically; skip strategies and non-numeric / non-subset
    predicates refuse with pointers to the batch operator."""
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    base = Pattern.begin("V").followed_by("P").where("value > s1.value")
    with pytest.raises(ValueError, match="skip_strategy"):
        match_pattern_stream(
            stream, base.within("30 minutes").skip("skip_to_next"),
            watermark="2 minutes",
        )
    p_var = (
        Pattern.begin("V")
        .followed_by("C").optional()
        .followed_by("P").where("value > s1.value")
        .within("30 minutes")
    )
    with pytest.raises(ValueError, match="optional"):
        match_pattern_stream(stream, p_var, watermark="2 minutes")
    p_sloop = (
        Pattern.begin("V")
        .next("C").where("value > prev.value").one_or_more()
        .next("P")
        .within("30 minutes")
    )
    with pytest.raises(ValueError, match="strict one_or_more"):
        match_pattern_stream(stream, p_sloop, watermark="2 minutes")
    p_str = (
        Pattern.begin("V")
        .followed_by("P").where("event_type <> s1.event_type")
        .within("30 minutes")
    )
    with pytest.raises(ValueError, match="numeric"):
        match_pattern_stream(stream, p_str, watermark="2 minutes")
    p_in = (
        Pattern.begin("V")
        .followed_by("P").where("value IN (s1.value, 1.0)")
        .within("30 minutes")
    )
    with pytest.raises(ValueError, match="subset"):
        match_pattern_stream(stream, p_in, watermark="2 minutes")


# --- trigger/evictor recipes (r8) ---------------------------------------


def test_early_fire_snapshot_finals_equal_batch(spark, chunk_dir, tmp_path):
    """early_fire_tumbling_stream(every=None): per-batch partial
    emission with is_final=false; the FINAL rows equal the batch
    tumbling aggregate, and each key/window's partial n_events is a
    non-decreasing prefix of its final."""
    import random

    from flink_note_spark.streaming.ops import early_fire_tumbling_stream

    rng = random.Random(61)
    minutes = rng.sample(range(0, 240), 80)
    rows = sorted(
        [
            (rng.randrange(1, 5), i, _ts(m), "E", round(rng.random(), 3))
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 20:(i + 1) * 20])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 0.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = early_fire_tumbling_stream(
        stream, "user_id", "ts", size="60 minutes", value_col="value",
        watermark="3 minutes",
    )
    _run_to_memory(out, "early_fire_snap", "update", tmp_path)
    got = spark.sql("SELECT * FROM early_fire_snap").toPandas()

    finals = {
        (int(r["user_id"]), int(r["win_start_us"])):
            (int(r["n_events"]), round(float(r["sum_value"]), 4))
        for _, r in got[got["is_final"]].iterrows()
    }
    # batch twin
    import collections
    want = collections.defaultdict(lambda: [0, 0.0])
    size_us = 3_600_000_000
    for (k, _i, ts, _t, v) in rows:
        us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        w = (us // size_us) * size_us
        want[(k, w)][0] += 1
        want[(k, w)][1] += v
    want = {kk: (n, round(s, 4)) for kk, (n, s) in want.items()}
    assert finals == want
    # finals exactly once; partials are non-decreasing prefixes
    assert len(got[got["is_final"]]) == len(finals)
    for kk, (n_final, _s) in finals.items():
        parts = got[
            (~got["is_final"])
            & (got["user_id"] == kk[0])
            & (got["win_start_us"] == kk[1])
        ]["n_events"].tolist()
        assert parts == sorted(parts) and all(p <= n_final for p in parts)


def test_early_fire_boundaries_deterministic(spark, chunk_dir, tmp_path):
    """every='20 minutes' on a 60-minute window: exactly 3 rows per
    live (key, window) — one per boundary — each counting events
    strictly before its boundary; the last is the final."""
    from flink_note_spark.streaming.ops import early_fire_tumbling_stream

    rows = [
        (1, 1, _ts(5), "E", 1.0),
        (1, 2, _ts(25), "E", 2.0),
        (1, 3, _ts(45), "E", 4.0),
        (1, 4, _ts(50), "E", 8.0),
    ]
    _write_chunk(chunk_dir, "c1.parquet", rows[:2])
    _write_chunk(chunk_dir, "c2.parquet", rows[2:])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 9, _ts(600), "Q", 0.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = early_fire_tumbling_stream(
        stream, "user_id", "ts", size="60 minutes", value_col="value",
        watermark="2 minutes", every="20 minutes",
    )
    _run_to_memory(out, "early_fire_bnd", "update", tmp_path)
    got = sorted(
        (int(r["user_id"]), int(r["win_start_us"]), int(r["win_end_us"]),
         int(r["n_events"]), float(r["sum_value"]), bool(r["is_final"]))
        for _, r in spark.sql(
            "SELECT * FROM early_fire_bnd WHERE user_id = 1"
        ).toPandas().iterrows()
    )
    w0 = _us(0)
    assert got == [
        (1, w0, _us(20), 1, 1.0, False),
        (1, w0, _us(40), 2, 3.0, False),
        (1, w0, _us(60), 4, 15.0, True),
    ]


def test_early_fire_every_must_divide_size(spark, chunk_dir):
    from flink_note_spark.streaming.ops import early_fire_tumbling_stream

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA
    )
    with pytest.raises(ValueError, match="divide"):
        early_fire_tumbling_stream(
            stream, "user_id", "ts", size="60 minutes",
            every="7 minutes",
        )


def test_count_evictor_stream_equals_batch(spark, chunk_dir, tmp_path):
    """count_evictor_tumbling_stream finals == batch
    count_evictor_window + groupBy, across micro-batch boundaries
    (the top-n state is maintained incrementally)."""
    import random

    from flink_note_spark.operators.windows import count_evictor_window
    from flink_note_spark.streaming.ops import (
        count_evictor_tumbling_stream,
    )

    rng = random.Random(62)
    minutes = rng.sample(range(0, 240), 80)
    rows = sorted(
        [
            (rng.randrange(1, 5), i, _ts(m), "E", round(rng.random(), 3))
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 20:(i + 1) * 20])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 0.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = count_evictor_tumbling_stream(
        stream, "user_id", "ts", size="60 minutes", n=3,
        value_col="value", watermark="3 minutes",
    )
    _run_to_memory(out, "cnt_evict", "update", tmp_path)
    got = sorted(
        (int(r["user_id"]), int(r["win_start_us"]), int(r["n_kept"]),
         round(float(r["sum_value"]), 4))
        for _, r in spark.sql("SELECT * FROM cnt_evict").toPandas()
        .iterrows()
    )

    batch_df = (
        spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
        .filter("user_id < 99")  # the flusher's window never finalizes
    )
    surv = count_evictor_window(
        batch_df, "user_id", "ts", "60 minutes", 3
    )
    want = sorted(
        (int(r["user_id"]), int(r["win_start_us"]), int(r["n"]),
         round(float(r["s"]), 4))
        for r in surv.groupBy("user_id", "win_start_us")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    assert got == want
    assert got
    # the evictor bites: some window kept fewer than its raw count
    raw = batch_df.groupBy("user_id").count().collect()
    assert any(g[2] == 3 for g in got)


def test_cep_stream_followed_by_any_equals_batch(spark, chunk_dir,
                                                 tmp_path):
    """r8 streaming followedByAny: any-steps branch per candidate
    inside the anchor horizon (complete below it by relaxed finality)
    — stream == batch across micro-batch boundaries, for a plain
    any-step, an any-loop, and an any-step + negation."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _variant_soup(chunk_dir, seed=71, n=200)
    pats = [
        (
            "plain",
            Pattern.begin("V").followed_by_any("C").followed_by("P")
            .within("45 minutes"),
            ["user_id", "ts_1", "ts_2", "ts_3"],
        ),
        (
            "loop",
            Pattern.begin("V").followed_by_any("C").one_or_more()
            .within("45 minutes"),
            ["user_id", "ts_1", "ts_2", "ts_2_last", "n_2"],
        ),
        (
            "neg",
            Pattern.begin("V").not_followed_by("Z")
            .followed_by_any("P").within("45 minutes"),
            ["user_id", "ts_1", "ts_2"],
        ),
    ]
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    runs = []
    for tag, p, cols in pats:
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="3 minutes")
        runs.append((out, f"cep_any_{tag}", "update"))
    _run_many_to_memory(runs, tmp_path)
    for tag, p, cols in pats:
        got = _stream_rows(spark, f"cep_any_{tag}", cols)
        want = _batch_rows(match_pattern(batch_df, p), cols)
        assert got == want, tag
        assert got, tag


def test_cep_stream_any_with_skip_strategy_equals_batch(
    spark, chunk_dir, tmp_path
):
    """Plain any-steps compose with the streaming skip strategies
    (the branching rec feeds the same decided-cap pruning)."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _variant_soup(chunk_dir, seed=72)
    cols = ["user_id", "ts_1", "ts_2"]
    strats = ("no_skip", "skip_to_next", "skip_past_last_event")
    pats = {}
    runs = []
    for strat in strats:
        p = (
            Pattern.begin("V").followed_by_any("C")
            .within("45 minutes").skip(strat)
        )
        pats[strat] = p
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(stream, p, watermark="3 minutes")
        runs.append((out, f"cep_any_skip_{strat}", "update"))
    _run_many_to_memory(runs, tmp_path)
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    for strat in strats:
        got = _stream_rows(spark, f"cep_any_skip_{strat}", cols)
        want = _batch_rows(match_pattern(batch_df, pats[strat]), cols)
        assert got == want, strat
        assert got, strat


def test_cep_stream_any_guards(spark, chunk_dir):
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA
    )
    with pytest.raises(ValueError, match="relaxed"):
        match_pattern_stream(
            stream,
            [{"type": "A"}, {"type": "B", "any": True, "mode": "strict"}],
            within="10 minutes", watermark="1 minutes",
        )
    with pytest.raises(ValueError, match="batch-only"):
        p = (Pattern.begin("A").followed_by_any("B")
             .followed_by("C").optional().within("10 minutes"))
        match_pattern_stream(stream, p, watermark="1 minutes")
    with pytest.raises(ValueError, match="greedy"):
        p = (Pattern.begin("A").followed_by_any("B").one_or_more()
             .within("10 minutes").skip("no_skip"))
        match_pattern_stream(stream, p, watermark="1 minutes")


def test_cep_stream_skip_with_negation_equals_batch(spark, chunk_dir,
                                                    tmp_path):
    """Regression (r8): a negation step on the branching rec path
    (skip strategies / any-steps) recursed forever in the r7 kernel
    (same step index re-entered); pin the fixed behaviour against
    batch."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _variant_soup(chunk_dir, seed=73, n=150)
    p = (
        Pattern.begin("V")
        .not_followed_by("Z")
        .followed_by("P")
        .within("45 minutes")
        .skip("no_skip")
    )
    cols = ["user_id", "ts_1", "ts_2"]
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_stream(stream, p, watermark="3 minutes")
    _run_to_memory(out, "cep_skip_neg", "update", tmp_path)
    got = _stream_rows(spark, "cep_skip_neg", cols)
    want = _batch_rows(
        match_pattern(
            spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir)), p
        ),
        cols,
    )
    assert got == want
    assert got


def test_cep_stream_timeouts_equals_batch(spark, chunk_dir, tmp_path):
    """r8 streaming PatternTimeoutFunction: timed-out partials emit at
    the anchor horizon — equality vs operators/cep
    .match_pattern_timeouts across micro-batch boundaries, plus the
    matches+timeouts anchor partition."""
    from flink_note_spark.operators.cep import (
        Pattern,
        match_pattern,
        match_pattern_timeouts,
    )
    from flink_note_spark.streaming.ops import (
        match_pattern_stream,
        match_pattern_timeouts_stream,
    )

    _variant_soup(chunk_dir, seed=81, n=150)
    p = (
        Pattern.begin("V")
        .followed_by("C")
        .followed_by("P")
        .within("45 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_3", "timeout_step"]
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = match_pattern_timeouts_stream(stream, p, watermark="3 minutes")
    _run_to_memory(out, "cep_touts", "update", tmp_path)
    got = _rows_nullable(
        spark.sql("SELECT * FROM cep_touts").toPandas(), cols
    )
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    want = _rows_nullable(
        match_pattern_timeouts(batch_df, p).toPandas(), cols
    )
    assert got == want
    assert got
    # partition invariant on the streamed outputs: every anchor whose
    # horizon lies below the final watermark is a match XOR a timeout
    stream2 = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    m_out = match_pattern_stream(stream2, p, watermark="3 minutes")
    _run_to_memory(m_out, "cep_touts_m", "update", tmp_path)
    n_matches = spark.sql("SELECT * FROM cep_touts_m").count()
    anchors = batch_df.filter(
        "event_type = 'V' AND user_id < 99"
    ).count()
    assert n_matches + len(got) == anchors


def test_cep_stream_timeouts_survive_restart(spark, chunk_dir, tmp_path):
    """An anchor buffered before a stop/restart still times out at its
    horizon after the restart, exactly once."""
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import (
        match_pattern_timeouts_stream,
    )

    sink = tmp_path / "touts_sink"
    ckpt = tmp_path / "touts_ckpt"
    p = (
        Pattern.begin("V").followed_by("P").within("30 minutes")
    )

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_timeouts_stream(
            stream, p, watermark="2 minutes"
        )

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "V", 1.0)])
    run_once()
    assert not sink.exists()
    _write_chunk(chunk_dir, "c2.parquet", [(99, 9, _ts(120), "Z", 1.0)])
    run_once()
    got = _rows_nullable(
        spark.read.parquet(str(sink)).toPandas(),
        ["user_id", "ts_1", "ts_2", "timeout_step"],
    )
    assert got == [(1, _us(0), None, 2)]


def test_cep_stream_timeouts_guards(spark, chunk_dir):
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import (
        match_pattern_timeouts_stream,
    )

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA
    )
    with pytest.raises(ValueError, match="within"):
        match_pattern_timeouts_stream(
            stream, ["A", "B"], contiguity="relaxed",
            watermark="1 minutes",
        )
    with pytest.raises(ValueError, match="batch-only"):
        p = (Pattern.begin("A").followed_by("B").where("value > 1")
             .within("10 minutes"))
        match_pattern_timeouts_stream(stream, p, watermark="1 minutes")
    with pytest.raises(ValueError, match="relaxed-only"):
        match_pattern_timeouts_stream(
            stream, ["A", "B"], contiguity="strict",
            within="10 minutes", watermark="1 minutes",
        )


# --- window top-n / window dedup streams (Flink SQL TVFs, r8) ------------

def test_window_top_n_stream_equals_batch(spark, chunk_dir, tmp_path):
    """window_top_n_stream finals == batch window_top_n, across
    micro-batch boundaries (the O(n) top-n state is incremental)."""
    import random

    from flink_note_spark.operators.windows import window_top_n
    from flink_note_spark.streaming.ops import window_top_n_stream

    rng = random.Random(63)
    minutes = rng.sample(range(0, 240), 80)
    rows = sorted(
        [
            (rng.randrange(1, 5), i, _ts(m), "E", round(rng.random(), 3))
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 20:(i + 1) * 20])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 0.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = window_top_n_stream(
        stream, "user_id", "ts", size="60 minutes", n=3,
        value_col="value", watermark="3 minutes",
    )
    _run_to_memory(out, "win_topn", "update", tmp_path)
    got = {
        (int(r["user_id"]), int(r["win_start_us"]), int(r["rn"]),
         int(r["ts_us"]), float(r["value"]))
        for _, r in spark.sql("SELECT * FROM win_topn").toPandas().iterrows()
    }

    batch = spark.createDataFrame(rows, EVENT_SCHEMA)
    want = {
        (int(r.user_id),
         int(r.win.start.replace(tzinfo=dt.timezone.utc).timestamp()
             * 1_000_000),
         int(r.rn),
         int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp()
             * 1_000_000),
         float(r.value))
        for r in window_top_n(
            batch, "ts", "60 minutes",
            [F.col("value").desc(), F.col("ts").asc()],
            n=3, partition_cols=["user_id"],
        ).collect()
    }
    assert got == want


def test_window_dedup_stream_first_last_equal_batch(
    spark, chunk_dir, tmp_path
):
    """window_dedup_stream(keep=first|last) == batch window_dedup."""
    import random

    from flink_note_spark.operators.windows import window_dedup
    from flink_note_spark.streaming.ops import window_dedup_stream

    rng = random.Random(64)
    minutes = rng.sample(range(0, 240), 60)
    rows = sorted(
        [
            (rng.randrange(1, 4), i, _ts(m), "E", round(rng.random(), 3))
            for i, m in enumerate(minutes)
        ],
        key=lambda r: r[2],
    )
    for i in range(3):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 20:(i + 1) * 20])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 0.0)])

    batch = spark.createDataFrame(rows, EVENT_SCHEMA)
    for keep in ("first", "last"):
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = window_dedup_stream(
            stream, "user_id", "ts", size="60 minutes", keep=keep,
            value_col="value", watermark="3 minutes",
        )
        _run_to_memory(out, f"win_dedup_{keep}", "update", tmp_path)
        got = {
            (int(r["user_id"]), int(r["win_start_us"]),
             int(r["ts_us"]), float(r["value"]))
            for _, r in spark.sql(
                f"SELECT * FROM win_dedup_{keep}"
            ).toPandas().iterrows()
        }
        want = {
            (int(r.user_id),
             int(r.win.start.replace(tzinfo=dt.timezone.utc).timestamp()
                 * 1_000_000),
             int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp()
                 * 1_000_000),
             float(r.value))
            for r in window_dedup(
                batch, "ts", "60 minutes", ["user_id"], keep=keep,
            ).collect()
        }
        assert got == want


def test_window_stream_validation(spark, chunk_dir):
    from flink_note_spark.streaming.ops import (
        window_dedup_stream,
        window_top_n_stream,
    )

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA
    )
    with pytest.raises(ValueError, match="n must be"):
        window_top_n_stream(stream, "user_id", "ts", "60 minutes", n=0)
    with pytest.raises(ValueError, match="first|last"):
        window_dedup_stream(
            stream, "user_id", "ts", "60 minutes", keep="mid"
        )


# --- state TTL + allowed lateness (r8) -----------------------------------

def test_keyed_running_agg_ttl_resets_on_gap(spark, chunk_dir, tmp_path):
    """keyed_running_agg_stream with ttl: an event-time gap > ttl
    resets the aggregate; without ttl it accumulates forever."""
    from flink_note_spark.streaming.ops import keyed_running_agg_stream

    rows1 = [(1, 1, _ts(0), "E", 1.0), (1, 2, _ts(5), "E", 2.0)]
    rows2 = [(1, 3, _ts(8), "E", 4.0)]         # within ttl: accumulates
    rows3 = [(1, 4, _ts(60), "E", 8.0)]        # gap 52 min > ttl: reset
    _write_chunk(chunk_dir, "c1.parquet", rows1)
    _write_chunk(chunk_dir, "c2.parquet", rows2)
    _write_chunk(chunk_dir, "c3.parquet", rows3)

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = keyed_running_agg_stream(
        stream, "user_id", "ts", value_col="value",
        ttl="10 minutes", watermark="1 minutes",
    )
    _run_to_memory(out, "ttl_agg", "update", tmp_path)
    got = sorted(
        (int(r["user_id"]), int(r["last_ts_us"]), int(r["n"]),
         float(r["sum_value"]))
        for _, r in spark.sql("SELECT * FROM ttl_agg").toPandas().iterrows()
    )
    assert got == [
        (1, _us(5), 2, 3.0),    # batch 1: two events
        (1, _us(8), 3, 7.0),    # batch 2: within ttl, accumulates
        (1, _us(60), 1, 8.0),   # batch 3: gap > ttl, reset
    ]


def test_keyed_running_agg_no_ttl_accumulates(spark, chunk_dir, tmp_path):
    from flink_note_spark.streaming.ops import keyed_running_agg_stream

    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "E", 1.0)])
    _write_chunk(chunk_dir, "c2.parquet", [(1, 2, _ts(600), "E", 2.0)])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = keyed_running_agg_stream(
        stream, "user_id", "ts", value_col="value",
        watermark="1 minutes",
    )
    _run_to_memory(out, "agg_nottl", "update", tmp_path)
    got = sorted(
        (int(r["n"]), float(r["sum_value"]))
        for _, r in spark.sql(
            "SELECT * FROM agg_nottl"
        ).toPandas().iterrows()
    )
    assert got == [(1, 1.0), (2, 3.0)]


def test_keyed_running_agg_intra_batch_gap_resets(spark, chunk_dir, tmp_path):
    """Resets apply at event-time gaps WITHIN one batch too (the
    vectorized segmentation path)."""
    from flink_note_spark.streaming.ops import keyed_running_agg_stream

    rows = [(1, 1, _ts(0), "E", 1.0), (1, 2, _ts(2), "E", 2.0),
            (1, 3, _ts(30), "E", 4.0), (1, 4, _ts(31), "E", 8.0)]
    _write_chunk(chunk_dir, "c1.parquet", rows)
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
    )
    out = keyed_running_agg_stream(
        stream, "user_id", "ts", value_col="value",
        ttl="10 minutes", watermark="1 minutes",
    )
    _run_to_memory(out, "ttl_intra", "update", tmp_path)
    got = [
        (int(r["n"]), float(r["sum_value"]))
        for _, r in spark.sql(
            "SELECT * FROM ttl_intra"
        ).toPandas().iterrows()
    ]
    # only the post-reset segment survives: events at minutes 30, 31
    assert got == [(2, 12.0)]


def test_keyed_running_agg_processing_ttl_stubbed_clock(
    spark, chunk_dir, tmp_path
):
    """r9 ttl_clock='processing' (Flink StateTtlConfig's default): the
    WALL clock drives expiry — identical event times expire or survive
    purely by how much stubbed wall time passed between batches."""
    from flink_note_spark.streaming.ops import (
        file_wall_clock,
        keyed_running_agg_stream,
    )

    clock_file = tmp_path / "fake_clock.txt"
    clock_file.write_text("1000.0")
    sink = tmp_path / "pttl_sink"
    ckpt = tmp_path / "pttl_ckpt"

    import time

    def run_batch(chunk_name, rows, wall_s, expect_rows):
        # processing-time timers keep the query scheduling batches, so
        # availableNow/processAllAvailable never quiesce (the Flink
        # behavior: pending timers keep the job alive) — poll the sink
        # for this batch's output, then stop
        clock_file.write_text(str(wall_s))
        _write_chunk(chunk_dir, chunk_name, rows)
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=10,
        )
        out = keyed_running_agg_stream(
            stream, "user_id", "ts", value_col="value",
            ttl="10 minutes", ttl_clock="processing",
            _wall_clock=file_wall_clock(str(clock_file)),
        )

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.parquet(str(sink)).count() >= expect_rows:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        q.stop()

    # batch 1 at wall t=1000: two events accumulate
    run_batch("c1.parquet", [
        (1, 1, _ts(0), "E", 1.0), (1, 2, _ts(5), "E", 2.0),
    ], 1000.0, 1)
    # batch 2 at wall t=1300 (5 min later, inside the 10-min TTL):
    # accumulates — even though the EVENT time jumped 55 minutes,
    # which would have reset the event-time clock
    run_batch("c2.parquet", [(1, 3, _ts(60), "E", 4.0)], 1300.0, 2)
    # batch 3 at wall t=2000 (>10 min since last update): reset —
    # even though the event time is only 1 minute after the last
    run_batch("c3.parquet", [(1, 4, _ts(61), "E", 8.0)], 2000.0, 3)

    got = sorted(
        (int(r["last_ts_us"]), int(r["n"]), float(r["sum_value"]))
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert got == [
        (_us(5), 2, 3.0),     # wall 1000: fresh
        (_us(60), 3, 7.0),    # wall 1300: within wall TTL → accumulate
        (_us(61), 1, 8.0),    # wall 2000: wall gap > TTL → reset
    ]


def test_keyed_running_agg_processing_ttl_validation(spark, chunk_dir):
    from flink_note_spark.streaming.ops import keyed_running_agg_stream

    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "E", 1.0)])
    stream = read_file_stream(spark, "parquet", str(chunk_dir), EVENT_SCHEMA)
    with pytest.raises(ValueError, match="requires ttl"):
        keyed_running_agg_stream(
            stream, "user_id", "ts", ttl_clock="processing",
        )
    with pytest.raises(ValueError, match="ttl_clock must be"):
        keyed_running_agg_stream(
            stream, "user_id", "ts", ttl="1 minutes", ttl_clock="wall",
        )


def test_allowed_lateness_refires_then_drops(spark, chunk_dir, tmp_path):
    """allowedLateness: on-time firing at watermark-past-end, one
    re-firing per late batch within the grace period, silence after
    end + lateness."""
    from flink_note_spark.streaming.ops import (
        allowed_lateness_tumbling_stream,
    )

    # window [0, 60); watermark delay 1 min, lateness 30 min
    _write_chunk(chunk_dir, "c1.parquet",
                 [(1, 1, _ts(5), "E", 1.0), (1, 2, _ts(20), "E", 2.0)])
    # advances true wm past 60 -> on-time firing of [0,60)
    _write_chunk(chunk_dir, "c2.parquet", [(1, 3, _ts(62), "E", 0.5)])
    # late but within grace (true wm ~61, end+lateness=90) -> re-fire
    _write_chunk(chunk_dir, "c3.parquet", [(1, 4, _ts(10), "E", 4.0)])
    # advances true wm past 90 -> grace over for [0,60)
    _write_chunk(chunk_dir, "c4.parquet", [(1, 5, _ts(95), "E", 0.25)])
    # too late for [0,60) now -> dropped by the operator
    _write_chunk(chunk_dir, "c5.parquet", [(1, 6, _ts(15), "E", 8.0)])
    # push watermark far out so every window expires
    _write_chunk(chunk_dir, "c9.parquet", [(99, 9, _ts(600), "Q", 0.0)])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = allowed_lateness_tumbling_stream(
        stream, "user_id", "ts", size="60 minutes",
        lateness="30 minutes", value_col="value",
        watermark="1 minutes",
    )
    _run_to_memory(out, "lateness", "update", tmp_path)
    got = sorted(
        (int(r["user_id"]), int(r["win_start_us"]), int(r["firing"]),
         int(r["n_events"]), float(r["sum_value"]))
        for _, r in spark.sql(
            "SELECT * FROM lateness WHERE user_id = 1"
        ).toPandas().iterrows()
    )
    w0, w60 = _us(0), _us(60)
    assert (1, w0, 0, 2, 3.0) in got          # on-time firing
    assert (1, w0, 1, 3, 7.0) in got          # late re-firing adds 4.0
    # the too-late event (value 8.0) never appears for window 0
    assert not any(
        w == w0 and s >= 11.0 for (_u, w, _f, _n, s) in got
    )
    # firing numbers for window 0: exactly {0, 1}
    assert sorted(f for (_u, w, f, _n, _s) in got if w == w0) == [0, 1]
    # window [60,120) fired on time with its two events
    assert any(
        w == w60 and f == 0 and n == 2 for (_u, w, f, n, _s) in got
    )


def test_top_n_stream_final_equals_batch_topk(spark, chunk_dir, tmp_path):
    """Continuous (unwindowed) Top-N: the final upsert state per
    (key, rn) equals the batch topk_per_group; a batch that does not
    change a key's top-n emits nothing for it."""
    import random

    from flink_note_spark.operators.windows import topk_per_group
    from flink_note_spark.streaming.ops import top_n_stream

    rng = random.Random(65)
    rows = sorted(
        [
            (rng.randrange(1, 4), i, _ts(i), "E",
             round(rng.random() * 100, 3))
            for i in range(60)
        ],
        key=lambda r: r[2],
    )
    for i in range(3):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 20:(i + 1) * 20])

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = top_n_stream(
        stream, "user_id", "ts", n=3, value_col="value",
        watermark="3 minutes",
    )
    _run_to_memory(out, "cont_topn", "update", tmp_path)
    pdf = spark.sql("SELECT * FROM cont_topn").toPandas()
    # upsert semantics: last emission per (key, rn) wins
    final = {}
    for _, r in pdf.iterrows():
        final[(int(r["user_id"]), int(r["rn"]))] = (
            int(r["ts_us"]), float(r["value"])
        )

    batch = spark.createDataFrame(rows, EVENT_SCHEMA)
    want = {
        (int(r.user_id), int(r.rn)): (
            int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp()
                * 1_000_000),
            float(r.value),
        )
        for r in topk_per_group(
            batch, ["user_id"],
            [F.col("value").desc(), F.col("ts").asc()], 3,
        ).collect()
    }
    assert final == want


def test_top_n_stream_emits_only_on_change(spark, chunk_dir, tmp_path):
    from flink_note_spark.streaming.ops import top_n_stream

    # batch 1 sets the top-1; batch 2 is all lower -> no emission
    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "E", 50.0)])
    _write_chunk(chunk_dir, "c2.parquet", [(1, 2, _ts(1), "E", 10.0)])
    _write_chunk(chunk_dir, "c3.parquet", [(1, 3, _ts(2), "E", 99.0)])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = top_n_stream(
        stream, "user_id", "ts", n=1, value_col="value",
        watermark="1 minutes",
    )
    _run_to_memory(out, "topn_chg", "update", tmp_path)
    got = [
        (int(r["rn"]), float(r["value"]))
        for _, r in spark.sql(
            "SELECT * FROM topn_chg"
        ).toPandas().iterrows()
    ]
    # two emissions only: the 50.0 ranking and the 99.0 replacement
    assert sorted(got) == [(1, 50.0), (1, 99.0)]


# --- streaming MinHash near-dup (late-r8) --------------------------------


def _mh_chunks(tmp_path, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "mh_chunks"
    d.mkdir()
    schema = pa.schema([
        ("doc_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("text", pa.string()),
    ])
    per = len(docs) // 4 + 1
    for j in range(0, len(docs), per):
        t = pa.Table.from_pylist(
            [dict(zip(["doc_id", "ts", "text"], r)) for r in docs[j:j + per]],
            schema=schema,
        )
        path = d / f"c{j}.parquet"
        pq.write_table(t, str(path))
        # strictly increasing mtimes: FileStreamSource orders batches
        # by modification time, and same-millisecond writes (common
        # under full-suite load) otherwise make chunk order — and the
        # order-dependent flood-cap assertions — nondeterministic
        import os

        os.utime(path, (1_700_000_000 + j, 1_700_000_000 + j))
    return d


def _mh_docs(seed, n_docs=40, dup_rate=0.5):
    import random

    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "iota", "kappa"]
    docs, i = [], 0
    for _ in range(n_docs):
        t = " ".join(rng.choice(words) for _ in range(rng.randrange(8, 16)))
        docs.append((i, _ts(i), t))
        i += 1
        if rng.random() < dup_rate:
            toks = t.split()
            toks[rng.randrange(len(toks))] = rng.choice(words)
            docs.append((i, _ts(i), " ".join(toks)))
            i += 1
    return docs


def test_minhash_dedup_stream_equals_batch(spark, tmp_path):
    """Ingest-time MinHash dedup: the streamed pair set (est >=
    threshold) equals the batch minhash_lsh_pairs candidates at the
    same est threshold — the per-row Catalyst signature path is
    bit-identical to the batch explode+groupBy path, and the bucket
    state machine reproduces the band equi-join incrementally."""
    from flink_note_spark.operators.dedup import minhash_lsh_pairs
    from flink_note_spark.streaming.ops import minhash_dedup_stream

    docs = _mh_docs(23)
    d = _mh_chunks(tmp_path, docs)
    schema = "doc_id long, ts timestamp, text string"
    thr = 0.5
    want = {
        frozenset((r.d1, r.d2))
        for r in minhash_lsh_pairs(
            spark.read.schema(schema).parquet(str(d)),
            "doc_id", "text", n=3, num_hashes=32, bands=8,
            threshold=thr, verify=False, ids_unique=True,
        ).filter(F.col("est_jaccard") >= thr).collect()
    }
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(d))
    )
    out = minhash_dedup_stream(
        stream, "doc_id", "text", "ts", watermark="2 minutes",
        n=3, num_hashes=32, bands=8, threshold=thr,
    )
    _run_to_memory(out, "mh_stream", "update", tmp_path)
    rows = spark.sql("SELECT * FROM mh_stream").collect()
    got = {frozenset((r.doc_id, r.dup_of)) for r in rows}
    assert got == want
    assert got
    # dup_of is always the earlier document by (ts, id): ids here are
    # ts-ordered, so dup_of < doc_id
    assert all(r.dup_of < r.doc_id for r in rows)


def test_minhash_dedup_stream_retention_bounds_state(spark, tmp_path):
    """retention= evicts bucket history by event time: an identical
    document arriving within the window pairs; after the window it
    does not (dedup means 'against the retained window')."""
    from flink_note_spark.streaming.ops import minhash_dedup_stream

    text = "alpha beta gamma delta eps zeta eta theta"
    docs = [
        (1, _ts(0), text),
        (2, _ts(5), text),     # within 30 min of doc 1 → pairs
        (3, _ts(200), text),   # 195 min later → history evicted
        (4, _ts(205), text),   # pairs with doc 3 only
        (9, _ts(900), "unrelated filler words only"),
    ]
    d = _mh_chunks(tmp_path, docs)
    schema = "doc_id long, ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(d))
    )
    out = minhash_dedup_stream(
        stream, "doc_id", "text", "ts", watermark="2 minutes",
        n=3, num_hashes=16, bands=4, threshold=0.9,
        retention="30 minutes",
    )
    _run_to_memory(out, "mh_ret", "update", tmp_path)
    pairs = {
        (r.doc_id, r.dup_of)
        for r in spark.sql("SELECT * FROM mh_ret").collect()
    }
    assert pairs == {(2, 1), (4, 3)}


def test_minhash_dedup_stream_flood_cap(spark, tmp_path):
    """max_bucket freezes a flooded bucket: identical boilerplate
    beyond the cap stops storing AND matching (the streaming rendering
    of the batch anti-join flood policy — a stream cannot
    retroactively unemit, so the cap bounds both state and output)."""
    from flink_note_spark.streaming.ops import minhash_dedup_stream

    text = "alpha beta gamma delta eps zeta eta theta"
    docs = [(i, _ts(i), text) for i in range(6)]
    docs.append((9, _ts(900), "unrelated filler words only"))
    d = _mh_chunks(tmp_path, docs)
    schema = "doc_id long, ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(d))
    )
    out = minhash_dedup_stream(
        stream, "doc_id", "text", "ts", watermark="2 minutes",
        n=3, num_hashes=16, bands=4, threshold=0.9, max_bucket=3,
    )
    _run_to_memory(out, "mh_cap", "update", tmp_path)
    pairs = {
        (r.doc_id, r.dup_of)
        for r in spark.sql("SELECT * FROM mh_cap").collect()
    }
    # docs 0-2 fill each bucket; docs 3+ are frozen out: no pair
    # involves a doc_id > 2
    assert pairs == {(1, 0), (2, 0), (2, 1)}


# ------------------------------------------- streaming paragraph dedup

def _pd_chunks(tmp_path, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "pd_chunks"
    d.mkdir()
    schema = pa.schema([
        ("doc_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("text", pa.string()),
    ])
    per = max(1, len(docs) // 3)
    base = time.time() - len(docs) - 10
    for j in range(0, len(docs), per):
        t = pa.Table.from_pylist(
            [dict(zip(["doc_id", "ts", "text"], r)) for r in docs[j:j + per]],
            schema=schema,
        )
        path = str(d / f"c{j:03d}.parquet")
        pq.write_table(t, path)
        # strictly increasing mtimes: the file source orders batches by
        # modification time, and a tight write loop can land two chunks
        # on one clock tick (arrival order then depends on listing
        # order — observed flaky under load)
        os.utime(path, (base + j, base + j))
    return d


def test_paragraph_dedup_stream_equals_batch(spark, tmp_path):
    """Streamed surviving paragraphs == the batch operator's kept set
    when documents arrive in id order (the replay case): same digest,
    same first-occurrence choice, same min_len bypass."""
    from flink_note_spark.operators.dedup import (
        paragraph_dedup,
        split_paragraphs,
    )
    from flink_note_spark.streaming.ops import paragraph_dedup_stream

    docs = [
        (1, _ts(0), "Intro text.\n\nCookie banner here.\n\nUnique one."),
        (2, _ts(5), "Cookie banner here.\n\nUnique two.\n\n"
                    "cookie   BANNER here."),
        (3, _ts(10), "Cookie banner here."),
        (4, _ts(15), "x\n\nx\n\ny"),
        (5, _ts(20), "Unique one.\n\nFresh paragraph five."),
    ]
    schema = "doc_id long, ts timestamp, text string"
    d = _pd_chunks(tmp_path, docs)
    batch_docs = spark.read.schema(schema).parquet(str(d))
    # batch kept set = exploded paragraphs minus the dropped copies;
    # recover it from the flagged internals via the public output
    # (reassembled text split back on the separator)
    kept_batch = {
        (r.doc_id, p)
        for r in paragraph_dedup(
            split_paragraphs(batch_docs), min_len=2
        ).collect()
        for p in r.text.split("\n\n")
    }
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(d))
    )
    out = paragraph_dedup_stream(
        stream, "doc_id", "text", "ts",
        watermark="2 minutes", min_len=2,
    )
    _run_to_memory(out, "pd_stream", "append", tmp_path)
    rows = spark.sql("SELECT * FROM pd_stream").collect()
    got = {(r.doc_id, r.para) for r in rows}
    assert got == kept_batch
    assert got
    # doc 3's only paragraph is a later copy — nothing survives
    assert not any(i == 3 for i, _p in got)


def test_paragraph_dedup_stream_retention_readmits(spark, tmp_path):
    """retention= re-admits a paragraph once the owner is older than
    the window (dedup means 'against the retained window'), and the
    short-paragraph bypass emits every arrival."""
    from flink_note_spark.streaming.ops import paragraph_dedup_stream

    docs = [
        (1, _ts(0), "Cookie banner here.\n\nok"),
        (2, _ts(5), "Cookie banner here."),    # within 30 min: dropped
        (3, _ts(200), "Cookie banner here."),  # window passed: re-owns
        (4, _ts(205), "Cookie banner here.\n\nok"),  # dropped again
    ]
    schema = "doc_id long, ts timestamp, text string"
    d = _pd_chunks(tmp_path, docs)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(str(d))
    )
    out = paragraph_dedup_stream(
        stream, "doc_id", "text", "ts",
        watermark="2 minutes", min_len=3, retention="30 minutes",
    )
    _run_to_memory(out, "pd_ret", "append", tmp_path)
    rows = spark.sql("SELECT * FROM pd_ret").collect()
    banner = sorted(
        r.doc_id for r in rows if r.para == "Cookie banner here."
    )
    assert banner == [1, 3]
    shorts = sorted(r.doc_id for r in rows if r.para == "ok")
    assert shorts == [1, 4]  # min_len bypass: every arrival emits


def test_bloom_dedup_stream_equals_exact_when_roomy(spark, tmp_path):
    """With a roomy filter the Bloom dedup's survivors EQUAL exact
    first-arrival dedup across micro-batch boundaries (no false
    positives at negligible load), and every true duplicate is dropped
    (no false negatives ever)."""
    from flink_note_spark.streaming.ops import bloom_dedup_stream

    rows = []
    for b in range(4):
        for i in range(40):
            key = f"k{(b * 17 + i) % 60}"  # repeats across batches
            rows.append((key, _ts(b * 10 + i * 0.1), b * 100 + i))
    schema = "k string, ts timestamp, payload long"
    # one parquet dir per batch for maxFilesPerTrigger=1
    src = tmp_path / "bloom_src"
    src.mkdir()
    for b in range(4):
        chunk = rows[b * 40:(b + 1) * 40]
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    out = bloom_dedup_stream(
        stream, ["k"], "ts", n_shards=8, bits_per_shard=1 << 16
    )
    _run_to_memory(out, "bloom_roomy", "append", tmp_path)
    got = spark.sql("SELECT * FROM bloom_roomy").collect()
    # exact first arrival per key over the whole feed
    first = {}
    for k, ts, payload in rows:
        if k not in first:
            first[k] = payload
    assert {r.k: r.payload for r in got} == first
    assert len(got) == 60


def test_bloom_dedup_stream_fp_tradeoff_and_no_false_negatives(
    spark, tmp_path
):
    """A deliberately tiny filter FORCES false positives: some novel
    keys are wrongly dropped (survivors < distinct keys) — the
    documented space/accuracy trade — while duplicates are still always
    dropped (nothing survives twice)."""
    from flink_note_spark.streaming.ops import bloom_dedup_stream

    schema = "k string, ts timestamp, payload long"
    rows = [(f"key{i}", _ts(i * 0.1), i) for i in range(400)]
    rows += rows[:50]  # true duplicates
    src = tmp_path / "bloom_tiny"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = bloom_dedup_stream(
        stream, ["k"], "ts", n_shards=1, bits_per_shard=256, n_hashes=4
    )
    _run_to_memory(out, "bloom_tiny_t", "append", tmp_path)
    got = spark.sql("SELECT k FROM bloom_tiny_t").collect()
    ks = [r.k for r in got]
    assert len(ks) == len(set(ks))  # a key NEVER survives twice
    assert len(ks) < 400            # tiny filter must collide


def test_bloom_dedup_stream_state_survives_restart(spark, tmp_path):
    """The filter state persists across a query restart: keys seen
    before the restart stay dropped after it."""
    from flink_note_spark.sources.files import write_stream_sink
    from flink_note_spark.streaming.ops import bloom_dedup_stream

    schema = "k string, ts timestamp, payload long"
    src = tmp_path / "bloom_restart_src"
    src.mkdir()
    sink = str(tmp_path / "bloom_restart_sink")
    ckpt = str(tmp_path / "bloom_restart_ckpt")
    spark.createDataFrame(
        [(f"k{i}", _ts(i), i) for i in range(20)], schema
    ).coalesce(1).write.parquet(str(src / "a"))

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        out = bloom_dedup_stream(
            stream, ["k"], "ts", n_shards=4, bits_per_shard=1 << 14
        )
        q = write_stream_sink(
            out, "parquet", sink, checkpoint=ckpt, output_mode="append"
        ).start()
        q.processAllAvailable()
        q.stop()

    run_once()
    # second wave: 10 repeats (must be dropped) + 10 fresh
    spark.createDataFrame(
        [(f"k{i}", _ts(100 + i), 1000 + i) for i in range(10, 30)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b"))
    run_once()
    got = spark.read.parquet(sink).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.k, []).append(r.payload)
    assert all(len(v) == 1 for v in by_key.values())
    assert set(by_key) == {f"k{i}" for i in range(30)}
    # the repeated k10..k19 kept their FIRST (pre-restart) payloads
    for i in range(10, 20):
        assert by_key[f"k{i}"] == [i]


def test_bloom_dedup_stream_validation(spark, tmp_path):
    from flink_note_spark.streaming.ops import bloom_capacity, bloom_dedup_stream

    schema = "k string, ts timestamp"
    src = tmp_path / "bloom_val_src"
    spark.createDataFrame([("a", _ts(0))], schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    with pytest.raises(ValueError, match="power of two"):
        bloom_dedup_stream(stream, ["k"], "ts", bits_per_shard=1000)
    with pytest.raises(ValueError, match="n_shards"):
        bloom_dedup_stream(stream, ["k"], "ts", n_shards=0)
    with pytest.raises(ValueError, match="not in the stream"):
        bloom_dedup_stream(stream, ["missing"], "ts")
    m, k = bloom_capacity(1_000_000, 0.01)
    assert 9_000_000 < m < 10_100_000 and k in (6, 7)
    with pytest.raises(ValueError, match="fp_rate"):
        bloom_capacity(100, 1.5)


# ------------------------------------------------------------------ r10:
# streaming upsert materialization (changelog compaction twin)


def _upsert_current_state(spark, table: str) -> dict:
    """Fold an update-mode memory sink to its final state: the LAST
    emitted row per key wins (batch ordinal = arrival order, which the
    memory sink preserves within its append log)."""
    pdf = spark.sql(f"SELECT * FROM {table}").toPandas()
    state = {}
    for _, r in pdf.iterrows():
        state[r["user_id"]] = (r["ts"], r["event_id"], r["value"])
    return state


def test_upsert_latest_stream_equals_batch(spark, chunk_dir, tmp_path):
    """Streamed changelog compaction == batch upsert_latest over the
    same rows, including a LATE stale version that must lose to the
    stored winner."""
    from flink_note_spark.operators.changelog import upsert_latest
    from flink_note_spark.streaming.ops import upsert_latest_stream

    rows1 = [
        (1, 1, _ts(0), "view", 1.0),
        (2, 2, _ts(1), "view", 2.0),
    ]
    rows2 = [
        (1, 3, _ts(5), "click", 3.0),   # newer version for key 1
        (2, 4, _ts(0), "click", 9.0),   # STALE (older ts) — must lose
        (3, 5, _ts(2), "view", 4.0),
    ]
    _write_chunk(chunk_dir, "c1.parquet", rows1)
    _write_chunk(chunk_dir, "c2.parquet", rows2)

    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    out = upsert_latest_stream(
        stream, ["user_id"], version_col="ts", tiebreak="event_id"
    )
    _run_to_memory(out, "upsert_out", "update", tmp_path)
    got = _upsert_current_state(spark, "upsert_out")

    batch = spark.createDataFrame(rows1 + rows2, EVENT_SCHEMA)
    want = {
        r["user_id"]: (r["ts"], r["event_id"], r["value"])
        for r in upsert_latest(
            batch, ["user_id"], "ts", tiebreak="event_id"
        ).collect()
    }
    assert got == want
    assert got[2][1] == 2  # stale late row lost


def test_upsert_latest_stream_restart_resumes_state(spark, chunk_dir, tmp_path):
    """Stop → new input → restart from the same checkpoint: the store
    keeps the compacted per-key state, so a late stale version arriving
    AFTER the restart still loses."""
    from flink_note_spark.streaming.ops import upsert_latest_stream

    sink = tmp_path / "ups_sink"
    ckpt = tmp_path / "ups_ckpt"
    _write_chunk(chunk_dir, "c1.parquet", [
        (1, 1, _ts(10), "view", 1.0),
    ])

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = upsert_latest_stream(
            stream, ["user_id"], version_col="ts", tiebreak="event_id"
        )

        # update-mode agg → append memory/file sink rejected; stamp each
        # micro-batch's upserts with the batch ordinal via foreachBatch
        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.withColumn("__batch", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    run_once()
    _write_chunk(chunk_dir, "c2.parquet", [
        (1, 9, _ts(5), "click", 9.0),   # stale vs pre-restart state
        (2, 2, _ts(1), "view", 2.0),
    ])
    run_once()
    pdf = spark.read.parquet(str(sink)).toPandas()
    got = {}
    for _, r in pdf.sort_values("__batch").iterrows():
        got[r["user_id"]] = (r["ts"], r["event_id"], r["value"])
    assert got[1] == (_ts(10), 1, 1.0)  # pre-restart winner survived
    assert got[2] == (_ts(1), 2, 2.0)


# ------------------------------------------------------------------ r10:
# skip strategies over streaming variant unions (optional()/times(n,m))


def _variants_skip_case(spark, chunk_dir, tmp_path, tag, pattern,
                        cols, strategy, watermark="3 minutes"):
    return _variants_skip_cases(
        spark, chunk_dir, tmp_path,
        [(tag, pattern, cols, strategy)], watermark,
    )[0]


def _variants_skip_cases(spark, chunk_dir, tmp_path, cases,
                         watermark="3 minutes"):
    """Drain every (tag, pattern, cols, strategy) case concurrently
    (see _run_many_to_memory), then assert each against batch. Same
    queries and assertions as the one-at-a-time shape."""
    from flink_note_spark.operators.cep import match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    runs = []
    for tag, pattern, _cols, strategy in cases:
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(
            stream, pattern, watermark=watermark, skip_strategy=strategy,
        )
        runs.append((out, f"cep_vskip_{tag}", "update"))
    _run_many_to_memory(runs, tmp_path)
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    gots = []
    for tag, pattern, cols, strategy in cases:
        want = _rows_nullable(
            match_pattern(batch_df, pattern, skip_strategy=strategy)
            .toPandas(), cols,
        )
        got = _rows_nullable(
            spark.sql(f"SELECT * FROM cep_vskip_{tag}").toPandas(), cols
        )
        assert got == want, (tag, strategy)
        gots.append(got)
    return gots


def test_cep_stream_variants_skip_relaxed_equals_batch(
    spark, chunk_dir, tmp_path
):
    """r10: every skip strategy over a RELAXED loop-free variant union
    (V C? P) — the batch prunes the whole union in (end, start)
    completion order; the stream renders it via in-window per-anchor
    selection (skip_to_next) or the pending-release bound chain
    (sequential strategies)."""
    from flink_note_spark.operators.cep import Pattern

    _variant_soup(chunk_dir, seed=61)
    p = (
        Pattern.begin("V")
        .followed_by("C").optional()
        .followed_by("P")
        .within("45 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_3"]
    gots = _variants_skip_cases(spark, chunk_dir, tmp_path, [
        (f"rx_{strategy.replace(':', '_')}", p, cols, strategy)
        for strategy in (
            "no_skip", "skip_to_next", "skip_past_last_event",
            "skip_to_first:1", "skip_to_last:2",
        )
    ])
    assert sum(bool(g) for g in gots) >= 4  # the soup exercises every strategy


def test_cep_stream_variants_skip_times_range(spark, chunk_dir, tmp_path):
    """times(1, 2) variants under the sequential chain and per-anchor
    selection: count variants of one anchor complete at different
    ends — the chain must judge them in completion order."""
    from flink_note_spark.operators.cep import Pattern

    _variant_soup(chunk_dir, seed=62)
    p = (
        Pattern.begin("V")
        .followed_by("C").times(1, 2)
        .followed_by("P")
        .within("60 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_2_last", "ts_3"]
    gots = _variants_skip_cases(spark, chunk_dir, tmp_path, [
        (f"tr_{strategy.replace(':', '_')}", p, cols, strategy)
        for strategy in ("skip_to_next", "skip_past_last_event")
    ])
    assert all(gots)


def test_cep_stream_variants_skip_strict(spark, chunk_dir, tmp_path):
    """STRICT variant decisions are end-monotone across watermark
    windows, so the chain consumes each window directly; skip_to_next
    suppresses later-deciding matches of an emitted start via the
    anchor set in pend."""
    from flink_note_spark.operators.cep import Pattern

    # dense adjacency soup: only two types so strict V [C] V runs occur
    import random

    rng = random.Random(63)
    rows = [
        (rng.randrange(1, 4), i, _ts(i),
         rng.choice(("V", "C")), 1.0)
        for i in range(80)
    ]
    for i in range(4):
        _write_chunk(chunk_dir, f"c{i}.parquet", rows[i * 20:(i + 1) * 20])
    _write_chunk(chunk_dir, "c9.parquet", [(99, 999, _ts(900), "Q", 1.0)])
    p = (
        Pattern.begin("V").next("C").optional().next("V")
        .within("90 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_3"]
    gots = _variants_skip_cases(spark, chunk_dir, tmp_path, [
        (f"st_{strategy.replace(':', '_')}", p, cols, strategy)
        for strategy in ("skip_to_next", "skip_past_last_event")
    ])
    assert all(gots)


def test_cep_stream_variants_skip_restart(spark, chunk_dir, tmp_path):
    """The pending union rows and the chain bound survive a restart:
    matches decided before the stop release correctly after it."""
    from flink_note_spark.operators.cep import Pattern, match_pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _variant_soup(chunk_dir, seed=64, n=60)
    p = (
        Pattern.begin("V")
        .followed_by("C").optional()
        .followed_by("P")
        .within("45 minutes")
    )
    cols = ["user_id", "ts_1", "ts_2", "ts_3"]
    sink = tmp_path / "vskip_sink"
    ckpt = tmp_path / "vskip_ckpt"

    def run_once():
        stream = read_file_stream(
            spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
            max_files_per_trigger=1,
        )
        out = match_pattern_stream(
            stream, p, watermark="3 minutes",
            skip_strategy="skip_past_last_event",
        )

        def write_batch(batch_df, batch_id):
            if batch_df.count():
                batch_df.write.mode("append").parquet(str(sink))

        q = foreach_batch_sink(
            out, write_batch, checkpoint=str(ckpt), output_mode="update"
        ).start()
        q.processAllAvailable()
        q.stop()

    run_once()
    # a second late flusher plus fresh events arrive while DOWN
    _write_chunk(chunk_dir, "c10.parquet",
                 [(99, 998, _ts(1200), "Q", 1.0)])
    run_once()
    batch_df = spark.read.schema(EVENT_SCHEMA).parquet(str(chunk_dir))
    want = _rows_nullable(
        match_pattern(
            batch_df, p, skip_strategy="skip_past_last_event"
        ).toPandas(), cols,
    )
    got = _rows_nullable(
        spark.read.parquet(str(sink)).toPandas()[
            ["user_id", "ts_1", "ts_2", "ts_3"]
        ], cols,
    )
    assert got == want
    assert got


def test_cep_stream_variants_skip_refusals(spark, chunk_dir, tmp_path):
    from flink_note_spark.operators.cep import Pattern
    from flink_note_spark.streaming.ops import match_pattern_stream

    _write_chunk(chunk_dir, "c1.parquet", [(1, 1, _ts(0), "V", 1.0)])
    stream = read_file_stream(
        spark, "parquet", str(chunk_dir), EVENT_SCHEMA,
        max_files_per_trigger=1,
    )
    # loops inside a variant pattern under a strategy: batch-only
    # (non-greedy loop-prefix expansion)
    p_loop = (
        Pattern.begin("V").followed_by("C").one_or_more()
        .followed_by("P").optional().within("10 minutes")
    )
    with pytest.raises(ValueError, match="batch-only"):
        match_pattern_stream(
            stream, p_loop, watermark="1 minute",
            skip_strategy="skip_past_last_event",
        )
    # within required for the pending/anchor state
    p_nowin = Pattern.begin("V").next("C").optional().next("V")
    with pytest.raises(ValueError, match="within"):
        match_pattern_stream(
            stream, p_nowin, watermark="1 minute",
            skip_strategy="skip_to_next",
        )
