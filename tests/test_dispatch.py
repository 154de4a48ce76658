"""streaming/dispatch.py — the unified pattern_stream_start /
recognize_stream_start entry points: native fast path when the
incremental engines support the shape, automatic routing through the
epoch-log replay engine when only batch does, loud refusal only when
batch refuses too (VERDICT r10 #1)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_note_spark.operators.cep import match_pattern
from flink_note_spark.operators.match_recognize import match_recognize
from flink_note_spark.streaming.dispatch import (
    pattern_stream_start,
    recognize_stream_start,
)
from flink_note_spark.streaming.replay import replay_emissions

_SCHEMA = "user_id long, ts timestamp, event_type string"
_PAY_SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def _null_safe(t):
    return tuple((v is None, 0 if v is None else v) for v in t)


def _write_chunks(spark, tmp_path, schema, chunk_rows):
    src = tmp_path / "src"
    src.mkdir()
    for i, c in enumerate(chunk_rows):
        pdf = spark.createDataFrame(c, schema).toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(str(src / f"c{i}.parquet"), index=False)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def _drive(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _rows_of(df):
    return sorted((tuple(r) for r in df.collect()), key=_null_safe)


def _run_pattern(spark, tmp_path, schema, rows, chunks, pattern, **kw):
    stream = _write_chunks(spark, tmp_path, schema, chunks)
    log = str(tmp_path / "log")
    q = pattern_stream_start(
        stream, pattern, log_path=log, watermark="1 minute",
        checkpoint=str(tmp_path / "ckpt"), **kw,
    )
    _drive(q)
    got = replay_emissions(spark, log)
    want = match_pattern(spark.createDataFrame(rows, schema), pattern, **kw)
    return q.routed, got, want


def _run_mr(spark, tmp_path, schema, rows, chunks, engine="auto", **kw):
    stream = _write_chunks(spark, tmp_path, schema, chunks)
    log = str(tmp_path / "log")
    q = recognize_stream_start(
        stream, log_path=log, watermark="1 minute",
        checkpoint=str(tmp_path / "ckpt"), engine=engine, **kw,
    )
    _drive(q)
    got = replay_emissions(spark, log)
    want = match_recognize(spark.createDataFrame(rows, schema), **kw)
    return q.routed, got, want


# ---------------------------------------------------------------------------
# CEP dispatch


_FLUSH = (9, _t(24 * 60), "Z")


def test_routed_native_fast_path_schema_normalized(spark, tmp_path):
    """A plain strict pattern streams natively; the dispatcher's output
    schema and VALUES equal the batch operator's (epoch-µs longs are
    normalized back to timestamps)."""
    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "C"),
        (2, _t(0), "A"), (2, _t(1), "C"),
        _FLUSH,
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _SCHEMA, rows, [rows[:3], rows[3:5], rows[5:]],
        ["A", "B", "C"], contiguity="strict", within="10 minutes",
    )
    assert routed == "native"
    assert got.schema == want.schema
    assert _rows_of(got) == _rows_of(want) and got.count() > 0


def test_routed_terminal_strict_loop(spark, tmp_path):
    """Strict A B+ — the pinned native refusal — routes to replay and
    equals batch."""
    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "B"),
        (2, _t(0), "A"),
        _FLUSH,
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _SCHEMA, rows, [rows[:3], rows[3:4], rows[4:]],
        ["A", {"type": "B", "one_or_more": True}],
        contiguity="strict", within="10 minutes",
    )
    assert routed == "replay"
    assert _rows_of(got) == _rows_of(want) and got.count() > 0


def test_routed_mixed_variants(spark, tmp_path):
    """Mixed contiguity + optional() is batch-only on the native mixed
    engine — routes to replay."""
    pat = [
        {"type": "A"},
        {"type": "B", "optional": True, "mode": "relaxed"},
        {"type": "C", "mode": "strict"},  # strict tail => mixed pattern
    ]
    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "C"),
        (2, _t(0), "A"), (2, _t(1), "C"),
        _FLUSH,
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _SCHEMA, rows,
        [rows[0:2] + rows[3:5], rows[2:3], rows[5:]],
        pat, within="10 minutes",
    )
    assert routed == "replay"
    assert _rows_of(got) == _rows_of(want) and got.count() > 0


def test_routed_iterative_condition_with_skip(spark, tmp_path):
    """Iterative (cross-step) conditions with a skip strategy are
    batch-only on the native engines — routes to replay."""
    pat = [
        {"type": "A"},
        {"type": "B", "where": "value > s1.value"},
    ]
    rows = [
        (1, _t(0), "A", 1.0), (1, _t(1), "B", 5.0),
        (1, _t(2), "A", 2.0), (1, _t(3), "B", 9.0),
        (2, _t(0), "A", 7.0), (2, _t(1), "B", 3.0),
        (9, _t(24 * 60), "Z", 0.0),
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _PAY_SCHEMA, rows, [rows[:4], rows[4:6], rows[6:]],
        pat, contiguity="relaxed", within="10 minutes",
        skip_strategy="skip_past_last_event",
    )
    assert routed == "replay"
    assert _rows_of(got) == _rows_of(want) and got.count() > 0


def test_routed_nonsubset_iterative_predicate(spark, tmp_path):
    """A where() outside the streaming SQL↔Python subset (sqrt) streams
    via replay — batch evaluates full Spark SQL."""
    pat = [
        {"type": "A"},
        {"type": "B", "where": "value > sqrt(s1.value)"},
    ]
    rows = [
        (1, _t(0), "A", 16.0), (1, _t(1), "B", 5.0),
        (2, _t(0), "A", 16.0), (2, _t(1), "B", 3.0),
        (9, _t(24 * 60), "Z", 0.0),
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _PAY_SCHEMA, rows, [rows[:2], rows[2:4], rows[4:]],
        pat, contiguity="relaxed", within="10 minutes",
    )
    assert routed == "replay"
    assert _rows_of(got) == _rows_of(want)
    assert [r[0] for r in _rows_of(got)] == [1]  # 5 > 4, 3 < 4


def test_routed_carry_payload_relaxed(spark, tmp_path):
    """carry_payload outside strict patterns is batch-only — routes to
    replay; payload columns come back with batch values and are NOT
    mistaken for finality timestamps."""
    rows = [
        (1, _t(0), "A", 1.5), (1, _t(3), "B", 2.5),
        (2, _t(0), "A", 7.0),
        (9, _t(24 * 60), "Z", 0.0),
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _PAY_SCHEMA, rows, [rows[:2], rows[2:3], rows[3:]],
        ["A", "B"], contiguity="relaxed", within="10 minutes",
        carry_payload={"ts_2": ["value"]},
    )
    assert routed == "replay"
    assert "ts_2_value" in got.columns
    assert _rows_of(got) == _rows_of(want) and got.count() == 1


def test_routed_genuinely_unsupported_still_raises(spark, tmp_path):
    """A shape BATCH refuses too (iterative conditions + optional())
    must not route — the native refusal surfaces."""
    pat = [
        {"type": "A"},
        {"type": "B", "optional": True, "where": "value > s1.value"},
        {"type": "C"},
    ]
    (tmp_path / "s").mkdir()
    stream = spark.readStream.schema(_PAY_SCHEMA).parquet(str(tmp_path / "s"))
    with pytest.raises(ValueError, match="iterative|optional"):
        pattern_stream_start(
            stream, pat, log_path=str(tmp_path / "l"),
            within="10 minutes", contiguity="relaxed",
            checkpoint=str(tmp_path / "ckpt"),
        )


def test_dispatch_validates_engine_and_checkpoint(spark, tmp_path):
    (tmp_path / "s").mkdir()
    stream = spark.readStream.schema(_SCHEMA).parquet(str(tmp_path / "s"))
    with pytest.raises(ValueError, match="engine"):
        pattern_stream_start(
            stream, ["A", "B"], log_path=str(tmp_path / "l"),
            checkpoint=str(tmp_path / "c"), engine="bogus",
        )
    with pytest.raises(ValueError, match="checkpoint"):
        pattern_stream_start(stream, ["A", "B"], log_path=str(tmp_path / "l"))
    with pytest.raises(ValueError, match="checkpoint"):
        recognize_stream_start(
            stream, log_path=str(tmp_path / "l"), partition_by="user_id",
            order_by="ts", pattern="A B",
        )


def test_group_exact_native_fast_path(spark, tmp_path):
    """EXACT-count groups flatten, so they stream NATIVELY through the
    dispatcher — no replay latency — and equal batch."""
    g = [{
        "group": [{"type": "A"}, {"type": "B", "mode": "strict"}],
        "times": 2, "mode": "strict",
    }]
    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "A"), (1, _t(3), "B"),
        (2, _t(0), "A"), (2, _t(1), "B"),
        _FLUSH,
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _SCHEMA, rows,
        [rows[:2] + rows[4:6], rows[2:4], rows[6:]],
        g, contiguity="strict", within="10 minutes",
    )
    assert routed == "native"
    assert got.schema == want.schema
    assert _rows_of(got) == _rows_of(want) and got.count() == 1


def test_routed_group_pattern(spark, tmp_path):
    """Flink GROUP patterns (r11) never reach the native engines —
    the dispatcher routes them through replay; ranged groups emit the
    union-over-counts with trailing NULLs, equal to batch."""
    g = [{
        "group": [{"type": "A"}, {"type": "B", "mode": "strict"}],
        "times": 1, "times_max": 2, "mode": "strict",
    }]
    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "A"), (1, _t(3), "B"),
        (2, _t(0), "A"), (2, _t(1), "B"),
        _FLUSH,
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _SCHEMA, rows,
        [rows[:2] + rows[4:6], rows[2:4], rows[6:]],
        g, contiguity="strict", within="10 minutes",
    )
    assert routed == "replay"
    assert _rows_of(got) == _rows_of(want) and got.count() > 0
    assert any(r[3] is None for r in _rows_of(got))  # 1-copy rows


def test_routed_timeouts_where_condition(spark, tmp_path):
    """Timeout extraction with a where() condition is batch-only on the
    native engine (per-type slot projection) — routes to replay; a
    timeout verdict is horizon-local, final at the anchor's horizon."""
    from flink_note_spark.operators.cep import match_pattern_timeouts
    from flink_note_spark.streaming.dispatch import timeouts_stream_start

    pat = ["A", {"type": "B", "where": "value > 5"}]
    rows = [
        # key 1: A then only low-value Bs -> times out at step 2
        (1, _t(0), "A", 0.0), (1, _t(1), "B", 2.0),
        # key 2: A then a qualifying B -> completes, NO timeout
        (2, _t(0), "A", 0.0), (2, _t(1), "B", 9.0),
        (9, _t(24 * 60), "Z", 0.0),
    ]
    kw = dict(contiguity="relaxed", within="10 minutes")
    stream = _write_chunks(
        spark, tmp_path, _PAY_SCHEMA, [rows[:2], rows[2:4], rows[4:]]
    )
    log = str(tmp_path / "log")
    q = timeouts_stream_start(
        stream, pat, log_path=log, watermark="1 minute",
        checkpoint=str(tmp_path / "ckpt"), **kw,
    )
    _drive(q)
    assert q.routed == "replay"
    got = replay_emissions(spark, log)
    want = match_pattern_timeouts(
        spark.createDataFrame(rows, _PAY_SCHEMA), pat, **kw
    )
    assert _rows_of(got) == _rows_of(want)
    assert [r[0] for r in _rows_of(got)] == [1]  # only key 1 timed out


def test_timeouts_native_fast_path(spark, tmp_path):
    """Plain chains stay native; output normalized to the batch schema
    (timestamps, not µs longs)."""
    from flink_note_spark.operators.cep import match_pattern_timeouts
    from flink_note_spark.streaming.dispatch import timeouts_stream_start

    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"),   # completes
        (2, _t(0), "A"),                     # times out
        _FLUSH,
    ]
    stream = _write_chunks(
        spark, tmp_path, _SCHEMA, [rows[:2], rows[2:3], rows[3:]]
    )
    log = str(tmp_path / "log")
    q = timeouts_stream_start(
        stream, ["A", "B"], log_path=log, contiguity="relaxed",
        within="10 minutes", watermark="1 minute",
        checkpoint=str(tmp_path / "ckpt"),
    )
    _drive(q)
    assert q.routed == "native"
    got = replay_emissions(spark, log)
    want = match_pattern_timeouts(
        spark.createDataFrame(rows, _SCHEMA), ["A", "B"],
        contiguity="relaxed", within="10 minutes",
    )
    # nullability loosens through the parquet epoch sink — names+types
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in want.schema.fields
    ]
    assert _rows_of(got) == _rows_of(want)
    assert [r[0] for r in _rows_of(got)] == [2]


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE dispatch


_MR_SCHEMA = "user_id long, ts timestamp, event_type string, label string"

_MR_ROWS = [
    (1, _t(0), "view", "home"), (1, _t(1), "click", "promo"),
    (1, _t(2), "purchase", "sku1"),
    (1, _t(20), "view", "search"), (1, _t(21), "click", "ad"),
    (1, _t(22), "purchase", "sku2"),
    (2, _t(0), "view", "home"), (2, _t(1), "click", "banner"),
    (2, _t(2), "purchase", "sku3"),
    (9, _t(24 * 60), "flush", "z"),
]

_MR_DEFINE = {
    "V": "event_type = 'view'",
    "C": "event_type = 'click'",
    "P": "event_type = 'purchase'",
}


def _mr_chunks():
    return [_MR_ROWS[0:3] + _MR_ROWS[6:9], _MR_ROWS[3:6], _MR_ROWS[9:]]


def test_routed_mr_native_fast_path(spark, tmp_path):
    """Numeric/ts measures on an unquantified pattern stream natively;
    the dispatcher output matches the batch operator's schema (ts
    measures as timestamps, not µs longs) and values."""
    kw = dict(
        partition_by="user_id", order_by="ts", pattern="V C P",
        define=_MR_DEFINE,
        measures={"start_ts": "V.ts", "end_ts": "P.ts"},
        after_match="skip to next row", within="10 minutes",
    )
    routed, got, want = _run_mr(
        spark, tmp_path, _MR_SCHEMA, _MR_ROWS, _mr_chunks(), **kw
    )
    assert routed == "native"
    assert got.schema == want.schema
    assert _rows_of(got) == _rows_of(want) and got.count() == 3


def test_routed_mr_string_payload_default_skip(spark, tmp_path):
    """STRING payload measures refuse natively; the DEFAULT AFTER MATCH
    (skip past last row) is a pruning chain — the router lands on the
    chained replay path and equals batch, internal finality measures
    dropped from the output."""
    kw = dict(
        partition_by="user_id", order_by="ts", pattern="V C P",
        define=_MR_DEFINE,
        measures={"sku": "P.label", "page": "V.label", "end_ts": "P.ts"},
        within="10 minutes",
    )
    routed, got, want = _run_mr(
        spark, tmp_path, _MR_SCHEMA, _MR_ROWS, _mr_chunks(), **kw
    )
    assert routed == "replay"
    assert got.schema == want.schema  # __rts_* internals dropped
    assert _rows_of(got) == _rows_of(want) and got.count() == 3
    assert {r.sku for r in got.collect()} == {"sku1", "sku2", "sku3"}


def test_routed_mr_all_rows_per_match(spark, tmp_path):
    """ALL ROWS PER MATCH refuses natively (Flink's own streaming
    restriction) — replay streams it, full row geometry."""
    kw = dict(
        partition_by="user_id", order_by="ts", pattern="V C P",
        define=_MR_DEFINE,
        measures={"sku": "P.label"},
        after_match="skip to next row", within="10 minutes",
        rows_per_match="all rows per match",
    )
    routed, got, want = _run_mr(
        spark, tmp_path, _MR_SCHEMA, _MR_ROWS, _mr_chunks(), **kw
    )
    assert routed == "replay"
    assert got.schema == want.schema
    assert _rows_of(got) == _rows_of(want) and got.count() == 9  # 3 rows/match


def test_mr_next_navigation_refuses_everywhere(spark, tmp_path):
    """NEXT() in a DEFINE is genuinely not streamable — the physical
    successor has no event-time bound, so neither the native engine nor
    the replay engine can decide it (the match's events can age out of
    the slice before the successor arrives). The dispatcher surfaces
    the replay router's argued refusal rather than silently diverging
    from batch."""
    (tmp_path / "s").mkdir()
    stream = spark.readStream.schema(_MR_SCHEMA).parquet(str(tmp_path / "s"))
    with pytest.raises(ValueError, match="NEXT.*horizon-local|horizon-local"):
        recognize_stream_start(
            stream, log_path=str(tmp_path / "l"),
            checkpoint=str(tmp_path / "c"),
            partition_by="user_id", order_by="ts", pattern="V C",
            define={
                "V": "event_type = 'view'",
                "C": "event_type = 'click' AND NEXT(C.label, 1) LIKE 'sku%'",
            },
            measures={"click_ts": "C.ts"},
            after_match="skip to next row", within="10 minutes",
        )


def test_routed_mr_terminal_quantifier_open_finality(spark, tmp_path):
    """A TERMINAL quantified variable (C+) never finalizes natively —
    replay's open-terminal (anchor + within) finality streams it."""
    kw = dict(
        partition_by="user_id", order_by="ts", pattern="V C+",
        define={"V": "event_type = 'view'", "C": "event_type = 'click'"},
        measures={"n_clicks": "COUNT(C.*)", "first_ts": "V.ts"},
        after_match="skip to next row", within="10 minutes",
    )
    rows = [
        (1, _t(0), "view", "h"), (1, _t(1), "click", "a"),
        (1, _t(2), "click", "b"),
        (2, _t(0), "view", "h"),
        (9, _t(24 * 60), "flush", "z"),
    ]
    routed, got, want = _run_mr(
        spark, tmp_path, _MR_SCHEMA, rows, [rows[:3], rows[3:4], rows[4:]],
        **kw,
    )
    assert routed == "replay"
    assert _rows_of(got) == _rows_of(want) and got.count() > 0


def test_routed_mr_forced_engines(spark, tmp_path):
    """engine='replay' forces replay on a natively-supported shape and
    still equals batch; engine='native' surfaces the refusal."""
    kw = dict(
        partition_by="user_id", order_by="ts", pattern="V C P",
        define=_MR_DEFINE,
        measures={"end_ts": "P.ts"},
        after_match="skip to next row", within="10 minutes",
    )
    routed, got, want = _run_mr(
        spark, tmp_path, _MR_SCHEMA, _MR_ROWS, _mr_chunks(),
        engine="replay", **kw,
    )
    assert routed == "replay"
    assert _rows_of(got) == _rows_of(want) and got.count() == 3

    (tmp_path / "s2").mkdir()
    stream = spark.readStream.schema(_MR_SCHEMA).parquet(str(tmp_path / "s2"))
    with pytest.raises(ValueError, match="ALL ROWS"):
        recognize_stream_start(
            stream, log_path=str(tmp_path / "l2"),
            checkpoint=str(tmp_path / "c2"), engine="native",
            partition_by="user_id", order_by="ts", pattern="V C P",
            define=_MR_DEFINE, measures={"end_ts": "P.ts"},
            within="10 minutes", rows_per_match="all rows per match",
        )


def test_routed_group_loop(spark, tmp_path):
    """Group one_or_more (r12): never native, batch now supports it
    (within-bounded union, collapsed geometry), so the dispatcher
    routes it through replay and equals batch — the schema is
    epoch-stable because the collapsed geometry is independent of the
    per-epoch data bound."""
    g = [{
        "group": [{"type": "A"}, {"type": "B", "mode": "strict"}],
        "loop": True, "mode": "strict",
    }]
    rows = [
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "A"), (1, _t(3), "B"),
        (2, _t(0), "A"), (2, _t(1), "B"),
        _FLUSH,
    ]
    routed, got, want = _run_pattern(
        spark, tmp_path, _SCHEMA, rows,
        [rows[:2] + rows[4:6], rows[2:4], rows[6:]],
        g, contiguity="strict", within="10 minutes",
    )
    assert routed == "replay"
    # names+types (nullability differs: the batch union's literal n
    # columns are provably non-null; replay's normalized readback is
    # nullable — a flag, not a shape)
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in want.schema
    ]
    assert _rows_of(got) == _rows_of(want) and got.count() == 4
