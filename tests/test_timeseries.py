"""Unit / property / plan tests for operators/timeseries.py (gapfill,
rollup cascade + streaming maintenance, sweep-line concurrency, LTTB,
EWMA, retention cohorts). Fixture-scale oracle parity runs in
test_oracle_parity via q144–q150."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_note_spark.functions.scalar import epoch_us
from flink_note_spark.operators.timeseries import (
    _width_s,
    gapfill,
    interval_concurrency,
    max_concurrency,
    merge_partials,
    retention_cohorts,
    rollup_finalize,
    rollup_partials,
    rollup_up,
    time_bucket_s,
)
from flink_note_spark.plans.inspect import explain_str
from flink_note_spark.session import load_table


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=_ts(t), v=float(v)) for k, t, v in rows]
    )


# ---------------------------------------------------------------------------
# width parsing / validation


def test_width_parsing():
    assert _width_s("15 minutes") == 900
    assert _width_s("1 day") == 86400
    assert _width_s("2 weeks") == 1209600
    assert _width_s(3600) == 3600
    with pytest.raises(ValueError):
        _width_s("3 fortnights")
    with pytest.raises(ValueError):
        _width_s(0)


def test_gapfill_rejects_bad_policy_and_empty_keys(spark):
    df = _mk(spark, [("a", "2024-01-01T00:00:00", 1)])
    with pytest.raises(ValueError, match="fill policy"):
        gapfill(df, ["k"], "ts", 60, {"x": F.sum("v")}, fills={"x": "bogus"})
    with pytest.raises(ValueError, match="const"):
        gapfill(df, ["k"], "ts", 60, {"x": F.sum("v")}, fills={"x": ("mean", 1)})
    with pytest.raises(ValueError, match="key column"):
        gapfill(df, [], "ts", 60, {"x": F.sum("v")})


# ---------------------------------------------------------------------------
# gapfill semantics


def test_gapfill_locf_zero_const_null(spark):
    # key 'a': buckets 0, 3 present -> gaps at 1, 2; key 'b': single bucket
    df = _mk(
        spark,
        [
            ("a", "2024-01-01T00:00:30", 10),
            ("a", "2024-01-01T00:03:10", 40),
            ("b", "2024-01-01T00:05:00", 7),
        ],
    )
    out = gapfill(
        df,
        ["k"],
        "ts",
        60,
        aggs={
            "s": F.sum("v"),
            "n": F.count(F.lit(1)),
            "c": F.max("v"),
            "z": F.min("v"),
        },
        fills={"s": "locf", "n": "zero", "c": ("const", -1.0)},
    ).orderBy("k", "bucket_s")
    rows = [r.asDict() for r in out.collect()]
    a = [r for r in rows if r["k"] == "a"]
    assert [r["bucket_s"] % 3600 for r in a] == [0, 60, 120, 180]
    assert [r["s"] for r in a] == [10.0, 10.0, 10.0, 40.0]  # locf
    assert [r["n"] for r in a] == [1, 0, 0, 1]  # zero
    assert [r["c"] for r in a] == [10.0, -1.0, -1.0, 40.0]  # const
    assert [r["z"] for r in a] == [10.0, None, None, 40.0]  # null default
    assert [r["is_gap"] for r in a] == [0, 1, 1, 0]
    b = [r for r in rows if r["k"] == "b"]
    assert len(b) == 1 and b[0]["is_gap"] == 0


def test_gapfill_linear_interpolates(spark):
    df = _mk(
        spark,
        [("a", "2024-01-01T00:00:00", 10), ("a", "2024-01-01T00:03:00", 40)],
    )
    out = (
        gapfill(df, ["k"], "ts", 60, {"av": F.avg("v")}, fills={"av": "linear"})
        .orderBy("bucket_s")
        .collect()
    )
    assert [r.av for r in out] == [10.0, 20.0, 30.0, 40.0]
    assert [r.is_gap for r in out] == [0, 1, 1, 0]


def test_gapfill_global_bounds_pads_head_and_tail(spark):
    df = _mk(spark, [("a", "2024-01-01T00:02:30", 5)])
    out = (
        gapfill(
            df,
            ["k"],
            "ts",
            60,
            {"s": F.sum("v"), "n": F.count(F.lit(1))},
            fills={"s": "locf", "n": "zero"},
            bounds=("2024-01-01 00:00:00", "2024-01-01 00:04:00"),
        )
        .orderBy("bucket_s")
        .collect()
    )
    assert len(out) == 5  # buckets 0..4
    # head pads: locf has no donor -> null; zero still applies
    assert [r.s for r in out] == [None, None, 5.0, 5.0, 5.0]
    assert [r.n for r in out] == [0, 0, 1, 0, 0]
    assert [r.is_gap for r in out] == [1, 1, 0, 1, 1]


def test_gapfill_linear_tail_pad_is_null(spark):
    df = _mk(spark, [("a", "2024-01-01T00:00:00", 10)])
    out = (
        gapfill(
            df,
            ["k"],
            "ts",
            60,
            {"av": F.avg("v")},
            fills={"av": "linear"},
            bounds=("2024-01-01 00:00:00", "2024-01-01 00:02:00"),
        )
        .orderBy("bucket_s")
        .collect()
    )
    assert [r.av for r in out] == [10.0, None, None]


def test_gapfill_long_runs_chunked_explode_exact(spark, monkeypatch):
    """ADVICE r10: long gap runs must not build one unbounded sequence()
    array per donor row. With the chunk size forced tiny, a 40-bucket
    run crossing many chunk boundaries fills identically to the
    unchunked math — linear frac, LOCF carry, bounds pads, gap flags."""
    import flink_note_spark.operators.timeseries as tsmod

    df = _mk(
        spark,
        [("a", "2024-01-01T00:00:00", 0), ("a", "2024-01-01T00:40:00", 40)],
    )
    kw = dict(
        keys=["k"], ts="ts", width=60,
        aggs={"av": F.avg("v"), "s": F.sum("v")},
        fills={"av": "linear", "s": "locf"},
        bounds=("2023-12-31 23:55:00", "2024-01-01 00:45:00"),
    )
    want = [tuple(r) for r in gapfill(df, **kw).orderBy("bucket_s").collect()]
    monkeypatch.setattr(tsmod, "_GAP_CHUNK", 7)
    got = [tuple(r) for r in gapfill(df, **kw).orderBy("bucket_s").collect()]
    assert got == want
    assert len(got) == 51  # 5 head pads + 41 run buckets + 5 tail pads
    avs = [r[2] for r in got]
    assert avs[5:46] == [float(i) for i in range(41)]  # exact linear ramp


def test_time_bucket_calendar_grains(spark):
    from flink_note_spark.operators.timeseries import time_bucket

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 15, 10),), (dt.datetime(2024, 4, 2),)],
        "ts timestamp",
    )
    out = df.select(
        time_bucket("ts", "1 month", "m"),
        time_bucket("ts", "1 quarter", "q"),
        time_bucket("ts", "1 year", "y"),
        time_bucket("ts", "1 day", "d"),  # fixed path through same API
    ).collect()
    # month starts as UTC-midnight epoch seconds
    assert [r.m for r in out] == [1704067200, 1711929600]  # Jan 1, Apr 1
    assert [r.q for r in out] == [1704067200, 1711929600]  # Q1, Q2
    assert [r.y for r in out] == [1704067200, 1704067200]
    assert out[0].d == 1705276800  # Jan 15 (fixed-width path)
    with pytest.raises(ValueError, match="positive"):
        time_bucket("ts", "0 months")
    # fixed-width-only operators refuse calendar widths loudly
    with pytest.raises(ValueError, match="CALENDAR"):
        _width_s("1 month")


def test_time_bucket_origin_alignment(spark):
    """r11: origin re-anchors bucket alignment — Monday-starting weeks
    (epoch weeks start Thursday) and February-anchored fiscal
    quarters."""
    from flink_note_spark.operators.timeseries import time_bucket

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 10),),   # a Wednesday
            (dt.datetime(2024, 1, 14),),   # the following Sunday
            (dt.datetime(2024, 1, 15),),   # the next Monday
            (dt.datetime(2024, 3, 15),),   # inside Feb-anchored Q1
        ],
        "ts timestamp",
    )
    out = df.select(
        # 2024-01-01 is a Monday; weeks anchored there start Mondays
        time_bucket("ts", "1 week", "wk", origin="2024-01-01"),
        time_bucket("ts", "1 week", "wk_epoch"),
        time_bucket("ts", "1 quarter", "fq", origin="1970-02-01"),
    ).collect()
    mon_jan8 = 1704672000    # 2024-01-08 (Monday)
    mon_jan15 = 1705276800   # 2024-01-15
    assert [r.wk for r in out[:3]] == [mon_jan8, mon_jan8, mon_jan15]
    # epoch-aligned weeks start Thursdays — different starts entirely
    thu_jan4 = 1704326400    # 2024-01-04 (Thursday)
    assert out[0].wk_epoch == thu_jan4
    # Feb-anchored quarters: Mar 2024 falls in the Feb..Apr quarter
    feb1_2024 = 1706745600
    assert out[3].fq == feb1_2024
    # int-seconds origin accepted too
    got = df.select(
        time_bucket("ts", "1 week", "w2", origin=1704067200)
    ).first()
    assert got.w2 == mon_jan8


def test_gapfill_and_rollup_origin_weeks(spark):
    """origin flows through gapfill and the rollup cascade: Monday-
    anchored weekly buckets, spine arithmetic unchanged (one bucket per
    week between first and last), and day->week folding respects the
    anchor."""
    from flink_note_spark.operators.timeseries import time_bucket

    rows = [
        ("a", "2024-01-10T12:00:00", 1),   # Wed, week of Mon Jan 8
        ("a", "2024-01-24T12:00:00", 3),   # Wed, week of Mon Jan 22
    ]
    df = _mk(spark, rows)
    out = (
        gapfill(
            df, ["k"], "ts", "1 week", {"s": F.sum("v")},
            fills={"s": "linear"}, origin="2024-01-01",
        )
        .orderBy("bucket_s")
        .collect()
    )
    mons = [1704672000, 1705276800, 1705881600]  # Jan 8, 15, 22
    assert [r.bucket_s for r in out] == mons
    assert [r.s for r in out] == [1.0, 2.0, 3.0]
    meas = {"n": ("*", "count"), "s": ("v", "sum")}
    day = rollup_partials(df, ["k"], "ts", "1 day", meas)
    wk = rollup_up(day, ["k"], "1 week", meas, origin="2024-01-01")
    direct = rollup_partials(
        df, ["k"], "ts", "1 week", meas, origin="2024-01-01"
    )
    assert {tuple(r) for r in rollup_finalize(wk, ["k"], meas).collect()} == {
        tuple(r) for r in rollup_finalize(direct, ["k"], meas).collect()
    }
    assert {r.bucket_s for r in wk.collect()} == {mons[0], mons[2]}
    # month fold honors a month origin too (Feb-anchored)
    moq = rollup_up(day, ["k"], "1 quarter", meas, origin="1970-02-01")
    assert {r.bucket_s for r in moq.collect()} == {
        spark.sql("SELECT unix_date(DATE'2023-11-01')*86400").first()[0]
    }


def test_gapfill_month_grain_linear_across_variable_widths(spark):
    """Month buckets have different second-widths; the spine runs on
    month INDICES so a Jan->Apr gap is exactly 2 steps and the linear
    ramp is uniform per month, not per second."""
    df = _mk(
        spark,
        [("a", "2024-01-15T00:00:00", 1), ("a", "2024-04-10T00:00:00", 4)],
    )
    out = (
        gapfill(
            df, ["k"], "ts", "1 month", {"av": F.avg("v")},
            fills={"av": "linear"},
            bounds=("2023-11-20 00:00:00", "2024-05-02 00:00:00"),
        )
        .orderBy("bucket_s")
        .collect()
    )
    # Nov, Dec pads; Jan..Apr run; May pad
    assert [r.av for r in out] == [None, None, 1.0, 2.0, 3.0, 4.0, None]
    assert [r.is_gap for r in out] == [1, 1, 0, 1, 1, 0, 1]
    starts = [r.bucket_s for r in out]
    # consecutive diffs are true month widths (Nov 30d, Dec 31d, Jan
    # 31d, Feb 29d in 2024, Mar 31d, Apr 30d)
    diffs = [b - a for a, b in zip(starts, starts[1:])]
    assert diffs == [d * 86400 for d in (30, 31, 31, 29, 31, 30)]


def test_rollup_calendar_cascade_equals_direct(spark):
    """day partials -> month fold == direct month partials, and month
    -> quarter folds again (calendar-over-calendar cascade)."""
    from flink_note_spark.operators.timeseries import time_bucket

    rows = [
        ("a", f"2024-0{m}-{d:02d}T06:00:00", float(m * 10 + d))
        for m in (1, 2, 3, 4, 5) for d in (1, 14, 28)
    ]
    df = _mk(spark, rows)
    meas = {"n": ("*", "count"), "s": ("v", "sum"), "mx": ("v", "max")}
    day = rollup_partials(df, ["k"], "ts", "1 day", meas)
    month = rollup_up(day, ["k"], "1 month", meas)
    direct = rollup_partials(df, ["k"], "ts", "1 month", meas)
    got = {tuple(r) for r in rollup_finalize(month, ["k"], meas).collect()}
    want = {tuple(r) for r in rollup_finalize(direct, ["k"], meas).collect()}
    assert got == want and len(got) == 5
    quarter = rollup_up(month, ["k"], "1 quarter", meas)
    direct_q = rollup_partials(df, ["k"], "ts", "1 quarter", meas)
    got_q = {tuple(r) for r in rollup_finalize(quarter, ["k"], meas).collect()}
    want_q = {
        tuple(r) for r in rollup_finalize(direct_q, ["k"], meas).collect()
    }
    assert got_q == want_q and len(got_q) == 2


def test_gapfill_no_gap_flag_and_no_join_in_plan(spark):
    df = _mk(spark, [("a", "2024-01-01T00:00:00", 1)])
    out = gapfill(df, ["k"], "ts", 60, {"s": F.sum("v")}, gap_flag=None)
    assert "is_gap" not in out.columns
    plan = explain_str(out, "simple")
    assert "Join" not in plan  # explode-from-lead, never a spine join


# ---------------------------------------------------------------------------
# rollup cascade


_MEASURES = {
    "n": ("*", "count"),
    "s": ("v", "sum"),
    "mn": ("v", "min"),
    "mx": ("v", "max"),
    "av": ("v", "avg"),
    "fv": ("v", "first"),
    "lv": ("v", "last"),
    "du": ("u", "approx_distinct"),
}


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").alias("v"),
        F.col("user_id").alias("u"),
    )


def test_rollup_cascade_equals_direct(spark, sf_dir):
    e = _events(spark, sf_dir)
    keys = ["event_type"]
    fine = rollup_partials(e, keys, "ts", "15 minutes", _MEASURES, tiebreak="event_id")
    daily_cascade = rollup_finalize(
        rollup_up(rollup_up(fine, keys, "1 hour", _MEASURES), keys, "1 day", _MEASURES),
        keys,
        _MEASURES,
    )
    daily_direct = rollup_finalize(
        rollup_partials(e, keys, "ts", "1 day", _MEASURES, tiebreak="event_id"),
        keys,
        _MEASURES,
    )
    a = {tuple(r[k] for k in keys + ["bucket_s"]): r for r in daily_cascade.collect()}
    b = {tuple(r[k] for k in keys + ["bucket_s"]): r for r in daily_direct.collect()}
    assert set(a) == set(b) and len(a) > 0
    for key, ra in a.items():
        rb = b[key]
        # exact algebra fields
        assert (ra.n, ra.mn, ra.mx, ra.fv, ra.lv) == (rb.n, rb.mn, rb.mx, rb.fv, rb.lv)
        # HLL union-of-sketches == sketch-of-union (register-wise max)
        assert ra.du == rb.du
        # float fields: addition order differs, values must agree tightly
        assert ra.s == pytest.approx(rb.s, rel=1e-9)
        assert ra.av == pytest.approx(rb.av, rel=1e-9)


def test_rollup_hll_estimate_close_to_exact(spark, sf_dir):
    e = _events(spark, sf_dir)
    m = {"du": ("u", "approx_distinct")}
    day = rollup_finalize(
        rollup_partials(e, ["event_type"], "ts", "1 day", m), ["event_type"], m
    )
    exact = e.groupBy(
        "event_type", time_bucket_s("ts", "1 day", "bucket_s")
    ).agg(F.count_distinct("u").alias("x"))
    j = {(r.event_type, r.bucket_s): r.du for r in day.collect()}
    for r in exact.collect():
        est = j[(r.event_type, r.bucket_s)]
        assert est == pytest.approx(r.x, rel=0.05, abs=2)


def test_merge_partials_is_incremental_accretion(spark, sf_dir):
    e = _events(spark, sf_dir)
    keys = ["event_type"]
    cut = e.agg(F.percentile_approx(epoch_us("ts"), 0.5)).first()[0]
    old = e.filter(epoch_us("ts") <= cut)
    inc = e.filter(epoch_us("ts") > cut)
    merged = merge_partials(
        rollup_partials(old, keys, "ts", "1 hour", _MEASURES, tiebreak="event_id"),
        rollup_partials(inc, keys, "ts", "1 hour", _MEASURES, tiebreak="event_id"),
        keys,
        _MEASURES,
    )
    full = rollup_partials(e, keys, "ts", "1 hour", _MEASURES, tiebreak="event_id")
    a = {(r.event_type, r.bucket_s): r for r in rollup_finalize(merged, keys, _MEASURES).collect()}
    b = {(r.event_type, r.bucket_s): r for r in rollup_finalize(full, keys, _MEASURES).collect()}
    assert set(a) == set(b)
    for key, ra in a.items():
        rb = b[key]
        assert (ra.n, ra.mn, ra.mx, ra.fv, ra.lv, ra.du) == (
            rb.n, rb.mn, rb.mx, rb.fv, rb.lv, rb.du,
        )
        assert ra.s == pytest.approx(rb.s, rel=1e-9)


def test_rollup_from_saved_partials_never_rescans_raw(spark, sf_dir, tmp_path):
    """The continuous-aggregate contract: coarser levels fold PARTIALS —
    a cascade built from a persisted partial table has no raw-event scan
    anywhere in its plan."""
    e = _events(spark, sf_dir)
    path = str(tmp_path / "fine_partials")
    rollup_partials(e, ["event_type"], "ts", "1 hour", _MEASURES).write.parquet(path)
    daily = rollup_up(spark.read.parquet(path), ["event_type"], "1 day", _MEASURES)
    plan = explain_str(rollup_finalize(daily, ["event_type"], _MEASURES), "formatted")
    assert "events.parquet" not in plan
    assert "fine_partials" in plan


def test_rollup_rejects_unknown_kind():
    with pytest.raises(ValueError, match="kind"):
        rollup_partials(None, ["k"], "ts", 60, {"x": ("v", "median")})


# ---------------------------------------------------------------------------
# streaming continuous-aggregate maintenance


def test_rollup_stream_equals_batch(spark, sf_dir, tmp_path):
    """Stream events in 3 micro-batches into an epoch log; the merged
    log must equal batch partials over the full data — late/out-of-order
    arrival needs no watermark because partials are re-aggregatable."""
    from flink_note_spark.operators.timeseries import (
        rollup_compact,
        rollup_read,
        rollup_stream_start,
    )

    e = _events(spark, sf_dir).orderBy("event_id")
    src = tmp_path / "src"
    src.mkdir()
    n = e.count()
    pdf = e.toPandas()
    # chunk 3 ways NOT in time order (chunk 2 carries the oldest rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # match TIMESTAMP_NTZ(us)
    chunks = [pdf.iloc[: n // 3], pdf.iloc[2 * n // 3 :], pdf.iloc[n // 3 : 2 * n // 3]]
    for i, c in enumerate(chunks):
        c.to_parquet(src / f"chunk_{i}.parquet", index=False)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    log = str(tmp_path / "agg_log")
    q = rollup_stream_start(
        stream,
        log,
        ["event_type"],
        "ts",
        "1 hour",
        _MEASURES,
        tiebreak="event_id",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import glob

    assert len(glob.glob(f"{log}/epoch=*")) >= 3  # one epoch per chunk
    streamed = rollup_finalize(
        rollup_read(spark, log, ["event_type"], _MEASURES), ["event_type"], _MEASURES
    )
    direct = rollup_finalize(
        rollup_partials(e, ["event_type"], "ts", "1 hour", _MEASURES, tiebreak="event_id"),
        ["event_type"],
        _MEASURES,
    )
    a = {(r.event_type, r.bucket_s): r for r in streamed.collect()}
    b = {(r.event_type, r.bucket_s): r for r in direct.collect()}
    assert set(a) == set(b) and len(a) > 0
    for key, ra in a.items():
        rb = b[key]
        assert (ra.n, ra.mn, ra.mx, ra.fv, ra.lv, ra.du) == (
            rb.n, rb.mn, rb.mx, rb.fv, rb.lv, rb.du,
        )
        assert ra.s == pytest.approx(rb.s, rel=1e-9)

    # compact folds the log into a single valid epoch with equal content
    compacted = str(tmp_path / "agg_compacted")
    rollup_compact(spark, log, compacted, ["event_type"], _MEASURES)
    c = {
        (r.event_type, r.bucket_s): r
        for r in rollup_finalize(
            rollup_read(spark, compacted, ["event_type"], _MEASURES),
            ["event_type"],
            _MEASURES,
        ).collect()
    }
    assert set(c) == set(b)
    for key, rc in c.items():
        assert rc.n == b[key].n and rc.du == b[key].du


def test_rollup_stream_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """A replayed epoch overwrites its own directory — the exactly-once
    contract needs no transaction log."""
    from flink_note_spark.operators.timeseries import rollup_read

    e = _events(spark, sf_dir)
    part = rollup_partials(e, ["event_type"], "ts", "1 day", _MEASURES)
    log = str(tmp_path / "log")
    part.write.mode("overwrite").parquet(f"{log}/epoch=0")
    once = {
        (r.event_type, r.bucket_s): r["n__cnt"]
        for r in rollup_read(spark, log, ["event_type"], _MEASURES).collect()
    }
    part.write.mode("overwrite").parquet(f"{log}/epoch=0")  # replay
    twice = {
        (r.event_type, r.bucket_s): r["n__cnt"]
        for r in rollup_read(spark, log, ["event_type"], _MEASURES).collect()
    }
    assert once == twice


# ---------------------------------------------------------------------------
# sweep-line concurrency


def test_interval_concurrency_crafted(spark):
    # intervals on one key: [0,10) [5,15) [20,30) -> peak 2 at t=5
    rows = [(0, 10), (5, 15), (20, 30)]
    df = spark.createDataFrame(
        [Row(k="a", s=s * 1_000_000, e=e * 1_000_000, i=i) for i, (s, e) in enumerate(rows)]
    )
    out = max_concurrency(df, ["k"], F.col("s"), F.col("e"), tiebreak="i").collect()
    assert len(out) == 1
    assert out[0].max_concurrent == 2
    assert out[0].peak_at_us == 5_000_000


def test_interval_concurrency_half_open_touching_endpoints(spark):
    # [0,10) then [10,20): the end frees the slot before the start claims
    df = spark.createDataFrame(
        [Row(k="a", s=0, e=10, i=0), Row(k="a", s=10, e=20, i=1)]
    )
    out = max_concurrency(df, ["k"], F.col("s"), F.col("e"), tiebreak="i").collect()
    assert out[0].max_concurrent == 1


def test_bucketed_prefix_sum_equals_naive(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    start = epoch_us("ts")
    end = epoch_us("ts") + F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long")
    naive = interval_concurrency(e, ["event_type"], start, end, tiebreak="event_id")
    for nb in (1, 3, 8):
        bucketed = interval_concurrency(
            e, ["event_type"], start, end, tiebreak="event_id", time_buckets=nb
        )
        a = sorted(
            (r.event_type, r.t_us, r.delta, r.running) for r in naive.collect()
        )
        b = sorted(
            (r.event_type, r.t_us, r.delta, r.running) for r in bucketed.collect()
        )
        assert a == b, f"time_buckets={nb}"


def test_interval_concurrency_validation(spark):
    df = spark.createDataFrame([Row(k="a", s=0, e=1)])
    with pytest.raises(ValueError, match="tiebreak"):
        interval_concurrency(df, ["k"], F.col("s"), F.col("e"), tiebreak="nope")
    with pytest.raises(ValueError, match="time_buckets"):
        interval_concurrency(df, ["k"], F.col("s"), F.col("e"), time_buckets=0)


# ---------------------------------------------------------------------------
# LTTB downsampling


def test_lttb_endpoints_and_interior_pick(spark):
    from flink_note_spark.operators.timeseries import lttb_downsample

    # three 1-min buckets; interior bucket has a flat point and a spike —
    # the spike subtends the larger triangle vs neighbour centroids
    rows = [
        ("a", "2024-01-01T00:00:10", 10.0, 1),
        ("a", "2024-01-01T00:00:50", 12.0, 2),   # bucket 0: first point wins
        ("a", "2024-01-01T00:01:10", 11.0, 3),
        ("a", "2024-01-01T00:01:30", 90.0, 4),   # spike — must be picked
        ("a", "2024-01-01T00:01:50", 11.0, 5),
        ("a", "2024-01-01T00:02:10", 12.0, 6),
        ("a", "2024-01-01T00:02:40", 13.0, 7),   # bucket 2: last point wins
    ]
    df = spark.createDataFrame(
        [Row(k=k, ts=_ts(t), v=v, i=i) for k, t, v, i in rows]
    )
    out = (
        lttb_downsample(df, ["k"], "ts", "v", 60, tiebreak="i")
        .orderBy("bucket_s")
        .collect()
    )
    assert [r.i for r in out] == [1, 4, 7]
    assert {c for c in out[0].asDict()} == {"k", "ts", "v", "i", "bucket_s"}


def test_lttb_single_bucket_key_keeps_earliest(spark):
    from flink_note_spark.operators.timeseries import lttb_downsample

    df = _mk(
        spark,
        [("a", "2024-01-01T00:00:10", 5), ("a", "2024-01-01T00:00:40", 9)],
    )
    out = lttb_downsample(df, ["k"], "ts", "v", 60).collect()
    assert len(out) == 1 and out[0].v == 5.0


def test_lttb_one_row_per_key_bucket(spark, sf_dir):
    from flink_note_spark.operators.timeseries import lttb_downsample

    e = load_table(spark, sf_dir, "events")
    out = lttb_downsample(
        e, ["event_type"], "ts", "value", "1 day", tiebreak="event_id"
    )
    per = out.groupBy("event_type", "bucket_s").count()
    assert per.filter(F.col("count") != 1).count() == 0
    buckets = e.select(
        "event_type", time_bucket_s("ts", "1 day", "bucket_s")
    ).distinct()
    assert out.count() == buckets.count()


# ---------------------------------------------------------------------------
# retention cohorts


def test_retention_cohorts_crafted(spark):
    # users 1,2 start week 0 (1 retained in week 1); user 3 starts week 1
    w = 604800
    rows = [
        (1, 0), (2, 0),      # cohort 0, period 0
        (1, w), (3, w),      # user1 retained; user3 new cohort
        (3, 2 * w),
    ]
    df = spark.createDataFrame(
        [Row(user_id=u, ts=dt.datetime(1970, 1, 1) + dt.timedelta(seconds=s)) for u, s in rows]
    )
    out = {
        (r.cohort_s, r.period_index): r
        for r in retention_cohorts(df, "user_id", "ts", "1 week").collect()
    }
    assert out[(0, 0)].active_users == 2 and out[(0, 0)].retention == 1.0
    assert out[(0, 1)].active_users == 1 and out[(0, 1)].retention == 0.5
    assert out[(w, 0)].cohort_size == 1
    assert out[(w, 1)].active_users == 1
    assert (0, 2) not in out  # user1 inactive in week 2


def test_retention_period_zero_is_always_full(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    out = retention_cohorts(e, "user_id", "ts", "1 week")
    p0 = out.filter(F.col("period_index") == 0).collect()
    assert len(p0) > 0
    for r in p0:
        assert r.active_users == r.cohort_size and r.retention == 1.0


# ---------------------------------------------------------------------------
# EWMA


def test_ewma_crafted_recurrence(spark):
    from flink_note_spark.operators.timeseries import ewma

    df = _mk(
        spark,
        [
            ("a", "2024-01-01T00:00:00", 10),
            ("a", "2024-01-01T00:01:00", 20),
            ("a", "2024-01-01T00:02:00", 30),
            ("b", "2024-01-01T00:00:00", 5),
        ],
    )
    out = {
        (r.k, r.ts.isoformat()): r.ewma
        for r in ewma(df, ["k"], "ts", "v", alpha=0.5).collect()
    }
    assert out[("a", "2024-01-01T00:00:00")] == 10.0
    assert out[("a", "2024-01-01T00:01:00")] == 15.0   # 0.5*10 + 0.5*20
    assert out[("a", "2024-01-01T00:02:00")] == 22.5
    assert out[("b", "2024-01-01T00:00:00")] == 5.0    # fresh key


def test_ewma_alpha_one_is_identity_and_validation(spark, sf_dir):
    from flink_note_spark.operators.timeseries import ewma

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    out = ewma(e, ["event_type"], "ts", "value", alpha=1.0, tiebreak="event_id")
    assert out.filter(F.col("ewma") != F.col("value")).count() == 0
    with pytest.raises(ValueError, match="alpha"):
        ewma(e, ["event_type"], "ts", "value", alpha=0.0)
    with pytest.raises(ValueError, match="tiebreak"):
        ewma(e, ["event_type"], "ts", "value", alpha=0.5, tiebreak="nope")


def test_bucketed_concurrency_empty_input(spark):
    df = spark.createDataFrame([], "k string, s long, e long, i long")
    out = max_concurrency(
        df, ["k"], F.col("s"), F.col("e"), tiebreak="i", time_buckets=4
    )
    assert out.count() == 0


def test_gapfill_refuses_unknown_fill_keys(spark):
    df = _mk(spark, [("a", "2024-01-01T00:00:00", 1)])
    with pytest.raises(ValueError, match="not in aggs"):
        gapfill(
            df, ["k"], "ts", 60, {"s": F.sum("v")}, fills={"sum_val": "locf"}
        )


def test_rollup_up_floors_negative_buckets(spark):
    """Pre-epoch fine buckets must FLOOR to their coarse bucket (a
    truncating cast would send bucket −1800 to hour 0 instead of
    −3600)."""
    m = {"n": ("*", "count")}
    fine = spark.createDataFrame(
        [("a", -1800, 2), ("a", -3600, 1), ("a", 1800, 3)],
        "k string, bucket_s long, n__cnt long",
    )
    out = {r.bucket_s: r["n__cnt"] for r in rollup_up(fine, ["k"], 3600, m).collect()}
    assert out == {-3600: 3, 0: 3}


def test_carry_forward_fills_nulls_from_last_non_null(spark):
    from flink_note_spark.operators.timeseries import carry_forward

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, None), ("a", 4, 7.0),
         ("b", 1, None), ("b", 2, 3.0)],
        "k string, o long, v double",
    )
    out = {
        (r.k, r.o): r.v
        for r in carry_forward(df, ["k"], "o", ["v"]).collect()
    }
    assert out[("a", 2)] == 10.0 and out[("a", 3)] == 10.0
    assert out[("a", 4)] == 7.0
    assert out[("b", 1)] is None  # nothing to carry
    with pytest.raises(ValueError, match="not in frame"):
        carry_forward(df, ["k"], "o", ["nope"])
