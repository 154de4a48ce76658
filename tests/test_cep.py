"""CEP pattern matching (operators/cep.py): differential tests against a
naive in-Python matcher, on both synthetic edge-case frames and the
events fixture, plus DuckDB parity for the two driver-facing shapes."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flink_note_spark.operators.cep import match_pattern
from tests.conftest import assert_frames_match

T0 = datetime(2024, 1, 1)


def _mk(spark, rows):
    """rows: (key, seconds_offset, type, event_id)"""
    data = [(k, T0 + timedelta(seconds=s), t, i) for (k, s, t, i) in rows]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long"
    )


def _naive_strict(rows, pattern, within_s=None):
    """Reference matcher: sort per key by (ts, event_id), check adjacent
    windows."""
    out = []
    keys = {k for (k, _, _, _) in rows}
    k = len(pattern)
    for key in keys:
        seq = sorted(
            [(s, t, i) for (kk, s, t, i) in rows if kk == key],
            key=lambda r: (r[0], r[2]),
        )
        for j in range(len(seq) - k + 1):
            if all(seq[j + d][1] == pattern[d] for d in range(k)):
                if within_s is None or seq[j + k - 1][0] - seq[j][0] <= within_s:
                    out.append((key, *[seq[j + d][0] for d in range(k)]))
    return sorted(out)


def _naive_relaxed(rows, pattern, within_s=None):
    """Reference matcher: per start event, each step binds to the
    earliest later event of its type (strict >)."""
    out = []
    keys = {k for (k, _, _, _) in rows}
    for key in keys:
        seq = sorted([(s, t) for (kk, s, t, _) in rows if kk == key])
        for s0, t0 in seq:
            if t0 != pattern[0]:
                continue
            times = [s0]
            cur = s0
            ok = True
            for want in pattern[1:]:
                nxt = [s for (s, t) in seq if t == want and s > cur]
                if not nxt:
                    ok = False
                    break
                cur = min(nxt)
                times.append(cur)
            if ok and (within_s is None or times[-1] - times[0] <= within_s):
                out.append((key, *times))
    return sorted(out)


def _collect(df, k):
    cols = ["user_id"] + [f"ts_{i}" for i in range(1, k + 1)]
    return sorted(
        tuple(
            [r["user_id"]]
            + [(r[c] - T0).total_seconds() for c in cols[1:]]
        )
        for r in df.select(*cols).collect()
    )


EDGE_ROWS = [
    # key 1: clean A B C, plus overlapping A A B C (strict: only one ABС)
    (1, 0, "A", 1), (1, 10, "B", 2), (1, 20, "C", 3),
    (1, 30, "A", 4), (1, 40, "A", 5), (1, 50, "B", 6), (1, 60, "C", 7),
    # key 2: interleaved noise defeats strict, relaxed still matches
    (2, 0, "A", 8), (2, 5, "X", 9), (2, 10, "B", 10), (2, 15, "X", 11),
    (2, 20, "C", 12),
    # key 3: equal timestamps — tiebreak on event_id orders B before C
    (3, 0, "A", 13), (3, 10, "B", 14), (3, 10, "C", 15),
    # key 4: pattern never completes
    (4, 0, "A", 16), (4, 10, "B", 17),
]


def test_strict_matches_naive(spark):
    df = _mk(spark, EDGE_ROWS)
    got = _collect(
        match_pattern(
            df, ["A", "B", "C"], contiguity="strict", tiebreak=["event_id"]
        ),
        3,
    )
    assert got == _naive_strict(EDGE_ROWS, ["A", "B", "C"])


def test_relaxed_matches_naive(spark):
    df = _mk(spark, EDGE_ROWS)
    got = _collect(match_pattern(df, ["A", "B", "C"], contiguity="relaxed"), 3)
    assert got == _naive_relaxed(EDGE_ROWS, ["A", "B", "C"])
    # key 2 must be found by relaxed but not strict (noise between steps)
    assert any(m[0] == 2 for m in got)
    strict = _collect(
        match_pattern(
            df, ["A", "B", "C"], contiguity="strict", tiebreak=["event_id"]
        ),
        3,
    )
    assert not any(m[0] == 2 for m in strict)


def test_within_bound(spark):
    df = _mk(spark, EDGE_ROWS)
    # both key-1 matches span 20s; a 15-second bound keeps only key 3's
    # equal-timestamp match (span 10s)
    got = _collect(
        match_pattern(
            df, ["A", "B", "C"], contiguity="strict",
            within="15 seconds", tiebreak=["event_id"],
        ),
        3,
    )
    assert got == _naive_strict(EDGE_ROWS, ["A", "B", "C"], within_s=15)
    assert got == [(3, 0.0, 10.0, 10.0)]


def test_relaxed_binds_earliest(spark):
    rows = [
        # two Bs after A: the EARLIER one must bind; C only after the late B
        (7, 0, "A", 1), (7, 10, "B", 2), (7, 20, "B", 3), (7, 30, "C", 4),
        # equal-timestamp step: B at the same ts as A must NOT match (strict >)
        (8, 0, "A", 5), (8, 0, "B", 6), (8, 10, "C", 7),
    ]
    df = _mk(spark, rows)
    got = _collect(match_pattern(df, ["A", "B", "C"], contiguity="relaxed"), 3)
    assert got == _naive_relaxed(rows, ["A", "B", "C"])
    assert (7, 0.0, 10.0, 30.0) in got
    assert not any(m[0] == 8 for m in got)


def test_single_step_pattern(spark):
    df = _mk(spark, EDGE_ROWS)
    got = _collect(match_pattern(df, ["A"], contiguity="strict"), 1)
    assert got == _naive_strict(EDGE_ROWS, ["A"])


def test_bad_args(spark):
    df = _mk(spark, EDGE_ROWS)
    with pytest.raises(ValueError, match="contiguity"):
        match_pattern(df, ["A"], contiguity="nope")
    with pytest.raises(ValueError, match="pattern"):
        match_pattern(df, [])


@pytest.mark.parametrize("contiguity", ["strict", "relaxed"])
def test_fixture_events_vs_duckdb(spark, duck, sf_dir, contiguity):
    """Full funnel over the events fixture vs an independent DuckDB
    formulation (lead() windows for strict, correlated min-subqueries
    for relaxed)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = match_pattern(
        ev, ["view", "click", "purchase"], contiguity=contiguity,
        within="7 days", tiebreak=["event_id"],
    ).select(
        "user_id",
        F.col("ts_1").alias("start_ts"),
        F.col("ts_3").alias("end_ts"),
    )
    if contiguity == "strict":
        sql = """
        WITH e AS (
          SELECT user_id, ts, event_type,
                 lead(event_type,1) OVER w AS t1, lead(event_type,2) OVER w AS t2,
                 lead(ts,2) OVER w AS ts2
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, ts AS start_ts, ts2 AS end_ts
        FROM e
        WHERE event_type='view' AND t1='click' AND t2='purchase'
          AND ts2 <= ts + INTERVAL 7 DAY
        """
    else:
        sql = """
        WITH a AS (SELECT user_id, ts FROM events WHERE event_type='view'),
        b AS (SELECT a.user_id, a.ts AS t0,
                (SELECT min(e.ts) FROM events e
                 WHERE e.user_id=a.user_id AND e.event_type='click'
                   AND e.ts > a.ts) AS t1
              FROM a),
        c AS (SELECT user_id, t0, t1,
                (SELECT min(e.ts) FROM events e
                 WHERE e.user_id=b.user_id AND e.event_type='purchase'
                   AND e.ts > b.t1) AS t2
              FROM b WHERE t1 IS NOT NULL)
        SELECT user_id, t0 AS start_ts, t2 AS end_ts
        FROM c WHERE t2 IS NOT NULL AND t2 <= t0 + INTERVAL 7 DAY
        """
    assert_frames_match(got.toPandas(), duck.execute(sql).df(), f"cep_{contiguity}")
    assert got.count() > 0  # the funnel actually fires on the fixture
