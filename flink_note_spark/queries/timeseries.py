"""Time-series registry queries: gap-filled resampling (LOCF / linear),
the continuous-aggregate rollup cascade, sweep-line concurrency, and
cohort retention — the hypertable surface over the ``events`` table.

Every query emits bucket timestamps as epoch-second BIGINTs (the repo's
oracle-stable convention — see ``fmt_date``/``epoch_us`` usage in
``queries/events.py``) and pins the operators in
``operators/timeseries.py`` value-for-value against DuckDB renderings
that recompute the semantics independently (spine join + IGNORE NULLS
windows for gapfill; a raw-event direct aggregate for the cascade —
so the partial re-aggregation algebra itself is what the hash checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_note_spark.functions.scalar import epoch_us
from flink_note_spark.operators.timeseries import (
    gapfill,
    max_concurrency,
    retention_cohorts,
    rollup_finalize,
    rollup_partials,
    rollup_up,
)
from flink_note_spark.session import load_table as _t


def q144_gapfill_locf(spark: SparkSession, sf: str) -> DataFrame:
    """30-minute resample of events per type with a DENSE spine: missing
    buckets appear with n_events=0 and the previous bucket's sum_value
    carried forward (TimescaleDB ``time_bucket_gapfill`` + ``locf()``).
    Plan: one bucket groupBy + one keyed window/explode — no spine join."""
    e = _t(spark, sf, "events")
    return gapfill(
        e,
        keys=["event_type"],
        ts="ts",
        width="30 minutes",
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": F.round(F.sum("value"), 4),
        },
        fills={"n_events": "zero", "sum_value": "locf"},
    )


_Q144_SQL = """
WITH b AS (
  SELECT event_type,
         (epoch_us(ts) // 1800000000) * 1800 AS bucket_s,
         count(*)             AS n_events,
         round(sum(value), 4) AS sum_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket_s) AS mn, max(bucket_s) AS mx FROM b GROUP BY 1
), spine AS (
  SELECT event_type, unnest(range(mn, mx + 1800, 1800)) AS bucket_s FROM bounds
)
SELECT s.event_type,
       s.bucket_s,
       coalesce(b.n_events, 0) AS n_events,
       -- struct-wrap marks PRESENCE so the IGNORE NULLS window carries
       -- the donor bucket's value even when that value is NULL — the
       -- operator's strict donor-carry contract (a bare
       -- last_value(sum_value IGNORE NULLS) would skip present-but-NULL
       -- donors and diverge on NULL-able measures)
       (last_value(CASE WHEN b.bucket_s IS NOT NULL
                        THEN struct_pack(v := b.sum_value) END
                   IGNORE NULLS) OVER (
          PARTITION BY s.event_type ORDER BY s.bucket_s
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v AS sum_value,
       CASE WHEN b.bucket_s IS NULL THEN 1 ELSE 0 END AS is_gap
FROM spine s
LEFT JOIN b ON s.event_type = b.event_type AND s.bucket_s = b.bucket_s
"""


def q145_gapfill_linear(spark: SparkSession, sf: str) -> DataFrame:
    """30-minute average-value series per type with LINEAR interpolation
    across empty buckets (``interpolate()``).

    Float-determinism note (why there is NO rounding here): the bucket
    averages are exact-integer penny sums divided once, and the
    interpolation fraction divides two exactly-representable integers —
    every double in the chain is the CORRECTLY-ROUNDED result of the
    same real number on both engines, so the values hash bit-identical
    with no rounding at all. ``round(x, 4)`` would be WEAKER: exact
    2-decimal inputs put interpolated values on decimal midpoints, where
    Spark's HALF_UP-on-BigDecimal and DuckDB's scaled-double rounding
    disagree."""
    e = _t(spark, sf, "events").withColumn(
        "vi", F.round(F.col("value") * 100, 0).cast("long")
    )
    filled = gapfill(
        e,
        keys=["event_type"],
        ts="ts",
        width="30 minutes",
        aggs={"avg_value": F.sum("vi") / F.count(F.lit(1))},
        fills={"avg_value": "linear"},
    )
    return filled.select(
        "event_type",
        "bucket_s",
        (F.col("avg_value") / 100.0).alias("avg_value"),
        "is_gap",
    )


_Q145_SQL = """
WITH b AS (
  SELECT event_type,
         (epoch_us(ts) // 1800000000) * 1800 AS bucket_s,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS av
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket_s) AS mn, max(bucket_s) AS mx FROM b GROUP BY 1
), spine AS (
  SELECT event_type, unnest(range(mn, mx + 1800, 1800)) AS bucket_s FROM bounds
), j AS (
  SELECT s.event_type, s.bucket_s, b.av,
         CASE WHEN b.av IS NULL THEN 1 ELSE 0 END AS is_gap
  FROM spine s
  LEFT JOIN b ON s.event_type = b.event_type AND s.bucket_s = b.bucket_s
), w AS (
  SELECT *,
    last_value(CASE WHEN av IS NOT NULL THEN bucket_s END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY bucket_s
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_ts,
    last_value(av IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY bucket_s
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_v,
    first_value(CASE WHEN av IS NOT NULL THEN bucket_s END IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY bucket_s
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_ts,
    first_value(av IGNORE NULLS) OVER
      (PARTITION BY event_type ORDER BY bucket_s
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_v
  FROM j
)
SELECT event_type, bucket_s,
       (CASE WHEN av IS NOT NULL THEN av
             ELSE p_v + (n_v - p_v) *
                  (CAST(bucket_s - p_ts AS DOUBLE) / CAST(n_ts - p_ts AS DOUBLE))
        END) / 100.0 AS avg_value,
       is_gap
FROM w
"""


_ROLLUP_MEASURES = {
    "n": ("*", "count"),
    "sum_vi": ("vi", "sum"),
    "min_value": ("value", "min"),
    "max_value": ("value", "max"),
    "first_value": ("value", "first"),
    "last_value": ("value", "last"),
}


def q146_rollup_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Continuous-aggregate cascade 15 min → 1 hour → 1 day: the daily
    level is re-aggregated from HOURLY PARTIALS which came from 15-MINUTE
    PARTIALS — raw events are scanned exactly once, at the finest level.
    The oracle aggregates raw events directly at the daily grain, so the
    hash pins the whole partial algebra (count/sum/min/max fold,
    first/last as ordered-struct min/max with the event_id tiebreak;
    the avg here derives from the pinned sum and count partials — the
    ``avg`` measure KIND's (sum, count) carry is pytest-pinned in
    test_timeseries.py instead, since its float division would need
    rounding).

    Sums run over the EXACT integer penny rendering of ``value`` (the
    fixture's values are 2-decimal): re-aggregation reorders float
    addition, so a double-summed cascade can disagree with a direct
    oracle sum in the last ulp and flip a rounding boundary — integer
    partials make the cascade sum exactly associative (what a production
    continuous aggregate wants for money-like measures). The finalize
    projections divide the SAME exact integers on both sides (floor
    division to micro-dollars for the average), so every emitted double
    is bit-identical with no rounding function anywhere."""
    e = _t(spark, sf, "events").withColumn(
        "vi", F.round(F.col("value") * 100, 0).cast("long")
    )
    keys = ["event_type"]
    fine = rollup_partials(
        e, keys, "ts", "15 minutes", _ROLLUP_MEASURES, tiebreak="event_id"
    )
    hourly = rollup_up(fine, keys, "1 hour", _ROLLUP_MEASURES)
    daily = rollup_up(hourly, keys, "1 day", _ROLLUP_MEASURES)
    out = rollup_finalize(daily, keys, _ROLLUP_MEASURES)
    return out.select(
        "event_type",
        "bucket_s",
        "n",
        (F.col("sum_vi") / 100.0).alias("sum_value"),
        "min_value",
        "max_value",
        (F.expr("sum_vi * 10000 div n") / 1000000.0).alias("avg_value"),
        "first_value",
        "last_value",
    )


_Q146_SQL = """
WITH r AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000) * 86400 AS bucket_s,
         ts, event_id, value,
         CAST(round(value * 100, 0) AS BIGINT) AS vi
  FROM events
), w AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type, bucket_s
                       ORDER BY ts, event_id) AS rf,
    row_number() OVER (PARTITION BY event_type, bucket_s
                       ORDER BY ts DESC, event_id DESC) AS rl
  FROM r
)
SELECT event_type, bucket_s,
       count(*)                                          AS n,
       CAST(sum(vi) AS DOUBLE) / 100.0                   AS sum_value,
       min(value)                                        AS min_value,
       max(value)                                        AS max_value,
       CAST((sum(vi) * 10000) // count(*) AS DOUBLE)
         / 1000000.0                                     AS avg_value,
       max(CASE WHEN rf = 1 THEN value END)              AS first_value,
       max(CASE WHEN rl = 1 THEN value END)              AS last_value
FROM w GROUP BY 1, 2
"""


def q147_sweepline_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrent intervals per event type, where each event spans
    ``[ts, ts + value seconds)`` — the sweep-line +1/−1 running-sum
    shape, run through the BUCKETED distributed prefix-sum path
    (time_buckets=8) so the oracle hash also pins the two-pass offset
    algebra, not just the naive per-key window."""
    e = _t(spark, sf, "events")
    start = epoch_us("ts")
    end = epoch_us("ts") + F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long")
    return max_concurrency(
        e, ["event_type"], start, end, tiebreak="event_id", time_buckets=8
    )


_Q147_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) AS t_us, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT event_type,
         epoch_us(ts) + CAST(floor(value * 1000000.0) AS BIGINT) AS t_us,
         -1 AS delta, event_id
  FROM events
), r AS (
  SELECT event_type, t_us,
         CAST(sum(delta) OVER (PARTITION BY event_type
                               ORDER BY t_us, delta, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS running
  FROM d
), m AS (
  SELECT event_type, max(running) AS max_concurrent FROM r GROUP BY 1
)
SELECT r.event_type, m.max_concurrent, min(r.t_us) AS peak_at_us
FROM r JOIN m ON r.event_type = m.event_type AND r.running = m.max_concurrent
GROUP BY 1, 2
"""


def q148_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention matrix over events: cohort = the user's
    first active epoch-week; one row per (cohort, week index) with the
    retained fraction."""
    e = _t(spark, sf, "events")
    return retention_cohorts(e, "user_id", "ts", "1 week")


_Q148_SQL = """
WITH au AS (
  SELECT DISTINCT user_id AS u,
         (epoch_us(ts) // 604800000000) * 604800 AS p
  FROM events
), f AS (
  SELECT u, min(p) AS cohort_s FROM au GROUP BY 1
), m AS (
  SELECT f.cohort_s,
         (au.p - f.cohort_s) // 604800 AS period_index,
         count(DISTINCT au.u) AS active_users
  FROM au JOIN f ON au.u = f.u GROUP BY 1, 2
), s AS (
  SELECT cohort_s, count(DISTINCT u) AS cohort_size FROM f GROUP BY 1
)
SELECT m.cohort_s, m.period_index, m.active_users, s.cohort_size,
       round(CAST(m.active_users AS DOUBLE) / s.cohort_size, 4) AS retention
FROM m JOIN s ON m.cohort_s = s.cohort_s
"""


def q149_lttb_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """LTTB visual downsampling: one representative event per (type,
    day) — endpoints anchored, interior days keep the point with the
    largest triangle area against neighbour-day centroids. The area
    ranking runs on the exact penny rendering so every centroid and
    every score double is bit-identical to the oracle's independent
    replay (the q145/q146 determinism doctrine)."""
    from flink_note_spark.operators.timeseries import lttb_downsample

    e = _t(spark, sf, "events").withColumn(
        "vi", F.round(F.col("value") * 100, 0).cast("long")
    )
    picked = lttb_downsample(
        e, ["event_type"], "ts", "vi", "1 day", tiebreak="event_id"
    )
    return picked.select(
        "event_type",
        "bucket_s",
        epoch_us("ts").alias("t_us"),
        (F.col("vi") / 100.0).alias("value"),
    )


_Q149_SQL = """
WITH p AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000) * 86400 AS bucket_s,
         epoch_us(ts) AS t_us,
         CAST(round(value * 100, 0) AS BIGINT) AS vi,
         event_id
  FROM events
), a AS (
  -- bucket-relative time sums (absolute epoch-us sums overflow int64
  -- at scale; mirrors the operator's base + mean-offset formulation)
  SELECT event_type, bucket_s,
         CAST(bucket_s * 1000000 AS DOUBLE)
           + CAST(sum(t_us - bucket_s * 1000000) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_t,
         CAST(sum(vi) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_v
  FROM p GROUP BY 1, 2
), nb AS (
  SELECT *,
         lag(avg_t)  OVER w AS p_t, lag(avg_v)  OVER w AS p_v,
         lead(avg_t) OVER w AS n_t, lead(avg_v) OVER w AS n_v,
         row_number() OVER w AS rn_a,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket_s DESC) AS rn_d
  FROM a WINDOW w AS (PARTITION BY event_type ORDER BY bucket_s)
), sc AS (
  SELECT p.event_type, p.bucket_s, p.t_us, p.vi, p.event_id,
         CASE WHEN nb.rn_a = 1 THEN -CAST(p.t_us AS DOUBLE)
              WHEN nb.rn_d = 1 THEN  CAST(p.t_us AS DOUBLE)
              ELSE abs(nb.p_t * (CAST(p.vi AS DOUBLE) - nb.n_v)
                     + CAST(p.t_us AS DOUBLE) * (nb.n_v - nb.p_v)
                     + nb.n_t * (nb.p_v - CAST(p.vi AS DOUBLE)))
         END AS score
  FROM p JOIN nb ON p.event_type = nb.event_type AND p.bucket_s = nb.bucket_s
)
SELECT event_type, bucket_s, t_us, CAST(vi AS DOUBLE) / 100.0 AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type, bucket_s
                               ORDER BY score DESC, t_us, event_id) AS rn
  FROM sc
)
WHERE rn = 1
"""


def q150_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type EWMA (α = 0.3) over event values in event-time order.
    The oracle replays the IDENTICAL recurrence through a recursive CTE
    — fixed multiply order, α spelled as the same double-cast literal
    and 1−α computed (never written as a decimal literal: the exact
    subtraction result lands midway between adjacent doubles, so a
    hand-written ``0.7`` is NOT guaranteed to equal it) — every output
    double hash-matches bit-for-bit with no rounding."""
    from flink_note_spark.operators.timeseries import ewma

    e = _t(spark, sf, "events").select("event_type", "ts", "event_id", "value")
    out = ewma(e, ["event_type"], "ts", "value", alpha=0.3, tiebreak="event_id")
    return out.select(
        "event_type", epoch_us("ts").alias("t_us"), "event_id", "ewma"
    )


_Q150_SQL = """
WITH RECURSIVE s AS (
  SELECT event_type, epoch_us(ts) AS t_us, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
), r AS (
  SELECT event_type, rn, t_us, event_id, CAST(value AS DOUBLE) AS ewma
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.rn, s.t_us, s.event_id,
         (1.0 - CAST(0.3 AS DOUBLE)) * r.ewma
           + CAST(0.3 AS DOUBLE) * s.value
  FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, t_us, event_id, ewma FROM r
"""


_Q151_MEASURES = {
    "n": ("*", "count"),
    "s": ("cents", "sum"),
    "mx": ("cents", "max"),
}


def q151_month_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """CALENDAR-grain continuous aggregate (r11): daily order partials
    fold up to MONTH buckets (``time_bucket('1 month')`` — variable
    widths, so the fold groups by the calendar month of each fine
    bucket's start, pure date arithmetic). The oracle aggregates raw
    rows directly at month grain, so the hash verifies the calendar
    cascade algebra itself. Pennies as BIGINT keep every sum exact on
    both engines (the bit-identical-doubles doctrine)."""
    o = _t(spark, sf, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    day = rollup_partials(
        o, ["o_orderpriority"], "o_orderdate", "1 day", _Q151_MEASURES
    )
    month = rollup_up(day, ["o_orderpriority"], "1 month", _Q151_MEASURES)
    return rollup_finalize(month, ["o_orderpriority"], _Q151_MEASURES)


_Q151_SQL = """
SELECT o_orderpriority,
       CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS bucket_s,
       CAST(count(*) AS BIGINT)                                AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS s,
       CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS mx
FROM orders GROUP BY 1, 2
"""


def q152_month_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Month-grain gapfill (r11): high-value orders are sparse enough
    that many (priority, month) buckets are empty — the dense monthly
    spine zero-fills counts and LOCF-carries the running max, with the
    spine arithmetic on month INDICES (so February's width never skews
    a run length) and ``bucket_s`` emitted as month-start epoch
    seconds. Oracle: an independent generate_series month spine +
    IGNORE NULLS window."""
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 470000)
        .withColumn(
            "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
        )
    )
    return gapfill(
        o,
        keys=["o_orderpriority"],
        ts="o_orderdate",
        width="1 month",
        aggs={"n": F.count(F.lit(1)), "mx_cents": F.max("cents")},
        fills={"n": "zero", "mx_cents": "locf"},
    )


_Q152_SQL = """
WITH f AS (
  SELECT o_orderpriority,
         date_trunc('month', o_orderdate) AS m,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice > 470000
), b AS (
  SELECT o_orderpriority, m,
         CAST(count(*) AS BIGINT) AS n,
         max(cents) AS mx_cents
  FROM f GROUP BY 1, 2
), bounds AS (
  SELECT o_orderpriority, min(m) AS mn, max(m) AS mx FROM b GROUP BY 1
), spine AS (
  SELECT o_orderpriority,
         unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS m
  FROM bounds
)
SELECT s.o_orderpriority,
       CAST(epoch(s.m) AS BIGINT) AS bucket_s,
       coalesce(b.n, 0) AS n,
       (last_value(CASE WHEN b.m IS NOT NULL
                        THEN struct_pack(v := b.mx_cents) END
                   IGNORE NULLS) OVER (
          PARTITION BY s.o_orderpriority ORDER BY s.m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v AS mx_cents,
       CASE WHEN b.m IS NULL THEN 1 ELSE 0 END AS is_gap
FROM spine s
LEFT JOIN b ON s.o_orderpriority = b.o_orderpriority AND s.m = b.m
"""


def q155_week_origin_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """ORIGIN-anchored buckets (r11, TimescaleDB `time_bucket(...,
    origin =>)`): Monday-starting weekly gapfill over sparse high-value
    orders — epoch alignment would start weeks on Thursday. The oracle
    uses DuckDB's OWN three-argument `time_bucket` (a genuinely
    independent origin implementation) + a 7-day generate_series
    spine, so the hash pins the origin arithmetic end-to-end."""
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 470000)
        .withColumn(
            "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
        )
    )
    return gapfill(
        o,
        keys=["o_orderpriority"],
        ts="o_orderdate",
        width="1 week",
        aggs={"n": F.count(F.lit(1)), "s": F.sum("cents")},
        fills={"n": "zero", "s": "locf"},
        origin="1995-01-02",  # a Monday
    )


_Q155_SQL = """
WITH f AS (
  SELECT o_orderpriority,
         time_bucket(INTERVAL '7 days', o_orderdate,
                     TIMESTAMP '1995-01-02 00:00:00') AS w,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice > 470000
), b AS (
  SELECT o_orderpriority, w,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s
  FROM f GROUP BY 1, 2
), bounds AS (
  SELECT o_orderpriority, min(w) AS mn, max(w) AS mx FROM b GROUP BY 1
), spine AS (
  SELECT o_orderpriority,
         unnest(generate_series(mn, mx, INTERVAL 7 DAY)) AS w
  FROM bounds
)
SELECT sp.o_orderpriority,
       CAST(epoch(sp.w) AS BIGINT) AS bucket_s,
       coalesce(b.n, 0) AS n,
       (last_value(CASE WHEN b.w IS NOT NULL
                        THEN struct_pack(v := b.s) END
                   IGNORE NULLS) OVER (
          PARTITION BY sp.o_orderpriority ORDER BY sp.w
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v AS s,
       CASE WHEN b.w IS NULL THEN 1 ELSE 0 END AS is_gap
FROM spine sp
LEFT JOIN b ON sp.o_orderpriority = b.o_orderpriority AND sp.w = b.w
"""


QUERIES = {
    "q144_gapfill_locf": q144_gapfill_locf,
    "q145_gapfill_linear": q145_gapfill_linear,
    "q151_month_rollup": q151_month_rollup,
    "q152_month_gapfill": q152_month_gapfill,
    "q155_week_origin_gapfill": q155_week_origin_gapfill,
    "q146_rollup_cascade": q146_rollup_cascade,
    "q147_sweepline_concurrency": q147_sweepline_concurrency,
    "q148_retention_cohorts": q148_retention_cohorts,
    "q149_lttb_downsample": q149_lttb_downsample,
    "q150_ewma": q150_ewma,
}

ORACLES = {
    "q144_gapfill_locf": _Q144_SQL,
    "q145_gapfill_linear": _Q145_SQL,
    "q151_month_rollup": _Q151_SQL,
    "q152_month_gapfill": _Q152_SQL,
    "q155_week_origin_gapfill": _Q155_SQL,
    "q146_rollup_cascade": _Q146_SQL,
    "q147_sweepline_concurrency": _Q147_SQL,
    "q148_retention_cohorts": _Q148_SQL,
    "q149_lttb_downsample": _Q149_SQL,
    "q150_ewma": _Q150_SQL,
}
