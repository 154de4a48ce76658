"""Event-table queries: JSON extraction, event-time windows (batch
renderings of the streaming semantics — the streaming twins live in
``flink_note_spark.streaming`` and are exercised by the pytest streaming
suite), sessionization, dedup, as-of join.

Batch/stream duality is the reference's own framing: the same ``readFile``
path serves PROCESS_ONCE and PROCESS_CONTINUOUSLY (``NOTES:3-9``;
SURVEY.md §2.1 S2), so each windowed query here is the bounded rendering
of a streaming op with identical results on bounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_note_spark.functions.scalar import epoch_us, fmt_date
from flink_note_spark.operators.joins import asof_join
from flink_note_spark.operators.windows import sessionize
from flink_note_spark.session import load_table as _t


def q22_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON field extraction from events.props via the Spark 4 VARIANT
    path (SURVEY.md §2.2 JSON surface). Round 7 (VERDICT r6 item 2):
    ``parse_json`` + ``try_variant_get`` replaces the round-4 typed
    ``from_json`` parse — measured ~12% median / ~23% min faster at 32×
    sf0.1 (numbers in ``functions.scalar.variant_field`` and
    BASELINE.md), same null-on-corrupt contract, identical results.
    ``json_int``/get_json_object stays available in ``functions.scalar``
    for ad-hoc single-path pulls."""
    from flink_note_spark.functions.scalar import variant_field

    e = _t(spark, sf, "events")
    return (
        e.select("event_type", variant_field("props", "$.k", "int").alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_Q22_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
       count(*)                                                          AS n_events
FROM events GROUP BY event_type
"""


def q23_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Daily tumbling windows via ``F.window`` (epoch-aligned, = calendar
    days in UTC). Streaming twin: streaming.tumbling_window_agg."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            fmt_date(F.col("w.start"), "day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_Q23_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       count(*)             AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q24_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """2-day windows sliding by 1 day: each event lands in exactly two
    windows. Streaming twin: streaming.sliding_window_agg."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(fmt_date(F.col("w.start"), "win_start"), "n_events", "sum_value")
    )


_Q24_SQL = """
SELECT strftime(ws, '%Y-%m-%d') AS win_start,
       count(*)             AS n_events,
       round(sum(value), 4) AS sum_value
FROM (
  SELECT unnest([date_trunc('day', ts), date_trunc('day', ts) - INTERVAL 1 DAY]) AS ws,
         value
  FROM events
)
GROUP BY ws
"""


def q25_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization (gap = 6h) — gaps-and-islands; the streaming
    twin is session_window_agg / stateful_sessionize."""
    e = _t(spark, sf, "events")
    s = sessionize(e, key="user_id", ts="ts", gap_seconds=6 * 3600, tiebreak="event_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(epoch_us("ts")).alias("session_start_us"),
        F.max(epoch_us("ts")).alias("session_end_us"),
    )


_Q25_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*)          AS n_events,
       min(epoch_us(ts)) AS session_start_us,
       max(epoch_us(ts)) AS session_end_us
FROM sessions GROUP BY user_id, session_id
"""


def q26_dedup_first_event(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-first dedup per key ordered by event time — the batch
    rendering of streaming ``dropDuplicates`` with watermark
    (SURVEY.md §2.2 'Deduplication')."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            epoch_us("ts", "first_ts_us"),
            "event_type",
        )
    )


_Q26_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS first_ts_us, event_type
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


def q27_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase gets the user's most recent prior-or-equal
    click (union + running last_value — operators.joins.asof_join;
    SURVEY.md §2.2 'As-of')."""
    e = _t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_cols=["click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_us("ts", "purchase_ts_us"),
        epoch_us("click_ts", "last_click_ts_us"),
    )


_Q27_SQL = """
WITH merged AS (
  SELECT user_id, ts, event_id, NULL::TIMESTAMP AS click_ts, 1 AS side, value
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, NULL::BIGINT AS event_id, ts AS click_ts, 0 AS side, NULL::DOUBLE
  FROM events WHERE event_type = 'click'
), filled AS (
  SELECT user_id, ts, event_id, side,
         last_value(click_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, side
           ROWS UNBOUNDED PRECEDING) AS last_click
  FROM merged
)
SELECT event_id, user_id,
       epoch_us(ts)         AS purchase_ts_us,
       epoch_us(last_click) AS last_click_ts_us
FROM filled WHERE side = 1
"""


def q28_event_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user funnel: first view → first purchase conversion lag, a
    conditional-aggregation pattern (stateful-processing batch twin)."""
    e = _t(spark, sf, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        epoch_us("first_view", "first_view_us"),
        epoch_us("first_purchase", "first_purchase_us"),
        F.when(
            F.col("first_purchase").isNotNull() & F.col("first_view").isNotNull(),
            (epoch_us("first_purchase") - epoch_us("first_view")) / 1_000_000,
        ).alias("view_to_purchase_sec"),
    )


_Q28_SQL = """
SELECT user_id,
       count(*) AS n_events,
       epoch_us(min(CASE WHEN event_type = 'view'     THEN ts END)) AS first_view_us,
       epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END)) AS first_purchase_us,
       CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
             AND min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
            THEN (epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END))
                - epoch_us(min(CASE WHEN event_type = 'view' THEN ts END))) / 1000000.0
       END AS view_to_purchase_sec
FROM events GROUP BY user_id
"""


def q59_side_output_routing(spark: SparkSession, sf: str) -> DataFrame:
    """OutputTag routing audit (streaming/ops.side_outputs semantics,
    batch rendering): per-tag row counts and value sums over events,
    where tags are independent predicates (a row may reach several) and
    rows matching NO tag — including NULL-predicate rows, per the
    operator's three-valued-logic contract — land in main. The union of
    per-tag aggregates is one DataFrame, so the exact routing semantics
    are oracle-checkable; the fan-out/sink half is pytest-gated
    (tests/test_streaming.py route_to_sinks)."""
    from flink_note_spark.streaming.ops import side_outputs

    e = _t(spark, sf, "events")
    outs = side_outputs(
        e,
        {
            "errors": F.col("event_type") == "error",
            "whales": F.col("value") > 300,
        },
    )
    parts = [
        df.agg(
            F.lit(tag).alias("tag"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        for tag, df in sorted(outs.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tag")


_Q59_SQL = """
SELECT 'errors' AS tag, count(*) AS n_rows, round(sum(value), 2) AS sum_value
FROM events WHERE event_type = 'error'
UNION ALL
SELECT 'main' AS tag, count(*) AS n_rows, round(sum(value), 2) AS sum_value
FROM events
WHERE NOT coalesce(event_type = 'error', FALSE)
  AND NOT coalesce(value > 300, FALSE)
UNION ALL
SELECT 'whales' AS tag, count(*) AS n_rows, round(sum(value), 2) AS sum_value
FROM events WHERE value > 300
ORDER BY tag
"""


def q68_event_pattern(spark: SparkSession, sf: str) -> DataFrame:
    """CEP strict contiguity (Flink ``Pattern.begin().next().next()
    .within()``, SURVEY.md §2.2 CEP): view→click→purchase as ADJACENT
    events per user within 7 days — one lead() window pass, one shuffle
    on the key. ``event_id`` breaks equal-timestamp ties for a total
    order (determinism doctrine)."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    return (
        match_pattern(
            e,
            ["view", "click", "purchase"],
            within="7 days",
            contiguity="strict",
            tiebreak=["event_id"],
        )
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_3").alias("end_ts"),
        )
        .orderBy("user_id", "start_ts")
    )


_Q68_SQL = """
WITH e AS (
  SELECT user_id, ts, event_type,
         lead(event_type,1) OVER w AS t1, lead(event_type,2) OVER w AS t2,
         lead(ts,2) OVER w AS ts2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, ts AS start_ts, ts2 AS end_ts
FROM e
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
  AND ts2 <= ts + INTERVAL 7 DAY
ORDER BY user_id, start_ts
"""


def q69_event_pattern_relaxed(spark: SparkSession, sf: str) -> DataFrame:
    """CEP relaxed contiguity (Flink ``followedBy`` under
    skip-till-next-match): for each 'view', the earliest later 'click',
    then the earliest 'purchase' after that, within 7 days — rendered as
    union + running-min window passes (no correlated per-row subquery,
    no join explosion; the oracle uses DuckDB's correlated form as an
    independent formulation)."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    return (
        match_pattern(
            e,
            ["view", "click", "purchase"],
            within="7 days",
            contiguity="relaxed",
        )
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_2").alias("click_ts"),
            F.col("ts_3").alias("end_ts"),
        )
        .orderBy("user_id", "start_ts")
    )


_Q69_SQL = """
WITH a AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
b AS (SELECT a.user_id, a.ts AS t0,
        (SELECT min(e.ts) FROM events e
         WHERE e.user_id = a.user_id AND e.event_type = 'click'
           AND e.ts > a.ts) AS t1
      FROM a),
c AS (SELECT user_id, t0, t1,
        (SELECT min(e.ts) FROM events e
         WHERE e.user_id = b.user_id AND e.event_type = 'purchase'
           AND e.ts > b.t1) AS t2
      FROM b WHERE t1 IS NOT NULL)
SELECT user_id, t0 AS start_ts, t1 AS click_ts, t2 AS end_ts
FROM c WHERE t2 IS NOT NULL AND t2 <= t0 + INTERVAL 7 DAY
ORDER BY user_id, start_ts
"""


def q153_cep_group_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Flink GROUP pattern (r11): ``Pattern.begin(view next click)
    .times(2)`` — the whole sub-pattern repeated as a block under
    strict contiguity. Exact counts FLATTEN to the 4-step adjacent
    chain, so the oracle's independent lead-chain replay pins both the
    expansion and the engine. One lead() window pass, one shuffle."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    g = [{
        "group": [
            {"type": "view"}, {"type": "click", "mode": "strict"},
        ],
        "times": 2, "mode": "strict",
    }]
    return (
        match_pattern(
            e, g, within="7 days", contiguity="strict",
            tiebreak=["event_id"],
        )
        .select(
            "user_id",
            F.col("ts_1").alias("v1"), F.col("ts_2").alias("c1"),
            F.col("ts_3").alias("v2"), F.col("ts_4").alias("c2"),
        )
        .orderBy("user_id", "v1")
    )


_Q153_SQL = """
WITH e AS (
  SELECT user_id, ts, event_type,
         lead(event_type,1) OVER w AS t1, lead(event_type,2) OVER w AS t2,
         lead(event_type,3) OVER w AS t3,
         lead(ts,1) OVER w AS ts1, lead(ts,2) OVER w AS ts2,
         lead(ts,3) OVER w AS ts3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, ts AS v1, ts1 AS c1, ts2 AS v2, ts3 AS c2
FROM e
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'view' AND t3 = 'click'
  AND ts3 <= ts + INTERVAL 7 DAY
ORDER BY user_id, v1
"""


def q154_cep_group_range(spark: SparkSession, sf: str) -> DataFrame:
    """RANGED group pattern (r11): ``(view next click).times(1, 2)`` —
    block-variant expansion, the union over repetition counts with
    trailing columns NULL on the 1-copy rows (the step-level variant
    convention). Oracle: an independent UNION ALL of the 2-step and
    4-step lead chains."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    g = [{
        "group": [
            {"type": "view"}, {"type": "click", "mode": "strict"},
        ],
        "times": 1, "times_max": 2, "mode": "strict",
    }]
    return (
        match_pattern(
            e, g, within="7 days", contiguity="strict",
            tiebreak=["event_id"],
        )
        .select(
            "user_id",
            F.col("ts_1").alias("v1"), F.col("ts_2").alias("c1"),
            F.col("ts_3").alias("v2"), F.col("ts_4").alias("c2"),
        )
        .orderBy("user_id", "v1", "v2")
    )


_Q154_SQL = """
WITH e AS (
  SELECT user_id, ts, event_type,
         lead(event_type,1) OVER w AS t1, lead(event_type,2) OVER w AS t2,
         lead(event_type,3) OVER w AS t3,
         lead(ts,1) OVER w AS ts1, lead(ts,2) OVER w AS ts2,
         lead(ts,3) OVER w AS ts3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, ts AS v1, ts1 AS c1,
       CAST(NULL AS TIMESTAMP) AS v2, CAST(NULL AS TIMESTAMP) AS c2
FROM e
WHERE event_type = 'view' AND t1 = 'click'
  AND ts1 <= ts + INTERVAL 7 DAY
UNION ALL
SELECT user_id, ts AS v1, ts1 AS c1, ts2 AS v2, ts3 AS c2
FROM e
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'view' AND t3 = 'click'
  AND ts3 <= ts + INTERVAL 7 DAY
ORDER BY user_id, v1, v2
"""


def q86_cep_times(spark: SparkSession, sf: str) -> DataFrame:
    """CEP exact-``times(n)`` quantifier (Flink ``Pattern.begin("view")
    .next("click").times(2).next("purchase").within(...)``, strict/
    consecutive): view then TWO adjacent clicks then purchase, per user
    within 7 days — pure pattern expansion into the one-pass lead()
    window chain (no joins)."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    return (
        match_pattern(
            e,
            ["view", {"type": "click", "times": 2}, "purchase"],
            within="7 days",
            contiguity="strict",
            tiebreak=["event_id"],
        )
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_2").alias("click1_ts"),
            F.col("ts_2_last").alias("click2_ts"),
            F.col("ts_3").alias("end_ts"),
        )
        .orderBy("user_id", "start_ts")
    )


_Q86_SQL = """
WITH e AS (
  SELECT user_id, ts,
         event_type AS t0,
         lead(event_type,1) OVER w AS t1, lead(ts,1) OVER w AS ts1,
         lead(event_type,2) OVER w AS t2, lead(ts,2) OVER w AS ts2,
         lead(event_type,3) OVER w AS t3, lead(ts,3) OVER w AS ts3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, ts AS start_ts, ts1 AS click1_ts, ts2 AS click2_ts,
       ts3 AS end_ts
FROM e
WHERE t0 = 'view' AND t1 = 'click' AND t2 = 'click' AND t3 = 'purchase'
  AND ts3 <= ts + INTERVAL 7 DAY
ORDER BY user_id, start_ts
"""


def q87_cep_negation(spark: SparkSession, sf: str) -> DataFrame:
    """CEP ``notFollowedBy`` (Flink ``Pattern.begin("view")
    .notFollowedBy("click").followedBy("purchase")``): purchases whose
    preceding view saw NO click in between — the negated step is an
    absence assertion on the open interval, rendered as one extra
    union + running-min window pass (no anti-join explosion, no
    correlated per-row subquery)."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .not_followed_by("click")
        .followed_by("purchase")
        .within("7 days")
    )
    return (
        match_pattern(e, p)
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_2").alias("end_ts"),
        )
        .orderBy("user_id", "start_ts")
    )


_Q87_SQL = """
WITH a AS (SELECT user_id, ts AS t0 FROM events WHERE event_type = 'view'),
b AS (SELECT user_id, t0,
        (SELECT min(e.ts) FROM events e WHERE e.user_id = a.user_id
         AND e.event_type = 'purchase' AND e.ts > a.t0) AS t1 FROM a)
SELECT user_id, t0 AS start_ts, t1 AS end_ts
FROM b
WHERE t1 IS NOT NULL AND t1 <= t0 + INTERVAL 7 DAY
  AND NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = b.user_id
                  AND e.event_type = 'click' AND e.ts > b.t0 AND e.ts < b.t1)
ORDER BY user_id, start_ts
"""


def q88_cep_one_or_more(spark: SparkSession, sf: str) -> DataFrame:
    """CEP greedy ``oneOrMore().until()`` (Flink ``Pattern.begin("view")
    .followedBy("click").oneOrMore().greedy().until("purchase")
    .followedBy("purchase").within(...)``): every click between the
    view and its first purchase (>=1 required), then the purchase —
    the loop is one key equi-join + group-agg whose fan-out is the
    actual run length."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .followed_by("click").one_or_more().until("purchase")
        .followed_by("purchase")
        .within("7 days")
    )
    return (
        match_pattern(e, p)
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_2").alias("first_click"),
            F.col("ts_2_last").alias("last_click"),
            F.col("n_2").alias("n_clicks"),
            F.col("ts_3").alias("end_ts"),
        )
        .orderBy("user_id", "start_ts")
    )


_Q88_SQL = """
WITH a AS (SELECT user_id, ts AS t0 FROM events WHERE event_type = 'view'),
b AS (SELECT user_id, t0,
        (SELECT min(e.ts) FROM events e WHERE e.user_id = a.user_id
         AND e.event_type = 'purchase' AND e.ts > a.t0) AS stop FROM a),
c AS (SELECT user_id, t0, stop,
        (SELECT count(*) FROM events e WHERE e.user_id = b.user_id
         AND e.event_type = 'click' AND e.ts > b.t0
         AND (b.stop IS NULL OR e.ts < b.stop)
         AND e.ts <= b.t0 + INTERVAL 7 DAY) AS n,
        (SELECT min(e.ts) FROM events e WHERE e.user_id = b.user_id
         AND e.event_type = 'click' AND e.ts > b.t0
         AND (b.stop IS NULL OR e.ts < b.stop)
         AND e.ts <= b.t0 + INTERVAL 7 DAY) AS fc,
        (SELECT max(e.ts) FROM events e WHERE e.user_id = b.user_id
         AND e.event_type = 'click' AND e.ts > b.t0
         AND (b.stop IS NULL OR e.ts < b.stop)
         AND e.ts <= b.t0 + INTERVAL 7 DAY) AS lc
      FROM b)
SELECT user_id, t0 AS start_ts, fc AS first_click, lc AS last_click,
       CAST(n AS BIGINT) AS n_clicks, stop AS end_ts
FROM c
WHERE n >= 1 AND stop IS NOT NULL AND stop <= t0 + INTERVAL 7 DAY
ORDER BY user_id, start_ts
"""


def q89_cep_strict_run(spark: SparkSession, sf: str) -> DataFrame:
    """CEP strict greedy run (Flink ``Pattern.begin("click").oneOrMore()
    .greedy().consecutive().next("purchase")``): each maximal-from-start
    consecutive click run whose IMMEDIATE successor is a purchase —
    gaps-and-islands run metadata + one co-partitioned (key, position)
    equi-join; one match per starting click (overlapping starts, the
    no-skip doctrine of the plain strict matcher)."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    return (
        match_pattern(
            e,
            [{"type": "click", "one_or_more": True}, "purchase"],
            within="7 days",
            contiguity="strict",
            tiebreak=["event_id"],
        )
        .select(
            "user_id",
            F.col("ts_1").alias("run_start"),
            F.col("ts_1_last").alias("run_end"),
            F.col("n_1").alias("n_clicks"),
            F.col("ts_2").alias("purchase_ts"),
        )
        .orderBy("user_id", "run_start")
    )


_Q89_SQL = """
WITH e AS (
  SELECT user_id, ts, event_type, event_id,
         row_number() OVER w AS pos,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY pos) AS grp
      FROM e),
r AS (SELECT *,
        count(*) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem,
        max(ts) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS runlast
      FROM g)
SELECT r.user_id, r.ts AS run_start, r.runlast AS run_end,
       CAST(r.rem AS BIGINT) AS n_clicks, nxt.ts AS purchase_ts
FROM r
JOIN g nxt ON nxt.user_id = r.user_id AND nxt.pos = r.pos + r.rem
WHERE r.event_type = 'click' AND nxt.event_type = 'purchase'
  AND nxt.ts <= r.ts + INTERVAL 7 DAY
ORDER BY r.user_id, run_start
"""


def q92_cep_optional(spark: SparkSession, sf: str) -> DataFrame:
    """CEP ``optional()`` (Flink ``Pattern.begin("view").next("click")
    .optional().next("purchase")``): the optional step compiles by
    VARIANT EXPANSION — a UNION ALL of the with-click and without-click
    strict patterns, ``click_ts`` NULL on the skipped branch (both
    alternatives emit, Flink's branching semantics). The oracle is the
    same union of two independent lead-chain formulations."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .next("click").optional()
        .next("purchase")
        .within("7 days")
    )
    return (
        match_pattern(e, p, tiebreak=["event_id"])
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_2").alias("click_ts"),
            F.col("ts_3").alias("end_ts"),
        )
        .orderBy("user_id", "start_ts", "click_ts")
    )


_Q92_SQL = """
WITH e AS (
  SELECT user_id, ts,
         event_type AS t0,
         lead(event_type,1) OVER w AS t1, lead(ts,1) OVER w AS ts1,
         lead(event_type,2) OVER w AS t2, lead(ts,2) OVER w AS ts2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, ts AS start_ts, ts1 AS click_ts, ts2 AS end_ts
FROM e
WHERE t0 = 'view' AND t1 = 'click' AND t2 = 'purchase'
  AND ts2 <= ts + INTERVAL 7 DAY
UNION ALL
SELECT user_id, ts AS start_ts, CAST(NULL AS TIMESTAMP) AS click_ts,
       ts1 AS end_ts
FROM e
WHERE t0 = 'view' AND t1 = 'purchase'
  AND ts1 <= ts + INTERVAL 7 DAY
ORDER BY user_id, start_ts, click_ts
"""


def q93_cep_mixed(spark: SparkSession, sf: str) -> DataFrame:
    """MIXED contiguity (r6 — Flink's real per-step API shape):
    ``Pattern.begin("view").next("click").followed_by("purchase")`` —
    the click must be the view's IMMEDIATE successor, the purchase the
    earliest later event. Runs on the positional sequential engine
    ((key, pos) equi-join for the strict step + one struct-min window
    pass for the relaxed step); oracle = an independent positional SQL
    formulation (self-join at pos+1 + correlated min over pos)."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .next("click")
        .followed_by("purchase")
        .within("7 days")
    )
    return (
        match_pattern(e, p, tiebreak=["event_id"])
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_2").alias("click_ts"),
            F.col("ts_3").alias("end_ts"),
        )
        .orderBy("user_id", "start_ts")
    )


_Q93_SQL = """
WITH e AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS pos
  FROM events),
a AS (
  SELECT x.user_id, x.ts AS start_ts, y.ts AS click_ts, y.pos AS cpos
  FROM e x JOIN e y ON y.user_id = x.user_id AND y.pos = x.pos + 1
  WHERE x.event_type = 'view' AND y.event_type = 'click'),
b AS (
  SELECT user_id, start_ts, click_ts,
    (SELECT min(p.ts) FROM e p WHERE p.user_id = a.user_id
     AND p.event_type = 'purchase' AND p.pos > a.cpos) AS end_ts
  FROM a)
SELECT user_id, start_ts, click_ts, end_ts FROM b
WHERE end_ts IS NOT NULL AND end_ts <= start_ts + INTERVAL 7 DAY
ORDER BY user_id, start_ts
"""


def q98_count_window(spark: SparkSession, sf: str) -> DataFrame:
    """Flink ``countWindow(5)`` per user: tumbling 5-event windows in
    (ts, event_id) order, aggregated per window — one row_number pass
    (single key shuffle) + a plain groupBy."""
    from flink_note_spark.operators.windows import count_window

    e = _t(spark, sf, "events")
    win = count_window(e, key="user_id", ts="ts", size=5,
                       tiebreak="event_id")
    return (
        win.groupBy("user_id", "window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.min(epoch_us("ts")).alias("win_start_us"),
            F.max(epoch_us("ts")).alias("win_end_us"),
        )
        .orderBy("user_id", "window_id")
    )


_Q98_SQL = """
WITH w AS (
  SELECT user_id, ts, value,
         CAST((row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) - 1) // 5 AS BIGINT)
           AS window_id
  FROM events)
SELECT user_id, window_id,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       min(epoch_us(ts)) AS win_start_us,
       max(epoch_us(ts)) AS win_end_us
FROM w GROUP BY user_id, window_id
ORDER BY user_id, window_id
"""


def q99_sliding_count_window(spark: SparkSession, sf: str) -> DataFrame:
    """Flink ``countWindow(5, 2)`` per user: overlapping 5-event windows
    every 2 events — one row_number pass + a static-fanout
    sequence/explode, aggregated per window."""
    from flink_note_spark.operators.windows import sliding_count_window

    e = _t(spark, sf, "events")
    win = sliding_count_window(
        e, key="user_id", ts="ts", size=5, slide=2, tiebreak="event_id"
    )
    return (
        win.groupBy("user_id", "window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "window_id")
    )


_Q99_SQL = """
WITH w AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS pos
  FROM events),
m AS (
  SELECT user_id, value,
         unnest(range(
           greatest(CAST(0 AS BIGINT),
                    CAST(ceil((pos - 5 + 1) / 2.0) AS BIGINT)),
           (pos // 2) + 1)) AS window_id
  FROM w)
SELECT user_id, window_id,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM m GROUP BY user_id, window_id
ORDER BY user_id, window_id
"""


def q100_cep_no_skip(spark: SparkSession, sf: str) -> DataFrame:
    """CEP Flink-default NO_SKIP / non-greedy ``oneOrMore`` (r7):
    ``Pattern.begin("view").followedBy("click").oneOrMore()
    .within(Time.days(7))`` with ``AfterMatchSkipStrategy.noSkip()`` —
    every PREFIX of the click run is its own match (Flink's actual
    default, vs this engine's deterministic ``greedy``). Each joined
    loop element row IS a prefix: one ordered window pass replaces the
    greedy group-agg, so the plan shape (one key equi-join) is
    unchanged and the fan-out is the honest NO_SKIP output size."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .followed_by("click").one_or_more()
        .within("7 days")
        .skip("no_skip")
    )
    return (
        match_pattern(e, p)
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_2").alias("first_click"),
            F.col("ts_2_last").alias("last_click"),
            F.col("n_2").alias("n_clicks"),
        )
        .orderBy("user_id", "start_ts", "n_clicks")
    )


_Q100_SQL = """
WITH a AS (SELECT user_id, ts AS t0 FROM events WHERE event_type = 'view'),
p AS (
  SELECT a.user_id, a.t0, c.ts AS last_click
  FROM a JOIN events c ON c.user_id = a.user_id
    AND c.event_type = 'click' AND c.ts > a.t0
    AND c.ts <= a.t0 + INTERVAL 7 DAY)
SELECT user_id, t0 AS start_ts,
       (SELECT min(e.ts) FROM events e WHERE e.user_id = p.user_id
        AND e.event_type = 'click' AND e.ts > p.t0) AS first_click,
       last_click,
       (SELECT count(*) FROM events e WHERE e.user_id = p.user_id
        AND e.event_type = 'click' AND e.ts > p.t0
        AND e.ts <= p.last_click) AS n_clicks
FROM p
ORDER BY user_id, start_ts, n_clicks
"""


def q101_cep_skip_to_next(spark: SparkSession, sf: str) -> DataFrame:
    """CEP ``AfterMatchSkipStrategy.skipToNext()`` (r7): from the
    NO_SKIP superset of ``view -> click oneOrMore -> purchase``, only
    the FIRST-COMPLETING match per start event survives (per
    (key, start) the earliest-ending match — one declarative window
    pass in ``_apply_skip``, no sequential state). For this pattern
    that is always the 1-click prefix completed by the first purchase
    after the first click."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .followed_by("click").one_or_more()
        .followed_by("purchase")
        .within("7 days")
        .skip("skip_to_next")
    )
    return (
        match_pattern(e, p)
        .select(
            "user_id",
            F.col("ts_1").alias("start_ts"),
            F.col("ts_2").alias("first_click"),
            F.col("n_2").alias("n_clicks"),
            F.col("ts_3").alias("purchase_ts"),
        )
        .orderBy("user_id", "start_ts")
    )


_Q101_SQL = """
WITH a AS (SELECT user_id, ts AS t0 FROM events WHERE event_type = 'view'),
b AS (
  SELECT user_id, t0,
         (SELECT min(e.ts) FROM events e WHERE e.user_id = a.user_id
          AND e.event_type = 'click' AND e.ts > a.t0
          AND e.ts <= a.t0 + INTERVAL 7 DAY) AS c1
  FROM a),
c AS (
  SELECT user_id, t0, c1,
         (SELECT min(e.ts) FROM events e WHERE e.user_id = b.user_id
          AND e.event_type = 'purchase' AND e.ts > b.c1
          AND e.ts <= b.t0 + INTERVAL 7 DAY) AS p1
  FROM b WHERE c1 IS NOT NULL)
SELECT user_id, t0 AS start_ts, c1 AS first_click,
       CAST(1 AS BIGINT) AS n_clicks, p1 AS purchase_ts
FROM c WHERE p1 IS NOT NULL
ORDER BY user_id, start_ts
"""


def q102_cep_skip_past_last(spark: SparkSession, sf: str) -> DataFrame:
    """CEP ``AfterMatchSkipStrategy.skipPastLastEvent()`` (r7): two
    CONSECUTIVE clicks per user (strict ``times(2)``), overlapping
    matches pruned by the greedy first-fit chain — after a match
    emits, every match starting at or before its last event is
    skipped, so a run of k clicks yields floor(k/2) non-overlapping
    pairs. The pruning is inherently sequential per key (Flink runs it
    in the NFA): ``applyInPandas`` over each key's MATCHES (never raw
    events). The oracle is the closed form: gaps-and-islands run
    offsets with even parity."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    return (
        match_pattern(
            e, [{"type": "click", "times": 2}], contiguity="strict",
            tiebreak=["event_id"],
            skip_strategy="skip_past_last_event",
        )
        .select(
            "user_id",
            F.col("ts_1").alias("first_click"),
            F.col("ts_1_last").alias("second_click"),
        )
        .orderBy("user_id", "first_click")
    )


_Q102_SQL = """
WITH s AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos
  FROM events),
c AS (
  SELECT user_id, ts, pos,
         pos - row_number() OVER (PARTITION BY user_id ORDER BY pos) AS grp
  FROM s WHERE event_type = 'click'),
r AS (
  SELECT user_id, ts, grp,
         row_number() OVER (PARTITION BY user_id, grp ORDER BY pos) - 1
           AS off,
         count(*) OVER (PARTITION BY user_id, grp) AS runlen,
         lead(ts) OVER (PARTITION BY user_id, grp ORDER BY pos) AS ts_next
  FROM c)
SELECT user_id, ts AS first_click, ts_next AS second_click
FROM r WHERE off % 2 = 0 AND off + 1 < runlen
ORDER BY user_id, first_click
"""


def q103_temporal_join(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal / versioned table join (r7) — Flink SQL ``JOIN dim FOR
    SYSTEM_TIME AS OF fact.ts``: each user's purchases form a VERSIONED
    price dimension (a purchase's value is "the price" from its ts
    until the next purchase); every click joins the version in effect
    at its event time. ``operators/joins.py:temporal_join`` with the
    default ``union_window`` strategy: ONE shuffle on the key, a
    running last-non-null fill, no join fan-out — vs the oracle's
    native DuckDB ``ASOF JOIN`` (an independent engine feature, not a
    re-derivation)."""
    from flink_note_spark.operators.joins import temporal_join

    e = _t(spark, sf, "events")
    fact = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    dim = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("vfrom"),
        F.col("ts").alias("version_ts"),
        F.round("value", 4).alias("price"),
    )
    return (
        temporal_join(
            fact, dim, on="user_id", fact_time="click_ts",
            valid_from="vfrom", dim_cols=["version_ts", "price"],
            how="inner", strategy="union_window",
        )
        .orderBy("user_id", "click_ts")
    )


_Q103_SQL = """
SELECT f.user_id, f.ts AS click_ts,
       d.ts AS version_ts, round(d.value, 4) AS price
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') f
ASOF JOIN (SELECT user_id, ts, value FROM events
           WHERE event_type = 'purchase') d
  ON f.user_id = d.user_id AND f.ts >= d.ts
ORDER BY f.user_id, click_ts
"""


def q104_cumulate_window(spark: SparkSession, sf: str) -> DataFrame:
    """CUMULATE windows (r7) — Flink SQL's ``CUMULATE(TABLE events,
    DESCRIPTOR(ts), INTERVAL '1' DAY, INTERVAL '7' DAY)`` windowing
    TVF, which Spark has no builtin for: each 7-day span re-emits its
    cumulative count/sum at every 1-day boundary (early-fire daily
    totals of a weekly aggregate). Static fan-out ``<= size/step``
    membership explode + ONE groupBy shuffle
    (``operators/windows.py:cumulate_window``); the oracle derives the
    same memberships with integer epoch arithmetic + ``unnest(range)``
    — an independent formulation, not a re-derivation."""
    from flink_note_spark.operators.windows import cumulate_window

    e = _t(spark, sf, "events")
    return (
        cumulate_window(e, "ts", "1 day", "7 days")
        .groupBy("win_start", "win_end")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("win_start", "win_end")
    )


_Q104_SQL = """
WITH e AS (SELECT epoch_us(ts) AS tus, value FROM events),
m AS (
  SELECT tus, value,
         (tus // 604800000000) * 604800000000 AS start_us,
         unnest(range(
           ((tus - (tus // 604800000000) * 604800000000)
            // 86400000000) + 1, 8)) AS j
  FROM e)
SELECT make_timestamp(start_us) AS win_start,
       make_timestamp(start_us + j * 86400000000) AS win_end,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM m GROUP BY 1, 2
ORDER BY win_start, win_end
"""


def q105_window_join(spark: SparkSession, sf: str) -> DataFrame:
    """Flink DataStream window join (r7) — ``clicks.join(purchases)
    .where(user).equalTo(user).window(TumblingEventTimeWindows.of(
    Time.days(1)))``: rows pair when they share the user AND the same
    1-day tumbling window. One compound-key equi-join on (user,
    window) — hash/sort-merge, never a range or cross join
    (``operators/joins.py:window_join``); the oracle is the
    ``date_trunc`` equality formulation."""
    from flink_note_spark.operators.joins import window_join

    e = _t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    return (
        window_join(
            clicks, purchases, on="user_id", left_ts="click_ts",
            right_ts="purchase_ts", window="1 day",
        )
        .select(
            "user_id",
            F.col("window.start").alias("win_start"),
            "click_ts",
            "purchase_ts",
        )
        .orderBy("user_id", "click_ts", "purchase_ts")
    )


_Q105_SQL = """
SELECT f.user_id, date_trunc('day', f.ts) AS win_start,
       f.ts AS click_ts, p.ts AS purchase_ts
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') f
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON f.user_id = p.user_id
 AND date_trunc('day', f.ts) = date_trunc('day', p.ts)
ORDER BY f.user_id, click_ts, purchase_ts
"""


def q106_cep_where_predicate(spark: SparkSession, sf: str) -> DataFrame:
    """CEP ``where(SimpleCondition)`` value predicates (r7) — Flink
    ``Pattern.begin("view").followedBy("purchase").where(v -> v.value
    > 50).within(...)``: the step matches only purchases ABOVE the
    threshold, so the binding is the first HIGH-VALUE purchase after
    each view — not the first purchase (events of the right type that
    fail the predicate are skipped by relaxed contiguity, exactly
    Flink's skip-till-next). Engines match on precomputed candidate
    booleans (``_with_cand_cols``) — same plan shape, one boolean
    column per step."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .followed_by("purchase").where("value > 50")
        .within("7 days")
    )
    return (
        match_pattern(e, p)
        .select(
            "user_id",
            F.col("ts_1").alias("view_ts"),
            F.col("ts_2").alias("big_purchase_ts"),
        )
        .orderBy("user_id", "view_ts", "big_purchase_ts")
    )


_Q106_SQL = """
WITH a AS (SELECT user_id, ts AS t0 FROM events WHERE event_type = 'view'),
b AS (
  SELECT user_id, t0,
         (SELECT min(e.ts) FROM events e WHERE e.user_id = a.user_id
          AND e.event_type = 'purchase' AND e.value > 50
          AND e.ts > a.t0
          AND e.ts <= a.t0 + INTERVAL 7 DAY) AS p1
  FROM a)
SELECT user_id, t0 AS view_ts, p1 AS big_purchase_ts
FROM b WHERE p1 IS NOT NULL
ORDER BY user_id, view_ts, big_purchase_ts
"""


def q107_cep_followed_by_any(spark: SparkSession, sf: str) -> DataFrame:
    """CEP ``followedByAny`` (r7) — Flink's THIRD contiguity mode
    (non-deterministic relaxed, skip-till-ANY-match):
    ``Pattern.begin("view").followedByAny("click")
    .followedBy("purchase").within(...)`` binds EVERY click after the
    view (not just the earliest), each combination continuing
    independently to its own earliest purchase. The any-step is a key
    equi-join whose fan-out is the per-combination output size — the
    honest cost of the semantics, never a cross join."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .followed_by_any("click")
        .followed_by("purchase")
        .within("7 days")
    )
    return (
        match_pattern(e, p)
        .select(
            "user_id",
            F.col("ts_1").alias("view_ts"),
            F.col("ts_2").alias("click_ts"),
            F.col("ts_3").alias("purchase_ts"),
        )
        .orderBy("user_id", "view_ts", "click_ts")
    )


_Q107_SQL = """
WITH a AS (SELECT user_id, ts AS t0 FROM events WHERE event_type = 'view'),
b AS (
  SELECT a.user_id, a.t0, c.ts AS c1
  FROM a JOIN events c ON c.user_id = a.user_id
    AND c.event_type = 'click' AND c.ts > a.t0
    AND c.ts <= a.t0 + INTERVAL 7 DAY),
d AS (
  SELECT user_id, t0, c1,
         (SELECT min(e.ts) FROM events e WHERE e.user_id = b.user_id
          AND e.event_type = 'purchase' AND e.ts > b.c1
          AND e.ts <= b.t0 + INTERVAL 7 DAY) AS p1
  FROM b)
SELECT user_id, t0 AS view_ts, c1 AS click_ts, p1 AS purchase_ts
FROM d WHERE p1 IS NOT NULL
ORDER BY user_id, view_ts, click_ts
"""


def q108_cep_iterative_condition(spark: SparkSession, sf: str) -> DataFrame:
    """CEP IterativeCondition (r8) — Flink's general condition form:
    ``Pattern.begin("view").followedBy("purchase")
    .where(ctx -> purchase.value > ctx.getEventsForPattern("view")
    ...value)`` — the purchase step binds the earliest purchase whose
    value EXCEEDS the matched view's value (cross-step predicate,
    spelled ``"value > s1.value"``). The predicate is evaluated DURING
    binding (a qualifying-candidate key equi-join + struct-min
    group-agg — binding the earliest-of-type then filtering would be
    wrong), horizon-bounded by ``within`` as a join conjunct. The
    oracle is DuckDB's independent correlated-subquery formulation."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .followed_by("purchase").where("value > s1.value")
        .within("7 days")
    )
    return (
        match_pattern(e, p)
        .select(
            "user_id",
            F.col("ts_1").alias("view_ts"),
            F.col("ts_2").alias("upsell_ts"),
        )
        .orderBy("user_id", "view_ts", "upsell_ts")
    )


_Q108_SQL = """
WITH a AS (SELECT user_id, ts AS t0, value AS v0 FROM events
           WHERE event_type = 'view'),
b AS (
  SELECT user_id, t0,
         (SELECT min(e.ts) FROM events e WHERE e.user_id = a.user_id
          AND e.event_type = 'purchase' AND e.value > a.v0
          AND e.ts > a.t0
          AND e.ts <= a.t0 + INTERVAL 7 DAY) AS p1
  FROM a)
SELECT user_id, t0 AS view_ts, p1 AS upsell_ts
FROM b WHERE p1 IS NOT NULL
ORDER BY user_id, view_ts, upsell_ts
"""


def q109_cep_iterative_strict(spark: SparkSession, sf: str) -> DataFrame:
    """CEP IterativeCondition under STRICT contiguity (r8): a view
    whose IMMEDIATELY-NEXT event is a click with a higher value
    (``next().where("value > prev.value")``). Because strict binds
    fixed offsets, the cross-step ref compiles to lead∘lag window
    expressions — still ONE window pass, zero joins; the payload never
    leaves the scan projection."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .next("click").where("value > prev.value")
        .within("7 days")
    )
    return (
        match_pattern(e, p, tiebreak=["event_id"])
        .select(
            "user_id",
            F.col("ts_1").alias("view_ts"),
            F.col("ts_2").alias("click_ts"),
        )
        .orderBy("user_id", "view_ts", "click_ts")
    )


_Q109_SQL = """
WITH o AS (
  SELECT user_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT a.user_id, a.ts AS view_ts, b.ts AS click_ts
FROM o a JOIN o b ON b.user_id = a.user_id AND b.rn = a.rn + 1
WHERE a.event_type = 'view' AND b.event_type = 'click'
  AND b.value > a.value AND b.ts <= a.ts + INTERVAL 7 DAY
ORDER BY a.user_id, view_ts, click_ts
"""


def q110_cep_any_loop(spark: SparkSession, sf: str) -> DataFrame:
    """CEP ``followedByAny`` + ``oneOrMore`` (r8): the loop's first
    element binds ANY click after the view (skip-till-any-match), and
    each choice starts its own greedy run over its element suffix —
    ``Pattern.begin("view").followedByAny("click").oneOrMore()
    .within(...)``. Rendered as the q88 key equi-join WITHOUT the
    earliest-min collapse: one suffix-window pass over the joined
    rows (frame = elements at-or-after the run start), fan-out = one
    row per run start — the honest output size of the semantics. The
    oracle is DuckDB's independent window formulation."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    p = [
        "view",
        {"type": "click", "any": True, "one_or_more": True},
    ]
    return (
        match_pattern(e, p, within="7 days", contiguity="relaxed")
        .select(
            "user_id",
            F.col("ts_1").alias("view_ts"),
            F.col("ts_2").alias("click_first"),
            F.col("ts_2_last").alias("click_last"),
            F.col("n_2").alias("n_clicks"),
        )
        .orderBy("user_id", "view_ts", "click_first")
    )


_Q110_SQL = """
WITH a AS (SELECT user_id, ts AS t0 FROM events WHERE event_type = 'view'),
j AS (
  SELECT a.user_id, a.t0, c.ts AS c1
  FROM a JOIN events c ON c.user_id = a.user_id
    AND c.event_type = 'click' AND c.ts > a.t0
    AND c.ts <= a.t0 + INTERVAL 7 DAY),
r AS (
  SELECT user_id, t0, c1,
         max(c1) OVER w AS clast,
         CAST(count(*) OVER w AS BIGINT) AS n
  FROM j WINDOW w AS (PARTITION BY user_id, t0 ORDER BY c1 DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, t0 AS view_ts, c1 AS click_first, clast AS click_last,
       n AS n_clicks
FROM r
ORDER BY user_id, view_ts, click_first
"""


def q111_cep_iterative_loop(spark: SparkSession, sf: str) -> DataFrame:
    """CEP IterativeCondition ON a oneOrMore loop (r8 phase 2): the
    loop takes exactly the clicks whose value exceeds the matched
    view's — ``Pattern.begin("view").followedBy("click").oneOrMore()
    .where(c -> c.value > view.value).within(...)`` (non-qualifying
    clicks are skipped by relaxed internal contiguity, Flink's
    behaviour). The predicate is one residual conjunct on the SAME
    element equi-join the plain loop uses (q88's shape) — no extra
    shuffle; the oracle is DuckDB's filtered correlated aggregate."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    p = [
        "view",
        {"type": "click", "one_or_more": True,
         "where": "value > s1.value"},
    ]
    return (
        match_pattern(e, p, within="7 days", contiguity="relaxed")
        .select(
            "user_id",
            F.col("ts_1").alias("view_ts"),
            F.col("ts_2").alias("click_first"),
            F.col("ts_2_last").alias("click_last"),
            F.col("n_2").alias("n_clicks"),
        )
        .orderBy("user_id", "view_ts", "click_first")
    )


_Q111_SQL = """
WITH a AS (SELECT user_id, ts AS t0, value AS v0 FROM events
           WHERE event_type = 'view'),
r AS (
  SELECT a.user_id, a.t0,
         min(c.ts) AS c_first, max(c.ts) AS c_last,
         CAST(count(*) AS BIGINT) AS n_c
  FROM a JOIN events c ON c.user_id = a.user_id
    AND c.event_type = 'click' AND c.ts > a.t0
    AND c.ts <= a.t0 + INTERVAL 7 DAY AND c.value > a.v0
  GROUP BY a.user_id, a.t0)
SELECT user_id, t0 AS view_ts, c_first AS click_first,
       c_last AS click_last, n_c AS n_clicks
FROM r
ORDER BY user_id, view_ts, click_first
"""


def q112_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Flink DataStream ``intervalJoin`` (r8) —
    ``views.keyBy(user).intervalJoin(clicks.keyBy(user))
    .between(Time.minutes(5), Time.hours(2))``: per user, every click
    landing in the window ``[view_ts + 5 min, view_ts + 2 h]`` (both
    bounds inclusive, Flink's default). The equi key keeps the plan a
    hash join with the interval as residual conjuncts — never a
    cartesian (``operators/joins.interval_join``)."""
    from flink_note_spark.operators.joins import interval_join

    e = _t(spark, sf, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return (
        interval_join(
            views, clicks, on="user_id",
            left_time="view_ts", right_time="click_ts",
            lower="5 minutes", upper="2 hours",
        )
        .orderBy("user_id", "view_ts", "click_ts")
    )


_Q112_SQL = """
SELECT v.user_id AS user_id, v.ts AS view_ts, c.ts AS click_ts
FROM events v JOIN events c ON c.user_id = v.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts + INTERVAL 5 MINUTE
 AND c.ts <= v.ts + INTERVAL 2 HOUR
ORDER BY v.user_id, view_ts, click_ts
"""


def q113_cep_timeouts(spark: SparkSession, sf: str) -> DataFrame:
    """CEP timed-out partial matches (r8) — Flink's
    ``PatternTimeoutFunction`` side output, the ABANDONED-FUNNEL
    query: every view whose view→click→purchase chain fails inside
    the 7-day window, with the prefix bound so far and the step that
    starved. Partition invariant: timeouts + full matches (q69's
    shape) cover every anchor exactly once (pytest-pinned)."""
    from flink_note_spark.operators.cep import (
        Pattern,
        match_pattern_timeouts,
    )

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .within("7 days")
    )
    return (
        match_pattern_timeouts(e, p)
        .select(
            "user_id",
            F.col("ts_1").alias("view_ts"),
            F.col("ts_2").alias("click_ts"),
            F.col("ts_3").alias("purchase_ts"),
            "timeout_step",
        )
        .orderBy("user_id", "view_ts", "timeout_step")
    )


_Q113_SQL = """
WITH a AS (SELECT user_id, ts AS t0 FROM events WHERE event_type = 'view'),
b AS (SELECT user_id, t0,
        (SELECT min(c.ts) FROM events c WHERE c.user_id = a.user_id
         AND c.event_type = 'click'
         AND c.ts > a.t0 AND c.ts <= a.t0 + INTERVAL 7 DAY) AS c1
      FROM a),
c AS (SELECT user_id, t0, c1,
        CASE WHEN c1 IS NULL THEN NULL ELSE
          (SELECT min(p.ts) FROM events p WHERE p.user_id = b.user_id
           AND p.event_type = 'purchase'
           AND p.ts > b.c1 AND p.ts <= b.t0 + INTERVAL 7 DAY) END AS p1
      FROM b)
SELECT user_id, t0 AS view_ts, c1 AS click_ts,
       NULL::TIMESTAMP AS purchase_ts,
       CASE WHEN c1 IS NULL THEN 2 ELSE 3 END AS timeout_step
FROM c WHERE c1 IS NULL OR p1 IS NULL
ORDER BY user_id, view_ts, timeout_step
"""


def q114_match_recognize(spark: SparkSession, sf: str) -> DataFrame:
    """Flink SQL ``MATCH_RECOGNIZE`` (r8) — the classic V-shape price
    query from the Flink docs, compiled onto the CEP engine
    (``operators/match_recognize.py``): per user, a high row
    (``STRT``: value >= 100) followed immediately by a maximal run of
    low rows (``DOWN+``: value < 80) then a spike (``UP``: value >=
    150), all inside 7 days. Greedy quantifier binding (the standard's
    semantics, exact here since the defines are disjoint), AFTER MATCH
    SKIP TO NEXT ROW — one row per anchor. ``start_val``/``up_val``
    exercise the payload-measure attach path (one co-partitioned
    (key, time) equi-join each)."""
    from flink_note_spark.operators.match_recognize import (
        match_recognize,
    )

    e = _t(spark, sf, "events")
    return (
        match_recognize(
            e.select("user_id", "ts", "value", "event_id"),
            partition_by="user_id",
            order_by="ts",
            pattern="STRT DOWN+ UP",
            define={
                "STRT": "value >= 100",
                "DOWN": "value < 80",
                "UP": "value >= 150",
            },
            measures={
                "start_ts": "STRT.ts",
                "start_val": "STRT.value",
                "n_down": "COUNT(DOWN.*)",
                "bottom_ts": "LAST(DOWN.ts)",
                "up_ts": "UP.ts",
                "up_val": "UP.value",
            },
            after_match="skip to next row",
            within="7 days",
            tiebreak=["event_id"],
        )
        .orderBy("user_id", "start_ts")
    )


_Q114_SQL = """
WITH e AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER w AS pos,
         (value < 80) AS dn,
         CASE WHEN lag(value < 80) OVER w IS DISTINCT FROM (value < 80)
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY pos) AS grp
      FROM e),
r AS (SELECT *,
        count(*) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem,
        max(ts) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS runlast
      FROM g)
SELECT a.user_id, a.ts AS start_ts, a.value AS start_val,
       CAST(d.rem AS BIGINT) AS n_down, d.runlast AS bottom_ts,
       u.ts AS up_ts, u.value AS up_val
FROM g a
JOIN r d ON d.user_id = a.user_id AND d.pos = a.pos + 1 AND d.dn
JOIN g u ON u.user_id = a.user_id AND u.pos = a.pos + 1 + d.rem
WHERE a.value >= 100 AND u.value >= 150
  AND u.ts <= a.ts + INTERVAL 7 DAY
ORDER BY a.user_id, start_ts
"""


def q156_match_recognize_sql(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-string ``MATCH_RECOGNIZE`` through the Table facade (r12 —
    VERDICT r11 #2): the SAME V-shape row-pattern query as q114, but
    written the way a Flink SQL user writes it — one SQL string handed
    to ``TableEnvironment.execute_sql`` — exercising the clause parser
    (``operators/match_recognize.py:parse_match_recognize_sql``), the
    FROM-segment rewrite (``table.py:_route_match_recognize``), and the
    outer-query passthrough (the trailing ORDER BY runs in Catalyst
    over the routed view). Shares q114's oracle: the two surfaces must
    be value-identical."""
    from flink_note_spark.table import TableEnvironment

    tenv = TableEnvironment(spark)
    tenv.create_temporary_view(
        "__q156_events",
        _t(spark, sf, "events").select("user_id", "ts", "value", "event_id"),
    )
    return tenv.execute_sql(
        """
        SELECT * FROM __q156_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES
            STRT.ts AS start_ts,
            STRT.value AS start_val,
            COUNT(DOWN.*) AS n_down,
            LAST(DOWN.ts) AS bottom_ts,
            UP.ts AS up_ts,
            UP.value AS up_val
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (STRT DOWN+ UP)
          WITHIN INTERVAL '7' DAY
          DEFINE
            STRT AS STRT.value >= 100,
            DOWN AS DOWN.value < 80,
            UP AS UP.value >= 150
        ) ORDER BY user_id, start_ts
        """
    ).to_data_frame()


def q157_cep_group_one_or_more(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP one_or_more (r12 — VERDICT r11 #5, the last CEP refusal
    closed): ``(view next click).oneOrMore().within(7 days)`` — the
    repetition bound comes from the DATA (densest within-window), the
    result is the union over counts in the COLLAPSED geometry
    (first/last iteration + count per inner step; schema independent
    of the bound). Oracle: a recursive CTE extending adjacent
    (view, click) position-pairs two steps at a time while the span
    stays inside the horizon — every (start, k) emits one row, exactly
    the union convention."""
    from flink_note_spark.operators.cep import match_pattern

    e = _t(spark, sf, "events")
    g = [{
        "group": [
            {"type": "view"}, {"type": "click", "mode": "strict"},
        ],
        "loop": True, "mode": "strict",
    }]
    return (
        match_pattern(
            e, g, within="7 days", contiguity="strict",
            tiebreak=["event_id"],
        )
        .select(
            "user_id",
            F.col("ts_1").alias("first_view"),
            F.col("ts_1_last").alias("last_view"),
            F.col("ts_2").alias("first_click"),
            F.col("ts_2_last").alias("last_click"),
            F.col("n_1").alias("n_pairs"),
        )
        .orderBy("user_id", "first_view", "n_pairs")
    )


_Q157_SQL = """
WITH RECURSIVE e AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS pos
  FROM events),
p AS (
  SELECT a.user_id, a.pos, a.ts AS vts, b.ts AS cts
  FROM e a
  JOIN e b ON b.user_id = a.user_id AND b.pos = a.pos + 1
  WHERE a.event_type = 'view' AND b.event_type = 'click'),
r AS (
  SELECT user_id, pos AS cur_pos, 1 AS k,
         vts AS first_view, cts AS first_click,
         vts AS last_view, cts AS last_click
  FROM p
  WHERE cts <= vts + INTERVAL 7 DAY
  UNION ALL
  SELECT r.user_id, q.pos, r.k + 1,
         r.first_view, r.first_click, q.vts, q.cts
  FROM r
  JOIN p q ON q.user_id = r.user_id AND q.pos = r.cur_pos + 2
  WHERE q.cts <= r.first_view + INTERVAL 7 DAY)
SELECT user_id, first_view, last_view, first_click, last_click,
       CAST(k AS BIGINT) AS n_pairs
FROM r
ORDER BY user_id, first_view, n_pairs
"""


def q115_window_top_n(spark: SparkSession, sf: str) -> DataFrame:
    """Flink SQL **Window Top-N** (r8): the top-3 events by value per
    (daily tumbling window, event_type) — the windowing-TVF +
    ``ROW_NUMBER() <= 3`` idiom
    (``operators/windows.window_top_n``). One shuffle on (window,
    type); the streaming twin emits identical finals at watermark
    close (pytest-pinned)."""
    from flink_note_spark.operators.windows import window_top_n

    e = _t(spark, sf, "events")
    return (
        window_top_n(
            e, "ts", "1 day",
            [F.col("value").desc(), F.col("event_id").asc()],
            n=3, partition_cols=["event_type"],
        )
        .select(
            fmt_date(F.col("win.start"), "day"),
            "event_type",
            "rn",
            "event_id",
            "value",
        )
        .orderBy("day", "event_type", "rn")
    )


_Q115_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type, rn, event_id, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY date_trunc('day', ts), event_type
      ORDER BY value DESC, event_id) AS rn
  FROM events)
WHERE rn <= 3
ORDER BY day, event_type, rn
"""


def q116_window_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Flink SQL **Window Deduplication** (r8): the LAST event per
    (user, daily tumbling window) by event time — the windowing-TVF +
    ``ROW_NUMBER() = 1 ORDER BY ts DESC`` idiom
    (``operators/windows.window_dedup``). Complements q26 (unwindowed
    keep-first dedup); the streaming twin keeps O(1) state per live
    (user, window) and emits identical finals (pytest-pinned)."""
    from flink_note_spark.operators.windows import window_dedup

    e = _t(spark, sf, "events")
    return (
        window_dedup(
            e, "ts", "1 day", ["user_id"], keep="last",
            tiebreak=["event_id"],
        )
        .select(
            fmt_date(F.col("win.start"), "day"),
            "user_id",
            "event_id",
            epoch_us("ts", "last_ts_us"),
            "value",
        )
        .orderBy("day", "user_id")
    )


_Q116_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       user_id, event_id, epoch_us(ts) AS last_ts_us, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY date_trunc('day', ts), user_id
      ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
ORDER BY day, user_id
"""


def q127_mr_aggregate_measures(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE AGGREGATE measures (r10 — Flink SQL's
    ``SUM/AVG/MIN/MAX(V.col)`` with FINAL semantics): the q114 V-shape
    with the DOWN run's value SUMMED/AVERAGED/bounded. Under strict
    adjacency the run is exactly the events in ``[ts_2, ts_2_last]``,
    so ALL FOUR aggregates ride ONE co-partitioned time-range join +
    group-agg (per aggregated variable, not per measure); the oracle
    replays it as a positional-range LATERAL aggregate over the same
    gaps-and-islands frame q114 uses. Scale: one keyed join bounded by
    run length — no cartesian, no driver collect."""
    from flink_note_spark.operators.match_recognize import (
        match_recognize,
    )

    e = _t(spark, sf, "events")
    m = match_recognize(
        e.select("user_id", "ts", "value", "event_id"),
        partition_by="user_id",
        order_by="ts",
        pattern="STRT DOWN+ UP",
        define={
            "STRT": "value >= 100",
            "DOWN": "value < 80",
            "UP": "value >= 150",
        },
        measures={
            "start_ts": "STRT.ts",
            "n_down": "COUNT(DOWN.*)",
            "sum_down": "SUM(DOWN.value)",
            "min_down": "MIN(DOWN.value)",
            "max_down": "MAX(DOWN.value)",
            "up_ts": "UP.ts",
        },
        after_match="skip to next row",
        within="7 days",
        tiebreak=["event_id"],
    )
    # avg derives from the ROUNDED sum so both engines evaluate the
    # identical arithmetic (a raw double avg can straddle a rounding
    # boundary depending on summation order — measured at sf0.01)
    return (
        m.withColumn("sum_down", F.round("sum_down", 4))
        .select(
            "user_id", "start_ts", "n_down",
            "sum_down",
            F.round(F.col("sum_down") / F.col("n_down"), 4)
            .alias("avg_down"),
            "min_down", "max_down", "up_ts",
        )
        .orderBy("user_id", "start_ts")
    )


_Q127_SQL = """
WITH e AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER w AS pos,
         (value < 80) AS dn,
         CASE WHEN lag(value < 80) OVER w IS DISTINCT FROM (value < 80)
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY pos) AS grp
      FROM e),
r AS (SELECT *,
        count(*) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem
      FROM g)
SELECT a.user_id, a.ts AS start_ts,
       CAST(d.rem AS BIGINT) AS n_down,
       round(s.sd, 4) AS sum_down,
       round(round(s.sd, 4) / d.rem, 4) AS avg_down,
       s.mnd AS min_down, s.mxd AS max_down,
       u.ts AS up_ts
FROM g a
JOIN r d ON d.user_id = a.user_id AND d.pos = a.pos + 1 AND d.dn
JOIN g u ON u.user_id = a.user_id AND u.pos = a.pos + 1 + d.rem
JOIN LATERAL (
  SELECT sum(m.value) AS sd, avg(m.value) AS ad,
         min(m.value) AS mnd, max(m.value) AS mxd
  FROM g m
  WHERE m.user_id = a.user_id
    AND m.pos BETWEEN a.pos + 1 AND a.pos + d.rem
) s ON true
WHERE a.value >= 100 AND u.value >= 150
  AND u.ts <= a.ts + INTERVAL 7 DAY
ORDER BY a.user_id, start_ts
"""


def q128_mr_prev_navigation(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE ``PREV`` row navigation (late-r10 — the
    Flink-docs canonical V-shape written the Flink way): ``DOWN AS
    DOWN.value < PREV(DOWN.value)`` — a maximal strictly-falling run
    — then ``UP AS UP.value > PREV(UP.value)``. Under strict
    row-pattern contiguity PREV is a PHYSICAL partition offset, so it
    compiles to ONE lag window column at scan (the same
    (user, ts) sort the match engines reuse — zero extra shuffle at
    any scale) and every engine sees a plain column; the falling/
    rising DEFINEs are mutually exclusive, so greedy binding is
    structurally exact. ``MIN(DOWN.value)`` rides the r10 aggregate
    path on top. Oracle: lag direction flags → gaps-and-islands runs
    → positional joins."""
    from flink_note_spark.operators.match_recognize import (
        match_recognize,
    )

    e = _t(spark, sf, "events")
    return (
        match_recognize(
            e.select("user_id", "ts", "value", "event_id"),
            partition_by="user_id",
            order_by="ts",
            pattern="STRT DOWN+ UP",
            define={
                "DOWN": "DOWN.value < PREV(DOWN.value)",
                "UP": "UP.value > PREV(UP.value)",
            },
            measures={
                "start_ts": "STRT.ts",
                "n_down": "COUNT(DOWN.*)",
                "bottom": "MIN(DOWN.value)",
                "up_ts": "UP.ts",
                "up_val": "UP.value",
            },
            after_match="skip to next row",
            within="7 days",
            tiebreak=["event_id"],
        )
        .orderBy("user_id", "start_ts")
    )


_Q128_SQL = """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, value, event_id,
         row_number() OVER w AS pos,
         COALESCE(value < lag(value) OVER w, FALSE) AS dn,
         COALESCE(value > lag(value) OVER w, FALSE) AS up
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
e2 AS (SELECT *,
         lag(dn) OVER (PARTITION BY user_id ORDER BY pos) AS prev_dn
       FROM e),
g AS (SELECT *,
        sum(CASE WHEN prev_dn IS DISTINCT FROM dn THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY pos) AS grp
      FROM e2),
r AS (SELECT *,
        count(*) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem,
        min(value) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS runmin
      FROM g)
SELECT a.user_id, a.ts AS start_ts,
       CAST(d.rem AS BIGINT) AS n_down,
       d.runmin AS bottom,
       u.ts AS up_ts, u.value AS up_val
FROM r d
JOIN g a ON a.user_id = d.user_id AND a.pos = d.pos - 1
JOIN g u ON u.user_id = d.user_id AND u.pos = d.pos + d.rem
WHERE d.dn AND u.up AND u.ts <= a.ts + INTERVAL 7 DAY
ORDER BY a.user_id, start_ts
"""


def q129_mr_all_rows_per_match(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE ``ALL ROWS PER MATCH`` + ``CLASSIFIER()`` +
    ``MATCH_NUMBER()`` (late-r10 — EXCEEDS Flink, which refuses ALL
    ROWS in streaming mode): the q114 V-shape re-emitted one row per
    MATCHED EVENT with its input columns, the variable that bound it,
    and the per-partition match number. One co-partitioned (key,
    time-range) join of events against the matches frame — under
    strict adjacency a match's rows are exactly the events in
    [start, end] — plus one window pass over MATCHES for the
    numbering; no shuffle beyond the keyed join at any scale.
    Oracle: the q114 islands frame joined back positionally, rows
    classified by position within the run."""
    from flink_note_spark.operators.match_recognize import (
        match_recognize,
    )

    e = _t(spark, sf, "events")
    return (
        match_recognize(
            e.select("user_id", "ts", "value", "event_id"),
            partition_by="user_id",
            order_by="ts",
            pattern="STRT DOWN+ UP",
            define={
                "STRT": "value >= 100",
                "DOWN": "value < 80",
                "UP": "value >= 150",
            },
            measures={
                "mn": "MATCH_NUMBER()",
                "cls": "CLASSIFIER()",
                "start_ts": "STRT.ts",
                "n_down": "COUNT(DOWN.*)",
            },
            after_match="skip to next row",
            within="7 days",
            tiebreak=["event_id"],
            rows_per_match="all rows per match",
        )
        .orderBy("user_id", "start_ts", "ts")
    )


_Q129_SQL = """
WITH e AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER w AS pos,
         (value < 80) AS dn,
         CASE WHEN lag(value < 80) OVER w IS DISTINCT FROM (value < 80)
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY pos) AS grp
      FROM e),
r AS (SELECT *,
        count(*) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem
      FROM g),
m AS (
  SELECT a.user_id, a.pos AS apos, a.ts AS start_ts, d.rem AS rem
  FROM g a
  JOIN r d ON d.user_id = a.user_id AND d.pos = a.pos + 1 AND d.dn
  JOIN g u ON u.user_id = a.user_id AND u.pos = a.pos + 1 + d.rem
  WHERE a.value >= 100 AND u.value >= 150
    AND u.ts <= a.ts + INTERVAL 7 DAY),
n AS (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY start_ts) AS mn
      FROM m)
SELECT x.user_id, x.ts, x.value, x.event_id,
       CAST(n.mn AS BIGINT) AS mn,
       CASE WHEN x.pos = n.apos THEN 'STRT'
            WHEN x.pos <= n.apos + n.rem THEN 'DOWN'
            ELSE 'UP' END AS cls,
       n.start_ts,
       CAST(n.rem AS BIGINT) AS n_down
FROM n
JOIN g x ON x.user_id = n.user_id
        AND x.pos BETWEEN n.apos AND n.apos + 1 + n.rem
ORDER BY x.user_id, n.start_ts, x.ts
"""


def q123_cep_relaxed_payload(spark: SparkSession, sf: str) -> DataFrame:
    """Relaxed CEP funnel with ZERO-JOIN payload measures (r10 —
    VERDICT r9 #3): ``view → click+ (greedy) → purchase`` within 7
    days, reporting the view's value, the click run's first/last
    values, and the purchase's value. ``carry_payload`` rides the
    matched events' payloads inside the engine's existing aggregates
    (anchor projection, the loop's struct-min/struct-max, the
    purchase bind's running struct-min) — the ONLY join in the plan
    is the loop's element join itself (plan-asserted in
    tests/test_plans.py); the r9 design paid one extra
    co-partitioned attach join per measured step.

    Tie policy at equal timestamps (documented, mirrored in the
    oracle): first-element payload is the MINIMUM value among the
    tied rows (struct-min), last-element and bind payloads the
    struct's min/max counterpart. Scale: one keyed element join
    bounded by the ``within`` horizon + two window passes — no
    cartesian, no driver collect."""
    from flink_note_spark.operators.cep import Pattern, match_pattern

    e = _t(spark, sf, "events")
    p = (
        Pattern.begin("view")
        .followed_by("click").one_or_more()
        .followed_by("purchase")
        .within("7 days")
    )
    m = match_pattern(
        e, p,
        carry_payload={
            "ts_1": ["event_id", "value"],
            "ts_2": ["value"],
            "ts_2_last": ["value"],
            "ts_3": ["value"],
        },
    )
    return (
        m.select(
            "user_id",
            F.col("ts_1_event_id").alias("view_event_id"),
            F.col("ts_1").alias("view_ts"),
            F.col("ts_1_value").alias("view_val"),
            F.col("n_2").alias("n_clicks"),
            F.col("ts_2").alias("first_click_ts"),
            F.col("ts_2_value").alias("first_click_val"),
            F.col("ts_2_last").alias("last_click_ts"),
            F.col("ts_2_last_value").alias("last_click_val"),
            F.col("ts_3").alias("purchase_ts"),
            F.col("ts_3_value").alias("purchase_val"),
        )
        .orderBy("user_id", "view_event_id", "purchase_ts")
    )


_Q123_SQL = """
WITH v AS (
  SELECT user_id, event_id AS vid, ts AS t0, value AS v0
  FROM events WHERE event_type = 'view'),
c AS (
  SELECT v.user_id, v.vid, v.t0, v.v0,
         count(*) AS nc, min(e.ts) AS cf, max(e.ts) AS cl
  FROM v JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'click'
   AND e.ts > v.t0 AND e.ts <= v.t0 + INTERVAL 7 DAY
  GROUP BY v.user_id, v.vid, v.t0, v.v0),
p AS (
  SELECT c.*,
         (SELECT min(e.ts) FROM events e
          WHERE e.user_id = c.user_id AND e.event_type = 'purchase'
            AND e.ts > c.cl AND e.ts <= c.t0 + INTERVAL 7 DAY) AS pt
  FROM c)
SELECT user_id, vid AS view_event_id, t0 AS view_ts, v0 AS view_val,
       nc AS n_clicks,
       cf AS first_click_ts,
       (SELECT min(e.value) FROM events e
        WHERE e.user_id = p.user_id AND e.event_type = 'click'
          AND e.ts = p.cf) AS first_click_val,
       cl AS last_click_ts,
       (SELECT max(e.value) FROM events e
        WHERE e.user_id = p.user_id AND e.event_type = 'click'
          AND e.ts = p.cl) AS last_click_val,
       pt AS purchase_ts,
       (SELECT min(e.value) FROM events e
        WHERE e.user_id = p.user_id AND e.event_type = 'purchase'
          AND e.ts = p.pt) AS purchase_val
FROM p WHERE pt IS NOT NULL
ORDER BY user_id, view_event_id, purchase_ts
"""


def q138_mr_subset(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE ``SUBSET`` clause (r10 — union variables in
    MEASURES, the last piece of the Flink MR measure surface):
    ``SUBSET U = (DOWN, UP)`` on the q114 V-shape, with COUNT/SUM/
    MIN/MAX/FIRST/LAST over the union. The engine decomposes each
    subset measure into per-member primitives plus a stateless
    post-projection combine (`operators/match_recognize.py:
    _expand_subset_measures`) — so every engine path, including
    streaming, inherits it at zero extra plan cost beyond the member
    measures themselves. AVG derives from the ROUNDED sum (the q127
    float-determinism doctrine). Oracle: the same gaps-and-islands
    frame with the LATERAL aggregate widened one row to include UP."""
    from flink_note_spark.operators.match_recognize import (
        match_recognize,
    )

    e = _t(spark, sf, "events")
    m = match_recognize(
        e.select("user_id", "ts", "value", "event_id"),
        partition_by="user_id",
        order_by="ts",
        pattern="STRT DOWN+ UP",
        define={
            "STRT": "value >= 100",
            "DOWN": "value < 80",
            "UP": "value >= 150",
        },
        measures={
            "start_ts": "STRT.ts",
            "n_u": "COUNT(U.*)",
            "sum_u": "SUM(U.value)",
            "min_u": "MIN(U.value)",
            "max_u": "MAX(U.value)",
            "first_u_ts": "FIRST(U.ts)",
            "last_u_ts": "LAST(U.ts)",
        },
        subset={"U": ("DOWN", "UP")},
        after_match="skip to next row",
        within="7 days",
        tiebreak=["event_id"],
    )
    return (
        m.withColumn("sum_u", F.round("sum_u", 4))
        .select(
            "user_id", "start_ts", "n_u", "sum_u",
            # NO second round: round(sum,4) is the same double in
            # both engines, and n_u is an exact int — the division is
            # bit-identical, while re-rounding can straddle a .5 ulp
            (F.col("sum_u") / F.col("n_u")).alias("avg_u"),
            "min_u", "max_u", "first_u_ts", "last_u_ts",
        )
        .orderBy("user_id", "start_ts")
    )


_Q138_SQL = """
WITH e AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER w AS pos,
         (value < 80) AS dn,
         CASE WHEN lag(value < 80) OVER w IS DISTINCT FROM (value < 80)
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY pos) AS grp
      FROM e),
r AS (SELECT *,
        count(*) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem
      FROM g)
SELECT a.user_id, a.ts AS start_ts,
       CAST(d.rem + 1 AS BIGINT) AS n_u,
       round(s.su, 4) AS sum_u,
       round(s.su, 4) / (d.rem + 1) AS avg_u,
       s.mnu AS min_u, s.mxu AS max_u,
       d.ts AS first_u_ts, u.ts AS last_u_ts
FROM g a
JOIN r d ON d.user_id = a.user_id AND d.pos = a.pos + 1 AND d.dn
JOIN g u ON u.user_id = a.user_id AND u.pos = a.pos + 1 + d.rem
JOIN LATERAL (
  SELECT sum(m.value) AS su, min(m.value) AS mnu, max(m.value) AS mxu
  FROM g m
  WHERE m.user_id = a.user_id
    AND m.pos BETWEEN a.pos + 1 AND a.pos + 1 + d.rem
) s ON true
WHERE a.value >= 100 AND u.value >= 150
  AND u.ts <= a.ts + INTERVAL 7 DAY
ORDER BY a.user_id, start_ts
"""


def q142_mr_running_measures(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH_RECOGNIZE RUNNING measure semantics (r10 — the standard's
    per-row prefix aggregates in ALL ROWS PER MATCH, previously a
    documented FINAL-only deviation): the q129 V-shape with RUNNING
    SUM/COUNT over the DOWN run next to the FINAL count. One extra
    window pass over the JOINED all-rows frame (partitioned by the
    per-match constants — matches, never raw events, so it scales with
    output size). Oracle: the q129 islands replay with the same
    prefix-window aggregates over position."""
    from flink_note_spark.operators.match_recognize import (
        match_recognize,
    )

    e = _t(spark, sf, "events")
    out = match_recognize(
        e.select("user_id", "ts", "value", "event_id"),
        partition_by="user_id",
        order_by="ts",
        pattern="STRT DOWN+ UP",
        define={
            "STRT": "value >= 100",
            "DOWN": "value < 80",
            "UP": "value >= 150",
        },
        measures={
            "cls": "CLASSIFIER()",
            "start_ts": "STRT.ts",
            "run_sum": "RUNNING SUM(DOWN.value)",
            "run_n": "RUNNING COUNT(DOWN.*)",
            "n_down": "COUNT(DOWN.*)",
        },
        after_match="skip to next row",
        within="7 days",
        tiebreak=["event_id"],
        rows_per_match="all rows per match",
    )
    return out.withColumn("run_sum", F.round("run_sum", 4)).orderBy(
        "user_id", "start_ts", "ts"
    )


_Q142_SQL = """
WITH e AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER w AS pos,
         (value < 80) AS dn,
         CASE WHEN lag(value < 80) OVER w IS DISTINCT FROM (value < 80)
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY pos) AS grp
      FROM e),
r AS (SELECT *,
        count(*) OVER (PARTITION BY user_id, grp ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem
      FROM g),
m AS (
  SELECT a.user_id, a.pos AS apos, a.ts AS start_ts, d.rem AS rem
  FROM g a
  JOIN r d ON d.user_id = a.user_id AND d.pos = a.pos + 1 AND d.dn
  JOIN g u ON u.user_id = a.user_id AND u.pos = a.pos + 1 + d.rem
  WHERE a.value >= 100 AND u.value >= 150
    AND u.ts <= a.ts + INTERVAL 7 DAY)
SELECT user_id, ts, value, event_id, cls, start_ts,
       round(run_sum, 4) AS run_sum, run_n, n_down
FROM (
  SELECT x.user_id, x.ts, x.value, x.event_id,
         CASE WHEN x.pos = m.apos THEN 'STRT'
              WHEN x.pos <= m.apos + m.rem THEN 'DOWN'
              ELSE 'UP' END AS cls,
         m.start_ts,
         sum(CASE WHEN x.pos > m.apos AND x.pos <= m.apos + m.rem
                  THEN x.value END)
           OVER (PARTITION BY x.user_id, m.apos ORDER BY x.pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_sum,
         CAST(count(CASE WHEN x.pos > m.apos
                         AND x.pos <= m.apos + m.rem THEN 1 END)
           OVER (PARTITION BY x.user_id, m.apos ORDER BY x.pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS run_n,
         CAST(m.rem AS BIGINT) AS n_down
  FROM m
  JOIN g x ON x.user_id = m.user_id
          AND x.pos BETWEEN m.apos AND m.apos + m.rem + 1
)
ORDER BY user_id, start_ts, ts
"""


QUERIES = {
    "q22_json_extract": q22_json_extract,
    "q59_side_output_routing": q59_side_output_routing,
    "q23_tumbling_window": q23_tumbling_window,
    "q24_sliding_window": q24_sliding_window,
    "q25_sessionize": q25_sessionize,
    "q26_dedup_first_event": q26_dedup_first_event,
    "q27_asof_join": q27_asof_join,
    "q28_event_funnel": q28_event_funnel,
    "q68_event_pattern": q68_event_pattern,
    "q69_event_pattern_relaxed": q69_event_pattern_relaxed,
    "q153_cep_group_exact": q153_cep_group_exact,
    "q154_cep_group_range": q154_cep_group_range,
    "q86_cep_times": q86_cep_times,
    "q87_cep_negation": q87_cep_negation,
    "q88_cep_one_or_more": q88_cep_one_or_more,
    "q89_cep_strict_run": q89_cep_strict_run,
    "q92_cep_optional": q92_cep_optional,
    "q93_cep_mixed": q93_cep_mixed,
    "q98_count_window": q98_count_window,
    "q99_sliding_count_window": q99_sliding_count_window,
    "q100_cep_no_skip": q100_cep_no_skip,
    "q101_cep_skip_to_next": q101_cep_skip_to_next,
    "q102_cep_skip_past_last": q102_cep_skip_past_last,
    "q103_temporal_join": q103_temporal_join,
    "q104_cumulate_window": q104_cumulate_window,
    "q105_window_join": q105_window_join,
    "q106_cep_where_predicate": q106_cep_where_predicate,
    "q107_cep_followed_by_any": q107_cep_followed_by_any,
    "q108_cep_iterative_condition": q108_cep_iterative_condition,
    "q109_cep_iterative_strict": q109_cep_iterative_strict,
    "q110_cep_any_loop": q110_cep_any_loop,
    "q111_cep_iterative_loop": q111_cep_iterative_loop,
    "q112_interval_join": q112_interval_join,
    "q113_cep_timeouts": q113_cep_timeouts,
    "q114_match_recognize": q114_match_recognize,
    "q156_match_recognize_sql": q156_match_recognize_sql,
    "q157_cep_group_one_or_more": q157_cep_group_one_or_more,
    "q115_window_top_n": q115_window_top_n,
    "q116_window_dedup": q116_window_dedup,
    "q123_cep_relaxed_payload": q123_cep_relaxed_payload,
    "q127_mr_aggregate_measures": q127_mr_aggregate_measures,
    "q128_mr_prev_navigation": q128_mr_prev_navigation,
    "q138_mr_subset": q138_mr_subset,
    "q142_mr_running_measures": q142_mr_running_measures,
    "q129_mr_all_rows_per_match": q129_mr_all_rows_per_match,
}

ORACLES = {
    "q22_json_extract": _Q22_SQL,
    "q59_side_output_routing": _Q59_SQL,
    "q23_tumbling_window": _Q23_SQL,
    "q24_sliding_window": _Q24_SQL,
    "q25_sessionize": _Q25_SQL,
    "q26_dedup_first_event": _Q26_SQL,
    "q27_asof_join": _Q27_SQL,
    "q28_event_funnel": _Q28_SQL,
    "q68_event_pattern": _Q68_SQL,
    "q69_event_pattern_relaxed": _Q69_SQL,
    "q86_cep_times": _Q86_SQL,
    "q87_cep_negation": _Q87_SQL,
    "q88_cep_one_or_more": _Q88_SQL,
    "q89_cep_strict_run": _Q89_SQL,
    "q92_cep_optional": _Q92_SQL,
    "q93_cep_mixed": _Q93_SQL,
    "q98_count_window": _Q98_SQL,
    "q99_sliding_count_window": _Q99_SQL,
    "q100_cep_no_skip": _Q100_SQL,
    "q101_cep_skip_to_next": _Q101_SQL,
    "q102_cep_skip_past_last": _Q102_SQL,
    "q103_temporal_join": _Q103_SQL,
    "q104_cumulate_window": _Q104_SQL,
    "q105_window_join": _Q105_SQL,
    "q106_cep_where_predicate": _Q106_SQL,
    "q107_cep_followed_by_any": _Q107_SQL,
    "q108_cep_iterative_condition": _Q108_SQL,
    "q109_cep_iterative_strict": _Q109_SQL,
    "q110_cep_any_loop": _Q110_SQL,
    "q111_cep_iterative_loop": _Q111_SQL,
    "q112_interval_join": _Q112_SQL,
    "q113_cep_timeouts": _Q113_SQL,
    "q114_match_recognize": _Q114_SQL,
    "q156_match_recognize_sql": _Q114_SQL,
    "q157_cep_group_one_or_more": _Q157_SQL,
    "q115_window_top_n": _Q115_SQL,
    "q116_window_dedup": _Q116_SQL,
    "q123_cep_relaxed_payload": _Q123_SQL,
    "q153_cep_group_exact": _Q153_SQL,
    "q154_cep_group_range": _Q154_SQL,
    "q127_mr_aggregate_measures": _Q127_SQL,
    "q128_mr_prev_navigation": _Q128_SQL,
    "q129_mr_all_rows_per_match": _Q129_SQL,
    "q138_mr_subset": _Q138_SQL,
    "q142_mr_running_measures": _Q142_SQL,
}
