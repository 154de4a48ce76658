"""Property-based spot checks (SURVEY.md §5.5) — invariants that must
hold for ANY input, exercised over hypothesis-generated micro-tables.

Example counts are deliberately small (Spark job per example); these are
sanity invariants, not fuzzing.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_note_spark.operators.dedup import exact_dedup
from flink_note_spark.operators.windows import sessionize

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key
        st.integers(min_value=-1000, max_value=1000),   # value
    ),
    min_size=0,
    max_size=30,
)


@given(a=rows_strategy, b=rows_strategy)
@settings(**_SETTINGS)
def test_union_count_is_sum_of_counts(spark, a, b):
    schema = "k long, v long"
    da = spark.createDataFrame(a, schema) if a else spark.createDataFrame([], schema)
    db = spark.createDataFrame(b, schema) if b else spark.createDataFrame([], schema)
    assert da.unionByName(db).count() == len(a) + len(b)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_drop_duplicates_subset_and_idempotent(spark, rows):
    schema = "k long, v long"
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    dd = df.dropDuplicates()
    assert dd.count() == len(set(rows))
    assert dd.dropDuplicates().count() == dd.count()
    # subset: every surviving row was an input row
    assert dd.exceptAll(df).count() == 0


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_running_window_sum_ends_at_group_sum(spark, rows):
    """The last running-frame value per key equals the plain group sum —
    windows and aggregations agree."""
    if not rows:
        return
    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)], "k long, seq long, v long"
    )
    w = Window.partitionBy("k").orderBy("seq")
    run = df.select(
        "k",
        "seq",
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("rs"),
    )
    last = (
        run.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("k").orderBy(F.desc("seq"))),
        )
        .filter(F.col("rn") == 1)
        .select("k", "rs")
    )
    grouped = df.groupBy("k").agg(F.sum("v").alias("gs"))
    joined = last.join(grouped, "k").collect()
    assert all(r.rs == r.gs for r in joined)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_exact_dedup_copies_partition_input(spark, rows):
    """sum(n_copies) over dedup clusters == input row count (every row is
    in exactly one cluster)."""
    if not rows:
        return
    df = spark.createDataFrame(
        [(i, f"text {k}") for i, (k, _) in enumerate(rows)],
        "doc_id long, text string",
    )
    out = exact_dedup(df, "text", "doc_id")
    assert out.agg(F.sum("n_copies")).collect()[0][0] == len(rows)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)),
        min_size=1, max_size=15,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000), st.integers(-99, 99)),
        min_size=0, max_size=15,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join agrees with pandas.merge_asof (an INDEPENDENT reference
    implementation) on arbitrary keyed event sequences — backward
    direction, equal timestamps match."""
    import datetime as dt

    import pandas as pd

    from flink_note_spark.operators.joins import asof_join

    base = dt.datetime(2024, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    # dedupe (key, ts) on the right: with ties merge_asof picks the last
    # row, asof_join picks via last() — make the reference unambiguous
    rmap = {(k, s): v for k, s, v in right}
    ldf = spark.createDataFrame(
        [(k, t(s)) for k, s in left], "k long, lt timestamp"
    )
    rdf = spark.createDataFrame(
        [(k, t(s), float(v)) for (k, s), v in rmap.items()],
        "k long, rt timestamp, rv double",
    ) if rmap else spark.createDataFrame([], "k long, rt timestamp, rv double")

    got = asof_join(ldf, rdf, on="k", left_time="lt", right_time="rt",
                    right_cols=["rv"]).toPandas()
    got = got.sort_values(["k", "lt"], ignore_index=True)[["k", "lt", "rv"]]

    lp = pd.DataFrame([(k, t(s)) for k, s in left], columns=["k", "lt"]).sort_values(
        ["lt", "k"], ignore_index=True
    )
    rp = pd.DataFrame(
        [(k, t(s), float(v)) for (k, s), v in rmap.items()],
        columns=["k", "rt", "rv"],
    ).sort_values(["rt", "k"], ignore_index=True)
    if len(rp):
        want = pd.merge_asof(
            lp, rp, left_on="lt", right_on="rt", by="k", direction="backward"
        )[["k", "lt", "rv"]]
    else:
        want = lp.assign(rv=float("nan"))[["k", "lt", "rv"]]
    want = want.sort_values(["k", "lt"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=20
    )
)
@settings(**_SETTINGS)
def test_sessionize_partitions_events(spark, offsets):
    """Sessions partition a key's events: per-session counts sum to the
    event count and session ids are 1..n_sessions."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=o), i) for i, o in enumerate(offsets)],
        "uid long, ts timestamp, eid long",
    )
    out = sessionize(df, key="uid", ts="ts", gap_seconds=300, tiebreak="eid")
    per = out.groupBy("session_id").count().collect()
    assert sum(r["count"] for r in per) == len(offsets)
    ids = sorted(r.session_id for r in per)
    assert ids == list(range(1, len(ids) + 1))
