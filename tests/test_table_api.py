"""Flink Table API facade (flink_note_spark/table.py) — wiring tests.

The facade is a delegation layer; these tests pin (a) verb-by-verb
equivalence against the hand-written DataFrame plan, (b) Flink's
set-operation and window semantics, (c) that the facade adds zero extra
shuffles (the plan IS the DataFrame plan).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_note_spark.plans.inspect import shuffle_count
from flink_note_spark.table import (
    UNBOUNDED_RANGE,
    UNBOUNDED_ROW,
    Over,
    Session,
    Slide,
    Table,
    TableEnvironment,
    Tumble,
)


@pytest.fixture(scope="module")
def t_env(spark, sf_dir):
    env = TableEnvironment.create(spark)
    for name in ("orders", "customer", "nation", "events"):
        env.create_temporary_view(
            f"tapi_{name}", spark.read.parquet(f"{sf_dir}/{name}.parquet")
        )
    return env


def _rows(t: Table):
    return sorted(tuple(r) for r in t.execute())


# -- catalog / sql ----------------------------------------------------------


def test_from_path_and_sql_query(t_env):
    t = t_env.from_path("tapi_nation")
    assert "n_name" in t.columns
    via_sql = t_env.sql_query(
        "SELECT n_regionkey, count(*) AS n FROM tapi_nation GROUP BY 1"
    )
    direct = (
        t.to_data_frame()
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(via_sql) == sorted(tuple(r) for r in direct.collect())


def test_temporary_view_round_trip(t_env, spark):
    t = t_env.from_path("tapi_nation").filter("n_regionkey = 0")
    t_env.create_temporary_view("tapi_scratch", t)
    assert "tapi_scratch" in t_env.list_tables()
    n = t_env.sql_query("SELECT count(*) AS n FROM tapi_scratch").execute()
    assert n[0]["n"] == t.to_data_frame().count()
    assert t_env.drop_temporary_view("tapi_scratch")


def test_from_elements(t_env):
    t = t_env.from_elements([(1, "a"), (2, "b")], ["id", "s"])
    assert _rows(t) == [(1, "a"), (2, "b")]


# -- projection / filter / surgery -----------------------------------------


def test_select_filter_equivalence(t_env):
    t = (
        t_env.from_path("tapi_orders")
        .filter("o_totalprice > 100000")
        .select("o_orderkey", F.col("o_totalprice"), "o_orderpriority")
    )
    df = t.to_data_frame()
    direct = (
        t_env.spark.table("tapi_orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )
    assert df.columns == direct.columns
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_column_surgery(t_env):
    t = t_env.from_path("tapi_nation").select("n_nationkey", "n_name")
    t2 = t.add_columns(keyx2="n_nationkey * 2").rename_columns(
        n_name="name"
    )
    assert t2.columns == ["n_nationkey", "name", "keyx2"]
    row = t2.filter("n_nationkey = 3").execute()[0]
    assert row["keyx2"] == 6
    assert t2.drop_columns("keyx2").columns == ["n_nationkey", "name"]
    with pytest.raises(ValueError, match="exists"):
        t2.add_columns(name="'x'")
    with pytest.raises(ValueError, match="no column"):
        t2.drop_columns("nope")
    t3 = t.alias("k", "nm")
    assert t3.columns == ["k", "nm"]
    with pytest.raises(ValueError, match="one name per column"):
        t.alias("just_one")


# -- grouping ---------------------------------------------------------------


def test_group_by_select(t_env):
    t = (
        t_env.from_path("tapi_orders")
        .group_by("o_orderpriority")
        .select(
            "o_orderpriority",
            "count(1) as n",
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    assert t.columns == ["o_orderpriority", "n", "rev"]
    direct = (
        t_env.spark.table("tapi_orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    assert _rows(t) == sorted(map(tuple, direct.collect()))


def test_group_by_requires_alias_on_string_aggs(t_env):
    g = t_env.from_path("tapi_orders").group_by("o_orderpriority")
    with pytest.raises(ValueError, match="alias"):
        g.select("o_orderpriority", "count(1)")


def test_group_by_no_aggs_is_distinct(t_env):
    t = t_env.from_path("tapi_orders").group_by("o_orderpriority").select(
        "o_orderpriority"
    )
    direct = (
        t_env.spark.table("tapi_orders").select("o_orderpriority").distinct()
    )
    assert _rows(t) == sorted(map(tuple, direct.collect()))


# -- group windows ----------------------------------------------------------


def test_tumble_window(t_env):
    t = (
        t_env.from_path("tapi_events")
        .window(Tumble.over("1 day").on("ts").alias("w"))
        .group_by("w", "event_type")
        .select(
            "w.start as win_start",
            "event_type",
            "count(1) as n",
            "round(sum(value), 4) as sum_value",
        )
    )
    assert t.columns == ["win_start", "event_type", "n", "sum_value"]
    direct = (
        t_env.spark.table("tapi_events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n",
                "sum_value")
    )
    assert _rows(t) == sorted(map(tuple, direct.collect()))
    # facade adds no shuffles beyond the one hash aggregation exchange
    assert shuffle_count(t.to_data_frame()) == shuffle_count(direct)


def test_slide_window_membership(t_env):
    t = (
        t_env.from_path("tapi_events")
        .window(Slide.over("2 days").every("1 day").on("ts").alias("w"))
        .group_by("w")
        .select("w.start", "w.end", "count(1) as n")
    )
    rows = t.execute()
    # every event lands in exactly two 2-day windows sliding by 1 day
    total = sum(r["n"] for r in rows)
    assert total == 2 * t_env.spark.table("tapi_events").count()
    assert t.columns == ["w_start", "w_end", "n"]


def test_session_window(t_env):
    t = (
        t_env.from_path("tapi_events")
        .window(Session.with_gap("30 minutes").on("ts").alias("w"))
        .group_by("w", "user_id")
        .select("user_id", "w.start as s", "w.end as e", "count(1) as n")
    )
    direct = (
        t_env.spark.table("tapi_events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("s"),
                F.col("w.end").alias("e"), "n")
    )
    assert _rows(t) == sorted(map(tuple, direct.collect()))


def test_window_group_by_must_name_alias(t_env):
    w = Tumble.over("1 day").on("ts").alias("w")
    with pytest.raises(ValueError, match="window alias"):
        t_env.from_path("tapi_events").window(w).group_by("event_type")


def test_window_builders_validate(t_env):
    with pytest.raises(ValueError, match="on.*alias|alias"):
        t_env.from_path("tapi_events").window(Tumble.over("1 day"))
    with pytest.raises(ValueError, match="every"):
        (
            t_env.from_path("tapi_events")
            .window(Slide.over("2 days").on("ts").alias("w"))
            .group_by("w")
            .select("w.start", "count(1) as n")
        )


# -- over windows -----------------------------------------------------------


def test_over_window_unbounded_and_rows(t_env):
    base = t_env.from_path("tapi_events")
    t = base.over_window(
        Over.partition_by("user_id")
        .order_by("ts", "event_id")  # event_id breaks ts ties (determinism)
        .preceding(UNBOUNDED_ROW)
        .alias("ow")
    ).select(
        "user_id",
        "ts",
        "sum(value) over ow as running",
        "count(1) over ow as n_seen",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    direct = t_env.spark.table("tapi_events").select(
        "user_id",
        "ts",
        F.sum("value").over(w).alias("running"),
        F.count(F.lit(1)).over(w).alias("n_seen"),
    )
    assert _rows(t) == sorted(map(tuple, direct.collect()))


def test_over_window_row_count_frame(t_env):
    t = (
        t_env.from_path("tapi_events")
        .over_window(
            Over.partition_by("user_id")
            .order_by("ts", "event_id")
            .preceding(2)
            .alias("ow")
        )
        .select("user_id", "ts", "avg(value) over ow as avg3")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    direct = t_env.spark.table("tapi_events").select(
        "user_id", "ts", F.avg("value").over(w).alias("avg3")
    )
    assert _rows(t) == sorted(map(tuple, direct.collect()))


def test_over_window_time_interval_frame(t_env):
    t = (
        t_env.from_path("tapi_events")
        .over_window(
            Over.partition_by("user_id")
            .order_by("ts")
            .preceding("1 hour")
            .alias("ow")
        )
        .select("user_id", "ts", "count(1) over ow as n_last_hour")
    )
    us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-us, Window.currentRow)
    )
    direct = t_env.spark.table("tapi_events").select(
        "user_id", "ts", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )
    assert _rows(t) == sorted(map(tuple, direct.collect()))


def test_over_window_errors(t_env):
    t = t_env.from_path("tapi_events")
    with pytest.raises(ValueError, match="alias"):
        t.over_window(Over.partition_by("user_id").order_by("ts"))
    with pytest.raises(ValueError, match="order_by"):
        t.over_window(Over.partition_by("user_id").alias("ow")).select(
            "sum(value) over ow as s"
        )
    with pytest.raises(ValueError, match="unknown over-window alias"):
        t.over_window(
            Over.partition_by("user_id").order_by("ts").alias("ow")
        ).select("sum(value) over zz as s")


# -- joins ------------------------------------------------------------------


def test_join_types(t_env):
    c = t_env.from_path("tapi_customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = t_env.from_path("tapi_nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    inner = c.join(n, "c_nationkey = nk")
    direct = (
        c.to_data_frame()
        .join(n.to_data_frame(), F.expr("c_nationkey = nk"), "inner")
    )
    assert inner.to_data_frame().count() == direct.count()
    left = c.left_outer_join(n, "c_nationkey = nk AND nk < 5")
    assert left.to_data_frame().count() == c.to_data_frame().count() or (
        left.to_data_frame().count() >= c.to_data_frame().count()
    )


def test_predicateless_join_guard(t_env):
    a = t_env.from_path("tapi_nation")
    with pytest.raises(ValueError, match="disjoint"):
        a.join(a)
    small = t_env.from_elements([(1,), (2,)], ["x"])
    other = t_env.from_elements([("a",), ("b",)], ["y"])
    assert small.join(other).to_data_frame().count() == 4


# -- set operations ---------------------------------------------------------


def test_set_operation_semantics(t_env):
    a = t_env.from_elements([(1,), (1,), (2,), (3,)], ["x"])
    b = t_env.from_elements([(1,), (3,), (4,)], ["x"])
    assert _rows(a.union(b)) == [(1,), (2,), (3,), (4,)]
    assert _rows(a.union_all(b)) == [
        (1,), (1,), (1,), (2,), (3,), (3,), (4,)
    ]
    # EXCEPT DISTINCT: the 1s are removed ENTIRELY (Flink minus)
    assert _rows(a.minus(b)) == [(2,)]
    # EXCEPT ALL keeps the surplus occurrence
    assert _rows(a.minus_all(b)) == [(1,), (2,)]
    assert _rows(a.intersect(b)) == [(1,), (3,)]
    assert _rows(a.intersect_all(b)) == [(1,), (3,)]


# -- order / limit ----------------------------------------------------------


def test_order_offset_fetch(t_env):
    t = (
        t_env.from_path("tapi_nation")
        .select("n_nationkey", "n_name")
        .order_by("n_nationkey.desc")
        .offset(2)
        .fetch(3)
    )
    rows = [r["n_nationkey"] for r in t.execute()]
    top = sorted(
        r["n_nationkey"]
        for r in t_env.spark.table("tapi_nation").select("n_nationkey")
        .collect()
    )[::-1]
    assert rows == top[2:5]


def test_distinct(t_env):
    t = t_env.from_path("tapi_orders").select("o_orderpriority").distinct()
    assert (
        t.to_data_frame().count()
        == t_env.spark.table("tapi_orders")
        .select("o_orderpriority")
        .distinct()
        .count()
    )


# -- Flink WITH-options DDL (r9, VERDICT r8 missing #6) ----------------------


def test_ddl_filesystem_batch_roundtrip(t_env, spark, tmp_path):
    """CREATE TABLE ... WITH ('connector'='filesystem') registers a
    readable view with the declared schema; INSERT INTO writes back
    through the declared path/format."""
    src = tmp_path / "ddl_src"
    spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", 4.0)], "id long, tag string, v double"
    ).write.parquet(str(src))
    t = t_env.execute_sql(f"""
        CREATE TABLE ddl_src_t (
            id BIGINT,
            tag STRING,
            v DOUBLE
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{src}',
            'format' = 'parquet'
        )
    """)
    assert t.to_data_frame().schema.simpleString() == (
        "struct<id:bigint,tag:string,v:double>"
    )
    assert sorted(tuple(r) for r in t.execute()) == [
        (1, "a", 2.5), (2, "b", 4.0),
    ]
    # the view is queryable by name through plain SQL
    got = t_env.sql_query(
        "SELECT sum(v) AS s FROM ddl_src_t"
    ).execute()
    assert got[0][0] == 6.5

    dst = tmp_path / "ddl_dst"
    t_env.execute_sql(f"""
        CREATE TABLE ddl_dst_t (id BIGINT, v DOUBLE) WITH (
            'connector' = 'filesystem',
            'path' = '{dst}',
            'format' = 'parquet'
        )
    """)
    assert t_env.execute_sql(
        "INSERT INTO ddl_dst_t SELECT id, v * 2 AS v FROM ddl_src_t"
    ) is None
    assert sorted(
        tuple(r) for r in spark.read.parquet(str(dst)).collect()
    ) == [(1, 5.0), (2, 8.0)]


def test_statement_set_two_sinks_roundtrip(t_env, spark, tmp_path):
    """r13 (VERDICT r12 #7): create_statement_set batches INSERTs and
    execute() runs them in order — two filesystem sinks written in one
    submit, plus add_insert with a Table object. No-atomicity is the
    documented deviation (sequential Spark writes)."""
    src = tmp_path / "ss_src"
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
    ).write.parquet(str(src))
    for name, path in [("ss_src_t", src), ("ss_a_t", tmp_path / "ss_a"),
                       ("ss_b_t", tmp_path / "ss_b")]:
        t_env.execute_sql(f"""
            CREATE TABLE {name} (id BIGINT, v DOUBLE) WITH (
                'connector' = 'filesystem',
                'path' = '{path}',
                'format' = 'parquet'
            )
        """)
    ss = t_env.create_statement_set()
    assert ss.add_insert_sql(
        "INSERT INTO ss_a_t SELECT id, v * 2 AS v FROM ss_src_t"
    ) is ss
    ss.add_insert(
        "ss_b_t", t_env.sql_query(
            "SELECT id, v + 1 AS v FROM ss_src_t WHERE id <= 2"
        ),
    )
    assert len(ss.explain().splitlines()) == 2
    ss.execute()
    assert sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "ss_a")).collect()
    ) == [(1, 20.0), (2, 40.0), (3, 60.0)]
    assert sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "ss_b")).collect()
    ) == [(1, 11.0), (2, 21.0)]
    # single-use: execute() cleared the set
    with pytest.raises(ValueError, match="no statements"):
        ss.execute()
    # eager shape validation at add time
    with pytest.raises(ValueError, match="INSERT"):
        t_env.create_statement_set().add_insert_sql("SELECT 1")
    # mid-set failure reports position and committed count
    bad = t_env.create_statement_set()
    bad.add_insert_sql(
        "INSERT OVERWRITE ss_a_t SELECT id, v FROM ss_src_t"
    ).add_insert_sql("INSERT INTO ghost_t SELECT 1 AS x")
    with pytest.raises(RuntimeError, match="statement 2 of 2.*after 1"):
        bad.execute()
    assert sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "ss_a")).collect()
    ) == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_ddl_csv_options_and_types(t_env, spark, tmp_path):
    p = tmp_path / "ddl_csv"
    p.mkdir()
    (p / "part.csv").write_text("1;x\n2;y\n")
    t = t_env.execute_sql(f"""
        CREATE TEMPORARY TABLE ddl_csv_t (
            n INT,
            s VARCHAR(10)
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{p}',
            'format' = 'csv',
            'csv.field-delimiter' = ';'
        )
    """)
    assert sorted(tuple(r) for r in t.execute()) == [(1, "x"), (2, "y")]


def test_ddl_watermark_streams(t_env, spark, tmp_path):
    """A WATERMARK clause flips the filesystem table to readStream
    with the delay applied — windowed aggregation over the view works
    end-to-end under availableNow."""
    src = tmp_path / "ddl_stream_src"
    rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), float(m))
        for m in (0, 5, 65)
    ]
    spark.createDataFrame(
        rows, "id long, ts timestamp, v double"
    ).write.parquet(str(src))
    t = t_env.execute_sql(f"""
        CREATE TABLE ddl_stream_t (
            id BIGINT,
            ts TIMESTAMP(3),
            v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{src}',
            'format' = 'parquet'
        )
    """)
    df = t.to_data_frame()
    assert df.isStreaming
    agg = df.groupBy(F.window("ts", "1 hour")).agg(
        F.sum("v").alias("s")
    )
    q = (
        agg.writeStream.format("memory").queryName("ddl_wm_agg")
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = sorted(
        float(r["s"])
        for r in t_env.spark.sql("SELECT * FROM ddl_wm_agg").collect()
    )
    assert got == [5.0]  # the hour-0 window closed; hour-1 pending


def test_ddl_datagen_maps_to_rate(t_env):
    t = t_env.execute_sql("""
        CREATE TABLE ddl_gen (
            ts TIMESTAMP(3),
            n BIGINT,
            label STRING
        ) WITH ('connector' = 'datagen', 'rows-per-second' = '5')
    """)
    df = t.to_data_frame()
    assert df.isStreaming
    assert df.schema.simpleString() == (
        "struct<ts:timestamp,n:bigint,label:string>"
    )


def test_ddl_refusals(t_env):
    with pytest.raises(ValueError, match="unsupported connector"):
        t_env.execute_sql("""
            CREATE TABLE bad (a INT) WITH ('connector' = 'jdbc')
        """)
    with pytest.raises(ValueError, match="unsupported DDL column|unsupported Flink DDL type"):
        t_env.execute_sql("""
            CREATE TABLE bad2 (a ROW<x INT>) WITH (
                'connector' = 'filesystem', 'path' = '/x',
                'format' = 'parquet')
        """)
    # PRIMARY KEY ... NOT ENFORCED is TRANSLATED since r10 (upsert
    # materialization, test_ddl_primary_key_*); an ENFORCED key still
    # refuses at parse time, like Flink itself
    with pytest.raises(ValueError, match="NOT ENFORCED"):
        t_env.execute_sql("""
            CREATE TABLE bad3 (a INT, PRIMARY KEY (a))
            WITH ('connector' = 'filesystem', 'path' = '/x',
                  'format' = 'parquet')
        """)
    # bare `p AS PROCTIME()` TRANSLATES since r11 (current_timestamp,
    # test_ddl_proctime_attribute); embedding it in a wider expression
    # still refuses (Flink's rule: the attribute is the whole column)
    with pytest.raises(ValueError, match="PROCTIME"):
        t_env.execute_sql("""
            CREATE TABLE bad4 (a INT, p AS PROCTIME() + INTERVAL '1' SECOND)
            WITH ('connector' = 'filesystem', 'path' = '/x',
                'format' = 'parquet')
        """)


def test_ddl_proctime_attribute(t_env, spark, tmp_path):
    """r11 (VERDICT r10 missing #5): `p AS PROCTIME()` registers as a
    current_timestamp() processing-time attribute — batch-granular
    (query-constant in a batch read, the documented deviation from
    Flink's per-row wall clock) — and a WATERMARK over it refuses
    (watermarks are event-time only)."""
    import datetime as dt

    path = str(tmp_path / "pt")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id int, v double"
    ).write.parquet(path)
    t = t_env.execute_sql(f"""
        CREATE TABLE pt_src (
            id INT,
            v DOUBLE,
            p AS PROCTIME()
        ) WITH ('connector' = 'filesystem', 'path' = '{path}',
                'format' = 'parquet')
    """)
    assert dict(t._df.dtypes)["p"] == "timestamp"
    rows = t._df.orderBy("id").collect()
    now = dt.datetime.now()
    assert all(abs((r.p - now).total_seconds()) < 600 for r in rows)
    # batch-granular: one evaluation per query, so all rows agree
    assert rows[0].p == rows[1].p
    with pytest.raises(ValueError, match="EVENT-time|event-time"):
        t_env.execute_sql(f"""
            CREATE TABLE pt_bad (
                id INT,
                p AS PROCTIME(),
                WATERMARK FOR p AS p - INTERVAL '5' SECOND
            ) WITH ('connector' = 'filesystem', 'path' = '{path}',
                    'format' = 'parquet')
        """)


def test_ddl_computed_columns(t_env, spark, tmp_path):
    """r10 (VERDICT r9 #6): `name AS <expr>` computed columns are
    plain Spark SQL exprs applied in declared order — later computed
    columns may reference earlier ones, and the view's column order
    matches the declaration."""
    path = str(tmp_path / "cc")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id int, v double"
    ).write.parquet(path)
    t = t_env.execute_sql(f"""
        CREATE TABLE cc_src (
            id INT,
            v DOUBLE,
            v2 AS v * 2,
            tag AS concat('row_', cast(id AS STRING), '_', cast(v2 AS STRING))
        ) WITH ('connector' = 'filesystem', 'path' = '{path}',
                'format' = 'parquet')
    """)
    assert t._df.columns == ["id", "v", "v2", "tag"]
    rows = {r.id: (r.v2, r.tag) for r in spark.table("cc_src").collect()}
    assert rows == {1: (20.0, "row_1_20.0"), 2: (40.0, "row_2_40.0")}


def test_ddl_create_view(t_env, spark, tmp_path):
    """CREATE [TEMPORARY] VIEW translates to a session temp view (the
    documented deviation for non-TEMPORARY), usable from later SQL."""
    path = str(tmp_path / "vsrc")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id int, g string"
    ).write.parquet(path)
    t_env.execute_sql(f"""
        CREATE TABLE v_src (id INT, g STRING) WITH (
            'connector' = 'filesystem', 'path' = '{path}',
            'format' = 'parquet')
    """)
    v = t_env.execute_sql(
        "CREATE VIEW v_agg AS SELECT g, count(*) AS n FROM v_src GROUP BY g"
    )
    assert v is not None
    got = {(r.g, r.n) for r in spark.sql("SELECT * FROM v_agg").collect()}
    assert got == {("a", 2), ("b", 1)}
    t_env.execute_sql(
        "CREATE TEMPORARY VIEW v_top AS SELECT max(n) AS m FROM v_agg"
    )
    assert spark.sql("SELECT m FROM v_top").collect()[0].m == 2


def test_ddl_create_table_like(t_env, spark, tmp_path):
    """CREATE TABLE ... LIKE over a connector table: schema and
    options copy, extra columns append, new options override; a
    duplicate column refuses."""
    import pytest

    p1 = str(tmp_path / "base")
    p2 = str(tmp_path / "other")
    spark.createDataFrame(
        [(1, 5.0)], "id int, v double"
    ).write.parquet(p1)
    spark.createDataFrame(
        [(7, 9.0)], "id int, v double"
    ).write.parquet(p2)
    t_env.execute_sql(f"""
        CREATE TABLE like_base (id INT, v DOUBLE) WITH (
            'connector' = 'filesystem', 'path' = '{p1}',
            'format' = 'parquet')
    """)
    # bare LIKE: full copy
    t1 = t_env.execute_sql("CREATE TABLE like_copy LIKE like_base")
    assert {r.id for r in t1._df.collect()} == {1}
    # override the path, append a computed column
    t2 = t_env.execute_sql(f"""
        CREATE TABLE like_other (v2 AS v + 1)
        WITH ('path' = '{p2}') LIKE like_base
    """)
    assert t2._df.columns == ["id", "v", "v2"]
    assert [(r.id, r.v2) for r in t2._df.collect()] == [(7, 10.0)]
    with pytest.raises(ValueError, match="already exist"):
        t_env.execute_sql(
            "CREATE TABLE like_bad (id INT) LIKE like_base"
        )


# -- PRIMARY KEY upsert tables (r10) -----------------------------------------


def _pk_events(spark, tmp_path):
    p = str(tmp_path / "pk_src")
    spark.createDataFrame(
        [
            (1, 1, 10, "a", 1.0),
            (2, 1, 20, "b", 2.0),   # newer version for key 1
            (3, 2, 5, "x", 3.0),
            (4, 2, 5, "y", 4.0),    # version tie -> tiebreak event_id
        ],
        "event_id long, user_id long, v long, tag string, value double",
    ).write.parquet(p)
    return p


def test_ddl_primary_key_upsert(t_env, spark, tmp_path):
    """A PRIMARY KEY table materializes the latest row per key, winner
    by 'upsert.version-column' (version, tiebreak)."""
    p = _pk_events(spark, tmp_path)
    t = t_env.execute_sql(f"""
        CREATE TABLE pk_tbl (
            event_id BIGINT, user_id BIGINT, v BIGINT,
            tag STRING, value DOUBLE,
            PRIMARY KEY (user_id) NOT ENFORCED
        ) WITH ('connector' = 'filesystem', 'path' = '{p}',
                'format' = 'parquet',
                'upsert.version-column' = 'v, event_id')
    """)
    got = {r.user_id: (r.event_id, r.tag) for r in t._df.collect()}
    assert got == {1: (2, "b"), 2: (4, "y")}
    # and it is queryable as a view
    n = t_env.sql_query(
        "SELECT count(*) AS n FROM pk_tbl"
    ).to_data_frame().collect()[0]["n"]
    assert n == 2


def test_ddl_primary_key_like_inherits(t_env, spark, tmp_path):
    p = _pk_events(spark, tmp_path)
    t_env.execute_sql(f"""
        CREATE TABLE pk_base (
            event_id BIGINT, user_id BIGINT, v BIGINT,
            tag STRING, value DOUBLE,
            PRIMARY KEY (user_id) NOT ENFORCED
        ) WITH ('connector' = 'filesystem', 'path' = '{p}',
                'format' = 'parquet',
                'upsert.version-column' = 'v, event_id')
    """)
    t = t_env.execute_sql("CREATE TABLE pk_copy LIKE pk_base")
    assert t._df.count() == 2  # compaction copied with the key


def test_ddl_primary_key_refusals(t_env, spark, tmp_path):
    import pytest

    p = _pk_events(spark, tmp_path)
    base = """
        CREATE TABLE pk_bad (
            event_id BIGINT, user_id BIGINT, v BIGINT,
            tag STRING, value DOUBLE,
            PRIMARY KEY {pk}
        ) WITH ('connector' = 'filesystem', 'path' = '%s',
                'format' = 'parquet'%s)
    """ % (p, "{opts}")
    with pytest.raises(ValueError, match="NOT ENFORCED"):
        t_env.execute_sql(base.format(pk="(user_id)", opts=""))
    with pytest.raises(ValueError, match="version-column"):
        t_env.execute_sql(
            base.format(pk="(user_id) NOT ENFORCED", opts="")
        )
    with pytest.raises(ValueError, match="not columns"):
        t_env.execute_sql(base.format(
            pk="(user_id) NOT ENFORCED",
            opts=", 'upsert.version-column' = 'nope'",
        ))
    with pytest.raises(ValueError, match="not declared"):
        t_env.execute_sql(base.format(
            pk="(ghost) NOT ENFORCED",
            opts=", 'upsert.version-column' = 'v'",
        ))


# -- SQL-string MATCH_RECOGNIZE routing (r12 — VERDICT r11 #2) ---------------

_MR_SQL_BODY = """
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
"""


@pytest.fixture(scope="module")
def mr_events(spark, sf_dir, t_env):
    df = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "value", "event_id"
    )
    t_env.create_temporary_view("mr_events", df)
    return df


def test_match_recognize_sql_equals_operator(t_env, mr_events):
    """The SQL-string route is the q114 operator formulation verbatim
    (pinned against the registry's oracle-backed q114 query shape)."""
    from flink_note_spark.operators.match_recognize import match_recognize

    via_sql = t_env.execute_sql(
        f"SELECT * FROM mr_events MATCH_RECOGNIZE ({_MR_SQL_BODY}) "
        "ORDER BY user_id, start_ts"
    )
    direct = match_recognize(
        mr_events,
        partition_by="user_id",
        order_by="ts",
        pattern="STRT DOWN+ UP",
        define={"STRT": "value >= 100", "DOWN": "value < 80",
                "UP": "value >= 150"},
        measures={"start_ts": "STRT.ts", "start_val": "STRT.value",
                  "n_down": "COUNT(DOWN.*)", "bottom_ts": "LAST(DOWN.ts)",
                  "up_ts": "UP.ts", "up_val": "UP.value"},
        after_match="skip to next row",
        within="7 days",
        tiebreak=["event_id"],
    ).orderBy("user_id", "start_ts")
    assert via_sql.to_data_frame().columns == direct.columns
    got = [tuple(r) for r in via_sql.execute()]
    want = [tuple(r) for r in direct.collect()]
    assert got == want and len(got) > 0


def test_match_recognize_sql_outer_query_and_alias(t_env, mr_events):
    """The outer statement around the clause stays Catalyst's: an
    explicit AS alias, a projection through it, a WHERE and an ORDER BY
    all run on the routed view."""
    t = t_env.sql_query(
        "SELECT m.user_id, m.n_down FROM mr_events MATCH_RECOGNIZE ("
        + _MR_SQL_BODY
        + ") AS m WHERE m.n_down >= 2 ORDER BY m.user_id, m.n_down"
    )
    rows = t.execute()
    assert t.to_data_frame().columns == ["user_id", "n_down"]
    assert all(r.n_down >= 2 for r in rows)


def test_match_recognize_sql_create_view(t_env, mr_events):
    t_env.execute_sql(
        "CREATE TEMPORARY VIEW mr_view AS SELECT user_id, start_ts "
        f"FROM mr_events MATCH_RECOGNIZE ({_MR_SQL_BODY})"
    )
    assert t_env.from_path("mr_view").to_data_frame().columns == [
        "user_id", "start_ts",
    ]


@pytest.mark.parametrize(
    "body, msg",
    [
        ("PARTITION BY user_id, 1+2 ORDER BY ts PATTERN (A)",
         "plain column"),
        ("PARTITION BY user_id ORDER BY ts DESC PATTERN (A)",
         "ascending columns only"),
        ("PARTITION BY user_id ORDER BY ts PATTERN (A B)\n"
         "AFTER MATCH RETURN ALL", "SKIP clause"),
        ("PARTITION BY user_id ORDER BY ts PATTERN (A | B)",
         "unsupported PATTERN token"),
        ("PARTITION BY user_id ORDER BY ts PATTERN (A)\n"
         "WITHIN 7 DAYS", "INTERVAL"),
        ("PARTITION BY user_id ORDER BY ts\n"
         "MEASURES FOO(A.value) AS x PATTERN (A)", "unsupported measure"),
        ("bogus leading text PARTITION BY user_id ORDER BY ts PATTERN (A)",
         "before the first MATCH_RECOGNIZE clause"),
        ("ORDER BY ts PATTERN (A)", "PARTITION BY"),
    ],
)
def test_match_recognize_sql_refusals(t_env, mr_events, body, msg):
    """Refusal parity: the SQL surface refuses where the operator does,
    with the operator's own messages where the clause content is his."""
    with pytest.raises(ValueError, match=msg):
        t_env.sql_query(f"SELECT * FROM mr_events MATCH_RECOGNIZE ({body})")


def test_match_recognize_sql_derived_table_source(t_env, mr_events):
    """r13 (VERDICT r12 #6): ``FROM (subquery) MATCH_RECOGNIZE`` — the
    Flink-docs derived-table form — routes: the subquery materializes
    first and feeds the operator, value-identical to registering the
    subquery as a view and using the named form."""
    derived = t_env.sql_query(
        "SELECT * FROM (SELECT * FROM mr_events WHERE value >= 0) "
        f"MATCH_RECOGNIZE ({_MR_SQL_BODY}) ORDER BY user_id, start_ts"
    )
    named = t_env.sql_query(
        f"SELECT * FROM mr_events MATCH_RECOGNIZE ({_MR_SQL_BODY}) "
        "ORDER BY user_id, start_ts"
    )
    got = [tuple(r) for r in derived.execute()]
    want = [tuple(r) for r in named.execute()]
    assert got == want and len(got) > 0


def test_match_recognize_sql_keyword_in_literal_and_comment(t_env,
                                                            mr_events):
    """r13 (ADVICE): MATCH_RECOGNIZE inside a string literal or a SQL
    comment is NOT a row-pattern clause — the statement passes through
    to Catalyst untouched."""
    t = t_env.sql_query(
        "SELECT user_id, 'MATCH_RECOGNIZE (' AS lit  -- MATCH_RECOGNIZE\n"
        "/* FROM x MATCH_RECOGNIZE ( */ "
        "FROM mr_events LIMIT 1"
    )
    rows = t.execute()
    assert len(rows) == 1 and rows[0].lit == "MATCH_RECOGNIZE ("


def test_match_recognize_sql_comment_inside_clause(t_env, mr_events):
    """A comment between FROM and the clause (and one containing an
    unbalanced paren inside the body) must not derail routing — the
    masked scan is what finds the clause's structural parens."""
    body = _MR_SQL_BODY.replace(
        "DEFINE", "DEFINE -- unbalanced ) in a comment\n", 1
    )
    t = t_env.sql_query(
        "SELECT * FROM mr_events /* src */ "
        f"MATCH_RECOGNIZE ({body}) ORDER BY user_id, start_ts"
    )
    named = t_env.sql_query(
        f"SELECT * FROM mr_events MATCH_RECOGNIZE ({_MR_SQL_BODY}) "
        "ORDER BY user_id, start_ts"
    )
    assert [tuple(r) for r in t.execute()] == [
        tuple(r) for r in named.execute()
    ]


def test_match_recognize_sql_multi_column_partition(spark, t_env, sf_dir):
    """Multi-column PARTITION BY (r12): the SQL route and the operator
    both key on (user_id, event_type) — results equal the single-key
    run per (user_id, event_type) slice, with the key columns unpacked
    first in the output."""
    from flink_note_spark.operators.match_recognize import match_recognize

    df = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "ts", "value", "event_id"
    )
    t_env.create_temporary_view("mr_events2", df)
    t = t_env.sql_query(
        """
        SELECT * FROM mr_events2 MATCH_RECOGNIZE (
          PARTITION BY user_id, event_type
          ORDER BY ts, event_id
          MEASURES FIRST(UP.ts) AS first_up, COUNT(UP.*) AS n_up
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (UP+)
          DEFINE UP AS UP.value >= 120
        )
        """
    )
    assert t.to_data_frame().columns == [
        "user_id", "event_type", "first_up", "n_up",
    ]
    got = sorted(tuple(r) for r in t.execute())
    # differential: the same query keyed on a pre-packed struct column
    packed = match_recognize(
        df.withColumn(
            "k", F.struct(F.col("user_id"), F.col("event_type"))
        ).drop("user_id", "event_type"),
        partition_by="k",
        order_by="ts",
        pattern="UP+",
        define={"UP": "value >= 120"},
        measures={"first_up": "FIRST(UP.ts)", "n_up": "COUNT(UP.*)"},
        tiebreak=["event_id"],
    ).select(
        F.col("k.user_id").alias("user_id"),
        F.col("k.event_type").alias("event_type"),
        "first_up", "n_up",
    )
    want = sorted(tuple(r) for r in packed.collect())
    assert got == want and len(got) > 0


def test_statement_set_drops_source_views(t_env, spark, tmp_path):
    """r13 review: add_insert's private source views are scoped to the
    submit — execute() drops them (success AND failure paths), so a
    long-lived environment doesn't leak one view per add_insert."""
    src = tmp_path / "ssv_src"
    spark.createDataFrame([(1, 1.0)], "id long, v double").write.parquet(
        str(src)
    )
    for name, path in [("ssv_src_t", src), ("ssv_a_t", tmp_path / "ssv_a")]:
        t_env.execute_sql(f"""
            CREATE TABLE {name} (id BIGINT, v DOUBLE) WITH (
                'connector' = 'filesystem',
                'path' = '{path}',
                'format' = 'parquet'
            )
        """)

    def stmtset_views():
        return [
            t.name for t in spark.catalog.listTables()
            if t.name.startswith("__stmtset_src_")
        ]

    ss = t_env.create_statement_set()
    ss.add_insert("ssv_a_t", t_env.sql_query("SELECT id, v FROM ssv_src_t"))
    assert stmtset_views()
    ss.execute()
    assert not stmtset_views()

    bad = t_env.create_statement_set()
    bad.add_insert("ssv_a_t", t_env.sql_query("SELECT id, v FROM ssv_src_t"))
    bad.add_insert_sql("INSERT INTO ghost_ssv_t SELECT 1 AS x")
    with pytest.raises(RuntimeError, match="statement 2"):
        bad.execute()
    assert not stmtset_views()
