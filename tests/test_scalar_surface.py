"""Closure tests for the remaining declared scalar/API surface
(SURVEY.md §2.2) not exercised by an oracle query: ORC scan, map
transform_values, array_contains, months_between / to_timestamp /
unix_timestamp, seeded rand, selectExpr, sortWithinPartitions, console
sink plumbing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_note_spark.sources.files import read_file, write_sink


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    write_sink(df, "orc", str(tmp_path / "o"))
    back = read_file(spark, "orc", str(tmp_path / "o"))
    assert {(r.id, r.s) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_map_transform_values_and_keys(spark):
    df = spark.createDataFrame([(1,)], "id long").select(
        F.create_map(F.lit("a"), F.lit(2), F.lit("b"), F.lit(3)).alias("m")
    )
    out = df.select(
        F.transform_values("m", lambda _, v: v * 10).alias("mv"),
        F.map_keys("m").alias("ks"),
        F.map_values("m").alias("vs"),
    ).collect()[0]
    assert out.mv == {"a": 20, "b": 30}
    assert sorted(out.ks) == ["a", "b"]
    assert sorted(out.vs) == [2, 3]


def test_array_contains_and_sequence(spark):
    df = spark.range(1).select(
        F.sequence(F.lit(1), F.lit(5)).alias("xs")
    )
    row = df.select(
        F.array_contains("xs", 3).alias("has3"),
        F.array_contains("xs", 9).alias("has9"),
        F.slice("xs", 2, 2).alias("mid"),
    ).collect()[0]
    assert row.has3 and not row.has9 and row.mid == [2, 3]


def test_timestamp_functions(spark):
    df = spark.createDataFrame([("2024-03-15 12:30:00",)], "s string").select(
        F.to_timestamp("s").alias("ts")
    )
    row = df.select(
        F.unix_timestamp("ts").alias("ux"),
        F.months_between(F.lit("2024-06-15").cast("date"), F.col("ts")).alias("mb"),
        F.date_trunc("hour", "ts").alias("h"),
    ).collect()[0]
    assert row.ux == 1710505800  # 2024-03-15T12:30:00 UTC (session tz pinned)
    # same day-of-month on both sides → whole months (Spark semantics)
    assert row.mb == 3.0
    assert row.h.minute == 0


def test_seeded_rand_is_deterministic(spark):
    a = [r.x for r in spark.range(5).select(F.rand(7).alias("x")).collect()]
    b = [r.x for r in spark.range(5).select(F.rand(7).alias("x")).collect()]
    assert a == b
    assert all(0.0 <= v < 1.0 for v in a)


def test_select_expr_and_sort_within_partitions(spark):
    df = spark.createDataFrame(
        [(2, 20.0), (1, 10.0), (3, 30.0)], "k long, v double"
    ).repartition(2, "k")
    out = df.selectExpr("k", "v * 2 AS v2").sortWithinPartitions("k")
    rows = out.collect()
    assert {(r.k, r.v2) for r in rows} == {(1, 20.0), (2, 40.0), (3, 60.0)}
    # each partition is internally sorted
    parts = out.rdd.glom().collect()
    for p in parts:
        ks = [r.k for r in p]
        assert ks == sorted(ks)


def test_console_sink_writer_builds(spark, tmp_path):
    """Console sink is plumbing-only (side effect is stdout): assert the
    writer configures and starts against a bounded memory stream."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    q = (
        stream.writeStream.format("console")
        .option("checkpointLocation", str(tmp_path / "ckpt_console"))
        .start()
    )
    try:
        assert q.isActive
    finally:
        q.stop()


def test_variant_field_matches_from_json_and_null_contract(spark):
    """variant_field (Spark 4 VARIANT path, r7) reads the same typed
    values as from_json and keeps its null-on-corrupt contract."""
    from pyspark.sql import functions as F

    from flink_note_spark.functions.scalar import variant_field

    df = spark.createDataFrame(
        [
            ('{"k": 7}',),
            ('{"k": -3, "other": "x"}',),
            ('{"k": null}',),
            ('{"other": 1}',),   # missing field -> NULL
            ("not json",),       # corrupt -> NULL
            (None,),             # NULL input -> NULL
        ],
        "props string",
    )
    got = df.select(
        variant_field("props", "$.k", "int").alias("v"),
        F.from_json("props", "k int").getField("k").alias("fj"),
    ).collect()
    assert [r.v for r in got] == [7, -3, None, None, None, None]
    assert all(r.v == r.fj for r in got)
