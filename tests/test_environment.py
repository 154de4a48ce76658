"""Facade wiring tests for the Flink-style ExecutionEnvironment
(reference entry-point parity; semantics are tested with the delegated
implementations — these tests pin only the verb wiring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_note_spark.environment import (
    PROCESS_CONTINUOUSLY,
    PROCESS_ONCE,
    ExecutionEnvironment,
)


@pytest.fixture()
def env(spark):
    return ExecutionEnvironment(spark)


def test_read_text_file_and_modes(env, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.txt").write_text("x\ny\n")
    assert env.read_text_file(str(p)).count() == 2

    batch = env.read_file("text", str(p), mode=PROCESS_ONCE)
    assert batch.count() == 2
    stream = env.read_file(
        "text", str(p), schema="value string", mode=PROCESS_CONTINUOUSLY
    )
    assert stream.isStreaming

    with pytest.raises(ValueError, match="TypeInformation"):
        env.read_file("text", str(p), mode=PROCESS_CONTINUOUSLY)
    with pytest.raises(ValueError, match="FileProcessingMode"):
        env.read_file("text", str(p), mode="SOMETIMES")


def test_from_sequence_and_collection(env):
    assert env.from_sequence(7, start=3).agg({"id": "sum"}).collect()[0][0] == sum(
        range(3, 10)
    )
    df = env.from_collection([(1, "a"), (2, "b")], "k int, v string")
    assert df.count() == 2


def test_add_source_and_sink_roundtrip(env, tmp_path):
    from flink_note_spark.sources.custom import SequenceDataSource

    df = env.add_source(SequenceDataSource, numRows=5)
    assert [r.id for r in df.orderBy("id").collect()] == [0, 1, 2, 3, 4]

    out = tmp_path / "out"
    env.add_sink(df, "parquet", str(out))
    assert env.read_file("parquet", str(out)).count() == 5


def test_streaming_job_verbs_through_env(env, tmp_path):
    from flink_note_spark.sources.custom import SequenceDataSource

    stream = env.add_source(
        SequenceDataSource, stream=True, rowsPerBatch=5, maxRows=10
    )
    q = env.add_sink(
        stream,
        "parquet",
        str(tmp_path / "sink"),
        checkpoint=str(tmp_path / "ckpt"),
        query_name="env_verbs",
    )
    try:
        assert any(j["name"] == "env_verbs" for j in env.list_jobs())
        assert "message" in env.job_status("env_verbs")
        q.processAllAvailable()
    finally:
        env.stop_job("env_verbs", timeout_sec=30)
    assert env.read_file("parquet", str(tmp_path / "sink")).count() == 10
    env.execute("parity-no-op")


def test_topic_source_sink_through_env(env, tmp_path):
    """Kafka consumer/producer parity verbs: to_topic on a bounded frame
    appends to the topic, from_topic(stream=False) reads it back; the
    streaming producer drains a file stream into the topic per batch."""
    spark = env.spark
    topic = str(tmp_path / "env_topic")
    env.to_topic(
        spark.createDataFrame(
            [("a", "1"), ("b", "2"), ("a", "3")], "key string, value string"
        ).coalesce(1),
        topic,
        n_partitions=2,
    )
    back = env.from_topic(topic, stream=False)
    assert not back.isStreaming
    assert sorted((r.key, r.value) for r in back.collect()) == [
        ("a", "1"), ("a", "3"), ("b", "2"),
    ]

    # streaming produce: rows flow source -> foreachBatch -> topic
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame(
        [("c", "9")], "key string, value string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / "f1"))
    stream = spark.readStream.schema("key string, value string").parquet(
        str(src_dir / "*")
    )
    q = env.to_topic(
        stream, topic, n_partitions=2,
        checkpoint=str(tmp_path / "ckpt_topic"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    vals = {(r.key, r.value) for r in env.from_topic(topic, stream=False).collect()}
    assert ("c", "9") in vals


def test_env_cep_dispatches_batch_and_stream(spark, tmp_path):
    """env.cep (CEP.pattern parity verb): bounded frames hit the batch
    matcher with the full surface; unbounded frames return a streaming
    plan from the incremental matcher."""
    import datetime as dt

    from flink_note_spark.environment import ExecutionEnvironment
    from flink_note_spark.operators.cep import Pattern

    env = ExecutionEnvironment.get_execution_environment(spark)
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base, "A", 1),
         (1, base + dt.timedelta(seconds=10), "B", 2)],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    p = Pattern.begin("A").followed_by("B")
    out = env.cep(df, p)
    assert [(r.user_id,) for r in out.collect()] == [(1,)]

    sdir = tmp_path / "cep_env_stream"
    sdir.mkdir()
    df.write.mode("overwrite").parquet(str(sdir / "c1.parquet"))
    stream = spark.readStream.schema(df.schema).parquet(str(sdir))
    sout = env.cep(stream, ["A", "B"], watermark="1 minute")
    assert sout.isStreaming and "ts_1" in sout.columns


def test_partitioning_verbs(spark):
    """Flink physical-partitioning verb parity (r7): rebalance →
    round-robin repartition, rescale → shuffle-free coalesce,
    partition_custom → hash co-location, broadcast_side → join hint."""
    from flink_note_spark.environment import ExecutionEnvironment
    from flink_note_spark.plans.inspect import has_broadcast_join

    env = ExecutionEnvironment(spark)
    df = spark.range(100).withColumn("k", F.col("id") % 5)

    assert env.rebalance(df, 7).rdd.getNumPartitions() == 7
    # parallelism omitted → session shuffle parallelism (the Flink
    # downstream-parallelism default); r7's zero-arg repartition() was
    # a TypeError (ADVICE r7)
    n_default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert env.rebalance(df).rdd.getNumPartitions() == n_default
    assert env.rescale(df.repartition(8), 2).rdd.getNumPartitions() == 2
    # rescale must NOT introduce an exchange (coalesce, not shuffle)
    plan = env.rescale(df.repartition(8), 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Coalesce" in plan

    parts = env.partition_custom(df, "k", parallelism=4)
    assert parts.rdd.getNumPartitions() == 4
    # equal keys co-locate: every key maps to exactly one partition id
    pk = (
        parts.withColumn("p", F.spark_partition_id())
        .groupBy("k").agg(F.countDistinct("p").alias("np"))
    )
    assert all(r.np == 1 for r in pk.collect())
    with pytest.raises(ValueError, match="at least one column"):
        env.partition_custom(df)

    dim = spark.range(3).withColumn("v", F.lit("x"))
    joined = df.join(env.broadcast_side(dim), "id")
    assert has_broadcast_join(joined)
