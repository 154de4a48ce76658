"""Batch source/sink surface tests (SURVEY.md §2.1 S1/S2/S4/K1 — flagged
implemented-but-untested in round 1) plus the opt-in theta join.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_note_spark.operators.joins import theta_join
from flink_note_spark.sources.files import read_file, read_text, write_sink


def test_read_text_lines(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    df = read_text(spark, str(p))
    assert df.columns == ["value"]
    assert sorted(r.value for r in df.collect()) == ["alpha", "beta", "gamma"]


def test_read_file_csv_with_schema(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,name,score\n1,ann,2.5\n2,bob,3.5\n")
    df = read_file(
        spark, "csv", str(p), schema="id int, name string, score double",
        header="true",
    )
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("ann", 2.5), 2: ("bob", 3.5)}


def test_read_file_json(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"id": 1, "tag": "x"}\n{"id": 2, "tag": "y"}\n')
    df = read_file(spark, "json", str(p), schema="id long, tag string")
    assert {(r.id, r.tag) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_write_sink_partitioned_roundtrip(spark, tmp_path):
    """Partitioned parquet sink → directory layout enables partition
    pruning downstream; read-back equals what was written."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, grp string, v double",
    )
    out = tmp_path / "sink"
    write_sink(df, "parquet", str(out), partition_by=["grp"])
    assert (out / "grp=a").exists() and (out / "grp=b").exists()
    back = spark.read.parquet(str(out))
    assert {(r.id, r.grp, r.v) for r in back.collect()} == {
        (1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0),
    }


def test_theta_join_small_right(spark):
    """Arbitrary predicate (no equi key) joins via explicit broadcast
    nested loop."""
    left = spark.createDataFrame([(1, 5), (2, 15), (3, 25)], "id long, v long")
    bands = spark.createDataFrame(
        [(0, 10, "low"), (10, 20, "mid"), (20, 30, "high")],
        "lo long, hi long, band string",
    )
    out = theta_join(
        left, bands, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )
    assert {(r.id, r.band) for r in out.collect()} == {
        (1, "low"), (2, "mid"), (3, "high"),
    }


def test_kafka_source_surface(spark):
    """The Kafka wrapper builds the reader; without the connector jar in
    this environment, load fails with Spark's standard missing-source
    error (the surface exists; the dependency is deployment-provided)."""
    from flink_note_spark.sources.files import read_kafka

    try:
        df = read_kafka(spark, "localhost:9092", "events_topic")
    except Exception as e:  # noqa: BLE001
        msg = str(e).lower()
        assert "kafka" in msg or "data source" in msg
    else:
        # connector present: the standard kafka schema must be exposed
        assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP_SERVERS"),
    reason="no Kafka broker in this environment (set KAFKA_BOOTSTRAP_SERVERS "
    "to run the real round-trip; requires the spark-sql-kafka-0-10 "
    "connector on the session classpath)",
)
def test_kafka_round_trip(spark, tmp_path):
    """Env-gated real-broker round-trip (VERDICT r4 task 9): write a
    batch to a topic via the kafka sink format, read it back with
    read_kafka + availableNow, and compare payloads. Runs only where a
    broker (and the connector jar) actually exist; the in-container
    semantics are covered by the FileTopicDataSource analogue."""
    import uuid

    from flink_note_spark.sources.files import read_kafka

    servers = os.environ["KAFKA_BOOTSTRAP_SERVERS"]
    topic = f"fns_rt_{uuid.uuid4().hex[:8]}"
    payload = [(str(i), f"msg-{i}") for i in range(50)]
    (
        spark.createDataFrame(payload, "key string, value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .save()
    )
    stream = read_kafka(spark, servers, topic, starting_offsets="earliest")
    out = str(tmp_path / "sink")
    q = (
        stream.selectExpr("CAST(key AS STRING) k", "CAST(value AS STRING) v")
        .writeStream.format("memory")
        .queryName(f"kafka_rt_{topic}")
        .trigger(availableNow=True)
        .option("checkpointLocation", out)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = {
        (r.k, r.v)
        for r in spark.sql(f"SELECT * FROM kafka_rt_{topic}").collect()
    }
    assert got == set(payload)


def test_theta_join_guard_refuses_big_right(spark):
    left = spark.range(10)
    right = spark.range(1000).withColumnRenamed("id", "rid")
    with pytest.raises(ValueError, match="nested-loop"):
        theta_join(left, right, F.col("id") < F.col("rid"), max_right_rows=100)


def test_custom_sequence_source_batch_splits(spark):
    """S5: the registered Python data source serves spark.read with
    driver-side split planning — every id exactly once, spread over the
    requested number of input partitions (one task per split)."""
    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    df = (
        spark.read.format("flink_note_sequence")
        .option("numRows", 100)
        .option("numPartitions", 8)
        .load()
    )
    rows = df.withColumn("pid", F.spark_partition_id()).collect()
    assert sorted(r.id for r in rows) == list(range(100))
    assert all(r.payload == f"payload-{r.id}" for r in rows)
    assert len({r.pid for r in rows}) == 8


def test_custom_sequence_source_filter_pushdown(spark):
    """Supported id comparisons narrow the generated range at the
    source (excluded splits never exist); unsupported filters are handed
    back and still applied by Spark — results stay correct either way."""
    from flink_note_spark.sources.custom import (
        _SequenceBatchReader,
        register_custom_sources,
    )
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan, StringContains

    # unit: the reader narrows its range and returns only the leftover
    r = _SequenceBatchReader({"numrows": "1000"})
    rest = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 990),
                LessThan(("id",), 995),
                StringContains(("payload",), "99"),
            ]
        )
    )
    assert (r.start, r.end) == (990, 995)
    assert len(rest) == 1 and isinstance(rest[0], StringContains)

    # end-to-end: pushed + post-scan filters compose correctly
    register_custom_sources(spark)
    df = (
        spark.read.format("flink_note_sequence")
        .option("numRows", 1000)
        .load()
        .filter((F.col("id") >= 990) & (F.col("id") < 995) & F.col("payload").contains("99"))
    )
    assert sorted(r.id for r in df.collect()) == [990, 991, 992, 993, 994]


def test_custom_sequence_source_stream_offsets(spark, tmp_path):
    """S5 streaming: offset-tracked microbatches drain to exactly the
    bounded id range — no duplicates, no loss — through Spark's normal
    checkpointed offset protocol (rowsPerBatch 10 over 37 rows = 4
    batches, last one short)."""
    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    q = (
        spark.readStream.format("flink_note_sequence")
        .option("rowsPerBatch", 10)
        .option("maxRows", 37)
        .load()
        .writeStream.format("memory")
        .queryName("seq_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.id for r in spark.sql("select id from seq_stream").collect())
    assert got == list(range(37))


def test_custom_meter_sink_batch_manifest(spark, tmp_path):
    """K1/S5 sink half: the custom writer counts per task, the driver
    commit aggregates into one atomic JSON manifest."""
    import json

    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    out = tmp_path / "meter"
    (
        spark.range(123)
        .selectExpr("id", "repeat('x', 4) as payload")
        .write.format("flink_note_meter")
        .option("path", str(out))
        .mode("append")
        .save()
    )
    m = json.loads((out / "manifest.json").read_text())
    assert m["rows"] == 123
    assert m["tasks"] >= 1
    assert m["bytes_approx"] > 0


def test_custom_meter_sink_streaming_per_batch(spark, tmp_path):
    """Streaming commit is per-microbatch: source (custom) to sink
    (custom) end-to-end — per-batch manifests sum to exactly the bounded
    input, committed through Spark's offset protocol."""
    import json

    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    out = tmp_path / "meter_stream"
    q = (
        spark.readStream.format("flink_note_sequence")
        .option("rowsPerBatch", 10)
        .option("maxRows", 25)
        .load()
        .writeStream.format("flink_note_meter")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    manifests = sorted(out.glob("manifest-*.json"))
    assert manifests, "streaming commit wrote no manifests"
    total = sum(json.loads(p.read_text())["rows"] for p in manifests)
    assert total == 25


def _write_topic(path, partitions):
    import json

    path.mkdir(parents=True, exist_ok=True)
    for pid, recs in partitions.items():
        with open(path / f"part-{pid}.jsonl", "a") as f:
            for k, v in recs:
                f.write(json.dumps({"key": k, "value": v}) + "\n")


def test_file_topic_batch_read(spark, tmp_path):
    """Kafka-analogue batch read: one split per partition file, offsets
    are line numbers ordered within each partition."""
    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    topic = tmp_path / "topic"
    _write_topic(topic, {0: [("a", "1"), ("b", "2")], 1: [("c", "3")]})
    rows = (
        spark.read.format("flink_note_topic")
        .option("path", str(topic))
        .load()
        .orderBy("partition", "offset")
        .collect()
    )
    assert [(r.key, r.value, r.partition, r.offset) for r in rows] == [
        ("a", "1", 0, 0),
        ("b", "2", 0, 1),
        ("c", "3", 1, 0),
    ]


def test_topic_produce_consume_round_trip(spark, tmp_path):
    """Producer half (r5): topic_produce appends a DataFrame to the
    topic in reader format — every record comes back exactly once via
    the batch reader, one key's records stay in one partition in
    produce order, and a SECOND produce appends (offsets continue)
    rather than truncates."""
    from flink_note_spark.sources.custom import (
        register_custom_sources,
        topic_produce,
    )

    register_custom_sources(spark)
    topic = str(tmp_path / "topic_rt")
    batch1 = [(f"k{i % 7}", f"v{i}") for i in range(50)]
    # coalesce(1) = ONE producer task: per-key order is guaranteed only
    # within a producer task's batch (same as Kafka across producers)
    topic_produce(
        spark.createDataFrame(batch1, "key string, value string").coalesce(1),
        topic, n_partitions=4,
    )

    def read_all():
        return (
            spark.read.format("flink_note_topic")
            .option("path", topic)
            .load()
            .collect()
        )

    rows = read_all()
    assert sorted((r.key, r.value) for r in rows) == sorted(batch1)
    # keyed partitioning: each key lives in exactly one partition, and
    # its values appear in produce order within that partition
    by_key_parts = {}
    for r in rows:
        by_key_parts.setdefault(r.key, set()).add(r.partition)
    assert all(len(p) == 1 for p in by_key_parts.values())
    for key in {k for k, _ in batch1}:
        seq = [
            int(r.value[1:])
            for r in sorted(rows, key=lambda r: r.offset)
            if r.key == key
        ]
        assert seq == sorted(seq), f"produce order lost for {key}"

    batch2 = [("k0", "v100"), ("k1", "v101")]
    topic_produce(
        spark.createDataFrame(batch2, "key string, value string"),
        topic,  # partition count adopted from the existing topic
    )
    rows2 = read_all()
    assert sorted((r.key, r.value) for r in rows2) == sorted(batch1 + batch2)

    # re-keying an existing topic with a different partition count would
    # split keys across partitions — refused explicitly
    with pytest.raises(ValueError, match="4 partitions"):
        topic_produce(
            spark.createDataFrame(batch2, "key string, value string"),
            topic, n_partitions=8,
        )


def test_file_topic_stream_tails_incrementally(spark, tmp_path):
    """Kafka-shaped streaming: per-partition consumer offsets advance as
    the log grows — the second batch carries ONLY the appended records,
    with per-partition offset order preserved, through the partitioned
    (executor-read) stream API."""
    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    topic = tmp_path / "topic"
    _write_topic(topic, {0: [("a", "1")], 1: [("b", "2")]})
    q = (
        spark.readStream.format("flink_note_topic")
        .option("path", str(topic))
        .load()
        .writeStream.format("memory")
        .queryName("topic_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r.key, r.partition, r.offset)
            for r in spark.sql("select * from topic_stream").collect()
        }
        assert first == {("a", 0, 0), ("b", 1, 0)}

        _write_topic(topic, {0: [("c", "3")], 2: [("d", "4")]})
        q.processAllAvailable()
        allrows = {
            (r.key, r.partition, r.offset)
            for r in spark.sql("select * from topic_stream").collect()
        }
        # only the appended lines arrived, new partition picked up
        assert allrows == first | {("c", 0, 1), ("d", 2, 0)}
    finally:
        q.stop()


def test_file_topic_restart_exactly_once(spark, tmp_path):
    """The exactly-once claim end-to-end: drain, stop, append, restart
    from the SAME checkpoint into the same parquet sink — every record
    lands exactly once (offsets resume from the checkpoint; the replayed
    range, if any, rewrites its own batch deterministically)."""
    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    topic, sink, ckpt = tmp_path / "topic", tmp_path / "sink", tmp_path / "ckpt"
    _write_topic(topic, {0: [("a", "1")], 1: [("b", "2")]})

    def run_and_drain():
        q = (
            spark.readStream.format("flink_note_topic")
            .option("path", str(topic))
            .load()
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_and_drain()
    _write_topic(topic, {0: [("c", "3")], 1: [("d", "4")]})
    run_and_drain()

    rows = sorted(
        (r.key, r.partition, r.offset)
        for r in spark.read.parquet(str(sink)).collect()
    )
    assert rows == [("a", 0, 0), ("b", 1, 0), ("c", 0, 1), ("d", 1, 1)]


def test_file_topic_torn_tail_not_committed(spark, tmp_path):
    """A partial trailing line (producer crashed mid-write) is NOT a
    record: it is invisible until its newline lands, then arrives intact
    exactly once — offsets never name half-written bytes."""
    import json

    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    topic = tmp_path / "topic"
    _write_topic(topic, {0: [("a", "1")]})
    part0 = topic / "part-0.jsonl"
    # torn append: record bytes land, newline does not
    with open(part0, "a") as f:
        f.write(json.dumps({"key": "b", "value": "2"}))

    q = (
        spark.readStream.format("flink_note_topic")
        .option("path", str(topic))
        .load()
        .writeStream.format("memory")
        .queryName("torn_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.key, r.offset) for r in spark.sql("select * from torn_tail").collect()}
        assert got == {("a", 0)}, "torn line must be invisible"

        with open(part0, "a") as f:
            f.write("\n" + json.dumps({"key": "c", "value": "3"}) + "\n")
        q.processAllAvailable()
        got = {(r.key, r.offset) for r in spark.sql("select * from torn_tail").collect()}
        assert got == {("a", 0), ("b", 1), ("c", 2)}
    finally:
        q.stop()


def test_file_topic_replay_is_byte_identical(spark, tmp_path):
    """The invariant behind crash recovery (offset WAL written, commit
    missing, batch replayed): re-reading the SAME checkpointed
    [records, bytes] range must yield identical records even after the
    log grew in between — driven at the reader level, where the replay
    path is reachable deterministically. Also covers the legacy
    bare-record-count offset shape (pre-[records, bytes] checkpoints)."""
    from flink_note_spark.sources.custom import FileTopicDataSource

    topic = tmp_path / "topic"
    _write_topic(topic, {0: [("a", "1"), ("b", "2")]})

    def reader():
        return FileTopicDataSource({"path": str(topic)}).streamReader(None)

    r1 = reader()
    start = r1.initialOffset()
    end = r1.latestOffset()
    slices = r1.partitions(start, end)
    first = [row for sl in slices for row in r1.read(sl)]
    assert [r[0] for r in first] == ["a", "b"]

    # log grows AFTER the offsets were checkpointed...
    _write_topic(topic, {0: [("c", "3")]})
    # ...a fresh reader (post-crash restart: empty tip cache) replays the
    # same (start, end) range — byte-identical result, no bleed from "c"
    r2 = reader()
    replay = [row for sl in r2.partitions(start, end) for row in r2.read(sl)]
    assert replay == first

    # legacy int-shaped offsets (old checkpoints) resolve to the same rows
    legacy = [
        row
        for sl in r2.partitions({"0": 0}, {"0": 2})
        for row in r2.read(sl)
    ]
    assert legacy == first


def test_file_topic_batch_missing_dir_raises(spark, tmp_path):
    """A bounded read of a nonexistent topic is a caller error (typo'd
    path), not an empty success."""
    import pytest as _pytest

    from flink_note_spark.sources.custom import register_custom_sources

    register_custom_sources(spark)
    with _pytest.raises(Exception, match="does not exist"):
        (
            spark.read.format("flink_note_topic")
            .option("path", str(tmp_path / "nope"))
            .load()
            .collect()
        )


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """partitionOverwriteMode=dynamic (the warehouse INSERT OVERWRITE
    PARTITION contract): rewriting one partition's rows must leave the
    other partitions' files intact — static mode would wipe them."""
    out = str(tmp_path / "dynsink")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, grp string, v double",
    )
    write_sink(base, "parquet", out, partition_by=["grp"])

    update = spark.createDataFrame([(9, "a", 99.0)], "id long, grp string, v double")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        update.write.mode("overwrite").partitionBy("grp").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = {(r.id, r.grp, r.v) for r in spark.read.parquet(out).collect()}
    # grp=a replaced wholesale; grp=b untouched
    assert back == {(9, "a", 99.0), (2, "b", 20.0)}
