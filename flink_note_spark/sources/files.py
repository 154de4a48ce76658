"""File sources and sinks (batch + streaming).

Reference semantics being re-expressed (SURVEY.md §2.1):

- S1 ``readTextFile`` → :func:`read_text` / :func:`read_text_stream`.
- S2 ``readFile(format, path, mode, interval, typeInfo)``
  (``NOTES:3-9``) → :func:`read_file` (PROCESS_ONCE ≈ batch read or
  ``Trigger.AvailableNow``) and :func:`read_file_stream`
  (PROCESS_CONTINUOUSLY ≈ file stream source; the poll ``interval``
  becomes ``Trigger.ProcessingTime`` at ``writeStream`` time).
- S3 monitor/reader split (``ContinuousFileMonitoringFunction``,
  ``NOTES:23-25``) is built into Spark's FileStreamSource: the driver
  lists new files per micro-batch, executors read splits.
- K1 sinks → :func:`write_sink` / :func:`write_stream_sink`
  (exactly-once on files via the manifest the file sink writes under
  ``_spark_metadata`` + checkpointing, SURVEY.md §2.2).

``TypeInformation`` (``NOTES:3-7``) maps to an explicit schema: streaming
reads REQUIRE one (Spark contract), batch reads accept one — matching the
survey's declared-schema policy (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Bounded line-by-line text scan (reference S1/S4, ``NOTES:53-101``).
    Splits + per-partition open-once are Spark's FilePartition machinery."""
    return spark.read.text(path)


def read_text_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Unbounded text source watching a directory (reference S1 streaming
    flavor; PROCESS_CONTINUOUSLY, ``NOTES:3-9``)."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path)


def read_file(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Bounded read of any format (reference S2, PROCESS_ONCE mode)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_file_stream(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Unbounded directory-watch source (reference S2 PROCESS_CONTINUOUSLY;
    S3's monitor/reader split is internal to Spark's FileStreamSource).

    Schema is mandatory — the streaming analogue of the reference passing
    ``TypeInformation`` at source creation (``NOTES:3-7``).
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    **options: str,
) -> DataFrame:
    """Kafka unbounded source (SURVEY.md §2.2 sources table) — returns the
    standard (key, value, topic, partition, offset, timestamp) frame.

    Requires the ``spark-sql-kafka-0-10`` connector package on the
    session classpath (not bundled in this environment — declared
    out-of-scope for the t1/t2 test tiers, SURVEY.md §2.2); without it
    Spark raises its standard missing-data-source error at load time.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_rate(
    spark: SparkSession,
    rows_per_second: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Unbounded synthetic source emitting (timestamp, value) rows at a
    fixed rate — the test/benchmark source (reference closure: Flink's
    datagen/rate source, SURVEY.md §2.2 sources table). Useful for
    load-testing operator chains without any input files."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    )
    if num_partitions:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load()


def foreach_batch_sink(
    df: DataFrame,
    fn,
    checkpoint: str,
    trigger_once: bool = False,
    processing_time: str | None = None,
    output_mode: str | None = None,
):
    """Arbitrary per-micro-batch sink: ``fn(batch_df, batch_id)`` runs the
    full batch DataFrame API (upserts, multi-table writes, JDBC...) —
    Spark's rendering of a custom SinkFunction (SURVEY.md §2.2
    sources/sinks). Exactly-once requires ``fn`` to be idempotent on
    ``batch_id`` replay; the checkpoint guarantees each id is replayed
    with identical data.

    ``output_mode`` matters even though foreachBatch itself writes
    nothing: the engine validates it against upstream operators, and a
    stream through ``applyInPandasWithState`` (sessionize, streaming
    CEP) REQUIRES ``"update"`` — the default append is rejected at
    analysis time.
    """
    writer = df.writeStream.foreachBatch(fn).option(
        "checkpointLocation", checkpoint
    )
    if output_mode is not None:
        writer = writer.outputMode(output_mode)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer


def write_sink(df: DataFrame, fmt: str, path: str, mode: str = "overwrite",
               partition_by: list[str] | None = None) -> None:
    """Batch sink (reference K1). ``partition_by`` = directory-layout
    partitioning for downstream partition pruning at scale."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_stream_sink(
    df: DataFrame,
    fmt: str,
    path: str | None,
    checkpoint: str,
    output_mode: str = "append",
    trigger_once: bool = False,
    processing_time: str | None = None,
    query_name: str | None = None,
) -> DataStreamWriter:
    """Streaming sink with checkpointing (reference C2 savepoint-restore ≈
    restart from checkpoint dir, ``NOTES:382-389``). Returns the
    configured writer; caller invokes ``.start()``/``.toTable()``."""
    writer = df.writeStream.format(fmt).outputMode(output_mode).option(
        "checkpointLocation", checkpoint
    )
    if path:
        writer = writer.option("path", path)
    if query_name:
        writer = writer.queryName(query_name)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer
