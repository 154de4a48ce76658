"""Flink-style ``ExecutionEnvironment`` facade — the reference's
user-facing entry point (``ExecutionEnviromentreadTextFile创建DataSource
分析.md:3-32``: ``env.readTextFile`` / ``env.readFile`` with
``FileProcessingMode``, ``env.addSource``, job-control verbs) re-expressed
over this repo's Spark-first implementations.

A user of the reference writes::

    env  = StreamExecutionEnvironment.getExecutionEnvironment()
    text = env.readTextFile(path)            # or readFile(fmt, mode=...)
    ...transformations...
    env.execute("job")

The PySpark-native translation keeps the verbs but not the runtime model:

- one :class:`ExecutionEnvironment` wraps one ``SparkSession``;
- bounded/unbounded is chosen per source (``PROCESS_ONCE`` →
  ``spark.read``, ``PROCESS_CONTINUOUSLY`` → ``spark.readStream``),
  mirroring the reference's ``FileProcessingMode`` dispatch;
- there is no ``env.execute()`` barrier: batch plans run at their action
  (Spark is lazy per-action, not per-program) and streams run from
  ``start()``; :meth:`execute` exists for parity and documents this;
- job-control verbs delegate to :mod:`flink_note_spark.streaming.control`
  (C1) and custom sources to the Python Data Source API (S5).

Everything here is a thin delegation layer — semantics, scale posture and
tests live with the delegated implementations; the facade's own tests
only pin the wiring.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from flink_note_spark.session import get_spark
from flink_note_spark.sources import custom as _custom
from flink_note_spark.sources import files as _files
from flink_note_spark.streaming import control as _control

#: Reference FileProcessingMode values (``NOTES:3-9``).
PROCESS_ONCE = "PROCESS_ONCE"
PROCESS_CONTINUOUSLY = "PROCESS_CONTINUOUSLY"


class ExecutionEnvironment:
    """One environment per session; create with :meth:`get_execution_environment`
    (Flink's factory-method idiom) or wrap an existing session directly."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        _custom.register_custom_sources(spark)

    @classmethod
    def get_execution_environment(
        cls, app_name: str = "flink-note-spark"
    ) -> "ExecutionEnvironment":
        return cls(get_spark(app_name))

    # --- sources (S1/S2/S5) ------------------------------------------------

    def read_text_file(self, path: str) -> DataFrame:
        """S1 ``readTextFile``: bounded line-by-line scan."""
        return _files.read_text(self.spark, path)

    def read_file(
        self,
        fmt: str,
        path: str,
        schema: StructType | str | None = None,
        mode: str = PROCESS_ONCE,
        **options: str,
    ) -> DataFrame:
        """S2 ``readFile(format, path, mode)``: ``PROCESS_ONCE`` is a
        bounded read; ``PROCESS_CONTINUOUSLY`` is a directory-watch
        stream (schema mandatory there, like the reference's
        ``TypeInformation``)."""
        if mode == PROCESS_ONCE:
            return _files.read_file(self.spark, fmt, path, schema, **options)
        if mode == PROCESS_CONTINUOUSLY:
            if schema is None:
                raise ValueError(
                    "PROCESS_CONTINUOUSLY requires an explicit schema "
                    "(the streaming analogue of Flink's TypeInformation)"
                )
            return _files.read_file_stream(self.spark, fmt, path, schema, **options)
        raise ValueError(f"unknown FileProcessingMode {mode!r}")

    def from_collection(
        self, rows: Iterable[Any], schema: StructType | str
    ) -> DataFrame:
        """``env.fromCollection``: bounded in-memory source."""
        return self.spark.createDataFrame(list(rows), schema)

    def from_sequence(self, n: int, start: int = 0) -> DataFrame:
        """``env.fromSequence``: deterministic bounded integer sequence,
        served by the registered custom source (split-enumerated)."""
        return (
            self.spark.read.format("flink_note_sequence")
            .option("start", str(start))
            .option("numRows", str(n))
            .load()
        )

    def add_source(self, datasource_cls, stream: bool = False, **options) -> DataFrame:
        """S5 ``addSource(SourceFunction)``: register a Python DataSource
        subclass and read it (``stream=True`` → ``readStream``)."""
        self.spark.dataSource.register(datasource_cls)
        reader = self.spark.readStream if stream else self.spark.read
        reader = reader.format(datasource_cls.name())
        for k, v in options.items():
            reader = reader.option(k, str(v))
        return reader.load()

    def from_topic(self, path: str, stream: bool = True) -> DataFrame:
        """Kafka-consumer parity (``env.addSource(new FlinkKafkaConsumer
        (...))``) over the broker-free ``flink_note_topic`` analogue:
        (key, value, partition, offset) rows, per-partition consumer
        offsets as stream state. ``stream=False`` reads the whole topic
        as a bounded frame."""
        from flink_note_spark.sources.custom import FileTopicDataSource

        return self.add_source(FileTopicDataSource, stream=stream, path=path)

    def to_topic(
        self,
        df: DataFrame,
        path: str,
        n_partitions: int | None = None,
        key_col: str = "key",
        value_col: str = "value",
        checkpoint: str | None = None,
    ):
        """Kafka-producer parity (``addSink(new FlinkKafkaProducer
        (...))``): bounded frames append once; unbounded frames produce
        per micro-batch through ``foreachBatch`` (at-least-once, like a
        non-transactional Kafka producer — pass ``checkpoint`` for
        restart dedup at the source side)."""
        from flink_note_spark.sources.custom import topic_produce

        if not df.isStreaming:
            topic_produce(df, path, n_partitions, key_col, value_col)
            return None
        writer = df.writeStream.foreachBatch(
            lambda batch_df, _bid: topic_produce(
                batch_df, path, n_partitions, key_col, value_col
            )
        )
        if checkpoint is not None:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()

    def socket_text_stream(self, host: str, port: int) -> DataFrame:
        """``env.socketTextStream`` → Spark's built-in socket source."""
        return (
            self.spark.readStream.format("socket")
            .option("host", host)
            .option("port", str(port))
            .load()
        )

    def rate_stream(self, rows_per_second: int = 10) -> DataFrame:
        """Flink datagen/rate analogue (test/benchmark source)."""
        return _files.read_rate(self.spark, rows_per_second)

    # --- physical partitioning verbs (DataStream rebalance/rescale/...) ----

    def rebalance(self, df: DataFrame, parallelism: int | None = None
                  ) -> DataFrame:
        """Flink ``.rebalance()`` — round-robin redistribution: a plain
        ``repartition(n)`` (RoundRobinPartitioning; Spark's AQE may
        coalesce downstream, which is the desired behaviour at scale).

        With ``parallelism`` omitted, Flink redistributes at the
        downstream operator's parallelism; the analogue here is the
        session's shuffle parallelism (``spark.sql.shuffle.partitions``
        — ``df.repartition()`` takes no zero-arg form in PySpark)."""
        if parallelism is None:
            parallelism = int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "200")
            )
        return df.repartition(parallelism)

    def rescale(self, df: DataFrame, parallelism: int) -> DataFrame:
        """Flink ``.rescale()`` — reduce parallelism WITHOUT a full
        shuffle: ``coalesce(n)`` merges co-located partitions exactly
        like rescale's local round-robin (no network redistribution)."""
        return df.coalesce(parallelism)

    def partition_custom(self, df: DataFrame, *cols: str,
                         parallelism: int | None = None) -> DataFrame:
        """Flink ``.partitionCustom(partitioner, key)`` — hash-partition
        by the given columns so equal keys co-locate
        (``repartition(cols...)``, HashPartitioning)."""
        if not cols:
            raise ValueError("partition_custom requires at least one column")
        if parallelism:
            return df.repartition(parallelism, *cols)
        return df.repartition(*cols)

    def broadcast_side(self, df: DataFrame) -> DataFrame:
        """Flink ``.broadcast()`` on a join input — the broadcast HINT
        (Spark replicates at the join, not as a standalone exchange)."""
        from pyspark.sql.functions import broadcast

        return broadcast(df)

    # --- CEP (Flink CEP.pattern) -------------------------------------------

    def cep(self, df: DataFrame, pattern, **kwargs) -> DataFrame:
        """``CEP.pattern(stream, Pattern.begin(...)...)`` parity verb:
        dispatches to the batch matcher (bounded frames — full
        quantifier/negation/mixed-contiguity surface) or the incremental
        streaming matcher (unbounded frames — plain/times patterns).
        ``pattern`` is an ``operators.cep.Pattern``, a type list, or a
        step-spec list; kwargs pass through (``within=``, ``key_col=``,
        ``watermark=`` for streams, ``tiebreak=`` for batch)."""
        if df.isStreaming:
            from flink_note_spark.streaming.ops import match_pattern_stream

            return match_pattern_stream(df, pattern, **kwargs)
        from flink_note_spark.operators.cep import match_pattern

        return match_pattern(df, pattern, **kwargs)

    # --- sinks (K1) --------------------------------------------------------

    def add_sink(self, df: DataFrame, fmt: str, path: str, **kwargs):
        """K1 ``addSink``: batch write (bounded frames) or checkpointed
        streaming write (unbounded frames — pass ``checkpoint=``; the
        query is STARTED and returned, matching Flink where the sink
        runs once the program does)."""
        if df.isStreaming:
            return _files.write_stream_sink(df, fmt, path, **kwargs).start()
        return _files.write_sink(df, fmt, path, **kwargs)

    # --- job control (C1/C2) ----------------------------------------------

    def execute(self, job_name: str | None = None) -> None:
        """Parity no-op: Spark has no program-level barrier — batch plans
        run at their action, streams at ``start()``. Kept so reference
        programs port line-for-line; returns immediately."""

    def list_jobs(self) -> list[dict]:
        return _control.list_queries(self.spark)

    def job_status(self, name: str) -> dict:
        return _control.query_status(_control.get_query(self.spark, name))

    def stop_job(self, name: str, timeout_sec: float = 60.0) -> None:
        _control.stop_query(self.spark, name, timeout_sec=timeout_sec)

    def cancel_job(self, name: str) -> None:
        _control.cancel_query(self.spark, name)

    def savepoint(self, name: str, checkpoint_dir: str, savepoint_dir: str) -> str:
        return _control.savepoint(self.spark, name, checkpoint_dir, savepoint_dir)

    def restore_from(self, savepoint_dir: str, checkpoint_dir: str) -> str:
        return _control.restore_from(savepoint_dir, checkpoint_dir)
