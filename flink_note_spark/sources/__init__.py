"""Sources & sinks.

Maps the reference's source stack — ``readTextFile`` / ``readFile`` with
``FileProcessingMode`` (``ExecutionEnviromentreadTextFile创建DataSource
分析.md:3-18``), ``ContinuousFileMonitoringFunction`` (``NOTES:23-25``),
FLIP-27 readers (``flink_arch.drawio`` page "Source") — onto Spark's
DataFrameReader and the Structured Streaming file source (SURVEY.md §2.1
S1–S6).
"""

from flink_note_spark.sources.files import (
    read_file,
    read_file_stream,
    read_text,
    read_text_stream,
    write_sink,
    write_stream_sink,
)

__all__ = [
    "read_file",
    "read_file_stream",
    "read_text",
    "read_text_stream",
    "write_sink",
    "write_stream_sink",
]
