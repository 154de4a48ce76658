"""Streaming job control — the reference's CLI job verbs re-expressed on
Structured Streaming's query lifecycle (SURVEY.md §2.1 C1/C2; the
reference traces ``cancel``/``stop``/``savepoint`` dispatch in its
CliFrontend walk-through,
``ExecutionEnviromentreadTextFile创建DataSource分析.md:365-371``).

Mapping (Flink verb → here):

- ``flink run``        → ``writer.start()`` (sources/files builders)
- ``flink list``       → :func:`list_queries`
- ``flink cancel``     → :func:`cancel_query` (hard stop, state kept in
  the checkpoint — Spark has no state-discarding cancel)
- ``flink stop -s``    → :func:`stop_query` (graceful stop; the
  checkpoint IS the savepoint: restart the same writer with the same
  checkpoint dir to resume exactly-once —
  tests/test_streaming.py::test_checkpoint_restart_no_duplicates)
- job status / metrics → :func:`query_status` / :func:`last_progress`
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


def list_queries(spark: SparkSession) -> list[dict[str, Any]]:
    """All active streaming queries: id, name, and whether data is being
    processed right now."""
    return [
        {
            "id": str(q.id),
            "run_id": str(q.runId),
            "name": q.name,
            "is_active": q.isActive,
        }
        for q in spark.streams.active
    ]


def get_query(spark: SparkSession, name: str) -> StreamingQuery:
    for q in spark.streams.active:
        if q.name == name:
            return q
    raise KeyError(f"no active streaming query named {name!r}")


def stop_query(spark: SparkSession, name: str, timeout_sec: float = 60.0) -> None:
    """Graceful stop: drain in-flight micro-batches, then stop. State
    stays in the checkpoint — restarting the same writer resumes from the
    committed offsets (the savepoint contract, reference C2)."""
    q = get_query(spark, name)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(timeout_sec)


def cancel_query(spark: SparkSession, name: str) -> None:
    """Hard cancel: stop without draining. The last committed batch is
    still exactly-once; uncommitted work replays on restart."""
    get_query(spark, name).stop()


def query_status(q: StreamingQuery) -> dict[str, Any]:
    """Live status: current activity + trigger readiness."""
    return dict(q.status)


def last_progress(q: StreamingQuery) -> dict[str, Any] | None:
    """Most recent micro-batch metrics (rows/sec, batch duration, state
    operator memory, watermark) — the per-job metrics surface."""
    return q.lastProgress
