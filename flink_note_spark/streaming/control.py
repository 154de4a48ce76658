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
- ``flink stop -s``    → :func:`stop_query` (graceful bounded drain) +
  :func:`savepoint` (snapshot the checkpoint dir — Spark's checkpoint
  carries exactly the offsets/commits/state a Flink savepoint would)
- ``savepoint -restore`` → :func:`restore_from` (materialize a snapshot
  as a fresh checkpoint dir; restart the same writer against it —
  tests/test_streaming.py::test_savepoint_restore_no_duplicates)
- job status / metrics → :func:`query_status` / :func:`last_progress`
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path
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


def stop_query(
    spark: SparkSession,
    name: str,
    timeout_sec: float = 60.0,
    poll_interval_sec: float = 0.2,
) -> None:
    """Graceful stop with a BOUNDED drain: poll the query's status until
    it reports no available data and no active trigger (drained), or the
    deadline passes — then stop either way.

    Deliberately not ``processAllAvailable()``: that call never returns
    on continuous sources (rate, Kafka), so a "graceful stop" built on it
    hangs forever (ADVICE r2 #1). Here ``timeout_sec`` bounds the WHOLE
    verb — drain poll, ``stop()`` itself (Spark's default
    ``spark.sql.streaming.stopTimeout=0`` waits FOREVER for the
    execution thread, so the remaining budget is installed for the call
    and restored after), and the termination wait, whose result is
    checked rather than discarded. Raises ``TimeoutError`` if the query
    has not confirmed termination by the deadline — callers like
    :func:`savepoint` depend on stop-has-completed, so an unconfirmed
    stop must be loud, not silent. Stopping at the deadline is safe:
    every committed micro-batch is exactly-once; undrained input replays
    on restart from the checkpoint."""
    q = get_query(spark, name)
    deadline = time.monotonic() + timeout_sec
    while time.monotonic() < deadline:
        st = q.status
        if not st.get("isDataAvailable") and not st.get("isTriggerActive"):
            break
        time.sleep(poll_interval_sec)
    stop_budget_ms = str(int(max(1.0, deadline - time.monotonic()) * 1000))
    prev = spark.conf.get("spark.sql.streaming.stopTimeout", None)
    spark.conf.set("spark.sql.streaming.stopTimeout", stop_budget_ms)
    try:
        q.stop()
    except Exception as e:  # Spark raises when the thread outlives the budget
        raise TimeoutError(
            f"stop_query({name!r}): execution thread did not stop within "
            f"{timeout_sec}s"
        ) from e
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stopTimeout")
        else:
            spark.conf.set("spark.sql.streaming.stopTimeout", prev)
    if not q.awaitTermination(max(1.0, deadline - time.monotonic())):
        raise TimeoutError(
            f"stop_query({name!r}): termination not confirmed within "
            f"{timeout_sec}s"
        )


def cancel_query(spark: SparkSession, name: str) -> None:
    """Hard cancel: stop without draining. The last committed batch is
    still exactly-once; uncommitted work replays on restart."""
    get_query(spark, name).stop()


def savepoint(
    spark: SparkSession,
    name: str,
    checkpoint_dir: str,
    savepoint_dir: str,
    timeout_sec: float = 60.0,
) -> str:
    """Flink's ``stop -s <dir>``: gracefully stop the query, then snapshot
    its checkpoint directory to ``savepoint_dir`` (reference C1 savepoint
    verb, ``ExecutionEnviromentreadTextFile创建DataSource分析.md:365-371``).

    Spark's checkpoint dir (offsets/, commits/, state/, metadata) is
    exactly the consistent self-contained unit a Flink savepoint is; the
    copy happens AFTER full termination so no half-written offset file
    can land in the snapshot. ``checkpoint_dir`` is caller-supplied — the
    writer that started the query owns it (Spark's public API does not
    expose it from a query handle). Returns ``savepoint_dir``."""
    stop_query(spark, name, timeout_sec=timeout_sec)
    src, dst = Path(checkpoint_dir), Path(savepoint_dir)
    if not src.is_dir():
        raise FileNotFoundError(f"savepoint: checkpoint dir {src} does not exist")
    if dst.exists():
        raise FileExistsError(f"savepoint: target {dst} already exists")
    _copytree_atomic(src, dst)
    return str(dst)


def _copytree_atomic(src: Path, dst: Path) -> None:
    """Copy into a sibling temp dir, then rename into place: a process
    killed mid-copy leaves only the temp dir (reclaimed on retry), never
    a torn snapshot that ``dst.exists()`` would mistake for a valid
    savepoint while also blocking the retry."""
    tmp = dst.parent / f".{dst.name}.__tmp__"
    if tmp.exists():
        shutil.rmtree(tmp)
    shutil.copytree(src, tmp)
    tmp.replace(dst)


def restore_from(savepoint_dir: str, checkpoint_dir: str) -> str:
    """Materialize a savepoint as a FRESH checkpoint dir and return it;
    restart the original writer with ``checkpoint=checkpoint_dir`` to
    resume exactly-once from the snapshot (Flink ``run -s``). The
    savepoint itself stays immutable, so one snapshot can seed any number
    of restores."""
    src, dst = Path(savepoint_dir), Path(checkpoint_dir)
    if not src.is_dir():
        raise FileNotFoundError(f"restore_from: savepoint {src} does not exist")
    if dst.exists():
        raise FileExistsError(
            f"restore_from: checkpoint target {dst} already exists — "
            "restores must not clobber a live checkpoint"
        )
    _copytree_atomic(src, dst)
    return str(dst)


def query_status(q: StreamingQuery) -> dict[str, Any]:
    """Live status: current activity + trigger readiness."""
    return dict(q.status)


def last_progress(q: StreamingQuery) -> dict[str, Any] | None:
    """Most recent micro-batch metrics (rows/sec, batch duration, state
    operator memory, watermark) — the per-job metrics surface."""
    return q.lastProgress
