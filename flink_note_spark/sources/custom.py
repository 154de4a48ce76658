"""Custom source registration — the Spark-first answer to the
reference's ``addSource(SourceFunction)`` / FLIP-27 source stack
(reference S5, ``NOTES:16-18, 112``).

Flink users write a ``SourceFunction`` (or a FLIP-27
SplitEnumerator + SourceReader pair) and hand it to ``addSource``;
the PySpark-native equivalent is the Python Data Source API
(``pyspark.sql.datasource``, Spark 4+): subclass :class:`DataSource`,
register it once per session, and both ``spark.read.format(name)`` and
``spark.readStream.format(name)`` dispatch to it. The mapping:

- FLIP-27 ``SplitEnumerator`` → :meth:`DataSourceReader.partitions`
  (driver-side split planning; each :class:`InputPartition` is a split);
- FLIP-27 ``SourceReader`` → :meth:`DataSourceReader.read` (executor-side
  per-split iterator, runs in parallel, one task per split);
- ``SourceFunction.run``/checkpointed offsets →
  :class:`SimpleDataSourceStreamReader` with ``initialOffset`` /
  ``read(start)`` / ``readBetweenOffsets`` (deterministic replay gives
  exactly-once with a checkpointed sink, reference C2);
- operator-chained predicate evaluation → :meth:`pushFilters`
  (supported ``id`` comparisons narrow the generated range at the
  SOURCE, so un-needed splits are never produced — the custom-source
  analogue of parquet predicate pushdown).

:class:`SequenceDataSource` is the shipped example: a deterministic
bounded/unbounded integer sequence (Flink's ``env.fromSequence`` /
``DataGeneratorSource`` shape) used by the tests; writing a new source
is "subclass + register", no JVM code.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _RangeSplit(InputPartition):
    begin: int  # inclusive
    end: int    # exclusive


def _payload(i: int) -> str:
    return f"payload-{i}"


class _SequenceBatchReader(DataSourceReader):
    """Split-enumerated bounded read of [start, start+numRows)."""

    def __init__(self, options):
        self.start = int(options.get("start", 0))
        self.end = self.start + int(options.get("numrows", 1000))
        self.num_partitions = int(options.get("numpartitions", 8))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Narrow [start, end) with supported ``id`` comparisons; yield
        back the rest for Spark to evaluate post-scan. Pushing a filter
        here means the excluded splits are never generated at all."""
        for f in filters:
            col = f.attribute[0] if f.attribute else None
            if col == "id" and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, int):
                if isinstance(f, EqualTo):
                    self.start = max(self.start, f.value)
                    self.end = min(self.end, f.value + 1)
                elif isinstance(f, GreaterThan):
                    self.start = max(self.start, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.start = max(self.start, f.value)
                elif isinstance(f, LessThan):
                    self.end = min(self.end, f.value)
                else:  # LessThanOrEqual
                    self.end = min(self.end, f.value + 1)
            else:
                yield f  # unsupported → Spark re-applies it post-scan

    def partitions(self) -> list[InputPartition]:
        """Driver-side split planning (SplitEnumerator analogue): carve
        the (possibly filter-narrowed) range into contiguous splits —
        one executor task each."""
        n = max(self.end - self.start, 0)
        parts = max(min(self.num_partitions, n), 1)
        step = -(-n // parts) if n else 1
        return [
            _RangeSplit(b, min(b + step, self.end))
            for b in range(self.start, self.end, step)
        ] or [_RangeSplit(self.start, self.start)]

    def read(self, split: _RangeSplit):
        """Executor-side per-split iterator (SourceReader analogue)."""
        for i in range(split.begin, split.end):
            yield (i, _payload(i))


class _SequenceStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked unbounded read: each microbatch emits the next
    ``rowsPerBatch`` ids; ``maxRows`` (optional) bounds the stream so
    tests and AvailableNow-style drains terminate. Offsets are plain
    dicts checkpointed by Spark; ``readBetweenOffsets`` regenerates any
    committed range deterministically — replay after failure yields the
    same rows, which is what makes the file-sink pipeline exactly-once
    (reference C2)."""

    def __init__(self, options):
        self.start = int(options.get("start", 0))
        self.rows_per_batch = int(options.get("rowsperbatch", 10))
        max_rows = options.get("maxrows")
        self.limit = None if max_rows is None else self.start + int(max_rows)

    def initialOffset(self) -> dict:
        return {"next": self.start}

    def read(self, start: dict):
        begin = start["next"]
        end = begin + self.rows_per_batch
        if self.limit is not None:
            end = min(end, self.limit)
        end = max(end, begin)
        # the rows part must be an ITERATOR (Spark calls next() on it)
        return (iter([(i, _payload(i)) for i in range(begin, end)]), {"next": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(i, _payload(i)) for i in range(start["next"], end["next"])])

    def commit(self, end: dict) -> None:
        pass  # nothing external to release — offsets live in the checkpoint


class SequenceDataSource(DataSource):
    """``flink_note_sequence``: deterministic integer sequence source,
    batch (split-enumerated, filter-pushdown) + streaming (offset
    replay). Options: ``start``, ``numRows``, ``numPartitions`` (batch);
    ``start``, ``rowsPerBatch``, ``maxRows`` (stream)."""

    @classmethod
    def name(cls) -> str:
        return "flink_note_sequence"

    def schema(self) -> str:
        return "id bigint, payload string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SequenceBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SequenceStreamReader(self.options)


def register_custom_sources(spark) -> None:
    """Register every custom source on the session (idempotent — the
    registry keeps the latest registration per name). Also enables
    Python-source filter pushdown (off by default in Spark 4.1): a
    reader that implements ``pushFilters`` fails analysis otherwise."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SequenceDataSource)
    spark.dataSource.register(MeterSinkDataSource)
    spark.dataSource.register(FileTopicDataSource)


@dataclass
class _CountCommit(WriterCommitMessage):
    rows: int
    bytes_approx: int


class _MeterWriter(DataSourceWriter):
    """Executor-side: drain the iterator, count rows/bytes, report via
    the commit message — the task writes nothing, so it measures the
    upstream plan exactly (the ``noop`` format with observability)."""

    def write(self, iterator) -> _CountCommit:
        rows = 0
        size = 0
        for row in iterator:
            rows += 1
            size += sum(len(str(v)) for v in row)
        return _CountCommit(rows=rows, bytes_approx=size)


class _MeterBatchWriter(_MeterWriter):
    def __init__(self, options):
        self.path = options.get("path") or options.get("manifest")

    def commit(self, messages) -> None:
        _write_manifest(self.path, messages, batch_id=None)

    def abort(self, messages) -> None:
        pass


class _MeterStreamWriter(_MeterWriter, DataSourceStreamWriter):
    """Streaming commit is per-microbatch and exactly-once: the manifest
    for a batch id is written atomically (tmp + rename), so a replayed
    batch overwrites its own manifest instead of double-counting — the
    idempotent-sink contract the reference reaches with
    ``TwoPhaseCommitSinkFunction`` (C2)."""

    def __init__(self, options):
        self.path = options.get("path") or options.get("manifest")

    def commit(self, messages, batchId: int) -> None:
        _write_manifest(self.path, messages, batch_id=batchId)

    def abort(self, messages, batchId: int) -> None:
        pass


def _write_manifest(path, messages, batch_id) -> None:
    """Driver-side commit: aggregate task counts into one JSON manifest
    (atomic rename — a torn file is never observable)."""
    if not path:
        return
    import json
    import os

    os.makedirs(path, exist_ok=True)
    name = "manifest.json" if batch_id is None else f"manifest-{batch_id}.json"
    out = {
        "rows": sum(m.rows for m in messages if m),
        "bytes_approx": sum(m.bytes_approx for m in messages if m),
        "tasks": sum(1 for m in messages if m),
    }
    if batch_id is not None:
        out["batch_id"] = batch_id
    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, os.path.join(path, name))


class MeterSinkDataSource(DataSource):
    """``flink_note_meter``: measuring blackhole sink (batch + stream).

    The custom-SINK half of the S5/K1 story (Flink ``addSink``): tasks
    count what flows through, the driver-side commit writes one JSON
    manifest per batch. Option ``path`` = manifest directory (omit for a
    pure blackhole). Exactly-once under retry: task messages from failed
    attempts are dropped by Spark; the per-batch manifest rename is
    idempotent on replay."""

    @classmethod
    def name(cls) -> str:
        return "flink_note_meter"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _MeterBatchWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _MeterStreamWriter(self.options)


@dataclass
class _TopicSlice(InputPartition):
    """One (partition file, record+byte range) split — read executor-side.
    Byte positions let the executor ``seek`` straight to its range; record
    indices number the emitted ``offset`` column."""
    path: str
    pid: int
    begin_rec: int   # record index, inclusive
    end_rec: int     # exclusive
    begin_byte: int
    end_byte: int


def _topic_files(path: str) -> list[tuple[int, str]]:
    import os
    import re

    if not os.path.isdir(path):
        return []  # a topic that does not exist yet is empty, not an error
    out = []
    for name in sorted(os.listdir(path)):
        m = re.fullmatch(r"part-(\d+)\.jsonl", name)
        if m:
            out.append((int(m.group(1)), os.path.join(path, name)))
    return out


_CHUNK = 4 << 20  # 4 MiB: bounds memory for scans and slice reads


def _scan_terminated(path: str, from_byte: int) -> tuple[int, int]:
    """Count newline-TERMINATED records from ``from_byte`` on; return
    (n_records, end_byte) where ``end_byte`` sits just past the last
    newline. A torn trailing line (producer crashed or flushed mid-write)
    is NOT counted — it only becomes a record once its newline lands, so
    offsets never name half-written bytes and a checkpointed range
    replays identically even if the line is completed in between.
    Scans in fixed-size chunks — O(_CHUNK) memory however large the
    file (the catch-up scan after a restart walks the whole log)."""
    n = 0
    end = from_byte
    pos = from_byte
    with open(path, "rb") as f:
        f.seek(from_byte)
        while True:
            data = f.read(_CHUNK)
            if not data:
                break
            c = data.count(b"\n")
            if c:
                n += c
                end = pos + data.rfind(b"\n") + 1
            pos += len(data)
    return n, end


def _read_slice(sl: _TopicSlice):
    """Yield (key, value, partition, record-index) for a byte range.
    Streams the range in fixed-size chunks carrying the partial line
    across chunk boundaries — O(_CHUNK + one line) memory even when one
    slice covers a whole large log (the first batch over an existing
    topic)."""
    import json

    rec = sl.begin_rec
    remaining = sl.end_byte - sl.begin_byte
    carry = b""
    with open(sl.path, "rb") as f:
        f.seek(sl.begin_byte)
        while remaining > 0 and rec < sl.end_rec:
            data = f.read(min(_CHUNK, remaining))
            if not data:
                break
            remaining -= len(data)
            carry += data
            lines = carry.split(b"\n")
            carry = lines.pop()  # partial line (or b"") continues next chunk
            for line in lines:
                if rec >= sl.end_rec:
                    return
                if line.strip():
                    obj = json.loads(line)
                    yield (obj.get("key"), obj.get("value"), sl.pid, rec)
                    rec += 1
                else:
                    # blank line: still a terminated line in the count —
                    # keep record numbering aligned with the scan
                    rec += 1


_EMPTY_SLICE = _TopicSlice("", -1, 0, 0, 0, 0)


class _TopicBatchReader(DataSourceReader):
    """Bounded topic read: every partition file is one split (only its
    newline-terminated prefix — same record accounting as the stream)."""

    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        import os

        if not os.path.isdir(self.path):
            # A STREAM may start before its topic exists (empty batches
            # until the producer creates it), but a bounded read of a
            # missing directory is a caller error — surface the typo'd
            # path instead of returning empty-but-successful output.
            raise FileNotFoundError(
                f"flink_note_topic: topic directory {self.path!r} does not exist"
            )
        parts = []
        for pid, fpath in _topic_files(self.path):
            n, end = _scan_terminated(fpath, 0)
            parts.append(_TopicSlice(fpath, pid, 0, n, 0, end))
        return parts or [_EMPTY_SLICE]

    def read(self, sl: _TopicSlice):
        if sl.pid < 0:
            return iter(())
        return _read_slice(sl)


class _TopicStreamReader(DataSourceStreamReader):
    """Kafka-shaped incremental reader on the FULL (partitioned) stream
    API: the driver tracks per-partition offsets as ``[records, bytes]``
    pairs (records = Kafka's consumer-offset shape and the emitted
    ``offset`` column; bytes let both driver and executors seek instead
    of rescanning), ``partitions(start, end)`` plans one split per
    partition with new records, and ``read(split)`` runs on EXECUTORS
    (unlike ``SimpleDataSourceStreamReader``, which prefetches on the
    driver) — the FLIP-27 SplitEnumerator/SourceReader split, reference
    S5/NOTES 16-18.

    Cost per trigger is O(appended bytes), not O(log): the reader keeps
    the last-seen ``[records, bytes]`` tip per partition and scans only
    past it (after a query restart the cache is empty and the first
    trigger rebuilds it with one full pass). Only newline-terminated
    records are ever counted (``_scan_terminated``), so offsets live in
    Spark's checkpoint and a replayed batch re-reads byte-identical
    ranges — exactly-once with a checkpointed sink."""

    def __init__(self, options):
        self.path = options["path"]
        self._tip: dict[str, tuple[int, int]] = {}  # pid -> (records, bytes)

    def _advance(self) -> dict:
        out = {}
        for pid, fpath in _topic_files(self.path):
            key = str(pid)
            recs, pos = self._tip.get(key, (0, 0))
            n, end = _scan_terminated(fpath, pos)
            recs, pos = recs + n, end
            self._tip[key] = (recs, pos)
            out[key] = [recs, pos]
        return out

    def initialOffset(self) -> dict:
        return {str(pid): [0, 0] for pid, _ in _topic_files(self.path)}

    def latestOffset(self) -> dict:
        return self._advance()

    @staticmethod
    def _norm(val, fpath: str | None):
        """Accept both offset shapes: ``[records, bytes]`` (current) and a
        bare record count (earlier format, possibly still in a
        checkpoint) — for the latter the byte position is recovered by
        scanning the file to that record."""
        if isinstance(val, (list, tuple)):
            return int(val[0]), int(val[1])
        rec = int(val)
        if rec == 0 or fpath is None:
            return rec, 0
        pos = 0
        seen = 0
        with open(fpath, "rb") as f:
            while seen < rec:
                data = f.read(_CHUNK)
                if not data:
                    break
                for i, b in enumerate(data):
                    if b == 0x0A:
                        seen += 1
                        if seen == rec:
                            pos += i + 1
                            break
                else:
                    pos += len(data)
                    continue
                break
        return rec, pos

    def partitions(self, start: dict, end: dict):
        by_pid = dict(_topic_files(self.path))
        out = []
        for pid_s, end_val in end.items():
            fpath = by_pid.get(int(pid_s))
            end_rec, end_byte = self._norm(end_val, fpath)
            start_rec, start_byte = self._norm(start.get(pid_s, [0, 0]), fpath)
            if end_rec <= start_rec:
                continue
            pid = int(pid_s)
            if pid not in by_pid:
                raise FileNotFoundError(
                    f"flink_note_topic: partition file part-{pid}.jsonl "
                    f"vanished from {self.path} but the checkpoint still "
                    f"references records [{start_rec}, {end_rec}) — the "
                    "log is append-only by contract; restore the file to "
                    "resume"
                )
            out.append(
                _TopicSlice(by_pid[pid], pid, start_rec, end_rec, start_byte, end_byte)
            )
        return out or [_EMPTY_SLICE]

    def read(self, sl: _TopicSlice):
        if sl.pid < 0:
            return iter(())
        return _read_slice(sl)

    def commit(self, end: dict) -> None:
        pass  # the log is append-only; nothing to release

    def stop(self) -> None:
        pass


def topic_produce(
    df,
    path: str,
    n_partitions: int | None = None,
    key_col: str = "key",
    value_col: str = "value",
) -> None:
    """Producer half of the ``flink_note_topic`` analogue (r5): append a
    DataFrame's (key, value) rows to the topic directory in the exact
    format the reader consumes — keyed partitioning
    (``pmod(xxhash64(key), n_partitions)``, so one key's records always
    land in, and stay ordered within, one partition), newline-terminated
    JSONL appends (the reader's torn-tail scan never sees a half
    record), and an fcntl exclusive lock per append batch so concurrent
    producer tasks interleave at record granularity, never mid-line.

    Kafka-parity notes: delivery is at-least-once (a retried task
    re-appends its batch — same as a non-transactional Kafka producer;
    consumers dedup by key or by (key, value) content when it matters);
    NULL keys all hash to one partition (Kafka round-robins them — a
    deterministic analogue has no per-producer sticky state to
    round-robin with); record order ACROSS concurrent producer tasks is
    arbitrary, order WITHIN a task's batch is preserved. The file
    appends require the topic directory on a filesystem shared by the
    executors — the analogue is a single-host test double by design
    (the real connector speaks to a broker instead).

    Partition files are pre-created so the topic's partition count is
    fixed at first produce and every consumer sees all partitions even
    before each has data. An EXISTING topic's file count is
    authoritative: ``n_partitions=None`` (default) adopts it (4 for a
    new topic), and an explicit mismatching value raises — re-keying
    ``pmod(hash, n)`` with a different ``n`` would silently split a
    key across partitions and break the keyed-ordering contract above.
    """
    import os

    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    existing = len(_topic_files(path))
    if existing:
        if n_partitions is not None and n_partitions != existing:
            raise ValueError(
                f"topic_produce: topic at {path!r} has {existing} "
                f"partitions; producing with n_partitions={n_partitions} "
                "would re-key records across partitions and break keyed "
                "ordering — omit n_partitions to adopt the existing count"
            )
        n_partitions = existing
    elif n_partitions is None:
        n_partitions = 4
    for p in range(n_partitions):
        fp = os.path.join(path, f"part-{p}.jsonl")
        if not os.path.exists(fp):
            open(fp, "a").close()

    rows = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(value_col).cast("string").alias("v"),
        F.pmod(
            F.xxhash64(F.col(key_col).cast("string")), F.lit(n_partitions)
        ).alias("p"),
    )

    def append_partition(it) -> None:
        import fcntl
        import json as _json
        from collections import defaultdict

        bufs: dict[int, list[str]] = defaultdict(list)
        for r in it:
            bufs[int(r["p"])].append(
                _json.dumps({"key": r["k"], "value": r["v"]})
            )
        for p, lines in bufs.items():
            data = ("\n".join(lines) + "\n").encode()
            with open(os.path.join(path, f"part-{p}.jsonl"), "ab") as f:
                fcntl.flock(f, fcntl.LOCK_EX)
                try:
                    f.write(data)
                    f.flush()
                finally:
                    fcntl.flock(f, fcntl.LOCK_UN)

    rows.foreachPartition(append_partition)


class FileTopicDataSource(DataSource):
    """``flink_note_topic``: broker-free Kafka analogue over an
    append-only directory of ``part-<N>.jsonl`` files (one JSON record
    ``{"key": ..., "value": ...}`` per line).

    Carries the Kafka SEMANTICS the in-container test tier cannot get
    from the real connector (no broker, SURVEY §2.2 Kafka row): keyed
    records, totally-ordered offsets within a partition, per-partition
    consumer offsets as the stream state, incremental tailing, and
    deterministic range replay for exactly-once. Output schema mirrors
    the Kafka source's: (key, value, partition, offset). Option:
    ``path`` = topic directory."""

    @classmethod
    def name(cls) -> str:
        return "flink_note_topic"

    def schema(self) -> str:
        return "key string, value string, partition int, offset bigint"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _TopicBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _TopicStreamReader(self.options)
