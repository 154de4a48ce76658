"""External-enrichment operator — the Flink AsyncDataStream analogue.

Flink v1.12's ``AsyncDataStream.orderedWait/unorderedWait`` exists
because a per-record blocking lookup stalls the operator chain the
reference notes trace (one ``processElement`` at a time). Spark's
micro-batch model changes the economics: the right unit is the ARROW
BATCH, not the record — one ``mapInPandas`` pass hands the user
function thousands of rows at once (amortizing the round-trip), and
``max_concurrency`` overlaps multiple in-flight batches per partition
with a thread pool for I/O-bound services. Parallelism across the
cluster comes from partitions, exactly like Flink's operator
parallelism; the thread pool mirrors AsyncDataStream's ``capacity``.

The external call itself is injected (``enrich_fn``) — this container
has no external services (environment contract), so tests drive the
operator with deterministic local functions; the distributed plumbing
(Arrow batching, bounded in-flight queue, ordered vs unordered
emission) is the real, tested surface.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame


def batched_enrich(
    df: DataFrame,
    enrich_fn: Callable[[Any], Any],
    added_schema: str,
    max_concurrency: int = 1,
    ordered: bool = True,
    batch_rows: int | None = None,
) -> DataFrame:
    """Enrich rows through a (possibly remote) batch lookup.

    ``enrich_fn(batch: pd.DataFrame) -> pd.DataFrame`` receives an
    Arrow batch of input rows and returns a SAME-LENGTH, SAME-ORDER
    frame holding exactly the ``added_schema`` columns (DDL string,
    e.g. ``"score double, label string"``); the operator concatenates
    them onto the input columns. The function must be picklable (module
    level or closure over picklable state) — it runs in executor
    workers.

    ``max_concurrency > 1`` keeps that many batches in flight per
    partition via a thread pool — Flink ``unorderedWait``'s
    ``capacity`` — for I/O-bound calls (the GIL makes it useless for
    CPU-bound fns; that case wants bigger partitions, not threads).
    ``ordered=True`` (≈ ``orderedWait``) emits results in input-batch
    order even when later batches finish first; ``False``
    (≈ ``unorderedWait``) emits on completion, trading order for
    latency. Row order WITHIN a batch is always preserved.

    ``batch_rows`` re-chunks Arrow batches before calling (service
    payload-size caps); default is Spark's Arrow batch size
    (``spark.sql.execution.arrow.maxRecordsPerBatch``).
    """
    if max_concurrency < 1:
        raise ValueError(f"max_concurrency must be >= 1, got {max_concurrency}")
    in_cols = list(df.columns)
    types = dict(df.dtypes)
    out_schema = ", ".join(
        [f"`{c}` {types[c]}" for c in in_cols] + [added_schema]
    )
    added_cols = [
        f.strip().split()[0].strip("`")
        for f in _split_ddl_fields(added_schema)
    ]
    clash = set(added_cols) & set(in_cols)
    if clash:
        raise ValueError(
            f"batched_enrich: added columns {sorted(clash)} collide with "
            "input columns — alias them in added_schema"
        )

    def _call(pdf):
        import pandas as pd

        add = enrich_fn(pdf)
        if len(add) != len(pdf):
            raise ValueError(
                f"enrich_fn returned {len(add)} rows for a {len(pdf)}-row "
                "batch — it must be same-length, same-order"
            )
        out = pd.concat(
            [pdf.reset_index(drop=True), add.reset_index(drop=True)[added_cols]],
            axis=1,
        )
        return out

    def _rechunk(batches):
        if batch_rows is None:
            yield from batches
            return
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                if len(chunk):
                    yield chunk

    if max_concurrency == 1:

        def run(batches):
            for pdf in _rechunk(batches):
                if len(pdf):
                    yield _call(pdf)

    else:

        def run(batches):
            # Bounded in-flight window (AsyncDataStream `capacity`):
            # submit up to N batches, then emit as the window slides.
            from concurrent.futures import (
                FIRST_COMPLETED,
                ThreadPoolExecutor,
                wait,
            )

            with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
                if ordered:
                    pending: list = []
                    for pdf in _rechunk(batches):
                        if not len(pdf):
                            continue
                        pending.append(pool.submit(_call, pdf))
                        while len(pending) >= max_concurrency:
                            yield pending.pop(0).result()
                    for fut in pending:
                        yield fut.result()
                else:
                    in_flight: set = set()
                    for pdf in _rechunk(batches):
                        if not len(pdf):
                            continue
                        in_flight.add(pool.submit(_call, pdf))
                        while len(in_flight) >= max_concurrency:
                            done, in_flight = wait(
                                in_flight, return_when=FIRST_COMPLETED
                            )
                            for fut in done:
                                yield fut.result()
                    for fut in in_flight:
                        yield fut.result()

    return df.mapInPandas(run, out_schema)


def _split_ddl_fields(ddl: str) -> list[str]:
    """Split a DDL field list on TOP-LEVEL commas — commas inside
    generic brackets (``map<string,int>``) AND inside parentheses
    (``decimal(10,2)``, ``varchar(8)``) stay within their field."""
    fields, depth, cur = [], 0, []
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        fields.append("".join(cur))
    return fields
