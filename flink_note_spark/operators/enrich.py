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


def lookup_join(
    df: DataFrame,
    lookup_fn: Callable[[Any], Any],
    key_cols: list[str],
    added_schema: str,
    how: str = "left",
    cache_max_rows: int = 10_000,
    cache_ttl_s: float | None = None,
    now_fn: Callable[[], float] | None = None,
) -> DataFrame:
    """Flink **lookup join** (r8) — ``JOIN dim FOR SYSTEM_TIME AS OF
    proc_time ON key`` against an external dimension service, with the
    connector-level LRU cache (Flink's ``lookup.cache.max-rows`` /
    ``lookup.cache.ttl`` in the JDBC/HBase connectors).

    ``lookup_fn(keys: pd.DataFrame) -> pd.DataFrame`` receives the
    DISTINCT key combinations not answerable from cache (columns =
    ``key_cols``) and returns rows carrying the key columns plus the
    ``added_schema`` columns; keys it omits are treated as absent
    (NULL payload on ``how="left"``, row dropped on ``"inner"``).
    Batching is the Spark-economics upgrade over Flink's per-record
    lookup: one call per Arrow batch, distinct-key-deduplicated, so a
    hot key costs one round-trip per TTL window per partition, not one
    per row.

    The cache is per PARTITION (executor-local, exactly like Flink's
    per-task cache): an LRU of ``cache_max_rows`` entries, each
    expiring ``cache_ttl_s`` seconds after it was loaded (so dimension
    updates are seen within TTL — Flink's staleness contract). Missing
    keys are cached too (Flink's ``cache missing key`` default) —
    a key absent from the dimension does not re-query every batch.
    ``now_fn`` injects the clock for deterministic tests; the default
    is ``time.monotonic``.

    Works identically on batch frames and streams (``mapInPandas`` is
    stateless per-partition machinery in both). At 100 TB the cache
    bounds memory per worker while the distinct-per-batch dedup bounds
    service load; parallelism = partitions, as with every enrichment
    operator in this module.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    if cache_max_rows < 0:
        raise ValueError("cache_max_rows must be >= 0")
    in_cols = list(df.columns)
    missing = [k for k in key_cols if k not in in_cols]
    if missing:
        raise ValueError(
            f"key columns {missing} not present in the input frame"
        )
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
            f"lookup_join: added columns {sorted(clash)} collide with "
            "input columns — alias them in added_schema"
        )

    def run(batches):
        import time as _time
        from collections import OrderedDict

        import pandas as pd

        now = now_fn or _time.monotonic
        # key tuple -> (loaded_at, payload tuple | None for a miss)
        cache: "OrderedDict[tuple, tuple]" = OrderedDict()

        for pdf in batches:
            if not len(pdf):
                continue
            t = now()
            keys = list(
                pdf[key_cols].itertuples(index=False, name=None)
            )
            need: list[tuple] = []
            seen: set[tuple] = set()
            for k in keys:
                if k in seen:
                    continue
                ent = cache.get(k)
                if ent is not None and (
                    cache_ttl_s is None or t - ent[0] < cache_ttl_s
                ):
                    cache.move_to_end(k)
                    continue
                seen.add(k)
                need.append(k)
            if need and cache_max_rows > 0:
                res = lookup_fn(pd.DataFrame(need, columns=key_cols))
                found = {
                    tuple(r[c] for c in key_cols):
                        tuple(r[c] for c in added_cols)
                    for _i, r in res.iterrows()
                }
                for k in need:
                    cache.pop(k, None)
                    cache[k] = (t, found.get(k))
                while len(cache) > cache_max_rows:
                    cache.popitem(last=False)
                payload = {k: v for k, (_ts, v) in cache.items()}
            elif need:
                # cache disabled: resolve the batch without retaining
                res = lookup_fn(pd.DataFrame(need, columns=key_cols))
                payload = {
                    tuple(r[c] for c in key_cols):
                        tuple(r[c] for c in added_cols)
                    for _i, r in res.iterrows()
                }
                payload = {k: payload.get(k) for k in need}
            else:
                payload = {k: v for k, (_ts, v) in cache.items()}
            vals = [payload.get(k) for k in keys]
            out = pdf.reset_index(drop=True)
            for j, c in enumerate(added_cols):
                out[c] = [
                    (v[j] if v is not None else None) for v in vals
                ]
            if how == "inner":
                keep = [v is not None for v in vals]
                out = out[keep]
            if len(out):
                yield out

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
