"""Time-series operators: hypertable-style gap-filled resampling,
multi-resolution rollup cascades (continuous aggregates), sweep-line
interval concurrency, and cohort retention.

The reference's windowing story (tumbling/sliding event-time aggregation
over the same bounded/unbounded ``readFile`` path — SURVEY.md §2.1 S2/S3)
renders *dense* buckets only where data exists. This module adds the
time-series surface a hypertable user expects on top of that:

- ``gapfill`` — resample into fixed buckets AND materialize the empty
  ones, with per-column fill policies (``null`` / ``zero`` / constant /
  LOCF / linear interpolation). TimescaleDB's ``time_bucket_gapfill`` +
  ``locf()`` / ``interpolate()`` shape.
- ``rollup_partials`` / ``rollup_up`` / ``rollup_finalize`` — continuous
  aggregates: a fine-grained PARTIAL-state table that coarser resolutions
  re-aggregate from, never rescanning raw events. Partial algebra:
  sum/count/min/max fold trivially; ``avg`` carries (sum, count);
  ``first``/``last`` carry an ordered ``struct(ts, tiebreak, value)``
  folded by ``min``/``max``; ``approx_distinct`` carries an HLL sketch
  folded by ``hll_union_agg`` (register-wise max, so a merged sketch is
  IDENTICAL to the sketch of the union — pinned in tests).
- ``interval_concurrency`` / ``max_concurrency`` — sweep-line +1/−1
  running occupancy over [start, end) intervals, with a two-pass
  bucketed prefix-sum so a single hot key never serializes onto one
  task (the classic distributed-scan shape).
- ``retention_cohorts`` — first-activity-period cohorts × activity
  period retention matrix.

Scale notes (100 TB): every operator here is one keyed aggregation plus
at most one keyed window pass. ``gapfill`` never joins a generated spine
against the data — gap rows are EXPLODED from each present bucket's lead
gap (one window pass; spine size is O(emitted rows), co-partitioned by
construction). Rollup re-aggregation shuffles O(distinct buckets), not
O(events); appending a day's increment to a persisted partial table
touches only the increment's partials (``merge_partials``). The
concurrency scan's bucketed mode bounds any window partition to
(key × time-bucket) regardless of key skew.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "time_bucket_s",
    "time_bucket",
    "time_bucket_months",
    "gapfill",
    "carry_forward",
    "rollup_partials",
    "rollup_up",
    "rollup_finalize",
    "merge_partials",
    "rollup_stream_start",
    "rollup_read",
    "rollup_compact",
    "interval_concurrency",
    "max_concurrency",
    "lttb_downsample",
    "ewma",
    "retention_cohorts",
]

# gapfill run-explode chunk: bounds per-row sequence() arrays (see the
# two-level explode in :func:`gapfill`); 2^14 keeps every generated
# array well under Spark's limits while covering 268M-bucket runs
_GAP_CHUNK = 1 << 14

_UNIT_S = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


#: calendar widths (no fixed second count — month lengths vary); bucket
#: arithmetic for these runs on MONTH INDICES, not epoch seconds
_CAL_MONTHS = {
    "month": 1, "months": 1,
    "quarter": 3, "quarters": 3,
    "year": 12, "years": 12,
}

_EPOCH_DATE = "1970-01-01"


def _width_s(width: str | int) -> int:
    """``"15 minutes"`` / ``900`` → whole seconds (sub-second buckets
    are out of scope; refuse rather than silently truncate)."""
    if isinstance(width, int):
        if width <= 0:
            raise ValueError(f"bucket width must be positive, got {width}")
        return width
    qty, unit = width.split()
    if unit not in _UNIT_S:
        if unit in _CAL_MONTHS:
            raise ValueError(
                f"{width!r} is a CALENDAR width — this operator path "
                f"expects a fixed-second width here"
            )
        raise ValueError(f"unknown duration unit {unit!r} in {width!r}")
    return int(qty) * _UNIT_S[unit]


def _parse_width(width: str | int) -> tuple[str, int]:
    """``("s", seconds)`` for fixed widths; ``("mo", months)`` for
    calendar widths (``"1 month" / "2 quarters" / "1 year"`` —
    TimescaleDB's ``time_bucket('1 month', ...)`` grains, r11)."""
    if not isinstance(width, int):
        parts = width.split()
        if len(parts) == 2 and parts[1] in _CAL_MONTHS:
            qty = int(parts[0])
            if qty <= 0:
                raise ValueError(
                    f"bucket width must be positive, got {width!r}"
                )
            return ("mo", qty * _CAL_MONTHS[parts[1]])
    return ("s", _width_s(width))


def _origin_parts(origin: "str | int") -> tuple[int, int]:
    """Driver-side parse of a bucket ``origin`` (ISO timestamp string
    or epoch seconds int) → ``(epoch_seconds, months_since_epoch)``."""
    import calendar
    import datetime as _dt

    if isinstance(origin, int):
        d = _dt.datetime.fromtimestamp(origin, _dt.timezone.utc)
        secs = origin
    else:
        d = _dt.datetime.fromisoformat(origin)
        if d.tzinfo is None:
            d = d.replace(tzinfo=_dt.timezone.utc)
        secs = calendar.timegm(d.utctimetuple())
    return secs, (d.year - 1970) * 12 + d.month - 1


def time_bucket_months(
    ts: str | Column, months: int, name: str | None = None
) -> Column:
    """Aligned MONTHS-SINCE-EPOCH index of a calendar bucket (BIGINT):
    ``floor(((year-1970)*12 + month-1) / months) * months``. Quarters
    and years align to January 1970 (epoch alignment, like the
    fixed-width path). Pure Catalyst date-part arithmetic on the scan;
    timezone-free for DATE/TIMESTAMP_NTZ inputs (LTZ inputs follow the
    session timezone, same as every date-part function)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    col = col.cast("timestamp")
    m = (F.year(col) - F.lit(1970)) * 12 + F.month(col) - 1
    out = (F.floor(m / F.lit(months)) * months).cast("long")
    return out.alias(name) if name else out


def _month_index_start_s(idx: Column) -> Column:
    """Epoch seconds (UTC midnight) of a month-index bucket start —
    timezone-free: ``unix_date(add_months(epoch, idx)) * 86400``."""
    d = F.add_months(F.lit(_EPOCH_DATE).cast("date"), idx.cast("int"))
    return (F.unix_date(d).cast("long") * 86400)


def time_bucket_s(ts: str | Column, width: str | int, name: str | None = None) -> Column:
    """Epoch-aligned bucket START in epoch seconds (BIGINT) — the
    ``time_bucket`` primitive. Pure Catalyst arithmetic on the scan
    (``floor(unix_micros / width_us) * width_s``); DuckDB mirror is
    ``(epoch_us(ts) // width_us) * width_s``. Exact for any post-epoch
    timestamp: unix_micros < 2^53, and floor(us/w) cannot round across
    an integer boundary because the residual needed (< w·us·2^-53 µs)
    is below one microsecond for any realistic timestamp."""
    w = _width_s(width)
    col = F.col(ts) if isinstance(ts, str) else ts
    us = F.unix_micros(col.cast("timestamp"))
    out = (F.floor(us / F.lit(float(w) * 1e6)) * w).cast("long")
    return out.alias(name) if name else out


def _bucket_col(
    ts: str | Column, mode: str, w: int, origin: "str | int | None"
) -> Column:
    """Bucket value in the width family's ARITHMETIC domain —
    origin-shifted epoch seconds for fixed widths, origin-shifted month
    indices for calendar widths. Consecutive buckets differ by exactly
    ``w`` in this domain, which is what makes every spine/fold formula
    origin-invariant."""
    if mode == "s":
        if origin is None:
            return time_bucket_s(ts, w)
        o_s, _ = _origin_parts(origin)
        col = F.col(ts) if isinstance(ts, str) else ts
        us = F.unix_micros(col.cast("timestamp")) - F.lit(o_s * 1_000_000)
        return (F.floor(us / F.lit(float(w) * 1e6)) * w + o_s).cast("long")
    if origin is None:
        return time_bucket_months(ts, w)
    _, o_m = _origin_parts(origin)
    col = (F.col(ts) if isinstance(ts, str) else ts).cast("timestamp")
    m = (F.year(col) - F.lit(1970)) * 12 + F.month(col) - 1
    return (F.floor((m - F.lit(o_m)) / F.lit(w)) * w + o_m).cast("long")


def time_bucket(
    ts: str | Column,
    width: str | int,
    name: str | None = None,
    origin: "str | int | None" = None,
) -> Column:
    """Bucket START in epoch seconds (BIGINT) for BOTH width families:
    fixed widths go through :func:`time_bucket_s`; calendar widths
    (``"1 month" / "1 quarter" / "1 year"``) resolve the aligned month
    index and convert it to the month-start epoch second — so a single
    output convention (``bucket_s``) serves every grain.

    ``origin`` (r11 — TimescaleDB's ``time_bucket(..., origin =>)``)
    re-anchors the alignment: buckets start at ``origin + k·width``
    instead of the epoch. The canonical use is Monday-starting weeks
    (``width="1 week", origin="2024-01-01"`` — epoch alignment starts
    weeks on Thursday, 1970-01-01's weekday); for calendar widths the
    origin shifts the month-index alignment (e.g. fiscal quarters
    starting in February: ``"1 quarter", origin="1970-02-01"``).
    ``origin`` is an ISO timestamp string or epoch seconds, read as
    UTC. :func:`gapfill` and the rollup family accept the same
    ``origin``."""
    mode, w = _parse_width(width)
    out = _bucket_col(ts, mode, w, origin)
    if mode == "mo":
        out = _month_index_start_s(out)
    return out.alias(name) if name else out


def _fill_policy(policy: Any) -> tuple[str, Any]:
    if isinstance(policy, tuple):
        kind, val = policy
        if kind != "const":
            raise ValueError(f"tuple fill must be ('const', value), got {policy!r}")
        return kind, val
    if policy not in ("null", "zero", "locf", "linear"):
        raise ValueError(f"unknown fill policy {policy!r}")
    return policy, None


def gapfill(
    df: DataFrame,
    keys: list[str],
    ts: str,
    width: str | int,
    aggs: dict[str, Column],
    fills: dict[str, Any] | None = None,
    bounds: tuple[Any, Any] | None = None,
    gap_flag: str | None = "is_gap",
    origin: "str | int | None" = None,
) -> DataFrame:
    """Bucket ``df`` into fixed ``width`` windows per ``keys`` and emit a
    DENSE per-key series: every bucket between the key's first and last
    observed bucket (or global ``bounds``) exists in the output, missing
    ones synthesized per the fill policy.

    ``aggs``: output name → aggregate Column (evaluated in the bucket
    groupBy). ``fills``: output name → ``"null"`` (default) | ``"zero"``
    | ``("const", v)`` | ``"locf"`` (carry the previous PRESENT bucket's
    value — strict donor-carry: if that aggregate is itself NULL, NULL
    is carried; TimescaleDB's last-NON-null ``locf()`` variant needs a
    second ``last(..., ignorenulls)`` window over the output, which a
    caller with NULL-able measures should add downstream) | ``"linear"``
    (interpolate between the neighbouring present buckets).
    ``bounds=(start, end)`` extends every key's spine to the
    global [start, end] timestamps: head pads (and tail pads under
    ``linear``) have no donor value and fill NULL (zero/const still
    apply). ``gap_flag`` names an int 0/1 marker column (None omits it).

    Plan shape: ONE bucket groupBy (map-side combinable) + ONE keyed
    window pass whose ``lead`` columns let each present bucket EXPLODE
    its following gap run — no spine join, no second shuffle; gap rows
    inherit their donor row's values at generation time, so LOCF and
    linear need no additional window. Keys with zero rows never appear
    (there is nothing to anchor a spine to — documented contract).
    Long runs explode in ``_GAP_CHUNK``-bounded pieces (two-level
    generator), so no donor row ever builds an unbounded array —
    arbitrary spans cost rows, never single-row memory.

    CALENDAR widths (``"1 month" / "1 quarter" / "1 year"``, r11): the
    spine arithmetic runs on aligned month indices (consecutive buckets
    differ by exactly ``n`` months, so every run/step/interpolation
    formula is unchanged) and ``bucket_s`` converts to the month-start
    epoch second on output — same output contract as fixed widths.
    """
    mode, w = _parse_width(width)
    fills = fills or {}
    unknown = set(fills) - set(aggs)
    if unknown:
        raise ValueError(
            f"fills name columns not in aggs: {sorted(unknown)} "
            f"(aggs: {sorted(aggs)})"
        )
    policies = {n: _fill_policy(fills.get(n, "null")) for n in aggs}
    if not keys:
        raise ValueError("gapfill requires at least one key column")

    # the arithmetic-domain bucket (origin-shifted seconds / month
    # indices) — consecutive buckets differ by exactly w, so the whole
    # spine (runs, steps, linear fractions) is origin- and
    # grain-invariant
    bucket = _bucket_col(ts, mode, w, origin).alias("bucket_s")
    b = df.groupBy(*keys, bucket).agg(*[c.alias(n) for n, c in aggs.items()])
    dtypes = {f.name: f.dataType for f in b.schema.fields}

    win = Window.partitionBy(*keys).orderBy("bucket_s")
    nxt = F.lead("bucket_s").over(win)
    lead_vals = {
        n: F.lead(n).over(win)
        for n, (kind, _) in policies.items()
        if kind == "linear"
    }
    is_first = F.row_number().over(win) == 1

    # gap run length to the NEXT present bucket (0 on the last row)
    steps = F.when(nxt.isNull(), F.lit(0).cast("long")).otherwise(
        ((nxt - F.col("bucket_s")) / w).cast("long") - 1
    )
    start_off = F.lit(0).cast("long")
    end_steps = steps
    if bounds is not None:
        g0b = _bucket_col(F.lit(bounds[0]), mode, w, origin)
        g1b = _bucket_col(F.lit(bounds[1]), mode, w, origin)
        # head pad on each key's first row; tail pad on its last
        start_off = F.when(
            is_first & (g0b < F.col("bucket_s")),
            -((F.col("bucket_s") - g0b) / w).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        end_steps = F.when(
            nxt.isNull() & (g1b > F.col("bucket_s")),
            ((g1b - F.col("bucket_s")) / w).cast("long"),
        ).otherwise(steps)

    # generator args may not contain window expressions: materialize the
    # window-derived run columns first, explode in a second projection
    staged = b.select(
        *keys,
        "bucket_s",
        *[F.col(n) for n in aggs],
        *[c.alias(f"__lead_{n}") for n, c in lead_vals.items()],
        steps.alias("__steps"),
        start_off.alias("__start_off"),
        end_steps.alias("__end_steps"),
    )
    # Two-level explode so no single row ever materializes an unbounded
    # sequence() array (ADVICE r10: a sparse key or wide bounds at a
    # small width — e.g. a year at second resolution — is a
    # multi-million-element array, Spark's array cap / executor OOM).
    # Level 1 explodes bounded CHUNK indices, level 2 the offsets inside
    # one chunk — per-row array length is ≤ _GAP_CHUNK at both levels
    # for any run up to _GAP_CHUNK² buckets (≈ 268M); the common case
    # (run ≤ _GAP_CHUNK) pays one extra single-element explode.
    n_chunks = F.floor(
        (F.col("__end_steps") - F.col("__start_off")) / F.lit(_GAP_CHUNK)
    ).cast("long")
    chunked = staged.select(
        "*",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks)).alias("__chunk"),
    )
    lo = F.col("__start_off") + F.col("__chunk") * F.lit(_GAP_CHUNK)
    hi = F.least(
        lo + F.lit(_GAP_CHUNK - 1),
        F.col("__end_steps").cast("long"),
    )
    rows = chunked.select("*", F.explode(F.sequence(lo, hi)).alias("__off"))

    off = F.col("__off")
    out_cols: list[Column] = [*(F.col(k) for k in keys)]
    bucket_out = F.col("bucket_s") + off * w
    if mode == "mo":  # month index -> month-start epoch second
        bucket_out = _month_index_start_s(bucket_out)
    out_cols.append(bucket_out.alias("bucket_s"))
    for n in aggs:
        kind, const = policies[n]
        null = F.lit(None).cast(dtypes[n])
        if kind == "null":
            filled = null
        elif kind == "zero":
            filled = F.lit(0).cast(dtypes[n])
        elif kind == "const":
            filled = F.lit(const).cast(dtypes[n])
        elif kind == "locf":
            # donor row IS the previous present bucket; head pads have none
            filled = F.when(off < 0, null).otherwise(F.col(n))
        else:  # linear
            frac = off / (F.col("__steps") + F.lit(1))
            interp = F.col(n) + (F.col(f"__lead_{n}") - F.col(n)) * frac
            filled = F.when(
                (off < 0) | F.col(f"__lead_{n}").isNull(), null
            ).otherwise(interp.cast(dtypes[n]))
        out_cols.append(F.when(off == 0, F.col(n)).otherwise(filled).alias(n))
    if gap_flag:
        out_cols.append((off != 0).cast("int").alias(gap_flag))
    return rows.select(*out_cols)


def carry_forward(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    cols: list[str],
) -> DataFrame:
    """Replace NULLs in ``cols`` with the last NON-null value per key in
    ``order_col`` order — TimescaleDB's ``locf()`` proper, as the
    documented downstream companion to :func:`gapfill`'s strict
    donor-carry fill (one ``last(..., ignorenulls)`` window pass; same
    key partitioning as gapfill's output, so no extra shuffle when
    chained)."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


# ---------------------------------------------------------------------------
# Continuous aggregates: partial-state rollup cascade


_KINDS = ("count", "sum", "min", "max", "avg", "first", "last", "approx_distinct")


def _measure_spec(measures: dict[str, tuple]) -> dict[str, tuple[str, str]]:
    out = {}
    for name, (col, kind) in measures.items():
        if kind not in _KINDS:
            raise ValueError(f"unknown measure kind {kind!r} for {name!r}")
        out[name] = (col, kind)
    return out


def rollup_partials(
    df: DataFrame,
    keys: list[str],
    ts: str,
    width: str | int,
    measures: dict[str, tuple],
    tiebreak: str | None = None,
    origin: "str | int | None" = None,
) -> DataFrame:
    """Aggregate raw rows into PARTIAL state at the finest resolution —
    the base table of a continuous-aggregate cascade. ``measures`` maps
    output name → ``(column, kind)`` with kind in ``count | sum | min |
    max | avg | first | last | approx_distinct`` (``count`` with column
    ``"*"`` counts rows). ``first``/``last`` order by ``(ts, tiebreak,
    value)`` — pass ``tiebreak`` whenever timestamps can repeat within a
    bucket, or the winner is nondeterministic.

    The partial schema is re-aggregatable: ``rollup_up`` folds it to any
    coarser multiple of ``width`` without touching raw data, and
    ``merge_partials`` folds an increment's partials into a persisted
    table — the 100 TB accretion shape (aggregate the day's increment,
    merge O(buckets) partials; never rescan the corpus).
    """
    spec = _measure_spec(measures)
    aggs: list[Column] = []
    for name, (col, kind) in spec.items():
        if kind == "count":
            aggs.append(
                (F.count(F.lit(1)) if col == "*" else F.count(col)).alias(f"{name}__cnt")
            )
        elif kind == "sum":
            aggs.append(F.sum(col).alias(f"{name}__sum"))
        elif kind == "min":
            aggs.append(F.min(col).alias(f"{name}__min"))
        elif kind == "max":
            aggs.append(F.max(col).alias(f"{name}__max"))
        elif kind == "avg":
            aggs.append(F.sum(col).alias(f"{name}__sum"))
            aggs.append(F.count(col).alias(f"{name}__cnt"))
        elif kind in ("first", "last"):
            ord_cols = [F.unix_micros(F.col(ts).cast("timestamp")).alias("o1")]
            if tiebreak:
                ord_cols.append(F.col(tiebreak).alias("o2"))
            ord_cols.append(F.col(col).alias("v"))
            s = F.struct(*ord_cols)
            fold = F.min(s) if kind == "first" else F.max(s)
            aggs.append(fold.alias(f"{name}__ord"))
        else:  # approx_distinct
            aggs.append(F.hll_sketch_agg(col).alias(f"{name}__hll"))
    out = df.groupBy(*keys, time_bucket(ts, width, "bucket_s", origin)).agg(*aggs)
    return out


def _refold(spec: dict[str, tuple[str, str]]) -> list[Column]:
    aggs: list[Column] = []
    for name, (_, kind) in spec.items():
        if kind == "count":
            aggs.append(F.sum(f"{name}__cnt").alias(f"{name}__cnt"))
        elif kind == "sum":
            aggs.append(F.sum(f"{name}__sum").alias(f"{name}__sum"))
        elif kind == "min":
            aggs.append(F.min(f"{name}__min").alias(f"{name}__min"))
        elif kind == "max":
            aggs.append(F.max(f"{name}__max").alias(f"{name}__max"))
        elif kind == "avg":
            aggs.append(F.sum(f"{name}__sum").alias(f"{name}__sum"))
            aggs.append(F.sum(f"{name}__cnt").alias(f"{name}__cnt"))
        elif kind == "first":
            aggs.append(F.min(f"{name}__ord").alias(f"{name}__ord"))
        elif kind == "last":
            aggs.append(F.max(f"{name}__ord").alias(f"{name}__ord"))
        else:
            aggs.append(F.hll_union_agg(f"{name}__hll").alias(f"{name}__hll"))
    return aggs


def rollup_up(
    partials: DataFrame,
    keys: list[str],
    width: str | int,
    measures: dict[str, tuple],
    origin: "str | int | None" = None,
) -> DataFrame:
    """Fold a partial table to a COARSER resolution (must be a multiple
    of the finer width — enforced structurally: every fine bucket must
    land wholly inside one coarse bucket, which epoch-aligned widths
    guarantee whenever ``coarse % fine == 0``). Shuffles O(distinct fine
    buckets) partial rows; raw events are never rescanned.

    CALENDAR coarse widths (``"1 month"`` etc., r11) fold fine buckets
    by the calendar month their START falls in — correct whenever no
    fine bucket straddles a month boundary: fixed fine widths that
    divide one day (epoch-aligned, so day-aligned), ``"1 day"`` itself,
    or calendar fine grains whose month count divides the coarse one.
    A week-wide fine bucket straddles months — don't cascade weeks into
    months (aggregate months from the sub-day base instead)."""
    spec = _measure_spec(measures)
    mode, w = _parse_width(width)
    if mode == "s":
        # floor, not truncating cast: pre-epoch buckets are negative,
        # and truncation would disagree with time_bucket_s there
        b = F.col("bucket_s")
        if origin is not None:
            o_s, _ = _origin_parts(origin)
            coarse = (
                (F.floor((b - o_s) / w) * w + o_s)
                .cast("long").alias("bucket_s")
            )
        else:
            coarse = (F.floor(b / w) * w).cast("long").alias("bucket_s")
    else:
        # fine bucket start (epoch s) -> date -> aligned month index ->
        # month-start epoch s; date arithmetic only, timezone-free
        d = F.date_add(
            F.lit(_EPOCH_DATE).cast("date"),
            F.floor(F.col("bucket_s") / 86400).cast("int"),
        )
        coarse = _month_index_start_s(_bucket_col(d, "mo", w, origin)).alias(
            "bucket_s"
        )
    return partials.groupBy(*keys, coarse).agg(*_refold(spec))


def merge_partials(
    a: DataFrame, b: DataFrame, keys: list[str], measures: dict[str, tuple]
) -> DataFrame:
    """Fold two partial tables at the SAME resolution into one — the
    incremental-accretion verb (persisted base table ∪ increment).
    Union + one keyed re-aggregation over O(buckets) rows."""
    spec = _measure_spec(measures)
    return a.unionByName(b).groupBy(*keys, "bucket_s").agg(*_refold(spec))


def rollup_finalize(
    partials: DataFrame, keys: list[str], measures: dict[str, tuple]
) -> DataFrame:
    """Project partial state to final measure values: ``avg`` divides its
    carried sums, ``first``/``last`` unwrap the ordered struct,
    ``approx_distinct`` estimates from the sketch. Stateless projection
    — no shuffle."""
    spec = _measure_spec(measures)
    cols: list[Column] = [*(F.col(k) for k in keys), F.col("bucket_s")]
    for name, (_, kind) in spec.items():
        if kind == "count":
            cols.append(F.col(f"{name}__cnt").alias(name))
        elif kind == "sum":
            cols.append(F.col(f"{name}__sum").alias(name))
        elif kind == "min":
            cols.append(F.col(f"{name}__min").alias(name))
        elif kind == "max":
            cols.append(F.col(f"{name}__max").alias(name))
        elif kind == "avg":
            cols.append(
                (F.col(f"{name}__sum") / F.col(f"{name}__cnt")).alias(name)
            )
        elif kind in ("first", "last"):
            cols.append(F.col(f"{name}__ord.v").alias(name))
        else:
            cols.append(F.hll_sketch_estimate(f"{name}__hll").alias(name))
    return partials.select(*cols)


# ---------------------------------------------------------------------------
# Streaming continuous-aggregate maintenance (log-structured partial merge)


def rollup_stream_start(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    ts: str,
    width: str | int,
    measures: dict[str, tuple],
    tiebreak: str | None = None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
):
    """Maintain a continuous aggregate FROM A STREAM: each micro-batch
    folds to its own partial frame (``rollup_partials``) and lands as a
    log-structured epoch directory ``{path}/epoch={id}``; ``rollup_read``
    merges the log at query time and ``rollup_compact`` folds it down.

    Exactly-once without any state store: partials are re-aggregatable,
    so the sink needs no retraction and no watermark — a replayed epoch
    OVERWRITES its own directory (idempotent), and late events simply
    land in their bucket's partial in a later epoch, merged identically
    at read time. The continuous aggregate is eventually exact under
    ANY lateness — the property watermark-windowed streaming aggregates
    give up. Per-epoch work is O(distinct buckets in the batch).

    Returns the ``StreamingQuery``. ``trigger`` kwargs pass through
    (e.g. ``{"availableNow": True}``)."""
    from flink_note_spark.streaming.replay import _require_checkpoint

    spec = _measure_spec(measures)  # validate before the query starts
    del spec
    _require_checkpoint(checkpoint, "rollup_stream_start")
    _parse_width(width)  # validate (fixed OR calendar) before starting

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        part = rollup_partials(
            batch_df, keys, ts, width, measures, tiebreak=tiebreak
        )
        part.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    writer = stream_df.writeStream.foreachBatch(_sink).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def rollup_read(
    spark, path: str, keys: list[str], measures: dict[str, tuple]
) -> DataFrame:
    """Merged view of a streaming rollup log: one keyed re-aggregation
    over O(epochs × buckets) partial rows (the LSM read path). Feed the
    result to ``rollup_up``/``rollup_finalize`` exactly like a batch
    partial table."""
    spec = _measure_spec(measures)
    raw = spark.read.parquet(path).drop("epoch")
    return raw.groupBy(*keys, "bucket_s").agg(*_refold(spec))


def rollup_compact(
    spark, path: str, out_path: str, keys: list[str], measures: dict[str, tuple]
) -> None:
    """Fold an epoch log into a single compacted partial table at
    ``out_path`` (written as ``epoch=compacted`` so the result is itself
    a valid log). Swapping the compacted dir over the live one is the
    caller's atomic-rename concern — this function never deletes."""
    merged = rollup_read(spark, path, keys, measures)
    merged.write.mode("overwrite").parquet(f"{out_path}/epoch=compacted")


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency


def interval_concurrency(
    df: DataFrame,
    keys: list[str],
    start_us: Column,
    end_us: Column,
    tiebreak: str | None = None,
    time_buckets: int | None = None,
) -> DataFrame:
    """Sweep-line occupancy over half-open intervals ``[start, end)``:
    each interval contributes +1 at its start and −1 at its end; the
    output is one row per boundary event with the RUNNING concurrency
    after applying it (``keys…, t_us, delta, running``). Boundary order
    is ``(t, delta[, tiebreak])`` — an end at time t frees its slot
    before a start at the same t claims one (half-open semantics).

    ``time_buckets=None`` runs one window pass per key — correct, but a
    single hot key sorts on a single task. ``time_buckets=n`` switches
    to the distributed prefix-sum: per-(key, time-bucket) delta sums
    (one tiny aggregate over n·|keys| rows) become per-bucket starting
    offsets via a window over BUCKETS (never rows); the row-level
    running sum then runs per (key, bucket) partition plus its offset —
    identical results (pinned in tests), worst partition bounded by the
    bucket span regardless of skew. Bucket bounds come from ONE O(1)
    min/max aggregate read (repo collect policy: bounded driver reads
    only)."""
    if tiebreak is not None and tiebreak not in df.columns:
        raise ValueError(f"tiebreak column {tiebreak!r} not in frame")
    boundary = F.explode(
        F.array(
            F.struct(start_us.alias("t_us"), F.lit(1).alias("delta")),
            F.struct(end_us.alias("t_us"), F.lit(-1).alias("delta")),
        )
    ).alias("__b")
    base_cols = [*keys] + ([tiebreak] if tiebreak else [])
    d = df.select(*base_cols, boundary).select(
        *base_cols, F.col("__b.t_us").alias("t_us"), F.col("__b.delta").alias("delta")
    )
    order = [F.col("t_us"), F.col("delta")] + (
        [F.col(tiebreak)] if tiebreak else []
    )

    if time_buckets is None:
        win = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return d.withColumn("running", F.sum("delta").over(win))

    if time_buckets < 1:
        raise ValueError("time_buckets must be >= 1")
    mn, mx = d.agg(F.min("t_us"), F.max("t_us")).first()
    if mn is None or mx is None:  # empty input: no buckets to build
        return d.withColumn("running", F.lit(None).cast("long"))
    span = max(int(mx) - int(mn) + 1, 1)
    bucket = F.least(
        F.lit(time_buckets - 1),
        F.floor((F.col("t_us") - F.lit(int(mn))) / F.lit(span / time_buckets)).cast("long"),
    ).alias("__tb")
    d = d.select("*", bucket)
    # per-(key, bucket) sums -> exclusive running offset over buckets
    offsets = d.groupBy(*keys, "__tb").agg(F.sum("delta").alias("__bsum"))
    owin = (
        Window.partitionBy(*keys)
        .orderBy("__tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = offsets.select(
        *keys, "__tb", F.coalesce(F.sum("__bsum").over(owin), F.lit(0)).alias("__off")
    )
    rwin = (
        Window.partitionBy(*keys, "__tb")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        d.join(F.broadcast(offsets), [*keys, "__tb"])
        .withColumn("running", F.sum("delta").over(rwin) + F.col("__off"))
        .drop("__tb", "__off")
    )
    return out


def max_concurrency(
    df: DataFrame,
    keys: list[str],
    start_us: Column,
    end_us: Column,
    tiebreak: str | None = None,
    time_buckets: int | None = None,
) -> DataFrame:
    """Peak concurrency per key: ``(keys…, max_concurrent, peak_at_us)``
    where ``peak_at_us`` is the EARLIEST boundary time at which the peak
    is reached. One aggregate over the sweep-line frame — ``max(struct(
    running, -t))`` picks the max running count, then the smallest time
    among its peers (struct comparison is lexicographic)."""
    r = interval_concurrency(df, keys, start_us, end_us, tiebreak, time_buckets)
    peak = F.max(F.struct(F.col("running"), (-F.col("t_us")).alias("neg_t")))
    return (
        r.groupBy(*keys)
        .agg(peak.alias("__p"))
        .select(
            *keys,
            F.col("__p.running").alias("max_concurrent"),
            (-F.col("__p.neg_t")).alias("peak_at_us"),
        )
    )


# ---------------------------------------------------------------------------
# LTTB downsampling


def lttb_downsample(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    width: str | int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per key: keep ONE
    representative row per ``width`` time bucket — the first bucket's
    earliest row, the last bucket's latest row, and for every interior
    bucket the row maximizing the triangle area against the NEIGHBOUR
    BUCKETS' centroids (ties → earliest, then ``tiebreak``). Output =
    the chosen rows with their original columns plus ``bucket_s``.

    This is the parallel LTTB variant: classic LTTB anchors each
    triangle on the previously SELECTED point, which makes the scan
    inherently sequential per key; anchoring on the previous bucket's
    centroid (the standard distributed relaxation) decouples buckets so
    the whole selection is two aggregates + two window passes + one
    keyed join — no per-key sequential state, identical visual intent.
    Time-width buckets replace classic equal-COUNT buckets (no global
    per-key row numbering pass; a dense series makes them equivalent).

    Cross-engine determinism note: centroid averages divide exact
    integer sums when ``value`` is integral — pass a scaled-integer
    column (and descale after) if results must hash-match an external
    replay; arbitrary doubles still work but their centroid sums are
    order-sensitive in the last ulp."""
    w = _width_s(width)
    if tiebreak is not None and tiebreak not in df.columns:
        raise ValueError(f"tiebreak column {tiebreak!r} not in frame")
    pts = df.select(
        "*",
        time_bucket_s(ts, w, "bucket_s"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__t_us"),
    )
    # centroid time sums BUCKET-RELATIVE offsets (≤ width_us each):
    # summing absolute epoch-µs overflows int64 at ~5e3 rows/bucket —
    # caught by the 8× scale probe, invisible at fixture scale
    rel_t = F.col("__t_us") - F.col("bucket_s") * F.lit(1_000_000)
    base_t = (F.col("bucket_s") * F.lit(1_000_000)).cast("double")
    stats = pts.groupBy(*keys, "bucket_s").agg(
        (F.sum(rel_t).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "__avg_rel"
        ),
        (F.sum(value).cast("double") / F.count(F.lit(1)).cast("double")).alias("__avg_v"),
    ).select("*", (base_t + F.col("__avg_rel")).alias("__avg_t")).drop("__avg_rel")
    swin = Window.partitionBy(*keys).orderBy("bucket_s")
    swin_d = Window.partitionBy(*keys).orderBy(F.col("bucket_s").desc())
    nb = stats.select(
        *keys,
        "bucket_s",
        F.lag("__avg_t").over(swin).alias("__p_t"),
        F.lag("__avg_v").over(swin).alias("__p_v"),
        F.lead("__avg_t").over(swin).alias("__n_t"),
        F.lead("__avg_v").over(swin).alias("__n_v"),
        F.row_number().over(swin).alias("__rn_a"),
        F.row_number().over(swin_d).alias("__rn_d"),
    )
    j = pts.join(nb, [*keys, "bucket_s"])
    p_vd = F.col(value).cast("double")
    t_d = F.col("__t_us").cast("double")
    area2 = F.abs(
        F.col("__p_t") * (p_vd - F.col("__n_v"))
        + t_d * (F.col("__n_v") - F.col("__p_v"))
        + F.col("__n_t") * (F.col("__p_v") - p_vd)
    )
    score = (
        F.when(F.col("__rn_a") == 1, -t_d)
        .when(F.col("__rn_d") == 1, t_d)
        .otherwise(area2)
    )
    order = [F.col("__score").desc(), F.col("__t_us")] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    pick = Window.partitionBy(*keys, "bucket_s").orderBy(*order)
    out = (
        j.withColumn("__score", score)
        .withColumn("__pick", F.row_number().over(pick))
        .filter(F.col("__pick") == 1)
        .drop(
            "__t_us", "__p_t", "__p_v", "__n_t", "__n_v",
            "__rn_a", "__rn_d", "__score", "__pick",
        )
    )
    return out


# ---------------------------------------------------------------------------
# EWMA


def ewma(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    alpha: float,
    tiebreak: str | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average in event-time
    order: ``y_1 = x_1``, ``y_i = (1−α)·y_{i−1} + α·x_i`` (the
    ``adjust=False`` convention). Output = the input rows plus
    ``out_col``.

    Why this is a Pandas-UDF operator (the repo's documented exception
    class): the recurrence is inherently SEQUENTIAL per key — the
    closed form ``y_t = α·Σ(1−α)^{t−i}·x_i`` needs ``(1−α)^{−i}``
    prefix factors that overflow doubles after ~700 steps, so no
    window-function rendering is numerically sound. The scan is one
    ``applyInPandas`` per key group (Arrow batch in, numpy recurrence,
    Arrow batch out) over a single keyed shuffle; state is O(1) per
    row. A hot key serializes its own rows only — the same bound any
    per-key ordered scan has.

    The recurrence multiplies in a FIXED order (``b·prev + α·x``) so an
    external replay of the identical chain (e.g. a SQL recursive CTE)
    reproduces every double bit-for-bit."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if tiebreak is not None and tiebreak not in df.columns:
        raise ValueError(f"tiebreak column {tiebreak!r} not in frame")
    from pyspark.sql.types import DoubleType, StructField, StructType

    # fresh StructType: StructType.add MUTATES the frame's cached schema
    schema_out = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    sort_cols = [ts] + ([tiebreak] if tiebreak else [])
    a = float(alpha)
    b = 1.0 - a
    val = value

    def _fn(pdf):
        import numpy as np

        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[val].to_numpy(dtype="float64")
        y = np.empty_like(x)
        prev = 0.0
        for i in range(len(x)):
            prev = x[i] if i == 0 else b * prev + a * x[i]
            y[i] = prev
        out = pdf.copy()
        out[out_col] = y
        return out

    return df.groupBy(*keys).applyInPandas(_fn, schema=schema_out)


# ---------------------------------------------------------------------------
# Cohort retention


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts: str,
    period: str | int = "1 week",
) -> DataFrame:
    """Classic retention matrix: a user's COHORT is the epoch-aligned
    period of their first activity; for every (cohort, period_index ≥ 0)
    report distinct active users and the retained fraction of the
    cohort. Output: ``(cohort_s, period_index, active_users,
    cohort_size, retention)``.

    Plan: distinct (user, period) — map-side combinable — then min-per-
    user cohorts (keyed agg), one keyed join back on user, and a final
    (cohort, index) aggregate; cohort sizes are O(periods) and broadcast
    onto the matrix. No window over users, no driver collect."""
    w = _width_s(period)
    au = df.select(
        F.col(user_col).alias("u"), time_bucket_s(ts, w, "p")
    ).distinct()
    first = au.groupBy("u").agg(F.min("p").alias("cohort_s"))
    mat = (
        au.join(first, "u")
        .groupBy(
            "cohort_s",
            ((F.col("p") - F.col("cohort_s")) / w).cast("long").alias("period_index"),
        )
        .agg(F.count_distinct("u").alias("active_users"))
    )
    sizes = first.groupBy("cohort_s").agg(F.count_distinct("u").alias("cohort_size"))
    return (
        mat.join(F.broadcast(sizes), "cohort_s")
        .select(
            "cohort_s",
            "period_index",
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 4).alias("retention"),
        )
    )
