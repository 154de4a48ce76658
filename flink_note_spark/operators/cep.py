"""Complex-event-processing pattern matching (Flink CEP analogue).

Flink v1.12 ships the CEP library on top of exactly the DataStream
runtime the reference notes trace (keyed state + event-time timers —
SURVEY.md §2.2 "Stateful per-key processing"): ``Pattern.begin("a")
.next("b").followedBy("c").within(Time...)`` compiles to an NFA operator
over a keyed stream. This module re-expresses the CEP pattern surface
Spark-first, as declarative plans Catalyst can optimize, instead of an
imperative NFA:

- **strict contiguity** (Flink ``next``): the pattern's steps are
  ADJACENT events of the key's event-time-ordered stream. One window
  pass: ``lead(type, i)`` per step over (key, time) — a single shuffle
  on the key, no joins, no Python. Quantified loop steps
  (``one_or_more``) split the pattern into fixed-offset segments glued
  by (key, position) equi-joins over precomputed run metadata
  (gaps-and-islands) — one extra co-partitioned join per loop step,
  never a cross join.
- **non-deterministic relaxed** (Flink ``followedByAny``,
  skip-till-ANY-match, r7): an any-step binds EVERY candidate after
  the previous step (one match per combination) via a key equi-join —
  fan-out is the per-combination output size, the honest cost of the
  semantics. Plain single-event steps only; uniform relaxed patterns;
  batch-only.
- **relaxed contiguity** (Flink ``followedBy``, skip-till-next-match):
  each step matches the EARLIEST event of its type strictly after the
  previous step's event. One union + running-``min`` window pass per
  step — every pass shuffles on the same key, so AQE/exchange reuse
  keeps it one physical repartition; no correlated per-row subqueries,
  no cross join, no per-key Python. Loop steps use one (key) equi-join
  + group-agg whose fan-out is bounded by the actual run length (the
  honest output size); per-key skew is bounded by the ``within``
  horizon pruning applied at every step.

Quantifier / negation surface (round 6; Flink CEP pattern API closure):

- ``times(n)`` — exact-n repetition of a step. Strict: n CONSECUTIVE
  events (Flink ``times(n).consecutive()``); relaxed: n successive
  earliest-after bindings. Pure pattern expansion in both modes.
- ``one_or_more()`` — GREEDY loop by default (Flink
  ``oneOrMore().greedy()``): strict = the maximal consecutive run of
  the type (``consecutive()``); relaxed = every matching event before
  the stop bound (``until`` event and/or the ``within`` horizon;
  unbounded = to the end of the key's stream). Deterministic: one
  match per start. Flink's actual default (non-greedy, every prefix
  is a match) is ``skip_strategy="no_skip"`` (r7) — see
  :data:`SKIP_STRATEGIES` and :func:`_apply_skip` for the
  ``AfterMatchSkipStrategy`` surface (``no_skip`` / ``skip_to_next``
  / ``skip_past_last_event`` / ``skip_to_first:i`` /
  ``skip_to_last:i``).
- ``until(t)`` — stop condition for a RELAXED loop (a strict run ends
  at the first non-matching event by construction, so ``until`` raises
  there, mirroring Flink's ``consecutive()`` + ``until`` interplay).
- ``not_next(t)`` (strict) — the event at the current position is NOT
  of the given type (or the stream ended). Asserts, does not consume:
  ``A.not_next(X).next(B)`` requires the event after A to be B and not
  X, exactly Flink's ``notNext``.
- ``not_followed_by(t)`` (relaxed) — NO event of the type strictly
  between the previous step's event and the next step's event. As the
  LAST step it requires ``within`` (Flink's rule: a terminal
  ``notFollowedBy`` needs a window) and asserts absence up to the
  pattern horizon. Boundary: an event of the negated type at exactly
  the next step's timestamp does NOT break the match (open interval).
- ``optional()`` / ``times(n, m)`` — variant expansion into a UNION
  ALL of plain patterns (every branch/count alternative emits,
  Flink's branching semantics); an absent optional step's ``ts_i`` is
  NULL.
- ``where(condition)`` (r7) — Flink ``where(SimpleCondition)``: an
  extra per-step VALUE predicate (``Column`` or SQL string) ANDed with
  the type equality. Engines match on per-step candidate booleans
  precomputed before payload pruning (``_with_cand_cols``) — the plan
  shapes are unchanged (lead chains read the boolean, relaxed passes
  filter by it, strict loop runs are islands of the boolean, so a
  same-type event failing the predicate breaks the run). Batch-only
  (the streaming buffer keys by type); simple per-event conditions,
  not Flink's IterativeCondition over earlier bindings.
- **MIXED contiguity** (r6) — ``next`` and ``followed_by`` freely
  combined per step, Flink's real API shape: the positional
  sequential engine (``_match_mixed``) orders each key by
  ``row_number`` over (time, tiebreak); strict steps join the base
  row at ``pos+1`` (co-partitioned (key, pos) equi-joins), relaxed
  steps bind the earliest later position (union + running struct-min
  window passes). Uniform patterns keep the faster specialized plans.

The streaming twin (``streaming/ops.match_pattern_stream``) runs
plain/``times`` patterns on the incremental positional engine and (r7)
negation + greedy ``one_or_more``/``until`` patterns on a general
per-key engine (``_make_general_cep_fn``), both with
``applyInPandasWithState`` + event-time timers, equality-tested
against the batch operator in tests/test_streaming.py. Batch-only:
``optional()``/``times(n, m)``, mixed contiguity, and strict-mode
terminal negation/loops (no final answer on an unbounded stream).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Flink ``AfterMatchSkipStrategy`` surface (r7). ``greedy`` is THIS
#: engine's historical default (maximal loop runs, one match per
#: anchor — documented deviation); the rest are Flink's:
#: ``no_skip`` (Flink's default NO_SKIP: non-greedy loops emit every
#: prefix, all overlapping matches survive), ``skip_to_next`` (per
#: match-start event only the first-completing match survives),
#: ``skip_past_last_event`` (after a match is emitted, every match
#: starting at or before its last event's time is pruned — resumed
#: strictly past the match, Flink's SKIP_PAST_LAST_EVENT at event-time
#: granularity), and ``skip_to_first:<i>`` / ``skip_to_last:<i>``
#: (Flink ``skipToFirst/skipToLast(patternName)`` with the 1-based
#: POSITIVE-step index standing in for the step name: after a match is
#: emitted, matches starting strictly before the first/last event the
#: emitted match bound to step ``i`` are pruned; matches starting at
#: or after it survive). A ``("skip_to_first", i)`` tuple is accepted
#: as the colon form's structured spelling.
SKIP_STRATEGIES = (
    "greedy", "no_skip", "skip_to_next", "skip_past_last_event",
    "skip_to_first", "skip_to_last",
)


def _parse_skip(skip_strategy) -> tuple[str, int | None] | None:
    """Normalize a skip-strategy spec to ``(kind, step_index|None)``;
    raises on unknown kinds (step-index RANGE validation needs the
    normalized steps and happens in :func:`_apply_skip`)."""
    if skip_strategy is None:
        return None
    if isinstance(skip_strategy, tuple):
        kind, arg = skip_strategy
    else:
        kind, _, arg = str(skip_strategy).partition(":")
        arg = arg or None
    if kind not in SKIP_STRATEGIES:
        raise ValueError(
            f"skip_strategy must be one of {SKIP_STRATEGIES}, "
            f"got {skip_strategy!r}"
        )
    if kind in ("skip_to_first", "skip_to_last"):
        if arg is None:
            raise ValueError(
                f"{kind} requires a 1-based positive-step index "
                f"('{kind}:2' or ('{kind}', 2))"
            )
        return (kind, int(arg))
    if arg is not None:
        raise ValueError(f"{kind} takes no step index, got {skip_strategy!r}")
    return (kind, None)


@dataclass(frozen=True)
class PatternStep:
    """One normalized pattern step (see module docstring for semantics).

    ``times_max`` makes ``times`` a RANGE quantifier (Flink
    ``times(from, to)``); ``optional`` is Flink ``optional()`` — the
    step may be skipped entirely. Both compile by VARIANT EXPANSION
    (see :func:`_expand_variants`)."""

    event_type: str
    negate: bool = False
    times: int = 1
    loop: bool = False
    until: str | None = None
    times_max: int | None = None
    optional: bool = False
    #: per-step contiguity for MIXED patterns (``next`` + ``followedBy``
    #: in one pattern, r6); ``None`` inherits ``match_pattern``'s
    #: ``contiguity`` argument
    mode: str | None = None
    #: Flink ``where()`` (r7/r8): an extra per-step value predicate
    #: (a ``Column`` or SQL string) ANDed with the type equality — the
    #: step only matches events satisfying BOTH. SQL strings may carry
    #: cross-step refs ``s<k>./first./prev.`` (Flink's
    #: IterativeCondition, r8 — see :meth:`Pattern.where`). Batch
    #: engines only (streaming raises).
    #: ``compare=False``: a Column's ``==`` builds an expression, it
    #: does not test equality.
    where: object | None = field(default=None, compare=False)
    #: Flink ``followedByAny`` (r7): NON-DETERMINISTIC relaxed
    #: contiguity — the step binds EVERY candidate event after the
    #: previous step (within the horizon), one match per combination,
    #: instead of skip-till-next-match's earliest-only binding.
    any_match: bool = False

    def validate(self) -> None:
        if self.times < 1:
            raise ValueError("times must be >= 1")
        if self.negate and (
            self.times != 1 or self.loop or self.until
            or self.times_max is not None or self.optional
        ):
            raise ValueError("a negated step cannot be quantified")
        if self.loop and (self.times != 1 or self.times_max is not None):
            raise ValueError("one_or_more and times are mutually exclusive")
        if self.until is not None and not self.loop:
            raise ValueError("until applies only to one_or_more steps")
        if self.times_max is not None and self.times_max < self.times:
            raise ValueError("times(n, m) requires m >= n")
        if self.any_match and (
            self.negate or self.times != 1
            or self.times_max is not None
        ):
            raise ValueError(
                "followedByAny steps are plain or one_or_more steps "
                "(times()/negated any-steps are out of scope; r8 "
                "lifted the loop refusal)"
            )
        # optional + loop == Flink zeroOrMore: legal, expands to the
        # absent-or-oneOrMore variant pair (_expand_variants)


class Pattern:
    """Fluent Flink-style CEP pattern builder.

    ``Pattern.begin("view").followed_by("click").one_or_more()
    .until("purchase").followed_by("purchase").within("7 days")``

    Contiguity is per step, like Flink's: ``next``/``not_next`` are
    strict, ``followed_by``/``not_followed_by`` relaxed. Uniform
    patterns compile to the specialized single-mode plans; MIXED
    patterns (r6) run on the positional sequential engine
    (``_match_mixed``).
    """

    def __init__(self) -> None:
        self.steps: list[PatternStep] = []
        self.contiguity: str | None = None
        self.within_: str | None = None
        self.skip_: str | None = None

    @classmethod
    def begin(
        cls, event_type: str, skip_strategy: str | tuple | None = None
    ) -> "Pattern":
        """Flink's ``Pattern.begin(name, AfterMatchSkipStrategy...)``
        signature — the optional second argument is the skip strategy
        (equivalently chain :meth:`skip`)."""
        p = cls()
        p.steps.append(PatternStep(event_type))
        if skip_strategy is not None:
            p.skip(skip_strategy)
        return p

    def _set_mode(self, mode: str) -> None:
        if self.contiguity is None:
            self.contiguity = mode
        elif self.contiguity != mode:
            self.contiguity = "mixed"  # per-step modes decide (r6)

    def _append(self, step: PatternStep, mode: str) -> "Pattern":
        self._set_mode(mode)
        self.steps.append(step)
        return self

    def next(self, event_type: str) -> "Pattern":
        return self._append(
            PatternStep(event_type, mode="strict"), "strict"
        )

    def followed_by(self, event_type: str) -> "Pattern":
        return self._append(
            PatternStep(event_type, mode="relaxed"), "relaxed"
        )

    def not_next(self, event_type: str) -> "Pattern":
        return self._append(
            PatternStep(event_type, negate=True, mode="strict"), "strict"
        )

    def followed_by_any(self, event_type: str) -> "Pattern":
        """Flink ``followedByAny`` (r7): non-deterministic relaxed —
        the step binds EVERY later candidate, one match per
        combination (skip-till-ANY-match)."""
        return self._append(
            PatternStep(event_type, mode="relaxed", any_match=True),
            "relaxed",
        )

    def not_followed_by(self, event_type: str) -> "Pattern":
        return self._append(
            PatternStep(event_type, negate=True, mode="relaxed"), "relaxed"
        )

    def _mod_last(self, **kw) -> "Pattern":
        if not self.steps:
            raise ValueError("no step to quantify")
        last = self.steps[-1]
        if isinstance(last, dict) and "group" in last:
            # quantifiers on a GROUP (r11): merge into the group spec —
            # expansion happens in match_pattern
            merged = dict(last)
            for k in ("times", "times_max", "optional", "loop"):
                if k in kw:
                    merged[k] = kw[k]
            if kw.get("where") is not None or kw.get("until") is not None:
                raise ValueError(
                    "where()/until() apply to single steps, not groups "
                    "(put the predicate on a step inside the group)"
                )
            self.steps[-1] = merged
            return self
        new = PatternStep(
            last.event_type,
            negate=last.negate,
            times=kw.get("times", last.times),
            loop=kw.get("loop", last.loop),
            until=kw.get("until", last.until),
            times_max=kw.get("times_max", last.times_max),
            optional=kw.get("optional", last.optional),
            mode=last.mode,
            where=kw.get("where", last.where),
            any_match=last.any_match,
        )
        new.validate()
        self.steps[-1] = new
        return self

    def where(self, condition) -> "Pattern":
        """Flink ``where()`` (r7/r8): attach a value predicate
        (``Column`` or SQL string) to the LAST step — the step matches
        only events of its type that also satisfy the condition.

        SQL strings may reference EARLIER matched steps (Flink's
        ``IterativeCondition``, r8) as ``s<k>.<col>`` (k = 1-based
        positive step index, the ``ts_<k>`` numbering, binding the
        step's FIRST event), with ``first.<col>`` / ``prev.<col>``
        sugar: ``.followed_by("purchase").where("value > s1.value")``.
        Iterative conditions run on the batch strict lead-chain
        (lead∘lag window expressions, zero joins) and the relaxed
        engine (earliest-QUALIFYING binding via one co-partitioned
        key equi-join per step, including on/into oneOrMore loops);
        they do not compose with strict loops, optional()/times(n, m),
        the mixed engine, or streaming."""
        return self._mod_last(where=condition)

    def or_(self, condition) -> "Pattern":
        """Flink ``where(...).or(...)`` (r8): OR-combine another
        condition into the LAST step's predicate. String conditions
        combine as SQL (keeping iterative-ref detection intact);
        mixing a string with a Column lifts both to Columns via
        ``F.expr``. Requires a preceding :meth:`where`."""
        last = self.steps[-1] if self.steps else None
        if last is None or last.where is None:
            raise ValueError("or_() requires a preceding where()")
        old = last.where
        if isinstance(old, str) and isinstance(condition, str):
            combined: object = f"({old}) OR ({condition})"
        else:
            oc = F.expr(old) if isinstance(old, str) else old
            nc = (
                F.expr(condition) if isinstance(condition, str)
                else condition
            )
            combined = oc | nc
        return self._mod_last(where=combined)

    def times(self, n: int, m: int | None = None) -> "Pattern":
        return self._mod_last(times=n, times_max=m)

    def optional(self) -> "Pattern":
        return self._mod_last(optional=True)

    def one_or_more(self) -> "Pattern":
        return self._mod_last(loop=True)

    def zero_or_more(self) -> "Pattern":
        """Flink ``oneOrMore().optional()``: the greedy run may also be
        entirely absent (variant expansion — ``n_i`` NULL on the absent
        branch)."""
        return self._mod_last(loop=True, optional=True)

    def until(self, event_type: str) -> "Pattern":
        return self._mod_last(until=event_type)

    def within(self, duration: str) -> "Pattern":
        self.within_ = duration
        return self

    def _append_group(self, sub, mode: str) -> "Pattern":
        """Flink GROUP patterns (r11): ``next(subPattern)`` /
        ``followedBy(subPattern)`` — the whole sub-pattern becomes one
        quantifiable element; chain ``times(n[, m])`` / ``optional()``
        to repeat it as a block, or ``one_or_more()`` (r12) for the
        within-bounded loop (see :func:`_match_group_loop`). ``mode``
        is the ENTRY and inter-iteration contiguity."""
        steps = sub.steps if isinstance(sub, Pattern) else list(sub)
        self._set_mode(mode)
        self.steps.append({"group": steps, "mode": mode})
        return self

    def next_group(self, sub) -> "Pattern":
        return self._append_group(sub, "strict")

    def followed_by_group(self, sub) -> "Pattern":
        return self._append_group(sub, "relaxed")

    @classmethod
    def begin_group(cls, sub) -> "Pattern":
        """Flink ``Pattern.begin(subPattern)`` — start with a group
        (its first step anchors, so the entry mode is moot; iterations
        connect by the group's own step modes unless re-attached via
        ``times`` expansion with a later ``mode``)."""
        p = cls()
        steps = sub.steps if isinstance(sub, Pattern) else list(sub)
        p.steps.append({"group": steps})
        return p

    def skip(self, strategy) -> "Pattern":
        """Flink ``AfterMatchSkipStrategy`` (r7) — see
        :func:`match_pattern`'s ``skip_strategy``. Flink attaches the
        strategy at ``Pattern.begin(..., skipStrategy)``; a chainable
        verb reads better in Python and the explicit ``match_pattern``
        argument still wins."""
        try:
            _parse_skip(strategy)
        except ValueError as e:
            raise ValueError(f"skip strategy: {e}") from None
        self.skip_ = strategy
        return self


def _norm_one(p) -> PatternStep:
    if isinstance(p, PatternStep):
        s = p
    elif isinstance(p, str):
        s = PatternStep(p)
    elif isinstance(p, dict):
        if "group" in p:
            raise ValueError(
                "group patterns expand by block-variant flattening in "
                "the BATCH operator (match_pattern) — the incremental "
                "streaming engines never see them; stream a group "
                "pattern through pattern_stream_start(engine='auto'), "
                "which routes it via incremental replay"
            )
        s = PatternStep(
            p["type"],
            negate=bool(p.get("negate", False)),
            times=int(p.get("times", 1)),
            loop=bool(p.get("one_or_more", p.get("loop", False))),
            until=p.get("until"),
            times_max=p.get("times_max"),
            optional=bool(p.get("optional", False)),
            mode=p.get("mode"),
            where=p.get("where"),
            any_match=bool(p.get("any", p.get("any_match", False))),
        )
    else:
        raise TypeError(f"bad pattern step: {p!r}")
    s.validate()
    return s


def _normalize(pattern) -> list[PatternStep]:
    if isinstance(pattern, Pattern):
        pattern = pattern.steps
    steps = [_norm_one(p) for p in pattern]
    if not any(not s.negate for s in steps):
        raise ValueError("pattern must name at least one positive event type")
    return steps


def _expand_group_variants(pattern):
    """Flink GROUP patterns (r11 — ``Pattern.begin(subPattern)`` /
    ``next(subPattern)`` / ``followedBy(subPattern)`` with ``times(n)``
    / ``times(n, m)`` / ``optional()`` on the whole group): a spec
    ``{"group": [sub-steps], "times": n[, "times_max": m]
    [, "optional": True][, "mode": "strict"|"relaxed"]}`` repeats the
    sub-pattern as a block. Returns ``None`` when the pattern has no
    groups; otherwise ``(variants, posmaps, template)``:

    - exact counts FLATTEN — the sub-steps copied ``n`` times, each
      copy's FIRST step taking the group's ``mode`` (the
      inter-iteration and entry contiguity, Flink's ``next`` vs
      ``followedBy`` attachment);
    - ranges / ``optional`` expand into BLOCK VARIANTS, one flat
      pattern per repetition count (the step-level variant-union
      convention: the result is the union over counts). ``posmaps``
      carries each variant's positive-step → GLOBAL-position mapping
      (global geometry = every group at its MAX count, post-group
      steps pinned to the tail) so outputs align positionally with
      trailing columns NULL on shorter variants; ``template`` is the
      max-count step list (defines the global output columns).

    ``one_or_more()`` on a group is NOT handled here (r12): it routes
    through :func:`_match_group_loop`, which bounds the repetition by
    the ``within`` horizon's data-implied density and emits the
    bound-independent collapsed geometry; reaching this function with
    a loop group means the caller skipped that routing."""
    base = pattern.steps if isinstance(pattern, Pattern) else pattern
    if not isinstance(base, list) or not any(
        isinstance(p, dict) and "group" in p for p in base
    ):
        return None
    import dataclasses

    variants: list[tuple[list[PatternStep], list[int]]] = [([], [])]
    template: list[PatternStep] = []
    gpos = 0  # global positive-step counter (max-count geometry)
    for p in base:
        if isinstance(p, dict) and "group" in p:
            if p.get("one_or_more") or p.get("loop"):
                raise ValueError(
                    "group one_or_more() reached the ranged-group "
                    "expansion — it is supported ONLY through "
                    "match_pattern (within-bounded, collapsed "
                    "geometry); call match_pattern / "
                    "pattern_stream_start instead"
                )
            sub = _normalize(list(p["group"]))
            n = int(p.get("times", 1))
            tm = p.get("times_max")
            m = n if tm is None else int(tm)
            if n < 1 or m < n:
                raise ValueError(
                    f"group times range must satisfy 1 <= n <= m, got "
                    f"({n}, {m})"
                )
            counts = sorted(
                ({0} if p.get("optional") else set()) | set(range(n, m + 1))
            )
            mode = p.get("mode")
            subm = list(sub)
            if mode is not None:
                subm[0] = dataclasses.replace(sub[0], mode=mode)
            L = sum(1 for s in sub if not s.negate)
            for _ in range(m):
                template.extend(subm)
            variants = [
                (
                    sv + subm * k,
                    pv + list(range(gpos + 1, gpos + k * L + 1)),
                )
                for sv, pv in variants
                for k in counts
            ]
            gpos += m * L
        else:
            s = _norm_one(p)
            if s.negate:
                variants = [(sv + [s], pv) for sv, pv in variants]
            else:
                gpos += 1
                variants = [
                    (sv + [s], pv + [gpos]) for sv, pv in variants
                ]
            template.append(s)
    # a zero-count choice can leave a variant with no positive step —
    # not a match (drop it, mirroring the step-variant convention)
    kept = [
        (sv, pv) for sv, pv in variants if any(not s.negate for s in sv)
    ]
    if not kept:
        raise ValueError("group expansion left no viable pattern variant")
    return [sv for sv, _ in kept], [pv for _, pv in kept], template


def _resolve_contiguity(
    steps: list[PatternStep], contiguity: str | None
) -> str:
    """Pattern-level contiguity resolution — the ONE rule shared by the
    batch router and the streaming dispatcher (review r6: the two had
    drifted, so identical specs picked different engines). Step-level
    modes are more specific than the ``contiguity`` argument (which is
    the pattern-level default); the FIRST step's mode never decides on
    its own (it anchors — only the tail's modes express contiguity);
    ``'mixed'`` is returned when the tail genuinely mixes."""
    default_mode = contiguity if contiguity not in (None, "mixed") else None
    eff = []
    for i, s in enumerate(steps):
        m = s.mode or default_mode
        if m is None and i > 0 and contiguity == "mixed":
            raise ValueError(
                "mixed contiguity requires an explicit mode per step "
                "(use the Pattern builder or dict steps with 'mode')"
            )
        eff.append(m)
    tail = {m for m in eff[1:] if m is not None}
    if len(tail) > 1:
        return "mixed"
    if tail:
        return tail.pop()
    if contiguity in ("strict", "relaxed"):
        return contiguity
    return eff[0] or "strict"


def _expand_simple_steps(steps: list[PatternStep]) -> list[str]:
    out: list[str] = []
    for s in steps:
        if s.negate or s.loop or s.optional or s.times_max is not None:
            raise ValueError(
                "streaming CEP supports plain and exact times() steps "
                "only; one_or_more/negation/optional/times-range are "
                "batch-only"
            )
        out.extend([s.event_type] * s.times)
    return out


def expand_simple(pattern) -> list[str]:
    """Expand a pattern into a plain type list IF it contains only
    positive plain/``times`` steps (the surface the incremental
    streaming matcher supports); raise otherwise."""
    steps = _normalize(pattern)
    if _resolve_contiguity(steps, None) == "mixed":
        raise ValueError(
            "streaming CEP is single-contiguity; mixed patterns are "
            "batch-only"
        )
    return _expand_simple_steps(steps)


def _out_cols(steps: list[PatternStep]) -> list[str]:
    cols: list[str] = []
    i = 0
    for s in steps:
        if s.negate:
            continue
        i += 1
        cols.append(f"ts_{i}")
        if s.loop:
            cols += [f"ts_{i}_last", f"n_{i}"]
        elif s.times > 1 or s.times_max is not None:
            cols.append(f"ts_{i}_last")
    return cols


def _expand_variants(
    steps: list[PatternStep],
) -> list[tuple[list[PatternStep], list[int]]]:
    """Compile ``optional()`` / ``times(n, m)`` steps into the list of
    PLAIN pattern variants (Flink's branching NFA rendered as a union
    of deterministic patterns): each optional step is present/absent,
    each range quantifier fixes one count in [n, m]. Returns
    ``(variant_steps, orig_idx)`` pairs where ``orig_idx[j]`` is the
    ORIGINAL 1-based positive-step index of the variant's j-th positive
    step (for output-column realignment). Variants with no positive
    step are dropped (an all-absent pattern matches nothing)."""
    per_step: list[list[tuple[PatternStep | None, int]]] = []
    pidx = 0
    for s in steps:
        if s.negate:
            per_step.append([(s, 0)])
            continue
        pidx += 1
        opts: list[tuple[PatternStep | None, int]] = []
        if s.optional:
            opts.append((None, pidx))
        counts = (
            range(s.times, s.times_max + 1)
            if s.times_max is not None else [s.times]
        )
        for c in counts:
            opts.append((
                PatternStep(s.event_type, times=c, loop=s.loop,
                            until=s.until, mode=s.mode, where=s.where,
                            any_match=s.any_match),
                pidx,
            ))
        per_step.append(opts)

    variants: list[tuple[list[PatternStep], list[int]]] = []

    def rec(i: int, cur: list[PatternStep], orig: list[int]) -> None:
        if i == len(per_step):
            if any(not s.negate for s in cur):
                variants.append((list(cur), list(orig)))
            return
        for step, oi in per_step[i]:
            if step is None:
                rec(i + 1, cur, orig)
            else:
                cur.append(step)
                if not step.negate:
                    orig.append(oi)
                rec(i + 1, cur, orig)
                cur.pop()
                if not step.negate:
                    orig.pop()

    rec(0, [], [])
    return variants


def _match_group_union(
    events: DataFrame,
    variants,
    posmaps,
    template,
    *,
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    contiguity: str | None,
    tiebreak: list[str] | None,
    skip_strategy,
    carry_payload,
) -> DataFrame:
    """Union the block variants of a RANGED/optional group pattern
    (:func:`_expand_group_variants`), realigned to the max-count global
    geometry — each variant's positive step ``j`` renames to its global
    position ``posmaps[v][j-1]``, the remaining global columns NULL.
    The union over counts IS the group semantics (Flink's branching
    NFA emits a match per viable repetition count — the step-level
    variant convention). Skip strategies and payload capture refuse:
    pruning chains and carry requests are defined against ONE
    positional geometry, not a union of them (run the exact-count
    group, which flattens, or prune downstream)."""
    if skip_strategy is not None and _parse_skip(skip_strategy) is not None \
            and _parse_skip(skip_strategy)[0] != "greedy":
        raise ValueError(
            "skip strategies over RANGED/optional group patterns are "
            "unsupported (the pruning chain is defined against one "
            "positional geometry, not a union of block counts) — use "
            "an exact times(n) group (pure flattening) or prune the "
            "union downstream"
        )
    if carry_payload:
        raise ValueError(
            "carry_payload over RANGED/optional group patterns is "
            "unsupported (capture requests name one geometry) — use an "
            "exact times(n) group or attach_event_payload on the union"
        )
    full_cols = _out_cols(template)
    outs = []
    for v, pm in zip(variants, posmaps):
        o = match_pattern(
            events, v,
            key_col=key_col, time_col=time_col, type_col=type_col,
            within=within, contiguity=contiguity, tiebreak=tiebreak,
        )
        local_to_global: dict[str, str] = {}
        for j, g in enumerate(pm, start=1):
            for c_local, c_global in (
                (f"ts_{j}", f"ts_{g}"),
                (f"ts_{j}_last", f"ts_{g}_last"),
                (f"n_{j}", f"n_{g}"),
            ):
                if c_local in o.columns:
                    local_to_global[c_local] = c_global
        global_to_local = {g: c for c, g in local_to_global.items()}
        outs.append((o, global_to_local))
    # types for NULL padding come from the max-count variant, which has
    # every global column (its posmap is the identity over full_cols)
    typed = next(
        o for o, g2l in outs if set(g2l) == set(full_cols)
    )
    dtypes = dict(typed.dtypes)
    unioned = None
    for o, g2l in outs:
        sel = [F.col(key_col)]
        for c in full_cols:
            if c in g2l:
                sel.append(F.col(g2l[c]).alias(c))
            else:
                sel.append(F.lit(None).cast(dtypes[c]).alias(c))
        part = o.select(*sel)
        unioned = part if unioned is None else unioned.unionByName(part)
    return unioned


#: refusal ceiling for the data-implied group-loop bound (r12): above
#: this the block-variant union is no longer a sane plan at any scale —
#: refuse loudly (no silent caps) instead of quietly truncating matches.
_MAX_GROUP_REPS = 128


def _within_row_bound(
    events: DataFrame, key_col: str, time_col: str, within: str
) -> int:
    """Data-implied repetition bound for horizon-bounded loops: the
    densest ``within`` window on any key — no single match can consume
    more rows than fit its horizon. One window pass + one scalar agg
    (a bounded driver collect: the data-dependent plan-choice doctrine
    of the greedy disjointness probe)."""
    from flink_note_spark.operators.windows import _duration_us

    # the engines' within accepts any Spark fixed-width interval
    # literal; normalize week units before the µs parser (calendar
    # units — month/year — have no fixed µs width and stay refused)
    import re as _re

    wk = _re.fullmatch(r"\s*(\d+)\s*weeks?\s*", within.lower())
    if wk:
        within = f"{int(wk.group(1)) * 7} days"
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(time_col).cast("timestamp")))
        .rangeBetween(0, _duration_us(within))
    )
    row = (
        events.select(F.count(F.lit(1)).over(w).alias("__c"))
        .agg(F.max("__c"))
        .first()
    )
    return int(row[0]) if row is not None and row[0] else 1


def _loop_group_entries(pattern) -> "list[tuple] | None":
    """Parse a pattern containing LOOP groups into the entry list
    ``[("step", PatternStep) | ("loop", subs, mode, optional), ...]``
    used by :func:`_match_group_loop` — exact sibling groups flatten
    here (each copy's first step takes the group's mode). Returns None
    when no loop group is present. Validation (inner-step subset,
    sibling-group exactness) lives here so every caller — the batch
    union and the replay engine's terminality probe — refuses
    identically."""
    import dataclasses

    base = pattern.steps if isinstance(pattern, Pattern) else pattern
    if not isinstance(base, list) or not any(
        isinstance(p, dict) and "group" in p
        and (p.get("one_or_more") or p.get("loop"))
        for p in base
    ):
        return None
    entries: list[tuple] = []
    for p in base:
        if isinstance(p, dict) and "group" in p:
            subs = _normalize(list(p["group"]))
            if p.get("one_or_more") or p.get("loop"):
                bad = [
                    s for s in subs
                    if s.negate or s.loop or s.optional
                    or s.times != 1 or s.times_max is not None
                ]
                if bad:
                    raise ValueError(
                        "group one_or_more() supports plain single-"
                        "consume inner steps — bound nested "
                        "quantifiers/negations explicitly with a "
                        "times(n, m) group"
                    )
                entries.append(
                    ("loop", subs, p.get("mode"), bool(p.get("optional")))
                )
            elif p.get("times_max") is not None or p.get("optional"):
                raise ValueError(
                    "ranged/optional sibling groups alongside a group "
                    "loop are unsupported — expand the range to "
                    "explicit exact counts"
                )
            else:
                n = int(p.get("times", 1))
                subm = list(subs)
                if p.get("mode") is not None:
                    subm[0] = dataclasses.replace(subs[0], mode=p["mode"])
                for _ in range(n):
                    entries.extend(("step", s) for s in subm)
        else:
            entries.append(("step", _norm_one(p)))
    return entries


def _loop_group_template(entries: list[tuple]) -> list[PatternStep]:
    """The COLLAPSED output template of a loop-group pattern: loop-group
    inner steps rendered as step-level loops, so ``_out_cols`` yields
    the bound-independent ts/ts_last/n geometry (and the replay engine
    reads terminality off it — a pattern ending in a loop group ends in
    a loop step, hence horizon-open finality)."""
    import dataclasses

    collapsed: list[PatternStep] = []
    for e in entries:
        if e[0] == "step":
            collapsed.append(e[1])
        else:
            collapsed.extend(
                dataclasses.replace(s, loop=True) for s in e[1]
            )
    return collapsed


#: test hook: force the union path even when the strict fast path
#: applies (the fast==union differential pins equivalence)
_GROUP_LOOP_FAST = True


def _match_group_loop_strict_fast(
    events: DataFrame,
    subs: list[PatternStep],
    *,
    key_col: str,
    time_col: str,
    type_col: str,
    within: str,
    tiebreak: list[str] | None,
    max_reps: int,
) -> DataFrame:
    """FAST PATH for the common group-loop shape — ONE strict loop
    group as the whole pattern, plain type-equality inner steps (r12,
    measured 18.0 s → sub-second on q157 at sf0.1): instead of a union
    of k bounded engines (cost ∝ bound × engine pass), enumerate the
    matches directly, output-proportionally.

    A k-iteration match at position p is exactly: ``pair_start`` at
    positions p, p+L, …, p+(k−1)L, where ``pair_start(p)`` means the L
    consecutive rows from p carry the group's types in order. So:

    1. one keyed window pass: positions + L−1 type/ts leads →
       ``pair_start`` rows (the candidate predicate runs at the scan);
    2. gaps-and-islands over pair-starts within each ``(key, pos mod
       L)`` class (__pos − __rn·L constant inside a run): ``__rem`` =
       pair-starts remaining in the run from here on;
    3. ``explode(sequence(1, least(__rem, max_reps)))`` — every
       (start, k) candidate, capped by the horizon-density bound
       (semantics-free: k·L consecutive rows spanning ≤ within implies
       k·L ≤ the densest-window row count, the bound's definition);
    4. ONE co-partitioned equi-join back to the pair-start frame at
       ``__pos + (k−1)·L`` for the LAST iteration's timestamps, then
       the within filter.

    Three keyed shuffles total, all input/output-proportional — and
    NO density refusal: a boilerplate-flooded horizon produces many
    candidates only when they are genuine matches (output-
    proportional is the honest cost). Emission set == the union
    path's (differential-pinned in tests)."""
    L = len(subs)
    tb = list(tiebreak or [])
    w = Window.partitionBy(key_col).orderBy(time_col, *tb)
    df = events.select(key_col, time_col, type_col, *tb).withColumn(
        "__pos", F.row_number().over(w)
    )
    for j in range(1, L):
        df = df.withColumn(f"__t{j}", F.lead(type_col, j).over(w))
        df = df.withColumn(f"__ts{j}", F.lead(time_col, j).over(w))
    cond = F.col(type_col) == subs[0].event_type
    for j in range(1, L):
        cond = cond & (F.col(f"__t{j}") == subs[j].event_type)
    pairs = df.filter(cond).select(
        F.col(key_col),
        "__pos",
        F.col(time_col).alias("__ts0"),
        *[F.col(f"__ts{j}") for j in range(1, L)],
    )
    cls = F.pmod(F.col("__pos"), F.lit(L))
    wcls = Window.partitionBy(key_col, cls).orderBy("__pos")
    pairs = pairs.withColumn(
        "__isl", F.col("__pos") - F.row_number().over(wcls) * F.lit(L)
    )
    wisl = (
        Window.partitionBy(key_col, cls, "__isl")
        .orderBy("__pos")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    pairs = pairs.withColumn("__rem", F.count(F.lit(1)).over(wisl))
    pairs = pairs.localCheckpoint(eager=False)

    starts = pairs.select(
        F.col(key_col),
        F.col("__pos").alias("__spos"),
        *[F.col(f"__ts{j}").alias(f"__fts{j}") for j in range(L)],
        F.explode(
            F.sequence(
                F.lit(1), F.least(F.col("__rem"), F.lit(max_reps))
            )
        ).alias("__k"),
    ).withColumn(
        "__tpos", F.col("__spos") + (F.col("__k") - 1) * F.lit(L)
    )
    lasts = pairs.select(
        F.col(key_col),
        F.col("__pos").alias("__lpos"),
        *[F.col(f"__ts{j}").alias(f"__lts{j}") for j in range(L)],
    )
    out = starts.join(
        lasts,
        (starts[key_col] == lasts[key_col])
        & (F.col("__tpos") == F.col("__lpos")),
    ).drop(lasts[key_col])
    out = out.filter(
        F.col(f"__lts{L - 1}")
        <= F.col("__fts0") + F.expr(f"INTERVAL {within}")
    )
    sel = [F.col(key_col)]
    for j in range(1, L + 1):
        sel += [
            F.col(f"__fts{j - 1}").alias(f"ts_{j}"),
            F.col(f"__lts{j - 1}").alias(f"ts_{j}_last"),
            F.col("__k").cast("long").alias(f"n_{j}"),
        ]
    return out.select(*sel)


def _match_group_loop(
    events: DataFrame,
    pattern,
    *,
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    contiguity: str | None,
    tiebreak: list[str] | None,
    skip_strategy,
    carry_payload,
) -> DataFrame:
    """Flink ``Pattern.begin/next/followedBy(subPattern).oneOrMore()``
    (r12 — VERDICT r11 #5, the last CEP refusal closed): a group loop
    inside a ``within`` horizon has bounded repetitions at any event
    density the horizon admits, so the loop expands to the DATA-IMPLIED
    maximum count — densest within-window row count divided by the
    group's positive length, measured by ONE scalar probe job
    (:func:`_within_row_bound`) — and runs as the established
    block-variant union (the result is the union over repetition
    counts, exactly the ranged-group convention of q154).

    Output geometry is COLLAPSED to the step-loop convention so the
    SCHEMA is independent of the data bound (streaming replay probes
    the batch schema on an empty frame and every epoch must agree):
    each inner positive step j of the loop group occupies ONE output
    position carrying ``ts_<p>`` (the step's row in the FIRST
    iteration), ``ts_<p>_last`` (its row in the LAST iteration) and
    ``n_<p>`` (the iteration count; NULL on an absent optional group)
    — a single-step group loop therefore collapses to EXACTLY the
    step-level ``one_or_more`` output shape (pinned in tests).

    Subset (every refusal loud): ``within`` REQUIRED (no horizon → no
    bound — the original 'unbounded block expansion' refusal stands,
    now with the escape hatch); inner steps plain single-consume (no
    nested quantifiers/negations — bound nested repetition explicitly
    with ``times(n, m)``); sibling groups must be exact counts (pure
    flattening); non-greedy skip strategies and ``carry_payload``
    refuse exactly as ranged groups do; a data bound above
    ``_MAX_GROUP_REPS`` refuses (no silent caps) — tighten ``within``
    or bound the loop with ``times(n, m)``.

    Scale shape: the probe is one window+agg job; the union runs one
    bounded engine pass per viable count, each the same plan the exact
    group takes — at 100 TB the bound tracks the HORIZON's density,
    not corpus size, and a dense-horizon refusal is the honest answer
    (an engine that silently materialized 10⁶-step patterns would be
    lying about the cost)."""
    import dataclasses
    import itertools

    if within is None:
        raise ValueError(
            "group one_or_more() requires within= — the horizon is "
            "what bounds the repetition count (otherwise the block "
            "expansion is unbounded); or bound the repetition "
            "explicitly with times(n, m)"
        )
    skip = _parse_skip(skip_strategy)
    if skip is not None:
        # r13 (ADVICE): an EXPLICIT "greedy" is refused too, not
        # silently accepted — the loop-group union emits every
        # (start, count) pair, whereas step-level one_or_more under
        # greedy emits one maximal match per start; accepting the
        # keyword while changing its emission semantics would be a
        # silent divergence. skip_strategy=None is the loop-group
        # convention (every repetition count is a row).
        raise ValueError(
            "skip strategies over group loops are unsupported (the "
            "union of repetition counts has no single positional "
            "geometry — the ranged-group rule; explicit 'greedy' "
            "would not mean maximal-per-start here: every "
            "(start, count) pair is emitted) — leave skip_strategy "
            "None and prune the union downstream"
        )
    if carry_payload:
        raise ValueError(
            "carry_payload over group loops is unsupported (capture "
            "requests name one geometry) — use attach_event_payload "
            "on the union"
        )
    entries = _loop_group_entries(pattern)
    assert entries is not None  # caller routed on loop-group presence

    rows_bound = _within_row_bound(events, key_col, time_col, within)

    # fast path (r12): ONE non-optional strict loop group as the whole
    # pattern, plain type-equality steps — enumerate matches directly
    # (output-proportional, no density refusal) instead of the
    # bound-×-engines union; see _match_group_loop_strict_fast
    if _GROUP_LOOP_FAST and len(entries) == 1 and entries[0][0] == "loop":
        subs, gmode, optional = entries[0][1], entries[0][2], entries[0][3]

        def _eff(j: int, s: PatternStep) -> str | None:
            m = gmode if (j == 0 and gmode is not None) else s.mode
            return m or contiguity

        if (
            not optional
            and all(_eff(j, s) == "strict" for j, s in enumerate(subs))
            and all(s.where is None for s in subs)
        ):
            return _match_group_loop_strict_fast(
                events, subs,
                key_col=key_col, time_col=time_col, type_col=type_col,
                within=within, tiebreak=tiebreak,
                max_reps=max(1, rows_bound // len(subs)),
            )
    count_axes: list[list[int]] = []
    for e in entries:
        if e[0] != "loop":
            continue
        subs, optional = e[1], e[3]
        reps = max(1, rows_bound // len(subs))
        if reps > _MAX_GROUP_REPS:
            raise ValueError(
                f"group one_or_more(): the data-implied repetition "
                f"bound is {reps} (> {_MAX_GROUP_REPS}) — tighten "
                "within= or bound the loop with times(n, m)"
            )
        count_axes.append(list(range(0 if optional else 1, reps + 1)))

    # r13 (ADVICE): the per-axis bound alone does not bound the UNION —
    # itertools.product over k loop groups builds ∏|axis_i| engine
    # passes (two dense axes at the 128 cap would be a ~16k-branch
    # plan, a driver hang the single-axis refusal was meant to
    # prevent). Refuse when the product exceeds the same bound.
    n_branches = 1
    for axis in count_axes:
        n_branches *= len(axis)
    if n_branches > _MAX_GROUP_REPS:
        raise ValueError(
            f"group one_or_more(): the combined repetition space over "
            f"{len(count_axes)} loop groups is {n_branches} engine "
            f"passes (> {_MAX_GROUP_REPS}) — tighten within= or bound "
            "the loops with times(n, m)"
        )

    full_cols = _out_cols(_loop_group_template(entries))

    outs: list[tuple[DataFrame, dict]] = []
    for combo in itertools.product(*count_axes):
        steps: list[PatternStep] = []
        #: collapsed col -> local col name | ("lit", k) | None (absent)
        colmap: dict[str, object] = {}
        C = P = gi = 0
        for e in entries:
            if e[0] == "step":
                s = e[1]
                steps.append(s)
                if s.negate:
                    continue
                C += 1
                P += 1
                colmap[f"ts_{C}"] = f"ts_{P}"
                colmap[f"ts_{C}_last"] = f"ts_{P}_last"
                colmap[f"n_{C}"] = f"n_{P}"
            else:
                subs, mode, _opt = e[1], e[2], e[3]
                L = len(subs)
                k = combo[gi]
                gi += 1
                subm = list(subs)
                if mode is not None:
                    subm[0] = dataclasses.replace(subs[0], mode=mode)
                for _ in range(k):
                    steps.extend(subm)
                for j in range(1, L + 1):
                    if k == 0:
                        colmap[f"ts_{C + j}"] = None
                        colmap[f"ts_{C + j}_last"] = None
                        colmap[f"n_{C + j}"] = None
                    else:
                        colmap[f"ts_{C + j}"] = f"ts_{P + j}"
                        colmap[f"ts_{C + j}_last"] = (
                            f"ts_{P + (k - 1) * L + j}"
                        )
                        colmap[f"n_{C + j}"] = ("lit", k)
                C += L
                P += k * L
        if not any(not s.negate for s in steps):
            continue  # all-absent variant: not a match
        o = match_pattern(
            events, steps,
            key_col=key_col, time_col=time_col, type_col=type_col,
            within=within, contiguity=contiguity, tiebreak=tiebreak,
        )
        outs.append((o, colmap))

    # collapsed column types: first variant that binds each col wins;
    # group n columns are literal iteration counts (long — the engine's
    # own n_k convention)
    coltypes: dict[str, str] = {}
    for c in full_cols:
        for o, cm in outs:
            src = cm.get(c)
            if isinstance(src, tuple):
                coltypes[c] = "long"
                break
            if src is not None and src in o.columns:
                coltypes[c] = dict(o.dtypes)[src]
                break
        else:
            coltypes[c] = "long" if c.startswith("n_") else "timestamp"

    unioned = None
    for o, cm in outs:
        sel = [F.col(key_col)]
        for c in full_cols:
            src = cm.get(c)
            if isinstance(src, tuple):
                sel.append(F.lit(src[1]).cast("long").alias(c))
            elif src is not None and src in o.columns:
                sel.append(F.col(src).alias(c))
            else:
                sel.append(F.lit(None).cast(coltypes[c]).alias(c))
        part = o.select(*sel)
        unioned = part if unioned is None else unioned.unionByName(part)
    return unioned


def match_pattern(
    events: DataFrame,
    pattern,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    contiguity: str | None = None,
    tiebreak: list[str] | None = None,
    skip_strategy: str | None = None,
    carry_payload: dict[str, list[str]] | None = None,
    _island_disjoint: bool | None = None,
) -> DataFrame:
    """Match an event-type pattern per key; one output row per match.

    ``pattern`` is a :class:`Pattern`, or a list whose entries are type
    strings, :class:`PatternStep`, or dicts
    (``{"type": ..., "times": n, "one_or_more": True, "until": ...,
    "negate": True}``). A :class:`Pattern` carries its own contiguity
    and ``within`` (explicit arguments win when passed).

    Output schema: ``key_col`` then, per positive step ``i`` (1-based),
    ``ts_i`` = event time of the step's FIRST event; quantified steps
    add ``ts_i_last`` (last event) and, for loops, ``n_i`` (count).
    Negated steps emit no column.

    ``within`` bounds the LAST matched event at
    ``<= ts_1 + within`` — Flink's ``Pattern.within``. For relaxed
    contiguity it is also the state-eviction horizon at scale (pruned
    per step, not only at the end).

    ``tiebreak`` columns break equal-timestamp ordering for strict
    contiguity (pass the event id for a total, reproducible order —
    same doctrine as ``operators/sampling``'s determinism contract).
    Relaxed contiguity is pure event-time (ties documented in the
    module docstring).

    ``skip_strategy`` (r7) selects among overlapping matches — Flink's
    ``AfterMatchSkipStrategy`` (see :data:`SKIP_STRATEGIES`). The
    default ``"greedy"`` keeps this engine's deterministic maximal-run
    semantics; any OTHER strategy switches loop steps to Flink's
    actual non-greedy default (every prefix is a match) before the
    strategy's pruning applies, so ``"no_skip"`` IS Flink's default
    behaviour. ``skip_to_next`` prunes declaratively (one window
    pass); ``skip_past_last_event`` is inherently sequential per key
    (Flink runs it in the NFA) and selects over the already-horizon-
    bounded MATCH set, never the raw events. Loop steps under a
    non-greedy strategy require uniform strict/relaxed contiguity
    (mixed loops stay greedy-only).

    ``carry_payload`` (r9): best-effort zero-join payload capture —
    ``{ts_col: [payload cols]}`` asks the engine to ALSO emit
    ``<ts_col>_<col>`` columns (the :func:`attach_event_payload`
    naming) for the matched events' payloads. Honored by the strict
    lead-chain and island fast paths (where the payload rides the same
    window pass for free), (r10) the ENTIRE relaxed family — plain
    binds, iterative binds, ``followedByAny`` fan-out, greedy and
    non-greedy loops — where it rides the existing struct-min/max
    aggregates, and (r10) VARIANT patterns, whose union renumbers each
    request into every variant's geometry and realigns the carried
    columns (all-or-nothing per group). The one remaining non-carrier
    is the general strict-segments path (non-island loop shapes) —
    check the output columns and fall back to
    :func:`attach_event_payload` for any group that did not
    materialize.
    """
    if isinstance(pattern, Pattern):
        # explicit argument wins; the builder's contiguity is the
        # default (review r6 finding #4 — step-level modes are more
        # specific still and always apply)
        if contiguity is None and pattern.contiguity is not None:
            contiguity = pattern.contiguity
        if within is None:
            within = pattern.within_
        if skip_strategy is None:
            skip_strategy = pattern.skip_
    base_steps = pattern.steps if isinstance(pattern, Pattern) else pattern
    if isinstance(base_steps, list) and any(
        isinstance(p, dict) and "group" in p
        and (p.get("one_or_more") or p.get("loop"))
        for p in base_steps
    ):
        return _match_group_loop(
            events, pattern,
            key_col=key_col, time_col=time_col, type_col=type_col,
            within=within, contiguity=contiguity, tiebreak=tiebreak,
            skip_strategy=skip_strategy, carry_payload=carry_payload,
        )
    grp = _expand_group_variants(pattern)
    if grp is not None:
        variants, posmaps, template = grp
        if len(variants) == 1 and posmaps[0] == list(
            range(1, len(posmaps[0]) + 1)
        ):
            pattern = variants[0]  # exact counts: pure flattening
        else:
            return _match_group_union(
                events, variants, posmaps, template,
                key_col=key_col, time_col=time_col, type_col=type_col,
                within=within, contiguity=contiguity, tiebreak=tiebreak,
                skip_strategy=skip_strategy, carry_payload=carry_payload,
            )
    skip = _parse_skip(skip_strategy)
    # any non-greedy strategy implies Flink's non-greedy loop default
    greedy_loops = skip is None or skip[0] == "greedy"
    if contiguity is not None and contiguity not in (
        "strict", "relaxed", "mixed"
    ):
        raise ValueError(
            f"contiguity must be strict|relaxed|mixed, got {contiguity!r}"
        )
    steps = _normalize(pattern)

    # resolve per-step modes with the rule SHARED with the streaming
    # dispatcher (_resolve_contiguity): a uniform result routes to the
    # specialized single-mode engines, a genuine mix to the positional
    # sequential engine (r6)
    resolved = _resolve_contiguity(steps, contiguity)
    if resolved == "mixed":
        if steps[0].negate:
            raise ValueError("a mixed pattern must start positively")
        if any(st.where is not None for st in steps):
            raise ValueError(
                "where() predicates are supported on uniform strict/"
                "relaxed patterns (the mixed positional engine is "
                "type-keyed)"
            )
        if any(st.any_match for st in steps):
            raise ValueError(
                "followedByAny requires uniform relaxed contiguity "
                "(mixed patterns are earliest-binding only)"
            )
        if not greedy_loops and any(s.loop for s in steps):
            raise ValueError(
                "loop steps under a non-greedy skip_strategy require "
                "uniform strict or relaxed contiguity (mixed loops are "
                "greedy-only)"
            )
        default_mode = (
            contiguity if contiguity not in (None, "mixed") else None
        )
        steps = [
            PatternStep(s.event_type, s.negate, s.times, s.loop, s.until,
                        s.times_max, s.optional,
                        s.mode or default_mode or "strict", s.where)
            for s in steps
        ]
        if any(s.optional or s.times_max is not None for s in steps):
            M = _match_variants(
                events, steps, key_col, time_col, type_col, within,
                "mixed", tiebreak, greedy_loops,
            )
        else:
            M = _match_mixed(
                events, steps, key_col, time_col, type_col, within,
                tiebreak or [],
            )
        return _apply_skip(M, steps, key_col, skip)
    contiguity = resolved
    if any(s.any_match for s in steps) and contiguity != "relaxed":
        raise ValueError(
            "followedByAny requires uniform relaxed contiguity (it IS "
            "a relaxed-family binding mode)"
        )
    if not greedy_loops and any(s.any_match and s.loop for s in steps):
        raise ValueError(
            "followedByAny one_or_more supports the greedy default "
            "only (a non-greedy any-loop emits every contiguous "
            "subrange — quadratic in the run; out of scope)"
        )

    iter_info = _resolve_iter(steps)
    if iter_info:
        if any(s.optional or s.times_max is not None for s in steps):
            raise ValueError(
                "iterative conditions do not compose with optional()/"
                "times(n, m) (variant expansion renumbers the s<k> "
                "step references)"
            )
        missing = {
            c for _, refs in iter_info.values() for (_k, c) in refs
        } - set(events.columns)
        if missing:
            raise ValueError(
                f"iterative condition references column(s) "
                f"{sorted(missing)} not present in the events frame"
            )
        # r8: relaxed loops compose — iterative predicates ON a loop
        # filter its elements at the element join, refs TO a loop bind
        # the run's FIRST element's payload. Strict loops stay
        # refused (the segments engine binds runs by position; a
        # cross-step ref's lag distance would vary per run element).
        if contiguity == "strict" and any(s.loop for s in steps):
            raise ValueError(
                "iterative conditions with strict loop steps are not "
                "supported (the segments engine binds runs by "
                "position)"
            )

    if any(s.optional or s.times_max is not None for s in steps):
        M = _match_variants(
            events, steps, key_col, time_col, type_col, within,
            contiguity, tiebreak, greedy_loops,
            carry_payload=carry_payload,
        )
    elif contiguity == "strict":
        if any(s.until for s in steps):
            raise ValueError(
                "until applies to relaxed loops only (a strict/consecutive "
                "run ends at the first non-matching event by construction)"
            )
        if any(s.loop for s in steps):
            M = _strict_segments(
                events, steps, key_col, time_col, type_col, within,
                tiebreak or [], greedy_loops,
                carry_payload=carry_payload,
                _island_disjoint=_island_disjoint,
            )
        else:
            M = _strict_leadchain(
                events, steps, key_col, time_col, type_col, within,
                tiebreak or [], iter_info,
                carry_payload=carry_payload,
            )
    else:
        M = _match_relaxed(
            events, steps, key_col, time_col, type_col, within,
            greedy_loops, iter_info, carry_payload=carry_payload,
        )
    return _apply_skip(M, steps, key_col, skip)


def match_pattern_timeouts(
    events: DataFrame,
    pattern,
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
    contiguity: str | None = None,
) -> DataFrame:
    """Timed-out PARTIAL matches (r8) — Flink's
    ``PatternStream.flatSelect(timeoutTag, PatternTimeoutFunction,
    ...)`` side output: for every anchor whose skip-till-next-match
    chain FAILS to complete inside the ``within`` window, emit the
    prefix bound so far (the abandoned-funnel query). One row per
    failed anchor: ``(key, ts_1 .. ts_k, timeout_step)`` — bound steps
    carry their event time, unbound steps are NULL, ``timeout_step``
    is the 1-based index of the first step that found no qualifying
    candidate inside the horizon.

    Scope: PLAIN positive relaxed chains (each step a single
    non-negated event type, optionally with a SimpleCondition
    ``where``). Quantifiers, negation, followedByAny, iterative
    conditions, and strict/mixed contiguity are out of scope — their
    partial-match semantics multiply (which prefix of a loop run
    counts?) and Flink itself only surfaces timeouts per NFA run.
    ``within`` is REQUIRED: without a window nothing ever times out
    (Flink's rule). Complete matches are NOT emitted here — run
    :func:`match_pattern` for those; the two outputs partition the
    anchor set (pinned by a pytest invariant).

    Shape: the same union + running-min binds as the relaxed matcher
    (one shuffle per step, no joins), with each step's failures
    split off declaratively — scale posture identical to
    ``match_pattern`` relaxed."""
    if isinstance(pattern, Pattern):
        if contiguity is None and pattern.contiguity is not None:
            contiguity = pattern.contiguity
        if within is None:
            within = pattern.within_
    steps = _normalize(pattern)
    if _resolve_contiguity(steps, contiguity) != "relaxed":
        raise ValueError(
            "timeout extraction is relaxed-only (a strict partial "
            "fails on adjacency, not on the window — pass "
            "contiguity='relaxed' or build with followed_by)"
        )
    if within is None:
        raise ValueError(
            "match_pattern_timeouts requires within= (without a "
            "window nothing ever times out — Flink's rule)"
        )
    bad = [
        s for s in steps
        if s.negate or s.loop or s.times != 1 or s.optional
        or s.times_max is not None or s.any_match
        or _iter_where(s) is not None
    ]
    if bad:
        raise ValueError(
            "timeout extraction supports plain positive steps with "
            "SimpleConditions only (quantifiers/negation/any/"
            "iterative partial semantics are out of scope)"
        )
    k = len(steps)
    if k < 2:
        raise ValueError("pattern needs at least two steps to time out")
    has_where = any(s.where is not None for s in steps)
    if has_where:
        base = _with_cand_cols(
            events, steps, [key_col, time_col, type_col], type_col
        )
    else:
        base = events.select(key_col, time_col, type_col)

    def cand(idx: int) -> DataFrame:
        flt = (
            F.col(f"__c{idx}") if has_where
            else F.col(type_col) == steps[idx].event_type
        )
        return base.filter(flt).select(
            key_col, F.col(time_col).alias("__step_t")
        )

    ts_type = dict(events.dtypes)[time_col]
    M = base.filter(
        F.col("__c0") if has_where
        else F.col(type_col) == steps[0].event_type
    ).select(key_col, F.col(time_col).alias("ts_1"))
    prev_col = "ts_1"
    horizon = F.col("ts_1") + _within_expr(within)
    parts: list[DataFrame] = []
    for i in range(2, k + 1):
        out_col = f"ts_{i}"
        M = _earliest_after(M, cand(i - 1), key_col, prev_col, out_col)
        failed = F.col(out_col).isNull() | (F.col(out_col) > horizon)
        T = M.filter(failed).select(
            F.col(key_col),
            *[F.col(f"ts_{j}") for j in range(1, i)],
            *[
                F.lit(None).cast(ts_type).alias(f"ts_{j}")
                for j in range(i, k + 1)
            ],
            F.lit(i).alias("timeout_step"),
        )
        parts.append(T)
        M = M.filter(~failed)
        prev_col = out_col
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


def _apply_skip(
    M: DataFrame,
    steps: list[PatternStep],
    key_col: str,
    skip: tuple[str, int | None] | None,
) -> DataFrame:
    """Prune overlapping matches per the parsed skip strategy (r7).

    Works on the MATCH set (already horizon-bounded by ``within``),
    never the raw events. ``__start``/``__end`` derive from the
    captured timestamps (NULL-skipping, so optional absent steps don't
    participate): Spark ``greatest``/``coalesce`` both ignore NULLs.

    - ``skip_to_next``: one window pass — per (key, start) keep the
      first-completing match (earliest end; remaining captured columns
      break ties deterministically).
    - ``skip_past_last_event`` / ``skip_to_first:i`` /
      ``skip_to_last:i``: emitted-set selection scanning matches in
      COMPLETION order — ``(end, start)``, the order Flink's NFA
      emits them (a match materializes when its last event arrives;
      r8, ADVICE r7: the r7 kernel scanned in start order, which
      inverted Flink's choice whenever a later-starting match
      completed earlier) — inherently a per-key sequential chain,
      expressed as ``applyInPandas`` over each key's matches with a
      per-strategy prune threshold: past-last-event keeps a match
      only if it starts STRICTLY after the previous emission's last
      event (event-time granularity: a match starting AT that
      timestamp is pruned too — positions are not visible at this
      level, documented deviation); to-first/to-last keep matches
      starting AT or after the previous emission's first/last event
      of step ``i`` (Flink prunes only those that started strictly
      before it). Matches completing at the SAME event time are
      simultaneous: Flink reports every match that completes at an
      event before pruning partials, so all of them are judged
      against the bound from BEFORE the group and the bound advances
      only once the group flushes (r8; at-timestamp granularity — two
      distinct events sharing a timestamp read as simultaneous here).
      Scale posture: input is matches, not events; per-key match
      counts are bounded by the ``within`` horizon.
    """
    if skip is None or skip[0] in ("greedy", "no_skip"):
        return M
    kind, step_i = skip
    out_cols = _out_cols(steps)
    ts_cols = [c for c in out_cols if not c.startswith("n_")]
    end = (
        F.greatest(*[F.col(c) for c in ts_cols])
        if len(ts_cols) > 1 else F.col(ts_cols[0])
    )
    start = (
        F.coalesce(*[F.col(c) for c in ts_cols])
        if len(ts_cols) > 1 else F.col(ts_cols[0])
    )
    if kind == "skip_to_next":
        order = [F.col("__end").asc()] + [
            F.col(c).asc_nulls_first() for c in out_cols
        ]
        w = Window.partitionBy(key_col, "__start").orderBy(*order)
        return (
            M.withColumn("__start", start)
            .withColumn("__end", end)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__start", "__end", "__rn")
        )
    # sequential kernel: threshold column + strictness per strategy
    if kind == "skip_past_last_event":
        thr, strict_after = F.col("__end"), True
    else:
        n_pos = sum(1 for s in steps if not s.negate)
        if step_i is None or not (1 <= step_i <= n_pos):
            raise ValueError(
                f"{kind} step index must be in 1..{n_pos} "
                f"(1-based positive-step index), got {step_i}"
            )
        base, last = f"ts_{step_i}", f"ts_{step_i}_last"
        col = (
            last if (kind == "skip_to_last" and last in out_cols)
            else base
        )
        thr, strict_after = F.col(col), False
    M2 = (
        M.withColumn("__start", start)
        .withColumn("__end", end)
        .withColumn("__thr", thr)
    )
    schema = M.schema
    keep_cols = M.columns
    sort_cols = ["__end", "__start"] + out_cols

    def _select(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            sort_cols, kind="mergesort", na_position="first"
        )
        keep, bound = [], None
        group_end, group_bound = None, None
        for idx, s, e, t in zip(
            pdf.index, pdf["__start"], pdf["__end"], pdf["__thr"]
        ):
            if group_end is None or e != group_end:
                # new completion group: flush the deferred threshold
                bound = group_bound if group_bound is not None else bound
                group_end, group_bound = e, None
            ok = bound is None or (
                pd.notna(s) and (s > bound if strict_after else s >= bound)
            )
            if ok:
                keep.append(idx)
                if pd.notna(t) and (
                    group_bound is None or t > group_bound
                ):
                    if bound is None or t > bound:
                        group_bound = t
        return pdf.loc[keep, keep_cols]

    return M2.groupBy(key_col).applyInPandas(_select, schema=schema)


def _within_expr(within: str) -> Column:
    return F.expr(f"INTERVAL {within}")


def _match_variants(
    events: DataFrame,
    steps: list[PatternStep],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    contiguity: str,
    tiebreak: list[str] | None,
    greedy_loops: bool = True,
    carry_payload: dict[str, list[str]] | None = None,
) -> DataFrame:
    """``optional()`` / ``times(n, m)`` patterns: union of the plain
    variant matches (Flink emits every branch/count alternative), with
    output columns realigned to the ORIGINAL step indices — an absent
    optional step's ``ts_i`` is NULL; a count-1 variant of a range
    quantifier repeats ``ts_i`` as ``ts_i_last``. Each variant is the
    usual one declarative plan; the union is a plain ``UNION ALL``
    (no dedup shuffle — variants are distinct match shapes).

    ``carry_payload`` (r10): each request is RENUMBERED into every
    variant's step geometry and handed to the variant's engine; the
    union realigns the carried ``<ts_col>_<col>`` columns exactly like
    the ts columns (absent variant → typed NULL; a single-event
    variant serves a ``_last`` request from its only event). Emitted
    only when EVERY variant's engine materialized its carry — a single
    non-carrying engine (e.g. the general segments path) drops the
    whole group so the caller's attach-join fallback stays uniform."""
    from functools import reduce

    dtypes = dict(events.dtypes)
    ts_type = dtypes[time_col]
    max_cols = _out_cols(steps)
    positives = [s for s in steps if not s.negate]
    pay: dict[str, list[str]] = {}
    for tsc, cols in (carry_payload or {}).items():
        m = re.fullmatch(r"ts_(\d+)(_last)?", tsc)
        if not m or tsc not in max_cols:
            continue
        cols = sorted({
            c for c in cols
            if c in dtypes and c not in (key_col, time_col, type_col)
        })
        if cols:
            pay[tsc] = cols

    def build(with_pay: bool) -> "list[DataFrame] | None":
        parts: list[DataFrame] = []
        for vsteps, orig_idx in _expand_variants(steps):
            vpos = {oi: j + 1 for j, oi in enumerate(orig_idx)}
            vpositives = [s for s in vsteps if not s.negate]

            def src_ts(tsc: str) -> "str | None":
                """The variant-local ts column serving an ORIGINAL
                request, or None when the variable is absent here."""
                m = re.fullmatch(r"ts_(\d+)(_last)?", tsc)
                i, last = int(m.group(1)), bool(m.group(2))
                if i not in vpos:
                    return None
                j = vpos[i]
                vs = vpositives[j - 1]
                if last and (vs.loop or vs.times > 1):
                    return f"ts_{j}_last"
                return f"ts_{j}"

            vcarry: dict[str, list[str]] = {}
            if with_pay:
                for tsc, cols in pay.items():
                    st = src_ts(tsc)
                    if st is None:
                        continue
                    merged = vcarry.setdefault(st, [])
                    for c in cols:
                        if c not in merged:
                            merged.append(c)
            # per-variant engines inherit the loop greediness only; the
            # skip-strategy pruning applies over the WHOLE union at the
            # top level (variants are alternative shapes of one pattern)
            r = match_pattern(
                events, vsteps, key_col, time_col, type_col, within,
                contiguity, tiebreak,
                skip_strategy=None if greedy_loops else "no_skip",
                carry_payload=vcarry or None,
            )
            sel: list[Column] = [F.col(key_col)]
            for i, s in enumerate(positives, start=1):
                has_last = f"ts_{i}_last" in max_cols
                if i not in vpos:
                    sel.append(F.lit(None).cast(ts_type).alias(f"ts_{i}"))
                    if has_last:
                        sel.append(
                            F.lit(None).cast(ts_type).alias(f"ts_{i}_last")
                        )
                    if s.loop:  # zeroOrMore absent branch: no run at all
                        sel.append(F.lit(None).cast("long").alias(f"n_{i}"))
                    continue
                j = vpos[i]
                vs = vpositives[j - 1]
                sel.append(F.col(f"ts_{j}").alias(f"ts_{i}"))
                if has_last:
                    src = (
                        f"ts_{j}_last" if (vs.loop or vs.times > 1)
                        else f"ts_{j}"
                    )
                    sel.append(F.col(src).alias(f"ts_{i}_last"))
                if s.loop:
                    sel.append(F.col(f"n_{j}").alias(f"n_{i}"))
            if with_pay:
                for tsc, cols in pay.items():
                    st = src_ts(tsc)
                    for c in cols:
                        if st is None:
                            sel.append(
                                F.lit(None).cast(dtypes[c])
                                .alias(f"{tsc}_{c}")
                            )
                        elif f"{st}_{c}" in r.columns:
                            sel.append(
                                F.col(f"{st}_{c}").alias(f"{tsc}_{c}")
                            )
                        else:
                            return None  # this engine didn't carry
            parts.append(r.select(*sel))
        return parts

    parts = build(bool(pay)) if pay else build(False)
    if parts is None:
        parts = build(False)  # all-or-nothing: caller attaches
    return reduce(lambda a, b: a.unionByName(b), parts)


# ---------------------------------------------------------------------------
# strict contiguity


def _cand_cond(s: PatternStep, type_col: str) -> Column:
    """A step's candidate condition (r7): type equality AND the
    optional ``where`` value predicate (Flink ``where()``). An
    ITERATIVE condition (r8 — cross-step refs, :func:`_iter_where`)
    cannot be evaluated per-event; the candidate boolean degrades to
    type equality and the engines evaluate the full predicate at
    binding time (lead/lag substitution in the strict chain, join
    conjunct in the relaxed binds)."""
    c = F.col(type_col) == s.event_type
    if s.where is not None and _iter_where(s) is None:
        w = F.expr(s.where) if isinstance(s.where, str) else s.where
        c = c & w
    return c


#: cross-step reference inside a ``where()`` SQL string (r8 — Flink
#: ``IterativeCondition``): ``s<k>.<col>`` addresses the k-th POSITIVE
#: step's FIRST bound event (1-based, the ``ts_<k>`` numbering);
#: ``first.<col>`` is sugar for ``s1``, ``prev.<col>`` for the
#: immediately preceding positive step. Bare column names keep meaning
#: the candidate event itself (the SimpleCondition surface).
_ITER_REF_RE = re.compile(
    r"\b(?:s(\d+)|(first)|(prev))\.([A-Za-z_][A-Za-z0-9_]*)"
)


def _iter_where(s: PatternStep) -> str | None:
    """The step's ``where`` string IF it is an iterative condition
    (contains cross-step refs), else None. Column-typed conditions
    cannot carry refs (``F.col("s1.value")`` would parse as struct
    access) — iterative conditions must be SQL strings."""
    if isinstance(s.where, str) and _ITER_REF_RE.search(s.where):
        return s.where
    return None


def _resolve_iter(
    steps: list[PatternStep],
) -> dict[int, tuple[str, list[tuple[int, str]]]]:
    """Resolve iterative conditions (r8): returns
    ``{step_idx: (template, refs)}`` where ``template`` is the where
    string with every cross-step ref rewritten to the carried-payload
    column name ``__v{k}_{col}`` and ``refs`` is the sorted
    ``(positive_step_k, col)`` set. Validates that refs point STRICTLY
    earlier: a positive step with positive index p may reference
    1..p-1; a negated step declared after positive index p may
    reference 1..p (``prev`` resolves to the upper bound)."""
    out: dict[int, tuple[str, list[tuple[int, str]]]] = {}
    pidx = 0
    for idx, s in enumerate(steps):
        if s.negate:
            max_ref = pidx
        else:
            pidx += 1
            max_ref = pidx - 1
        iw = _iter_where(s)
        if iw is None:
            continue
        refs: set[tuple[int, str]] = set()

        def sub(m: "re.Match[str]") -> str:
            if m.group(1) is not None:
                k = int(m.group(1))
            elif m.group(2) is not None:
                k = 1
            else:  # prev
                k = max_ref
            if not (1 <= k <= max_ref):
                raise ValueError(
                    f"iterative condition {iw!r} references step "
                    f"s{k}, but only s1..s{max_ref} are bound at "
                    f"this point (refs must point to EARLIER "
                    f"positive steps)"
                )
            col = m.group(4)
            refs.add((k, col))
            return f"__v{k}_{col}"

        out[idx] = (_ITER_REF_RE.sub(sub, iw), sorted(refs))
    return out


#: one numeric comparison over a bare column — the static-disjointness
#: prover's numeric atom (r9)
_CMP_ATOM_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(>=|<=|==|=|>|<)\s*"
    r"(-?\d+(?:\.\d+)?)\s*$"
)
#: string-equality atom ``col = '<masked literal>'`` (r10) — the
#: literal has been masked to ``\x00<i>\x00`` before matching
_STR_ATOM_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(?:==|=)\s*\x00(\d+)\x00\s*$"
)
#: ``col IN ( ... )`` atom (r10); the item list is parsed separately
_IN_ATOM_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s+IN\s*\(([^()]*)\)\s*$",
    re.IGNORECASE,
)
_NUM_LIT_RE = re.compile(r"^-?\d+(?:\.\d+)?$")
#: ``col BETWEEN a AND b`` (numeric) — rewritten to two comparisons
#: BEFORE the AND-split so the embedded AND doesn't shred the atom
_BETWEEN_RE = re.compile(
    r"\b([A-Za-z_][A-Za-z0-9_]*)\s+BETWEEN\s+(-?\d+(?:\.\d+)?)"
    r"\s+AND\s+(-?\d+(?:\.\d+)?)\b",
    re.IGNORECASE,
)

#: sentinel: the predicate's provable conjuncts are jointly
#: UNSATISFIABLE — the predicate can never hold, so it is disjoint
#: from anything
_UNSAT = object()
#: per-column sentinel: the column carries incomparable constraint
#: kinds (e.g. a numeric range AND a string set) — unusable for
#: proving, conservatively skipped
_MIXED = ("mixed",)


def _iv_and(a: tuple, b: tuple) -> tuple:
    """Intersect two ``("ival", lo, hi, lo_open, hi_open)``."""
    lo, lo_open = max(
        (a[1], a[3]), (b[1], b[3]),
        key=lambda t: (t[0], t[1]),
    )
    hi, hi_open = min(
        (a[2], a[4]), (b[2], b[4]),
        key=lambda t: (t[0], not t[1]),
    )
    return ("ival", lo, hi, lo_open, hi_open)


def _iv_empty(iv: tuple) -> bool:
    _t, lo, hi, lo_open, hi_open = iv
    return lo > hi or (lo == hi and (lo_open or hi_open))


def _iv_contains(iv: tuple, v: float) -> bool:
    _t, lo, hi, lo_open, hi_open = iv
    if v < lo or (v == lo and lo_open):
        return False
    if v > hi or (v == hi and hi_open):
        return False
    return True


def _merge_constraint(cur, new):
    """AND two same-column constraints; ``None`` result means the
    column became unsatisfiable."""
    if cur is None:
        return new
    if cur is _MIXED or new is _MIXED:
        return _MIXED
    if cur[0] != new[0]:
        if {cur[0], new[0]} == {"ival", "nset"}:
            nset = cur if cur[0] == "nset" else new
            iv = cur if cur[0] == "ival" else new
            kept = frozenset(v for v in nset[1] if _iv_contains(iv, v))
            return ("nset", kept) if kept else None
        return _MIXED  # string set vs numeric — incomparable, skip
    if cur[0] == "ival":
        iv = _iv_and(cur, new)
        return None if _iv_empty(iv) else iv
    kept = cur[1] & new[1]
    return (cur[0], kept) if kept else None


def _parse_atom(part: str, lits: list[str]):
    """One conjunct → ``(col, constraint)`` or None (not provable —
    skipped under conjunction weakening)."""
    m = _CMP_ATOM_RE.match(part)
    if m:
        c, op, v = m.group(1), m.group(2), float(m.group(3))
        lo, hi = float("-inf"), float("inf")
        lo_open = hi_open = False
        if op in ("=", "=="):
            lo = hi = v
        elif op == ">=":
            lo = v
        elif op == ">":
            lo, lo_open = v, True
        elif op == "<=":
            hi = v
        elif op == "<":
            hi, hi_open = v, True
        return (c, ("ival", lo, hi, lo_open, hi_open))
    m = _STR_ATOM_RE.match(part)
    if m:
        lit = lits[int(m.group(2))]
        return (m.group(1), ("sset", frozenset({lit[1:-1].replace("''", "'")})))
    m = _IN_ATOM_RE.match(part)
    if m:
        items = [s.strip() for s in m.group(2).split(",")]
        if not items or any(not s for s in items):
            return None
        if all(_NUM_LIT_RE.match(s) for s in items):
            return (m.group(1), ("nset", frozenset(float(s) for s in items)))
        vals = []
        for s in items:
            sm = re.match(r"^\x00(\d+)\x00$", s)
            if not sm:
                return None
            vals.append(lits[int(sm.group(1))][1:-1].replace("''", "'"))
        return (m.group(1), ("sset", frozenset(vals)))
    return None


def _pred_constraints(where):
    """Parse a SQL predicate string into per-column constraints it
    IMPLIES (r10 — generalizes r9's single-column numeric interval).

    The predicate must be a top-level AND-conjunction (any OR/NOT/CASE
    outside string literals bails to None — splitting on AND would be
    unsound there). Each conjunct parses as a numeric comparison, a
    string equality, ``IN (...)`` over all-numeric or all-string
    literals, or numeric ``BETWEEN``; conjuncts that don't parse are
    SKIPPED — sound, because ``A AND B`` implies ``A``, so constraints
    from any subset of conjuncts still hold whenever the full
    predicate does. Returns ``{col: constraint}``, ``_UNSAT`` when the
    provable conjuncts alone are contradictory, or None when nothing
    is provable."""
    if not isinstance(where, str):
        return None
    lits: list[str] = []

    def _mask(m: "re.Match[str]") -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    masked = re.sub(r"'(?:[^']|'')*'", _mask, where)
    if "'" in masked:  # unbalanced quote — bail
        return None
    if re.search(r"\bor\b|\bnot\b|\bcase\b", masked, re.IGNORECASE):
        return None
    masked = _BETWEEN_RE.sub(r"\1 >= \2 AND \1 <= \3", masked)
    cons: dict[str, object] = {}
    for part in re.split(r"\bAND\b", masked, flags=re.IGNORECASE):
        part = part.strip()
        # strip balanced outer parens (a parenthesized conjunct); a
        # paren fragment left by splitting THROUGH a group stays
        # unbalanced, fails the atom parse, and is skipped — sound
        while part.startswith("(") and part.endswith(")"):
            depth, ok = 0, True
            for ch in part[1:-1]:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth < 0:
                        ok = False
                        break
            if ok and depth == 0:
                part = part[1:-1].strip()
            else:
                break
        atom = _parse_atom(part, lits)
        if atom is None:
            continue
        col, c = atom
        merged = _merge_constraint(cons.get(col), c)
        if merged is None:
            return _UNSAT
        cons[col] = merged
    cons = {c: k for c, k in cons.items() if k is not _MIXED}
    return cons or None


def _constraints_disjoint(a, b) -> bool:
    if a[0] != b[0]:
        if {a[0], b[0]} == {"ival", "nset"}:
            nset = a if a[0] == "nset" else b
            iv = a if a[0] == "ival" else b
            return not any(_iv_contains(iv, v) for v in nset[1])
        return False  # string vs numeric — not provable
    if a[0] == "ival":
        return _iv_empty(_iv_and(a, b))
    return not (a[1] & b[1])


def _provably_disjoint(where_a, where_b) -> bool:
    """True iff the two predicates can PROVABLY never hold for the
    same row, with no data probe: some column constrained by both has
    an empty intersection (numeric ranges, numeric/string value sets —
    r10 widened from r9's single-column numeric ranges), or either
    predicate is self-contradictory. A False verdict is always safe —
    callers fall back to the data probe (batch) or refuse (stream)."""
    a = _pred_constraints(where_a)
    b = _pred_constraints(where_b)
    if a is _UNSAT or b is _UNSAT:
        return True
    if not a or not b or a is None or b is None:
        return False
    return any(
        _constraints_disjoint(a[c], b[c]) for c in set(a) & set(b)
    )


def _with_cand_cols(
    events: DataFrame,
    steps: list[PatternStep],
    base_cols: list[str],
    type_col: str,
) -> DataFrame:
    """Project per-step candidate booleans ``__c{i}`` BEFORE dropping
    payload columns (the predicates reference them); the engines then
    match on the booleans instead of type equality."""
    proj = events
    for idx, st in enumerate(steps):
        proj = proj.withColumn(
            f"__c{idx}", _cand_cond(st, type_col)
        )
    return proj.select(
        *base_cols, *[f"__c{i}" for i in range(len(steps))]
    )


def _strict_leadchain(
    events: DataFrame,
    steps: list[PatternStep],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    tiebreak: list[str],
    iter_info: dict[int, tuple[str, list[tuple[int, str]]]] | None = None,
    carry_payload: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Loop-free strict pattern: ONE window pass, fixed lead offsets.
    Negated steps assert at the current offset without consuming it.
    Steps with ``where`` predicates (r7) match on precomputed
    candidate booleans instead of type equality — same single window
    pass, one extra boolean column per step.

    ITERATIVE conditions (r8, Flink ``IterativeCondition``): because
    strict contiguity binds FIXED offsets, a cross-step ref
    ``s<k>.col`` evaluated at a candidate row is just
    ``lag(col, d)`` with ``d`` = (candidate offset − step k's first
    offset) — a per-event boolean ``__ic{idx}_{r}`` (one per
    repetition, distances shift with ``r``) that the chain then tests
    with the usual ``lead``. Still ZERO joins, one window pass; the
    payload never leaves the scan projection.

    ``carry_payload`` (r9): matched-event payload capture riding the
    SAME fixed lead offsets — ``{ts_col: [cols]}`` adds
    ``<ts_col>_<col>`` output columns at zero extra shuffles (one more
    ``lead()`` per carried column over the already-partitioned
    window)."""
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    iter_info = iter_info or {}
    carry: dict[str, list[str]] = {}
    for tsc, cols in (carry_payload or {}).items():
        cols = sorted({c for c in cols if c in events.columns})
        if cols:
            carry[tsc] = cols
    carry_src = sorted({c for cols in carry.values() for c in cols})
    has_where = any(
        st.where is not None and idx not in iter_info
        for idx, st in enumerate(steps)
    )

    # offset pre-pass: positive step p's first-event offset, and each
    # step's per-repetition offsets (negations assert without consuming)
    first_off: dict[int, int] = {}
    own_offs: dict[int, list[int]] = {}
    off0, p0 = 0, 0
    for idx, s in enumerate(steps):
        if s.negate:
            own_offs[idx] = [off0]
            continue
        p0 += 1
        first_off[p0] = off0
        own_offs[idx] = [off0 + r for r in range(s.times)]
        off0 += s.times

    base_cols = [key_col, time_col, type_col, *tiebreak]
    base_cols += [c for c in carry_src if c not in base_cols]
    if has_where or iter_info:
        df = events
        lag_cols: dict[tuple[int, str], str] = {}
        ic_cols: list[tuple[str, str, str]] = []
        for idx, (template, refs) in iter_info.items():
            s = steps[idx]
            for r, o in enumerate(own_offs[idx]):
                expr_s = template
                for (k, c) in refs:
                    d = o - first_off[k]
                    nm = f"__lg{d}_{c}"
                    lag_cols[(d, c)] = nm
                    expr_s = expr_s.replace(f"__v{k}_{c}", nm)
                ic_cols.append((f"__ic{idx}_{r}", s.event_type, expr_s))
        for (d, c), nm in lag_cols.items():
            df = df.withColumn(nm, F.lag(c, d).over(w))
        for nm, etype, expr_s in ic_cols:
            df = df.withColumn(
                nm,
                F.coalesce(
                    (F.col(type_col) == etype) & F.expr(expr_s),
                    F.lit(False),
                ),
            )
        keep = list(base_cols)
        if has_where:
            for i2, st in enumerate(steps):
                if i2 in iter_info or st.where is None:
                    continue
                df = df.withColumn(f"__c{i2}", _cand_cond(st, type_col))
                keep.append(f"__c{i2}")
        keep += [nm for nm, _, _ in ic_cols]
        df = df.select(*keep)
    else:
        df = events.select(*base_cols)

    def lead_match(idx: int, s: PatternStep, off: int, r: int = 0
                   ) -> Column:
        if idx in iter_info:
            return F.lead(f"__ic{idx}_{r}", off).over(w)
        if has_where and s.where is not None:
            return F.lead(f"__c{idx}", off).over(w)
        return F.lead(type_col, off).over(w) == s.event_type

    sel: list[Column] = [F.col(key_col)]
    cond = F.lit(True)
    off = 0
    last_expr: Column | None = None
    i = 0
    for idx, s in enumerate(steps):
        if s.negate:
            lm = lead_match(idx, s, off)
            cond = cond & (lm.isNull() | ~lm)
            continue
        i += 1
        for r in range(s.times):
            lts = F.lead(time_col, off).over(w)
            cond = cond & lead_match(idx, s, off, r)
            if r == 0:
                sel.append(lts.alias(f"ts_{i}"))
                for c in carry.get(f"ts_{i}", []):
                    sel.append(
                        F.lead(c, off).over(w).alias(f"ts_{i}_{c}")
                    )
            if s.times > 1 and r == s.times - 1:
                sel.append(lts.alias(f"ts_{i}_last"))
                for c in carry.get(f"ts_{i}_last", []):
                    sel.append(
                        F.lead(c, off).over(w).alias(f"ts_{i}_last_{c}")
                    )
            last_expr = lts
            off += 1
    out = (
        df.select(*sel, cond.alias("__m"), last_expr.alias("__last"))
        .filter(F.col("__m"))
        .drop("__m")
    )
    if within is not None:
        out = out.filter(
            F.col("__last") <= F.col("ts_1") + _within_expr(within)
        )
    return out.drop("__last")


def _split_segments(
    steps: list[PatternStep],
) -> list:
    """Alternate ('seg', [(idx, step)...]) and ('loop', (idx, step)) —
    indices are GLOBAL step positions (the r7 ``where`` predicate
    columns are indexed by them)."""
    groups: list = []
    cur: list = []
    for idx, s in enumerate(steps):
        if s.loop:
            groups.append(("seg", cur))
            groups.append(("loop", (idx, s)))
            cur = []
        else:
            cur.append((idx, s))
    groups.append(("seg", cur))
    return groups


def _strict_island_fast(
    events: DataFrame,
    steps: list[PatternStep],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    tiebreak: list[str],
    carry_payload: dict[str, list[str]] | None = None,
    _island_disjoint: bool | None = None,
) -> DataFrame | None:
    """Strict single-loop FAST PATH (late-r8): a greedy pattern shaped
    ``[plain steps][ONE consecutive loop][plain steps]`` compiles to
    ONE window chain with ZERO joins — islands of the loop's candidate
    boolean are the runs, the prefix binds via ``lag()`` at the
    island's first row, the suffix via ``lead()`` values pulled from
    the island's last row (a struct-max over the island frame), run
    stats from the island frame itself.

    Island anchoring is exact ONLY when no row satisfies both the
    loop's condition and an adjacent step's (otherwise the general
    engine can anchor INSIDE an island — e.g. a row that is both STRT
    and DOWN binds a run suffix, which islands cannot see). That
    disjointness is checked against the DATA with one
    pushdown-filtered ``take(1)`` probe per adjacent step (the
    MATCH_RECOGNIZE fast-path doctrine; for pure type-keyed steps the
    conjunction folds to false and the probes are free). Any witness
    row, or any out-of-shape step (negation, times>1, second loop,
    non-greedy mode), returns None and the segments engine takes over.
    Measured on the MATCH_RECOGNIZE V-shape headline: the engine's
    run-metadata + (key, pos) join pass drops to leadchain-like cost.

    ``carry_payload`` (r9): ``{ts_col: [payload cols]}`` — matched
    events' payload columns carried THROUGH the window chain and
    emitted as ``<ts_col>_<col>`` (the ``attach_event_payload``
    naming), so payload measures cost ZERO joins on this path: prefix
    steps ride the same ``lag()``, the anchor row's payload is the row
    itself, the loop's last row and the suffix ``lead()`` values ride
    the existing island struct-max pulls."""
    loops = [i for i, s in enumerate(steps) if s.loop]
    if len(loops) != 1:
        return None
    L = loops[0]
    if L == 0:
        # a FIRST-step loop anchors one match per element (each B in
        # B+ C starts its own suffix run) — island anchoring sees only
        # run starts; the segments engine handles it
        return None
    for s in steps:
        if s.negate or s.optional or s.times_max is not None or s.any_match:
            return None
        if not s.loop and s.times != 1:
            return None
    # neighbor-disjointness verdict: a caller who already probed (the
    # MATCH_RECOGNIZE single-job probe) hands it down; otherwise ONE
    # aggregate job tests both neighbors together (r9 — was one
    # take(1) job per neighbor)
    if _island_disjoint is False:
        return None
    if _island_disjoint is not True:
        # static prover first (distinct event types, or provably
        # empty numeric-range intersection → no job at all), then ONE
        # aggregate job for whatever pairs remain unproven
        nbs = [
            nb for nb in (L - 1, L + 1)
            if 0 <= nb < len(steps) and not (
                steps[nb].event_type != steps[L].event_type
                or _provably_disjoint(steps[L].where, steps[nb].where)
            )
        ]
        if nbs:
            cl = _cand_cond(steps[L], type_col)
            try:
                row = events.agg(*[
                    F.max(
                        F.when(cl & _cand_cond(steps[nb], type_col), 1)
                    ).alias(f"__w{k}")
                    for k, nb in enumerate(nbs)
                ]).first()
            except Exception:
                return None
            if any(row[f"__w{k}"] is not None for k in range(len(nbs))):
                return None
    m = len(steps)
    pre, sfx = L, m - L - 1
    # normalize the carry request: only this pattern's ts columns, only
    # payload columns actually present (missing groups fall back to the
    # caller's attach join)
    carry: dict[str, list[str]] = {}
    for tsc, cols in (carry_payload or {}).items():
        cols = sorted({c for c in cols if c in events.columns})
        if cols:
            carry[tsc] = cols
    carry_src = sorted({c for cols in carry.values() for c in cols})
    base_keep = [key_col, time_col, type_col, *tiebreak]
    base_keep += [c for c in carry_src if c not in base_keep]
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    base = _with_cand_cols(events, steps, base_keep, type_col)
    ci = F.col(f"__c{L}")
    lagc = F.lag(f"__c{L}").over(w)
    base = base.withColumn(
        "__chg", F.when(lagc.isNull() | (lagc != ci), 1).otherwise(0)
    ).withColumn(
        "__grp",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("__rn", F.row_number().over(w))
    for j in range(1, pre + 1):
        base = base.withColumn(
            f"__pok{j}", F.lag(f"__c{L - j}", j).over(w)
        ).withColumn(f"__pts{j}", F.lag(time_col, j).over(w))
        for c in carry.get(f"ts_{L + 1 - j}", []):
            base = base.withColumn(
                f"__ppay{j}_{c}", F.lag(c, j).over(w)
            )
    for j in range(1, sfx + 1):
        base = base.withColumn(
            f"__sok{j}", F.lead(f"__c{L + j}", j).over(w)
        ).withColumn(f"__sts{j}", F.lead(time_col, j).over(w))
        for c in carry.get(f"ts_{L + 1 + j}", []):
            base = base.withColumn(
                f"__spay{j}_{c}", F.lead(c, j).over(w)
            )
    w_isl = (
        Window.partitionBy(key_col, "__grp")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # every island-frame aggregate in ONE projection so Spark plans a
    # SINGLE Window operator (r9 — interleaved withColumn/getField
    # projects had blocked CollapseWindow and each max became its own
    # full pass over the partition): the island's last row is pulled
    # as struct-maxes (row_number is unique within the island, so
    # max-by-r == last row) — the loop's last timestamp, any loop-last
    # payload carries, and each suffix step's lead values ride the
    # same pass.
    last_fields = [
        F.col("__rn").alias("r"), F.col(time_col).alias("t"),
    ] + [
        F.col(c).alias(f"p_{c}")
        for c in carry.get(f"ts_{L + 1}_last", [])
    ]
    isl_exprs = [
        F.count(F.lit(1)).over(w_isl).alias("__n"),
        F.max(F.struct(*last_fields)).over(w_isl).alias("__lastp"),
    ]
    for j in range(1, sfx + 1):
        isl_exprs.append(
            F.max(
                F.struct(
                    F.col("__rn").alias("r"),
                    F.col(f"__sok{j}").alias("o"),
                    F.col(f"__sts{j}").alias("t"),
                    *[
                        F.col(f"__spay{j}_{c}").alias(f"p_{c}")
                        for c in carry.get(f"ts_{L + 1 + j}", [])
                    ],
                )
            ).over(w_isl).alias(f"__pull{j}")
        )
    base = base.select("*", *isl_exprs)
    ext = [F.col("__lastp").getField("t").alias("__lts")]
    for c in carry.get(f"ts_{L + 1}_last", []):
        ext.append(
            F.col("__lastp").getField(f"p_{c}").alias(f"__lpay_{c}")
        )
    for j in range(1, sfx + 1):
        pulled = F.col(f"__pull{j}")
        ext += [
            pulled.getField("o").alias(f"__soklast{j}"),
            pulled.getField("t").alias(f"__stslast{j}"),
        ]
        for c in carry.get(f"ts_{L + 1 + j}", []):
            ext.append(
                pulled.getField(f"p_{c}").alias(f"__spaylast{j}_{c}")
            )
    base = base.select("*", *ext)
    cond = ci & (F.col("__chg") == 1)
    for j in range(1, pre + 1):
        cond = cond & F.coalesce(F.col(f"__pok{j}"), F.lit(False))
    for j in range(1, sfx + 1):
        cond = cond & F.coalesce(F.col(f"__soklast{j}"), F.lit(False))
    sel = [F.col(key_col)]
    for i in range(L):
        sel.append(F.col(f"__pts{L - i}").alias(f"ts_{i + 1}"))
        for c in carry.get(f"ts_{i + 1}", []):
            sel.append(
                F.col(f"__ppay{L - i}_{c}").alias(f"ts_{i + 1}_{c}")
            )
    sel += [
        F.col(time_col).alias(f"ts_{L + 1}"),
        F.col("__lts").alias(f"ts_{L + 1}_last"),
        F.col("__n").alias(f"n_{L + 1}"),
    ]
    # the anchor row IS the loop's first event: its payload is free
    for c in carry.get(f"ts_{L + 1}", []):
        sel.append(F.col(c).alias(f"ts_{L + 1}_{c}"))
    for c in carry.get(f"ts_{L + 1}_last", []):
        sel.append(F.col(f"__lpay_{c}").alias(f"ts_{L + 1}_last_{c}"))
    for j in range(1, sfx + 1):
        sel.append(F.col(f"__stslast{j}").alias(f"ts_{L + 1 + j}"))
        for c in carry.get(f"ts_{L + 1 + j}", []):
            sel.append(
                F.col(f"__spaylast{j}_{c}").alias(f"ts_{L + 1 + j}_{c}")
            )
    M = base.filter(cond).select(*sel)
    if within is not None:
        last_col = f"ts_{m}" if sfx else f"ts_{L + 1}_last"
        M = M.filter(
            F.col(last_col) <= F.col("ts_1") + _within_expr(within)
        )
    return M


def _strict_segments(
    events: DataFrame,
    steps: list[PatternStep],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    tiebreak: list[str],
    greedy_loops: bool = True,
    _fast: bool = True,
    carry_payload: dict[str, list[str]] | None = None,
    _island_disjoint: bool | None = None,
) -> DataFrame:
    """Strict pattern WITH consecutive-run loops: fixed-offset
    segments matched with lead chains, glued by (key, position)
    equi-joins against precomputed run metadata (gaps-and-islands).
    All window passes and joins share the key partitioning; the number
    of joins equals the number of loop steps.

    ``greedy_loops=False`` (Flink's non-greedy default, r7): each loop
    anchor emits EVERY prefix of its consecutive run — k is exploded
    1..run_remaining and the k-th event's timestamp fetched by one
    more co-partitioned (key, position) equi-join. A non-terminal
    prefix whose next position still holds the loop type dies at the
    following segment join (the adjacent event isn't the next step's
    type), which is exactly Flink's ``consecutive()`` semantics.

    Greedy single-loop patterns whose loop condition is
    data-probed-disjoint from its neighbors take the zero-join island
    fast path (:func:`_strict_island_fast`); ``_fast=False`` forces
    this general engine (the engine-vs-engine differential hook)."""
    if _fast and greedy_loops:
        M = _strict_island_fast(
            events, steps, key_col, time_col, type_col, within, tiebreak,
            carry_payload, _island_disjoint,
        )
        if M is not None:
            return M
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    w_run_sum = w.rowsBetween(Window.unboundedPreceding, 0)
    has_where = any(st.where is not None for st in steps)

    if has_where:
        base = _with_cand_cols(
            events, steps, [key_col, time_col, type_col, *tiebreak],
            type_col,
        ).withColumn("__pos", F.row_number().over(w))
        # per-loop-step run metadata on the CANDIDATE boolean: an
        # event of the loop type failing the predicate breaks the run
        # (strict adjacency), so islands are per step, not per type
        for lidx, st in enumerate(steps):
            if not st.loop:
                continue
            ci = F.col(f"__c{lidx}")
            lagc = F.lag(f"__c{lidx}").over(w)
            base = base.withColumn(
                f"__chg{lidx}",
                F.when(
                    lagc.isNull() | (lagc != ci), 1
                ).otherwise(0),
            ).withColumn(
                f"__grp{lidx}", F.sum(f"__chg{lidx}").over(w_run_sum)
            )
            w_run_i = (
                Window.partitionBy(key_col, f"__grp{lidx}")
                .orderBy("__pos")
                .rowsBetween(0, Window.unboundedFollowing)
            )
            base = (
                base.withColumn(
                    f"__rem{lidx}", F.count(F.lit(1)).over(w_run_i)
                )
                .withColumn(
                    f"__runlast{lidx}", F.max(time_col).over(w_run_i)
                )
                .drop(f"__chg{lidx}")
            )
    else:
        base = events.select(key_col, time_col, type_col, *tiebreak)
        lagt = F.lag(type_col).over(w)
        base = (
            base.withColumn("__pos", F.row_number().over(w))
            .withColumn(
                "__chg",
                F.when(
                    lagt.isNull() | (lagt != F.col(type_col)), 1
                ).otherwise(0),
            )
            .withColumn("__grp", F.sum("__chg").over(w_run_sum))
        )
        w_run = (
            Window.partitionBy(key_col, "__grp")
            .orderBy("__pos")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        base = (
            base.withColumn("__rem", F.count(F.lit(1)).over(w_run))
            .withColumn("__runlast", F.max(time_col).over(w_run))
            .drop("__chg")
        )

    def seg_df(seg, start_i: int):
        """Compile a fixed-offset segment anchored at each row: returns
        (df with key, __pos, captured ts cols, __eLast), consumed
        length, #positive steps. None when the segment has no positive
        steps (pure-negation segments are folded by the caller)."""
        if not any(not s.negate for _, s in seg):
            return None, 0, 0
        sel = [F.col(key_col), F.col("__pos")]
        cond = F.lit(True)
        off = 0
        i = start_i
        last_expr = None

        def lead_match(idx, s, off):
            if has_where:
                return F.lead(f"__c{idx}", off).over(w)
            return F.lead(type_col, off).over(w) == s.event_type

        for idx, s in seg:
            if s.negate:
                lm = lead_match(idx, s, off)
                cond = cond & (lm.isNull() | ~lm)
                continue
            i += 1
            for r in range(s.times):
                lts = F.lead(time_col, off).over(w)
                cond = cond & lead_match(idx, s, off)
                if r == 0:
                    sel.append(lts.alias(f"ts_{i}"))
                if s.times > 1 and r == s.times - 1:
                    sel.append(lts.alias(f"ts_{i}_last"))
                last_expr = lts
                off += 1
        df = (
            base.select(
                *sel, cond.alias("__m"), last_expr.alias("__eLast")
            )
            .filter(F.col("__m"))
            .drop("__m")
        )
        return df, off, i - start_i

    groups = _split_segments(steps)
    M: DataFrame | None = None
    pidx = 0
    pending_neg: list[int] = []  # fold-into-next-join negation indices
    gi = 0
    while gi < len(groups):
        kind, g = groups[gi]
        gi += 1
        if kind == "seg":
            seg = g  # type: ignore[assignment]
            df, length, npos = seg_df(seg, pidx)
            if df is None:
                # no positive steps: terminal -> absence check later;
                # mid-pattern -> fold negation steps into the next loop
                negs = [idx for idx, s in seg if s.negate]
                if gi >= len(groups):
                    if negs and M is None:
                        raise ValueError("pattern must start positively")
                    if negs:
                        if has_where:
                            psel = [
                                F.col(f"__c{x}").alias(f"__pc{x}")
                                for x in negs
                            ]
                        else:
                            psel = [F.col(type_col).alias("__pt")]
                        P = base.select(
                            F.col(key_col).alias("__pk"),
                            F.col("__pos").alias("__pp"),
                            *psel,
                        )
                        cond = (F.col(key_col) == F.col("__pk")) & (
                            F.col("__next") == F.col("__pp")
                        )
                        M = M.join(P, cond, "left")
                        not_any = F.lit(True)
                        if has_where:
                            probe = F.col(f"__pc{negs[0]}")
                            for x in negs:
                                not_any = not_any & ~F.col(f"__pc{x}")
                            M = M.filter(
                                probe.isNull() | not_any
                            ).drop(
                                "__pk", "__pp",
                                *[f"__pc{x}" for x in negs],
                            )
                        else:
                            for x in negs:
                                not_any = not_any & (
                                    F.col("__pt")
                                    != steps[x].event_type
                                )
                            M = M.filter(
                                F.col("__pt").isNull() | not_any
                            ).drop("__pk", "__pp", "__pt")
                else:
                    pending_neg += negs
                continue
            if M is None:
                M = df.withColumn("__next", F.col("__pos") + F.lit(length))
                M = M.drop("__pos")
            else:
                S = df.withColumnRenamed(key_col, "__sk")
                cond = (F.col(key_col) == F.col("__sk")) & (
                    F.col("__next") == F.col("__pos")
                )
                M = (
                    M.drop("__eLast")
                    .join(S, cond)
                    .withColumn("__next2", F.col("__pos") + F.lit(length))
                    .drop("__sk", "__pos", "__next")
                    .withColumnRenamed("__next2", "__next")
                )
            pidx += npos
        else:  # loop
            lidx, s = g  # type: ignore[assignment]
            pidx += 1
            rem_c = f"__rem{lidx}" if has_where else "__rem"
            runlast_c = f"__runlast{lidx}" if has_where else "__runlast"
            L = base.filter(
                F.col(f"__c{lidx}") if has_where
                else F.col(type_col) == s.event_type
            )
            for x in pending_neg:
                # negation at the loop-start position: the loop's
                # first event must NOT be a candidate of the negated
                # step (type equality alone contradicts only same-type
                # negations; with predicates the check is the column)
                if has_where:
                    L = L.filter(~F.col(f"__c{x}"))
                elif steps[x].event_type == s.event_type:
                    L = L.filter(F.lit(False))
            pending_neg = []
            if greedy_loops:
                L = L.select(
                    F.col(key_col).alias("__lk"),
                    F.col("__pos").alias("__lp"),
                    F.col(time_col).alias(f"ts_{pidx}"),
                    F.col(runlast_c).alias(f"ts_{pidx}_last"),
                    F.col(rem_c).alias(f"n_{pidx}"),
                    (F.col("__pos") + F.col(rem_c)).alias("__lnext"),
                    F.col(runlast_c).alias("__eL"),
                )
            else:
                # non-greedy: every prefix k of the remaining run; the
                # k-th event's ts via a (key, position) equi-join
                P = base.select(
                    F.col(key_col).alias("__bk"),
                    F.col("__pos").alias("__bp"),
                    F.col(time_col).alias("__bt"),
                )
                Lx = (
                    L.select(
                        F.col(key_col).alias("__lk"),
                        F.col("__pos").alias("__lp"),
                        F.col(time_col).alias(f"ts_{pidx}"),
                        F.col(rem_c).alias("__remx"),
                    )
                    .withColumn(
                        "__k",
                        F.explode(
                            F.sequence(F.lit(1), F.col("__remx"))
                        ),
                    )
                    .drop("__remx")
                )
                L = Lx.join(
                    P,
                    (F.col("__lk") == F.col("__bk"))
                    & (
                        F.col("__bp")
                        == F.col("__lp") + F.col("__k") - F.lit(1)
                    ),
                ).select(
                    "__lk",
                    "__lp",
                    f"ts_{pidx}",
                    F.col("__bt").alias(f"ts_{pidx}_last"),
                    F.col("__k").cast("long").alias(f"n_{pidx}"),
                    (F.col("__lp") + F.col("__k")).alias("__lnext"),
                    F.col("__bt").alias("__eL"),
                )
            if M is None:
                M = (
                    L.withColumnRenamed("__lk", key_col)
                    .withColumnRenamed("__lnext", "__next")
                    .withColumnRenamed("__eL", "__eLast")
                    .drop("__lp")
                )
            else:
                cond = (F.col(key_col) == F.col("__lk")) & (
                    F.col("__next") == F.col("__lp")
                )
                M = (
                    M.drop("__eLast")
                    .join(L, cond)
                    .drop("__lk", "__lp", "__next")
                    .withColumnRenamed("__lnext", "__next")
                    .withColumnRenamed("__eL", "__eLast")
                )

    assert M is not None
    if within is not None:
        M = M.filter(F.col("__eLast") <= F.col("ts_1") + _within_expr(within))
    return M.select(key_col, *_out_cols(steps))


# ---------------------------------------------------------------------------
# relaxed contiguity


def _earliest_after(
    anchors: DataFrame,
    step: DataFrame,
    key_col: str,
    prev_col: str,
    out_col: str,
    carry: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Attach ``out_col`` = min step time STRICTLY after ``prev_col``,
    per key — the forward-looking sibling of ``asof_join``'s union +
    running-window trick (``operators/joins.py``): tag both sides, sort
    each key DESCENDING by time, and take the running ``min`` of step
    times over the PRECEDING frame. At equal times the anchor sorts
    first (side desc), so an equal-time step event stays outside the
    frame — that is exactly the strict ``>``. One shuffle on the key,
    no join explosion. Arbitrary anchor payload columns ride along
    (null on the step side).

    ``carry`` (r8): ``[(src_col, dst_col), ...]`` — additionally
    carry the BOUND event's payload columns (present on the step
    side) into the anchor row as ``dst_col``, via the same running
    min lifted to a struct keyed on time (ties among equal-time step
    events break on payload order — deterministic). Feeds iterative
    conditions downstream without a second (key, time) join."""
    t, side = "__cep_t", "__cep_side"
    a = anchors.withColumn(t, F.col(prev_col)).withColumn(side, F.lit(1))
    s = step.withColumnRenamed("__step_t", t).withColumn(side, F.lit(0))
    merged = a.unionByName(s, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(t).desc(), F.col(side).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    if carry:
        hit = F.min(
            F.when(
                F.col(side) == 0,
                F.struct(
                    F.col(t).alias("t"),
                    *[F.col(src).alias(dst) for src, dst in carry],
                ),
            )
        ).over(w)
        out = (
            merged.withColumn("__cep_hit", hit)
            .filter(F.col(side) == 1)
            .withColumn(out_col, F.col("__cep_hit.t"))
        )
        for _src, dst in carry:
            out = out.withColumn(dst, F.col(f"__cep_hit.{dst}"))
        return out.drop(
            t, side, "__cep_hit", *{src for src, _ in carry}
        )
    filled = merged.withColumn(
        out_col,
        F.min(F.when(F.col(side) == 0, F.col(t))).over(w),
    )
    return filled.filter(F.col(side) == 1).drop(t, side)


def _match_relaxed(
    events: DataFrame,
    steps: list[PatternStep],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    greedy_loops: bool = True,
    iter_info: dict[int, tuple[str, list[tuple[int, str]]]] | None = None,
    carry_payload: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Relaxed (skip-till-next-match) engine. ITERATIVE conditions
    (r8, Flink ``IterativeCondition``) change binding, not shape:

    - a step whose ``where`` references earlier steps binds the
      earliest QUALIFYING candidate (the predicate is evaluated
      DURING binding — binding the earliest of the type and
      post-filtering would be wrong) via ONE co-partitioned key
      equi-join with the predicate as a residual conjunct, then a
      struct-min group-agg per anchor; fan-out is bounded by the
      ``within`` horizon (the horizon is a join conjunct);
    - referenced steps' payload columns ride along as
      ``__v{k}_{col}`` — carried in the struct-min of the normal
      binds (:func:`_earliest_after` ``carry``), selected directly at
      join-based binds — never a second (key, time) join;
    - iterative negations are LEFT ANTI joins (absence of a
      qualifying candidate in the guarded interval);
    - duplicate anchors are compressed to (row, __mult) before a
      group-agg bind and re-exploded at the end (the loop doctrine).

    ``carry_payload`` (r10 — VERDICT r9 #3): ``{ts_col: [cols]}``
    requests the matched events' payload columns as
    ``<ts_col>_<col>`` output columns, riding the SAME mechanism as
    the iterative ``__v{k}_{col}`` carry — the struct-min of
    :func:`_earliest_after` / the bind joins' aggregates — so a
    payload measure costs ZERO extra joins on every relaxed shape
    (plain binds, iterative binds, followedByAny fan-out, greedy and
    non-greedy loops). Requests whose ts column or payload columns
    don't exist are ignored (the caller's attach-join fallback
    doctrine)."""
    iter_info = iter_info or {}
    has_where = any(st.where is not None for st in steps)
    #: positive step index -> payload columns later iterative
    #: conditions reference (must be carried through its bind)
    ref_cols: dict[int, list[str]] = {}
    for _idx, (_tmpl, refs) in iter_info.items():
        for (k, c) in refs:
            cl = ref_cols.setdefault(k, [])
            if c not in cl:
                cl.append(c)
    # normalize the payload-carry request to this pattern's actual
    # output ts columns and the frame's actual payload columns
    out_ts = set(_out_cols(steps))
    pay: dict[str, list[str]] = {}
    for tsc, cols in (carry_payload or {}).items():
        if tsc not in out_ts or tsc.startswith("n_"):
            continue
        cols = sorted({
            c for c in cols
            if c in events.columns
            and c not in (key_col, time_col, type_col)
        })
        if cols:
            pay[tsc] = cols
    pay_src = sorted({c for cols in pay.values() for c in cols})

    def pay_pairs(tsc: str) -> list[tuple[str, str]]:
        return [(c, f"{tsc}_{c}") for c in pay.get(tsc, [])]

    if iter_info:
        clash = {
            c for c in events.columns
            if c.startswith(("ts_", "__v", "__mult", "__step_t", "__ik"))
        }
        if clash:
            raise ValueError(
                f"event columns {sorted(clash)} clash with the "
                f"iterative engine's internal names; rename them first"
            )
        base = _with_cand_cols(
            events, steps, list(events.columns), type_col
        )
    elif has_where:
        base = _with_cand_cols(
            events, steps,
            [key_col, time_col, type_col, *pay_src], type_col,
        )
    else:
        base = events.select(key_col, time_col, type_col, *pay_src)

    payload_cols = [c for c in events.columns if c != key_col]

    def typed(t: str) -> DataFrame:
        return base.filter(F.col(type_col) == t).select(
            key_col, F.col(time_col).alias("__step_t")
        )

    def cand(idx: int, extra: list[str] | None = None) -> DataFrame:
        """Step ``idx``'s candidate events (type + optional r7 where
        predicate); ``extra`` payload columns ride along (r8 carry)."""
        if has_where:
            flt = F.col(f"__c{idx}")
        else:
            flt = F.col(type_col) == steps[idx].event_type
        return base.filter(flt).select(
            key_col, F.col(time_col).alias("__step_t"), *(extra or [])
        )

    def cand_payload(idx: int) -> DataFrame:
        """Candidate side for join-based iterative binds: key aliased
        (no ambiguity), time as ``__step_t`` AND under its own name
        (bare refs in the predicate may use it), full payload for the
        predicate's bare column refs."""
        if has_where:
            flt = F.col(f"__c{idx}")
        else:
            flt = F.col(type_col) == steps[idx].event_type
        return base.filter(flt).select(
            F.col(key_col).alias("__ik"),
            F.col(time_col).alias("__step_t"),
            *[c for c in payload_cols if c in base.columns],
        )

    has_loop = any(s.loop for s in steps)
    M: DataFrame | None = None
    pidx = 0
    last_col: str | None = None
    compressed = False
    # (negated step index, anchor ts column at declaration time)
    pending_neg: list[tuple[int, str]] = []

    def bind(M: DataFrame, idx: int, prev_col: str, out_col: str,
             carry_p: int | None = None) -> DataFrame:
        carry = (
            [(c, f"__v{carry_p}_{c}") for c in ref_cols[carry_p]]
            if carry_p is not None and carry_p in ref_cols else []
        )
        # r10: requested payload columns ride the SAME struct-min
        carry = carry + pay_pairs(out_col)
        carry = carry or None
        out = _earliest_after(
            M,
            cand(idx, sorted({s for s, _ in carry}) if carry else None),
            key_col, prev_col, out_col, carry,
        )
        out = out.filter(F.col(out_col).isNotNull())
        if within is not None:
            # prune per step: ts_i is monotone, a partial match past the
            # horizon can never complete (state-eviction bound at scale)
            out = out.filter(
                F.col(out_col) <= F.col("ts_1") + _within_expr(within)
            )
        return out

    def bind_iter(M: DataFrame, idx: int, p: int, prev_col: str,
                  out_col: str, carry_self: bool) -> DataFrame:
        """Earliest QUALIFYING candidate for an iterative step: key
        equi-join with the predicate (and horizon) as residual
        conjuncts, struct-min per anchor. Requires compressed anchors
        (group-agg keyed on the anchor row)."""
        template, _refs = iter_info[idx]
        C = cand_payload(idx)
        jc = (
            (F.col(key_col) == F.col("__ik"))
            & (F.col("__step_t") > F.col(prev_col))
            & F.expr(template)
        )
        if within is not None:
            jc = jc & (
                F.col("__step_t") <= F.col("ts_1") + _within_expr(within)
            )
        J = M.join(C, jc)
        carried = M.columns
        carry = (
            [(c, f"__v{p}_{c}") for c in ref_cols[p]]
            if carry_self and p in ref_cols else []
        )
        carry = (carry + pay_pairs(out_col)) or None
        if carry:
            hit = F.min(
                F.struct(
                    F.col("__step_t").alias("t"),
                    *[F.col(src).alias(dst) for src, dst in carry],
                )
            ).alias("__hit")
            out = (
                J.groupBy(*carried).agg(hit)
                .withColumn(out_col, F.col("__hit.t"))
            )
            for _src, dst in carry:
                out = out.withColumn(dst, F.col(f"__hit.{dst}"))
            return out.drop("__hit")
        return J.groupBy(*carried).agg(F.min("__step_t").alias(out_col))

    def apply_negs(M: DataFrame, next_col: str) -> DataFrame:
        nonlocal pending_neg
        for x, anchor in pending_neg:
            if x in iter_info:
                template, _refs = iter_info[x]
                jc = (
                    (F.col(key_col) == F.col("__ik"))
                    & (F.col("__step_t") > F.col(anchor))
                    & (F.col("__step_t") < F.col(next_col))
                    & F.expr(template)
                )
                M = M.join(cand_payload(x), jc, "left_anti")
                continue
            M = _earliest_after(M, cand(x), key_col, anchor, "__negx")
            M = M.filter(
                F.col("__negx").isNull()
                | (F.col("__negx") >= F.col(next_col))
            ).drop("__negx")
        pending_neg = []
        return M

    for sidx, s in enumerate(steps):
        if s.negate:
            if last_col is None:
                raise ValueError("pattern must start with a positive step")
            pending_neg.append((sidx, last_col))
            continue
        pidx += 1
        first_col = f"ts_{pidx}"
        if s.loop:
            if M is not None and not compressed:
                # deterministic loop aggregation groups by the carried
                # columns; compress duplicate anchors first and restore
                # multiplicity at the end (identical events at identical
                # times produce identical matches)
                M = M.groupBy(M.columns).agg(F.count(F.lit(1)).alias("__mult"))
            compressed = True  # loop-first anchors self-compress too
            loop_carry = (
                [(c, f"__v{pidx}_{c}") for c in ref_cols[pidx]]
                if pidx in ref_cols else []
            )
            # r10: first-element payload shares the struct-min carry;
            # last-element payload is the mirrored struct-max
            loop_carry = (loop_carry + pay_pairs(first_col)) or None
            M = _relaxed_loop(
                M, base, typed, s, key_col, time_col, type_col,
                within, pidx, last_col, greedy_loops,
                cand_filter=(
                    F.col(f"__c{sidx}") if has_where
                    else F.col(type_col) == s.event_type
                ),
                iter_template=(
                    iter_info[sidx][0] if sidx in iter_info else None
                ),
                payload_cols=(
                    payload_cols if iter_info
                    else (pay_src or None)
                ),
                carry=loop_carry,
                carry_last=pay_pairs(f"ts_{pidx}_last") or None,
            )
            if pending_neg:
                M = apply_negs(M, first_col)
            last_col = f"ts_{pidx}_last"
        else:
            if M is None:
                flt = (
                    F.col(f"__c{sidx}") if has_where
                    else F.col(type_col) == s.event_type
                )
                M = base.filter(flt).select(
                    key_col, F.col(time_col).alias(first_col),
                    *[
                        F.col(c).alias(f"__v{pidx}_{c}")
                        for c in ref_cols.get(pidx, [])
                    ],
                    # anchor payload (r10): the anchor row IS the match
                    *[
                        F.col(src).alias(dst)
                        for src, dst in pay_pairs(first_col)
                    ],
                )
                last_col = first_col
                rng = range(1, s.times)
            elif s.any_match:
                # followedByAny (r7): bind EVERY candidate after the
                # previous step — a key equi-join (fan-out = the honest
                # per-combination output size), horizon-pruned per
                # step. With an iterative condition (r8) the predicate
                # is one more residual conjunct on the same join.
                need_payload = (
                    sidx in iter_info or pidx in ref_cols
                    or first_col in pay
                )
                if need_payload:
                    C, kcol = cand_payload(sidx), "__ik"
                else:
                    C = cand(sidx).withColumnRenamed(key_col, "__ak")
                    kcol = "__ak"
                jc = (F.col(key_col) == F.col(kcol)) & (
                    F.col("__step_t") > F.col(last_col)
                )
                if within is not None:
                    jc = jc & (
                        F.col("__step_t")
                        <= F.col("ts_1") + _within_expr(within)
                    )
                if sidx in iter_info:
                    jc = jc & F.expr(iter_info[sidx][0])
                J = M.join(C, jc)
                if need_payload:
                    M = J.select(
                        *M.columns,
                        F.col("__step_t").alias(first_col),
                        *[
                            F.col(c).alias(f"__v{pidx}_{c}")
                            for c in ref_cols.get(pidx, [])
                        ],
                        # any-bind payload (r10): each joined candidate
                        # row IS the bound event — select directly
                        *[
                            F.col(src).alias(dst)
                            for src, dst in pay_pairs(first_col)
                        ],
                    )
                else:
                    M = J.drop("__ak").withColumnRenamed(
                        "__step_t", first_col
                    )
                last_col = first_col
                if pending_neg:
                    M = apply_negs(M, first_col)
                continue
            else:
                rng = range(s.times)
            is_iter = sidx in iter_info
            if is_iter and not compressed:
                # the join-bind's group-agg keys on the anchor row:
                # compress duplicate anchors first (loop doctrine),
                # multiplicity restored by the final explode
                M = M.groupBy(M.columns).agg(
                    F.count(F.lit(1)).alias("__mult")
                )
                compressed = True
            tmp_cols: list[str] = []
            for r in rng:
                if r == 0:
                    out_col = first_col
                elif r == s.times - 1:
                    out_col = f"ts_{pidx}_last"
                else:
                    out_col = f"__t{pidx}_{r}"
                    tmp_cols.append(out_col)
                if is_iter:
                    M = bind_iter(
                        M, sidx, pidx, last_col, out_col,
                        carry_self=(r == 0),
                    )
                else:
                    M = bind(
                        M, sidx, last_col, out_col,
                        carry_p=pidx if r == 0 else None,
                    )
                last_col = out_col
            if tmp_cols:
                M = M.drop(*tmp_cols)
            if pending_neg:
                M = apply_negs(M, first_col)

    assert M is not None and last_col is not None
    if pending_neg:
        # terminal negation: absence up to the pattern horizon
        if within is None:
            raise ValueError(
                "a terminal not_followed_by requires within (Flink's rule: "
                "a pattern ending in notFollowedBy needs a window)"
            )
        for x, anchor in pending_neg:
            if x in iter_info:
                template, _refs = iter_info[x]
                jc = (
                    (F.col(key_col) == F.col("__ik"))
                    & (F.col("__step_t") > F.col(anchor))
                    & (
                        F.col("__step_t")
                        <= F.col("ts_1") + _within_expr(within)
                    )
                    & F.expr(template)
                )
                M = M.join(cand_payload(x), jc, "left_anti")
                continue
            M = _earliest_after(M, cand(x), key_col, anchor, "__negx")
            M = M.filter(
                F.col("__negx").isNull()
                | (F.col("__negx") > F.col("ts_1") + _within_expr(within))
            ).drop("__negx")
        pending_neg = []
    if compressed:
        M = M.withColumn(
            "__dup", F.explode(F.sequence(F.lit(1), F.col("__mult")))
        ).drop("__mult", "__dup")
    carried_pay = [
        dst for tsc in pay for _src, dst in pay_pairs(tsc)
        if dst in M.columns
    ]
    return M.select(key_col, *_out_cols(steps), *carried_pay)


def _relaxed_loop(
    M: DataFrame | None,
    base: DataFrame,
    typed,
    s: PatternStep,
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    pidx: int,
    last_col: str | None,
    greedy_loops: bool = True,
    cand_filter: Column | None = None,
    iter_template: str | None = None,
    payload_cols: list[str] | None = None,
    carry: list[tuple[str, str]] | None = None,
    carry_last: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Relaxed loop: events of the type strictly after the previous
    step and strictly before the stop bound (earliest ``until`` event /
    the ``within`` horizon; unbounded otherwise). One (key) equi-join;
    greedy aggregates the whole run into one match (group-agg),
    non-greedy (``greedy_loops=False``, Flink's default, r7) emits one
    match PER PREFIX — each joined element row IS a prefix, with
    ``n`` = its rank and ``ts_last`` = its own timestamp (one ordered
    window pass over the same partitioning instead of the group-agg).
    Fan-out is the matched-run length in both modes — prefix emission
    is the HONEST output size of Flink's NO_SKIP, not a blow-up.

    Iterative conditions (r8): ``iter_template`` is the step's
    rewritten cross-step predicate — it becomes one more residual
    conjunct on the SAME element join (the element side then carries
    the payload columns its bare refs name), so a loop takes exactly
    the elements satisfying the predicate against the match's earlier
    bindings (Flink: non-qualifying events are skipped by relaxed
    internal contiguity). ``carry`` requests the run's FIRST element's
    payload as ``__v{pidx}_{col}`` for LATER steps' refs — a struct-min
    in the existing aggregation, no extra join. ``carry_last`` (r10)
    mirrors it for the run's LAST element's payload (a struct-max /
    the prefix row itself) — zero extra joins on every branch."""
    first_col, last_out, n_col = f"ts_{pidx}", f"ts_{pidx}_last", f"n_{pidx}"
    if cand_filter is None:
        cand_filter = F.col(type_col) == s.event_type
    need_payload = (
        iter_template is not None or carry is not None
        or carry_last is not None
    )
    if need_payload:
        el = base.filter(cand_filter).select(
            F.col(key_col).alias("__ek"), F.col(time_col).alias("__el"),
            *(payload_cols or []),
        )
    else:
        el = base.filter(cand_filter).select(
            F.col(key_col).alias("__ek"), F.col(time_col).alias("__el")
        )

    if M is None:
        # loop is step 1: each occurrence anchors a match; the anchor is
        # the run's first element, later elements aggregate on top —
        # a requested carry is therefore the anchor's OWN payload.
        # carry_last needs the anchor's payload TOO (a single-element
        # run's last element is the anchor) — staged as __own columns
        # and coalesced after the run aggregation.
        A = base.filter(cand_filter).select(
            key_col, F.col(time_col).alias(first_col),
            *[F.col(src).alias(dst) for src, dst in (carry or [])],
            *[
                F.col(src).alias(f"__own{dst}")
                for src, dst in (carry_last or [])
            ],
        )
        A = A.groupBy(A.columns).agg(F.count(F.lit(1)).alias("__mult"))
        anchor_prev = first_col
        carry = None  # already attached
    else:
        A = M
        anchor_prev = last_col

    if s.until is not None:
        A = _earliest_after(A, typed(s.until), key_col, anchor_prev, "__stop")
        # sentinel instead of NULL for "no stop event": __stop is part
        # of the loop agg's carried grouping columns, and a NULL key
        # never matches in the first-step left join back — anchors
        # without an until event would silently lose their run
        # (review r6 finding #1). The sentinel is derived from the
        # time column's type (numeric epoch columns get 2**62, like
        # the positional engine; temporal columns get year-9999) so
        # both engines accept the same inputs (ADVICE r6).
        time_dt = dict(base.dtypes)[time_col]
        if time_dt.startswith("timestamp") or time_dt == "date":
            no_stop = F.lit("9999-12-31").cast(time_dt)
        else:
            no_stop = F.lit(2**62).cast(time_dt)
        A = A.withColumn("__stop", F.coalesce(F.col("__stop"), no_stop))

    carried = A.columns
    cond = (F.col(key_col) == F.col("__ek")) & (
        F.col("__el") > F.col(anchor_prev)
    )
    if s.until is not None:
        cond = cond & (F.col("__el") < F.col("__stop"))
    if within is not None:
        horizon_base = "ts_1" if M is not None else first_col
        cond = cond & (
            F.col("__el") <= F.col(horizon_base) + _within_expr(within)
        )
    if iter_template is not None:
        cond = cond & F.expr(iter_template)
    j = A.join(el, cond)
    if s.any_match and M is not None:
        # followedByAny + oneOrMore (r8): the loop's FIRST element
        # binds ANY candidate after the previous step (not just the
        # earliest) — each joined element row starts its OWN greedy
        # run over its element SUFFIX. One window pass over the same
        # join (partition = the anchor row, DESC element order, frame
        # = elements >= current): no extra shuffle beyond q88's, and
        # the fan-out (one row per run start) IS the honest output
        # size of skip-till-any-match.
        w_sfx = (
            Window.partitionBy(*carried)
            .orderBy(F.col("__el").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = j.select(
            *carried,
            F.col("__el").alias(first_col),
            F.max("__el").over(w_sfx).alias(last_out),
            F.count(F.lit(1)).over(w_sfx).cast("long").alias(n_col),
            # any-loop carry: the run START is this row's own element
            *[F.col(src).alias(dst) for src, dst in (carry or [])],
            # run END payload: struct-max over the same suffix frame
            *[
                F.max(F.struct(
                    F.col("__el").alias("t"),
                    F.col(src).alias("v"),
                )).over(w_sfx).getField("v").alias(dst)
                for src, dst in (carry_last or [])
            ],
        )
        return out.drop("__stop") if s.until is not None else out
    if greedy_loops:
        aggs = [
            F.min("__el").alias("__f"),
            F.max("__el").alias("__l"),
            F.count(F.lit(1)).alias("__n"),
        ]
        if carry:
            aggs.append(
                F.min(F.struct(
                    F.col("__el").alias("t"),
                    *[F.col(src).alias(dst) for src, dst in carry],
                )).alias("__hit")
            )
        if carry_last:
            aggs.append(
                F.max(F.struct(
                    F.col("__el").alias("t"),
                    *[F.col(src).alias(dst) for src, dst in carry_last],
                )).alias("__hitl")
            )
        agg = j.groupBy(*carried).agg(*aggs)
        if M is None:
            # left side keeps single-element runs (no later elements)
            own = [f"__own{dst}" for _src, dst in (carry_last or [])]
            out = A.join(agg, carried, "left").select(
                *[c for c in carried if c not in own],
                F.coalesce(F.col("__l"), F.col(first_col)).alias(last_out),
                (
                    F.lit(1) + F.coalesce(F.col("__n"), F.lit(0))
                ).alias(n_col),
                *[
                    F.coalesce(
                        F.col(f"__hitl.{dst}"), F.col(f"__own{dst}")
                    ).alias(dst)
                    for _src, dst in (carry_last or [])
                ],
            )
        else:
            out = agg.select(
                *carried,
                F.col("__f").alias(first_col),
                F.col("__l").alias(last_out),
                F.col("__n").alias(n_col),
                *[
                    F.col(f"__hit.{dst}").alias(dst)
                    for _src, dst in (carry or [])
                ],
                *[
                    F.col(f"__hitl.{dst}").alias(dst)
                    for _src, dst in (carry_last or [])
                ],
            )
    else:
        wp = Window.partitionBy(*carried).orderBy("__el")
        if M is None:
            # anchor itself is the 1-prefix; joined later elements are
            # the (k>=2)-prefixes (anchor IS the run's first element)
            own = [f"__own{dst}" for _src, dst in (carry_last or [])]
            keep = [c for c in carried if c not in own]
            single = A.select(
                *keep,
                F.col(first_col).alias(last_out),
                F.lit(1).cast("long").alias(n_col),
                # the 1-prefix's last element IS the anchor
                *[
                    F.col(f"__own{dst}").alias(dst)
                    for _src, dst in (carry_last or [])
                ],
            )
            later = j.select(
                *keep,
                F.col("__el").alias(last_out),
                (F.row_number().over(wp) + F.lit(1))
                .cast("long").alias(n_col),
                # each prefix's last element is the joined row itself
                *[
                    F.col(src).alias(dst)
                    for src, dst in (carry_last or [])
                ],
            )
            out = single.unionByName(later)
        else:
            pre = wp.rowsBetween(Window.unboundedPreceding, 0)
            out = j.select(
                *carried,
                F.min("__el").over(pre).alias(first_col),
                F.col("__el").alias(last_out),
                F.row_number().over(wp).cast("long").alias(n_col),
                # prefix carry: the prefix's FIRST element's payload
                *[
                    F.min(F.struct(
                        F.col("__el").alias("t"),
                        F.col(src).alias("v"),
                    )).over(pre).getField("v").alias(dst)
                    for src, dst in (carry or [])
                ],
                # the prefix's LAST element is the row itself
                *[
                    F.col(src).alias(dst)
                    for src, dst in (carry_last or [])
                ],
            )
    return out.drop("__stop") if s.until is not None else out


# ---------------------------------------------------------------------------
# mixed contiguity (r6): positional sequential engine


def _attach_earliest_pos_after(
    anchors: DataFrame,
    sub: DataFrame,
    key_col: str,
    anchor_pos_col: str,
    out_pos: str,
    out_ts: str,
) -> DataFrame:
    """Attach the (position, time) of the earliest ``sub`` event with
    position STRICTLY greater than ``anchor_pos_col``, per key — the
    positional form of ``_earliest_after`` (struct-min over a
    descending-position window; positions are a total order, so the
    struct min IS the earliest event). ``sub`` must have columns
    ``__sp`` (pos) and ``__st`` (ts)."""
    t, side = "__mix_t", "__mix_side"
    a = anchors.withColumn(t, F.col(anchor_pos_col)).withColumn(
        side, F.lit(1)
    )
    s = sub.withColumnRenamed("__sp", t).withColumn(side, F.lit(0))
    merged = a.unionByName(s, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(t).desc(), F.col(side).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hit = F.min(
        F.when(
            F.col(side) == 0,
            F.struct(F.col(t).alias("p"), F.col("__st").alias("t")),
        )
    ).over(w)
    out = merged.withColumn("__mix_hit", hit).filter(F.col(side) == 1)
    return (
        out.withColumn(out_pos, F.col("__mix_hit.p"))
        .withColumn(out_ts, F.col("__mix_hit.t"))
        .drop(t, side, "__mix_hit", "__st")
    )


def _mixed_leadmin_fast(
    events: DataFrame,
    steps: list[PatternStep],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    tiebreak: list[str],
) -> DataFrame | None:
    """Mixed-contiguity FAST PATH (r8): a pattern shaped
    ``[plain strict prefix][ONE trailing plain relaxed step]`` — the
    common Flink ``begin().next()...followedBy()`` idiom — compiles to
    ONE window pass over the per-key (time, tiebreak) order: ``lead()``
    columns bind the fixed-offset strict prefix (the strict leadchain
    shape) and one ``min(when(type)) OVER (ROWS BETWEEN <consumed>
    FOLLOWING AND UNBOUNDED FOLLOWING)`` binds the earliest relaxed
    tail event. Equivalent to the positional engine by construction —
    the row frame starting at the first position past the prefix IS
    the positional ``pos > prefix_end`` scan, including the
    equal-timestamp boundary (both count rows in (time, tiebreak)
    order) — and pinned by an engine-vs-engine differential
    (tests/test_cep.py). Eliminates the (key, pos) self-join and the
    union/running-min passes: measured at sf0.1 on q93,
    1.70 s → 0.78 s, identical output. Returns None when the pattern
    is outside the shape (the general positional engine takes over)."""
    if len(steps) < 2:
        return None
    last = steps[-1]
    if (
        last.mode != "relaxed" or last.negate or last.loop
        or last.times != 1 or last.times_max is not None
        or last.optional or last.any_match
    ):
        return None
    for i, s in enumerate(steps[:-1]):
        if s.loop or s.times_max is not None or s.optional or s.any_match:
            return None
        if s.negate and s.times != 1:
            return None
        # the anchor's mode only matters for its own repetitions
        if (i > 0 or s.times > 1) and s.mode != "strict":
            return None
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    b = events.select(key_col, time_col, type_col, *tiebreak)
    cond = F.col(type_col) == steps[0].event_type
    sel = [F.col(key_col), F.col(time_col).alias("ts_1")]
    for r in range(1, steps[0].times):
        cond = cond & (
            F.lead(type_col, r).over(w) == steps[0].event_type
        )
    if steps[0].times > 1:
        sel.append(
            F.lead(time_col, steps[0].times - 1).over(w)
            .alias("ts_1_last")
        )
    off = steps[0].times
    pidx = 1
    for s in steps[1:-1]:
        if s.negate:
            # assert the event AT the offset (if any) is not the type;
            # negations do not consume the position
            nc = F.lead(type_col, off).over(w) == s.event_type
            cond = cond & ~F.coalesce(nc, F.lit(False))
            continue
        pidx += 1
        for r in range(s.times):
            cond = cond & (
                F.lead(type_col, off + r).over(w) == s.event_type
            )
        sel.append(F.lead(time_col, off).over(w).alias(f"ts_{pidx}"))
        if s.times > 1:
            sel.append(
                F.lead(time_col, off + s.times - 1).over(w)
                .alias(f"ts_{pidx}_last")
            )
        off += s.times
    pidx += 1
    wf = w.rowsBetween(off, Window.unboundedFollowing)
    tail = F.min(
        F.when(F.col(type_col) == last.event_type, F.col(time_col))
    ).over(wf)
    sel.append(tail.alias(f"ts_{pidx}"))
    M = (
        b.select(*sel, cond.alias("__ok"))
        .filter(F.col("__ok") & F.col(f"ts_{pidx}").isNotNull())
        .drop("__ok")
    )
    if within is not None:
        M = M.filter(
            F.col(f"ts_{pidx}") <= F.col("ts_1") + _within_expr(within)
        )
    return M


def _match_mixed(
    events: DataFrame,
    steps: list[PatternStep],
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    tiebreak: list[str],
    _fast: bool = True,
) -> DataFrame:
    """Per-step contiguity (Flink's real API shape): strict steps
    constrain the IMMEDIATELY-NEXT position, relaxed steps bind the
    earliest later event — both over one per-key position order
    (``row_number`` by (time, tiebreak)). Strict steps/loops join base
    rows at ``pos+1`` ((key, pos) equi-joins, co-partitioned); relaxed
    steps are union + running-struct-min window passes; relaxed loops
    are one key equi-join + group-agg. Since positions totalize the
    order, relaxed binding here resolves equal-timestamp events by the
    tiebreak (the single-mode relaxed engine is pure event-time — a
    documented, measure-zero difference).

    Patterns shaped [plain strict prefix][one trailing plain relaxed
    step] take the single-window-pass fast path
    (:func:`_mixed_leadmin_fast`); ``_fast=False`` forces the general
    positional engine (engine-vs-engine differential hook)."""
    if _fast:
        M = _mixed_leadmin_fast(
            events, steps, key_col, time_col, type_col, within, tiebreak
        )
        if M is not None:
            return M
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    base = events.select(key_col, time_col, type_col, *tiebreak)
    base = base.withColumn("__pos", F.row_number().over(w))

    if any(s.loop and s.mode == "strict" for s in steps):
        lagt = F.lag(type_col).over(w)
        w_sum = w.rowsBetween(Window.unboundedPreceding, 0)
        base = base.withColumn(
            "__chg",
            F.when(lagt.isNull() | (lagt != F.col(type_col)), 1).otherwise(0),
        ).withColumn("__grp", F.sum("__chg").over(w_sum))
        w_run = (
            Window.partitionBy(key_col, "__grp")
            .orderBy("__pos")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        base = (
            base.withColumn("__rem", F.count(F.lit(1)).over(w_run))
            .withColumn("__runlast", F.max(time_col).over(w_run))
            .drop("__chg", "__grp")
        )
    base = base.drop(*tiebreak)

    def typed_pos(t: str) -> DataFrame:
        return base.filter(F.col(type_col) == t).select(
            key_col,
            F.col("__pos").alias("__sp"),
            F.col(time_col).alias("__st"),
        )

    def within_prune(M: DataFrame, ts_col: str) -> DataFrame:
        if within is None:
            return M
        return M.filter(
            F.col(ts_col) <= F.col("ts_1") + _within_expr(within)
        )

    M: DataFrame | None = None
    pidx = 0
    compressed = False
    neg_id = 0
    # (negated type, snapshot pos column) — relaxed negations only;
    # strict negations assert immediately
    pending: list[tuple[str, str]] = []

    def strict_join(M: DataFrame, t: str | None, how: str) -> DataFrame:
        """Join the base row at position __p + 1 (type-filtered when
        ``t`` is given)."""
        J = base.select(
            F.col(key_col).alias("__jk"),
            F.col("__pos").alias("__jp"),
            F.col(type_col).alias("__jt"),
            F.col(time_col).alias("__jts"),
            *(
                [F.col("__rem").alias("__jrem"),
                 F.col("__runlast").alias("__jrl")]
                if "__rem" in base.columns else []
            ),
        )
        if t is not None:
            J = J.filter(F.col("__jt") == t)
        cond = (F.col(key_col) == F.col("__jk")) & (
            F.col("__jp") == F.col("__p") + 1
        )
        return M.join(J, cond, how)

    def apply_pending(M: DataFrame, first_pos_col: str) -> DataFrame:
        nonlocal pending
        for x, anchor in pending:
            M = _attach_earliest_pos_after(
                M, typed_pos(x), key_col, anchor, "__xp", "__xt"
            )
            M = M.filter(
                F.col("__xp").isNull()
                | (F.col("__xp") >= F.col(first_pos_col))
            ).drop("__xp", "__xt", anchor)
        pending = []
        return M

    for s in steps:
        if s.negate:
            if s.mode == "strict":
                # notNext: assert about position __p + 1, consume nothing
                M = strict_join(M, None, "left")
                M = M.filter(
                    F.col("__jt").isNull() | (F.col("__jt") != s.event_type)
                ).drop("__jk", "__jp", "__jt", "__jts",
                       *(["__jrem", "__jrl"] if "__rem" in base.columns
                         else []))
            else:
                neg_id += 1
                na = f"__na{neg_id}"
                M = M.withColumn(na, F.col("__p"))
                pending.append((s.event_type, na))
            continue

        pidx += 1
        first_col = f"ts_{pidx}"
        first_pos = f"__fp{pidx}"

        if s.loop:
            if s.mode == "strict":
                if s.until is not None:
                    raise ValueError(
                        "until applies to relaxed loops only (a strict/"
                        "consecutive run ends at the first non-matching "
                        "event by construction)"
                    )
                if M is None:
                    L = base.filter(F.col(type_col) == s.event_type)
                    M = L.select(
                        key_col,
                        F.col(time_col).alias(first_col),
                        F.col("__runlast").alias(f"ts_{pidx}_last"),
                        F.col("__rem").alias(f"n_{pidx}"),
                        F.col("__pos").alias(first_pos),
                        (F.col("__pos") + F.col("__rem") - 1).alias("__p"),
                    )
                else:
                    M = strict_join(M, s.event_type, "inner")
                    M = (
                        M.drop("__p")
                        .withColumnRenamed("__jts", first_col)
                        .withColumnRenamed("__jrl", f"ts_{pidx}_last")
                        .withColumnRenamed("__jrem", f"n_{pidx}")
                        .withColumn(
                            "__p",
                            F.col("__jp") + F.col(f"n_{pidx}") - 1,
                        )
                        .withColumnRenamed("__jp", first_pos)
                        .drop("__jk", "__jt")
                    )
                M = within_prune(M, f"ts_{pidx}_last")
            else:
                M = _mixed_relaxed_loop(
                    M, base, typed_pos, s, key_col, time_col, type_col,
                    within, pidx, first_col, first_pos,
                )
                compressed = True
            if pending:
                M = apply_pending(M, first_pos)
            M = M.drop(first_pos)
            continue

        # plain / times step
        rng: range
        if M is None:
            A = base.filter(F.col(type_col) == s.event_type)
            M = A.select(
                key_col,
                F.col(time_col).alias(first_col),
                F.col("__pos").alias(first_pos),
                F.col("__pos").alias("__p"),
            )
            rng = range(1, s.times)
        else:
            rng = range(s.times)
        for r in rng:
            out_col = (
                first_col if r == 0
                else (f"ts_{pidx}_last" if r == s.times - 1 else f"__tmp{pidx}_{r}")
            )
            if s.mode == "strict" or (s.mode is None):
                M = strict_join(M, s.event_type, "inner")
                M = (
                    M.drop("__p")
                    .withColumnRenamed("__jts", out_col)
                    .withColumnRenamed("__jp", "__p")
                    .drop("__jk", "__jt",
                          *(["__jrem", "__jrl"] if "__rem" in base.columns
                            else []))
                )
                if r == 0:
                    M = M.withColumn(first_pos, F.col("__p"))
            else:
                M = _attach_earliest_pos_after(
                    M, typed_pos(s.event_type), key_col, "__p",
                    "__bp", out_col,
                )
                M = M.filter(F.col("__bp").isNotNull())
                M = M.drop("__p").withColumnRenamed("__bp", "__p")
                if r == 0:
                    M = M.withColumn(first_pos, F.col("__p"))
            M = within_prune(M, out_col)
        # drop tmp capture cols from times>2 middles
        M = M.drop(*[c for c in M.columns if c.startswith(f"__tmp{pidx}_")])
        if pending:
            M = apply_pending(M, first_pos)
        M = M.drop(first_pos)

    assert M is not None
    if pending:
        if within is None:
            raise ValueError(
                "a terminal not_followed_by requires within (Flink's rule: "
                "a pattern ending in notFollowedBy needs a window)"
            )
        for x, anchor in pending:
            M = _attach_earliest_pos_after(
                M, typed_pos(x), key_col, anchor, "__xp", "__xt"
            )
            M = M.filter(
                F.col("__xp").isNull()
                | (F.col("__xt") > F.col("ts_1") + _within_expr(within))
            ).drop("__xp", "__xt", anchor)
        pending = []
    if compressed and "__mult" in M.columns:
        M = M.withColumn(
            "__dup", F.explode(F.sequence(F.lit(1), F.col("__mult")))
        ).drop("__mult", "__dup")
    return M.select(key_col, *_out_cols(steps))


def _mixed_relaxed_loop(
    M: DataFrame | None,
    base: DataFrame,
    typed_pos,
    s: PatternStep,
    key_col: str,
    time_col: str,
    type_col: str,
    within: str | None,
    pidx: int,
    first_col: str,
    first_pos: str,
) -> DataFrame:
    """Relaxed greedy loop in the positional engine: elements meet the
    anchors in one key equi-join on a position range; first/last/count
    come from a struct-min/max group-agg over the carried columns
    (duplicate anchors pre-compressed into ``__mult``)."""
    last_out, n_col = f"ts_{pidx}_last", f"n_{pidx}"
    el = base.filter(F.col(type_col) == s.event_type).select(
        F.col(key_col).alias("__ek"),
        F.col("__pos").alias("__ep"),
        F.col(time_col).alias("__et"),
    )
    if M is None:
        A = base.filter(F.col(type_col) == s.event_type).select(
            key_col,
            F.col(time_col).alias(first_col),
            F.col("__pos").alias(first_pos),
            F.col("__pos").alias("__p"),
        )
        A = A.groupBy(A.columns).agg(F.count(F.lit(1)).alias("__mult"))
    else:
        A = M
        if "__mult" not in A.columns:
            A = A.groupBy(A.columns).agg(F.count(F.lit(1)).alias("__mult"))
    if s.until is not None:
        A = _attach_earliest_pos_after(
            A, typed_pos(s.until), key_col, "__p", "__stopp", "__stopt"
        ).drop("__stopt")
        # sentinel for "no stop event" — see _relaxed_loop (carried
        # NULL grouping key never matches the left join back)
        A = A.withColumn(
            "__stopp", F.coalesce(F.col("__stopp"), F.lit(2**62))
        )

    carried = A.columns
    cond = (F.col(key_col) == F.col("__ek")) & (
        F.col("__ep") > F.col("__p")
    )
    if s.until is not None:
        cond = cond & (F.col("__ep") < F.col("__stopp"))
    if within is not None:
        horizon_base = "ts_1" if M is not None else first_col
        cond = cond & (
            F.col("__et") <= F.col(horizon_base) + _within_expr(within)
        )
    j = A.join(el, cond)
    agg = j.groupBy(*carried).agg(
        F.min(F.struct(F.col("__ep").alias("p"), F.col("__et").alias("t"))).alias("__f"),
        F.max(F.struct(F.col("__ep").alias("p"), F.col("__et").alias("t"))).alias("__l"),
        F.count(F.lit(1)).alias("__n"),
    )
    if M is None:
        out = A.join(agg, carried, "left").select(
            *[c for c in carried if c != "__p"],
            F.coalesce(F.col("__l.t"), F.col(first_col)).alias(last_out),
            (F.lit(1) + F.coalesce(F.col("__n"), F.lit(0))).alias(n_col),
            F.coalesce(F.col("__l.p"), F.col(first_pos)).alias("__p"),
        )
    else:
        out = agg.select(
            *[c for c in carried if c != "__p"],
            F.col("__f.t").alias(first_col),
            F.col("__f.p").alias(first_pos),
            F.col("__l.t").alias(last_out),
            (F.col("__n")).alias(n_col),
            F.col("__l.p").alias("__p"),
        )
    return out.drop("__stopp") if s.until is not None else out


def attach_event_payload(
    matches: DataFrame,
    events: DataFrame,
    step_cols: list[str],
    key_col: str = "user_id",
    time_col: str = "ts",
    payload_cols: list[str] | None = None,
    sep: str = "_",
) -> DataFrame:
    """Flink CEP ``select()`` payload access (r7): ``match_pattern``
    captures step TIMESTAMPS; this helper joins each requested step
    column back to the event stream to attach the matched events'
    payload columns, named ``<step_col><sep><payload_col>``
    (``ts_2_value``…). One co-partitioned (key, time) equi-join per
    requested step — all joins share the key partitioning, no
    cross-join, so cost is #steps × one hash join.

    LEFT joins, so an absent optional step's NULL timestamp simply
    yields NULL payloads. Events must be unique per (key, time) for a
    1:1 attach (the fixture doctrine — equal-timestamp duplicates fan
    out, same caveat as every time-keyed join; dedup first if needed).
    """
    payload_cols = payload_cols or [
        c for c in events.columns if c not in (key_col, time_col)
    ]
    # ONE canonical side projection shared by every step's join: with
    # per-step output aliases baked into the side (the pre-r8 shape),
    # each join's build subplan differed and Spark shuffled the events
    # once PER STEP; with a byte-identical side, every join after the
    # first is a ReusedExchange (late-r8 — measured on the
    # two-payload-measure MATCH_RECOGNIZE headline: the second attach
    # join's shuffle disappears from the plan). Output columns are
    # renamed to ``<step_col><sep><payload_col>`` right after each
    # join, before the next one would collide.
    side = events.select(
        F.col(key_col).alias("__pk"),
        F.col(time_col).alias("__pt"),
        *[F.col(c).alias(f"__pv{i}") for i, c in enumerate(payload_cols)],
    )
    out = matches
    for sc in step_cols:
        if sc not in matches.columns:
            raise ValueError(f"step column {sc!r} not in matches")
        out = out.join(
            side,
            (out[key_col] == side["__pk"]) & (out[sc] == side["__pt"]),
            "left",
        ).drop("__pk", "__pt")
        for i, c in enumerate(payload_cols):
            out = out.withColumnRenamed(f"__pv{i}", f"{sc}{sep}{c}")
    return out
