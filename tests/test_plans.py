"""Physical-plan shape assertions (SURVEY.md "optimize for scale";
VERDICT round-1 item 7): regressions in pushdown, broadcast choice or
shuffle count fail CI, not just slow down the bench.
"""

from __future__ import annotations

from flink_note_spark.plans.inspect import (
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    shuffle_count,
)
from flink_note_spark.queries import QUERIES


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    """The shipdate predicate must reach the parquet scan (PushedFilters),
    and the scan must NOT read columns the query never touches."""
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    pushed = pushed_filters(df)
    assert "l_shipdate" in pushed, f"no pushed shipdate filter: {pushed}"
    cols = scan_columns(df)
    assert "l_comment" not in cols, f"unpruned scan reads l_comment: {cols}"


def test_q09_broadcasts_dim(spark, sf_dir):
    """Explicit broadcast hint on the part dim must yield a broadcast
    join — no shuffle of the lineitem fact for the join itself."""
    df = QUERIES["q09_broadcast_join"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_q03_broadcasts_customer(spark, sf_dir):
    """q03 carries NO forced broadcast hint (customer grows with SF —
    VERDICT r2 item 2); at test scale the stats-based planner must still
    choose a broadcast join on its own, proving the hint was redundant."""
    df = QUERIES["q03_shipping_priority"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_no_forced_broadcast_of_sf_scaled_tables():
    """Broadcast hints may target only fixed-size dims (nation/region) —
    never tables that grow with scale factor. Source-level contract check
    so a hint regression fails CI before it melts a 100 TB run."""
    import inspect as _inspect
    import re

    from flink_note_spark.queries import events, extended, llm, relational

    for mod in (relational, events, llm, extended):
        src = _inspect.getsource(mod)
        for m in re.finditer(r"(?<!\.)broadcast\((\w+)\)", src):
            assert m.group(1) in ("n", "r"), (
                f"forced broadcast of SF-scaled table alias {m.group(1)!r} "
                f"in {mod.__name__}"
            )


def test_q27_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join is union + one keyed window: at most 2 exchanges
    (the window shuffle + AQE final coalesce) — never a join explosion."""
    df = QUERIES["q27_asof_join"](spark, sf_dir)
    assert shuffle_count(df) <= 2, f"asof plan shuffles {shuffle_count(df)}×"


def test_q29_exact_dedup_single_shuffle(spark, sf_dir):
    """Exact dedup is one map-side-combinable groupBy on the digest."""
    df = QUERIES["q29_exact_dedup"](spark, sf_dir)
    assert shuffle_count(df) <= 1, f"dedup plan shuffles {shuffle_count(df)}×"


def test_q33_corpus_not_shuffled(spark, sf_dir):
    """Brute-force cosine: the corpus streams through one mapInPandas
    scoring pass emitting only per-partition top-k; the only exchange is
    the (tiny) global top-k window — never a corpus shuffle or cross
    join."""
    df = QUERIES["q33_cosine_topk"](spark, sf_dir)
    assert shuffle_count(df) <= 2, f"q33 shuffles {shuffle_count(df)}×"
    from flink_note_spark.plans.inspect import explain_str

    assert "CartesianProduct" not in explain_str(df, "simple")


def test_q34_srp_lsh_no_cartesian_one_kernel_pass_per_side(spark, sf_dir):
    """SRP-LSH ANN: candidates must meet in a bucket equi-join — no
    CartesianProduct / BroadcastNestedLoop anywhere — and each side's
    bucket assignment must be exactly ONE Arrow kernel pass (the r5
    matmul kernel), not a per-hyperplane expression chain."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q34_lsh_cosine_topk"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("MapInPandas") == 2, plan  # one per joined side


def test_q52_lsh_near_dup_no_cartesian(spark, sf_dir):
    """SRP-LSH embedding near-dup: band self-join only; the corpus-wide
    n² matrix must never appear in the plan."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q52_lsh_embedding_near_dup"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q57_ivf_query_no_cartesian_bounded_shuffles(spark, sf_dir):
    """IVF query path: probe rows meet the assigned corpus in a cell_id
    equi-join; no cross join, and the post-build plan stays within the
    equi-join + top-k window exchange budget."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q57_ivf_exhaustive_topk"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 3, f"ivf query shuffles {shuffle_count(df)}×"


def test_q70_tfidf_total_join_broadcast_no_cartesian(spark, sf_dir):
    """TF-IDF: the one-row corpus total rides in on an EXPLICITLY
    broadcast cross join (r9, VERDICT r8 nit) — the plan must show a
    broadcast nested-loop of the 1-row side, never a CartesianProduct,
    independent of AQE's runtime size estimate."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q70_tfidf_top_terms"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan


def test_q122_semantic_dedup_cell_join_no_cartesian(spark, sf_dir):
    """Semantic dedup (r9): pairs meet in a cell_id equi-join — the
    only nested-loop in the plan is the 8-row broadcast centroid
    cross (explicitly hinted); the corpus-wide n² matrix never
    appears."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q122_semantic_dedup"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan


def test_q73_decontaminate_semi_anti_no_cartesian(spark, sf_dir):
    """Decontamination: benchmark shingles meet the corpus in a shingle
    SEMI-join and ids leave via an ANTI-join — never a cross join, and
    the only Python stages are the two shingle kernels (one per side)."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q73_decontaminate"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert plan.count("MapInPandas") == 2, plan


def test_q70_tfidf_no_text_past_explode(spark, sf_dir):
    """TF-IDF: the scan reads only (doc_id, text); every shuffle carries
    (doc, token) aggregates, so the raw text column must not survive any
    Exchange (no full-text shuffle at 100 TB)."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q70_tfidf_top_terms"](spark, sf_dir)
    cols = scan_columns(df)
    assert "lang" not in cols and "source" not in cols, cols
    plan = explain_str(df, "formatted")
    # hashpartitioning arguments never mention the text column
    assert "hashpartitioning(text" not in plan


def test_q68_cep_strict_single_shuffle(spark, sf_dir):
    """Strict-contiguity CEP is one window pass: exactly one exchange on
    the key (plus the driver-facing orderBy's range exchange)."""
    df = QUERIES["q68_event_pattern"](spark, sf_dir)
    assert shuffle_count(df) <= 2, f"cep strict shuffles {shuffle_count(df)}×"


def test_q86_cep_times_single_shuffle(spark, sf_dir):
    """times(n) is pure lead-chain expansion — the quantifier must add
    ZERO exchanges over the plain strict pattern (one key shuffle + the
    driver-facing orderBy range exchange)."""
    df = QUERIES["q86_cep_times"](spark, sf_dir)
    assert shuffle_count(df) <= 2, f"cep times shuffles {shuffle_count(df)}×"


def test_q89_cep_strict_run_bounded_no_cartesian(spark, sf_dir):
    """The strict greedy-run loop joins segments on (key, position):
    equi-join only (no CartesianProduct / BroadcastNestedLoop), bounded
    exchange count (run metadata windows + one segment join + orderBy)."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q89_cep_strict_run"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert shuffle_count(df) <= 6, f"cep run shuffles {shuffle_count(df)}×"


def test_q88_cep_loop_no_cartesian(spark, sf_dir):
    """The relaxed greedy loop meets elements in a KEY equi-join
    (fan-out = run length), never a cross join."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q88_cep_one_or_more"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_q92_q93_cep_bounded_no_cartesian(spark, sf_dir):
    """The variant-union (optional) and positional mixed engines stay
    equi-join/window-only: no CartesianProduct/BNLJ, bounded exchanges
    (q92: two lead-chain branches + orderBy = 3; q93: row_number pass +
    (key,pos) equi-join + struct-min pass + orderBy = 4)."""
    from flink_note_spark.plans.inspect import explain_str

    for name, budget in (("q92_cep_optional", 4), ("q93_cep_mixed", 5)):
        df = QUERIES[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name
        assert shuffle_count(df) <= budget, (
            f"{name} shuffles {shuffle_count(df)}×"
        )


def test_q94_q96_no_cartesian(spark, sf_dir):
    """PQ's re-rank (shortlist + broadcast query-vector joins) and the
    novelty join stay equi-joins — never a CartesianProduct/BNLJ."""
    from flink_note_spark.plans.inspect import explain_str

    for name in ("q94_pq_exhaustive_topk", "q96_ngram_novelty"):
        df = QUERIES[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name


def test_q98_q99_count_windows_bounded(spark, sf_dir):
    """Count windows are one row_number pass + groupBy (+ orderBy):
    tumbling ≤3 exchanges, sliding adds only the static-fanout explode
    (no extra shuffle), and neither cross-joins."""
    from flink_note_spark.plans.inspect import explain_str

    for name in ("q98_count_window", "q99_sliding_count_window"):
        df = QUERIES[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "CartesianProduct" not in plan, name
        assert shuffle_count(df) <= 3, (
            f"{name} shuffles {shuffle_count(df)}×"
        )


def test_q100_q102_skip_strategies_no_cartesian(spark, sf_dir):
    """The skip-strategy CEP paths stay equi-join/window-only: prefix
    emission replaces the loop group-agg with an ordered window (q100 —
    no extra exchange class), skip_to_next is one more window pass
    (q101), and skip_past_last_event's sequential kernel operates on
    the MATCH set behind one key exchange (q102). Never a
    CartesianProduct/BNLJ."""
    from flink_note_spark.plans.inspect import explain_str

    for name in ("q100_cep_no_skip", "q101_cep_skip_to_next",
                 "q102_cep_skip_past_last"):
        df = QUERIES[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name


def test_q103_temporal_join_bounded_shuffles(spark, sf_dir):
    """union_window temporal join is the asof kernel: tag-union + one
    keyed window (+ final orderBy) — never a join explosion (≤3
    exchanges), no cartesian."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q103_temporal_join"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert shuffle_count(df) <= 3, (
        f"temporal join shuffles {shuffle_count(df)}×"
    )


def test_q104_q105_windowing_bounded_no_cartesian(spark, sf_dir):
    """CUMULATE is a static-fanout explode + ONE groupBy shuffle
    (+ orderBy); the window join is a compound (key, window) equi-join
    — neither may cross-join."""
    from flink_note_spark.plans.inspect import explain_str

    for name, budget in (
        ("q104_cumulate_window", 2),
        ("q105_window_join", 4),
    ):
        df = QUERIES[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name
        assert shuffle_count(df) <= budget, (
            f"{name} shuffles {shuffle_count(df)}×"
        )


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """Directory-layout partitioning must turn an equality filter into a
    PartitionFilter (scan planning skips the other directories) — the
    data-skipping half of the 100 TB write contract, complementing the
    dynamic-overwrite test in test_sources."""
    from pyspark.sql import functions as F

    from flink_note_spark.plans.inspect import explain_str
    from flink_note_spark.sources.files import write_sink

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(100)],
        "id long, grp string, v double",
    )
    out = str(tmp_path / "parts")
    write_sink(df, "parquet", out, partition_by=["grp"])

    q = spark.read.parquet(out).filter(F.col("grp") == "a").select("id")
    plan = explain_str(q, "formatted")
    assert "PartitionFilters" in plan and "grp" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # the partition column never appears as a pushed DATA filter — it was
    # resolved at planning time, not scan time
    assert q.count() == 50


def test_q123_relaxed_payload_single_join(spark, sf_dir):
    """Relaxed CEP payload carry (r10, VERDICT r9 #3): every payload
    measure rides the engine's own aggregates, so the ONLY join in
    the funnel's plan is the loop's element join — the r9 design paid
    one extra co-partitioned attach join per measured step (4 here).
    No cartesian either."""
    import re

    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q123_cep_relaxed_payload"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    joins = re.findall(
        r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"
        r"|BroadcastNestedLoopJoin",
        plan,
    )
    assert len(joins) == 1, (joins, plan)


def test_q124_semantic_pipeline_no_cartesian(spark, sf_dir):
    """Composed semantic corpus prep (r10): the only nested-loop is
    the 8-row broadcast centroid cross (explicitly hinted); pairs meet
    in the cell equi-join, losers leave via anti-joins — the
    corpus-wide n² matrix never appears anywhere in the composed
    plan."""
    from flink_note_spark.plans.inspect import explain_str

    df = QUERIES["q124_semantic_corpus_prep"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan


def test_q157_group_loop_fast_path_plan(spark, sf_dir):
    """The r12 group-loop fast path must stay the output-proportional
    plan: no nested-loop join (the last-iteration lookup is a
    co-partitioned equi-join on (key, computed position)) and a bounded
    shuffle count — two window partitionings + the join, not the
    bound × engine passes the union path pays."""
    df = QUERIES["q157_cep_group_one_or_more"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # windows (pos/leads; islands class; rem) + the equi-join + the
    # final ORDER BY — anything near the union path's count would be
    # an order of magnitude larger
    assert shuffle_count(df) <= 7, f"fast path shuffles {shuffle_count(df)}×"
