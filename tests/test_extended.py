"""Contracts for the extended surface that the SQL oracle cannot express
(tests/test_oracle_parity.py covers the exact-value side of q42–q50).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_note_spark.session import load_table


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """On HIGH-cardinality input (per-status custkeys — outside the
    sparse-exact regime q43 relies on) the HLL++ estimate must stay
    within the default 5% relative standard deviation's practical bound."""
    o = load_table(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey").alias("est"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r.est - r.exact) / max(r.exact, 1)
        assert rel_err < 0.15, (
            f"status {r.o_orderstatus}: estimate {r.est} vs {r.exact} "
            f"(rel err {rel_err:.3f})"
        )


def test_schema_of_json_inference(spark, sf_dir):
    """schema_of_json infers the events.props schema that q45's typed
    from_json parse relies on (SURVEY.md §2.2 JSON surface)."""
    e = load_table(spark, sf_dir, "events")
    sample = e.select("props").first().props
    inferred = spark.range(1).select(
        F.schema_of_json(F.lit(sample)).alias("s")
    ).first().s
    assert "k" in inferred and "INT" in inferred.upper()


def test_approx_percentile_is_exact_under_accuracy(spark, sf_dir):
    """q43's production accuracy (500 000) returns the exact discrete
    quantile on every shipped fixture — the invariant its oracle
    equality rests on. NOTE exactness does NOT follow from accuracy ≥
    group size (the sketch compresses on a buffer multiple): 50k-row
    sf0.1 groups measured approximate at accuracy 64k/100k, exact from
    250k — so this asserts the PRODUCTION setting against the maxed-out
    sketch (10⁶), and must be re-run at sf0.1
    (SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1) whenever the
    accuracy changes."""
    o = load_table(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 500000)").alias("ap"),
            F.expr(
                "percentile_approx(o_totalprice, 0.5, 1000000)"
            ).alias("pa"),  # alias spelling of the same sketch
        )
        .collect()
    )
    for r in rows:
        assert r.ap == r.pa


def test_to_json_roundtrips_minified_props(spark, sf_dir):
    """to_json(from_json(props)) must equal the minified input on every
    event row — the serialize/parse inverse contract. Lives here, not in
    q45's hot path: it is a correctness invariant, not query work
    (VERDICT r2 item 4a moved it out of the bench). Also pins the
    get_json_object single-path pull (functions.scalar.json_int) that
    q22 no longer uses."""
    from flink_note_spark.functions.scalar import json_int

    e = load_table(spark, sf_dir, "events")
    bad = e.select(
        "props",
        F.from_json("props", "k int").alias("pj"),
        json_int("props", "$.k", "k_path"),
    ).filter(
        (F.to_json("pj") != F.regexp_replace("props", " ", ""))
        | (F.col("k_path") != F.col("pj.k"))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_q45_fixture_contract_event_type_json_safe(spark, sf_dir):
    """q45's driver-checked grp_json column is built by Spark's to_json
    but by hand-rolled string concatenation in the DuckDB oracle; the
    two diverge on NULL event_type (Spark omits the field, SQL yields
    NULL) and on embedded double quotes (Spark escapes, SQL does not).
    The oracle therefore encodes a fixture contract — event_type is
    non-null and quote-free — which this test makes explicit so a
    fixture change fails HERE with a message instead of as an opaque
    driver hash mismatch."""
    from flink_note_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    bad = ev.filter(
        F.col("event_type").isNull() | F.col("event_type").contains('"')
    ).count()
    assert bad == 0, (
        "events.event_type now contains NULLs or double quotes - q45's "
        "hand-rolled JSON oracle (queries/extended.py _Q45_SQL) no longer "
        "matches Spark's to_json; rewrite the oracle before trusting q45"
    )
