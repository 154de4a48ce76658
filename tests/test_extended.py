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
    """approx_percentile with accuracy ≥ group size returns the exact
    discrete quantile — the invariant q43's oracle equality rests on."""
    o = load_table(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 1000000)").alias("ap"),
            F.expr(
                "percentile_approx(o_totalprice, 0.5, 1000000)"
            ).alias("pa"),  # alias spelling of the same sketch
        )
        .collect()
    )
    for r in rows:
        assert r.ap == r.pa
