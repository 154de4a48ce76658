"""Connected-components clustering over near-dup pair lists.

Differential oracle: a pure-Python union-find (hypothesis drives random
edge lists at it). The Spark implementation must produce identical
cluster assignments with component = min(id) per cluster.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_note_spark.operators.components import (
    canonical_docs,
    connected_components,
    dedup_clusters,
)
from flink_note_spark.operators.dedup import minhash_lsh_pairs


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {node: find(node) for node in parent}


def _spark_components(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    out = connected_components(pairs).collect()
    return {r.id: r.component for r in out}


def test_components_chain_and_island(spark):
    """Transitive closure: A~B, B~C clusters {A,B,C} even though A~C was
    never scored; disjoint pair {4,5} stays its own cluster."""
    got = _spark_components(spark, [(1, 2), (2, 3), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_components_deep_path_converges_fast(spark):
    """A 64-node path is the diameter stress: min-label flooding would
    need 63 rounds, the star algorithm O(log n) — the max_rounds=25
    bound passing IS the O(log) evidence."""
    edges = [(i, i + 1) for i in range(1, 64)]
    got = _spark_components(spark, edges)
    assert got == {i: 1 for i in range(1, 65)}


def test_components_empty_pairs_typed_empty(spark):
    pairs = spark.createDataFrame([], "d1 string, d2 string")
    out = connected_components(pairs)
    assert out.columns == ["id", "component"]
    assert out.count() == 0


def test_components_self_pairs_ignored(spark):
    got = _spark_components(spark, [(7, 7), (1, 2)])
    assert got == {1: 1, 2: 1}


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
def test_components_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    expect = _union_find_components(edges)
    got = _spark_components(spark, edges) if edges else {}
    assert got == expect


def test_dedup_clusters_column_contract(spark):
    pairs = spark.createDataFrame([(10, 20)], "d1 long, d2 long")
    out = dedup_clusters(pairs)
    assert out.columns == ["id", "cluster_id"]
    assert {(r.id, r.cluster_id) for r in out.collect()} == {(10, 10), (20, 10)}


def test_canonical_docs_keeps_singletons_and_minima(spark):
    """End-to-end near-dup collapse: docs 1,2,3 are one cluster (keep 1),
    doc 9 never paired (keep). Non-representatives 2,3 dropped."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "d1 long, d2 long")
    kept = sorted(r.doc_id for r in canonical_docs(docs, pairs).collect())
    assert kept == [1, 9]


def test_canonical_docs_composes_with_minhash(spark):
    """The full pipeline shape: minhash pairs -> components -> collapse.
    Three near-identical docs plus one distinct doc: exactly one of the
    near-dups survives alongside the distinct doc."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, base),
            (8, "completely different text with no overlap at all here yes"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(
        docs, num_hashes=16, bands=8, threshold=0.4, ids_unique=True
    )
    kept = sorted(r.doc_id for r in canonical_docs(docs, pairs).collect())
    assert kept == [1, 8]


def test_components_string_ids(spark):
    pairs = spark.createDataFrame([("b", "a"), ("c", "b")], "d1 string, d2 string")
    out = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert out == {("a", "a"), ("b", "a"), ("c", "a")}


def test_components_plan_has_no_cartesian(spark):
    """Scale guard: every round is keyed aggregation + equi-join — no
    cross join may appear in any round's plan."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "d1 long, d2 long")
    out = connected_components(pairs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_canonical_docs_keep_by_merit(spark):
    """r9 keep_by: the representative is the cluster member maximizing
    the metric (ties -> smallest id); singletons always survive; NULL
    metrics lose to any non-NULL member."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "short", 5),
            (2, "a much longer text", None),   # cluster {1,2,3}
            (3, "mid length", 7),
            (9, "single", 1),                  # singleton
            (20, "tie a", 4),                  # cluster {20, 21}: tie
            (21, "tie b", 4),
        ],
        "doc_id long, text string, quality int",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (20, 21)], "d1 long, d2 long"
    )
    # merit = quality: cluster {1,2,3} -> 3 (quality 7; NULL loses);
    # {20,21} tie on 4 -> smallest id 20
    kept = sorted(
        r.doc_id
        for r in canonical_docs(docs, pairs, keep_by="quality").collect()
    )
    assert kept == [3, 9, 20]
    # merit = text length: {1,2,3} -> 2 (longest text)
    kept = sorted(
        r.doc_id
        for r in canonical_docs(
            docs, pairs, keep_by=F.length("text")
        ).collect()
    )
    assert kept == [2, 9, 20]
    # default stays min-id
    kept = sorted(r.doc_id for r in canonical_docs(docs, pairs).collect())
    assert kept == [1, 9, 20]
