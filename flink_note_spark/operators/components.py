"""Connected components over near-duplicate pair lists, and the cluster
collapse that turns pairwise dedup output into a deduplicated corpus.

The pairwise operators (``jaccard_pairs``, ``minhash_lsh_pairs``,
``simhash_pairs``, ``embedding_near_dup_pairs``) emit EDGES; an actual
dedup pass must group transitively-connected documents (A~B, B~C ⇒
{A,B,C} even when A~C was never scored) and keep one representative per
group. That grouping is connected components — the standard last stage
of a large-scale training-data dedup pipeline.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public
literature). Both steps are plain keyed aggregations + joins, so each
round is a constant number of shuffles on the edge list and the round
count is O(log n) for any graph — unlike naive min-label flooding,
whose round count is the component DIAMETER (a 100 TB boilerplate
chain can be millions of hops deep; log₂ of even a trillion nodes
is 40). Per-round frames are ``localCheckpoint``-materialized to
truncate lineage — without that, iterative Spark plans grow without
bound and re-execute every prior round at each action.

Reference anchor: the notes' runtime executes arbitrary iterative
dataflows by resubmitting jobs from the client loop
(``ExecutionEnviromentreadTextFile创建DataSource分析.md:545-574``,
execute → executeAsync per job); the Spark-first rendering is exactly
this driver-side loop over lazy DataFrame rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round over an undirected edge list
    held as canonical (big, small) pairs with ``src > dst``."""
    # --- large-star ---------------------------------------------------
    # Emit both directions; for each center u, m = min(N(u) ∪ {u});
    # connect every STRICTLY LARGER neighbor v > u to m.
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    with_min = (
        sym.groupBy("src")
        .agg(F.least(F.min("dst"), F.col("src")).alias("m"))
    )
    large = (
        sym.join(with_min, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # --- small-star ---------------------------------------------------
    # Orient every edge (big → small); for each center u, m = min of its
    # smaller-or-equal neighborhood ∪ itself; connect u and all those
    # neighbors to m.
    oriented = large.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    smin = (
        oriented.groupBy("src")
        .agg(F.least(F.min("dst"), F.col("src")).alias("m"))
    )
    joined = oriented.join(smin, "src")
    small = (
        joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(joined.select(F.col("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return small.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )


def connected_components(
    pairs: DataFrame,
    left: str = "d1",
    right: str = "d2",
    max_rounds: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by ``pairs``.

    Returns ``(id, component)`` with one row per node APPEARING IN
    ``pairs`` — singleton documents never enter the edge list and are
    handled by the caller (:func:`canonical_docs` keeps them
    unconditionally). ``component`` is the smallest node id in the
    component, giving a deterministic, join-friendly cluster key.

    Convergence is checked by edge-set fixpoint: the star rounds only
    ever REWRITE edges toward smaller representatives, so the edge list
    is stable exactly when every node points at its component minimum
    (a two-long checksum comparison per round, not a full diff).
    ``max_rounds`` is a defensive bound — O(log n) rounds suffice, so
    25 covers any graph this engine will meet; hitting the bound raises
    rather than returning a silently-unfinished clustering.
    """
    edges = (
        pairs.select(
            F.greatest(F.col(left), F.col(right)).alias("src"),
            F.least(F.col(left), F.col(right)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if not edges.take(1):
        id_type = dict(pairs.dtypes)[left]
        return pairs.sparkSession.createDataFrame(
            [], f"id {id_type}, component {id_type}"
        )

    def _sig(e: DataFrame) -> tuple[int, int]:
        # bit_xor: order-insensitive set checksum with no overflow (ANSI
        # mode makes a long SUM of hashes throw on overflow).
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(edges)
    for _ in range(max_rounds):
        edges = _star_round(edges).localCheckpoint(eager=True)
        new_sig = _sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # Fixpoint edges form a star forest: (member, component_min). The
    # minima themselves get a self-row so every participating node has
    # exactly one output row.
    members = edges.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = edges.select(F.col("dst").alias("id"), F.col("dst").alias("component"))
    return members.union(roots).distinct()


def dedup_clusters(
    pairs: DataFrame, left: str = "d1", right: str = "d2"
) -> DataFrame:
    """Alias of :func:`connected_components` under the pipeline's
    vocabulary: near-dup pair list → ``(id, cluster_id)``."""
    return connected_components(pairs, left, right).select(
        "id", F.col("component").alias("cluster_id")
    )


def canonical_docs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left: str = "d1",
    right: str = "d2",
    keep_by: "str | Column | None" = None,
) -> DataFrame:
    """Collapse a corpus to one representative per near-dup cluster.

    Keeps every document that is either (a) not part of any pair —
    singletons never enter the edge list — or (b) its cluster's
    representative. The default representative is the smallest id
    (matching ``exact_dedup``'s ``keep = min(id)`` convention); the
    non-representative member set is exactly
    ``components.id != components.component``, removed with one
    anti-join. AQE broadcasts it when small, and at 100 TB the
    anti-join shuffles only (id) pairs, never document payloads.

    ``keep_by`` (r9) selects the representative by MERIT instead: the
    cluster member maximizing the given expression (a column name or
    Column over ``df`` — e.g. a quality score or ``F.length("text")``),
    ties broken by the smallest id. Cost: one extra (id, metric)
    projection joined to the component map and one window pass over
    clusters — ids and one metric column shuffle, never payloads
    (cluster sizes are near-dup groups, bounded in practice by the
    dedup family's flood caps upstream).
    """
    comp = connected_components(pairs, left, right)
    if keep_by is None:
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        return df.join(losers, id_col, "left_anti")
    metric = F.col(keep_by) if isinstance(keep_by, str) else keep_by
    scored = df.select(
        F.col(id_col).alias("id"), metric.alias("__m")
    ).join(comp, "id")
    w = Window.partitionBy("component").orderBy(
        F.col("__m").desc_nulls_last(), F.col("id").asc()
    )
    losers = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
