"""Scale-layout operator tests: bucketed co-located joins (zero-exchange
plan) and skew-salting correctness (SURVEY.md §7.3 watch list).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from flink_note_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from flink_note_spark.plans.inspect import shuffle_count
from flink_note_spark.session import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the same key/count join WITHOUT any
    shuffle: the exchange was paid once at write time — the co-located
    join that makes repeated fact⋈fact joins affordable at 100 TB."""
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{suffix}", f"or_b_{suffix}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(
        li, lt, buckets=8, keys=["l_orderkey"], sort_cols=["l_orderkey"],
        path=str(tmp_path / lt),
    )
    write_bucketed(
        o, rt, buckets=8, keys=["l_orderkey"], sort_cols=["l_orderkey"],
        path=str(tmp_path / rt),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on=["l_orderkey"])
        assert shuffle_count(joined) == 0, "bucketed join still shuffles"
        # and it's still correct
        expect = li.join(o, "l_orderkey").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change results: every (lineitem, orders) match
    survives exactly once, including under a deliberately skewed key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        # collapse most keys onto one hot key to simulate skew
        F.when(F.col("l_orderkey") % 4 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_quantity",
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(0))
        .otherwise(F.col("o_orderkey"))
        .alias("k"),
        "o_totalprice",
    )
    plain = li.join(o, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2).alias("s"),
    ).collect()[0]
    salted = salted_join(li, o, on="k", salt_buckets=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2).alias("s"),
    ).collect()[0]
    assert salted.n == plain.n
    assert salted.s == plain.s


def test_salt_is_repartition_stable(spark, sf_dir):
    """The salt is a pure function of row content — the SAME row must
    get the SAME salt regardless of partition layout (F.rand-based
    salting fails this: its draw depends on partition id and row
    order, so retries/AQE re-plans reshuffle rows between reducers)."""
    from flink_note_spark.operators.scale import _row_salt

    df = spark.range(5000).select(
        F.col("id"),
        F.lit(0).alias("hot_key"),  # everyone shares one join key
        (F.col("id") % 97).alias("payload"),
    )
    cols = ["id", "hot_key", "payload"]

    def salts(d):
        return {
            r.id: r.s
            for r in d.withColumn("s", _row_salt(cols, 16, seed=42)).collect()
        }

    a = salts(df)
    b = salts(df.repartition(7, "payload"))
    c = salts(df.repartition(3))
    assert a == b == c
    # and it actually spreads: a hot key's rows cover many salt buckets
    import collections

    spread = collections.Counter(a.values())
    assert len(spread) == 16


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (9, "z")], "k long, lv string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, rv double")
    out = salted_join(left, right, on="k", how="left", salt_buckets=4)
    rows = {(r.k, r.lv, r.rv) for r in out.collect()}
    assert rows == {(1, "a", 10.0), (2, "b", 20.0), (9, "z", None)}


def test_minhash_index_probe_shuffles_only_the_increment(
    spark, sf_dir, tmp_path
):
    """The persisted MinHash index's probe join (r10): the INDEX side
    of the (band_id, band_key) candidate join is the bucketed table —
    its exchange was paid once at save time, so the probe plan carries
    strictly fewer Exchanges than the same pipeline over an unbuilt
    (in-session) index, and the pair set is identical. Also the
    save → load round-trip contract: params travel via the meta table,
    so the increment hashes with the index's signature family."""
    import uuid

    from flink_note_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
        minhash_index_load,
        minhash_index_save,
    )

    suffix = uuid.uuid4().hex[:8]
    table = f"mh_idx_{suffix}"
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    inc = d.filter(F.col("doc_id") % 5 == 0)
    minhash_index_save(
        minhash_index_build(corpus, ids_unique=True), table,
        buckets=8, path=str(tmp_path / table),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = minhash_index_load(spark, table)
        assert idx.params["num_hashes"] == 32 and idx.params["bands"] == 8
        pairs = dedup_against_index(
            inc, idx, threshold=0.4, ids_unique=True
        )
        raw_pairs = dedup_against_index(
            inc, minhash_index_build(corpus, ids_unique=True),
            threshold=0.4, ids_unique=True,
        )
        # bucketing must save at least the index-side probe exchange
        assert shuffle_count(pairs) < shuffle_count(raw_pairs), (
            shuffle_count(pairs), shuffle_count(raw_pairs),
        )
        # and the persisted probe is still CORRECT (equals in-session)
        a = sorted((r.d1, r.d2, r.jaccard) for r in pairs.collect())
        b = sorted((r.d1, r.d2, r.jaccard) for r in raw_pairs.collect())
        assert a == b and a
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in (table, f"{table}__docs", f"{table}__meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


# ------------------------------------------------------------------ r10:
# Z-order layout — Morton bit math + the quantitative locality payoff


def test_zorder_value_known_morton_codes(spark):
    """Hand-computed 2-bit Morton codes on a 4×4 grid (col 0 on even
    bits, col 1 on odd bits, LSB-first)."""
    from flink_note_spark.operators.layout import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (3, 2), (1, 1), (3, 3)], "x long, y long"
    )
    z = zorder_value(["x", "y"], {"x": 0, "y": 0}, {"x": 3, "y": 3}, bits=2)
    got = [r["z"] for r in df.select(z.alias("z")).collect()]
    # (3,2): x=0b11,y=0b10 -> 1<<0 | 0<<1 | 1<<2 | 1<<3 = 13
    # (1,1): 1<<0 | 1<<1 = 3 ; (3,3)=15 ; (0,0)=0
    assert got == [0, 13, 3, 15]


def test_zorder_nulls_cluster_at_origin(spark):
    from flink_note_spark.operators.layout import zorder_value

    df = spark.createDataFrame([(None, 3), (0, 3)], "x long, y long")
    z = zorder_value(["x", "y"], {"x": 0, "y": 0}, {"x": 3, "y": 3}, bits=2)
    a, b = [r["z"] for r in df.select(z.alias("z")).collect()]
    assert a == b  # NULL normalizes to the column minimum


def test_zorder_refusals(spark):
    import pytest as _pt

    from flink_note_spark.operators.layout import (
        with_zorder,
        zorder_value,
    )

    with _pt.raises(ValueError, match="non-empty"):
        zorder_value([], {}, {}, bits=4)
    with _pt.raises(ValueError, match="signed long"):
        zorder_value(["a", "b"], {"a": 0, "b": 0}, {"a": 1, "b": 1}, bits=32)
    with _pt.raises(ValueError, match="too wide"):
        zorder_value(["a"], {"a": 0}, {"a": 1 << 60}, bits=16)
    df = spark.createDataFrame([(None,)], "a long")
    with _pt.raises(ValueError, match="all-NULL"):
        with_zorder(df, ["a"])


def test_zorder_is_pure_expression_no_shuffle(spark, sf_dir):
    """Attaching the z-value adds NO exchange beyond the one-row
    min/max agg (which runs eagerly at build time)."""
    from flink_note_spark.operators.layout import with_zorder

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("c1"),
        F.col("o_orderkey").cast("long").alias("c2"),
    )
    plan = (
        with_zorder(o, ["c1", "c2"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_zorder_locality_beats_single_column_sort(spark, sf_dir):
    """The data-skipping contract, measured: range-partitioning on the
    z-value bounds BOTH columns' per-partition normalized spans, while
    a single-column sort leaves the second column's span at ~1.0 per
    partition. Mean span-sum must be strictly better."""
    from flink_note_spark.operators.layout import zorder_repartition

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("c1"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("c2"),
    )
    bounds = o.agg(
        F.min("c1"), F.max("c1"), F.min("c2"), F.max("c2")
    ).collect()[0]
    r1 = max(1, bounds[1] - bounds[0])
    r2 = max(1, bounds[3] - bounds[2])

    def mean_span_sum(df):
        spans = (
            df.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .agg(
                (F.max("c1") - F.min("c1")).alias("s1"),
                (F.max("c2") - F.min("c2")).alias("s2"),
            )
            .agg(F.avg(F.col("s1") / r1 + F.col("s2") / r2))
            .collect()[0][0]
        )
        return spans

    z = mean_span_sum(zorder_repartition(o, ["c1", "c2"], num_partitions=8))
    single = mean_span_sum(
        o.repartitionByRange(8, "c1").sortWithinPartitions("c1")
    )
    # 8 z-range pieces fix the top 3 interleaved bits -> each column's
    # span is bounded (~0.5 + ~0.25); the single sort leaves c2 at ~1.0
    assert z < 1.0
    assert single > 1.0
    assert z < single


def test_manifest_stats_and_pruned_read_equals_filter(spark, sf_dir, tmp_path):
    """write_with_stats manifests are true per-file bounds, and
    pruned_read == plain filtered read (pruning is performance, never
    correctness)."""
    from flink_note_spark.operators.layout import (
        pruned_read,
        read_manifest,
        write_with_stats,
        zorder_repartition,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_custkey").cast("long").alias("c1"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("c2"),
    )
    path = str(tmp_path / "zt")
    write_with_stats(
        zorder_repartition(o, ["c1", "c2"], num_partitions=8),
        path, ["c1", "c2"],
    )
    man = read_manifest(spark, path)
    assert man.count() == 8
    assert man.agg(F.sum("n_rows")).collect()[0][0] == o.count()
    # manifest bounds are TRUE bounds
    chk = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), "c1")
        .groupBy("file").agg(F.min("c1").alias("m"), F.max("c1").alias("x"))
        .join(man, "file")
    )
    bad = chk.filter(
        (F.col("m") != F.col("c1__min")) | (F.col("x") != F.col("c1__max"))
    ).count()
    assert bad == 0

    bounds = o.agg(F.min("c1"), F.max("c1"), F.min("c2"), F.max("c2")).collect()[0]
    for col, lo, hi in (
        ("c1", bounds[0], bounds[0] + (bounds[1] - bounds[0]) // 8),
        ("c2", bounds[2], bounds[2] + (bounds[3] - bounds[2]) // 8),
    ):
        rep: dict = {}
        got = pruned_read(spark, path, {col: (lo, hi)}, report=rep)
        want = spark.read.parquet(path).filter(
            (F.col(col) >= lo) & (F.col(col) <= hi)
        )
        assert sorted(r.k for r in got.collect()) == sorted(
            r.k for r in want.collect()
        )
        # a selective range on EITHER z-ordered column skips files
        assert rep["files_kept"] < rep["files_total"], (col, rep)


def test_zorder_layout_prunes_both_dims_single_sort_does_not(
    spark, sf_dir, tmp_path
):
    """The end-to-end skip-rate payoff: on the SECOND dimension a
    z-ordered table prunes files; a c1-sorted table reads everything."""
    from flink_note_spark.operators.layout import (
        pruned_read,
        write_with_stats,
        zorder_repartition,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("c1"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("c2"),
    )
    zp = str(tmp_path / "z")
    sp = str(tmp_path / "s")
    write_with_stats(
        zorder_repartition(o, ["c1", "c2"], num_partitions=8), zp, ["c1", "c2"]
    )
    write_with_stats(
        o.repartitionByRange(8, "c1").sortWithinPartitions("c1"), sp, ["c1", "c2"]
    )
    b = o.agg(F.min("c2"), F.max("c2")).collect()[0]
    rng = {"c2": (b[0], b[0] + (b[1] - b[0]) // 8)}
    rz: dict = {}
    rs: dict = {}
    pruned_read(spark, zp, rng, report=rz).count()
    pruned_read(spark, sp, rng, report=rs).count()
    assert rz["files_kept"] < rz["files_total"]
    assert rs["files_kept"] == rs["files_total"]  # c1 sort can't skip on c2
    assert rz["files_kept"] < rs["files_kept"]
