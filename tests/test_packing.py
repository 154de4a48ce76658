"""Sequence packing: budget safety, completeness, oversize isolation,
utilization, and a pure-Python differential for the bin arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_note_spark.operators.packing import pack_sequences, packing_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 900 + 50) for i in range(2000)]  # 50..949 tokens
    return spark.createDataFrame(rows, "doc_id long, n_tokens int").cache()


def test_every_doc_packed_exactly_once(spark, docs):
    packed = pack_sequences(docs, budget=2048)
    assert packed.count() == 2000
    assert packed.select("doc_id").distinct().count() == 2000


def test_no_bin_exceeds_budget(spark, docs):
    packed = pack_sequences(docs, budget=2048)
    over = (
        packed.filter(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("t"))
        .filter(F.col("t") > 2048)
    )
    assert over.count() == 0


def test_oversize_docs_get_solo_flagged_bins(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 5000), (3, 120), (4, 9000)], "doc_id long, n_tokens int"
    )
    packed = pack_sequences(df, budget=1024).collect()
    by_id = {r.doc_id: r for r in packed}
    assert by_id[2].oversize and by_id[4].oversize
    assert not by_id[1].oversize and not by_id[3].oversize
    bins = [r.bin_id for r in packed]
    # oversize docs share their bin with nobody
    for r in packed:
        if r.oversize:
            assert bins.count(r.bin_id) == 1


def test_utilization_reasonable(spark, docs):
    """BFD on uniform-ish doc lengths should fill bins well past half."""
    packed = pack_sequences(docs, budget=2048)
    stats = packing_stats(packed, budget=2048).collect()[0]
    assert stats.n_docs == 2000
    assert stats.fill_ratio > 0.7


def test_bin_ids_unique_across_partitions(spark, docs):
    packed = pack_sequences(docs.repartition(8), budget=2048)
    per_bin_parts = (
        packed.withColumn("pid", F.shiftrightunsigned("bin_id", 32))
        .groupBy("bin_id")
        .agg(F.countDistinct("pid").alias("p"))
        .filter(F.col("p") > 1)
    )
    assert per_bin_parts.count() == 0


def test_single_partition_matches_python_bfd(spark):
    """Differential: one partition → the result must equal a pure-Python
    best-fit-decreasing over the same (desc-sorted, id-tiebroken) order."""
    rows = [(i, t) for i, t in enumerate([500, 300, 300, 200, 700, 100, 90, 1020])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int").coalesce(1)
    got = {
        r.doc_id: r.bin_id - (r.bin_id >> 32 << 32)
        for r in pack_sequences(df, budget=1024, spread=False).collect()
    }

    from bisect import bisect_left, insort

    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    open_bins, n_bins, expect = [], 0, {}
    for did, t in order:
        if t > 1024:
            expect[did] = n_bins
            n_bins += 1
            continue
        i = bisect_left(open_bins, (t, -1))
        if i < len(open_bins):
            cap, b = open_bins.pop(i)
            if cap > t:
                insort(open_bins, (cap - t, b))
            expect[did] = b
        else:
            if 1024 - t > 0:
                insort(open_bins, (1024 - t, n_bins))
            expect[did] = n_bins
            n_bins += 1
    assert got == expect


def test_budget_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_packing_is_shuffle_free(spark, docs):
    """Scale guard: presort is within partitions and the packer is
    mapInPandas — on an already-parallel input the whole operator must
    add no Exchange."""
    plan = (
        pack_sequences(docs, budget=2048)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_packing_spreads_single_partition_input(spark, docs):
    """A one-task input (single-row-group parquet shape) must be spread
    across cores before packing — all slots pack, not one — while the
    BFD invariants (completeness, budget) still hold."""
    one = docs.coalesce(1)
    packed = pack_sequences(one, budget=2048)
    pids = {
        r.p
        for r in packed.select(
            F.shiftrightunsigned("bin_id", 32).alias("p")
        ).distinct().collect()
    }
    assert len(pids) > 1, "input was not spread across partitions"
    assert packed.count() == 2000
    # spread=False keeps the exact input partitioning
    solo = pack_sequences(one, budget=2048, spread=False)
    assert solo.select(F.shiftrightunsigned("bin_id", 32)).distinct().count() == 1


def test_packing_rejects_null_and_negative_tokens(spark):
    bad_null = spark.createDataFrame(
        [(1, 100), (2, None), (3, 50)], "doc_id long, n_tokens int"
    )
    with pytest.raises(Exception, match="NULL 'n_tokens'"):
        pack_sequences(bad_null, budget=1024).collect()
    bad_neg = spark.createDataFrame(
        [(1, 100), (2, -7)], "doc_id long, n_tokens int"
    )
    with pytest.raises(Exception, match="negative 'n_tokens'"):
        pack_sequences(bad_neg, budget=1024).collect()
