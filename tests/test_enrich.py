"""batched_enrich (operators/enrich.py) — the AsyncDataStream analogue:
Arrow-batch enrichment with bounded in-flight concurrency."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

from flink_note_spark.operators.enrich import batched_enrich, _split_ddl_fields

# module-level enrich fns below pickle by REFERENCE by default, and
# executor workers can't import the tests package — ship them by value
# (same guard flink_note_spark/__init__.py applies to the package).
try:
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


#: deterministic stand-in for an external lookup service (must be
#: module-level: the function ships to executor workers by pickle).
def _lookup(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "region": ["emea" if k % 2 else "apac" for k in batch["k"]],
            "score": [k * 10.0 for k in batch["k"]],
        }
    )


def _slow_lookup(batch: pd.DataFrame) -> pd.DataFrame:
    import time

    time.sleep(0.05)
    return _lookup(batch)


def _src(spark, n=20):
    return spark.createDataFrame(
        [(i, f"name{i}") for i in range(n)], "k long, name string"
    )


def _expect(n):
    return sorted(
        (i, f"name{i}", "emea" if i % 2 else "apac", i * 10.0)
        for i in range(n)
    )


def test_enrich_appends_columns(spark):
    out = batched_enrich(_src(spark), _lookup, "region string, score double")
    assert out.columns == ["k", "name", "region", "score"]
    got = sorted(tuple(r) for r in out.collect())
    assert got == _expect(20)


@pytest.mark.parametrize("ordered", [True, False])
def test_enrich_concurrent_matches_serial(spark, ordered):
    out = batched_enrich(
        _src(spark, 40),
        _slow_lookup,
        "region string, score double",
        max_concurrency=4,
        ordered=ordered,
        batch_rows=5,
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == _expect(40)


def test_enrich_ordered_preserves_partition_order(spark):
    df = _src(spark, 30).coalesce(1)
    out = batched_enrich(
        df, _slow_lookup, "region string, score double",
        max_concurrency=3, ordered=True, batch_rows=4,
    )
    ks = [r["k"] for r in out.collect()]
    assert ks == sorted(ks), "orderedWait mode must emit in input order"


def test_enrich_rejects_wrong_length(spark):
    def bad(batch):
        return pd.DataFrame({"region": ["x"], "score": [1.0]})

    out = batched_enrich(_src(spark), bad, "region string, score double")
    with pytest.raises(Exception, match="same-length"):
        out.collect()


def test_enrich_rejects_column_clash(spark):
    with pytest.raises(ValueError, match="collide"):
        batched_enrich(_src(spark), _lookup, "name string")


def test_enrich_rejects_bad_concurrency(spark):
    with pytest.raises(ValueError, match="max_concurrency"):
        batched_enrich(_src(spark), _lookup, "x int", max_concurrency=0)


def test_split_ddl_fields_nested_generics():
    assert _split_ddl_fields("a map<string,int>, b int") == [
        "a map<string,int>",
        " b int",
    ]


def test_split_ddl_fields_parenthesized_types():
    assert _split_ddl_fields("price decimal(10,2), n int") == [
        "price decimal(10,2)",
        " n int",
    ]


def test_enrich_decimal_added_schema(spark):
    import pandas as pd

    def fn(batch):
        return pd.DataFrame({"price": [float(k) for k in batch["k"]]})

    out = batched_enrich(_src(spark, 3), fn, "price decimal(10,2)")
    got = sorted((r["k"], float(r["price"])) for r in out.collect())
    assert got == [(0, 0.0), (1, 1.0), (2, 2.0)]


# --- lookup join with LRU+TTL cache (Flink lookup join, r8) --------------

def _dim_lookup_factory(log_path):
    """A dimension lookup that records every requested key to a file
    (executor-side; local mode shares the filesystem)."""
    def fn(keys: pd.DataFrame) -> pd.DataFrame:
        with open(log_path, "a") as f:
            for k in keys["k"]:
                f.write(f"{int(k)}\n")
        # dimension knows keys < 100 only
        known = keys[keys["k"] < 100]
        return pd.DataFrame(
            {"k": known["k"], "label": [f"L{int(v)}" for v in known["k"]]}
        )
    return fn


def _requested(log_path):
    try:
        with open(log_path) as f:
            return [int(x) for x in f.read().split()]
    except FileNotFoundError:
        return []


def test_lookup_join_left_and_inner(spark, tmp_path):
    from flink_note_spark.operators.enrich import lookup_join

    log = str(tmp_path / "req.log")
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 200)], "id long, k long"
    ).coalesce(1)
    left = lookup_join(
        df, _dim_lookup_factory(log), ["k"], "label string", how="left"
    )
    assert sorted(tuple(r) for r in left.collect()) == [
        (1, 10, "L10"), (2, 20, "L20"), (3, 200, None)
    ]
    inner = lookup_join(
        df, _dim_lookup_factory(log), ["k"], "label string", how="inner"
    )
    assert sorted(tuple(r) for r in inner.collect()) == [
        (1, 10, "L10"), (2, 20, "L20")
    ]


def test_lookup_join_batch_dedup_and_cache(spark, tmp_path):
    """Duplicate keys in a batch are queried once; keys cached from an
    earlier Arrow batch are not re-queried (per-partition LRU)."""
    from flink_note_spark.operators.enrich import lookup_join

    log = str(tmp_path / "req.log")
    rows = [(i, [10, 20, 10, 10, 20, 30][i]) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, k long").coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = lookup_join(
            df, _dim_lookup_factory(log), ["k"], "label string"
        )
        got = sorted(tuple(r) for r in out.collect())
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert got == [
        (0, 10, "L10"), (1, 20, "L20"), (2, 10, "L10"),
        (3, 10, "L10"), (4, 20, "L20"), (5, 30, "L30"),
    ]
    # 3 distinct keys over 6 rows -> exactly 3 service requests
    assert sorted(_requested(log)) == [10, 20, 30]


def test_lookup_join_missing_key_cached(spark, tmp_path):
    """A key absent from the dimension is cached as a miss — it is not
    re-queried every batch (Flink's cache-missing-key default)."""
    from flink_note_spark.operators.enrich import lookup_join

    log = str(tmp_path / "req.log")
    df = spark.createDataFrame(
        [(i, 500) for i in range(6)], "id long, k long"
    ).coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = lookup_join(
            df, _dim_lookup_factory(log), ["k"], "label string"
        )
        assert all(r["label"] is None for r in out.collect())
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert _requested(log) == [500]


def test_lookup_join_ttl_expiry(spark, tmp_path):
    """With a TTL, an entry older than ttl seconds is re-queried —
    the dimension-staleness contract. The clock is injected."""
    from flink_note_spark.operators.enrich import lookup_join

    log = str(tmp_path / "req.log")
    clock_file = str(tmp_path / "clock")

    def fake_now():
        # one tick per call: 0, 6, 12, ... (ttl 5 -> always expired)
        try:
            with open(clock_file) as f:
                t = int(f.read())
        except FileNotFoundError:
            t = 0
        with open(clock_file, "w") as f:
            f.write(str(t + 6))
        return float(t)

    df = spark.createDataFrame(
        [(i, 10) for i in range(6)], "id long, k long"
    ).coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = lookup_join(
            df, _dim_lookup_factory(log), ["k"], "label string",
            cache_ttl_s=5.0, now_fn=fake_now,
        )
        assert all(r["label"] == "L10" for r in out.collect())
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    # 3 batches, each expired -> 3 requests for the same key
    assert _requested(log) == [10, 10, 10]


def test_lookup_join_lru_eviction(spark, tmp_path):
    """cache_max_rows=1: alternating keys evict each other, forcing
    re-query on return."""
    from flink_note_spark.operators.enrich import lookup_join

    log = str(tmp_path / "req.log")
    rows = [(0, 10), (1, 10), (2, 20), (3, 20), (4, 10), (5, 10)]
    df = spark.createDataFrame(rows, "id long, k long").coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = lookup_join(
            df, _dim_lookup_factory(log), ["k"], "label string",
            cache_max_rows=1,
        )
        assert len(out.collect()) == 6
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert _requested(log) == [10, 20, 10]


def test_lookup_join_validation(spark):
    from flink_note_spark.operators.enrich import lookup_join

    df = spark.createDataFrame([(1, 2)], "id long, k long")
    with pytest.raises(ValueError, match="left|inner"):
        lookup_join(df, _lookup, ["k"], "x string", how="full")
    with pytest.raises(ValueError, match="not present"):
        lookup_join(df, _lookup, ["nope"], "x string")
    with pytest.raises(ValueError, match="collide"):
        lookup_join(df, _lookup, ["k"], "id string")
