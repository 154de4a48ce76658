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
