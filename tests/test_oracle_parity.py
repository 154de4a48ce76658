"""Differential testing against DuckDB — mirrors the driver's t2 gate
(SURVEY.md §5.1): every oracle-backed query must match value-for-value.

Also asserts non-oracle queries run and return sane shapes.
"""

from __future__ import annotations

import pytest

from flink_note_spark.queries import ORACLES, QUERIES
from tests.conftest import assert_frames_match


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_non_oracle_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.oracle_sql()) <= set(m.queries())
