"""Golden end-to-end snapshots (SURVEY.md §5.2): small, eyeball-able
query outputs at sf0.001 checked into the repo (`tests/golden/*.csv`).

These catch silent drift the differential suite can't — e.g. a bug
introduced symmetrically into a query AND its oracle SQL would still
hash-match DuckDB, but not the frozen snapshot.

Regenerate deliberately (after verifying a semantic change) with the
snippet in this file's git history / `tests/golden/README` pattern:
run the query at sf0.001, sort columns by name then rows by all
columns, write CSV.
"""

from __future__ import annotations

import pathlib

import pandas as pd
import pytest

from flink_note_spark.queries import QUERIES

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
GOLDEN = sorted(p.stem for p in GOLDEN_DIR.glob("*.csv"))


@pytest.mark.parametrize("name", GOLDEN)
def test_golden_snapshot(name, spark):
    got = QUERIES[name](spark, "/root/testdata/sf0.001").toPandas()
    got = got[sorted(got.columns)]
    got = got.sort_values(by=list(got.columns), ignore_index=True, na_position="first")
    # Spark object columns carry None where the CSV round-trip has NaN;
    # pandas will soon treat those as not-matching — normalize first
    got = got.where(got.notna(), other=float("nan"))
    want = pd.read_csv(GOLDEN_DIR / f"{name}.csv")
    assert list(got.columns) == list(want.columns), name
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype(got.dtypes.to_dict()),
        check_dtype=False,
        obj=name,
    )


def test_golden_set_is_nonempty():
    assert len(GOLDEN) >= 5
