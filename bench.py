#!/usr/bin/env python
"""Benchmark harness — driver contract (see repo instructions).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing excludes SparkSession startup and the first warm-up action
(BASELINE.md measurement plan). Each query is forced with a count()-style
action (``df.write`` to noop would also work; count keeps it simple and
still executes the full plan because every query ends in an aggregate,
join, or window — no mere scan whose count Catalyst could shortcut).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from flink_note_spark.queries import QUERIES
from flink_note_spark.session import get_spark

#: Headline set: one per operator family (SURVEY.md §2) — scan+agg, joins,
#: windows, cube, set-ops, JSON, event-time, dedup families, ANN, text.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier",
    "q08_outer_join_agg",
    "q10_range_join",
    "q11_topk_per_group",
    "q12_window_analytics",
    "q13_cube",
    "q16_set_ops",
    "q22_json_extract",
    "q23_tumbling_window",
    "q26_dedup_first_event",
    "q27_asof_join",
    "q29_exact_dedup",
    "q31_minhash_lsh",
    "q33_cosine_topk",
    "q35_text_quality",
    "q39_wordcount",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="flink-note-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM JIT + file listing + parquet footer reads, not timed.
    QUERIES["q01_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
