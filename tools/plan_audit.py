#!/usr/bin/env python
"""Capture `.explain("formatted")` for every registry query and audit
plan shape (optimization round instrument — guide §1/§7.2).

Writes ``plans/<tag>/<query>_<suffix>.txt`` per query plus one summary
line each to stdout: Exchange count, join strategies, Python-eval nodes
(BatchEvalPython / ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas),
whether the scan shows PushedFilters, and scan ReadSchema width. Explain
is planning-only (initial AQE plan, ``isFinalPlan=false``) — queries
that run eager setup actions (centroid collects, index builds) do pay
those, so the capture runs each query builder once.

Usage::

    python tools/plan_audit.py [--tag r13] [--suffix before] [--only a,b]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_note_spark.queries import QUERIES  # noqa: E402
from flink_note_spark.session import get_spark  # noqa: E402


def plan_string(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def audit(plan: str) -> dict:
    ex = len(re.findall(r"\bExchange\b", plan.split("== Physical Plan ==")[-1]
                        .split("===== Subqueries =====")[0]))
    ex_all = len(re.findall(r"\(\d+\) Exchange", plan))
    joins = sorted(set(re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
    pyeval = sorted(set(re.findall(
        r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
        r"FlatMapGroupsInPandas|AggregateInPandas|PythonMapInArrow|"
        r"FlatMapGroupsInPandasWithState)", plan)))
    pushed = bool(re.search(r"PushedFilters: \[[^\]]", plan))
    scans = len(re.findall(r"Scan parquet", plan))
    widths = [len(s.split(",")) for s in re.findall(
        r"ReadSchema: struct<([^>]*)>", plan)]
    return {
        "exchanges": ex_all or ex,
        "joins": joins,
        "python": pyeval,
        "pushed_filters": pushed,
        "parquet_scans": scans,
        "read_widths": widths,
    }


def main() -> int:
    argv = sys.argv[1:]
    tag = argv[argv.index("--tag") + 1] if "--tag" in argv else "r13"
    suffix = argv[argv.index("--suffix") + 1] if "--suffix" in argv else "before"
    only = (argv[argv.index("--only") + 1].split(",")
            if "--only" in argv else None)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    summary = {}
    for name in sorted(QUERIES):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = plan_string(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
            summary[name] = {"error": f"{type(e).__name__}: {e}"}
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        a = audit(plan)
        summary[name] = a
        print(f"{name}: ex={a['exchanges']} joins={a['joins']} "
              f"py={a['python']} pushed={a['pushed_filters']} "
              f"scans={a['parquet_scans']} widths={a['read_widths']} "
              f"({time.time()-t0:.1f}s)", flush=True)
    with open(os.path.join(out_dir, f"_audit_{suffix}.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
