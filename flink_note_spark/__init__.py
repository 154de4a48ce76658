"""flink_note_spark — a PySpark-native analytics engine.

Re-expresses the capability surface documented by the reference repo
``bookeezhou/flink-note`` (study notes on Apache Flink v1.12 internals —
see SURVEY.md §0) as an idiomatic Spark DataFrame / SQL / Structured
Streaming engine. Nothing here ports Flink's runtime: operator chaining,
scheduling, memory management and RPC (reference
``flink_arch-*.png`` diagrams) are provided by Catalyst/Tungsten and the
Spark scheduler (SURVEY.md §2.3, §4).

Layout
------
- ``session``    — tuned SparkSession factory + table loaders
- ``environment``— Flink-style ``ExecutionEnvironment`` facade (entry-point
  parity: readTextFile / readFile+mode / addSource / addSink / job verbs)
- ``sources``    — batch & streaming (file-watch) sources (reference
  ``ExecutionEnviromentreadTextFile创建DataSource分析.md:3-9`` readFile modes)
- ``operators``  — joins (as-of / range), dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), similarity search, text analysis, multimodal
- ``functions``  — scalar expression helpers (JSON, vectors, time)
- ``streaming``  — event-time windows, watermark dedup, stateful ops
- ``queries``    — the registry driven by ``__spark_entry__`` and bench
"""

import sys as _sys

from flink_note_spark.session import get_spark, load_table, load_tables

# Spark Python workers are separate processes that may not have this repo on
# sys.path (the driver's harness owns the SparkSession and cwd). Any UDF
# defined in this package would otherwise be cloudpickled BY REFERENCE and
# die with ModuleNotFoundError on the worker. Registering the package for
# pickle-by-value makes every closure self-contained (parent-package lookup
# in cloudpickle covers all submodules).
try:  # pragma: no cover - trivial env guard
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - never block import on serializer details
    pass

__all__ = ["get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
