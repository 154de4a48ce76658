#!/usr/bin/env python
"""Scale probe: measure how the headline operators scale with input size.

Replicates the sf0.1 corpus K× (fresh ids, multi-file parquet so scans
parallelize across cores — unlike the single-row-group driver fixtures)
and times representative operators at 1× and K×. A time ratio well below
K demonstrates that the per-query scheduling floor (BASELINE.md) and
single-file scan serialization dominate the sf0.1 bench numbers — i.e.
the plans are compute-efficient and the overhead amortizes with scale,
which is the 100 TB posture claim made concrete.

Usage: python tools/scale_probe.py [K]   (default K=8; prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from flink_note_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from flink_note_spark.operators.similarity import cosine_topk  # noqa: E402
from flink_note_spark.operators.text import language_id  # noqa: E402
from flink_note_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicate(df, k: int, id_col: str, out_path: str, id_stride: int,
              salt_text: bool = False):
    """K copies with disjoint ids, written as 32 files (parallel scans).

    ``salt_text`` suffixes every WORD with the replica index: documents
    inside one replica keep their near-dup relationships, documents
    across replicas share no shingles — so the near-dup PAIR count grows
    linearly with K, modeling real corpus growth. (Naive replication
    makes every doc an exact duplicate of its K−1 copies, growing pairs
    quadratically — that measures the workload explosion, not the plan.)
    """
    reps = df.crossJoin(
        F.broadcast(
            df.sparkSession.range(k).withColumnRenamed("id", "__rep")
        )
    ).withColumn(id_col, F.col(id_col) + F.col("__rep") * id_stride)
    if salt_text:
        reps = reps.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.col("__rep").cast("string")),
                ),
                " ",
            ),
        )
    reps = reps.drop("__rep")
    reps.repartition(32).write.mode("overwrite").parquet(out_path)
    return out_path


def bench(label, fn, timings, runs=2):
    fn()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    timings[label] = round(best, 3)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scale_probe_")

    docs1 = load_table(spark, SF_DIR, "documents")
    emb1 = load_table(spark, SF_DIR, "embeddings")
    docs_k = spark.read.parquet(
        replicate(docs1, k, "doc_id", f"{tmp}/docs_k", 10_000_000, salt_text=True)
    )
    emb_k = spark.read.parquet(
        replicate(emb1, k, "vec_id", f"{tmp}/emb_k", 10_000_000)
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t: dict[str, float] = {}
    for tag, d, e in (("x1", docs1, emb1), (f"x{k}", docs_k, emb_k)):
        bench(f"exact_dedup_{tag}", lambda d=d: noop(exact_dedup(d, "text", "doc_id")), t)
        bench(
            f"minhash_lsh_{tag}",
            lambda d=d: noop(
                minhash_lsh_pairs(
                    d, "doc_id", "text", n=3, num_hashes=32, bands=8,
                    threshold=0.4, max_df=5000, verify=True,
                )
            ),
            t,
        )
        bench(f"simhash_{tag}", lambda d=d: noop(simhash_pairs(d, "doc_id", "text")), t)
        bench(f"language_id_{tag}", lambda d=d: noop(
            language_id(d, "text").groupBy("lang_pred").count()
        ), t)
        q = e.filter(F.col("vec_id") < 10)
        bench(
            f"cosine_topk_{tag}",
            lambda q=q, e=e: noop(cosine_topk(q, e, k=5)),
            t,
        )

    ratios = {
        op: round(t[f"{op}_x{k}"] / t[f"{op}_x1"], 2)
        for op in ("exact_dedup", "minhash_lsh", "simhash", "language_id", "cosine_topk")
    }
    print(json.dumps({"k": k, "timings_sec": t, "time_ratio_at_kx_data": ratios}))


if __name__ == "__main__":
    main()
