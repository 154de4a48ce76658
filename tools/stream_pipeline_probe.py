"""Streaming corpus-pipeline scale probe (r13 — VERDICT r12 #2).

The r12 8× probe (0.99 end-to-end ratio) proved only that the per-epoch
CONSTANT dominates at toy scale. This probe makes the compute visible:
it runs `prepare_training_corpus_stream` at 1× and K× the PER-BATCH
document count (same epoch count, proportionally larger batches — the
"does per-batch cost track batch size" question), collects the per-stage
wall clock between the ingest's action boundaries via the `stage_times`
hook, and prints a table of mean per-epoch stage seconds plus the
K×/1× ratio per stage.

Interpretation contract: a stage whose ratio ≈ K is compute-dominated
(tracks batch size — healthy); ratio ≈ 1 means its per-epoch constant
still dominates at this scale (job-barrier floors, state-dir I/O).
Epoch 0 is excluded from means (no store/index exists yet, so its
stage mix is different by construction).

Usage:
    python tools/stream_pipeline_probe.py [K] [SF_DIR]
defaults: K=8, SF_DIR=$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1.
Runs on local[$SPARK_GRAFT_CPUS or 32]; prints one JSON line last for
machine reading.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


N_EPOCHS = 4
BASE_PER_EPOCH = 600  # 1× batch size (docs per epoch)


def _chunks(spark, docs_df, out_dir, per_epoch, n_epochs):
    """Write id-ordered chunk files with increasing mtimes (the file
    source orders micro-batches by mtime — test-harness doctrine)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = (
        docs_df.orderBy("doc_id").limit(per_epoch * n_epochs)
        .select("doc_id", "text")
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000)))
    )
    pdf = rows.toPandas()
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("ts", pa.timestamp("us")),
    ])
    base = time.time() - 3600
    for e in range(n_epochs):
        part = pdf.iloc[e * per_epoch:(e + 1) * per_epoch]
        p = os.path.join(out_dir, f"c{e:03d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(part, schema=schema,
                                 preserve_index=False),
            p,
        )
        os.utime(p, (base + e, base + e))


def run_once(spark, docs_df, per_epoch, workdir):
    from flink_note_spark.pipelines import prepare_training_corpus_stream

    chunks = os.path.join(workdir, "chunks")
    os.makedirs(chunks)
    _chunks(spark, docs_df, chunks, per_epoch, N_EPOCHS)
    stage_times: list[dict] = []
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks)
    )
    q = prepare_training_corpus_stream(
        stream,
        state_dir=os.path.join(workdir, "state"),
        checkpoint=os.path.join(workdir, "ckpt"),
        index_table=f"probe_idx_{per_epoch}",
        near_dup_threshold=0.7,
        digest_compact_every=2,
        stage_times=stage_times,
    )
    t0 = time.perf_counter()
    q.processAllAvailable()
    q.stop()
    wall = time.perf_counter() - t0
    return stage_times, wall


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = (
        sys.argv[2] if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.showConsoleProgress", "false")
        .appName("stream-pipeline-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    need = BASE_PER_EPOCH * N_EPOCHS * k
    n = docs.count()
    if n < need:
        # replicate with fresh ids — distinct text suffixes keep the
        # replicas from exact-duplicating each other
        reps = need // n + 1
        docs = docs.select("doc_id", "text")
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" replica marker {i}")
                ).alias("text"),
            )
            for i in range(reps)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        docs = out
    results = {}
    for label, per in [("1x", BASE_PER_EPOCH), (f"{k}x", BASE_PER_EPOCH * k)]:
        wd = tempfile.mkdtemp(prefix=f"stream_probe_{label}_")
        try:
            stages, wall = run_once(spark, docs, per, wd)
        finally:
            shutil.rmtree(wd, ignore_errors=True)
        results[label] = {"wall": round(wall, 2), "epochs": stages}
        print(f"-- {label}: {per} docs/epoch, {N_EPOCHS} epochs, "
              f"wall {wall:.1f}s")
        for st in stages:
            print("   ", st)
    keys = ["prep", "digest_join_write", "gates_lsh_probe",
            "index_append", "decontam_split_write"]

    def mean(label, key):
        vals = [e[key] for e in results[label]["epochs"][1:] if key in e]
        return sum(vals) / len(vals) if vals else 0.0

    print(f"\n{'stage':24s} {'1x s/epoch':>11s} {f'{k}x s/epoch':>11s} "
          f"{'ratio':>6s}")
    table = {}
    for key in keys:
        a, b = mean("1x", key), mean(f"{k}x", key)
        r = b / a if a else float("nan")
        table[key] = {"base": round(a, 3), "scaled": round(b, 3),
                      "ratio": round(r, 2)}
        print(f"{key:24s} {a:11.3f} {b:11.3f} {r:6.2f}")
    print(json.dumps({"k": k, "per_epoch_base": BASE_PER_EPOCH,
                      "epochs": N_EPOCHS, "stages": table,
                      "wall": {lbl: results[lbl]["wall"]
                               for lbl in results}}))
    spark.stop()


if __name__ == "__main__":
    main()
