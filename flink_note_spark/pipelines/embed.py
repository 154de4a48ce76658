"""Streaming ANN-index maintenance — continuous embedding ingest
accreting a persisted IVF index (r13).

The similarity family's analogue of the corpus intake pipeline
(``pipelines/curate.py``): documents stream through
``prepare_training_corpus_stream`` accreting a MinHash index; their
EMBEDDINGS stream through :func:`ivf_ingest_stream` accreting the
IVF index that serves similarity search / SemDeDup over the same
corpus. Built purely from the operator library
(``operators/similarity.py``) composed under ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_note_spark.pipelines.curate import _fs_exists


def ivf_ingest_stream(
    vectors: DataFrame,
    *,
    checkpoint: str,
    index_table: str,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 2,
    seed: int = 42,
    index_buckets: int = 8,
    trigger: dict | None = None,
):
    """Maintain a persisted IVF index under CONTINUOUS embedding ingest:
    each micro-batch either bootstraps the index (first data ever —
    train on the batch, ``ivf_save`` bucketed on ``cell_id`` at
    ``index_path``) or accretes into it (``ivf_index_append`` with
    ``on_conflict="skip"`` — assignment against the SAVED centroids,
    one Arrow pass over the batch, bucketed file append; the existing
    corpus is never rescanned or reshuffled). Returns the started
    ``StreamingQuery``; read the index back any time with
    ``ivf_load``/``ivf_index_register``.

    Exactly-once WITHOUT an epoch log: appends are the only writes and
    the skip-mode presence guard (a column-pruned, shuffle-free scan of
    the index's id column against the broadcast batch ids) makes every
    batch idempotent — a crash-replayed micro-batch re-appends only the
    ids its first attempt did not land, so retries CONVERGE rather than
    duplicate (pinned in tests/test_pipeline.py). The same guard also
    skips re-ingested ids arriving in genuinely new batches — ingest
    semantics are first-write-wins by id, matching the corpus
    pipeline's ownership rule. In-batch duplicate ids keep one
    arbitrary row (``dropDuplicates``) — dedup upstream if the choice
    matters.

    Bootstrap caveat (the honest streaming analogue of
    ``ivf_index_append``'s fixed-centroid drift note): centroids are
    trained on the FIRST non-empty batch only and stay fixed across
    all later batches. Partial-probe recall therefore reflects how
    well the first batch sampled the eventual distribution; schedule
    ``ivf_index_rebuild`` offline (the ``compact_corpus_output``
    discipline) to retrain from the accreted corpus — it is not
    concurrent-safe against a live stream, so run it while the query
    is stopped. A fresh session resuming over existing state
    re-registers the bucketed layout from ``index_path`` instead of
    clobbering it (``ivf_index_register`` — the ``_ingest`` fresh-
    session rule; presence probed via the Hadoop FS API, so remote
    state paths work).

    100 TB posture: per-epoch work is one Arrow assignment pass +
    bucketed write, both O(batch); the presence guard reads one id
    column (no shuffle); the index side of every future query join
    stays co-located by the bucketed layout. Probe:
    ``tools/scale_probe.py --only ivf_lifecycle`` (1.01x at 8x,
    1.35x at 32x — BASELINE.md Round-13).
    """
    from flink_note_spark.operators.similarity import (
        ivf_build,
        ivf_index_append,
        ivf_index_register,
        ivf_save,
    )

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        b = batch.select(id_col, vec_col).dropDuplicates([id_col])
        # meta is ivf_save's LAST write: its presence implies corpus +
        # centroids landed (crash-window rule) — a replay over a
        # partial bootstrap retrains and overwrites instead of
        # appending to a torso.
        have = _fs_exists(spark, f"{index_path}__meta")
        if have and not spark.catalog.tableExists(f"{index_table}__meta"):
            ivf_index_register(spark, index_table, index_path)
        if not have:
            n_rows = b.count()
            if n_rows < n_cells:
                raise ValueError(
                    f"ivf_ingest_stream: the bootstrap batch has "
                    f"{n_rows} distinct vectors but n_cells={n_cells} "
                    "— training would silently produce a smaller index "
                    "(and a tiny batch trains unrepresentative "
                    "centroids anyway); lower n_cells, batch more data "
                    "into the first trigger, or pre-seed the index "
                    "with a batch ivf_build + ivf_save before starting "
                    "the stream"
                )
            idx = ivf_build(
                b, n_cells=n_cells, iters=iters, seed=seed,
                id_col=id_col, vec_col=vec_col,
            )
            ivf_save(idx, index_table, buckets=index_buckets,
                     path=index_path)
        else:
            ivf_index_append(
                b, index_table, id_col=id_col, vec_col=vec_col,
                on_conflict="skip",
            )

    writer = (
        vectors.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
