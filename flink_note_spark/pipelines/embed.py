"""Streaming ANN-index maintenance — continuous embedding ingest
accreting a persisted IVF / PQ / IVF-PQ index (r13).

The similarity family's analogue of the corpus intake pipeline
(``pipelines/curate.py``): documents stream through
``prepare_training_corpus_stream`` accreting a MinHash index; their
EMBEDDINGS stream through :func:`ivf_ingest_stream` /
:func:`pq_ingest_stream` / :func:`ivfpq_ingest_stream` accreting the
ANN index that serves similarity search / SemDeDup over the same
corpus. Built purely from the operator library
(``operators/similarity.py``) composed under ``foreachBatch``; the
three twins share one core (:func:`_ann_ingest_stream`) because the
lifecycle contract is identical — only the build/save/append verbs and
the bootstrap minimum differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_note_spark.pipelines.curate import _fs_exists

_INGEST_CONTRACT = """Maintain a persisted {KIND} index under CONTINUOUS embedding
    ingest: each micro-batch either bootstraps the index (first data
    ever — train on the batch, save at ``index_path``) or accretes into
    it ({APPEND} with ``on_conflict="skip"`` — one Arrow pass over the
    batch against the SAVED parameters; the existing corpus is never
    rescanned, re-encoded or reshuffled). Returns the started
    ``StreamingQuery``; read the index back any time with
    {LOAD}/{REGISTER}.

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

    Bootstrap caveats: the trained parameters come from the FIRST
    non-empty batch only and stay fixed across all later batches, so
    quality reflects how well that batch sampled the eventual
    distribution — schedule the offline ``*_index_rebuild`` verb to
    retrain from the accreted corpus (NOT concurrent-safe against a
    live stream: run it while the query is stopped); a bootstrap batch
    too small to train the requested geometry refuses loudly instead
    of silently shrinking the index. A fresh session resuming over
    existing state re-registers the persisted layout from
    ``index_path`` instead of clobbering it (presence probed via the
    Hadoop FS API, so remote state paths work).

    100 TB posture: per-epoch work is one Arrow pass + a file append,
    both O(batch); the presence guard reads one id column (no
    shuffle). Probes: ``tools/scale_probe.py --only
    ivf_lifecycle,pq_lifecycle,ivfpq_lifecycle`` (BASELINE.md
    Round-13)."""


def _ann_ingest_stream(
    vectors: DataFrame,
    *,
    checkpoint: str,
    index_table: str,
    index_path: str,
    id_col: str,
    vec_col: str,
    marker_suffix: str,
    min_rows: int,
    min_rows_why: str,
    what: str,
    build_save,
    append,
    register,
    trigger: dict | None,
):
    """Shared foreachBatch core of the three ANN ingest twins — see
    the public wrappers for the full contract. ``marker_suffix`` names
    each save layout's LAST-written side table (``__meta`` for
    IVF/IVF-PQ, ``__codebooks`` for PQ): its presence implies the whole
    save landed (crash-window rule), so a replay over a partial
    bootstrap retrains and overwrites instead of appending to a
    torso."""

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        b = batch.select(id_col, vec_col).dropDuplicates([id_col])
        have = _fs_exists(spark, f"{index_path}{marker_suffix}")
        if have and not spark.catalog.tableExists(
            f"{index_table}{marker_suffix}"
        ):
            register(spark)
        if not have:
            n_rows = b.count()
            if n_rows < min_rows:
                raise ValueError(
                    f"{what}: the bootstrap batch has {n_rows} distinct "
                    f"vectors but {min_rows_why} — training would "
                    "silently produce a smaller index (and a tiny batch "
                    "trains unrepresentative parameters anyway); lower "
                    "the geometry, batch more data into the first "
                    "trigger, or pre-seed the index with a batch build "
                    "+ save before starting the stream"
                )
            build_save(b)
        else:
            append(b)

    writer = (
        vectors.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


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
    from flink_note_spark.operators.similarity import (
        ivf_build,
        ivf_index_append,
        ivf_index_register,
        ivf_save,
    )

    def build_save(b):
        ivf_save(
            ivf_build(b, n_cells=n_cells, iters=iters, seed=seed,
                      id_col=id_col, vec_col=vec_col),
            index_table, buckets=index_buckets, path=index_path,
        )

    return _ann_ingest_stream(
        vectors, checkpoint=checkpoint, index_table=index_table,
        index_path=index_path, id_col=id_col, vec_col=vec_col,
        marker_suffix="__meta", min_rows=n_cells,
        min_rows_why=f"n_cells={n_cells}", what="ivf_ingest_stream",
        build_save=build_save,
        append=lambda b: ivf_index_append(
            b, index_table, id_col=id_col, vec_col=vec_col,
            on_conflict="skip",
        ),
        register=lambda spark: ivf_index_register(
            spark, index_table, index_path
        ),
        trigger=trigger,
    )


ivf_ingest_stream.__doc__ = _INGEST_CONTRACT.format(
    KIND="IVF", APPEND="``ivf_index_append``", LOAD="``ivf_load``",
    REGISTER="``ivf_index_register``",
)


def pq_ingest_stream(
    vectors: DataFrame,
    *,
    checkpoint: str,
    index_table: str,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    seed: int = 42,
    trigger: dict | None = None,
):
    from flink_note_spark.operators.similarity import (
        pq_build,
        pq_index_append,
        pq_index_register,
        pq_save,
    )

    def build_save(b):
        pq_save(
            pq_build(b, m=m, n_codes=n_codes, iters=iters, seed=seed,
                     id_col=id_col, vec_col=vec_col),
            index_table, path=index_path,
        )

    return _ann_ingest_stream(
        vectors, checkpoint=checkpoint, index_table=index_table,
        index_path=index_path, id_col=id_col, vec_col=vec_col,
        marker_suffix="__codebooks", min_rows=n_codes,
        min_rows_why=f"n_codes={n_codes}", what="pq_ingest_stream",
        build_save=build_save,
        append=lambda b: pq_index_append(
            b, index_table, id_col=id_col, vec_col=vec_col,
            on_conflict="skip",
        ),
        register=lambda spark: pq_index_register(
            spark, index_table, index_path
        ),
        trigger=trigger,
    )


pq_ingest_stream.__doc__ = _INGEST_CONTRACT.format(
    KIND="PQ", APPEND="``pq_index_append``", LOAD="``pq_load``",
    REGISTER="``pq_index_register``",
)


def ivfpq_ingest_stream(
    vectors: DataFrame,
    *,
    checkpoint: str,
    index_table: str,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    seed: int = 42,
    index_buckets: int = 8,
    trigger: dict | None = None,
):
    from flink_note_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_index_append,
        ivfpq_index_register,
        ivfpq_save,
    )

    def build_save(b):
        ivfpq_save(
            ivfpq_build(b, n_cells=n_cells, m=m, n_codes=n_codes,
                        iters=iters, seed=seed, id_col=id_col,
                        vec_col=vec_col),
            index_table, buckets=index_buckets, path=index_path,
        )

    return _ann_ingest_stream(
        vectors, checkpoint=checkpoint, index_table=index_table,
        index_path=index_path, id_col=id_col, vec_col=vec_col,
        marker_suffix="__meta", min_rows=max(n_cells, n_codes),
        min_rows_why=f"max(n_cells, n_codes)={max(n_cells, n_codes)}",
        what="ivfpq_ingest_stream",
        build_save=build_save,
        append=lambda b: ivfpq_index_append(
            b, index_table, id_col=id_col, vec_col=vec_col,
            on_conflict="skip",
        ),
        register=lambda spark: ivfpq_index_register(
            spark, index_table, index_path
        ),
        trigger=trigger,
    )


ivfpq_ingest_stream.__doc__ = _INGEST_CONTRACT.format(
    KIND="IVF-PQ", APPEND="``ivfpq_index_append``",
    LOAD="``ivfpq_load``", REGISTER="``ivfpq_index_register``",
)
