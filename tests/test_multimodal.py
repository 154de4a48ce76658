"""Multimodal operator tests (SURVEY.md §2.2 "Multimodal columns"):
decode / feature-extract / resize / frame-sample plumbing over opaque
binary columns — schema, determinism, batch shape, and fan-out are the
contract; the codec itself is the documented environment stub.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_note_spark.operators.multimodal import (
    attach_binary_column,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_video_frames,
)
from flink_note_spark.session import load_table


def _docs_with_payload(spark, sf_dir, n=50):
    d = load_table(spark, sf_dir, "documents").limit(n)
    return attach_binary_column(d, "text", "payload").withColumnRenamed(
        "doc_id", "id"
    )


def test_image_features_deterministic(spark, sf_dir):
    b = _docs_with_payload(spark, sf_dir)
    f1 = extract_image_features(b).orderBy("id").collect()
    f2 = extract_image_features(b).orderBy("id").collect()
    assert f1 == f2
    assert all(r.ok and r.n_bytes > 0 and r.width >= 64 for r in f1)


def test_resize_constant_output_size(spark, sf_dir):
    b = _docs_with_payload(spark, sf_dir)
    out = resize_images(b, target_w=8, target_h=8).collect()
    assert all(len(r.thumb) == 64 for r in out if r.ok)
    assert all(r.thumb_w == 8 and r.thumb_h == 8 for r in out)
    # deterministic
    again = resize_images(b, target_w=8, target_h=8).collect()
    assert sorted(r.thumb for r in out) == sorted(r.thumb for r in again)


def test_audio_features_duration_scales_with_bytes(spark):
    df = spark.createDataFrame(
        [(1, b"\x80" * 160), (2, b"\x00" * 320), (3, None)],
        "id long, payload binary",
    )
    rows = {r.id: r for r in extract_audio_features(df, bytes_per_ms=16).collect()}
    assert rows[1].est_duration_ms == 10
    assert rows[2].est_duration_ms == 20
    assert rows[1].rms == 0.0          # constant 0x80 = silence around center
    assert rows[2].rms == 128.0        # constant 0x00 = max deviation
    assert not rows[3].ok and rows[3].n_bytes == 0


def test_video_frame_fanout(spark, sf_dir):
    b = _docs_with_payload(spark, sf_dir, n=10)
    frames = sample_video_frames(b, n_frames=3, frame_interval_ms=500)
    got = frames.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts_ms").alias("mx")
    ).collect()
    assert len(got) == 10
    assert all(r.n == 3 and r.mx == 1000 for r in got)
    # frames differ across indexes but are deterministic per (id, idx)
    two = frames.filter(F.col("id") == got[0].id).orderBy("frame_idx").collect()
    assert two[0].frame != two[1].frame
    again = (
        sample_video_frames(b, n_frames=3, frame_interval_ms=500)
        .filter(F.col("id") == got[0].id)
        .orderBy("frame_idx")
        .collect()
    )
    assert [r.frame for r in two] == [r.frame for r in again]


def test_blob_column_prunable(spark, sf_dir):
    """Selecting only metadata must not read the payload column — the
    columnar-pruning property that makes binary columns affordable."""
    from flink_note_spark.plans.inspect import scan_columns

    d = load_table(spark, sf_dir, "documents")
    meta_only = d.select("doc_id", "lang")
    cols = scan_columns(meta_only)
    assert "text" not in cols
