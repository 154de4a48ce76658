"""Multimodal (image/audio/video) column plumbing.

Design (SURVEY.md §2.2 "Multimodal columns"): media payloads are opaque
``binary`` columns accompanied by a typed metadata struct. Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so each task
processes a bounded batch of blobs; partitioning, schema, and batch shape
are real and tested here, while the codec itself is stubbed (no
image/audio libraries in this container — driver environment contract).

At 100 TB the pattern is: keep blobs in their own parquet column chunk
(columnar pruning skips them unless selected), repartition by size before
decode so tasks are even, and emit fixed-schema features, never raw
decoded frames, across a shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Feature schema produced by the (stubbed) image decoder.
IMAGE_FEATURES_SCHEMA = (
    "id long, n_bytes int, format string, width int, height int, ok boolean"
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"GIF8": "gif",
}


def _sniff_format(blob: bytes | None) -> str:
    if not blob:
        return "empty"
    for magic, name in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return name
    return "unknown"


def _decode_image(blob: bytes) -> tuple[int, int]:
    """Real decode requires an imaging library not present in this
    container; deterministic-fake dimensions derive from the payload so
    the full distributed pipeline (schema, batching, joins downstream)
    is exercised end-to-end. Swap this single function for PIL/ffmpeg in
    a real deployment."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_dims(blob: bytes) -> tuple[int, int]:
    h = 0
    for byte in blob[:64]:
        h = (h * 131 + byte) & 0xFFFFFFFF
    return 64 + h % 1024, 64 + (h >> 16) % 1024


def attach_binary_column(
    df: DataFrame, source_col: str, binary_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct from a
    source column (for the fixtures we encode text; for real media this
    is the raw file payload)."""
    blob = F.col(source_col).cast("binary")
    meta = F.struct(
        F.length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("sha256"),
        F.lit("text/plain").alias("mime"),
    )
    return df.withColumn(binary_col, blob).withColumn("media_meta", meta)


def extract_image_features(
    df: DataFrame,
    id_col: str = "id",
    binary_col: str = "payload",
    use_fake_decoder: bool = True,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode-and-featurize over ``mapInPandas`` (Arrow batches).

    ``use_fake_decoder=True`` (default here) uses deterministic fake
    dimensions; ``False`` calls the real decoder stub, which raises
    ``NotImplementedError`` in this container by design.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(binary_col).alias("payload"))
    if batch_partitions:
        # Even out task sizes before the expensive decode stage.
        src = src.repartition(batch_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            n_bytes = blobs.str.len().astype("int64")
            # vectorized magic-byte sniff over the 4-byte prefix column
            prefix = blobs.str[:4]
            fmt = pd.Series("unknown", index=pdf.index, dtype=object)
            fmt[n_bytes == 0] = "empty"
            for magic, name in _MAGIC.items():
                fmt[(n_bytes > 0) & (prefix.str[: len(magic)] == magic)] = name

            if use_fake_decoder:
                # rolling hash of the first 64 bytes, computed as 64
                # whole-batch numpy steps (masked past each blob's end)
                # instead of a per-row Python loop — bit-identical to the
                # scalar _fake_dims.
                n = len(pdf)
                mat = np.zeros((n, 64), dtype=np.uint64)
                for i, b in enumerate(blobs):
                    head = np.frombuffer(b[:64], dtype=np.uint8)
                    mat[i, : len(head)] = head
                lens = np.minimum(n_bytes.to_numpy(), 64)
                h = np.zeros(n, dtype=np.uint64)
                for k in range(64):
                    step = (h * np.uint64(131) + mat[:, k]) & np.uint64(0xFFFFFFFF)
                    h = np.where(k < lens, step, h)
                width = (64 + h % 1024).astype("int64")
                height = (64 + ((h >> np.uint64(16)) % 1024)).astype("int64")
                ok = np.ones(n, dtype=bool)
            else:
                # real codec path — stubbed in this container by contract
                width = np.full(len(pdf), -1, dtype="int64")
                height = np.full(len(pdf), -1, dtype="int64")
                ok = np.zeros(len(pdf), dtype=bool)

            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "format": fmt,
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "ok": ok,
                }
            )

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


#: Schema of :func:`resize_images` output — fixed-size thumbnail payloads.
RESIZED_SCHEMA = "id long, thumb binary, thumb_w int, thumb_h int, ok boolean"


def resize_images(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    id_col: str = "id",
    binary_col: str = "payload",
) -> DataFrame:
    """Image resize over ``mapInPandas``: emits a fixed-size thumbnail
    payload per image. The real decoder/resampler is the same stubbed
    codec seam as :func:`extract_image_features`; the deterministic fake
    derives ``target_w·target_h`` bytes from a rolling hash of the
    source, so downstream schema/size/partitioning behavior (the thing a
    100 TB resize job actually stresses — output is CONSTANT bytes/row
    regardless of input size, so repartition by count not size) is
    exercised end-to-end.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(binary_col).alias("payload"))
    n_out = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            thumbs = []
            oks = []
            for b in pdf["payload"]:
                blob = bytes(b) if b is not None else b""
                if not blob:
                    thumbs.append(b"")
                    oks.append(False)
                    continue
                seed = np.frombuffer(
                    blob[:64].ljust(64, b"\0"), dtype=np.uint8
                ).astype(np.uint64)
                # deterministic pseudo-pixels: tiled rolling mix of the head
                reps = -(-n_out // 64)
                px = (np.tile(seed, reps)[:n_out] * np.uint64(131)
                      + np.arange(n_out, dtype=np.uint64)) & np.uint64(0xFF)
                thumbs.append(px.astype(np.uint8).tobytes())
                oks.append(True)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "thumb": thumbs,
                    "thumb_w": target_w,
                    "thumb_h": target_h,
                    "ok": oks,
                }
            )

    return src.mapInPandas(run, schema=RESIZED_SCHEMA)


#: Schema of :func:`extract_audio_features` output.
AUDIO_FEATURES_SCHEMA = (
    "id long, n_bytes int, est_duration_ms int, rms double, ok boolean"
)


def extract_audio_features(
    df: DataFrame,
    id_col: str = "id",
    binary_col: str = "payload",
    bytes_per_ms: int = 16,
) -> DataFrame:
    """Audio feature extraction plumbing: byte-length duration estimate +
    a deterministic RMS over the raw bytes (stand-in for a real PCM
    decode — same seam, swap for soundfile/ffmpeg in deployment)."""
    src = df.select(F.col(id_col).alias("id"), F.col(binary_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n_bytes, dur, rms, ok = [], [], [], []
            for b in pdf["payload"]:
                blob = bytes(b) if b is not None else b""
                n = len(blob)
                n_bytes.append(n)
                dur.append(n // bytes_per_ms)
                if n:
                    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
                    rms.append(float(np.sqrt(np.mean((arr - 128.0) ** 2))))
                    ok.append(True)
                else:
                    rms.append(0.0)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": n_bytes,
                    "est_duration_ms": dur,
                    "rms": rms,
                    "ok": ok,
                }
            )

    return src.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


#: Schema of :func:`sample_video_frames` output — one ROW PER FRAME.
VIDEO_FRAMES_SCHEMA = "id long, frame_idx int, ts_ms int, frame binary"


def sample_video_frames(
    df: DataFrame,
    n_frames: int = 4,
    frame_interval_ms: int = 1000,
    id_col: str = "id",
    binary_col: str = "payload",
) -> DataFrame:
    """Frame sampling: one input video row fans out to ``n_frames``
    frame rows — the N-out-per-row generator shape (``flatMap``) that
    makes video pipelines explode in volume. Real decode is the stubbed
    codec seam; fake frames are deterministic slices re-hashed per
    index. At 100 TB the operative design is here, not in the codec:
    frames carry (id, frame_idx) so downstream joins/aggregations key on
    the video while the blobs stay columnar-prunable.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(binary_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, frames = [], [], [], []
            for vid, b in zip(pdf["id"], pdf["payload"]):
                blob = bytes(b) if b is not None else b""
                if not blob:
                    continue
                for i in range(n_frames):
                    ids.append(vid)
                    idxs.append(i)
                    ts.append(i * frame_interval_ms)
                    frames.append(
                        hashlib.blake2b(
                            blob[:64] + i.to_bytes(4, "big"), digest_size=32
                        ).digest()
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "ts_ms": ts, "frame": frames}
            )

    return src.mapInPandas(run, schema=VIDEO_FRAMES_SCHEMA)
