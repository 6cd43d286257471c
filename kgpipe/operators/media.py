"""Multimodal (image/audio/video) column operators.

Media is carried as an opaque ``binary`` payload column plus TYPED
metadata (kind, width, height, sample_rate, n_frames) — the task brief's
multimodal model. Real codec work (PIL/librosa/PyAV) is not available in
this container, so the decode step is STUBBED: ``backend="fake"`` is a
deterministic byte-level decoder with the exact schema / Arrow batch
shape / partitioning a real decoder would use, and any real backend name
raises ``NotImplementedError`` at the call site (not deep inside a task),
so swapping in a codec later changes ONE function body.

Spark-side plumbing is the real thing:

* ``decode_media_features`` — ``mapInPandas`` over Arrow record batches
  (batch size governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``,
  pinned by test); payload bytes never pass through per-row Python UDF
  pickling.
* ``resize_images`` — Arrow-batched scalar pandas UDF returning
  ``binary`` (the shape a real resampler has).
* ``sample_frames`` — NO Python at all: frame boundaries are arithmetic
  over the typed metadata and the slice is a JVM binary ``substring``,
  so at 100 TB frame extraction is a narrow codegen'd projection.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

_REAL_BACKENDS = ("pil", "librosa", "av")

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, mean_byte double, "
    "byte_hist array<double>, batch_rows int"
)


def _require_fake(backend: str) -> None:
    if backend == "fake":
        return
    if backend in _REAL_BACKENDS:
        raise NotImplementedError(
            f"media backend {backend!r}: codec libraries are not available "
            f"in this environment — only the deterministic 'fake' decode "
            f"stub is runnable; the Spark plumbing (schema, Arrow batching, "
            f"partitioning) is identical for a real backend")
    raise ValueError(f"unknown media backend {backend!r}")


def decode_media_features(media: DataFrame, backend: str = "fake",
                          n_bins: int = 16) -> DataFrame:
    """Decode + feature-extract: (media_id, kind, payload) ->
    (n_bytes, mean_byte, 16-bin byte histogram [fractions], batch_rows).

    ``batch_rows`` records the Arrow batch each row arrived in — it exists
    so tests can pin the batch shape (maxRecordsPerBatch is honored); a
    real pipeline would drop it.
    """
    _require_fake(backend)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [np.frombuffer(b, dtype=np.uint8)
                    for b in pdf["payload"]]
            hists = [
                (np.bincount(a >> 4, minlength=n_bins) / max(1, a.size))
                .astype(np.float64).tolist()
                for a in bufs
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "n_bytes": [a.size for a in bufs],
                "mean_byte": [float(a.mean()) if a.size else 0.0
                              for a in bufs],
                "byte_hist": hists,
                "batch_rows": len(pdf),
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int,
                  backend: str = "fake") -> DataFrame:
    """(media_id, payload) -> (media_id, resized binary of EXACTLY
    target_w*target_h bytes). Fake resample = nearest-neighbor index map
    over the payload bytes (deterministic, shape-correct); a real backend
    would decode/resample/encode in the same UDF body."""
    _require_fake(backend)

    @F.pandas_udf(BinaryType())
    def _resize(payload: pd.Series) -> pd.Series:
        n = target_w * target_h

        def one(b: bytes) -> bytes:
            a = np.frombuffer(b, dtype=np.uint8)
            if a.size == 0:
                return bytes(n)
            idx = (np.arange(n) * a.size) // n
            return a[idx].tobytes()

        return payload.map(one)

    return media.filter(F.col("kind") == "image").select(
        "media_id", _resize(F.col("payload")).alias("resized"))


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling WITHOUT Python: explode the frame index from
    the typed metadata, keep every ``every_k``-th frame, slice the payload
    with a JVM binary substring. Output:
    (media_id, frame_idx, frame_len, frame binary)."""
    v = media.filter(F.col("kind") == "video")
    flen = F.expr("length(payload) div n_frames")
    return (
        v.withColumn("frame_len", flen.cast("int"))
        .withColumn("frame_idx",
                    F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .filter(F.col("frame_idx") % every_k == 0)
        .select(
            "media_id", "frame_idx", "frame_len",
            F.expr("substring(payload, frame_idx * frame_len + 1, "
                   "frame_len)").alias("frame"),
        )
    )
