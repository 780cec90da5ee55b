"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md §2.4).

Design: media NEVER flows through driver memory or Python row objects —
it lives in a ``binary`` column with a metadata struct alongside, and
every transform is an Arrow-batched ``mapInPandas`` so bytes move
executor-side in columnar batches.  The actual codec calls (Pillow /
ffmpeg / torchaudio) are not available in this container, so the decode
kernels are STUBBED behind a deterministic fake (clearly marked); the
Spark-side plumbing — schema, partition sizing, UDF signatures, batch
shapes — is real and tested (tests/test_multimodal.py).

Partition sizing note for 100 TB: media rows are fat (KB–MB each); set
``spark.sql.files.maxPartitionBytes`` so a partition holds O(100) rows
and ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 64) to
bound executor memory per Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried next to each media blob
MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)


def attach_media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Derive cheap metadata JVM-side (no decode): byte length + a
    deterministic content fingerprint for dedup/caching."""
    return df.withColumn("n_bytes", F.length(F.col(blob_col)).cast("long")).withColumn(
        "blob_sha", F.sha2(F.col(blob_col), 256)
    )


def _fake_decode_image(blob: bytes) -> tuple[int, int]:
    """STUB decode (deterministic fake): real implementation would be
    ``PIL.Image.open(io.BytesIO(blob)).size``.  The fake derives a
    plausible (width, height) from the blob content so tests are
    deterministic end-to-end."""
    h = len(blob)
    return (64 + h % 32, 64 + (h // 32) % 32)


def decode_images(df: DataFrame, *, blob_col: str = "blob",
                  id_col: str = "media_id") -> DataFrame:
    """Decode image dimensions via mapInPandas (Arrow batches).

    Output: (media_id, width, height, n_bytes).  Swap ``_fake_decode_image``
    for a Pillow call when the codec is available; nothing else changes.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode_image(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(b) for b in pdf[blob_col]],
                }
            )

    return df.mapInPandas(
        decode, schema=f"{id_col} long, width int, height int, n_bytes long"
    )


def extract_features(df: DataFrame, *, blob_col: str = "blob",
                     id_col: str = "media_id", dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing: blob → fixed-dim float vector.

    STUB kernel: a deterministic byte-histogram projection stands in for
    a real vision/audio encoder.  Produces ``array<float>`` compatible
    with the kNN/dedup operators (operators/knn.py), so the downstream
    pipeline (embed → dedup → ANN) runs end-to-end today and the encoder
    drops in later."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                n = float(np.linalg.norm(hist)) or 1.0
                feats.append((hist / n).tolist())
            yield pd.DataFrame({id_col: pdf[id_col].values, "feature": feats})

    return df.mapInPandas(featurize, schema=f"{id_col} long, feature array<float>")


def sample_frames(df: DataFrame, *, blob_col: str = "blob",
                  id_col: str = "media_id", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    STUB kernel: treats each 1 KiB span of the blob as a "frame"; a real
    implementation replaces the span slicing with an ffmpeg/pyav
    iterator.  Demonstrates the 1→N exploding mapInPandas shape (row
    fan-out without driver involvement)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                n_frames = max(1, len(blob) // 1024)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(blob[i * 1024:(i + 1) * 1024])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_blob": blobs}
            )

    return df.mapInPandas(
        frames, schema=f"{id_col} long, frame_idx int, frame_blob binary"
    )


def resize_images(df: DataFrame, *, blob_col: str = "blob",
                  id_col: str = "media_id",
                  target: tuple[int, int] = (32, 32)) -> DataFrame:
    """Image-resize plumbing: blob → resized blob + recorded dims.

    STUB kernel: real implementation is ``PIL.Image.resize(target)`` +
    re-encode; the fake truncates/pads the byte stream to the target
    pixel count so output sizes are deterministic.  Keeps the binary
    column shape (blob in, blob out) so resize composes with
    decode/feature stages in one mapInPandas pipeline — batches stay in
    Arrow, rows never individually cross the JVM↔Python boundary."""

    tw, th = target
    out_len = tw * th

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for blob in pdf[blob_col]:
                blob = bytes(blob)
                if len(blob) >= out_len:
                    blobs.append(blob[:out_len])
                else:
                    blobs.append(blob + b"\x00" * (out_len - len(blob)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "blob": blobs,
                    "width": [tw] * len(blobs),
                    "height": [th] * len(blobs),
                }
            )

    return df.mapInPandas(
        resize, schema=f"{id_col} long, blob binary, width int, height int"
    )
