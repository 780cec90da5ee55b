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
        # NULL blobs (a failed fetch upstream) keep their row with NULL
        # dims instead of a TypeError that fails the whole job — the
        # image_phash guard, applied family-wide
        for pdf in batches:
            dims = [
                _fake_decode_image(b) if b is not None else (None, None)
                for b in pdf[blob_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [
                        len(b) if b is not None else None
                        for b in pdf[blob_col]
                    ],
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
                if blob is None:  # failed fetch: NULL feature, keep row
                    feats.append(None)
                    continue
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
                if blob is None:  # failed fetch: no frames to sample
                    continue
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
                if blob is None:  # failed fetch: NULL stays NULL
                    blobs.append(None)
                    continue
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


def _fake_decode_pixels(blob: bytes, side: int = 32):
    """STUB decode (deterministic fake): real implementation is
    ``PIL.Image.open(...).convert("L").resize((side, side))``.  The
    fake tiles the raw bytes into a side×side grayscale array, which is
    LOCALITY-PRESERVING — a small blob edit changes few pixels — so the
    perceptual-hash robustness property is exercised end-to-end."""
    import numpy as np

    if not blob:
        return np.zeros((side, side), dtype=np.float64)
    return np.resize(np.frombuffer(blob, dtype=np.uint8), (side, side)).astype(
        np.float64
    )


def _phash_from_pixels(pixels) -> int:
    """REAL pHash math (the part that is not environment-gated): DCT-II
    of the 32×32 grayscale, keep the top-left 8×8 low-frequency block,
    threshold each coefficient at the block median → 64-bit fingerprint.
    Pure numpy (explicit DCT basis matrix — no scipy dependency);
    deterministic, byte-order independent."""
    import numpy as np

    n = pixels.shape[0]
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    basis = np.cos(np.pi * (m + 0.5) * k / n)  # DCT-II basis (n × n)
    dct = basis @ pixels @ basis.T
    block = dct[:8, :8].ravel()
    bits = block > np.median(block)
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # two's-complement into int64 range for a Spark LongType column
    return out - (1 << 64) if out >= (1 << 63) else out


def image_phash(df: DataFrame, *, blob_col: str = "blob",
                id_col: str = "media_id") -> DataFrame:
    """Perceptual hash per image blob → ``(media_id, phash long)``.

    Arrow-batched ``mapInPandas`` like every media kernel; only the
    pixel DECODE is the environment-gated stub — the DCT/median/
    threshold pipeline is the real algorithm and runs against whatever
    pixel array the decoder yields, so swapping in Pillow changes one
    function."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                _phash_from_pixels(_fake_decode_pixels(b)) for b in pdf[blob_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col], "phash": hashes})

    return df.select(id_col, blob_col).mapInPandas(
        kernel, "media_id long, phash long"
    )


def phash_dup_pairs(df: DataFrame, *, blob_col: str = "blob",
                    id_col: str = "media_id",
                    max_hamming: int = 3,
                    n_chunks: int = 4) -> DataFrame:
    """Near-duplicate IMAGE pairs: perceptual hash + the generic Manku
    banded Hamming join (operators/dedup.py::hamming_pairs) — the image
    twin of text SimHash dedup, with the same guarantee: candidates
    only from 16-bit-chunk equi-joins (never all-pairs), exact
    ``bit_count`` verification, exact recall at Hamming ≤ 3.  Feed the
    pairs to ``dedup.dedup_clusters`` to drop all-but-one copy."""
    from cosmap_spark.operators.dedup import hamming_pairs

    return hamming_pairs(
        image_phash(df, blob_col=blob_col, id_col=id_col),
        id_col="media_id", hash_col="phash", max_hamming=max_hamming,
        n_chunks=n_chunks,
    )
