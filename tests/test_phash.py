"""Perceptual-hash image dedup: kernel robustness (real DCT math),
Spark-side pair semantics, and parity with brute-force Hamming."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmap_spark.operators.multimodal import (
    _fake_decode_pixels,
    _phash_from_pixels,
    image_phash,
    phash_dup_pairs,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_kernel_robust_to_small_edits():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 32)).astype(np.float64)
    h0 = _phash_from_pixels(base)
    # identical pixels → identical hash
    assert _phash_from_pixels(base.copy()) == h0
    # a few flipped pixels → small Hamming distance
    near = base.copy()
    for _ in range(5):
        near[rng.integers(32), rng.integers(32)] += 3
    assert _hamming(h0, _phash_from_pixels(near)) <= 3
    # unrelated image → large Hamming distance
    other = rng.integers(0, 256, (32, 32)).astype(np.float64)
    assert _hamming(h0, _phash_from_pixels(other)) > 10


def test_phash_spark_pairs_vs_bruteforce(spark):
    rng = random.Random(5)
    base = bytes(rng.randrange(256) for _ in range(2048))
    rows = []
    for i in range(12):
        b = bytearray(base)
        for _ in range(i):  # progressively more corrupted copies
            b[rng.randrange(len(b))] ^= 0xFF
        rows.append((i, bytes(b)))
    for i in range(12, 20):  # unrelated blobs
        rows.append((i, bytes(rng.randrange(256) for _ in range(2048))))
    df = spark.createDataFrame(rows, "media_id long, blob binary")

    hashes = {r["media_id"]: r["phash"] for r in image_phash(df).collect()}
    assert len(hashes) == 20
    want = {
        (a, b)
        for a in hashes
        for b in hashes
        if a < b and _hamming(hashes[a], hashes[b]) <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_dup_pairs(df, max_hamming=3).collect()
    }
    assert got == want, "banded join must equal brute force at hamming<=3"
    # the exact copies cluster together; unrelated blobs don't pair
    assert (0, 1) in got
    assert all(a < 12 or b < 12 for a, b in got) or got == want


def test_phash_deterministic_across_partitionings(spark):
    rng = random.Random(9)
    rows = [
        (i, bytes(rng.randrange(256) for _ in range(512))) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    a = sorted(map(tuple, image_phash(df).collect()))
    b = sorted(map(tuple, image_phash(df.repartition(7)).collect()))
    assert a == b


def test_empty_blob(spark):
    df = spark.createDataFrame([(1, b""), (2, b"")], "media_id long, blob binary")
    out = image_phash(df).collect()
    assert len(out) == 2
    assert out[0]["phash"] == out[1]["phash"]
    pairs = phash_dup_pairs(df).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_hamming_pairs_wider_radius_with_more_chunks(spark):
    from cosmap_spark.operators.dedup import hamming_pairs

    # fingerprints with known pairwise distances
    fps = spark.createDataFrame(
        [
            (1, 0b0),
            (2, 0b1111111),          # 7 bits from id 1
            (3, 0b1),                # 1 bit from id 1, 6 from id 2
            (4, -1),                 # 64 bits from id 1
        ],
        "id long, fp long",
    )
    # radius 7 demands >= 8 chunks — the guarantee is enforced
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hamming_pairs(fps, hash_col="fp", max_hamming=7, n_chunks=4)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(
            fps, hash_col="fp", max_hamming=7, n_chunks=8
        ).collect()
    }
    assert got == {(1, 2): 7, (1, 3): 1, (2, 3): 6}


def test_hamming_pairs_parity_brute_force_chunks8(spark):
    import random

    from cosmap_spark.operators.dedup import hamming_pairs

    rng = random.Random(23)
    base = rng.getrandbits(63)
    rows = [(0, base)]
    for i in range(1, 25):
        fp = base
        for _ in range(rng.randrange(0, 10)):  # up to 9 bit flips
            fp ^= 1 << rng.randrange(64)
        rows.append((i, fp - (1 << 64) if fp >= (1 << 63) else fp))
    fps = spark.createDataFrame(rows, "id long, fp long")
    got = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs(
            fps, hash_col="fp", max_hamming=7, n_chunks=8
        ).collect()
    }
    want = {
        (a, b)
        for ai, (a, fa) in enumerate(rows)
        for b, fb in rows[ai + 1:]
        if bin((fa ^ fb) & ((1 << 64) - 1)).count("1") <= 7
    }
    assert got == want
