"""dHash banding recall guarantee + arbitrary-dimension hashing."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.multimodal.phash import (
    GRID_H,
    GRID_W,
    dhash_array,
    dhash_images,
    dhash_neardup,
)


def _pairs(spark, rows, max_hamming=6):
    df = spark.createDataFrame(rows, "media_id long, h1 long, h2 long")
    return {
        (r["img_a"], r["img_b"]): r["hamming"]
        for r in dhash_neardup(df, max_hamming=max_hamming).collect()
    }


def test_adversarial_spread_bits_found(spark):
    """4 flipped bits placed in 4 DISTINCT 16-bit bands (positions 0,
    16, 32, 48) — the exact adversarial layout the old 4×16-bit banding
    silently missed at the default threshold.  8×8-bit banding leaves
    bands 1, 3, 5, 7 untouched, so the pair MUST surface."""
    h1, h2 = 0x12345678, 0x0ABCDEF0
    rows = [
        (1, h1, h2),
        (2, h1 ^ (1 << 0) ^ (1 << 16), h2 ^ (1 << 0) ^ (1 << 16)),
    ]
    got = _pairs(spark, rows)
    assert got == {(1, 2): 4}


def test_six_bits_six_bands_found(spark):
    """Worst case at the default threshold: 6 flipped bits in 6 distinct
    8-bit bands still leaves 2 shared bands."""
    h1, h2 = 0x00FF00FF, 0x55AA55AA
    flip1 = (1 << 1) | (1 << 9) | (1 << 17)   # bands 0, 1, 2
    flip2 = (1 << 1) | (1 << 9) | (1 << 17)   # bands 4, 5, 6
    rows = [(1, h1, h2), (2, h1 ^ flip1, h2 ^ flip2)]
    got = _pairs(spark, rows)
    assert got == {(1, 2): 6}


def test_beyond_guarantee_raises(spark):
    with pytest.raises(ValueError):
        dhash_neardup(
            spark.createDataFrame([], "media_id long, h1 long, h2 long"),
            max_hamming=8,
        )


def test_dhash_array_non_divisible_dims():
    """Dimensions that don't divide the 8×9 grid hash without error
    (they used to AssertionError executor-side)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, size=(33, 37, 3), dtype=np.uint8)
    h1, h2 = dhash_array(img)
    assert 0 <= h1 < 2**32 and 0 <= h2 < 2**32
    # a non-saturating constant brightness shift preserves every
    # gradient sign, so the hash is invariant
    base = (img % 200).astype(np.uint8)
    shifted = (base + 3).astype(np.uint8)
    assert dhash_array(base) == dhash_array(shifted)


def test_dhash_array_divisible_matches_reshape_mean():
    """On grid-divisible dims the integral-image box means equal the old
    reshape-mean closed form (the oracle's formulation)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, size=(32, 36), dtype=np.uint8)
    g = img.astype(np.float64)
    boxes = g.reshape(GRID_H, 4, GRID_W, 4).mean(axis=(1, 3))
    bits = (boxes[:, :-1] < boxes[:, 1:]).astype(np.int64).ravel()
    h1 = int(sum(int(bits[i]) << i for i in range(32)))
    h2 = int(sum(int(bits[32 + i]) << i for i in range(32)))
    assert dhash_array(img) == (h1, h2)


def test_dhash_images_skips_undecodable(spark):
    from dronedb_spark.sources.png import encode_png

    good = encode_png(np.full((16, 18, 3), 128, dtype=np.uint8))
    rows = [(1, bytearray(good)), (2, bytearray(b"not an image")),
            (3, bytearray(good))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = sorted(r["media_id"] for r in dhash_images(df).collect())
    assert got == [1, 3]


def test_hot_bucket_cap_bounds_candidates(spark):
    """A planted 1000-copy hot bucket is dropped by the DF cap (its
    ~500k candidate pairs never form) while a planted hamming-0 mate
    pair outside the bucket still surfaces."""
    # 1000 images sharing EVERY band value (identical hashes) — without
    # the cap this alone is 499,500 candidate pairs
    hot = [(i, 0x01020304, 0x05060708) for i in range(1000)]
    mates = [(5001, 0x0A0B0C0D, 0x0E0F1011), (5002, 0x0A0B0C0D, 0x0E0F1011)]
    df = spark.createDataFrame(hot + mates, "media_id long, h1 long, h2 long")
    got = {
        (r["img_a"], r["img_b"]): r["hamming"]
        for r in dhash_neardup(df, max_hamming=6, max_df=16).collect()
    }
    assert got == {(5001, 5002): 0}
