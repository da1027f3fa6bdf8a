"""Audio energy-gradient fingerprint: gain invariance + banding."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.multimodal.audiofp import (
    audio_fingerprint,
    audio_fingerprints,
    audio_neardup,
)


def test_fingerprint_gain_invariant():
    rng = np.random.default_rng(3)
    s = rng.integers(-8000, 8000, size=900).astype(np.int16)
    assert audio_fingerprint(s) == audio_fingerprint((s * 2).astype(np.int16))
    # and of a non-multiple length (truncates to the window grid)
    assert audio_fingerprint(s[:817]) == audio_fingerprint((s[:817] * 3).astype(np.int16))


def test_fingerprint_discriminates():
    t = np.arange(800, dtype=np.int64)
    a = ((t * 13) % 3001 - 1500).astype(np.int16)
    b = ((t * 29) % 3001 - 1500).astype(np.int16)
    fa, fb = audio_fingerprint(a), audio_fingerprint(b)
    assert bin(fa ^ fb).count("1") > 2


def test_too_short_raises():
    with pytest.raises(ValueError):
        audio_fingerprint(np.zeros(10, dtype=np.int16))


def test_neardup_guard_and_skip(spark):
    from dronedb_spark.sources.wav import encode_wav

    with pytest.raises(ValueError):
        audio_neardup(
            spark.createDataFrame([], "media_id long, fp long"), max_hamming=5
        )
    good = encode_wav(np.arange(800, dtype=np.int16), 16000)
    rows = [(1, bytearray(good)), (2, bytearray(b"junk")), (3, bytearray(good))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = sorted(r["media_id"] for r in audio_fingerprints(df).collect())
    assert got == [1, 3]
