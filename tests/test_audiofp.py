"""Per-frame audio subfingerprints: gain + trim invariance, banding
recall, hot-bucket cap."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.multimodal.audiofp import (
    FRAME,
    SEQ2NAT,
    STRIDE,
    _banded_candidates,
    audio_neardup,
    audio_subfingerprints,
    audio_subfingerprints_np,
)


def test_seq2nat_is_sequency_order():
    """Sequency s ⇔ the Walsh function with exactly s sign changes."""
    j = np.arange(FRAME)
    for s in (0, 1, 2, 5, 17, 32, 63):
        nat = SEQ2NAT[s]
        w = 1 - 2 * np.array([bin(nat & x).count("1") & 1 for x in j])
        assert int(np.sum(w[1:] != w[:-1])) == s


def test_subfp_gain_invariant():
    rng = np.random.default_rng(3)
    s = rng.integers(-8000, 8000, size=900).astype(np.int16)
    assert audio_subfingerprints_np(s) == audio_subfingerprints_np(
        (s.astype(np.int64) * 2).astype(np.int64)
    )


def test_subfp_trim_invariant():
    """A copy offset by k·STRIDE samples shares all interior
    subfingerprints — the shift invariance whole-clip windows lack."""
    rng = np.random.default_rng(7)
    s = rng.integers(-8000, 8000, size=900).astype(np.int64)
    orig = audio_subfingerprints_np(s)
    trimmed = audio_subfingerprints_np(s[2 * STRIDE:])
    assert trimmed == orig[2:]


def test_subfp_discriminates():
    t = np.arange(800, dtype=np.int64)
    a = (t * t * 7 + t * 13) % 2003 - 1001
    b = (t * t * 11 + t * 42) % 2003 - 1001
    fa, fb = audio_subfingerprints_np(a), audio_subfingerprints_np(b)
    assert min(bin(x ^ y).count("1") for x in fa for y in fb) > 2


def test_too_short_raises():
    with pytest.raises(ValueError):
        audio_subfingerprints_np(np.zeros(FRAME, dtype=np.int16))


def test_neardup_guard_and_skip(spark):
    from dronedb_spark.sources.wav import encode_wav

    with pytest.raises(ValueError):
        audio_neardup(
            spark.createDataFrame([], "media_id long, frame_no int, sub long"),
            max_hamming=4,
        )
    good = encode_wav(np.arange(800, dtype=np.int16), 16000)
    rows = [(1, bytearray(good)), (2, bytearray(b"junk")), (3, bytearray(good))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = sorted(set(r["media_id"] for r in audio_subfingerprints(df).collect()))
    assert got == [1, 3]


def test_hot_bucket_cap_bounds_candidates(spark):
    """A planted hot bucket (41 clips sharing band 0's value) is dropped
    by the DF cap — its f² candidate pairs never reach the refine —
    while a hamming-0 mate pair outside the hot bucket still surfaces."""
    hot = [
        # band0 = 0x55 for all, other bands spread: pairwise hamming far
        (i, 1, 0x55 | (i << 8) | ((i ^ 0x3F) << 16) | ((i * 7 % 251) << 24))
        for i in range(100, 141)
    ]
    mates = [(900, 1, 0x12AB34CD), (901, 1, 0x12AB34CD)]
    subs = spark.createDataFrame(
        hot + mates, "media_id long, frame_no int, sub long"
    )
    cand = _banded_candidates(subs, max_df=16).collect()
    # the 41-clip bucket would alone contribute 41·40/2 = 820 pairs;
    # with the cap only residual collisions in the spread bands remain
    assert len(cand) < 100
    got = {
        (r["aud_a"], r["aud_b"]): r["hamming"]
        for r in audio_neardup(subs, max_hamming=2, max_df=16).collect()
    }
    assert got.get((900, 901)) == 0


def test_pigeonhole_recall_to_hamming_3(spark):
    """Subfingerprints differing in ≤ 3 bits spread over 3 bands still
    share the 4th band — the pair must surface."""
    a = 0x0F0F0F0F
    b = a ^ (1 << 0) ^ (1 << 8) ^ (1 << 16)  # 3 flips in bands 0-2
    subs = spark.createDataFrame(
        [(1, 1, a), (2, 1, b)], "media_id long, frame_no int, sub long"
    )
    got = audio_neardup(subs, max_hamming=3).collect()
    assert len(got) == 1 and got[0]["hamming"] == 3


def test_incremental_probe_only_decodes_batch(spark):
    """The store side of the incremental probe is pre-banded rows — a
    probe plan must not contain a second decode kernel over the store
    (one mapInPandas for the batch, none for the store input)."""
    from dronedb_spark.multimodal.audiofp import (
        audio_band_store,
        audio_incremental_neardup,
        _afp_samples,
    )
    from dronedb_spark.sources.wav import encode_wav

    rows = [(i, bytearray(encode_wav(_afp_samples(i), 16000))) for i in range(6)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    store = [
        (r["media_id"], r["sub"], r["band"], r["bv"])
        for r in audio_band_store(media).collect()
    ]
    store_df = spark.createDataFrame(store, "media_id long, sub long, band int, bv bigint")
    batch = spark.createDataFrame(rows[:2], "media_id long, content binary")
    plan = audio_incremental_neardup(batch, store_df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    got = {r["aud"]: r["is_dup"] for r in audio_incremental_neardup(batch, store_df).collect()}
    assert got == {0: 1, 1: 1}  # both clips are in the store (self-hit)
