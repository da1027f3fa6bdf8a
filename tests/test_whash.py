"""WHT hash laws: exact affine invariance, sensitivity to structural
edits, and the DC-only effect of a pure shift."""

from __future__ import annotations

import numpy as np

from dronedb_spark.multimodal.whash import wht_hash_array


def _ramp(seed, h=32, w=32):
    return np.fromfunction(
        lambda y, x: (seed * 37 + y * 5 + x * 11) % 100, (h, w)
    ).astype(np.uint8)


def test_affine_invariance_exact():
    for seed in range(5):
        base = _ramp(seed)
        shifted = (base.astype(np.int64) + 40).astype(np.uint8)
        scaled = (base.astype(np.int64) * 2 + 7).astype(np.uint8)
        assert wht_hash_array(base) == wht_hash_array(shifted)
        assert wht_hash_array(base) == wht_hash_array(scaled)


def test_structural_edit_changes_hash():
    base = _ramp(1)
    edited = base.copy()
    edited[:16, :] = edited[:16, ::-1]  # flip the top half
    assert wht_hash_array(base) != wht_hash_array(edited)


def test_distinct_ramps_differ():
    hashes = {wht_hash_array(_ramp(s)) for s in range(8)}
    assert len(hashes) == 8


def test_rgb_channel0_and_crop():
    g = _ramp(3, h=35, w=37)  # non-multiple dims crop to 32x32
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    assert wht_hash_array(rgb) == wht_hash_array(g)
    assert wht_hash_array(g) == wht_hash_array(g[:32, :32])
