"""Unit tests: footprint trigonometry (entry.cpp:770-836 semantics incl.
the pitch-cap quirk), UTM round-trip, and the align/merge/mask kernels."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dronedb_spark.functions.footprint import (
    calculate_footprint,
    from_utm,
    to_utm,
    utm_zone,
)
from dronedb_spark.raster.align import (
    align_bands,
    mask_borders,
    phase_correlate,
    shift_image,
)


def test_utm_roundtrip():
    for lat, lon in [(46.84, -91.99), (40.7, -74.0), (-33.9, 18.4), (51.5, -0.1)]:
        z = utm_zone(lat, lon)
        x, y = to_utm(lat, lon, z)
        lat2, lon2 = from_utm(x, y, z, southern=lat < 0)
        assert abs(lat2 - lat) < 1e-6 and abs(lon2 - lon) < 1e-6


def test_utm_zone_exceptions():
    assert utm_zone(60.0, 5.0) == 32  # Norway
    assert utm_zone(75.0, 10.0) == 33  # Svalbard
    assert utm_zone(46.84, -91.99) == 15


def test_footprint_nadir_rectangle():
    # nadir shot, no yaw/roll: footprint is a rectangle centered at the point
    # with width 2·alt·tan(atan(w/2f)) = alt·w/f (small-angle exact here)
    ring = calculate_footprint(36.0, 24.0, 50.0, 46.84, -91.99, 0.0, 100.0, 0.0, -90.0, 0.0)
    assert len(ring) == 5 and ring[0] == ring[4]
    lons = [p[0] for p in ring[:4]]
    lats = [p[1] for p in ring[:4]]
    z = utm_zone(46.84, -91.99)
    xs, ys = zip(*[to_utm(la, lo, z) for lo, la in zip(lons, lats)])
    w = max(xs) - min(xs)
    h = max(ys) - min(ys)
    assert w == pytest.approx(2 * 100.0 * math.tan(math.atan(36.0 / (2 * 50.0))), abs=0.05)
    assert h == pytest.approx(2 * 100.0 * math.tan(math.atan(24.0 / (2 * 50.0))), abs=0.05)
    assert w > h  # landscape sensor


def test_footprint_pitch_cap_forces_nadir():
    # pitch -10 exceeds the -30 cap → treated as nadir (entry.cpp:787-792)
    capped = calculate_footprint(36.0, 24.0, 50.0, 46.84, -91.99, 0.0, 100.0, 0.0, -10.0, 0.0)
    nadir = calculate_footprint(36.0, 24.0, 50.0, 46.84, -91.99, 0.0, 100.0, 0.0, -90.0, 0.0)
    assert capped == nadir
    # a compliant oblique pitch (-60) differs
    oblique = calculate_footprint(36.0, 24.0, 50.0, 46.84, -91.99, 0.0, 100.0, 0.0, -60.0, 0.0)
    assert oblique != nadir


def test_footprint_yaw_rotation():
    r0 = calculate_footprint(36.0, 24.0, 50.0, 46.84, -91.99, 0.0, 100.0, 0.0, -90.0, 0.0)
    r90 = calculate_footprint(36.0, 24.0, 50.0, 46.84, -91.99, 0.0, 100.0, 90.0, -90.0, 0.0)
    z = utm_zone(46.84, -91.99)

    def dims(ring):
        xs, ys = zip(*[to_utm(la, lo, z) for lo, la, _ in ring[:4]])
        return max(xs) - min(xs), max(ys) - min(ys)

    w0, h0 = dims(r0)
    w90, h90 = dims(r90)
    assert w0 == pytest.approx(h90, abs=0.05) and h0 == pytest.approx(w90, abs=0.05)


def test_phase_correlate_and_align():
    rng = np.random.RandomState(42)
    ref = rng.rand(64, 64)
    mov = shift_image(ref, 5, -3)
    dy, dx = phase_correlate(ref, mov)
    assert (dy, dx) == (-5, 3)
    aligned = align_bands({"ref": ref, "b": mov}, "ref")
    # central crop matches after alignment
    assert np.allclose(aligned["b"][10:50, 10:50], ref[10:50, 10:50])


def test_mask_borders():
    g = np.full((10, 10), 1.0)
    g[0, :] = -9999.0
    g[:, -1] = -9999.0
    m = mask_borders(g)
    assert not m[0].any() and not m[:, -1].any()
    assert not m[1].all()  # row adjacent to nodata border eroded
    assert m[5, 5]


def test_ransac_similarity_rejects_outliers():
    import numpy as np

    from dronedb_spark.raster.align import fit_similarity, ransac_similarity

    rng = np.random.RandomState(4)
    src = rng.rand(30, 2) * 80
    s, th, tx, ty = 1.03, np.radians(2.5), 3.0, -1.5
    c, sn = s * np.cos(th), s * np.sin(th)
    dst = np.column_stack(
        [c * src[:, 0] - sn * src[:, 1] + tx, sn * src[:, 0] + c * src[:, 1] + ty]
    )
    dst[::5] += rng.rand(6, 2) * 40 + 10  # 20% gross outliers
    (rs, rth, rtx, rty), mask = ransac_similarity(src, dst, seed=1)
    assert abs(rs - s) < 1e-6 and abs(rth - th) < 1e-8
    assert abs(rtx - tx) < 1e-6 and abs(rty - ty) < 1e-6
    assert mask.sum() == 24  # exactly the clean points

    # exact fit degenerates gracefully to the closed form
    s2, th2, tx2, ty2 = fit_similarity(src[~np.arange(30) % 5 == 0][:2], dst[1:3])
    assert np.isfinite([s2, th2, tx2, ty2]).all()
