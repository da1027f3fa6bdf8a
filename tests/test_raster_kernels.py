"""Unit tests for the numpy raster kernels (contours, stockpiles) against
the analytically-known synthetic DEM (two paraboloid mounds on an
inclined plane + a nodata patch)."""

from __future__ import annotations

import pytest

from dronedb_spark.raster.contours import contour_segments, contour_crossings, DEM_LEVELS
from dronedb_spark.raster.stockpile import detect_stockpiles
from dronedb_spark.raster.synth import dem_df


def test_contour_segments_exist_per_level(spark):
    segs = contour_segments(dem_df(spark)).collect()
    assert len(segs) > 0
    by_level = {}
    for s in segs:
        by_level.setdefault(s["level"], 0)
        by_level[s["level"]] += 1
    # 210 crosses the base plane (long diagonal line) and both mounds;
    # 250 only cuts the taller mound
    assert set(by_level) == set(DEM_LEVELS)
    assert by_level[210.0] > by_level[250.0]


def test_contour_segment_count_tracks_crossings(spark):
    # every marching-squares segment has exactly 2 edge intersections, and
    # every crossed edge is shared by ≤2 cells → segments ≈ crossings
    segs = contour_segments(dem_df(spark)).collect()
    cross = {
        (r["level"], r["axis"]): r["n"] for r in contour_crossings(dem_df(spark), DEM_LEVELS).collect()
    }
    for lv in DEM_LEVELS:
        n_seg = sum(1 for s in segs if s["level"] == lv)
        n_cross = cross[(lv, "h")] + cross[(lv, "v")]
        assert n_cross / 2 <= n_seg <= n_cross  # interior edges shared by 2 cells


def test_stockpile_detects_two_mounds(spark):
    piles = detect_stockpiles(dem_df(spark), min_height=5.0, min_pixels=16).collect()
    assert len(piles) == 2
    # mound 1 (amplitude 60 at r40,c50) is larger than mound 2 (45 at r90,c90)
    assert piles[0]["estimated_volume"] > piles[1]["estimated_volume"]
    assert abs(piles[0]["centroid_row"] - 40) < 3 and abs(piles[0]["centroid_col"] - 50) < 3
    assert abs(piles[1]["centroid_row"] - 90) < 3 and abs(piles[1]["centroid_col"] - 90) < 3
    # analytic volume of a capped paraboloid: ∫ h·max(0, 1−d²/R²) = h·π·R²/2
    # mound 1: amplitude ≈ 55 above plane threshold…  just sanity-bound it
    assert piles[0]["peak_height"] > 40
    assert piles[0]["estimated_volume"] > piles[0]["n_pixels"] * 0.25  # > 1 m avg


def test_stockpile_threshold_excludes_small(spark):
    piles = detect_stockpiles(dem_df(spark), min_height=50.0).collect()
    assert len(piles) == 1  # only the 60 m mound exceeds 50 m over base
