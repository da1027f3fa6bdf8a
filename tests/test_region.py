"""Raster region render (raster/region.py; reference raster_region.cpp)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dronedb_spark.raster.region import (
    bilinear_region,
    composite_white,
    render_index_png,
    render_index_region,
)

NODATA = -9999.0


def _pixels(spark, vals: dict[tuple[int, int], dict]):
    rows = [
        {"row": r, "col": c, **bands} for (r, c), bands in vals.items()
    ]
    return spark.createDataFrame(rows)


def test_bilinear_identity_at_native_resolution(spark):
    # 2x2 window sampled at 2x2: pixel centres land exactly on sources
    px = _pixels(spark, {
        (0, 0): {"N": 1.0}, (0, 1): {"N": 2.0},
        (1, 0): {"N": 3.0}, (1, 1): {"N": 4.0},
    })
    got = {(r["py"], r["px"]): r["N"]
           for r in bilinear_region(px, ["N"], 0, 1, 0, 1, 2, 2).collect()}
    assert got == {(0, 0): 1.0, (0, 1): 2.0, (1, 0): 3.0, (1, 1): 4.0}


def test_bilinear_midpoint_blend_and_nodata_renormalize(spark):
    px = _pixels(spark, {
        (0, 0): {"N": 0.0}, (0, 1): {"N": 4.0},
        (1, 0): {"N": 8.0}, (1, 1): {"N": NODATA},
    })
    # single output pixel centred in the middle: fx = fy = 0.5
    [row] = bilinear_region(px, ["N"], 0, 1, 0, 1, 1, 1).collect()
    # weights 0.25 each; nodata corner drops, renormalize over 0.75
    assert row["N"] == pytest.approx((0.0 + 4.0 + 8.0) * 0.25 / 0.75)


def test_all_nodata_sample_is_null_and_transparent(spark):
    px = _pixels(spark, {
        (0, 0): {"N": NODATA, "R": 1.0}, (0, 1): {"N": NODATA, "R": 1.0},
        (1, 0): {"N": NODATA, "R": 1.0}, (1, 1): {"N": NODATA, "R": 1.0},
    })
    [row] = render_index_region(px, "NDVI", 0, 1, 0, 1, 1, 1).collect()
    assert row["value"] is None
    assert (row["r"], row["g"], row["b"], row["a"]) == (0, 0, 0, 0)


@pytest.mark.parametrize(
    "index,bands,expected",
    [
        # single-pixel window → sample = the pixel itself
        ("NDVI", {"N": 0.6, "R": 0.2}, (0.6 - 0.2) / 0.8),
        ("NDRE", {"N": 0.6, "Re": 0.3}, (0.6 - 0.3) / 0.9),
        ("NDWI", {"G": 0.4, "N": 0.6}, (0.4 - 0.6) / 1.0),
        ("SAVI", {"N": 0.6, "R": 0.2}, (0.6 - 0.2) / (0.6 + 0.2 + 0.5) * 1.5),
        ("EVI", {"N": 0.6, "R": 0.2, "B": 0.1},
         2.5 * (0.6 - 0.2) / (0.6 + 6 * 0.2 - 7.5 * 0.1 + 1.0)),
    ],
)
def test_index_formulas(spark, index, bands, expected):
    px = _pixels(spark, {(0, 0): bands})
    [row] = render_index_region(px, index, 0, 0, 0, 0, 1, 1).collect()
    assert row["value"] == pytest.approx(expected)


def test_ramp_endpoints(spark):
    # v=-1 → pure red; v=0 → yellow; v=+1 → pure green (rampNdvi)
    px = _pixels(spark, {(0, 0): {"N": 0.0, "R": 0.5}})   # v=-1
    [lo] = render_index_region(px, "NDVI", 0, 0, 0, 0, 1, 1).collect()
    assert (lo["r"], lo["g"], lo["b"], lo["a"]) == (255, 0, 0, 255)
    px = _pixels(spark, {(0, 0): {"N": 0.5, "R": 0.0}})   # v=+1
    [hi] = render_index_region(px, "NDVI", 0, 0, 0, 0, 1, 1).collect()
    assert (hi["r"], hi["g"], hi["b"], hi["a"]) == (0, 255, 0, 255)
    px = _pixels(spark, {(0, 0): {"N": 0.5, "R": 0.5}})   # v=0 → t=0.5
    [mid] = render_index_region(px, "NDVI", 0, 0, 0, 0, 1, 1).collect()
    assert (mid["r"], mid["g"], mid["b"]) == (255, 255, 0)


def test_composite_white_jpeg_path(spark):
    rgba = spark.createDataFrame(
        [{"px": 0, "py": 0, "r": 255, "g": 0, "b": 0, "a": 0},
         {"px": 1, "py": 0, "r": 100, "g": 200, "b": 0, "a": 255}]
    )
    got = {r["px"]: (r["r"], r["g"], r["b"]) for r in composite_white(rgba).collect()}
    assert got[0] == (255, 255, 255)  # transparent → white background
    assert got[1] == (100, 200, 0)    # opaque → unchanged


def test_render_index_png_roundtrip(spark):
    from dronedb_spark.raster.synth import ms_df
    from dronedb_spark.sources.png import decode_png

    data = render_index_png(ms_df(spark), "NDVI", 8, 39, 4, 35, 8, 8)
    arr = decode_png(data)
    assert arr.shape == (8, 8, 4)
    rows = render_index_region(ms_df(spark), "NDVI", 8, 39, 4, 35, 8, 8).collect()
    for row in rows:
        assert tuple(arr[row["py"], row["px"]]) == (
            row["r"], row["g"], row["b"], row["a"]
        )


def test_region_plan_broadcasts_grid_no_cartesian(spark):
    from dronedb_spark.raster.synth import ms_df

    df = render_index_region(ms_df(spark), "NDVI", 8, 39, 4, 35, 16, 16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_tile_render_covers_all_regimes(spark):
    from dronedb_spark.raster.synth import dem_df
    from dronedb_spark.raster.tiler import _GT, _TS, _TX, _TY, _TZ, render_tile_gray

    rows = render_tile_gray(dem_df(spark), _GT, _TZ, _TX, _TY, 190.0, 310.0, _TS).collect()
    assert len(rows) == _TS * _TS
    by = {(r["py"], r["px"]): r for r in rows}
    # covered quarter: DEM = half tile width at 64px tile → px,py < 32 valid
    assert by[(0, 0)]["a"] == 255 and by[(0, 0)]["value"] is not None
    # outside the raster → transparent
    assert by[(40, 40)]["a"] == 0 and by[(40, 40)]["g"] == 0
    # the DEM nodata patch (rows 5-10, cols 100-110 → tile px 25-27, py 1-2)
    assert by[(1, 26)]["a"] == 0
    covered = sum(1 for r in rows if r["a"] == 255)
    assert 30 * 30 < covered <= 32 * 32  # quarter coverage minus nodata patch


def test_tile_png_roundtrip(spark):
    from dronedb_spark.raster.synth import dem_df
    from dronedb_spark.raster.tiler import _GT, _TX, _TY, _TZ, render_tile_png
    from dronedb_spark.sources.png import decode_png

    data = render_tile_png(dem_df(spark), _GT, _TZ, _TX, _TY, 190.0, 310.0, 32)
    arr = decode_png(data)
    assert arr.shape == (32, 32, 2)  # gray + alpha
    assert arr[0, 0, 1] == 255 and arr[31, 31, 1] == 0


def test_splat_tile_zbuffer_and_disc(spark):
    from dronedb_spark.raster.points import _disc_offsets, splat_tile

    assert len(_disc_offsets(2)) == 11  # asymmetric disc, +r edge excluded
    # two points at the same centre pixel: higher z wins the whole disc
    pts = spark.createDataFrame(
        [
            {"pid": 1, "x": 50.0, "y": 50.0, "z": 1.0, "red": 10, "green": 10, "blue": 10},
            {"pid": 2, "x": 50.0, "y": 50.0, "z": 9.0, "red": 200, "green": 100, "blue": 50},
        ]
    )
    rows = splat_tile(pts, 0.0, 0.0, 100.0, 100.0, tile_size=16, radius=2).collect()
    assert len(rows) == 11  # one disc
    assert all((r["r"], r["g"], r["b"]) == (200, 100, 50) for r in rows)
    # 16-bit colours flip the normalize sweep: >> 8
    pts16 = spark.createDataFrame(
        [{"pid": 1, "x": 50.0, "y": 50.0, "z": 1.0,
          "red": 51200, "green": 25600, "blue": 300}]
    )
    rows16 = splat_tile(pts16, 0.0, 0.0, 100.0, 100.0, tile_size=16, radius=2).collect()
    assert all((r["r"], r["g"], r["b"]) == (200, 100, 1) for r in rows16)


def test_pointcloud_thumb_composition(spark):
    """generatePointCloudThumb (thumbs.cpp:992) = cloud AABB → splat
    render over its own extent → PNG; composed from existing pieces."""
    import numpy as np

    from dronedb_spark.raster.points import points_df, splat_tile
    from dronedb_spark.sources.png import encode_png

    pts = points_df(spark).selectExpr(
        "pid", "x", "y", "z",
        "intensity AS red", "intensity AS green", "intensity AS blue"
    )
    b = pts.agg(
        F.min("x").alias("x0"), F.min("y").alias("y0"),
        F.max("x").alias("x1"), F.max("y").alias("y1"),
    ).collect()[0]
    tile = splat_tile(pts, b["x0"], b["y0"], b["x1"], b["y1"], tile_size=32).collect()
    assert len(tile) > 32 * 32 * 0.5  # dense cloud fills most of the thumb
    arr = np.zeros((32, 32, 4), dtype=np.uint8)
    for r in tile:
        arr[r["py"], r["px"]] = (r["r"], r["g"], r["b"], 255)
    assert len(encode_png(arr)) > 100


def test_mercator_zoom_helpers():
    import math

    from dronedb_spark.functions.geo import (
        mercator_resolution, zoom_for_length, zoom_for_pixel_size,
    )

    circ = 2 * math.pi * 6378137.0
    assert mercator_resolution(0) == pytest.approx(circ / 256)
    # a scene as wide as one z-n tile picks zoom n
    for z in (0, 3, 10, 18):
        assert zoom_for_length(circ / 2 ** z) == z
    # pixel-size pick: the first zoom whose resolution is FINER than the
    # raster's own pixel backs off by one (tiler.cpp:218-221)
    assert zoom_for_pixel_size(mercator_resolution(5) * 1.01) == 4
    assert zoom_for_pixel_size(1e9) == 0  # coarser than z0 clamps at 0
