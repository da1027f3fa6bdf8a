"""Edge-case rasters through the COG / warp / tile pipeline — the
in-repo analog of the reference's edge_raster_test.cpp (its fixtures
are downloaded real-world orthos; ours are synthesized to hit the same
boundary classes: tiny rasters, extreme nodata sentinels, float32
DEMs, degenerate windows, empty inputs)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dronedb_spark.sources.cog import cog_info, decode_cog_level, encode_cog


def test_tiny_raster_cog_roundtrip():
    # TinyRasterCog: rasters smaller than one tile — single level, no
    # spurious overviews, exact pixel parity
    for shape in [(1, 1), (3, 2), (5, 7)]:
        arr = (np.arange(shape[0] * shape[1], dtype=np.float64)
               .reshape(shape) * 1.5 - 2.0)
        data = encode_cog(arr, pixel_scale=(1.0, 1.0), tiepoint=(0.0, 0.0))
        info = cog_info(data)
        assert info["levels"][0]["width"] == shape[1]
        assert info["levels"][0]["height"] == shape[0]
        got = decode_cog_level(data, 0)
        assert np.array_equal(got, arr)


def test_extreme_nodata_sentinels_survive_roundtrip():
    # NodataExtremeNegFloat / NodataExtremePositive / NodataInfinity:
    # the sentinel must survive encode→decode bit-exactly
    for nd in [-3.4028234663852886e38, 3.4028234663852886e38, float("inf"),
               -9999.0]:
        arr = np.full((4, 4), 7.25)
        arr[0, 0] = nd
        data = encode_cog(arr, nodata=nd)
        got = decode_cog_level(data, 0)
        if math.isinf(nd):
            assert math.isinf(got[0, 0])
        else:
            assert got[0, 0] == nd
        assert got[1, 1] == 7.25


def test_float32_dem_values_roundtrip():
    # Dem32BitFloat: float32 storage keeps float32-exact values
    rng = np.random.default_rng(5)
    arr = rng.normal(1500.0, 300.0, (40, 33)).astype(np.float32)
    data = encode_cog(arr.astype(np.float64), tile=16)
    got = decode_cog_level(data, 0)
    assert np.allclose(got, arr, rtol=1e-6)
    # overview pyramid exists for >1-tile rasters
    assert len(cog_info(data)["levels"]) >= 2


def test_bilinear_blend_custom_nodata_infinity(spark):
    # a raster whose nodata sentinel is +inf must mask like any other
    from dronedb_spark.raster.region import bilinear_region

    inf = float("inf")
    px = spark.createDataFrame(
        [{"row": 0, "col": 0, "v": 2.0}, {"row": 0, "col": 1, "v": inf},
         {"row": 1, "col": 0, "v": 4.0}, {"row": 1, "col": 1, "v": inf}]
    )
    [row] = bilinear_region(px, ["v"], 0, 1, 0, 1, 1, 1, nodata=inf).collect()
    assert row["v"] == pytest.approx(3.0)  # inf corners dropped, renormalized


def test_empty_inputs_produce_empty_results(spark):
    from dronedb_spark.raster.points import splat_tile
    from dronedb_spark.raster.region import render_index_region

    pts = spark.createDataFrame(
        [{"pid": 1, "x": 900.0, "y": 900.0, "z": 1.0,
          "red": 1, "green": 1, "blue": 1}]
    )
    # no point lands in this tile → zero rows, not an error
    assert splat_tile(pts, 0.0, 0.0, 100.0, 100.0, tile_size=8).count() == 0
    # an index window fully outside the raster → all-transparent
    ms = spark.createDataFrame([{"row": 0, "col": 0, "N": 0.5, "R": 0.25}])
    rows = render_index_region(ms, "NDVI", 50, 57, 50, 57, 4, 4).collect()
    assert len(rows) == 16 and all(r["a"] == 0 for r in rows)


def test_area_stats_empty_roi(spark):
    from dronedb_spark.raster.stats import area_stats
    from dronedb_spark.raster.synth import dem_df

    # ROI entirely inside the DEM's nodata patch → zero valid pixels
    [row] = area_stats(dem_df(spark), 6, 9, 101, 109).collect()
    assert row["pixel_count"] == 0
    assert row["v_min"] is None and row["v_max"] is None


def test_cog_strip_sized_tiles():
    # StripGlobal analog: a tile width covering the full row behaves
    # like strip layout; the reader must still window correctly
    arr = (np.arange(8 * 64, dtype=np.float64)).reshape(8, 64)
    data = encode_cog(arr, tile=64)
    got = decode_cog_level(data, 0)
    assert np.array_equal(got, arr)
