"""Mirror of the reference's own MVT zoom-heuristic test expectations
(tests/mvt_density_test.cpp) against our twin `mvt_max_zoom`."""

from __future__ import annotations

import math

from dronedb_spark.functions.geo import mvt_max_zoom

GLOBE = 360.0 * 180.0


def test_empty_or_degenerate_returns_max():
    # mvt_density_test.cpp:20-31
    assert mvt_max_zoom(1.0, feature_count=0) == 18
    assert mvt_max_zoom(0.0, feature_count=1) == 18
    assert mvt_max_zoom(0.0, feature_count=1000) == 18


def test_small_extent_saturates_to_max():
    # mvt_density_test.cpp:33-43: sub-centidegree² saturates; 1 deg² gives 14
    assert mvt_max_zoom(1e-4) == 18
    assert mvt_max_zoom(1e-6) == 18
    assert mvt_max_zoom(1.0) == 14


def test_feature_count_irrelevant_for_positive_counts():
    # mvt_density_test.cpp:45-52
    assert mvt_max_zoom(GLOBE, feature_count=1) == mvt_max_zoom(GLOBE, feature_count=10_000_000)


def test_global_dataset_forced_to_overview_only():
    # mvt_density_test.cpp:54-66: >10% of globe → min cap 5
    assert mvt_max_zoom(GLOBE) == 5
    assert mvt_max_zoom(0.10 * GLOBE + 1.0) == 5


def test_large_but_non_global_uses_budget_formula():
    # mvt_density_test.cpp:68-82
    area = (0.10 - 0.01) * GLOBE
    z = mvt_max_zoom(area)
    expected = int(math.floor(0.5 * math.log2(10000.0 * GLOBE / area)))
    assert z == max(5, min(18, expected))


def test_bounds_always_clamped():
    # mvt_density_test.cpp:84-98
    for fc in (0, 1, 100, 10000, 1000000, 10**9):
        for a in (0.0, 1e-6, 0.1, 1.0, 100.0, 64800.0, 1e9):
            assert 5 <= mvt_max_zoom(a, feature_count=fc) <= 18


def test_monotonic_in_extent():
    # mvt_density_test.cpp:100-110
    prev = 18
    for a in (1e-3, 1.0, 100.0, 1000.0, 10000.0, 64800.0, 1e6):
        z = mvt_max_zoom(a, feature_count=1000)
        assert z <= prev
        prev = z


def test_mvt_encode_quantizes_to_tile_local_grid(spark, sf_dir):
    from dronedb_spark.functions.mvt import EXTENT, mvt_encode, mvt_tile_summary, zoom_for_layer
    from dronedb_spark.operators.vector_query import features_df
    from pyspark.sql import functions as F

    feats = features_df(spark, sf_dir).filter(
        (F.col("dataset_id") == "vec1") & (F.col("layer") == "parcels")
    )
    enc = mvt_encode(feats, 10)
    bad = enc.filter(
        (F.col("u") < 0) | (F.col("u") >= EXTENT) | (F.col("v") < 0) | (F.col("v") >= EXTENT)
    ).count()
    assert bad == 0
    summ = mvt_tile_summary(enc).collect()
    assert sum(r["n_features"] for r in summ) == feats.count()
    for r in summ:
        assert 1 <= r["n_points"] <= r["n_features"]
        assert r["min_u"] <= r["max_u"] and r["min_v"] <= r["max_v"]
    # zoom budget caps the request: parcels span a wide extent, so a huge
    # requested zoom comes back clamped to the [5, 18] budget range
    z = zoom_for_layer(features_df(spark, sf_dir), "vec1", "parcels", 30)
    assert 5 <= z <= 18
