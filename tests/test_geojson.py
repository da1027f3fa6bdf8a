"""S8 GeoJSON reader: real files on disk, deep nesting, fid fallbacks."""

from __future__ import annotations

import json

from dronedb_spark.sources.geojson import read_geojson


def _fc(features):
    return json.dumps({"type": "FeatureCollection", "features": features})


def test_read_geojson_files(spark, tmp_path):
    (tmp_path / "parcels.geojson").write_text(
        _fc(
            [
                {
                    "type": "Feature",
                    "id": 7,
                    "geometry": {
                        "type": "MultiPolygon",
                        "coordinates": [
                            [[[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [0.0, 0.0]]],
                            [[[5.0, 5.0], [6.0, 5.0], [6.0, 7.5], [5.0, 5.0]]],
                        ],
                    },
                    "properties": {"zone": "A", "area": 12},
                },
                {
                    # no id → positional fid; null geometry tolerated
                    "type": "Feature",
                    "geometry": None,
                    "properties": {},
                },
            ]
        )
    )
    (tmp_path / "pois.geojson").write_text(
        _fc(
            [
                {
                    "type": "Feature",
                    "id": 1,
                    "geometry": {"type": "Point", "coordinates": [-91.5, 46.75]},
                    "properties": {"name": "dock"},
                }
            ]
        )
    )

    out = read_geojson(spark, str(tmp_path)).orderBy("dataset_id", "fid").collect()
    assert [(r.dataset_id, r.fid) for r in out] == [("parcels", 1), ("parcels", 7), ("pois", 1)]

    multi = next(r for r in out if r.fid == 7)
    assert multi.geom_type == "MultiPolygon"
    # bbox spans BOTH polygons (recursive walk, depth 4)
    assert (multi.bbox_minx, multi.bbox_miny, multi.bbox_maxx, multi.bbox_maxy) == (0.0, 0.0, 6.0, 7.5)
    assert multi.n_vertices == 8
    assert multi.n_props == 2

    empty = next(r for r in out if r.dataset_id == "parcels" and r.fid == 1)
    assert empty.geom_type is None and empty.bbox_minx is None and empty.n_vertices == 0

    pt = next(r for r in out if r.dataset_id == "pois")
    assert pt.bbox_minx == pt.bbox_maxx == -91.5 and pt.n_vertices == 1


def test_geojson_feeds_vector_query(spark, tmp_path):
    """The parsed features table drives R14 paging/bbox directly."""
    from dronedb_spark.operators.vector_query import query_vector

    feats = [
        {
            "type": "Feature",
            "id": i,
            "geometry": {"type": "Point", "coordinates": [float(i), float(i) / 2.0]},
            "properties": {},
        }
        for i in range(10)
    ]
    (tmp_path / "grid.geojson").write_text(_fc(feats))
    df = read_geojson(spark, str(tmp_path))
    hit = query_vector(df, "grid", "grid", bbox=(2.5, 0.0, 6.5, 90.0), max_features=3)
    assert [r.fid for r in hit.collect()] == [3, 4, 5]


def test_shapefile_roundtrip_parse():
    from dronedb_spark.sources.shapefile import encode_dbf, encode_shp, parse_dbf, parse_shp

    shapes = [
        (1, [(10.5, -3.25)]),
        (3, [(0.0, 0.0), (1.5, 2.5), (3.0, 1.0)]),
        (5, [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]),
        (8, [(5.0, 5.0), (6.0, 7.0)]),
    ]
    recs = parse_shp(encode_shp(shapes))
    assert [r["geom_type"] for r in recs] == ["Point", "LineString", "Polygon", "MultiPoint"]
    assert [r["fid"] for r in recs] == [1, 2, 3, 4]
    assert recs[2]["points"][0] == recs[2]["points"][-1]  # ring closed
    assert recs[1]["points"] == [(0.0, 0.0), (1.5, 2.5), (3.0, 1.0)]

    fields = [("NAME", "C", 8, 0), ("KIND", "N", 4, 0), ("VAL", "N", 10, 3)]
    rows = [{"NAME": "a", "KIND": 2, "VAL": 1.5}, {"NAME": "bb", "KIND": 11, "VAL": -0.125}]
    names, parsed = parse_dbf(encode_dbf(fields, rows))
    assert names == ["NAME", "KIND", "VAL"]
    assert parsed[0] == {"NAME": "a", "KIND": 2, "VAL": 1.5}
    assert parsed[1]["KIND"] == 11 and parsed[1]["VAL"] == -0.125


def test_gpkg_roundtrip():
    from dronedb_spark.sources.gpkg import _decode_gpkg_bytes, encode_gpkg, parse_wkb

    feats = [
        {"fid": 1, "geom_type": "Point", "points": [(-120.5, 45.25)], "props": {"name": "a"}},
        {"fid": 2, "geom_type": "LineString", "points": [(0.0, 0.0), (1.5, 2.5)],
         "props": {"name": "b"}},
        {"fid": 3, "geom_type": "Polygon",
         "points": [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)], "props": {"name": "c"}},
    ]
    rows = _decode_gpkg_bytes("ds", encode_gpkg({"roads": feats}))
    assert [r["fid"] for r in rows] == [1, 2, 3]
    assert [r["geom_type"] for r in rows] == ["Point", "LineString", "Polygon"]
    assert rows[0]["bbox_minx"] == -120.5 and rows[2]["bbox_maxy"] == 2.0
    assert all(r["layer"] == "roads" and r["n_props"] == 2 for r in rows)

    # big-endian WKB also parses
    import struct

    be = struct.pack(">BIdd", 0, 1, 3.5, -7.25)
    assert parse_wkb(be) == ("Point", [(3.5, -7.25)])


def test_gaia_blob_roundtrip():
    from dronedb_spark.sources.sqlite_catalog import (
        encode_gaia_pointz, encode_gaia_polygonz, parse_gaia_blob,
    )

    cls, pts = parse_gaia_blob(encode_gaia_pointz(-91.9, 46.8, 120.5))
    assert cls == 1001 and pts == [(-91.9, 46.8, 120.5)]
    ring = [(0.0, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 1.0, 1.0), (0.0, 0.0, 1.0)]
    cls, pts = parse_gaia_blob(encode_gaia_polygonz(ring))
    assert cls == 1003 and pts == ring


def test_dxf_roundtrip_parse():
    from dronedb_spark.sources.dxf import encode_dxf, parse_dxf

    ents = [
        {"geom_type": "Point", "points": [(1.5, -2.25)], "layer": "a"},
        {"geom_type": "LineString", "points": [(0.0, 0.0), (3.0, 4.0)], "layer": "b"},
        {"geom_type": "Polygon", "layer": "a",
         "points": [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]},
    ]
    got = parse_dxf(encode_dxf(ents))
    assert [g["geom_type"] for g in got] == ["Point", "LineString", "Polygon"]
    assert got[0]["points"] == [(1.5, -2.25)] and got[0]["layer"] == "a"
    assert got[2]["points"][0] == got[2]["points"][-1]  # ring re-closed
    # entities outside the ENTITIES section are ignored
    assert parse_dxf("0\nSECTION\n2\nHEADER\n0\nPOINT\n10\n1\n20\n2\n0\nENDSEC\n0\nEOF\n") == []


def test_fgb_roundtrip_parse():
    from dronedb_spark.sources.fgb import encode_fgb, parse_fgb

    feats = [
        {"geom_type": "Point", "points": [(-120.5, 45.25)]},
        {"geom_type": "LineString", "points": [(0.0, 0.0), (1.5, 2.5), (3.0, 1.0)]},
        {"geom_type": "Polygon",
         "points": [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]},
    ]
    doc = parse_fgb(encode_fgb("roads", "LineString", feats))
    assert doc["name"] == "roads" and doc["geom_type"] == "LineString"
    assert [f["geom_type"] for f in doc["features"]] == ["Point", "LineString", "Polygon"]
    assert doc["features"][0]["points"] == [(-120.5, 45.25)]
    assert doc["features"][1]["points"][1] == (1.5, 2.5)

    import pytest

    with pytest.raises(ValueError):
        parse_fgb(b"not a flatgeobuf")
