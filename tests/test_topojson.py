"""TopoJSON decode unit coverage beyond the driver check: the
no-transform (absolute float) path, Multi* fan-out, and arc reversal."""

from __future__ import annotations

from dronedb_spark.sources.topojson import _decode_arcs, decode_geometry


def _doc(transform=None, arcs=()):
    d = {"type": "Topology", "arcs": list(arcs)}
    if transform:
        d["transform"] = transform
    return d


def test_absolute_arcs_no_transform():
    doc = _doc(arcs=[[[1.5, 2.5], [3.0, 4.0]]])
    arcs = _decode_arcs(doc)
    assert arcs == [[(1.5, 2.5), (3.0, 4.0)]]
    t, pts = decode_geometry(doc, {"type": "LineString", "arcs": [0]}, arcs)
    assert t == "LineString" and pts == [(1.5, 2.5), (3.0, 4.0)]


def test_negative_index_reverses_and_stitches():
    doc = _doc(
        transform={"scale": [1.0, 1.0], "translate": [0.0, 0.0]},
        arcs=[[[0, 0], [1, 0]], [[0, 0], [1, 1]]],  # a: (0,0)->(1,0); b: (0,0)->(1,1)
    )
    arcs = _decode_arcs(doc)
    # ring = a then ~b: (0,0),(1,0) + reversed b (1,1),(0,0) — no shared
    # junction between a's end and ~b's start, so all 4 survive
    t, pts = decode_geometry(doc, {"type": "Polygon", "arcs": [[0, ~1]]}, arcs)
    assert pts == [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]


def test_junction_point_dropped():
    doc = _doc(
        transform={"scale": [1.0, 1.0], "translate": [0.0, 0.0]},
        arcs=[[[0, 0], [1, 0]], [[1, 0], [1, 1]]],  # b starts where a ends
    )
    arcs = _decode_arcs(doc)
    _, pts = decode_geometry(doc, {"type": "LineString", "arcs": [0, 1]}, arcs)
    assert pts == [(0.0, 0.0), (1.0, 0.0), (2.0, 1.0)]


def test_multipolygon_counts_all_rings():
    doc = _doc(
        transform={"scale": [0.5, 0.5], "translate": [10.0, 20.0]},
        arcs=[[[0, 0], [2, 0], [0, 2], [-2, 0], [0, -2]], [[8, 8], [2, 0], [-2, 0]]],
    )
    arcs = _decode_arcs(doc)
    t, pts = decode_geometry(doc, {"type": "MultiPolygon", "arcs": [[[0]], [[1]]]}, arcs)
    assert t == "MultiPolygon"
    assert len(pts) == 8
    assert pts[0] == (10.0, 20.0)
    assert pts[5] == (14.0, 24.0)


def test_multipoint_transformed():
    doc = _doc(transform={"scale": [0.01, 0.01], "translate": [-120.0, 30.0]})
    t, pts = decode_geometry(
        doc, {"type": "MultiPoint", "coordinates": [[100, 200], [300, 400]]}, []
    )
    assert t == "MultiPoint"
    assert pts == [(100 * 0.01 - 120.0, 200 * 0.01 + 30.0), (300 * 0.01 - 120.0, 400 * 0.01 + 30.0)]
