"""Model entry parsing laws: OBJ/glTF/GLB bounds, node-transform
baking, the sidecar search priority + range checks, and the
best-effort contract (reference entry.cpp:656-709, 3d.cpp:326-389)."""

from __future__ import annotations

import json
import math
import os

from dronedb_spark.sources.model3d import (
    detect_model_georef,
    glb_json,
    gltf_bounds,
    model_footprint,
    obj_bounds,
    parse_model_entry,
)
from dronedb_spark.sources.model_check import _glb_bytes, _obj_bytes


def test_obj_bounds_and_fan_triangulation():
    data = _obj_bytes(
        [(-1.0, -2.0, 0.0), (3.0, 4.0, 5.0), (0.0, 0.0, 1.0)],
        [(1, 2, 3), (1, 2, 3, 1, 2)],  # tri + 5-gon (3 triangles)
    )
    b = obj_bounds(data)
    assert b["min"] == (-1.0, -2.0, 0.0)
    assert b["max"] == (3.0, 4.0, 5.0)
    assert b["faces"] == 4
    assert obj_bounds(b"# empty\nf 1 2 3\n") is None  # no vertices


def test_gltf_transform_baking():
    doc = {
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {
                "mesh": 0,
                "translation": [100.0, 0.0, 0.0],
                "scale": [2.0, 1.0, 1.0],
            }
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "accessors": [
            {"count": 3, "min": [-1.0, -1.0, 0.0], "max": [1.0, 1.0, 2.0]}
        ],
    }
    b = gltf_bounds(doc)
    # scale 2 on X then translate +100: [-1,1] -> [98, 102]
    assert b["min"] == (98.0, -1.0, 0.0)
    assert b["max"] == (102.0, 1.0, 2.0)
    assert b["faces"] == 1


def test_gltf_rotation_quaternion():
    # 90 deg about Z: (x,y) -> (-y, x); box [-1,2]x[0,1] -> [-1,0]x[-1,2]
    s = math.sin(math.pi / 4)
    doc = {
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "rotation": [0.0, 0.0, s, math.cos(math.pi / 4)]}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "accessors": [
            {"count": 3, "min": [-1.0, 0.0, 0.0], "max": [2.0, 1.0, 0.0]}
        ],
    }
    b = gltf_bounds(doc)
    assert all(abs(a - e) < 1e-9 for a, e in zip(b["min"], (-1.0, -1.0, 0.0)))
    assert all(abs(a - e) < 1e-9 for a, e in zip(b["max"], (0.0, 2.0, 0.0)))


def test_glb_container_roundtrip():
    doc = {"scenes": [], "nodes": []}
    data = _glb_bytes(doc)
    assert glb_json(data) == doc
    assert glb_json(b"notglTF" + data) is None
    assert glb_json(data[:10]) is None


def _write(tmp_path, rel, payload):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(payload if isinstance(payload, bytes) else payload.encode())
    return str(p)


def test_sidecar_priority_and_range_skip(tmp_path):
    model = _write(tmp_path, "m/model.obj", _obj_bytes([(0.0, 0.0, 0.0)], []))
    # lowest-priority candidate present
    _write(tmp_path, "opensfm/reference_lla.json",
           json.dumps({"latitude": 1.0, "longitude": 2.0}))
    g = detect_model_georef(model)
    assert (g["lat"], g["lon"], g["alt"]) == (1.0, 2.0, 0.0)
    # higher-priority georef.json wins once present
    _write(tmp_path, "m/georef.json",
           json.dumps({"lat": 3.0, "lng": 4.0, "elevation": 9.5}))
    g = detect_model_georef(model)
    assert (g["lat"], g["lon"], g["alt"]) == (3.0, 4.0, 9.5)
    # stem sidecar beats georef.json — but out-of-range lat is SKIPPED
    stem = _write(tmp_path, "m/model.geo.json",
                  json.dumps({"latitude": 95.0, "longitude": 0.0}))
    g = detect_model_georef(model)
    assert g["lat"] == 3.0
    # valid stem sidecar wins outright
    os.unlink(stem)
    _write(tmp_path, "m/model.geo.json",
           json.dumps({"latitude": -10.0, "longitude": -20.0, "alt": 7.0}))
    g = detect_model_georef(model)
    assert (g["lat"], g["lon"], g["alt"]) == (-10.0, -20.0, 7.0)


def test_parse_model_entry_best_effort(tmp_path):
    # no sidecar at all -> local space, never raises
    model = _write(tmp_path, "x/a.obj", _obj_bytes([(0.0, 0.0, 0.0)], []))
    assert parse_model_entry("x/a.obj", open(model, "rb").read(), model) == {
        "georeferenced": False
    }
    # corrupt sidecar JSON is skipped silently
    _write(tmp_path, "x/georef.json", b"{not json")
    assert parse_model_entry("x/a.obj", open(model, "rb").read(), model) == {
        "georeferenced": False
    }
    # georef but unreadable mesh: origin without footprint
    nxs = _write(tmp_path, "x/a.nxz", b"\x00\x01\x02")
    _write(tmp_path, "x/a.geo.json",
           json.dumps({"latitude": 5.0, "longitude": 6.0}))
    props = parse_model_entry("x/a.nxz", b"\x00\x01\x02", nxs)
    assert props["georeferenced"] is True
    assert props["point_lat"] == 5.0 and "_bbox" not in props


def test_footprint_pole_guard():
    g = {"lat": 89.9999, "lon": 0.0, "alt": 0.0}
    b = {"min": (-1000.0, 0.0, 0.0), "max": (1000.0, 0.0, 0.0)}
    west, _, east, _ = model_footprint(g, b)
    # cos(lat) ~ 0 clamps at 0.01: span stays finite
    assert math.isfinite(west) and math.isfinite(east)
    assert east - west <= 2000.0 / (111320.0 * 0.01) + 1e-9
