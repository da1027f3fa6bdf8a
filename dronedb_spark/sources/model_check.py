"""Driver check for Model (.obj/.glTF/.glb) entry properties — the S5
gap named by the r8 verdict (reference ``parseModelEntry``,
entry.cpp:656-709; sidecar search ``detectModelGeoref``, 3d.cpp:326-389).

Fixture tree (REAL mesh + sidecar bytes, idempotent like exif_v1):

* ``proj1/model.obj`` + ``model.geo.json``  — stem sidecar (priority 1),
  OBJ bounds → equirectangular footprint.
* ``proj2/odm_texturing/odm_textured_model_geo.obj`` +
  ``proj2/reference_lla.json``  — the OpenDroneMap parent-dir layout,
  short keys (lat/lon/alt).
* ``proj3/scene.gltf`` + ``georef.json``  — glTF POSITION accessor
  min/max with a node TRANSLATION baked into the bounds.
* ``proj4/model.glb``  — GLB container, NO sidecar → georeferenced=false.
* ``proj5/model.obj`` + out-of-range ``model.geo.json`` (lat 95) +
  valid ``georef.json``  — the bad candidate must be SKIPPED and the
  search continue (3d.cpp range check).
* ``proj6/sub/model.obj`` + ``proj6/opensfm/reference_lla.json``  —
  the opensfm-sibling ODM layout (last candidate).

The oracle restates the expected values as literals computed with the
SAME Python arithmetic (math.cos; equirectangular constants), so both
sides are bit-identical doubles — a value-level check of the byte
parsers and the sidecar priority chain, not a tautology.
"""

from __future__ import annotations

import json
import math
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import ENTRY_TYPES
from dronedb_spark.suite import check

_SENT = -999.0  # NULL sentinel: driver comparator sorts rows, None is unordered


def _obj_bytes(verts: list[tuple], faces: list[tuple]) -> bytes:
    lines = ["# fixture mesh"]
    lines += [f"v {x} {y} {z}" for x, y, z in verts]
    lines += ["f " + " ".join(str(i) for i in f) for f in faces]
    return ("\n".join(lines) + "\n").encode()


_OBJ1_VERTS = [
    (-12.5, -8.25, 0.0),
    (20.0, -8.25, 0.0),
    (20.0, 14.5, 9.0),
    (-12.5, 14.5, 9.0),
    (3.75, 3.0, 11.25),
]
_OBJ2_VERTS = [(-5.0, -4.0, 0.0), (6.5, -4.0, 0.0), (6.5, 8.0, 3.5), (-5.0, 8.0, 3.5)]
_OBJ6_VERTS = [(-1.5, -2.5, 0.0), (4.0, 3.0, 2.0)]

_GLTF3 = {
    "asset": {"version": "2.0"},
    "scene": 0,
    "scenes": [{"nodes": [0]}],
    # root translates the mesh +10 East, −5 North; the child reuses the
    # same mesh shifted a further +2 East (transform baking must union
    # BOTH boxes)
    "nodes": [
        {"mesh": 0, "translation": [10.0, -5.0, 0.0], "children": [1]},
        {"mesh": 0, "translation": [2.0, 0.0, 0.0]},
    ],
    "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "mode": 4}]}],
    "accessors": [
        {
            "type": "VEC3",
            "componentType": 5126,
            "count": 24,
            "min": [-3.0, -2.0, 0.0],
            "max": [3.0, 2.0, 4.0],
        }
    ],
}


def _glb_bytes(doc: dict) -> bytes:
    payload = json.dumps(doc).encode()
    pad = (4 - len(payload) % 4) % 4
    payload += b" " * pad
    total = 12 + 8 + len(payload)
    return (
        b"glTF"
        + struct.pack("<II", 2, total)
        + struct.pack("<II", len(payload), 0x4E4F534A)
        + payload
    )


_SIDECARS: dict[str, dict] = {
    "proj1/model.geo.json": {"latitude": 45.5, "longitude": 7.25, "altitude": 310.5},
    "proj2/reference_lla.json": {"lat": -33.75, "lon": 151.125, "alt": 42.0},
    "proj3/georef.json": {"latitude": 63.25, "lng": -21.5, "elevation": 120.0},
    "proj5/model.geo.json": {"latitude": 95.0, "longitude": 7.0},  # out of range
    "proj5/georef.json": {"latitude": 10.5, "longitude": 20.25},  # alt defaults 0
    "proj6/opensfm/reference_lla.json": {"latitude": 46.0625, "longitude": 11.125,
                                         "altitude": 900.25},
}

_MODELS: dict[str, bytes] = {
    "proj1/model.obj": _obj_bytes(
        _OBJ1_VERTS, [(1, 2, 3, 4), (1, 2, 5)]
    ),
    "proj2/odm_texturing/odm_textured_model_geo.obj": _obj_bytes(
        _OBJ2_VERTS, [(1, 2, 3), (1, 3, 4)]
    ),
    "proj3/scene.gltf": json.dumps(_GLTF3).encode(),
    "proj4/model.glb": _glb_bytes(_GLTF3),
    "proj5/model.obj": _obj_bytes([(0.0, 0.0, 0.0), (1.0, 1.0, 1.0)], []),
    "proj6/sub/model.obj": _obj_bytes(_OBJ6_VERTS, []),
}


def fixture_root() -> str:
    root = os.path.abspath(
        os.path.join(
            os.path.dirname(__file__), "..", "..", "tests", "fixtures", "model_v1"
        )
    )
    files = dict(_MODELS)
    files.update(
        {rel: json.dumps(doc).encode() for rel, doc in _SIDECARS.items()}
    )
    for rel, payload in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


def _bbox(lat: float, lon: float, mins, maxs) -> tuple:
    m_lon = 111320.0 * max(0.01, abs(math.cos(math.radians(lat))))
    return (
        lon + mins[0] / m_lon,
        lat + mins[1] / 111320.0,
        lon + maxs[0] / m_lon,
        lat + maxs[1] / 111320.0,
    )


def _gltf_box(doc: dict) -> tuple[tuple, tuple]:
    """Expected union box of the fixture glTF (root at +10,−5 plus the
    child at +12,−5 — written out with the same float arithmetic)."""
    lo = doc["accessors"][0]["min"]
    hi = doc["accessors"][0]["max"]
    mins = (min(lo[0] + 10.0, lo[0] + 12.0), lo[1] + -5.0, lo[2])
    maxs = (max(hi[0] + 10.0, hi[0] + 12.0), hi[1] + -5.0, hi[2])
    return mins, maxs


def _expected() -> list[tuple]:
    rows = []
    g1 = _SIDECARS["proj1/model.geo.json"]
    mins = tuple(min(v[i] for v in _OBJ1_VERTS) for i in range(3))
    maxs = tuple(max(v[i] for v in _OBJ1_VERTS) for i in range(3))
    rows.append(
        ("proj1/model.obj", 1, g1["longitude"], g1["latitude"], g1["altitude"])
        + _bbox(g1["latitude"], g1["longitude"], mins, maxs)
    )
    g2 = _SIDECARS["proj2/reference_lla.json"]
    mins = tuple(min(v[i] for v in _OBJ2_VERTS) for i in range(3))
    maxs = tuple(max(v[i] for v in _OBJ2_VERTS) for i in range(3))
    rows.append(
        ("proj2/odm_texturing/odm_textured_model_geo.obj", 1,
         g2["lon"], g2["lat"], g2["alt"])
        + _bbox(g2["lat"], g2["lon"], mins, maxs)
    )
    g3 = _SIDECARS["proj3/georef.json"]
    mins, maxs = _gltf_box(_GLTF3)
    rows.append(
        ("proj3/scene.gltf", 1, g3["lng"], g3["latitude"], g3["elevation"])
        + _bbox(g3["latitude"], g3["lng"], mins, maxs)
    )
    rows.append(
        ("proj4/model.glb", 0, _SENT, _SENT, _SENT, _SENT, _SENT, _SENT, _SENT)
    )
    g5 = _SIDECARS["proj5/georef.json"]
    rows.append(
        ("proj5/model.obj", 1, g5["longitude"], g5["latitude"], 0.0)
        + _bbox(g5["latitude"], g5["longitude"], (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    )
    g6 = _SIDECARS["proj6/opensfm/reference_lla.json"]
    rows.append(
        ("proj6/sub/model.obj", 1, g6["longitude"], g6["latitude"], g6["altitude"])
        + _bbox(g6["latitude"], g6["longitude"], _OBJ6_VERTS[0], _OBJ6_VERTS[1])
    )
    return rows


def _lit(v) -> str:
    # string→double (strtod, correctly rounded) — a bare decimal literal
    # in DuckDB VALUES types as DECIMAL first and can land 1 ulp off
    if isinstance(v, float):
        return f"CAST('{v!r}' AS DOUBLE)"
    return repr(v)


def _oracle() -> str:
    values = ",\n            ".join(
        "('" + r[0] + "', " + ", ".join(_lit(v) for v in r[1:]) + ")"
        for r in _expected()
    )
    return f"""
        SELECT path, CAST(georeferenced AS INT) AS georeferenced,
               CAST(lon AS DOUBLE) AS lon, CAST(lat AS DOUBLE) AS lat,
               CAST(alt AS DOUBLE) AS alt,
               CAST(west AS DOUBLE) AS west, CAST(south AS DOUBLE) AS south,
               CAST(east AS DOUBLE) AS east, CAST(north AS DOUBLE) AS north
        FROM (VALUES
            {values}) AS t(path, georeferenced, lon, lat, alt,
                           west, south, east, north)
        ORDER BY path"""


# ------------------------------------------- nxs-role mesh build check --

# Two root nodes share one 4-vertex quad mesh (positions float32,
# indices u16 in the GLB BIN chunk): node A scales X by 2 then
# translates +10 East; node B translates +5 North.  All coordinates are
# small integers, so the transformed corners are EXACT in float32 →
# float64 and the oracle can state every row literally.
_MESH_POS = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 1.0, 0.0)]
_MESH_IDX = [0, 1, 2, 2, 1, 3]
_MESH_DOC = {
    "asset": {"version": "2.0"},
    "scene": 0,
    "scenes": [{"nodes": [0, 1]}],
    "nodes": [
        {"mesh": 0, "translation": [10.0, 0.0, 0.0], "scale": [2.0, 1.0, 1.0]},
        {"mesh": 0, "translation": [0.0, 5.0, 0.0]},
    ],
    "meshes": [
        {"primitives": [{"attributes": {"POSITION": 0}, "indices": 1, "mode": 4}]}
    ],
    "accessors": [
        {
            "bufferView": 0,
            "componentType": 5126,
            "count": 4,
            "type": "VEC3",
            "min": [0.0, 0.0, 0.0],
            "max": [1.0, 1.0, 0.0],
        },
        {"bufferView": 1, "componentType": 5123, "count": 6, "type": "SCALAR"},
    ],
    "bufferViews": [
        {"buffer": 0, "byteOffset": 0, "byteLength": 48},
        {"buffer": 0, "byteOffset": 48, "byteLength": 12},
    ],
    "buffers": [{"byteLength": 60}],
}


def _mesh_bin() -> bytes:
    out = b"".join(struct.pack("<3f", *p) for p in _MESH_POS)
    out += b"".join(struct.pack("<H", i) for i in _MESH_IDX)
    return out


def _glb_full_bytes(doc: dict, bin_chunk: bytes) -> bytes:
    payload = json.dumps(doc).encode()
    payload += b" " * ((4 - len(payload) % 4) % 4)
    bin_padded = bin_chunk + b"\x00" * ((4 - len(bin_chunk) % 4) % 4)
    total = 12 + 8 + len(payload) + 8 + len(bin_padded)
    return (
        b"glTF"
        + struct.pack("<II", 2, total)
        + struct.pack("<II", len(payload), 0x4E4F534A)
        + payload
        + struct.pack("<II", len(bin_padded), 0x004E4942)
        + bin_padded
    )


def _mesh_expected() -> list[tuple]:
    def xform_a(p):
        return (p[0] * 2.0 + 10.0, p[1], p[2])

    def xform_b(p):
        return (p[0], p[1] + 5.0, p[2])

    rows = []
    fid = 0
    for xf in (xform_a, xform_b):
        verts = [xf(p) for p in _MESH_POS]
        for k in range(0, len(_MESH_IDX), 3):
            a, b, c = (verts[_MESH_IDX[k + j]] for j in range(3))
            rows.append((fid,) + a + b + c)
            fid += 1
    return rows


def _mesh_oracle() -> str:
    cols = ["face_id"] + [f"{n}{ax}" for n in "abc" for ax in "xyz"]
    values = ",\n            ".join(
        "(" + ", ".join(_lit(float(v) if i else int(v)) for i, v in enumerate(r)) + ")"
        for r in _mesh_expected()
    )
    sel = ", ".join(
        f"CAST({c} AS {'BIGINT' if c == 'face_id' else 'DOUBLE'}) AS {c}"
        for c in cols
    )
    return f"""
        SELECT {sel} FROM (VALUES
            {values}) AS t({", ".join(cols)})
        ORDER BY face_id"""


@check("model_mesh_build_table", oracle=_mesh_oracle())
def q_model_mesh_build_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model→nxs-role build over a REAL self-contained GLB: the Arrow
    build kernel decodes positions+indices from the BIN chunk, bakes
    both nodes' TRS transforms per-vertex (Assimp root-frame
    convention), assembles triangles, and writes the mesh table the
    nexus LOD stage would consume (build.cpp:51-53 / 3d.cpp:289-325).
    Every triangle corner is checked value-for-value."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from dronedb_spark.catalog.build import (
        ARTIFACT_FILES,
        _artifact_dir,
        build_all,
    )
    from dronedb_spark.catalog.store import DatasetCatalog

    root = tempfile.mkdtemp(prefix="mm_")
    try:
        p = os.path.join(root, "model.glb")
        with open(p, "wb") as f:
            f.write(_glb_full_bytes(_MESH_DOC, _mesh_bin()))
        os.utime(p, (1700000000, 1700000000))
        cat = DatasetCatalog.init(spark, root)
        cat.add()
        counts = build_all(cat)
        assert counts == {"nxs": 1}, counts
        h = {r["path"]: r["hash"] for r in cat.entries().collect()}["model.glb"]
        mesh = pq.read_table(
            os.path.join(_artifact_dir(root, h, "nxs"), ARTIFACT_FILES["nxs"])
        )
        rows = [tuple(r) for r in zip(*(mesh.column(i).to_pylist()
                                        for i in range(mesh.num_columns)))]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    cols = ["face_id"] + [f"{n}{ax}" for n in "abc" for ax in "xyz"]
    schema = ", ".join(
        f"{c} {'long' if c == 'face_id' else 'double'}" for c in cols
    )
    return spark.createDataFrame(sorted(rows), schema).orderBy("face_id")


@check("model_entry_props", oracle=_oracle())
def q_model_entry_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL .obj/.gltf/.glb bytes + georef sidecars → distributed ingest
    → Model entry properties: the georeferenced flag, the ENU origin as
    the entry point, and the equirectangular footprint MBR from the
    mesh's local bounds (entry.cpp:656-709 parity)."""
    from dronedb_spark.sources.fs import ingest

    ent = ingest(spark, fixture_root())
    s = F.lit(_SENT)
    return (
        ent.filter(F.col("type") == ENTRY_TYPES["Model"])
        .select(
            "path",
            F.when(
                F.get_json_object("properties", "$.georeferenced") == "true",
                F.lit(1),
            ).otherwise(F.lit(0)).cast("int").alias("georeferenced"),
            F.coalesce("point_lon", s).alias("lon"),
            F.coalesce("point_lat", s).alias("lat"),
            F.coalesce("point_alt", s).alias("alt"),
            F.coalesce("bbox_minx", s).alias("west"),
            F.coalesce("bbox_miny", s).alias("south"),
            F.coalesce("bbox_maxx", s).alias("east"),
            F.coalesce("bbox_maxy", s).alias("north"),
        )
        .orderBy("path")
    )
