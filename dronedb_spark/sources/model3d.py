"""Model (.obj / .gltf / .glb) entry properties — the last §1.4 entry
type with real property extraction (reference ``parseModelEntry``,
entry.cpp:656-709, and its helpers ``detectModelGeoref`` /
``getModelInfo``, 3d.cpp:326-389 + nxconv.cpp:403-451).

Semantics reproduced:

* **Georeference detection** is a sidecar search in the reference's
  exact priority order — ``<stem>.geo.json``, ``georef.json``,
  ``reference_lla.json`` (co-located, one level up, or in an
  ``opensfm/`` sibling, the OpenDroneMap project layouts).  Keys
  ``latitude|lat`` / ``longitude|lon|lng`` / ``altitude|alt|elevation``
  (alt defaults 0); out-of-range lat/lon skips the candidate and the
  search continues.  First valid sidecar wins.
* No sidecar → ``properties = {"georeferenced": false}`` and the model
  stays indexed in local space (best-effort, never aborts the parse).
* With a sidecar: ``georeferenced = true``, the entry point is the
  ENU origin (lon, lat, alt), and when the model's local bounds are
  readable the footprint offsets the X/Y bounds (East/North meters)
  around the origin with the reference's equirectangular constants
  (111320 m/deg lat; lon scaled by ``max(0.01, |cos lat|)``).
* **Bounds** come from a pure-Python mesh probe replacing Assimp:
  OBJ ``v`` lines (min/max over vertices, faces triangulated as
  ``n−2`` each), glTF/GLB POSITION accessor ``min``/``max`` (required
  by the glTF 2.0 spec) with node TRS/matrix transforms baked onto the
  8 AABB corners — the same root-frame convention Assimp produces.
  Nexus containers (.nxs/.nxz — vendored codec in the reference) have
  no bounds probe; they still get the georeferenced flag + origin.

Scale shape: the probe runs inside the per-file Arrow ingest kernel —
the worker that owns the model file also stats/reads its (kilobyte)
sidecar from shared storage; no shuffle, no driver involvement.
"""

from __future__ import annotations

import json
import math
import os
import struct

METERS_PER_DEG_LAT = 111320.0


# ------------------------------------------------------------- bounds --


def obj_bounds(data: bytes) -> dict | None:
    """OBJ text → {'min': (x,y,z), 'max': (x,y,z), 'faces': n} or None
    when the file has no vertices."""
    mins = [math.inf] * 3
    maxs = [-math.inf] * 3
    faces = 0
    for raw in data.splitlines():
        if raw[:2] == b"v ":
            parts = raw.split()
            if len(parts) >= 4:
                try:
                    x, y, z = float(parts[1]), float(parts[2]), float(parts[3])
                except ValueError:
                    continue
                for i, v in enumerate((x, y, z)):
                    if v < mins[i]:
                        mins[i] = v
                    if v > maxs[i]:
                        maxs[i] = v
        elif raw[:2] == b"f ":
            n = len(raw.split()) - 1
            if n >= 3:
                faces += n - 2  # fan triangulation, Assimp-style
    if not math.isfinite(mins[0]):
        return None
    return {"min": tuple(mins), "max": tuple(maxs), "faces": faces}


def _trs_matrix(node: dict) -> list[list[float]]:
    """glTF node transform as a row-major 4×4 (spec: M = T·R·S; the
    'matrix' property is column-major)."""
    if "matrix" in node:
        m = node["matrix"]
        return [[m[c * 4 + r] for c in range(4)] for r in range(4)]
    t = node.get("translation", [0.0, 0.0, 0.0])
    q = node.get("rotation", [0.0, 0.0, 0.0, 1.0])  # x, y, z, w
    s = node.get("scale", [1.0, 1.0, 1.0])
    x, y, z, w = q
    rot = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]
    return [
        [rot[r][c] * s[c] for c in range(3)] + [t[r]] for r in range(3)
    ] + [[0.0, 0.0, 0.0, 1.0]]


def _mat_mul(a: list[list[float]], b: list[list[float]]) -> list[list[float]]:
    return [
        [sum(a[r][k] * b[k][c] for k in range(4)) for c in range(4)]
        for r in range(4)
    ]


def _apply(m: list[list[float]], p: tuple[float, float, float]) -> tuple:
    x, y, z = p
    return tuple(
        m[r][0] * x + m[r][1] * y + m[r][2] * z + m[r][3] for r in range(3)
    )


_IDENT = [[1.0 if r == c else 0.0 for c in range(4)] for r in range(4)]


def gltf_bounds(doc: dict) -> dict | None:
    """glTF JSON → root-frame AABB + triangle count.  POSITION accessor
    min/max are mandatory per spec §3.6.2.4, so no buffer decode is
    needed; node transforms are baked by transforming the 8 corners of
    each primitive's accessor box (exact for affine maps of an AABB)."""
    accessors = doc.get("accessors", [])
    meshes = doc.get("meshes", [])
    nodes = doc.get("nodes", [])
    mins = [math.inf] * 3
    maxs = [-math.inf] * 3
    faces = 0
    found = False

    def visit(idx: int, parent: list[list[float]], depth: int) -> None:
        nonlocal faces, found
        if depth > 64 or idx >= len(nodes):  # cycle/garbage guard
            return
        node = nodes[idx]
        m = _mat_mul(parent, _trs_matrix(node))
        if "mesh" in node and node["mesh"] < len(meshes):
            for prim in meshes[node["mesh"]].get("primitives", []):
                pos = prim.get("attributes", {}).get("POSITION")
                if pos is None or pos >= len(accessors):
                    continue
                acc = accessors[pos]
                lo, hi = acc.get("min"), acc.get("max")
                if not lo or not hi or len(lo) < 3 or len(hi) < 3:
                    continue
                found = True
                for corner in (
                    (cx, cy, cz)
                    for cx in (lo[0], hi[0])
                    for cy in (lo[1], hi[1])
                    for cz in (lo[2], hi[2])
                ):
                    wx, wy, wz = _apply(m, corner)
                    for i, v in enumerate((wx, wy, wz)):
                        if v < mins[i]:
                            mins[i] = v
                        if v > maxs[i]:
                            maxs[i] = v
                if prim.get("mode", 4) == 4:  # TRIANGLES
                    if "indices" in prim and prim["indices"] < len(accessors):
                        faces += accessors[prim["indices"]].get("count", 0) // 3
                    else:
                        faces += acc.get("count", 0) // 3
        for child in node.get("children", []):
            visit(child, m, depth + 1)

    scene = doc.get("scene", 0)
    scenes = doc.get("scenes", [])
    roots = (
        scenes[scene].get("nodes", [])
        if scene < len(scenes)
        else list(range(len(nodes)))
    )
    for r in roots:
        visit(r, _IDENT, 0)
    if not found:
        return None
    return {"min": tuple(mins), "max": tuple(maxs), "faces": faces}


def glb_json(data: bytes) -> dict | None:
    """GLB container → the JSON chunk (header: magic 'glTF', u32
    version, u32 length; chunk 0 must be type JSON 0x4E4F534A)."""
    if len(data) < 20 or data[:4] != b"glTF":
        return None
    (clen, ctype) = struct.unpack_from("<II", data, 12)
    if ctype != 0x4E4F534A or 20 + clen > len(data):
        return None
    try:
        return json.loads(data[20 : 20 + clen])
    except ValueError:
        return None


def model_bounds(rel_path: str, data: bytes) -> dict | None:
    ext = os.path.splitext(rel_path)[1].lower()
    if ext == ".obj":
        return obj_bounds(data)
    if ext == ".gltf":
        try:
            return gltf_bounds(json.loads(data))
        except ValueError:
            return None
    if ext == ".glb":
        doc = glb_json(data)
        return gltf_bounds(doc) if doc else None
    return None  # .nxs/.nxz: vendored nexus codec, no pure-Python probe


# -------------------------------------------------------- full meshes --
# (the nxs-role build artifact needs real vertices+faces, not just the
# AABB: reference buildNexus feeds the whole mesh to the vendored nexus
# codec, 3d.cpp:289-325 / build.cpp:51-53)


def obj_mesh(data: bytes) -> dict:
    """OBJ text → {'vertices': [(x,y,z)...], 'faces': [(i,j,k)...]}
    (0-based, fan-triangulated; negative OBJ indices resolved)."""
    verts: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    for raw in data.splitlines():
        if raw[:2] == b"v ":
            parts = raw.split()
            if len(parts) >= 4:
                try:
                    verts.append(
                        (float(parts[1]), float(parts[2]), float(parts[3]))
                    )
                except ValueError:
                    continue
        elif raw[:2] == b"f ":
            idx = []
            for tok in raw.split()[1:]:
                head = tok.split(b"/")[0]
                try:
                    i = int(head)
                except ValueError:
                    idx = []
                    break
                idx.append(i - 1 if i > 0 else len(verts) + i)
            for k in range(1, len(idx) - 1):  # fan triangulation
                faces.append((idx[0], idx[k], idx[k + 1]))
    return {"vertices": verts, "faces": faces}


_COMP_FMT = {5120: "b", 5121: "B", 5122: "h", 5123: "H", 5125: "I", 5126: "f"}
_TYPE_N = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}


def _accessor_values(doc: dict, bin_chunk: bytes, idx: int) -> list[tuple]:
    """Decode one accessor's elements from the GLB BIN chunk (tightly
    packed or strided bufferViews; componentTypes per glTF 2.0 §3.6)."""
    acc = doc["accessors"][idx]
    bv = doc["bufferViews"][acc["bufferView"]]
    fmt = _COMP_FMT[acc["componentType"]]
    n = _TYPE_N[acc["type"]]
    elem = struct.calcsize(fmt) * n
    stride = bv.get("byteStride") or elem
    base = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
    out = []
    for i in range(acc["count"]):
        off = base + i * stride
        out.append(struct.unpack_from("<" + fmt * n, bin_chunk, off))
    return out


def glb_mesh(data: bytes) -> dict:
    """GLB container → fully-decoded mesh with node transforms baked
    per-vertex (the Assimp root-frame convention): {'vertices', 'faces'}.
    Raises NotImplementedError for external (.bin sidecar) buffers —
    only the self-contained GLB layout decodes from one file's bytes."""
    doc = glb_json(data)
    if doc is None:
        raise ValueError("not a GLB container")
    # BIN chunk follows the JSON chunk
    (jlen,) = struct.unpack_from("<I", data, 12)
    pos = 20 + jlen
    bin_chunk = b""
    if pos + 8 <= len(data):
        (blen, btype) = struct.unpack_from("<II", data, pos)
        if btype == 0x004E4942:  # 'BIN\0'
            bin_chunk = data[pos + 8 : pos + 8 + blen]
    for buf in doc.get("buffers", []):
        if "uri" in buf:
            raise NotImplementedError(
                "external glTF buffers (.bin sidecar) are not decoded from "
                "a single file's bytes; supply a self-contained GLB"
            )
    verts: list[tuple] = []
    faces: list[tuple] = []
    nodes = doc.get("nodes", [])
    meshes = doc.get("meshes", [])

    def visit(idx: int, parent, depth: int) -> None:
        if depth > 64 or idx >= len(nodes):
            return
        node = nodes[idx]
        m = _mat_mul(parent, _trs_matrix(node))
        if "mesh" in node and node["mesh"] < len(meshes):
            for prim in meshes[node["mesh"]].get("primitives", []):
                pos_idx = prim.get("attributes", {}).get("POSITION")
                if pos_idx is None or prim.get("mode", 4) != 4:
                    continue
                base = len(verts)
                for p in _accessor_values(doc, bin_chunk, pos_idx):
                    verts.append(_apply(m, p))
                if "indices" in prim:
                    ind = [
                        v[0]
                        for v in _accessor_values(doc, bin_chunk, prim["indices"])
                    ]
                else:
                    ind = list(range(len(verts) - base))
                for k in range(0, len(ind) - 2, 3):
                    faces.append(
                        (base + ind[k], base + ind[k + 1], base + ind[k + 2])
                    )
        for child in node.get("children", []):
            visit(child, m, depth + 1)

    scene = doc.get("scene", 0)
    scenes = doc.get("scenes", [])
    roots = (
        scenes[scene].get("nodes", [])
        if scene < len(scenes)
        else list(range(len(nodes)))
    )
    for r in roots:
        visit(r, _IDENT, 0)
    return {"vertices": verts, "faces": faces}


def model_mesh(rel_path: str, data: bytes) -> dict:
    """Full mesh for the nxs-role build artifact.  OBJ and
    self-contained GLB decode pure-Python; .gltf with external buffers
    and nexus containers stay honest NotImplementedError boundaries."""
    ext = os.path.splitext(rel_path)[1].lower()
    if ext == ".obj":
        return obj_mesh(data)
    if ext == ".glb":
        return glb_mesh(data)
    raise NotImplementedError(
        f"mesh decode for {ext}: true nexus (.nxs/.nxz) multiresolution "
        "encoding is a vendored C++ codec in the reference; .gltf with "
        "external buffers needs sidecar fetch"
    )


# ------------------------------------------------------------ georef --

_LAT_KEYS = ("latitude", "lat")
_LON_KEYS = ("longitude", "lon", "lng")
_ALT_KEYS = ("altitude", "alt", "elevation")


def _num(j: dict, keys: tuple[str, ...]) -> float | None:
    for k in keys:
        v = j.get(k)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return float(v)
    return None


def detect_model_georef(full_path: str) -> dict | None:
    """Sidecar search in the reference's priority order
    (3d.cpp:326-389); returns {'lat','lon','alt'} or None."""
    d = os.path.dirname(full_path)
    parent = os.path.dirname(d)
    stem = os.path.splitext(os.path.basename(full_path))[0]
    candidates = [
        os.path.join(d, stem + ".geo.json"),
        os.path.join(d, "georef.json"),
        os.path.join(d, "reference_lla.json"),
        os.path.join(parent, "reference_lla.json"),
        os.path.join(parent, "opensfm", "reference_lla.json"),
    ]
    for c in candidates:
        if not os.path.isfile(c):
            continue
        try:
            with open(c, "rb") as f:
                j = json.loads(f.read())
        except (OSError, ValueError):
            continue
        if not isinstance(j, dict):
            continue
        lat = _num(j, _LAT_KEYS)
        lon = _num(j, _LON_KEYS)
        if lat is None or lon is None:
            continue
        if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
            continue  # out-of-range: skip, keep searching
        alt = _num(j, _ALT_KEYS)
        return {"lat": lat, "lon": lon, "alt": alt if alt is not None else 0.0}
    return None


def model_footprint(
    georef: dict, bounds: dict
) -> tuple[float, float, float, float]:
    """(west, south, east, north) — the reference's equirectangular
    offset of the local X/Y bounds around the ENU origin
    (entry.cpp:682-700); the 5-point CCW ring's MBR is exactly this."""
    cos_lat = math.cos(math.radians(georef["lat"]))
    m_per_deg_lon = METERS_PER_DEG_LAT * max(0.01, abs(cos_lat))
    west = georef["lon"] + bounds["min"][0] / m_per_deg_lon
    east = georef["lon"] + bounds["max"][0] / m_per_deg_lon
    south = georef["lat"] + bounds["min"][1] / METERS_PER_DEG_LAT
    north = georef["lat"] + bounds["max"][1] / METERS_PER_DEG_LAT
    return west, south, east, north


def parse_model_entry(rel_path: str, data: bytes, full_path: str | None) -> dict:
    """parseModelEntry parity: properties + point/bbox keys the ingest
    row builder lifts out (the ``point_*`` convention of
    ``sources/parse.py`` parsers).  Best-effort like the reference —
    a broken sidecar or mesh leaves the model indexed in local space."""
    props: dict = {}
    georef = detect_model_georef(full_path) if full_path else None
    if georef is None:
        props["georeferenced"] = False
        return props
    props["georeferenced"] = True
    props["point_lon"] = georef["lon"]
    props["point_lat"] = georef["lat"]
    props["point_alt"] = georef["alt"]
    bounds = model_bounds(rel_path, data)
    if bounds is not None:
        west, south, east, north = model_footprint(georef, bounds)
        props["_bbox"] = (west, south, east, north)
    return props
