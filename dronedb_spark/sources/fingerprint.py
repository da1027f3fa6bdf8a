"""File-type fingerprinting — the reference's type sniffer re-expressed as
a pure function over (path, header bytes), usable driver-side or as a UDF.

Reference: ``fingerprint`` (src/library/entry.cpp:982-1118): classify into
the 17 EntryTypes by extension + content sniffing.  Where the reference
needs a full decoder (GDAL projection check, EXIF aspect ratio, PLY
element scan) we sniff the header bytes we have; decode-dependent
refinements (Panorama aspect-ratio ≥ 2, EXIF GPS upgrading Image →
GeoImage) are applied by the parse stage when a decoder is available and
are otherwise documented stubs (no image libs in this environment).
"""

from __future__ import annotations

import os

from dronedb_spark.catalog.derive import ENTRY_TYPES

# extension → EntryType (entry.cpp:1004-1118)
_EXT_TYPES = {
    ".jpg": "Image",
    ".jpeg": "Image",
    ".png": "Image",
    ".gif": "Image",
    ".webp": "Image",
    ".bmp": "Image",
    ".tif": "GeoRaster",  # GDAL-projection check refines; header TIFF magic required
    ".tiff": "GeoRaster",
    ".jxl": "Image",
    ".md": "Markdown",
    ".mp4": "Video",
    ".mov": "Video",
    ".avi": "Video",
    ".mkv": "Video",
    ".webm": "Video",
    ".las": "PointCloud",
    ".laz": "PointCloud",
    ".copc.laz": "PointCloud",
    ".obj": "Model",
    ".gltf": "Model",
    ".glb": "Model",
    ".nxs": "Model",
    ".nxz": "Model",
    ".spz": "GaussianSplat",
    ".splat": "GaussianSplat",   # antimatter15 binary (gsplat.cpp:46-49)
    ".ksplat": "GaussianSplat",  # mkkellogg format (gsplat.cpp:50)
    ".3tz": "Tiles3D",
    # vector formats (entry.cpp:1034-1035, vector_query.cpp:138-151)
    ".geojson": "Vector",
    ".json": "Generic",  # only .geojson is Vector in the reference list
    ".dxf": "Vector",
    ".dwg": "Vector",
    ".shp": "Vector",
    ".shz": "Vector",
    ".fgb": "Vector",
    ".topojson": "Vector",
    ".kml": "Vector",
    ".kmz": "Vector",
    ".gpkg": "Vector",
}

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"II*\x00": "tiff",
    b"MM\x00*": "tiff",
    b"LASF": "las",
    b"ply\n": "ply",
    b"ply\r": "ply",
}


def _sniff_magic(header: bytes) -> str | None:
    for magic, kind in _MAGIC.items():
        if header.startswith(magic):
            return kind
    return None


def fingerprint(path: str, header: bytes = b"", is_dir: bool = False) -> int:
    """Return the EntryType id for a path (+ optional header bytes)."""
    if is_dir:
        name = os.path.basename(path.rstrip("/"))
        if name == ".ddb" or name.endswith(".ddb"):
            return ENTRY_TYPES["DroneDB"]
        return ENTRY_TYPES["Directory"]

    lower = path.lower()
    base = os.path.basename(lower)
    if base.endswith(".copc.laz"):
        return ENTRY_TYPES["PointCloud"]

    ext = os.path.splitext(lower)[1]

    if ext == ".ply":
        # content-identified: mesh / point cloud / Gaussian splat
        # (entry.cpp:1018-1022).  Splat PLYs carry f_dc_* SH properties.
        head = header[:2048]
        if b"f_dc_0" in head:
            return ENTRY_TYPES["GaussianSplat"]
        if b"element face" in head and b"element face 0" not in head:
            return ENTRY_TYPES["Model"]
        return ENTRY_TYPES["PointCloud"]

    kind = _sniff_magic(header) if header else None
    if ext in (".tif", ".tiff"):
        # reference: GeoRaster iff GDAL reports a projection
        # (entry.cpp:1045-1062); without GDAL we accept TIFF magic (or no
        # header) as GeoRaster and let the parse stage demote.
        if header and kind != "tiff":
            return ENTRY_TYPES["Generic"]
        return ENTRY_TYPES["GeoRaster"]
    if ext in (".jpg", ".jpeg", ".png", ".gif", ".webp", ".bmp") and header:
        if kind not in ("jpeg", "png") and ext in (".jpg", ".jpeg", ".png"):
            return ENTRY_TYPES["Generic"]

    t = _EXT_TYPES.get(ext)
    if t is not None:
        return ENTRY_TYPES[t]
    return ENTRY_TYPES["Generic"]


def type_name(type_id: int) -> str:
    for name, tid in ENTRY_TYPES.items():
        if tid == type_id:
            return name
    return "Undefined"
