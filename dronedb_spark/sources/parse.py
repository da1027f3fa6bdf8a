"""Default entry parser: dispatch header bytes to the REAL pure-Python
decoders (S5 without GDAL/PDAL/Exiv2).

JPEG/TIFF → EXIF metadata (sources/exif.py); PNG → IHDR dimensions;
LAS → header point count/bounds/scale; PLY → element/property scan;
WAV → fmt chunk; GeoTIFF → pixel scale/tiepoint/nodata on top of the
TIFF EXIF pass.  Emits the reference's property names where they exist
(entry.cpp parseEntry family); everything runs on the first 4 KiB the
ingest kernel hands every parser.
"""

from __future__ import annotations

import struct

from dronedb_spark.sources.exif import parse_exif


def _parse_png(header: bytes) -> dict:
    from dronedb_spark.sources.png import png_info

    try:
        w, h, c = png_info(header)
    except ValueError:
        return {}
    props = {"width": w, "height": h}
    if c:  # omit bands for color types we can't decode (e.g. palette)
        props["bands"] = c
    return props


def _parse_las(header: bytes) -> dict:
    from dronedb_spark.sources.las import las_info

    try:
        info = las_info(header)
    except (ValueError, struct.error, IndexError):
        # IndexError: header shorter than the fixed LAS block (truncated
        # or stub file) — classify by magic, no properties (log-and-skip)
        return {}
    (minx, miny, minz), (maxx, maxy, maxz) = info["bounds"]
    return {
        "pointCount": info["n_points"],
        "lasVersion": info["version"],
        "pointFormat": info["point_format"],
        "compressed": info["compressed"],
        "minX": minx, "minY": miny, "minZ": minz,
        "maxX": maxx, "maxY": maxy, "maxZ": maxz,
    }


def _parse_ply(header: bytes) -> dict:
    try:
        text = header.split(b"end_header")[0].decode("ascii", errors="replace")
    except Exception:
        return {}
    props: dict = {}
    names = []
    for line in text.splitlines():
        parts = line.strip().split()
        if len(parts) == 3 and parts[0] == "element":
            if parts[1] == "vertex":
                props["vertexCount"] = int(parts[2])
            elif parts[1] == "face":
                props["faceCount"] = int(parts[2])
        elif len(parts) == 3 and parts[0] == "property" and "vertexCount" in props:
            if "faceCount" not in props:
                names.append(parts[2])
    if names:
        props["dimensions"] = ",".join(names)
    # reference parity: pointcloud.cpp sets pointCount = vertexCount for
    # plain point clouds (splats keep their own property set)
    if "vertexCount" in props and not any(n.startswith("f_dc_") for n in names):
        props["pointCount"] = props["vertexCount"]
    return props


def _parse_mp4(header: bytes) -> dict:
    """ISO BMFF metadata (duration/dimensions/tracks) when the moov box
    falls inside the 4 KiB header window — true for metadata-first files;
    moov-at-end files degrade to {} (the parse stage stays header-only by
    design, matching the ingest contract)."""
    from dronedb_spark.sources.mp4 import mp4_info

    try:
        info = mp4_info(header)
    except (ValueError, struct.error):
        return {}
    props: dict = {"tracks": info["n_tracks"]}
    if info["duration_s"] is not None:
        props["duration"] = info["duration_s"]
    if info["width"] is not None:
        props["width"] = info["width"]
        props["height"] = info["height"]
    # XMP uuid box: GPS point (GeoVideo upgrade), Mac-epoch capture time,
    # XMP dimensions fallback (exif.cpp:66-80, 326-392, 514-537)
    from dronedb_spark.sources.mp4 import video_xmp

    for k, v in video_xmp(header).items():
        props.setdefault(k, v)
    return props


def _parse_spz(header: bytes) -> dict:
    """Gaussian-splat header probe (entry.cpp:463-475 parity)."""
    from dronedb_spark.sources.splat import spz_info

    try:
        info = spz_info(header)
    except (ValueError, struct.error, OSError):
        return {}
    return {
        "pointCount": info["numPoints"],
        "shDegree": info["shDegree"],
        "spzVersion": info["version"],
    }


def _parse_3tz(header: bytes) -> dict:
    """3D-Tiles archive probe (entry.cpp:711-751 parity)."""
    from dronedb_spark.sources.splat import tz3_info

    try:
        info = tz3_info(header)
    except (ValueError, struct.error, OSError):
        return {}
    props: dict = {}
    if info["tilesetVersion"] is not None:
        props["tilesetVersion"] = info["tilesetVersion"]
    if info["geometricError"] is not None:
        props["geometricError"] = info["geometricError"]
    props["childCount"] = info["nChildren"]
    return props


def _parse_wav(header: bytes) -> dict:
    if header[:4] != b"RIFF" or header[8:12] != b"WAVE":
        return {}
    pos = 12
    out: dict = {}
    while pos + 8 <= len(header):
        tag = header[pos : pos + 4]
        (length,) = struct.unpack("<I", header[pos + 4 : pos + 8])
        if tag == b"fmt " and pos + 24 <= len(header):
            _fmt, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", header[pos + 8 : pos + 24])
            out = {"sampleRate": sr, "channels": ch, "bitsPerSample": bits}
        elif tag == b"data" and out.get("bitsPerSample"):
            frame = out["channels"] * out["bitsPerSample"] // 8
            if frame:
                out["sampleCount"] = length // frame
                out["durationMs"] = int(out["sampleCount"] * 1000 / out["sampleRate"])
        pos += 8 + length + (length & 1)
    return out


def _parse_geotiff(header: bytes) -> dict:
    """GeoTIFF georeferencing tags over the EXIF/TIFF baseline props."""
    from dronedb_spark.sources.exif import _read_ifd

    props: dict = {}
    endian = "<" if header[:2] == b"II" else ">"
    try:
        (ifd_off,) = struct.unpack_from(endian + "I", header, 4)
        ifd = _read_ifd(header, ifd_off, endian)
    except struct.error:
        return props

    def vals(tag, fmt):
        if tag not in ifd:
            return []
        _t, cnt, val = ifd[tag]
        size = struct.calcsize(fmt)
        n = min(cnt, len(val) // size)
        return [struct.unpack_from(endian + fmt, val, i * size)[0] for i in range(n)]

    w = vals(256, "I") or vals(256, "H")
    h = vals(257, "I") or vals(257, "H")
    if w and h:
        props["width"], props["height"] = int(w[0]), int(h[0])
    scale = vals(33550, "d")
    if len(scale) >= 2:
        props["pixelScaleX"], props["pixelScaleY"] = scale[0], scale[1]
    tie = vals(33922, "d")
    if len(tie) >= 6:
        props["tiepointX"], props["tiepointY"] = tie[3], tie[4]
    if 42113 in ifd:
        try:
            props["noData"] = float(ifd[42113][2].split(b"\x00")[0])
        except ValueError:
            pass
    return props


def parse_entry(rel_path: str, header: bytes) -> dict:
    """(path, first 4 KiB) → properties dict; {} for unknown formats."""
    if header[:3] == b"\xff\xd8\xff":
        return parse_exif(rel_path, header)
    if header[:4] == b"\x89PNG":
        return _parse_png(header)
    if header[:4] == b"LASF":
        return _parse_las(header)
    if header[:4] in (b"ply\n", b"ply\r"):
        return _parse_ply(header)
    if header[:4] == b"RIFF" and header[8:12] == b"WAVE":
        return _parse_wav(header)
    if header[:4] in (b"II*\x00", b"MM\x00*"):
        props = parse_exif(rel_path, header)
        props.update(_parse_geotiff(header))
        return props
    if header[4:8] == b"ftyp":
        return _parse_mp4(header)
    if header[:2] == b"\x1f\x8b" and rel_path.lower().endswith(".spz"):
        return _parse_spz(header)
    if header[:2] == b"PK" and rel_path.lower().endswith((".3tz", ".kmz")):
        return _parse_3tz(header) if rel_path.lower().endswith(".3tz") else {}
    return parse_exif(rel_path, header)  # JPEG-embedded TIFF scan fallback
