"""Pure-Python LAS 1.2 point-cloud codec (public ASPRS LAS spec).

Closes the S9 seam for the surveying-native format the reference ingests
via PDAL: header parse (point count, bbox, scale/offset) plus point
record decode for formats 0-3 (x/y/z int32·scale+offset, intensity,
return info, classification, GPS time for formats 1/3, RGB for 2/3).  LAZ-compressed
files dispatch to the pure-Python LASzip codec (sources/laz.py).
Reference role-equivalent: getPointCloudInfo header/stats path.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR12 = 227
_PT_LEN = {0: 20, 1: 28, 2: 26, 3: 34}


def encode_las(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray | None = None,
    intensity: np.ndarray | None = None,
    gps_time: np.ndarray | None = None,
    rgb: np.ndarray | None = None,
    scale: tuple[float, float, float] = (0.001, 0.001, 0.001),
    offset: tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> bytes:
    """Write a minimal LAS 1.2 file (point format 0/1/2/3 from
    gps_time/rgb presence).  Coordinates are quantized to the given
    scale/offset grid — callers that want exact round-trips should pass
    grid-aligned values."""
    n = len(x)
    fmt = (1 if gps_time is not None else 0) | (2 if rgb is not None else 0)
    rec_len = _PT_LEN[fmt]
    classification = (
        np.zeros(n, dtype=np.uint8) if classification is None else classification.astype(np.uint8)
    )
    intensity = (
        np.zeros(n, dtype=np.uint16) if intensity is None else intensity.astype(np.uint16)
    )
    xi = np.round((np.asarray(x, dtype=np.float64) - offset[0]) / scale[0]).astype(np.int32)
    yi = np.round((np.asarray(y, dtype=np.float64) - offset[1]) / scale[1]).astype(np.int32)
    zi = np.round((np.asarray(z, dtype=np.float64) - offset[2]) / scale[2]).astype(np.int32)
    xd, yd, zd = (xi * scale[0] + offset[0], yi * scale[1] + offset[1], zi * scale[2] + offset[2])

    header = bytearray(_HDR12)
    header[0:4] = b"LASF"
    header[24] = 1  # version major
    header[25] = 2  # version minor
    header[26:58] = b"dronedb_spark".ljust(32, b"\x00")  # system id
    header[58:90] = b"encode_las".ljust(32, b"\x00")  # software
    struct.pack_into("<HH", header, 90, 1, 2024)  # day/year
    struct.pack_into("<H", header, 94, _HDR12)
    struct.pack_into("<I", header, 96, _HDR12)  # offset to point data
    struct.pack_into("<I", header, 100, 0)  # n VLRs
    header[104] = fmt
    struct.pack_into("<H", header, 105, rec_len)
    struct.pack_into("<I", header, 107, n)  # legacy point count
    struct.pack_into("<5I", header, 111, n, 0, 0, 0, 0)  # returns 1-5
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)
    struct.pack_into(
        "<6d", header, 179,
        float(xd.max()), float(xd.min()),
        float(yd.max()), float(yd.min()),
        float(zd.max()), float(zd.min()),
    )

    fields = [
        ("x", "<i4", xi), ("y", "<i4", yi), ("z", "<i4", zi),
        ("intensity", "<u2", intensity),
        ("flags", "u1", np.full(n, 0b00001001, dtype=np.uint8)),  # 1 return, #1
        ("classification", "u1", classification),
        ("scan_angle", "i1", np.zeros(n, dtype=np.int8)),
        ("user_data", "u1", np.zeros(n, dtype=np.uint8)),
        ("point_source", "<u2", np.zeros(n, dtype=np.uint16)),
    ]
    if fmt & 1:
        fields.append(("gps_time", "<f8", np.asarray(gps_time, dtype=np.float64)))
    if fmt & 2:
        rgb_arr = np.asarray(rgb, dtype=np.uint16)
        fields.append(("red", "<u2", rgb_arr[:, 0]))
        fields.append(("green", "<u2", rgb_arr[:, 1]))
        fields.append(("blue", "<u2", rgb_arr[:, 2]))
    rec = np.zeros(n, dtype=np.dtype([(fname, ft) for fname, ft, _ in fields]))
    for fname, _ft, arr in fields:
        rec[fname] = arr
    assert rec.dtype.itemsize == rec_len
    return bytes(header) + rec.tobytes()


def las_info(data: bytes) -> dict:
    """Header-only parse: version, point format, count, scale, offset, bbox."""
    if data[:4] != b"LASF":
        raise ValueError("not a LAS file")
    ver = (data[24], data[25])
    (header_size,) = struct.unpack_from("<H", data, 94)
    (point_offset,) = struct.unpack_from("<I", data, 96)
    fmt = data[104] & 0x3F  # high bits flag LAZ compression
    (rec_len,) = struct.unpack_from("<H", data, 105)
    (n,) = struct.unpack_from("<I", data, 107)
    scale = struct.unpack_from("<3d", data, 131)
    offset = struct.unpack_from("<3d", data, 155)
    maxx, minx, maxy, miny, maxz, minz = struct.unpack_from("<6d", data, 179)
    if ver >= (1, 4) and n == 0 and header_size >= 375:
        (n,) = struct.unpack_from("<Q", data, 247)
    return {
        "version": f"{ver[0]}.{ver[1]}",
        "point_format": fmt,
        "record_length": rec_len,
        "n_points": n,
        "scale": scale,
        "offset": offset,
        "bounds": ((minx, miny, minz), (maxx, maxy, maxz)),
        "point_data_offset": point_offset,
        "compressed": bool(data[104] & 0x80),
    }


def decode_las(data: bytes) -> dict[str, np.ndarray]:
    """Decode point records (formats 0-3) → dict of float64/int arrays:
    x, y, z (scaled), intensity, classification, return_number
    [, gps_time] [, red/green/blue]."""
    info = las_info(data)
    fmt, n = info["point_format"], info["n_points"]
    if info["compressed"]:
        from dronedb_spark.sources.laz import decode_laz

        return decode_laz(data)
    if fmt in (6, 7, 8, 9, 10):
        return _decode_las14(data, info)
    if fmt not in _PT_LEN:
        raise NotImplementedError(f"LAS point format {fmt}")
    base = [
        ("x", "<i4"), ("y", "<i4"), ("z", "<i4"), ("intensity", "<u2"),
        ("flags", "u1"), ("classification", "u1"), ("scan_angle", "i1"),
        ("user_data", "u1"), ("point_source", "<u2"),
    ]
    if fmt & 1:
        base.append(("gps_time", "<f8"))
    if fmt & 2:
        base += [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
    dt = np.dtype(base)
    # record_length can exceed the format's base length (extra bytes);
    # build a padded dtype in that case
    if info["record_length"] > dt.itemsize:
        dt = np.dtype(base + [("_extra", f"V{info['record_length'] - dt.itemsize}")])
    rec = np.frombuffer(data, dtype=dt, count=n, offset=info["point_data_offset"])
    sx, sy, sz = info["scale"]
    ox, oy, oz = info["offset"]
    out = {
        "x": rec["x"] * sx + ox,
        "y": rec["y"] * sy + oy,
        "z": rec["z"] * sz + oz,
        "intensity": rec["intensity"].astype(np.int64),
        "classification": rec["classification"].astype(np.int64),
        "return_number": (rec["flags"] & 0x07).astype(np.int64),
    }
    if fmt & 1:
        out["gps_time"] = rec["gps_time"].astype(np.float64)
    if fmt & 2:
        out["red"] = rec["red"].astype(np.int64)
        out["green"] = rec["green"].astype(np.int64)
        out["blue"] = rec["blue"].astype(np.int64)
    return out


def _decode_las14(data: bytes, info: dict) -> dict[str, np.ndarray]:
    """Uncompressed LAS 1.4 PDRF 6-10 records (sources/laz14.py writes
    6-8, sources/waveform.py writes the waveform formats 9/10; the
    compressed path for 6-8 lives in laz14.py)."""
    fmt, n = info["point_format"], info["n_points"]
    has_rgb = fmt in (7, 8, 10)
    has_nir = fmt in (8, 10)
    has_wave = fmt in (9, 10)
    base = [
        ("x", "<i4"), ("y", "<i4"), ("z", "<i4"), ("intensity", "<u2"),
        ("returns", "u1"), ("flags", "u1"), ("classification", "u1"),
        ("user_data", "u1"), ("scan_angle", "<i2"), ("point_source", "<u2"),
        ("gps_time", "<f8"),
    ]
    if has_rgb:
        base += [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
    if has_nir:
        base.append(("nir", "<u2"))
    if has_wave:
        base += [
            ("wpd_index", "u1"), ("wf_offset", "<u8"), ("wf_size", "<u4"),
            ("wf_return_point", "<f4"),
            ("wf_dx", "<f4"), ("wf_dy", "<f4"), ("wf_dz", "<f4"),
        ]
    dt = np.dtype(base)
    if info["record_length"] < dt.itemsize:
        raise ValueError(
            f"record length {info['record_length']} smaller than PDRF {fmt}'s "
            f"base {dt.itemsize} — corrupt header"
        )
    if info["record_length"] > dt.itemsize:
        dt = np.dtype(base + [("_extra", f"V{info['record_length'] - dt.itemsize}")])
    rec = np.frombuffer(data, dtype=dt, count=n, offset=info["point_data_offset"])
    sx, sy, sz = info["scale"]
    ox, oy, oz = info["offset"]
    out = {
        "x": rec["x"] * sx + ox,
        "y": rec["y"] * sy + oy,
        "z": rec["z"] * sz + oz,
        "intensity": rec["intensity"].astype(np.int64),
        "classification": rec["classification"].astype(np.int64),
        "return_number": (rec["returns"] & 0x0F).astype(np.int64),
        "number_of_returns": ((rec["returns"] >> 4) & 0x0F).astype(np.int64),
        "scanner_channel": ((rec["flags"] >> 4) & 0x03).astype(np.int64),
        "scan_angle": rec["scan_angle"].astype(np.int64),
        "point_source": rec["point_source"].astype(np.int64),
        "gps_time": rec["gps_time"].astype(np.float64),
    }
    if has_rgb:
        out["red"] = rec["red"].astype(np.int64)
        out["green"] = rec["green"].astype(np.int64)
        out["blue"] = rec["blue"].astype(np.int64)
    if has_nir:
        out["nir"] = rec["nir"].astype(np.int64)
    if has_wave:
        out["wpd_index"] = rec["wpd_index"].astype(np.int64)
        out["wf_offset"] = rec["wf_offset"].astype(np.int64)
        out["wf_size"] = rec["wf_size"].astype(np.int64)
        out["wf_return_point"] = rec["wf_return_point"].astype(np.float64)
        out["wf_dx"] = rec["wf_dx"].astype(np.float64)
        out["wf_dy"] = rec["wf_dy"].astype(np.float64)
        out["wf_dz"] = rec["wf_dz"].astype(np.float64)
    return out
