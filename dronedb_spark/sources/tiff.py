"""Pure-Python uncompressed (Geo)TIFF codec — public TIFF 6.0 + GeoTIFF
specs.

Closes the raster decode seam for the format every DEM/orthophoto tool
emits: single-plane uncompressed TIFF (uint8/uint16/int16/float32/
float64), strip-organized, with the three GeoTIFF/GDAL tags the raster
operators need — ModelPixelScale (33550), ModelTiepoint (33922) and
GDAL_NODATA (42113).  Decoded rasters feed the EXISTING pixel-table
operators (area stats, volume, contours, stockpiles) so the whole raster
family runs on REAL `.tif` bytes.  Reuses the TIFF IFD walker from
``sources/exif.py`` (same byte layout).
Reference role-equivalent: GDAL raster open + GetGeoTransform.
"""

from __future__ import annotations

import struct

import numpy as np

from dronedb_spark.sources.exif import _read_ifd

_SAMPLE_FMT = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
               (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
               (3, 32): "f4", (3, 64): "f8"}


def encode_tiff(
    arr: np.ndarray,
    pixel_scale: tuple[float, float] | None = None,
    tiepoint: tuple[float, float] | None = None,
    nodata: float | None = None,
    rows_per_strip: int = 64,
) -> bytes:
    """Write a single-band little-endian uncompressed TIFF.

    ``pixel_scale`` = (sx, sy) ground units/pixel; ``tiepoint`` = world
    (x, y) of the raster's (0, 0) corner — the GeoTIFF raster→world
    affine the decoder reconstructs."""
    arr = np.ascontiguousarray(arr)
    h, w = arr.shape
    kind = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]
    bits = arr.dtype.itemsize * 8

    strips = []
    for y0 in range(0, h, rows_per_strip):
        strips.append(arr[y0 : y0 + rows_per_strip].tobytes())

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def add(tag: int, typ: int, values) -> None:
        fmt = {3: "H", 4: "I", 12: "d", 2: "s"}[typ]
        if typ == 2:
            payload = values.encode("ascii") + b"\x00"
            entries.append((tag, typ, len(payload), payload))
        else:
            vals = values if isinstance(values, (list, tuple)) else [values]
            payload = b"".join(struct.pack("<" + fmt, v) for v in vals)
            entries.append((tag, typ, len(vals), payload))

    add(256, 4, w)
    add(257, 4, h)
    add(258, 3, bits)
    add(259, 3, 1)  # no compression
    add(262, 3, 1)  # BlackIsZero
    add(277, 3, 1)  # samples per pixel
    add(278, 4, min(rows_per_strip, h))
    add(279, 4, [len(s) for s in strips])
    add(339, 3, kind)
    if pixel_scale is not None:
        add(33550, 12, [pixel_scale[0], pixel_scale[1], 0.0])
    if tiepoint is not None:
        add(33922, 12, [0.0, 0.0, 0.0, tiepoint[0], tiepoint[1], 0.0])
    if nodata is not None:
        add(42113, 2, repr(float(nodata)) if not float(nodata).is_integer() else str(int(nodata)))
    add(273, 4, [0] * len(strips))  # strip offsets — patched below

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    heap_off = ifd_off + 2 + 12 * n + 4
    heap = bytearray()
    ifd = struct.pack("<H", n)
    strip_dir_pos = None
    for i, (tag, typ, cnt, payload) in enumerate(entries):
        if tag == 273:
            strip_dir_pos = ifd_off + 2 + 12 * i
        ent = struct.pack("<HHI", tag, typ, cnt)
        if len(payload) <= 4:
            ent += payload.ljust(4, b"\x00")
        else:
            ent += struct.pack("<I", heap_off + len(heap))
            heap.extend(payload)
        ifd += ent
    ifd += struct.pack("<I", 0)  # next IFD

    data_off = heap_off + len(heap)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off) + ifd + heap)
    offsets = []
    for s in strips:
        offsets.append(data_off)
        out.extend(s)
        data_off += len(s)
    # patch strip offsets (inline if single strip fits, else in heap)
    off_payload = b"".join(struct.pack("<I", o) for o in offsets)
    if len(off_payload) <= 4:
        out[strip_dir_pos + 8 : strip_dir_pos + 8 + len(off_payload)] = off_payload
    else:
        (heap_pos,) = struct.unpack_from("<I", out, strip_dir_pos + 8)
        out[heap_pos : heap_pos + len(off_payload)] = off_payload
    return bytes(out)


def _values(entry, endian: str) -> list:
    typ, cnt, val = entry
    fmt = {3: "H", 4: "I", 12: "d"}.get(typ)
    if fmt is None:
        return []
    size = struct.calcsize(fmt)
    return [struct.unpack_from(endian + fmt, val, i * size)[0] for i in range(cnt)]


def decode_tiff(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode → (2-D array, geo dict with scale/tiepoint/nodata or Nones)."""
    if data[:2] == b"II" and data[2:4] == b"*\x00":
        endian = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    ifd = _read_ifd(data, ifd_off, endian)

    def one(tag, default=None):
        vs = _values(ifd[tag], endian) if tag in ifd else []
        return vs[0] if vs else default

    w, h = one(256), one(257)
    bits = one(258, 8)
    comp = one(259, 1)
    spp = one(277, 1)
    kind = one(339, 1)
    if comp != 1:
        raise NotImplementedError(f"TIFF compression {comp}")
    if spp != 1:
        raise NotImplementedError(f"TIFF samples_per_pixel {spp}")
    np_t = _SAMPLE_FMT.get((kind, bits))
    if np_t is None:
        raise NotImplementedError(f"TIFF sample format {kind}/{bits}")
    offsets = _values(ifd[273], endian)
    counts = _values(ifd[279], endian)
    buf = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(buf, dtype=endian + np_t, count=w * h).reshape(h, w)

    geo: dict = {"pixel_scale": None, "tiepoint": None, "nodata": None}
    if 33550 in ifd:
        sx, sy, _sz = _values(ifd[33550], endian)[:3]
        geo["pixel_scale"] = (sx, sy)
    if 33922 in ifd:
        tp = _values(ifd[33922], endian)
        if len(tp) >= 6:
            geo["tiepoint"] = (tp[3] - tp[0] * (geo["pixel_scale"] or (0, 0))[0],
                               tp[4] + tp[1] * (geo["pixel_scale"] or (0, 0))[1])
    if 42113 in ifd:
        try:
            geo["nodata"] = float(ifd[42113][2].split(b"\x00")[0])
        except ValueError:
            pass
    return arr, geo
