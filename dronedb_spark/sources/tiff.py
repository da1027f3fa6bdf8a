"""Pure-Python (Geo)TIFF codec — public TIFF 6.0 + GeoTIFF specs.

Closes the raster decode seam for the format every DEM/orthophoto tool
emits: single-plane TIFF (uint8/uint16/int16/float32/float64),
strip-organized, raw / Deflate / LZW compression (with the horizontal-
differencing predictor GDAL uses), with the three GeoTIFF/GDAL tags the raster
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
    compression: str = "none",
    predictor: bool = False,
) -> bytes:
    """Write a single-band little-endian TIFF (``compression`` in
    none/deflate/lzw; ``predictor`` applies horizontal differencing —
    integer arrays only — before compression, the layout GDAL emits).

    ``pixel_scale`` = (sx, sy) ground units/pixel; ``tiepoint`` = world
    (x, y) of the raster's (0, 0) corner — the GeoTIFF raster→world
    affine the decoder reconstructs."""
    import zlib

    arr = np.ascontiguousarray(arr)
    h, w = arr.shape
    kind = {"u": 1, "i": 2, "f": 3}[arr.dtype.kind]
    bits = arr.dtype.itemsize * 8
    comp_tag = {"none": 1, "lzw": 5, "deflate": 8}[compression]

    store = arr
    if predictor:
        if arr.dtype.kind not in "ui":
            raise NotImplementedError("predictor on non-integer samples")
        store = arr.copy()
        store[:, 1:] = arr[:, 1:] - arr[:, :-1]  # wraps in the dtype

    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = store[y0 : y0 + rows_per_strip].tobytes()
        if compression == "deflate":
            raw = zlib.compress(raw)
        elif compression == "lzw":
            raw = _lzw_encode(raw)
        strips.append(raw)

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
    add(259, 3, comp_tag)
    add(262, 3, 1)  # BlackIsZero
    add(277, 3, 1)  # samples per pixel
    add(278, 4, min(rows_per_strip, h))
    add(279, 4, [len(s) for s in strips])
    add(339, 3, kind)
    if predictor:
        add(317, 3, 2)
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
    predictor = one(317, 1)
    if comp not in (1, 5, 8, 32946):  # raw / LZW / Deflate (two tags)
        raise NotImplementedError(f"TIFF compression {comp}")
    if spp != 1:
        raise NotImplementedError(f"TIFF samples_per_pixel {spp}")
    np_t = _SAMPLE_FMT.get((kind, bits))
    if np_t is None:
        raise NotImplementedError(f"TIFF sample format {kind}/{bits}")
    offsets = _values(ifd[273], endian)
    counts = _values(ifd[279], endian)
    strips = [data[o : o + c] for o, c in zip(offsets, counts)]
    if comp in (8, 32946):
        import zlib

        strips = [zlib.decompress(s) for s in strips]
    elif comp == 5:
        strips = [_lzw_decode(s) for s in strips]
    buf = b"".join(strips)
    arr = np.frombuffer(buf, dtype=endian + np_t, count=w * h).reshape(h, w)
    if predictor == 2:
        # horizontal differencing: each sample stores the delta to its
        # left neighbor; undo with a row-wise cumulative sum (integer
        # wraparound preserved by summing in the storage dtype)
        if arr.dtype.kind not in "ui":
            raise NotImplementedError("predictor 2 on non-integer samples")
        arr = np.cumsum(arr, axis=1, dtype=arr.dtype)
    elif predictor not in (None, 1):
        raise NotImplementedError(f"TIFF predictor {predictor}")

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


# ----------------------------------------------------------- LZW (TIFF)
# TIFF-variant LZW (public spec, TIFF 6.0 §13): MSB-first codes starting
# at 9 bits, ClearCode 256, EOI 257, EARLY code-width change (width
# bumps when the next assignable code is one short of the limit).


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + width <= nbits:
        code = 0
        for _ in range(width):
            code = (code << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        if code == 256:  # Clear
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == 257:  # EndOfInformation
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one entry, so it must widen one entry sooner
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF LZW writer (for fixtures/round-trip tests)."""
    out = bytearray()
    acc = accn = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accn
        acc = (acc << width) | code
        accn += width
        while accn >= 8:
            accn -= 8
            out.append((acc >> accn) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # leading Clear
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code == 4094:  # table nearly full: reset
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(257, width)  # EOI
    if accn:
        out.append((acc << (8 - accn)) & 0xFF)
    return bytes(out)
