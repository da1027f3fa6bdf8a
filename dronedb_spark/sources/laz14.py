"""LAS 1.4 (PDRF 6-8) + LASzip v3 layered compression — pure Python.

Extends the LAS/LAZ surface (sources/las.py, sources/laz.py) to the
modern generation of the format: the 375-byte LAS 1.4 header, point
record formats 6 (extended returns, 4-bit return counts, scanner
channel, 16-bit scan angle, mandatory GPS time), 7 (+RGB) and 8
(+RGB+NIR), and the LASzip "layered chunked" compressor (compressor 3)
those formats require.  The reference ingests these via PDAL/untwine
(src/library/pointcloud.cpp:661 buildCopc takes LAS 1.4 input); here the
codec is a pure-Python kernel run one-file-per-task inside Arrow
``mapInPandas`` (sources/bridge.py) — no shuffle before decode, so the
layout holds on a 1000-executor cluster.

Layered stream layout (the defining v3 feature — per-field layers that a
reader can SKIP, e.g. decode x/y/z for a spatial query without paying
for GPS-time/RGB entropy decode):

    chunk := raw seed point record
             u32 x n_layers  (compressed byte count of each layer)
             layer byte streams, concatenated in declaration order

    point layers: xy, z, classification, flags, intensity, scan_angle,
                  user_data, point_source, gps_time
    item layers:  rgb (PDRF 7/8), nir (PDRF 8), extra (BYTE14)

Container (header, LASzip VLR with compressor=3 and v3 item records,
chunk table) follows the published LASzip layout byte-for-byte.  The
per-layer entropy coding reuses the published v2 primitives from
sources/laz.py — FastAC coder, k-bit IntegerCompressor, streaming-median
x/y prediction, per-return-level z prediction, GPSTIME11/RGB12 state
machines — applied per layer.  NOTE (honest boundary, also flagged in
ADVICE r3 for the v2 codecs): bit-exact model-state parity with
laszip.exe's POINT14-v3 coder is NOT verified in this environment (no
laszip binary or golden fixtures available); files written here are
guaranteed to decode here, and every structural element a container
consumer touches (headers, VLR, chunk table, layer framing) matches the
spec.
"""

from __future__ import annotations

import struct

import numpy as np

from dronedb_spark.sources.laz import (
    _DEFAULT_CHUNK,
    _LASZIP_RECORD_ID,
    _LASZIP_USER_ID,
    _NUMBER_RETURN_LEVEL,
    _NUMBER_RETURN_MAP,
    ArithmeticDecoder,
    ArithmeticEncoder,
    ArithmeticModel,
    ByteV2,
    GpsTime11V2,
    IntegerCompressor,
    Rgb12V2,
    StreamingMedian5,
    _i32,
)

_HDR14 = 375
_COMPRESSOR_LAYERED_CHUNKED = 3
_ITEM_POINT14 = 10
_ITEM_RGB14 = 11
_ITEM_RGBNIR14 = 12
_ITEM_BYTE14 = 14

# PDRF 6 record: X Y Z intensity returns flags classification user_data
# scan_angle(i16) point_source gps_time(f8)
_P14 = struct.Struct("<iiiHBBBBhHd")
_PT14_LEN = {6: 30, 7: 36, 8: 38, 9: 59, 10: 67}  # 9/10 add the 29-byte wave tail


# ------------------------------------------------------------ las 1.4 raw


def _las14_header(
    n: int,
    fmt: int,
    rec_len: int,
    scale: tuple[float, float, float],
    offset: tuple[float, float, float],
    bbox: tuple[float, float, float, float, float, float],
    n_vlrs: int,
    vlr_len: int,
    compressed: bool,
    evlr_offset: int = 0,
    evlr_count: int = 0,
) -> bytes:
    header = bytearray(_HDR14)
    header[0:4] = b"LASF"
    struct.pack_into("<H", header, 6, 0x0010)  # global encoding: WKT CRS
    header[24] = 1
    header[25] = 4
    header[26:58] = b"dronedb_spark".ljust(32, b"\x00")
    header[58:90] = b"encode_las14".ljust(32, b"\x00")
    struct.pack_into("<HH", header, 90, 1, 2024)
    struct.pack_into("<H", header, 94, _HDR14)
    struct.pack_into("<I", header, 96, _HDR14 + vlr_len)
    struct.pack_into("<I", header, 100, n_vlrs)
    header[104] = fmt | (0x80 if compressed else 0)
    struct.pack_into("<H", header, 105, rec_len)
    # legacy u32 count + legacy return counts MUST be zero for PDRF >= 6
    struct.pack_into("<I", header, 107, 0)
    struct.pack_into("<5I", header, 111, 0, 0, 0, 0, 0)
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)
    maxx, minx, maxy, miny, maxz, minz = bbox
    struct.pack_into("<6d", header, 179, maxx, minx, maxy, miny, maxz, minz)
    struct.pack_into("<Q", header, 227, 0)  # waveform packet offset
    struct.pack_into("<QI", header, 235, evlr_offset, evlr_count)
    struct.pack_into("<Q", header, 247, n)  # 64-bit point count
    # 15 x u64 points-by-return: all first-return unless caller cares
    struct.pack_into("<15Q", header, 255, n, *([0] * 14))
    return bytes(header)


def _pack_fields(
    x, y, z,
    scale, offset,
    classification=None, intensity=None, gps_time=None,
    return_number=None, number_of_returns=None, scanner_channel=None,
    scan_angle=None, point_source=None, user_data=None,
):
    """Quantize + default the PDRF6 field set; returns (n, dict of int arrays)."""
    n = len(x)

    def arr(v, default, dtype):
        if v is None:
            return np.full(n, default, dtype=dtype)
        return np.asarray(v).astype(dtype)

    xi = np.round((np.asarray(x, dtype=np.float64) - offset[0]) / scale[0]).astype(np.int32)
    yi = np.round((np.asarray(y, dtype=np.float64) - offset[1]) / scale[1]).astype(np.int32)
    zi = np.round((np.asarray(z, dtype=np.float64) - offset[2]) / scale[2]).astype(np.int32)
    rn = arr(return_number, 1, np.uint8)
    nr = arr(number_of_returns, 1, np.uint8)
    ch = arr(scanner_channel, 0, np.uint8)
    fields = {
        "xi": xi, "yi": yi, "zi": zi,
        "intensity": arr(intensity, 0, np.uint16),
        "returns": ((nr & 0x0F) << 4 | (rn & 0x0F)).astype(np.uint8),
        "flags": ((ch & 0x03) << 4).astype(np.uint8),
        "classification": arr(classification, 0, np.uint8),
        "user_data": arr(user_data, 0, np.uint8),
        "scan_angle": arr(scan_angle, 0, np.int16),
        "point_source": arr(point_source, 0, np.uint16),
        "gps_bits": arr(gps_time, 0.0, np.float64).view(np.uint64),
    }
    return n, fields


def _bbox_of(xi, yi, zi, scale, offset):
    if len(xi) == 0:
        return (0.0,) * 6
    xd = xi * scale[0] + offset[0]
    yd = yi * scale[1] + offset[1]
    zd = zi * scale[2] + offset[2]
    return (
        float(xd.max()), float(xd.min()),
        float(yd.max()), float(yd.min()),
        float(zd.max()), float(zd.min()),
    )


def encode_las14(
    x, y, z,
    classification=None, intensity=None, gps_time=None, rgb=None, nir=None,
    return_number=None, number_of_returns=None, scanner_channel=None,
    scan_angle=None, point_source=None, user_data=None,
    scale=(0.001, 0.001, 0.001), offset=(0.0, 0.0, 0.0),
) -> bytes:
    """Uncompressed LAS 1.4 (PDRF 6/7/8 chosen from rgb/nir presence)."""
    fmt = 6 if rgb is None else (8 if nir is not None else 7)
    n, f = _pack_fields(
        x, y, z, scale, offset, classification, intensity, gps_time,
        return_number, number_of_returns, scanner_channel,
        scan_angle, point_source, user_data,
    )
    rec_len = _PT14_LEN[fmt]
    header = _las14_header(
        n, fmt, rec_len, scale, offset,
        _bbox_of(f["xi"], f["yi"], f["zi"], scale, offset), 0, 0, False,
    )
    base = [
        ("x", "<i4", f["xi"]), ("y", "<i4", f["yi"]), ("z", "<i4", f["zi"]),
        ("intensity", "<u2", f["intensity"]), ("returns", "u1", f["returns"]),
        ("flags", "u1", f["flags"]), ("classification", "u1", f["classification"]),
        ("user_data", "u1", f["user_data"]), ("scan_angle", "<i2", f["scan_angle"]),
        ("point_source", "<u2", f["point_source"]),
        ("gps_time", "<f8", f["gps_bits"].view(np.float64)),
    ]
    if fmt >= 7:
        rgb_arr = np.asarray(rgb, dtype=np.uint16)
        base += [
            ("red", "<u2", rgb_arr[:, 0]), ("green", "<u2", rgb_arr[:, 1]),
            ("blue", "<u2", rgb_arr[:, 2]),
        ]
    if fmt == 8:
        base.append(("nir", "<u2", np.asarray(nir, dtype=np.uint16)))
    rec = np.zeros(n, dtype=np.dtype([(fn, ft) for fn, ft, _ in base]))
    for fn, _ft, a in base:
        rec[fn] = a
    assert rec.dtype.itemsize == rec_len
    return header + rec.tobytes()


# --------------------------------------------------------- layered codec


class Point14Layered:
    """Per-layer state machine for the POINT14 item (encode + decode).

    One FastAC stream per layer; prediction schemes reuse the published
    v2 machinery (streaming-median dx/dy, per-return-level z, per-prior
    symbol models for the byte fields).  Dependencies between layers are
    one-directional — xy first (return byte decides the prediction
    context m/lev and the dx/dy k-bits feed z's context), everything
    else independent — so a reader can decode {xy, z} and skip the rest.
    """

    POINT_LAYERS = (
        "xy", "z", "classification", "flags", "intensity",
        "scan_angle", "user_data", "point_source", "gps_time",
    )

    def __init__(self, seed: dict) -> None:
        self.m_returns: list = [None] * 256
        self.m_cls: list = [None] * 256
        self.m_flags: list = [None] * 256
        self.m_user: list = [None] * 256
        self.ic_dx = IntegerCompressor(32, 2)
        self.ic_dy = IntegerCompressor(32, 22)
        self.ic_z = IntegerCompressor(32, 20)
        self.ic_intensity = IntegerCompressor(16, 4)
        self.ic_angle = IntegerCompressor(16, 2)
        self.ic_source = IntegerCompressor(16, 1)
        self.gps = GpsTime11V2()
        self.gps.init(int(seed["gps_bits"]))
        self.med_x = [StreamingMedian5() for _ in range(16)]
        self.med_y = [StreamingMedian5() for _ in range(16)]
        self.last_height = [int(seed["zi"])] * 8
        self.last_intensity = [int(seed["intensity"])] * 16
        self.last = {k: int(seed[k]) for k in (
            "xi", "yi", "zi", "intensity", "returns", "flags",
            "classification", "user_data", "scan_angle", "point_source",
        )}

    @staticmethod
    def _lazy(models: list, i: int) -> ArithmeticModel:
        if models[i] is None:
            models[i] = ArithmeticModel(256)
        return models[i]

    @staticmethod
    def _ctx(returns: int) -> tuple[int, int, int]:
        r = min(returns & 0x0F, 7)
        n = min((returns >> 4) & 0x0F, 7)
        return _NUMBER_RETURN_MAP[n][r], _NUMBER_RETURN_LEVEL[n][r], n

    def write(self, enc: dict, cur: dict) -> None:
        last = self.last
        m, lev, n = self._ctx(cur["returns"])
        e = enc["xy"]
        e.encode_symbol(self._lazy(self.m_returns, last["returns"]), cur["returns"])
        diff = _i32(cur["xi"] - last["xi"])
        self.ic_dx.compress(e, self.med_x[m].get(), diff, 1 if n == 1 else 0)
        self.med_x[m].add(diff)
        kb = self.ic_dx.k
        diff = _i32(cur["yi"] - last["yi"])
        ctx = (1 if n == 1 else 0) + ((kb & ~1) if kb < 20 else 20)
        self.ic_dy.compress(e, self.med_y[m].get(), diff, ctx)
        self.med_y[m].add(diff)

        kb = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + ((kb & ~1) if kb < 18 else 18)
        self.ic_z.compress(enc["z"], self.last_height[lev], cur["zi"], ctx)
        self.last_height[lev] = cur["zi"]

        enc["classification"].encode_symbol(
            self._lazy(self.m_cls, last["classification"]), cur["classification"]
        )
        enc["flags"].encode_symbol(self._lazy(self.m_flags, last["flags"]), cur["flags"])
        self.ic_intensity.compress(
            enc["intensity"], self.last_intensity[m], cur["intensity"], min(m, 3)
        )
        self.last_intensity[m] = cur["intensity"]
        self.ic_angle.compress(
            enc["scan_angle"], last["scan_angle"] & 0xFFFF,
            cur["scan_angle"] & 0xFFFF, 1 if n == 1 else 0,
        )
        enc["user_data"].encode_symbol(
            self._lazy(self.m_user, last["user_data"]), cur["user_data"]
        )
        self.ic_source.compress(enc["point_source"], last["point_source"], cur["point_source"])
        self.gps.write(enc["gps_time"], int(cur["gps_bits"]))
        for k in last:
            last[k] = int(cur[k])

    def read(self, dec: dict, want: set) -> dict:
        last = self.last
        d = dec["xy"]
        last["returns"] = d.decode_symbol(self._lazy(self.m_returns, last["returns"]))
        m, lev, n = self._ctx(last["returns"])
        diff = self.ic_dx.decompress(d, self.med_x[m].get(), 1 if n == 1 else 0)
        last["xi"] = _i32(last["xi"] + diff)
        self.med_x[m].add(diff)
        kb = self.ic_dx.k
        ctx = (1 if n == 1 else 0) + ((kb & ~1) if kb < 20 else 20)
        diff = self.ic_dy.decompress(d, self.med_y[m].get(), ctx)
        last["yi"] = _i32(last["yi"] + diff)
        self.med_y[m].add(diff)

        if "z" in want:
            kb = (self.ic_dx.k + self.ic_dy.k) // 2
            ctx = (1 if n == 1 else 0) + ((kb & ~1) if kb < 18 else 18)
            last["zi"] = self.ic_z.decompress(dec["z"], self.last_height[lev], ctx)
            self.last_height[lev] = last["zi"]
        if "classification" in want:
            last["classification"] = dec["classification"].decode_symbol(
                self._lazy(self.m_cls, last["classification"])
            )
        if "flags" in want:
            last["flags"] = dec["flags"].decode_symbol(self._lazy(self.m_flags, last["flags"]))
        if "intensity" in want:
            last["intensity"] = self.ic_intensity.decompress(
                dec["intensity"], self.last_intensity[m], min(m, 3)
            )
            self.last_intensity[m] = last["intensity"]
        if "scan_angle" in want:
            v = self.ic_angle.decompress(
                dec["scan_angle"], last["scan_angle"] & 0xFFFF, 1 if n == 1 else 0
            )
            last["scan_angle"] = v - 0x10000 if v >= 0x8000 else v
        if "user_data" in want:
            last["user_data"] = dec["user_data"].decode_symbol(
                self._lazy(self.m_user, last["user_data"])
            )
        if "point_source" in want:
            last["point_source"] = self.ic_source.decompress(
                dec["point_source"], last["point_source"]
            )
        out = dict(last)
        if "gps_time" in want:
            out["gps_bits"] = self.gps.read(dec["gps_time"])
        return out


# variable-size chunking sentinel (LASzip: chunk boundaries are caller
# controlled — COPC uses one chunk per octree node — and the chunk table
# stores (point count, byte size) pairs instead of sizes only)
VARIABLE_CHUNKS = 0xFFFFFFFF


def _laszip14_vlr(fmt: int, chunk_size: int, extra_bytes: int = 0) -> bytes:
    """LASzip VLR for compressor 3 (layered chunked) + v3 item records."""
    items = [(_ITEM_POINT14, 30, 3)]
    if fmt == 7:
        items.append((_ITEM_RGB14, 6, 3))
    elif fmt == 8:
        items.append((_ITEM_RGBNIR14, 8, 3))
    if extra_bytes:
        items.append((_ITEM_BYTE14, extra_bytes, 3))
    payload = struct.pack(
        "<HHBBHIIqqH",
        _COMPRESSOR_LAYERED_CHUNKED, 0, 3, 4, 3, 0, chunk_size, -1, -1, len(items),
    )
    for t, s, v in items:
        payload += struct.pack("<HHH", t, s, v)
    vlr_header = struct.pack(
        "<H16sHH32s", 0, _LASZIP_USER_ID, _LASZIP_RECORD_ID, len(payload),
        b"dronedb_spark laz14".ljust(32, b"\x00"),
    )
    return vlr_header + payload


def encode_laz14(
    x, y, z,
    classification=None, intensity=None, gps_time=None, rgb=None, nir=None,
    return_number=None, number_of_returns=None, scanner_channel=None,
    scan_angle=None, point_source=None, user_data=None, extra=None,
    scale=(0.001, 0.001, 0.001), offset=(0.0, 0.0, 0.0),
    chunk_size: int = _DEFAULT_CHUNK,
    chunk_bounds: list[int] | None = None,
    extra_vlrs: list[bytes] | None = None,
    evlrs: list[tuple[bytes, int, bytes]] | None = None,
    return_layout: bool = False,
):
    """LAZ-compressed LAS 1.4 (PDRF 6/7/8), LASzip v3 layered chunks.

    ``chunk_bounds``: explicit chunk cut points (ascending, ending at n)
    → variable-size chunking (VLR chunk_size = 0xFFFFFFFF, chunk table
    stores (count, size) pairs) — the COPC layout, one chunk per octree
    node.  ``extra_vlrs``: raw VLR blocks (header+payload) placed BEFORE
    the laszip VLR (COPC info must be the first VLR).  ``evlrs``:
    (user_id, record_id, payload) extended VLRs appended after the chunk
    table.  ``return_layout``: also return a dict with per-chunk
    (offset, size, count) and the EVLR payload offsets — what a
    container writer (COPC hierarchy) needs.
    """
    fmt = 6 if rgb is None else (8 if nir is not None else 7)
    n, f = _pack_fields(
        x, y, z, scale, offset, classification, intensity, gps_time,
        return_number, number_of_returns, scanner_channel,
        scan_angle, point_source, user_data,
    )
    rgb_arr = np.asarray(rgb, dtype=np.uint16) if fmt >= 7 else None
    nir_arr = np.asarray(nir, dtype=np.uint16) if fmt == 8 else None
    extra_arr = np.asarray(extra, dtype=np.uint8) if extra is not None else None
    n_extra = extra_arr.shape[1] if extra_arr is not None else 0
    rec_len = _PT14_LEN[fmt] + n_extra

    layers = list(Point14Layered.POINT_LAYERS)
    if fmt >= 7:
        layers.append("rgb")
    if fmt == 8:
        layers.append("nir")
    if n_extra:
        layers.append("extra")

    if chunk_bounds is not None:
        ranges = list(zip([0] + list(chunk_bounds)[:-1], chunk_bounds))
        vlr = _laszip14_vlr(fmt, VARIABLE_CHUNKS, n_extra)
    else:
        ranges = [(s, min(s + chunk_size, n)) for s in range(0, n, chunk_size)]
        vlr = _laszip14_vlr(fmt, chunk_size, n_extra)
    pre_vlrs = b"".join(extra_vlrs or [])
    all_vlr = pre_vlrs + vlr

    def seed_bytes(i: int) -> bytes:
        b = _P14.pack(
            int(f["xi"][i]), int(f["yi"][i]), int(f["zi"][i]), int(f["intensity"][i]),
            int(f["returns"][i]), int(f["flags"][i]), int(f["classification"][i]),
            int(f["user_data"][i]), int(f["scan_angle"][i]), int(f["point_source"][i]),
            float(f["gps_bits"][i].view(np.float64)),
        )
        if fmt >= 7:
            b += struct.pack("<3H", *(int(v) for v in rgb_arr[i]))
        if fmt == 8:
            b += struct.pack("<H", int(nir_arr[i]))
        if n_extra:
            b += extra_arr[i].tobytes()
        return b

    def row(i: int) -> dict:
        # plain ints: numpy scalar arithmetic would wrap/warn on the
        # unsigned fields inside the IntegerCompressor's corrector math
        return {k: int(f[k][i]) for k in f}

    chunks: list[bytes] = []
    for start, end in ranges:
        codec = Point14Layered(row(start))
        rgb12 = nir_ic = byte_v2 = None
        if fmt >= 7:
            rgb12 = Rgb12V2()
            rgb12.init(tuple(int(v) for v in rgb_arr[start]))
        if fmt == 8:
            nir_ic = IntegerCompressor(16, 1)
            last_nir = int(nir_arr[start])
        if n_extra:
            byte_v2 = ByteV2(n_extra)
            byte_v2.init(extra_arr[start].tobytes())
        enc = {name: ArithmeticEncoder() for name in layers}
        for i in range(start + 1, end):
            codec.write(enc, row(i))
            if rgb12 is not None:
                rgb12.write(enc["rgb"], tuple(int(v) for v in rgb_arr[i]))
            if nir_ic is not None:
                nir_ic.compress(enc["nir"], last_nir, int(nir_arr[i]))
                last_nir = int(nir_arr[i])
            if byte_v2 is not None:
                byte_v2.write(enc["extra"], extra_arr[i].tobytes())
        payloads = [enc[name].done() for name in layers]
        buf = bytearray(seed_bytes(start))
        buf += struct.pack(f"<{len(layers)}I", *(len(p) for p in payloads))
        for p in payloads:
            buf += p
        chunks.append(bytes(buf))

    point_start = _HDR14 + len(all_vlr)
    body = bytearray(b"\x00" * 8)
    chunk_layout = []
    for (start, end), c in zip(ranges, chunks):
        chunk_layout.append(
            {"offset": point_start + len(body), "size": len(c), "count": end - start}
        )
        body += c
    struct.pack_into("<q", body, 0, point_start + len(body))
    body += struct.pack("<II", 0, len(chunks))
    if chunks:
        tenc = ArithmeticEncoder()
        tic = IntegerCompressor(32, 2)
        prev_n = prev_s = 0
        for (start, end), c in zip(ranges, chunks):
            if chunk_bounds is not None:
                # variable chunking: the table carries (count, size) pairs
                tic.compress(tenc, prev_n, end - start, 0)
                prev_n = end - start
            tic.compress(tenc, prev_s, len(c), 1)
            prev_s = len(c)
        body += tenc.done()

    evlr_block = bytearray()
    evlr_layout = []
    evlr_base = point_start + len(body)
    for user_id, record_id, payload in evlrs or []:
        evlr_layout.append(
            {"payload_offset": evlr_base + len(evlr_block) + 60, "size": len(payload)}
        )
        evlr_block += struct.pack(
            "<H16sHQ32s", 0, user_id.ljust(16, b"\x00"), record_id, len(payload),
            b"dronedb_spark".ljust(32, b"\x00"),
        )
        evlr_block += payload

    header = _las14_header(
        n, fmt, rec_len, scale, offset,
        _bbox_of(f["xi"], f["yi"], f["zi"], scale, offset),
        1 + len(extra_vlrs or []), len(all_vlr), True,
        evlr_offset=evlr_base if evlrs else 0, evlr_count=len(evlrs or []),
    )
    data = header + all_vlr + bytes(body) + bytes(evlr_block)
    if return_layout:
        return data, {"chunks": chunk_layout, "evlrs": evlr_layout}
    return data


# The field layers a caller can skip; xy is always decoded (it carries
# the prediction context every other layer's models key on).
_SELECTIVE = {
    "z", "classification", "flags", "intensity", "scan_angle",
    "user_data", "point_source", "gps_time", "rgb", "nir", "extra",
}


def _laz14_layers(fmt: int, n_extra: int) -> list[str]:
    layers = list(Point14Layered.POINT_LAYERS)
    if fmt >= 7:
        layers.append("rgb")
    if fmt == 8:
        layers.append("nir")
    if n_extra:
        layers.append("extra")
    return layers


def _read_chunk14(
    data: bytes, pos: int, count: int, fmt: int, n_extra: int, want: set
) -> dict[str, np.ndarray]:
    """Decode ONE layered chunk (seed + layer sizes + layer streams) at
    ``pos`` → dict of integer-domain arrays of length ``count``.  The
    COPC reader calls this per selected octree node."""
    layers = _laz14_layers(fmt, n_extra)
    want = set(want) | {"xy"}
    seed = {}
    (
        seed["xi"], seed["yi"], seed["zi"], seed["intensity"], seed["returns"],
        seed["flags"], seed["classification"], seed["user_data"],
        seed["scan_angle"], seed["point_source"], gps_f,
    ) = _P14.unpack_from(data, pos)
    seed["gps_bits"] = np.float64(gps_f).view(np.uint64)
    p = pos + 30
    if fmt >= 7:
        rgb0 = struct.unpack_from("<3H", data, p)
        p += 6
    if fmt == 8:
        (nir0,) = struct.unpack_from("<H", data, p)
        p += 2
    if n_extra:
        extra0 = data[p : p + n_extra]
        p += n_extra
    lay_sizes = struct.unpack_from(f"<{len(layers)}I", data, p)
    p += 4 * len(layers)
    dec: dict[str, ArithmeticDecoder] = {}
    for name, lsz in zip(layers, lay_sizes):
        if name in want:
            dec[name] = ArithmeticDecoder(data, p)
        p += lsz

    cols = {
        k: np.zeros(count, np.int64)
        for k in (
            "xi", "yi", "zi", "intensity", "returns", "flags",
            "classification", "user_data", "scan_angle", "point_source",
        )
    }
    cols["gps_bits"] = np.zeros(count, np.uint64)
    rgb_out = np.zeros((count, 3), np.int64) if fmt >= 7 else None
    nir_out = np.zeros(count, np.int64) if fmt == 8 else None
    extra_out = np.zeros((count, n_extra), np.uint8) if n_extra else None

    codec = Point14Layered(seed)
    rgb12 = nir_ic = byte_v2 = None
    if fmt >= 7:
        rgb12 = Rgb12V2()
        rgb12.init(rgb0)
        rgb_out[0] = rgb0
    if fmt == 8:
        nir_ic = IntegerCompressor(16, 1)
        last_nir = nir0
        nir_out[0] = nir0
    if n_extra:
        byte_v2 = ByteV2(n_extra)
        byte_v2.init(extra0)
        extra_out[0] = np.frombuffer(extra0, dtype=np.uint8)
    for k in cols:
        cols[k][0] = seed[k]
    for idx in range(1, count):
        out = codec.read(dec, want)
        for k in cols:
            if k in out:
                cols[k][idx] = out[k]
        if rgb12 is not None and "rgb" in want:
            rgb_out[idx] = rgb12.read(dec["rgb"])
        if nir_ic is not None and "nir" in want:
            last_nir = nir_ic.decompress(dec["nir"], last_nir)
            nir_out[idx] = last_nir
        if byte_v2 is not None and "extra" in want:
            extra_out[idx] = np.frombuffer(byte_v2.read(dec["extra"]), dtype=np.uint8)
    if rgb_out is not None:
        cols["rgb"] = rgb_out
    if nir_out is not None:
        cols["nir"] = nir_out
    if extra_out is not None:
        cols["extra"] = extra_out
    return cols


def _cols_to_points(cols: dict, info: dict, fmt: int, n_extra: int) -> dict[str, np.ndarray]:
    sx, sy, sz = info["scale"]
    ox, oy, oz = info["offset"]
    out = {
        "x": cols["xi"] * sx + ox,
        "y": cols["yi"] * sy + oy,
        "z": cols["zi"] * sz + oz,
        "intensity": cols["intensity"],
        "classification": cols["classification"],
        "return_number": cols["returns"] & 0x0F,
        "number_of_returns": (cols["returns"] >> 4) & 0x0F,
        "scanner_channel": (cols["flags"] >> 4) & 0x03,
        "scan_angle": cols["scan_angle"],
        "point_source": cols["point_source"],
        "gps_time": cols["gps_bits"].view(np.float64).copy(),
    }
    if fmt >= 7:
        out["red"], out["green"], out["blue"] = (
            cols["rgb"][:, 0], cols["rgb"][:, 1], cols["rgb"][:, 2],
        )
    if fmt == 8:
        out["nir"] = cols["nir"]
    if n_extra:
        out["extra_bytes"] = cols["extra"]
    return out


def _laz14_meta(data: bytes) -> dict:
    """Parse header + laszip VLR + chunk table → everything a chunked
    reader needs: per-chunk (offset, size, count), fmt, n_extra."""
    from dronedb_spark.sources.las import las_info
    from dronedb_spark.sources.laz import _parse_laszip_vlr

    info = las_info(data)
    fmt, n = info["point_format"], info["n_points"]
    (header_size,) = struct.unpack_from("<H", data, 94)
    (n_vlrs,) = struct.unpack_from("<I", data, 100)
    vlr = _parse_laszip_vlr(data, header_size, n_vlrs)
    if vlr["compressor"] != _COMPRESSOR_LAYERED_CHUNKED:
        raise NotImplementedError(f"laz14: compressor {vlr['compressor']}")
    items = [tuple(i) for i in vlr["items"]]
    if items[0][0] != _ITEM_POINT14:
        raise NotImplementedError(f"laz14: item layout {items}")
    n_extra = next((s for t, s, _ in items if t == _ITEM_BYTE14), 0)
    chunk_size = vlr["chunk_size"]
    variable = chunk_size == VARIABLE_CHUNKS

    point_start = info["point_data_offset"]
    (table_offset,) = struct.unpack_from("<q", data, point_start)
    _version, n_chunks = struct.unpack_from("<II", data, table_offset)
    chunks = []
    if n_chunks:
        tdec = ArithmeticDecoder(data, table_offset + 8)
        tic = IntegerCompressor(32, 2)
        prev_n = prev_s = 0
        pos = point_start + 8
        remaining = n
        for _ in range(n_chunks):
            if variable:
                prev_n = tic.decompress(tdec, prev_n, 0)
                count = prev_n
            else:
                count = min(chunk_size, remaining)
            prev_s = tic.decompress(tdec, prev_s, 1)
            chunks.append({"offset": pos, "size": prev_s, "count": count})
            pos += prev_s
            remaining -= count
    return {"info": info, "fmt": fmt, "n": n, "n_extra": n_extra, "chunks": chunks}


def decode_laz14(data: bytes, want: set | None = None) -> dict[str, np.ndarray]:
    """Decode a LASzip-v3 layered file → dict of arrays (decode_las
    layout + number_of_returns / scanner_channel / scan_angle / nir).

    ``want``: optional subset of ``_SELECTIVE`` layer names — skipped
    layers are never entropy-decoded (their bytes are jumped via the
    recorded layer sizes), the selective-decompression contract of the
    v3 format.  x/y are always decoded; unrequested fields are
    unspecified (carry stale predictor state).
    """
    meta = _laz14_meta(data)
    fmt, n, n_extra = meta["fmt"], meta["n"], meta["n_extra"]
    layers = _laz14_layers(fmt, n_extra)
    want = set(want) if want is not None else set(layers)
    want &= set(layers)
    want |= {"xy"}

    parts = [
        _read_chunk14(data, c["offset"], c["count"], fmt, n_extra, want)
        for c in meta["chunks"]
    ]
    total = sum(c["count"] for c in meta["chunks"])
    if total != n:
        raise ValueError(f"laz14: {total} points in chunk table, header says {n}")
    cols = {
        k: np.concatenate([p[k] for p in parts]) if parts else np.zeros(0, np.int64)
        for k in (parts[0] if parts else {})
    }
    return _cols_to_points(cols, meta["info"], fmt, n_extra)
