"""LAS 1.4 full-waveform support — PDRF 9/10 point records, wave packet
descriptor VLRs, and the internal waveform-data EVLR (ASPRS LAS 1.4 R15
§2.6/§3; reference ingests waveform LAS through PDAL the same way it
does PDRF 6-8, pointcloud.cpp:661).

Wire layout (all public spec):
  * descriptor VLR: user_id ``LASF_Spec``, record_id 100+i, payload
    {bits/sample u8, compression u8 (0=none), n_samples u32, temporal
    spacing u32 (picoseconds), digitizer gain f64, digitizer offset
    f64} — 26 bytes.
  * PDRF 9 = PDRF 6 + {descriptor index u8 (1-based, 0 = none), byte
    offset u64, packet size u32, return-point location f32 (ps),
    parametric dx/dy/dz f32} (+29 bytes → 59); PDRF 10 = PDRF 8 + the
    same tail (→ 67).
  * waveform data: EVLR ``LASF_Spec``/65535 holding the concatenated
    packets; header offset 227 points at the EVLR and global-encoding
    bit 1 marks the data internal.

Scale shape: the waveform payload stays a single binary cell per file
(one task decodes it where it lives); per-point METRICS (peak, energy,
sample count) reduce inside the task so only scalars reach the engine —
a 60 GB waveform tile never crosses the shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_DESC_LEN = 26
_VLR_HDR = 54
_EVLR_HDR = 60
_WAVE_TAIL = [
    ("wpd_index", "u1"),
    ("wf_offset", "<u8"),
    ("wf_size", "<u4"),
    ("wf_return_point", "<f4"),
    ("wf_dx", "<f4"),
    ("wf_dy", "<f4"),
    ("wf_dz", "<f4"),
]


def _vlr(user_id: bytes, record_id: int, payload: bytes, description: bytes = b"") -> bytes:
    return (
        struct.pack("<H", 0)
        + user_id.ljust(16, b"\x00")
        + struct.pack("<HH", record_id, len(payload))
        + description.ljust(32, b"\x00")
        + payload
    )


def _evlr(user_id: bytes, record_id: int, payload: bytes) -> bytes:
    return (
        struct.pack("<H", 0)
        + user_id.ljust(16, b"\x00")
        + struct.pack("<HQ", record_id, len(payload))
        + b"\x00" * 32
        + payload
    )


def pack_descriptor(bits: int, n_samples: int, temporal_ps: int,
                    gain: float, offset: float) -> bytes:
    return struct.pack("<BBIIdd", bits, 0, n_samples, temporal_ps, gain, offset)


def parse_descriptors(data: bytes) -> dict[int, dict]:
    """Walk the VLR block → {descriptor_index: fields} (record IDs
    100-354 map to wave packet descriptors 1-255)."""
    (n_vlrs,) = struct.unpack_from("<I", data, 100)
    (header_size,) = struct.unpack_from("<H", data, 94)
    pos = header_size
    out: dict[int, dict] = {}
    for _ in range(n_vlrs):
        user = data[pos + 2 : pos + 18].rstrip(b"\x00")
        rec_id, length = struct.unpack_from("<HH", data, pos + 18)
        payload = data[pos + _VLR_HDR : pos + _VLR_HDR + length]
        if user == b"LASF_Spec" and 100 <= rec_id <= 354 and length >= _DESC_LEN:
            bits, comp, n_s, dt_ps, gain, off = struct.unpack_from("<BBIIdd", payload, 0)
            out[rec_id - 99] = {
                "bits_per_sample": bits, "compression": comp,
                "n_samples": n_s, "temporal_ps": dt_ps,
                "gain": gain, "offset": off,
            }
        pos += _VLR_HDR + length
    return out


def _find_waveform_evlr(data: bytes) -> tuple[int, int]:
    """(record_start, payload_len) of the LASF_Spec/65535 EVLR.  Note:
    record_start is the EVLR HEADER position — per LAS 1.4 R15 a point's
    packet lives at header-field-227 + wf_offset, and both field 227 and
    the per-point offsets are relative to the record (header included),
    so the first packet's wf_offset is 60, never 0."""
    (evlr_off,) = struct.unpack_from("<Q", data, 235)
    (n_evlrs,) = struct.unpack_from("<I", data, 243)
    pos = evlr_off
    for _ in range(n_evlrs):
        user = data[pos + 2 : pos + 18].rstrip(b"\x00")
        rec_id, length = struct.unpack_from("<HQ", data, pos + 18)
        if user == b"LASF_Spec" and rec_id == 65535:
            return pos, int(length)
        pos += _EVLR_HDR + length
    raise ValueError("no waveform data EVLR")


def encode_las14_waveform(
    x, y, z, waveforms: list[np.ndarray],
    descriptor_index=None,
    return_point_ps=None, direction=None,
    classification=None, intensity=None, gps_time=None,
    rgb=None, nir=None,
    bits_per_sample: int = 16, temporal_ps: int = 1000,
    gain: float = 0.01, offset: float = 0.0,
    scale=(0.001, 0.001, 0.001), origin=(0.0, 0.0, 0.0),
) -> bytes:
    """LAS 1.4 PDRF 9 (or 10 when rgb+nir given): one waveform packet
    per point, stored internally.  Distinct waveform lengths become
    distinct descriptors automatically when ``descriptor_index`` is
    omitted."""
    from dronedb_spark.sources.laz14 import _bbox_of, _las14_header, _pack_fields

    n, f = _pack_fields(
        x, y, z, scale, origin, classification, intensity, gps_time,
        None, None, None, None, None, None,
    )
    if len(waveforms) != n:
        raise ValueError("one waveform per point required")
    fmt = 10 if rgb is not None and nir is not None else 9
    rec_len = (38 if fmt == 10 else 30) + 29

    # descriptors: one per distinct sample count unless caller assigns
    if descriptor_index is None:
        lengths = sorted({len(w) for w in waveforms})
        desc_of_len = {ln: i + 1 for i, ln in enumerate(lengths)}
        descriptor_index = np.array([desc_of_len[len(w)] for w in waveforms], np.uint8)
        descs = {idx: ln for ln, idx in desc_of_len.items()}
    else:
        descriptor_index = np.asarray(descriptor_index, dtype=np.uint8)
        descs = {}
        for di, w in zip(descriptor_index, waveforms):
            descs.setdefault(int(di), len(w))
    vlrs = b"".join(
        _vlr(
            b"LASF_Spec", 99 + idx,
            pack_descriptor(bits_per_sample, ln, temporal_ps, gain, offset),
            b"wave packet descriptor",
        )
        for idx, ln in sorted(descs.items())
    )

    sample_dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[bits_per_sample]
    packets = []
    offsets = np.zeros(n, dtype=np.uint64)
    sizes = np.zeros(n, dtype=np.uint32)
    # per-point offsets are relative to the Waveform Data Packet RECORD
    # (the EVLR including its 60-byte header) — a conformant reader
    # resolves header-field-227 + wf_offset, so the first packet sits at
    # wf_offset = 60
    pos = _EVLR_HDR
    for i, w in enumerate(waveforms):
        blob = np.ascontiguousarray(w, dtype=sample_dtype).tobytes()
        offsets[i] = pos
        sizes[i] = len(blob)
        packets.append(blob)
        pos += len(blob)
    wave_payload = b"".join(packets)

    base = [
        ("x", "<i4", f["xi"]), ("y", "<i4", f["yi"]), ("z", "<i4", f["zi"]),
        ("intensity", "<u2", f["intensity"]), ("returns", "u1", f["returns"]),
        ("flags", "u1", f["flags"]), ("classification", "u1", f["classification"]),
        ("user_data", "u1", f["user_data"]), ("scan_angle", "<i2", f["scan_angle"]),
        ("point_source", "<u2", f["point_source"]),
        ("gps_time", "<f8", f["gps_bits"].view(np.float64)),
    ]
    if fmt == 10:
        rgb_arr = np.asarray(rgb, dtype=np.uint16)
        base += [
            ("red", "<u2", rgb_arr[:, 0]), ("green", "<u2", rgb_arr[:, 1]),
            ("blue", "<u2", rgb_arr[:, 2]),
            ("nir", "<u2", np.asarray(nir, dtype=np.uint16)),
        ]
    rp = (np.zeros(n, np.float32) if return_point_ps is None
          else np.asarray(return_point_ps, dtype=np.float32))
    dxyz = (np.zeros((n, 3), np.float32) if direction is None
            else np.asarray(direction, dtype=np.float32))
    base += [
        ("wpd_index", "u1", descriptor_index),
        ("wf_offset", "<u8", offsets),
        ("wf_size", "<u4", sizes),
        ("wf_return_point", "<f4", rp),
        ("wf_dx", "<f4", dxyz[:, 0]),
        ("wf_dy", "<f4", dxyz[:, 1]),
        ("wf_dz", "<f4", dxyz[:, 2]),
    ]
    rec = np.zeros(n, dtype=np.dtype([(fn, ft) for fn, ft, _ in base]))
    for fn, _ft, a in base:
        rec[fn] = a
    assert rec.dtype.itemsize == rec_len, (rec.dtype.itemsize, rec_len)

    from dronedb_spark.sources.laz14 import _HDR14  # header length constant

    evlr_offset = _HDR14 + len(vlrs) + n * rec_len
    header = bytearray(
        _las14_header(
            n, fmt, rec_len, scale, origin,
            _bbox_of(f["xi"], f["yi"], f["zi"], scale, origin),
            len(descs), len(vlrs), False,
            evlr_offset=evlr_offset, evlr_count=1,
        )
    )
    # global encoding: waveform data packets INTERNAL (bit 1) + WKT (bit 4)
    struct.pack_into("<H", header, 6, 0x0010 | 0x0002)
    struct.pack_into("<Q", header, 227, evlr_offset)  # waveform record start
    return bytes(header) + vlrs + rec.tobytes() + _evlr(b"LASF_Spec", 65535, wave_payload)


def read_waveform(data: bytes, point_index: int) -> dict:
    """One point's waveform: raw samples + volts (gain·s + offset) via
    its descriptor — the random-access read path (byte range into the
    EVLR, no other packet touched)."""
    from dronedb_spark.sources.las import decode_las

    d = decode_las(data)
    descs = parse_descriptors(data)
    start, _length = _find_waveform_evlr(data)
    di = int(d["wpd_index"][point_index])
    if di == 0:
        raise ValueError(f"point {point_index} has no waveform")
    desc = descs[di]
    off = start + int(d["wf_offset"][point_index])
    size = int(d["wf_size"][point_index])
    dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[desc["bits_per_sample"]]
    samples = np.frombuffer(data, dtype=dtype, count=size // dtype().itemsize, offset=off)
    return {
        "samples": samples,
        "volts": samples.astype(np.float64) * desc["gain"] + desc["offset"],
        "descriptor": desc,
        "return_point_ps": float(d["wf_return_point"][point_index]),
    }


def waveform_metrics(data: bytes) -> dict[str, np.ndarray]:
    """Per-point waveform reductions (peak sample, energy = sample sum,
    sample count, descriptor index) — the scalars a distributed pipeline
    ships out of the decode task."""
    from dronedb_spark.sources.las import decode_las

    d = decode_las(data)
    descs = parse_descriptors(data)
    start, _length = _find_waveform_evlr(data)
    n = len(d["x"])
    peak = np.zeros(n, dtype=np.int64)
    energy = np.zeros(n, dtype=np.int64)
    n_samples = np.zeros(n, dtype=np.int64)
    for i in range(n):
        di = int(d["wpd_index"][i])
        if di == 0:
            continue
        desc = descs[di]
        dtype = {8: np.uint8, 16: np.uint16, 32: np.uint32}[desc["bits_per_sample"]]
        size = int(d["wf_size"][i])
        s = np.frombuffer(data, dtype=dtype, count=size // dtype().itemsize,
                          offset=start + int(d["wf_offset"][i]))
        peak[i] = int(s.max()) if s.size else 0
        energy[i] = int(s.sum())
        n_samples[i] = s.size
    return {
        "wpd_index": d["wpd_index"].astype(np.int64),
        "peak": peak, "energy": energy, "n_samples": n_samples,
        "return_point_ps": d["wf_return_point"].astype(np.float64),
    }
