"""LAS 1.4 / LASzip v3 layered codec round-trips (sources/laz14.py)."""

import numpy as np
import pytest

from dronedb_spark.sources.las import decode_las, las_info
from dronedb_spark.sources.laz14 import decode_laz14, encode_las14, encode_laz14


def _fields(n, i=0):
    k = np.arange(n, dtype=np.int64)
    return {
        "x": ((i * 17 + k * 5) % 90000) * 0.001,
        "y": ((i * 13 + k * 9) % 90000) * 0.001,
        "z": ((i * 23 + k * 3) % 45000) * 0.001,
        "classification": (i + k) % 32,
        "intensity": (k * 31) % 5000,
        "gps_time": 150000.0 + i * 1000 + k * 0.0005,
        "return_number": k % 4 + 1,
        "number_of_returns": np.full(n, 4),
        "scanner_channel": (k + i) % 4,
        "scan_angle": (k * 11 + i * 7) % 6001 - 3000,
        "point_source": (k // 50 + i) % 20,
    }


def _assert_fields(d, f):
    for name, arr in f.items():
        if name in ("x", "y", "z", "gps_time"):
            assert np.allclose(d[name], arr), name
        else:
            assert (d[name] == arr).all(), name


def test_pdrf6_roundtrip_multichunk():
    f = _fields(5000)
    data = encode_laz14(chunk_size=1000, **f)
    info = las_info(data)
    assert info["version"] == "1.4"
    assert info["point_format"] == 6
    assert info["n_points"] == 5000
    assert info["compressed"]
    _assert_fields(decode_las(data), f)


def test_pdrf7_rgb_roundtrip():
    n = 2000
    k = np.arange(n)
    f = _fields(n, i=1)
    rgb = np.stack([(k * 97) % 65536, (k * 53) % 65536, (k * 29) % 65536], axis=1).astype(
        np.uint16
    )
    data = encode_laz14(rgb=rgb, chunk_size=700, **f)
    assert las_info(data)["point_format"] == 7
    d = decode_las(data)
    _assert_fields(d, f)
    assert (d["red"] == rgb[:, 0]).all()
    assert (d["green"] == rgb[:, 1]).all()
    assert (d["blue"] == rgb[:, 2]).all()


def test_pdrf8_nir_extra_roundtrip():
    n = 1500
    k = np.arange(n)
    f = _fields(n, i=2)
    rgb = np.stack([(k * 7) % 65536, (k * 11) % 65536, (k * 13) % 65536], axis=1).astype(
        np.uint16
    )
    nir = ((k * 41) % 65536).astype(np.uint16)
    extra = np.stack([k % 251, (k * 7) % 251], axis=1).astype(np.uint8)
    data = encode_laz14(rgb=rgb, nir=nir, extra=extra, chunk_size=600, **f)
    assert las_info(data)["point_format"] == 8
    d = decode_las(data)
    _assert_fields(d, f)
    assert (d["nir"] == nir).all()
    assert (d["extra_bytes"] == extra).all()


def test_selective_layer_decode():
    """The v3 contract: skip layers without entropy-decoding them."""
    f = _fields(3000)
    data = encode_laz14(chunk_size=1000, **f)
    full = decode_laz14(data)
    sel = decode_laz14(data, want={"z"})
    assert np.allclose(sel["x"], full["x"])
    assert np.allclose(sel["y"], full["y"])
    assert np.allclose(sel["z"], full["z"])
    # returns travel in the always-decoded xy layer
    assert (sel["return_number"] == full["return_number"]).all()


def test_las14_uncompressed_roundtrip():
    f = _fields(1200, i=1)
    data = encode_las14(**f)
    info = las_info(data)
    assert info["version"] == "1.4" and info["point_format"] == 6
    assert not info["compressed"]
    _assert_fields(decode_las(data), f)


def test_laz14_compresses():
    f = _fields(5000)
    data = encode_laz14(chunk_size=1000, **f)
    assert len(data) < 0.4 * (375 + 30 * 5000)


def test_header_legacy_count_zero():
    """PDRF >= 6 requires the legacy u32 count fields be zero; readers
    must use the 64-bit count at offset 247."""
    import struct

    data = encode_las14(**_fields(100))
    assert struct.unpack_from("<I", data, 107)[0] == 0
    assert struct.unpack_from("<Q", data, 247)[0] == 100


def test_unknown_point_format_raises():
    data = bytearray(encode_las14(**_fields(10)))
    data[104] = 11  # PDRF 11 does not exist in the spec
    with pytest.raises(NotImplementedError):
        decode_las(bytes(data))


def test_truncated_waveform_format_raises():
    """A PDRF-9 flag on 30-byte records is corrupt (the wave tail needs
    59) — must raise cleanly, not underflow numpy's buffer math."""
    data = bytearray(encode_las14(**_fields(10)))
    data[104] = 9
    with pytest.raises(ValueError, match="record length"):
        decode_las(bytes(data))
