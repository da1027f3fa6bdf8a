"""Tiled COG sink/reader round-trips (sources/cog.py)."""

import struct

import numpy as np
import pytest

from dronedb_spark.sources.cog import (
    cog_info,
    decode_cog_level,
    encode_cog,
    read_cog_tile,
)


def _arr(h=100, w=80, dtype=np.float32):
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return (((r * 13 + c * 29) % 997) * 0.25).astype(dtype)


def test_levels_and_geo():
    a = _arr()
    data = encode_cog(a, pixel_scale=(0.5, 0.5), tiepoint=(1000.0, 2000.0),
                      nodata=-9999.0, tile=32)
    info = cog_info(data)
    dims = [(lv["width"], lv["height"]) for lv in info["levels"]]
    assert dims == [(80, 100), (40, 50), (20, 25)]
    assert info["geo"] == {
        "pixel_scale": (0.5, 0.5), "tiepoint": (1000.0, 2000.0), "nodata": -9999.0,
    }


def test_every_level_exact():
    a = _arr()
    data = encode_cog(a, tile=32)
    for lvl, stride in ((0, 1), (1, 2), (2, 4)):
        assert (decode_cog_level(data, lvl) == a[::stride, ::stride]).all()


def test_single_tile_read_and_edge_padding():
    a = _arr()
    data = encode_cog(a, nodata=-9999.0, tile=32)
    t = read_cog_tile(data, 0, 1, 2)  # right-edge tile: 32x16 real + pad
    assert t.shape == (32, 32)
    assert (t[:, :16] == a[32:64, 64:80]).all()
    assert (t[:, 16:] == -9999.0).all()


def test_compressed_tiles():
    a = _arr()
    for comp in ("deflate", "lzw"):
        data = encode_cog(a, tile=32, compression=comp)
        assert (decode_cog_level(data, 1) == a[::2, ::2]).all()


def test_ifds_before_tile_data():
    """The cloud-optimized property: every IFD (and its heaps) sits
    before the first tile payload, so one head fetch gives the layout."""
    a = _arr()
    data = encode_cog(a, tile=32)
    endian = "<"
    (off,) = struct.unpack_from(endian + "I", data, 4)
    last_ifd_end = 0
    first_tile = len(data)
    while off:
        (n,) = struct.unpack_from(endian + "H", data, off)
        last_ifd_end = max(last_ifd_end, off + 2 + 12 * n + 4)
        for i in range(n):
            tag, typ, cnt = struct.unpack_from(endian + "HHI", data, off + 2 + 12 * i)
            if tag == 324:
                (v,) = struct.unpack_from(endian + "I", data, off + 2 + 12 * i + 8)
                if cnt == 1:
                    first_tile = min(first_tile, v)
                else:
                    offs = struct.unpack_from(f"{endian}{cnt}I", data, v)
                    first_tile = min(first_tile, min(offs))
        (off,) = struct.unpack_from(endian + "I", data, off + 2 + 12 * n)
    assert last_ifd_end <= first_tile


def test_overview_ifds_flagged_reduced():
    a = _arr()
    data = encode_cog(a, tile=32)
    from dronedb_spark.sources.exif import _read_ifd

    (off,) = struct.unpack_from("<I", data, 4)
    ifds = []
    while off:
        ifd = _read_ifd(data, off, "<")
        ifds.append(ifd)
        (n,) = struct.unpack_from("<H", data, off)
        (off,) = struct.unpack_from("<I", data, off + 2 + 12 * n)
    assert 254 not in ifds[0]
    for ifd in ifds[1:]:
        assert struct.unpack("<I", ifd[254][2][:4])[0] == 1


def test_bad_tile_index():
    data = encode_cog(_arr(), tile=32)
    with pytest.raises(IndexError):
        read_cog_tile(data, 0, 9, 0)


def test_is_optimized_cog_detection(spark):
    """The build-skip gate (isOptimizedCog parity, cog_utils.cpp:11):
    our own COG output detects as optimized; a strip TIFF, a tiled COG
    without georeferencing, and junk do not."""
    import numpy as np

    from dronedb_spark.sources.cog import encode_cog, is_optimized_cog
    from dronedb_spark.sources.tiff import encode_tiff

    arr = (np.arange(300 * 300, dtype=np.int64) % 251).astype(np.uint8).reshape(300, 300)
    cog = encode_cog(arr, pixel_scale=(0.5, 0.5), tiepoint=(1000.0, 2000.0))
    assert is_optimized_cog(cog)
    # no georeferencing -> needs rebuild
    assert not is_optimized_cog(encode_cog(arr))
    # plain strip TIFF -> not tiled
    assert not is_optimized_cog(encode_tiff(arr))
    assert not is_optimized_cog(b"not a tiff at all")


def test_build_copies_optimized_cog_verbatim(spark, tmp_path):
    """A GeoRaster input that is ALREADY an optimized COG must be copied
    byte-identically by the build, not re-encoded (cog.cpp:81-95)."""
    import numpy as np

    from dronedb_spark.catalog.build import build_one
    from dronedb_spark.sources.cog import encode_cog

    arr = (np.arange(280 * 260, dtype=np.int64) % 251).astype(np.uint8).reshape(280, 260)
    cog = encode_cog(arr, pixel_scale=(1.0, 1.0), tiepoint=(0.0, 0.0))
    root = str(tmp_path)
    status = build_one(root, "ortho.tif", "h1", "cog", cog)
    assert status == "built"
    out = (tmp_path / ".ddb_spark" / "build" / "h1" / "cog" / "data.tif").read_bytes()
    assert out == cog
