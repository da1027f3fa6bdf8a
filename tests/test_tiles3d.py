"""3D Tiles codec tests (sources/tiles3d.py): pnts round trip, 3tz
archive extraction with Zip-Slip hardening, tileset metadata parity with
the reference reader's field set (tiles3d.cpp:159-283)."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from dronedb_spark.sources.tiles3d import (
    build_tileset,
    decode_pnts,
    encode_3tz,
    encode_pnts,
    extract_3tz,
    tiles3d_info,
)


def test_pnts_roundtrip():
    pos = np.arange(30, dtype=np.float32).reshape(10, 3) * 0.5
    rgb = (np.arange(30) % 256).astype(np.uint8).reshape(10, 3)
    blob = encode_pnts(pos, rgb)
    assert blob[:4] == b"pnts"
    d = decode_pnts(blob)
    assert d["n_points"] == 10
    np.testing.assert_array_equal(d["positions"], pos)
    np.testing.assert_array_equal(d["rgb"], rgb)


def test_pnts_body_is_8_byte_aligned():
    blob = encode_pnts(np.zeros((3, 3), dtype=np.float32))
    ftj_len = int.from_bytes(blob[12:16], "little")
    assert (28 + ftj_len) % 8 == 0


def test_tileset_info_from_3tz():
    region = (0.1, 0.2, 0.3, 0.4, 5.0, 50.0)
    tz = encode_3tz(build_tileset(region, 300.0),
                    {"points.pnts": encode_pnts(np.zeros((1, 3), np.float32))})
    info = tiles3d_info(tz)
    assert info["asset_version"] == "1.0"
    assert info["geometric_error"] == 150.0  # root tile = half the tileset error
    assert info["region_deg"][:4] == pytest.approx([math.degrees(v) for v in region[:4]])
    assert info["region_deg"][4:] == [5.0, 50.0]


def test_extract_3tz(tmp_path):
    tz = encode_3tz(build_tileset((0, 0, 0.01, 0.01, 0, 1), 10.0),
                    {"tiles/points.pnts": encode_pnts(np.zeros((2, 3), np.float32))})
    names = extract_3tz(tz, str(tmp_path))
    assert sorted(names) == ["tiles/points.pnts", "tileset.json"]
    assert os.path.exists(tmp_path / "tileset.json")
    assert os.path.exists(tmp_path / "tiles" / "points.pnts")


def test_extract_3tz_blocks_zip_slip(tmp_path):
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("tileset.json", "{}")
        z.writestr("../evil.txt", "pwned")
    with pytest.raises(ValueError, match="unsafe"):
        extract_3tz(buf.getvalue(), str(tmp_path))
    assert not os.path.exists(tmp_path.parent / "evil.txt")
