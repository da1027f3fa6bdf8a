"""RAD Gaussian-splat LOD container (sources/rad.py; reference
rad.cpp/rad.h + the build.cpp:169 gsplat/model.rad artifact)."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.sources.rad import (
    build_rad,
    encode_rad,
    rad_bounds,
    read_rad_coarse,
    read_rad_header,
)


def _one_chunk(n=6, **kw):
    c = np.array([[i * 1.0, -i * 2.0, i * 0.5] for i in range(n)])
    return {"center": c, "rgb": None, "alpha": None, **kw}


def test_every_encoding_round_trips_centers():
    base = np.array([[1.25, -3.5, 0.0], [100.0, 0.0625, -7.75], [2.0, 4.0, 8.0]])
    for enc in ["f32", "f16", "f32_lebytes", "f16_lebytes", "r8", "r8_delta"]:
        data = encode_rad([{"center": base, "encodings": {"center": enc}}])
        got = read_rad_coarse(data)["positions"]
        if enc.startswith("f32"):
            assert np.allclose(got, base, atol=0)
        elif enc.startswith("f16"):
            assert np.allclose(got, base, rtol=1e-3)
        else:  # 8-bit quantized: within half a step of the span
            span = base.max() - base.min()
            assert np.abs(got - base).max() <= span / 255.0


def test_gz_compression_and_defaults():
    data = encode_rad([_one_chunk(encodings={"center": "f32"}, gz={"center"})])
    d = read_rad_coarse(data)
    assert d["count"] == 6
    # no rgb/alpha planes → mid-grey, full opacity (rad.cpp:396-404)
    assert np.all(d["colors"] == 0.5)
    assert np.all(d["opacities"] == 1.0)


def test_max_chunks_truncates_but_bounds_sees_all():
    chunks = [
        _one_chunk(3, encodings={"center": "f32"}),
        {"center": np.array([[50.0, -50.0, 9.0]]), "encodings": {"center": "f32"}},
    ]
    data = encode_rad(chunks)
    assert read_rad_coarse(data, max_chunks=1)["count"] == 3
    assert read_rad_coarse(data, max_chunks=0)["count"] == 4  # 0 → all
    mn, mx = rad_bounds(data)
    assert mx[0] == 50.0 and mn[1] == -50.0  # fine chunk included


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        read_rad_header(b"NOPE" + b"\x00" * 32)
    # external .radc chunk references are rejected like the reference
    import json
    import struct

    meta = json.dumps({"chunks": [{"filename": "x.radc", "offset": 0, "bytes": 8}]}).encode()
    data = b"RAD0" + struct.pack("<I", len(meta)) + meta
    with pytest.raises(ValueError, match="radc"):
        read_rad_header(data)


def test_build_rad_orders_by_activated_opacity_and_chunks():
    recs = [
        dict(idx=i, x=float(i), y=0.0, z=0.0, alpha=float(i % 4) - 2.0,
             dc_r=0.0, dc_g=0.0, dc_b=0.0)
        for i in range(9)
    ]
    d = read_rad_coarse(build_rad(recs), max_chunks=0)
    assert d["count"] == 9
    # opacity non-increasing (coarse-to-fine importance order)
    assert np.all(np.diff(d["opacities"]) <= 1e-6)
    # DC 0 → display mid-grey 0.5
    assert np.abs(d["colors"] - 0.5).max() <= 0.5 / 255 + 1e-9


def test_build_artifact_contains_model_rad(spark, tmp_path):
    from dronedb_spark.catalog.build import build_one
    from dronedb_spark.sources.gsplat import encode_splat_binary, _gs_spec

    data = encode_splat_binary([_gs_spec(i) for i in range(5)])
    status = build_one(str(tmp_path), "a.splat", "hash0", "gsplat", data)
    assert status == "built"
    rad_path = tmp_path / ".ddb_spark" / "build" / "hash0" / "gsplat" / "model.rad"
    assert rad_path.exists()
    d = read_rad_coarse(rad_path.read_bytes())
    assert d["count"] == 5
    assert rad_bounds(rad_path.read_bytes()) is not None


def test_rad_to_preview_thumbnail_chain(spark):
    """generateSplatThumbFromRad parity chain: RAD container → 2-chunk
    coarse decode → orthographic preview → real PNG bytes."""
    from dronedb_spark.raster.preview import splat_preview, splat_preview_png
    from dronedb_spark.sources.png import decode_png
    from dronedb_spark.sources.rad import _rad_fixture_root, read_rad_files

    coarse = read_rad_files(spark, _rad_fixture_root(), max_chunks=2)
    splats = coarse.withColumnRenamed("idx", "pid")
    rows = splat_preview(splats, 16).collect()
    assert rows, "some splats must rasterize"
    data = splat_preview_png(splats, 16)
    arr = decode_png(data)
    assert arr.shape == (16, 16, 4)
    assert (arr[..., 3] == 255).sum() == len(rows)


def test_preview_depth_axis_selection(spark):
    from dronedb_spark.raster.preview import splat_preview

    # flat in y → depth axis 1; u = x (axis 0), v = z (axis 2)
    flat_y = spark.createDataFrame(
        [{"pid": i, "x": float(i), "y": 0.5, "z": float(i % 3),
          "r": 1.0, "g": 0.0, "b": 0.0, "a": 1.0} for i in range(6)]
    )
    rows = splat_preview(flat_y, 8).collect()
    assert rows and all(r["r"] == 255 for r in rows)
    # sub-threshold opacity renders nothing
    ghost = spark.createDataFrame(
        [{"pid": 0, "x": 0.0, "y": 0.0, "z": 0.0,
          "r": 1.0, "g": 1.0, "b": 1.0, "a": 0.01},
         {"pid": 1, "x": 1.0, "y": 1.0, "z": 1.0,
          "r": 1.0, "g": 1.0, "b": 1.0, "a": 0.01}]
    )
    assert splat_preview(ghost, 8).count() == 0
