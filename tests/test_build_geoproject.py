"""Tests: W9 build idempotence, W11 passwords, R9 geoprojection."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.catalog.build import build_all, pending_builds
from dronedb_spark.catalog.passwords import PasswordManager
from dronedb_spark.catalog.store import DatasetCatalog
from dronedb_spark.raster.geoproject import geoproject, homography_from_corners


@pytest.fixture()
def built_tree(tmp_path):
    (tmp_path / "a.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x01" * 32)
    (tmp_path / "c.las").write_bytes(b"LASF" + b"\x00" * 64)
    (tmp_path / "r.tif").write_bytes(b"II*\x00" + b"\x00" * 64)
    (tmp_path / "plain.txt").write_text("no artifact for Generic")
    return tmp_path


def test_build_idempotent(spark, built_tree):
    cat = DatasetCatalog.init(spark, str(built_tree))
    cat.add()
    assert len(pending_builds(cat)) == 3  # jpg, las, tif (txt is Generic)
    counts = build_all(cat)
    assert counts == {"thumb": 1, "copc": 1, "cog": 1}
    # second run: everything complete, nothing rebuilt (build.cpp:161-175)
    assert pending_builds(cat) == []
    assert build_all(cat) == {}
    # content change → new hash → artifact pending again
    import os, time

    p = built_tree / "a.jpg"
    p.write_bytes(b"\xff\xd8\xff\xe0" + b"\x02" * 32)
    os.utime(p, (time.time() + 5, time.time() + 5))
    cat.add()
    assert [k for _, _, k in pending_builds(cat)] == ["thumb"]


def test_password_manager(spark, tmp_path):
    pm = PasswordManager(spark, str(tmp_path))
    assert pm.verify("anything")  # open dataset
    pm.append("hunter2")
    assert pm.verify("hunter2")
    assert not pm.verify("wrong")
    pm.append("second")
    assert pm.verify("second") and pm.verify("hunter2")
    pm.clear()
    assert pm.verify("anything")


def test_homography_identityish():
    src = np.array([(0, 0), (0, 9), (9, 9), (9, 0)], dtype=float)
    H = homography_from_corners(src, src)
    assert np.allclose(H, np.eye(3), atol=1e-9)


def test_geoproject_nadir():
    img = np.arange(100, dtype=float).reshape(10, 10)
    # square footprint 20 m × 20 m, UL/LL/LR/UR in projected coords
    fp = [(0.0, 20.0), (0.0, 0.0), (20.0, 0.0), (20.0, 20.0)]
    out, origin = geoproject(img, fp, gsd=2.0)
    assert out.shape == (10, 10)
    assert origin == (0.0, 20.0)
    # orientation: ground north row 0 ↔ image row 0 (UL corner)
    assert out[0, 0] == img[0, 0]
    assert out[9, 9] == img[9, 9]
    # no nodata inside the footprint
    assert (out != -9999.0).all()


def test_geoproject_oblique_has_nodata_outside():
    img = np.ones((8, 8))
    # trapezoid footprint (oblique shot): far edge wider than near edge
    fp = [(2.0, 30.0), (0.0, 0.0), (20.0, 0.0), (18.0, 30.0)]
    out, _ = geoproject(img, fp, gsd=1.0)
    assert (out == -9999.0).any()  # corners outside the trapezoid
    assert (out == 1.0).any()
