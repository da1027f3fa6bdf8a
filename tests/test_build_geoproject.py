"""Tests: W9 build idempotence, W11 passwords, R9 geoprojection."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.catalog.build import build_all, pending_builds
from dronedb_spark.catalog.passwords import PasswordManager
from dronedb_spark.catalog.store import DatasetCatalog
from dronedb_spark.raster.geoproject import geoproject, homography_from_corners


def _png_bytes(seed: int = 1) -> bytes:
    from dronedb_spark.sources.png import encode_png

    arr = ((np.arange(24 * 16 * 3) * seed) % 251).astype(np.uint8).reshape(24, 16, 3)
    return encode_png(arr)


@pytest.fixture()
def built_tree(tmp_path):
    from dronedb_spark.sources.las import encode_las
    from dronedb_spark.sources.tiff import encode_tiff

    (tmp_path / "a.png").write_bytes(_png_bytes())
    xs = np.arange(200, dtype=float) * 0.5
    (tmp_path / "c.las").write_bytes(
        encode_las(xs, xs * 2.0, xs % 7.0, classification=(np.arange(200) % 3))
    )
    dem = (np.arange(40 * 30, dtype=float) % 97).reshape(40, 30)
    (tmp_path / "r.tif").write_bytes(
        encode_tiff(dem, pixel_scale=(1.0, 1.0), tiepoint=(10.0, 20.0))
    )
    (tmp_path / "plain.txt").write_text("no artifact for Generic")
    return tmp_path


def test_build_idempotent_real_artifacts(spark, built_tree):
    import os

    from dronedb_spark.catalog.build import ARTIFACT_FILES, _artifact_dir
    from dronedb_spark.sources.cog import cog_info
    from dronedb_spark.sources.las import las_info
    from dronedb_spark.sources.png import png_info

    cat = DatasetCatalog.init(spark, str(built_tree))
    cat.add()
    assert len(pending_builds(cat)) == 3  # png, las, tif (txt is Generic)
    counts = build_all(cat)
    assert counts == {"thumb": 1, "copc": 1, "cog": 1}
    # artifacts are REAL containers, decodable by their own readers
    hashes = {r["path"]: r["hash"] for r in cat.entries().collect()}

    def artifact(path, kind):
        d = _artifact_dir(cat.root, hashes[path], kind)
        return open(os.path.join(d, ARTIFACT_FILES[kind]), "rb").read()

    copc = artifact("c.las", "copc")
    assert las_info(copc)["n_points"] == 200
    from dronedb_spark.sources.copc import copc_info

    assert copc_info(copc)["halfsize"] > 0  # real COPC info VLR present
    ci = cog_info(artifact("r.tif", "cog"))
    assert ci["levels"][0]["width"] == 30 and ci["levels"][0]["height"] == 40
    w, h, _c = png_info(artifact("a.png", "thumb"))
    assert (w, h) == (16, 24)  # under the thumb cap → unscaled
    # second run: everything complete, nothing rebuilt (build.cpp:161-175)
    assert pending_builds(cat) == []
    assert build_all(cat) == {}
    # content change → new hash → artifact pending again
    import time

    p = built_tree / "a.png"
    p.write_bytes(_png_bytes(seed=7))
    os.utime(p, (time.time() + 5, time.time() + 5))
    cat.add()
    assert [k for _, _, k in pending_builds(cat)] == ["thumb"]


def test_build_vec_and_gsplat_artifacts(spark, tmp_path):
    import json
    import os

    import pyarrow.parquet as pq

    from dronedb_spark.catalog.build import ARTIFACT_FILES, _artifact_dir
    from dronedb_spark.sources.gsplat import encode_splat_binary

    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
             "properties": {}},
            {"type": "Feature", "geometry": {
                "type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]},
             "properties": {}},
        ],
    }
    (tmp_path / "parcels.geojson").write_text(json.dumps(fc))
    rows = [
        {"pos": (0.0, 1.0, 2.0), "scale_linear": (1.0, 1.0, 1.0),
         "rgba": (255, 0, 0, 200), "quat_wxyz": (0.0, 0.0, 0.0, -1.0)}
        for _ in range(5)
    ]
    (tmp_path / "cloud.splat").write_bytes(encode_splat_binary(rows))
    cat = DatasetCatalog.init(spark, str(tmp_path))
    cat.add()
    counts = build_all(cat)
    assert counts == {"vec": 1, "gsplat": 1}
    hashes = {r["path"]: r["hash"] for r in cat.entries().collect()}
    vec = pq.read_table(
        os.path.join(_artifact_dir(cat.root, hashes["parcels.geojson"], "vec"),
                     ARTIFACT_FILES["vec"])
    )
    assert vec.num_rows == 2
    assert sorted(vec.column("n_vertices").to_pylist()) == [1, 3]
    gs = pq.read_table(
        os.path.join(_artifact_dir(cat.root, hashes["cloud.splat"], "gsplat"),
                     ARTIFACT_FILES["gsplat"])
    )
    assert gs.num_rows == 5


def test_build_failure_stays_pending(spark, tmp_path):
    (tmp_path / "broken.las").write_bytes(b"LASF" + b"\x00" * 64)  # truncated
    cat = DatasetCatalog.init(spark, str(tmp_path))
    cat.add()
    assert build_all(cat) == {}  # decode failed → not counted
    # still pending: incomplete artifacts retry on the next build pass
    assert [k for _, _, k in pending_builds(cat)] == ["copc"]


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


def _inflate_vlrs(data: bytes, pad: int) -> bytes:
    """Insert one large padding VLR BEFORE the existing VLRs of a LAS
    1.2 container, fixing n_vlrs, offset_to_point_data, and (for LAZ)
    the absolute chunk-table offset stored at the point-data start —
    models a file whose laszip VLR sits behind big descriptor sets."""
    import struct

    (hdr_size,) = struct.unpack_from("<H", data, 94)
    (pdo,) = struct.unpack_from("<I", data, 96)
    (n_vlrs,) = struct.unpack_from("<I", data, 100)
    vlr = struct.pack("<H16sHH32s", 0, b"test_padding", 7, pad, b"") + b"\x00" * pad
    out = bytearray(data[:hdr_size] + vlr + data[hdr_size:])
    shift = len(vlr)
    struct.pack_into("<I", out, 96, pdo + shift)
    struct.pack_into("<I", out, 100, n_vlrs + 1)
    (tbl,) = struct.unpack_from("<q", out, pdo + shift)
    struct.pack_into("<q", out, pdo + shift, tbl + shift)
    return bytes(out)


def test_build_copc_from_many_vlr_laz(tmp_path):
    """A LAZ whose laszip VLR sits past 4 KiB of preceding VLRs must
    still route through the LAZ decoder in the build path (the old
    fixed-window byte sniff silently took the uncompressed branch)."""
    import os

    from dronedb_spark.catalog.build import ARTIFACT_FILES, _artifact_dir, build_one
    from dronedb_spark.sources.las import las_info
    from dronedb_spark.sources.laz import decode_laz, encode_laz, is_laz

    xs = np.arange(150, dtype=float) * 0.25
    laz = _inflate_vlrs(encode_laz(xs, xs * 3.0, xs % 5.0), pad=5000)
    assert laz.find(b"laszip encoded", 0, 4096) == -1  # sniff window miss
    assert is_laz(laz)
    d = decode_laz(laz)  # VLR walk still finds the laszip record
    assert np.allclose(d["x"], xs)

    assert build_one(str(tmp_path), "deep.laz", "hv1", "copc", laz) == "built"
    art = os.path.join(_artifact_dir(str(tmp_path), "hv1", "copc"), ARTIFACT_FILES["copc"])
    copc = open(art, "rb").read()
    assert las_info(copc)["n_points"] == 150


def test_incremental_build_tolerates_stale_and_glob_paths(spark, tmp_path):
    """build_all's incremental path loads exactly the pending files; a
    stale index row (file deleted since sync) or a filename containing
    glob metacharacters must be skipped, not abort the whole build."""
    from dronedb_spark.catalog.build import build_all
    from dronedb_spark.sources.gsplat import _gs_spec, encode_splat_binary

    (tmp_path / "a.splat").write_bytes(encode_splat_binary([_gs_spec(i) for i in range(4)]))
    (tmp_path / "b[1] *x.splat").write_bytes(
        encode_splat_binary([_gs_spec(i) for i in range(6)])
    )
    (tmp_path / "gone.splat").write_bytes(encode_splat_binary([_gs_spec(9)]))
    cat = DatasetCatalog.init(spark, str(tmp_path))
    cat.add()
    (tmp_path / "gone.splat").unlink()  # now stale in the index
    assert build_all(cat) == {"gsplat": 2}

    # nothing on disk for a pending set that is entirely stale → no-op
    (tmp_path / "c.splat").write_bytes(encode_splat_binary([_gs_spec(2)]))
    cat.add()
    (tmp_path / "c.splat").unlink()
    assert build_all(cat) == {}


def test_vector_build_coproduces_mvt_and_partial_invalidates(spark, tmp_path):
    """A Vector build writes vec/ AND mvt/ (vector.cpp:227-360); a
    partial artifact (vec/ present, mvt/metadata.json missing) must
    count as INCOMPLETE and rebuild (build.cpp:148 completeness)."""
    import json
    import os
    import shutil

    from dronedb_spark.catalog.build import _artifact_dir
    from dronedb_spark.functions.mvt import decode_tile_pbf

    gj = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Point", "coordinates": [10.0, 20.0]}},
        ],
    }
    (tmp_path / "lots.geojson").write_text(json.dumps(gj))
    cat = DatasetCatalog.init(spark, str(tmp_path))
    cat.add()
    assert build_all(cat) == {"vec": 1}
    h = {r["path"]: r["hash"] for r in cat.entries().collect()}["lots.geojson"]
    mvt_dir = _artifact_dir(cat.root, h, "mvt")
    meta = json.loads(open(os.path.join(mvt_dir, "metadata.json")).read())
    # degenerate (zero-area) envelope -> cap zoom 18 (mvt.cpp:24-26)
    assert meta["maxzoom"] == 18 and meta["features"] == 1
    # a tile exists at every level and decodes to the single point
    feats = decode_tile_pbf(
        open(os.path.join(mvt_dir, "18", *_one_tile(mvt_dir, 18)), "rb").read()
    )
    assert len(feats) == 1 and feats[0]["extent"] == 4096
    # wipe the sibling only: build must re-run for this entry
    shutil.rmtree(mvt_dir)
    assert build_all(cat) == {"vec": 1}
    assert os.path.exists(os.path.join(mvt_dir, "metadata.json"))
    assert build_all(cat) == {}


def _one_tile(mvt_dir, z):
    import os

    zd = os.path.join(mvt_dir, str(z))
    x = os.listdir(zd)[0]
    y = os.listdir(os.path.join(zd, x))[0]
    return x, y


def test_model_build_boundaries(spark, tmp_path):
    """OBJ builds a mesh table; a nexus container input stays an honest
    NotImplementedError boundary (decode_failed, retried, never marked
    complete)."""
    import os

    from dronedb_spark.catalog.build import ARTIFACT_FILES, _artifact_dir

    (tmp_path / "m.obj").write_bytes(b"v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    (tmp_path / "old.nxz").write_bytes(b"\x20\x00nxs-opaque")
    cat = DatasetCatalog.init(spark, str(tmp_path))
    cat.add()
    assert build_all(cat) == {"nxs": 1}  # only the OBJ builds
    h = {r["path"]: r["hash"] for r in cat.entries().collect()}
    assert os.path.exists(os.path.join(
        _artifact_dir(cat.root, h["m.obj"], "nxs"), ARTIFACT_FILES["nxs"]))
    # the nexus input stays pending (incomplete), never crashes the build
    assert [p for p, _h, k in pending_builds(cat)] == ["old.nxz"]
