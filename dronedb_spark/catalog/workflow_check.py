"""Driver check for the catalog WRITE workflow (W1-W6: init → add →
move → sync → remove), end to end on a real scratch dataset directory.

The flow mirrors a reference user session (dbops.cpp): index a tree,
mutate the filesystem (modify / delete / create / rename a folder),
record the rename with ``move`` (moveEntry semantics: the index update
AFTER the user moved files, dbops.cpp:1361-1473), reconcile with
``sync`` (syncIndex, dbops.cpp:989-1032), then LIKE-``remove`` a
pattern (removeFromIndex, dbops.cpp:717-914).  The final entries table
is fully determined by the op sequence — any slip in the upsert
algebra, the mtime short-circuit (the renamed file keeps its mtime and
must NOT be re-ingested), the subtree path/depth rewrite, or the LIKE
semantics changes the values — and the oracle states them as literals
(sha256 of the fixture bytes, fixed mtimes).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check

_FILES = {
    "a.txt": (b"alpha\n", 1700000000),          # deleted before sync
    "b.txt": (b"bravo\n", 1700000010),          # rewritten before sync
    "notes.md": (b"# notes\n", 1700000020),
    "sub/c.txt": (b"charlie\n", 1700000030),    # folder renamed sub -> moved
    "e.bin": (b"\x00\x01\x02\x03", 1700000050),  # removed via pattern
}
_B2 = (b"bravo two\n", 1700000100)
_D = (b"delta\n", 1700000110)
_DIR_MTIME = 1700000040

_TYPE_GENERIC, _TYPE_MARKDOWN, _TYPE_DIR = 2, 8, 1


def _sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def _expected() -> list[tuple]:
    return [
        ("b.txt", _TYPE_GENERIC, 0, len(_B2[0]), _sha(_B2[0]), _B2[1]),
        ("d.txt", _TYPE_GENERIC, 0, len(_D[0]), _sha(_D[0]), _D[1]),
        ("moved", _TYPE_DIR, 0, 0, "", _DIR_MTIME),
        ("moved/c.txt", _TYPE_GENERIC, 1, 8, _sha(_FILES["sub/c.txt"][0]), 1700000030),
        ("notes.md", _TYPE_MARKDOWN, 0, 8, _sha(_FILES["notes.md"][0]), 1700000020),
    ]


def _oracle() -> str:
    values = ",\n            ".join(
        f"('{p}', {t}, {d}, {s}, '{h}', {m})" for p, t, d, s, h, m in _expected()
    )
    return f"""
        SELECT path, CAST(type AS INT) AS type, CAST(depth AS INT) AS depth,
               CAST(size AS BIGINT) AS size, hash, CAST(mtime AS BIGINT) AS mtime
        FROM (VALUES
            {values}) AS t(path, type, depth, size, hash, mtime)
        ORDER BY path"""


@check("catalog_workflow_lifecycle", oracle=_oracle())
def q_catalog_workflow_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dronedb_spark.catalog.store import DatasetCatalog

    root = tempfile.mkdtemp(prefix="wf_")
    try:
        for rel, (data, mtime) in _FILES.items():
            p = os.path.join(root, rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(data)
            os.utime(p, (mtime, mtime))
        os.utime(os.path.join(root, "sub"), (_DIR_MTIME, _DIR_MTIME))

        cat = DatasetCatalog.init(spark, root)
        cat.add()

        # user session: edit, delete, create, rename a folder on disk
        with open(os.path.join(root, "b.txt"), "wb") as f:
            f.write(_B2[0])
        os.utime(os.path.join(root, "b.txt"), (_B2[1], _B2[1]))
        os.remove(os.path.join(root, "a.txt"))
        with open(os.path.join(root, "d.txt"), "wb") as f:
            f.write(_D[0])
        os.utime(os.path.join(root, "d.txt"), (_D[1], _D[1]))
        os.rename(os.path.join(root, "sub"), os.path.join(root, "moved"))
        os.utime(os.path.join(root, "moved", "c.txt"), (1700000030, 1700000030))
        os.utime(os.path.join(root, "moved"), (_DIR_MTIME, _DIR_MTIME))

        cat.move("sub", "moved")   # index follows the fs rename — no re-parse
        cat.sync()                 # reconcile: drop a.txt, upsert b/d
        cat.remove("*.bin")        # LIKE removal (sanitize: * -> %)

        rows = [
            (r["path"], int(r["type"]), int(r["depth"]), int(r["size"]),
             r["hash"], int(r["mtime"]))
            for r in cat.entries().collect()
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows),
        "path string, type int, depth int, size bigint, hash string, mtime bigint",
    ).orderBy("path")


# ---------------------------------------------------------- W12 setexif

_XLAT, _XLON, _XALT = 12.5, -7.25, 340.0


@check(
    "setexif_gps_roundtrip",
    oracle=f"""
        SELECT path, CAST(type AS INT) AS type, lat, lon, alt FROM (VALUES
            ('img_exif.jpg', 3, {_XLAT!r}, {_XLON!r}, {_XALT!r}),
            ('img_gps.jpg', 3, {_XLAT!r}, {_XLON!r}, {_XALT!r}),
            ('img_plain.jpg', 3, {_XLAT!r}, {_XLON!r}, {_XALT!r}),
            ('note.txt', 2, -999.0, -999.0, -999.0)
        ) AS t(path, type, lat, lon, alt)
        ORDER BY path"""
)
def q_setexif_gps_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12 (exifeditor.cpp SetGPS / apps setexif): distributed EXIF GPS
    rewrite over the indexed images — plain-JPEG, EXIF-without-GPS, and
    GPS-overwrite paths — then re-index.  Every image must come back
    GeoImage with the EXACT written point (12.5 / −7.25 are exact in the
    DMS rational encoding, so parse(encode(x)) == x); the non-image is
    untouched.  The REAL byte path: marker walk, APP1 rebuild, atomic
    rename, mtime-invalidated re-ingest."""
    from dronedb_spark.catalog.store import DatasetCatalog
    from dronedb_spark.sources.exif import build_jpeg_with_exif, build_plain_jpeg

    root = tempfile.mkdtemp(prefix="sx_")
    try:
        files = {
            "img_plain.jpg": build_plain_jpeg(),
            "img_exif.jpg": build_jpeg_with_exif(datetime_original="2024:01:05 10:00:00"),
            "img_gps.jpg": build_jpeg_with_exif(
                lat_dms=(45, 0, (0, 1)), lon_dms=(7, 30, (0, 1)), alt=(500, 1),
                datetime_original="2024:01:05 11:00:00",
            ),
            "note.txt": b"notes\n",
        }
        for rel, data in files.items():
            with open(os.path.join(root, rel), "wb") as f:
                f.write(data)
            os.utime(os.path.join(root, rel), (1700000000, 1700000000))
        cat = DatasetCatalog.init(spark, root)
        cat.add()
        n = cat.setexif("*.jpg", lat=_XLAT, lon=_XLON, alt=_XALT)
        assert n == 3, f"expected 3 rewritten images, got {n}"
        rows = [
            (r["path"], int(r["type"]),
             r["point_lat"] if r["point_lat"] is not None else -999.0,
             r["point_lon"] if r["point_lon"] is not None else -999.0,
             r["point_alt"] if r["point_alt"] is not None else -999.0)
            for r in cat.entries().collect()
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows),
        "path string, type int, lat double, lon double, alt double",
    ).orderBy("path")


# ---------------------------------------------------- W7/W8 meta + chattr


@check(
    "meta_chattr_roundtrip",
    oracle="""
        SELECT scope, key, vals FROM (VALUES
            ('', 'name', '"site"'),
            ('', 'public', '1'),
            ('', 'tags', '"a"|"b"'),
            ('b.txt', 'license', '')
        ) AS t(scope, key, vals)
        ORDER BY scope, key"""
)
def q_meta_chattr_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7/W8 (metamanager.cpp, chattr): singular set (delete-then-insert,
    overwrite pinned by writing name twice), plural add (list append),
    dataset-level attrs via chattr (path=''), per-path meta, and unset.
    Values come back through meta_get — the snapshot-table read path."""
    from dronedb_spark.catalog.store import DatasetCatalog

    root = tempfile.mkdtemp(prefix="mc_")
    try:
        cat = DatasetCatalog.init(spark, root)
        cat.chattr("public", "1")
        cat.meta_set("name", '"draft"')
        cat.meta_set("name", '"site"')          # overwrite, not append
        cat.meta_add("tags", '"a"')
        cat.meta_add("tags", '"b"')
        cat.meta_set("license", '"CC"', path="b.txt")
        n_unset = cat.meta_unset("license", path="b.txt")
        assert n_unset == 1
        rows = [
            ("", "name", "|".join(sorted(cat.meta_get("name")))),
            ("", "public", "|".join(sorted(cat.meta_get("public")))),
            ("", "tags", "|".join(sorted(cat.meta_get("tags")))),
            ("b.txt", "license", "|".join(sorted(cat.meta_get("license", path="b.txt")))),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "scope string, key string, vals string").orderBy(
        "scope", "key"
    )


# ------------------------------------------------- W9 build derivatives

_BD_N_PTS = 300
_BD_DEM_H, _BD_DEM_W = 48, 36
# tower.obj: quad base + apex, integer coords → exact corner sums.
# 4 side triangles + fan-triangulated base quad = 6 faces.
_BD_OBJ_VERTS = [(0, 0, 0), (4, 0, 0), (4, 6, 0), (0, 6, 0), (2, 3, 5)]
_BD_OBJ_FACES = [(1, 2, 5), (2, 3, 5), (3, 4, 5), (4, 1, 5), (1, 2, 3, 4)]
_BD_OBJ_TRIS = sum(len(f) - 2 for f in _BD_OBJ_FACES)
_BD_OBJ_SUM = sum(
    sum(_BD_OBJ_VERTS[f[0] - 1]) + sum(_BD_OBJ_VERTS[f[k] - 1])
    + sum(_BD_OBJ_VERTS[f[k + 1] - 1])
    for f in _BD_OBJ_FACES
    for k in range(1, len(f) - 1)
)
# parcels.geojson extent: union bbox (0,0)-(2,2) → area 4 deg² →
# MAXZOOM = clamp(floor(0.5·log2(10000·64800/4)), 5, 18) = 13
# (mvt.cpp:12-54); 2 features appear once per level 0..13 → 28 decodes.
_BD_MVT_MAXZOOM = 13
_BD_MVT_DECODED = 2 * (_BD_MVT_MAXZOOM + 1)


@check(
    "build_derivatives_real",
    oracle=f"""
        SELECT kind, metric_a, metric_b FROM (VALUES
            ('3dtiles', 9, 225),
            ('cog', {_BD_DEM_W}, CAST((SELECT SUM(CAST((r.r * {_BD_DEM_W} + c.c) % 89 AS BIGINT))
                  FROM (SELECT unnest(range(0, {_BD_DEM_H})) AS r) r,
                       (SELECT unnest(range(0, {_BD_DEM_W})) AS c) c) AS BIGINT)),
            ('copc', {_BD_N_PTS}, CAST((SELECT SUM(CAST(i.i % 5 AS BIGINT))
                  FROM (SELECT unnest(range(0, {_BD_N_PTS})) AS i) i) AS BIGINT)),
            ('gsplat', 7, 7),
            ('mvt', {_BD_MVT_MAXZOOM}, {_BD_MVT_DECODED}),
            ('nxs', {_BD_OBJ_TRIS}, {_BD_OBJ_SUM}),
            ('thumb', 20, 28),
            ('vec', 2, 4)
        ) AS t(kind, metric_a, metric_b)
        ORDER BY kind""",
)
def q_build_derivatives_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 build pipeline end to end with REAL artifacts (build.cpp
    per-type dispatch): a scratch dataset of decodable fixtures →
    distributed build → each artifact re-opened with its own reader and
    reduced to scalars the oracle states closed-form — COG level-0 width
    + exact pixel sum, COPC point count + classification sum, thumbnail
    dimensions, vec feature count + vertex sum, splat row count."""
    import json

    import numpy as np
    import pyarrow.parquet as pq

    from dronedb_spark.catalog.build import (
        ARTIFACT_FILES,
        _artifact_dir,
        build_all,
    )
    from dronedb_spark.catalog.store import DatasetCatalog
    from dronedb_spark.sources.cog import cog_info, decode_cog_level
    from dronedb_spark.sources.gsplat import encode_splat_binary
    from dronedb_spark.sources.las import encode_las, las_info
    from dronedb_spark.sources.laz14 import decode_laz14
    from dronedb_spark.sources.png import encode_png, png_info
    from dronedb_spark.sources.tiff import encode_tiff
    from dronedb_spark.sources.tiles3d import (
        build_tileset,
        decode_pnts,
        encode_3tz,
        encode_pnts,
        tiles3d_info,
    )

    root = tempfile.mkdtemp(prefix="bd_")
    try:
        idx = np.arange(_BD_N_PTS)
        files = {
            "pc.las": encode_las(
                idx * 0.25, idx * 0.5, (idx % 11).astype(float),
                classification=(idx % 5),
            ),
            "dem.tif": encode_tiff(
                ((np.arange(_BD_DEM_H * _BD_DEM_W) % 89).astype(float)
                 .reshape(_BD_DEM_H, _BD_DEM_W)),
                pixel_scale=(1.0, 1.0), tiepoint=(0.0, 0.0),
            ),
            "img.png": encode_png(
                ((np.arange(28 * 20 * 3) * 3) % 255).astype(np.uint8).reshape(28, 20, 3)
            ),
            "parcels.geojson": json.dumps({
                "type": "FeatureCollection",
                "features": [
                    {"type": "Feature", "properties": {},
                     "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}},
                    {"type": "Feature", "properties": {},
                     "geometry": {"type": "LineString",
                                  "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]}},
                ],
            }).encode(),
            "cloud.splat": encode_splat_binary([
                {"pos": (float(i), 0.0, 1.0), "scale_linear": (1.0, 0.5, 2.0),
                 "rgba": (i * 30 % 256, 0, 0, 128), "quat_wxyz": (0.0, 0.0, 0.0, -1.0)}
                for i in range(7)
            ]),
            "scene.3tz": encode_3tz(
                build_tileset(region=(0.1, 0.2, 0.3, 0.4, 10.0, 90.0),
                              geometric_error=450.0),
                {"points.pnts": encode_pnts(
                    np.arange(27, dtype=np.float32).reshape(9, 3),
                    rgb=np.full((9, 3), 200, dtype=np.uint8),
                )},
            ),
            "tower.obj": (
                "\n".join(
                    [f"v {x} {y} {z}" for x, y, z in _BD_OBJ_VERTS]
                    + ["f " + " ".join(str(i) for i in f) for f in _BD_OBJ_FACES]
                )
                + "\n"
            ).encode(),
        }
        for name, data in files.items():
            with open(os.path.join(root, name), "wb") as f:
                f.write(data)
            os.utime(os.path.join(root, name), (1700000000, 1700000000))
        cat = DatasetCatalog.init(spark, root)
        cat.add()
        counts = build_all(cat)
        assert counts == {"copc": 1, "cog": 1, "thumb": 1, "vec": 1,
                          "gsplat": 1, "3dtiles": 1, "nxs": 1}, counts
        # idempotency across the co-produced artifacts: with vec/ AND
        # mvt/ both present nothing re-runs (build.cpp:148 completeness)
        assert build_all(cat) == {}
        hashes = {r["path"]: r["hash"] for r in cat.entries().collect()}

        def artifact(path, kind):
            return open(
                os.path.join(_artifact_dir(root, hashes[path], kind), ARTIFACT_FILES[kind]),
                "rb",
            ).read()

        copc = artifact("pc.las", "copc")
        dcp = decode_laz14(copc)
        rows = [
            ("copc", int(las_info(copc)["n_points"]), int(dcp["classification"].sum())),
        ]
        cogb = artifact("dem.tif", "cog")
        rows.append(
            ("cog", int(cog_info(cogb)["levels"][0]["width"]),
             int(decode_cog_level(cogb, 0).sum()))
        )
        w, h, _c = png_info(artifact("img.png", "thumb"))
        rows.append(("thumb", int(w), int(h)))
        vec = pq.read_table(
            os.path.join(_artifact_dir(root, hashes["parcels.geojson"], "vec"),
                         ARTIFACT_FILES["vec"])
        )
        rows.append(("vec", vec.num_rows, int(sum(vec.column("n_vertices").to_pylist()))))
        # mvt/ sibling: re-open every tile with the independent pbf
        # decoder; maxzoom from metadata.json must match the budget
        # heuristic and each level must carry both features
        from dronedb_spark.functions.mvt import decode_tile_pbf

        mvt_dir = _artifact_dir(root, hashes["parcels.geojson"], "mvt")
        meta = json.loads(open(os.path.join(mvt_dir, "metadata.json")).read())
        decoded = 0
        for dirpath, _dirs, fnames in os.walk(mvt_dir):
            for fn in fnames:
                if fn.endswith(".pbf"):
                    feats = decode_tile_pbf(
                        open(os.path.join(dirpath, fn), "rb").read()
                    )
                    assert all(f["extent"] == 4096 for f in feats)
                    decoded += len(feats)
        rows.append(("mvt", int(meta["maxzoom"]), decoded))
        # nxs-role mesh table: triangle rows re-summed corner-exact
        mesh = pq.read_table(
            os.path.join(_artifact_dir(root, hashes["tower.obj"], "nxs"),
                         ARTIFACT_FILES["nxs"])
        )
        corner_sum = sum(
            int(sum(mesh.column(c).to_pylist()))
            for c in ("ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz")
        )
        rows.append(("nxs", mesh.num_rows, corner_sum))
        gs = pq.read_table(
            os.path.join(_artifact_dir(root, hashes["cloud.splat"], "gsplat"),
                         ARTIFACT_FILES["gsplat"])
        )
        rows.append(("gsplat", gs.num_rows, gs.num_rows))
        # 3dtiles: the extracted tree must round-trip the tileset fields
        # tiles3d.cpp reads (asset version, geometric error, region) and
        # the real pnts payload
        t3_dir = _artifact_dir(root, hashes["scene.3tz"], "3dtiles")
        t3 = tiles3d_info(open(os.path.join(t3_dir, "tileset.json"), "rb").read())
        assert t3["asset_version"] == "1.0"
        assert t3["region_deg"] is not None
        pnts = decode_pnts(open(os.path.join(t3_dir, "points.pnts"), "rb").read())
        rows.append(("3dtiles", int(pnts["n_points"]), int(t3["geometric_error"])))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows), "kind string, metric_a bigint, metric_b bigint"
    ).orderBy("kind")


# ------------------------------------------------------------ W5 rescan

_RS_ORIG = {
    "doc.md": (b"# one\n", 1700000000),
    "data.txt": (b"first\n", 1700000010),
    "sub/x.txt": (b"xray\n", 1700000020),
}
# content rewritten IN PLACE with the original mtime restored — sync's
# mtime short-circuit must skip these; only rescan re-parses them
_RS_NEW = {
    "doc.md": b"# one rewritten\n",
    "data.txt": b"first rewritten\n",
    "sub/x.txt": b"xray rewritten\n",
}


def _rescan_oracle() -> str:
    rows = [
        # phase 'typed': rescan(types=[Markdown]) — only doc.md fresh
        ("typed", "doc.md", len(_RS_NEW["doc.md"]), _sha(_RS_NEW["doc.md"])),
        ("typed", "data.txt", len(_RS_ORIG["data.txt"][0]), _sha(_RS_ORIG["data.txt"][0])),
        ("typed", "sub", 0, ""),
        ("typed", "sub/x.txt", len(_RS_ORIG["sub/x.txt"][0]), _sha(_RS_ORIG["sub/x.txt"][0])),
        # phase 'all': rescan() — every non-Directory row fresh
        ("all", "doc.md", len(_RS_NEW["doc.md"]), _sha(_RS_NEW["doc.md"])),
        ("all", "data.txt", len(_RS_NEW["data.txt"]), _sha(_RS_NEW["data.txt"])),
        ("all", "sub", 0, ""),
        ("all", "sub/x.txt", len(_RS_NEW["sub/x.txt"]), _sha(_RS_NEW["sub/x.txt"])),
    ]
    values = ",\n            ".join(
        f"('{ph}', '{p}', {s}, '{h}')" for ph, p, s, h in rows
    )
    return f"""
        SELECT phase, path, CAST(size AS BIGINT) AS size, hash
        FROM (VALUES
            {values}) AS t(phase, path, size, hash)
        ORDER BY phase, path"""


@check("catalog_rescan_types", oracle=_rescan_oracle())
def q_catalog_rescan_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 (rescanIndex, dbops.cpp:1034-1140): forced re-parse of selected
    types.  The fixture rewrites every file's CONTENT while restoring the
    original mtime, so sync's mtime short-circuit sees NotModified and
    would skip them all — the only way the new hashes can appear is the
    rescan re-parse.  Phase 'typed' rescans Markdown only (data.txt and
    sub/x.txt must keep their STALE hashes); phase 'all' rescans every
    type; the Directory row must never re-ingest in either phase."""
    from dronedb_spark.catalog.store import DatasetCatalog

    root = tempfile.mkdtemp(prefix="rs_")
    try:
        for rel, (data, mtime) in _RS_ORIG.items():
            p = os.path.join(root, rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(data)
            os.utime(p, (mtime, mtime))
        os.utime(os.path.join(root, "sub"), (_DIR_MTIME, _DIR_MTIME))
        cat = DatasetCatalog.init(spark, root)
        cat.add()

        for rel, data in _RS_NEW.items():
            p = os.path.join(root, rel)
            with open(p, "wb") as f:
                f.write(data)
            os.utime(p, (_RS_ORIG[rel][1], _RS_ORIG[rel][1]))
        os.utime(os.path.join(root, "sub"), (_DIR_MTIME, _DIR_MTIME))

        rows = []
        cat.rescan(types=[_TYPE_MARKDOWN])
        rows += [
            ("typed", r["path"], int(r["size"]), r["hash"])
            for r in cat.entries().collect()
        ]
        cat.rescan()
        rows += [
            ("all", r["path"], int(r["size"]), r["hash"])
            for r in cat.entries().collect()
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "phase string, path string, size bigint, hash string"
    ).orderBy("phase", "path")
