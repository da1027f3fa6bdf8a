"""Driver check for the type fingerprint (S4, entry.cpp:982-1118) run
through the REAL distributed ingest: a fixture tree covering every
sniffing path — extension map, magic-mismatch demotion, PLY content
identification (splat / mesh / cloud), container extensions — lands in
the entries table with the EntryType ids the oracle states literally."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check

# (rel path, content bytes, expected EntryType id)
_FP_FILES: list[tuple[str, bytes, int]] = [
    ("img.jpg", b"\xff\xd8\xff\xe0JFIF-ish", 6),        # Image: real magic
    ("fake.jpg", b"NOTJPEG", 2),                        # Generic: magic mismatch
    ("r.tif", b"II*\x00\x08\x00\x00\x00", 4),           # GeoRaster: TIFF magic
    ("bad.tif", b"nottiff", 2),                         # Generic: demoted
    ("c.las", b"LASF" + b"\x00" * 16, 5),               # PointCloud
    ("m.md", b"# doc\n", 8),                            # Markdown
    ("v.geojson", b'{"type":"FeatureCollection"}', 14),  # Vector
    ("t.topojson", b'{"type":"Topology"}', 14),         # Vector (r4 reader)
    ("k.kml", b"<kml/>", 14),                           # Vector
    ("d.dxf", b"0\nSECTION\n", 14),                     # Vector
    ("g.gpkg", b"SQLite format 3\x00", 14),             # Vector
    ("z.shz", b"\x1f\x8b\x08\x00", 14),                 # Vector (gzip shp)
    ("splat.ply", b"ply\nformat ascii 1.0\nproperty float f_dc_0\n", 15),  # GaussianSplat
    ("mesh.ply", b"ply\nformat ascii 1.0\nelement face 3\n", 11),          # Model
    ("cloud.ply", b"ply\nformat ascii 1.0\nelement vertex 5\n", 5),        # PointCloud
    ("vid.mp4", b"\x00\x00\x00\x18ftypisom", 9),        # Video
    ("o.obj", b"v 0 0 0\n", 11),                        # Model
    ("s.spz", b"\x1f\x8b\x08\x00", 15),                 # GaussianSplat
    ("a.3tz", b"PK\x03\x04", 16),                       # Tiles3D
    ("pc.copc.laz", b"LASF" + b"\x00" * 16, 5),         # PointCloud (double ext)
    ("x.unknownext", b"??", 2),                         # Generic fallback
]


def _fp_fixture_root() -> str:
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "fp_v1")
    )
    os.makedirs(root, exist_ok=True)
    for rel, data, _t in _FP_FILES:
        p = os.path.join(root, rel)
        if not os.path.exists(p) or open(p, "rb").read() != data:
            with open(p, "wb") as f:
                f.write(data)
        os.utime(p, (1700000000, 1700000000))
    return root


def _oracle() -> str:
    values = ",\n            ".join(f"('{p}', {t})" for p, _d, t in sorted(_FP_FILES))
    return f"""
        SELECT path, CAST(type AS INT) AS type
        FROM (VALUES
            {values}) AS t(path, type)
        ORDER BY path"""


@check("fingerprint_types", oracle=_oracle())
def q_fingerprint_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dronedb_spark.sources.fs import ingest

    root = _fp_fixture_root()
    return (
        ingest(spark, root)
        .filter(F.col("type") != 1)  # fixture is flat; directories out of scope
        .select("path", F.col("type").cast("int").alias("type"))
        .orderBy("path")
    )
