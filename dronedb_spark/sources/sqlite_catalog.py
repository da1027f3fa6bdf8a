"""Reference-catalog SQLite reader (SURVEY S7 — database.cpp:40-88).

The reference stores its catalog in a SpatiaLite database:
``entries(path, hash, type, properties, mtime, size, depth, point_geom,
polygon_geom)`` + ``entries_meta(id, path, key, data, mtime)`` +
``passwords(salt, hash)``.  This module reads that database with stdlib
``sqlite3`` — including the gaia geometry blobs (public SpatiaLite BLOB
layout: 0x00, endian byte, SRID, MBR doubles, 0x7C, geometry class,
coordinates) — into THIS engine's entries schema, so an existing
reference deployment migrates by pointing the engine at its ``.ddb``
directory.  Round 2 marked S7 "n/a by design"; this closes it for real.

Spark shape: one catalog database is small (metadata only), so the read
is driver-side sqlite3 → ``spark.createDataFrame``; a directory of MANY
catalogs distributes via the same one-file-per-task kernel as the GPKG
bridge.
"""

from __future__ import annotations

import os
import sqlite3
import struct
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check

_GAIA_POINTZ = 1001
_GAIA_POLYGONZ = 1003


def parse_gaia_blob(blob: bytes) -> tuple[int, list[tuple[float, float, float]]]:
    """SpatiaLite gaia BLOB → (geometry_class, [(x, y, z)...])."""
    if not blob or blob[0] != 0x00:
        raise ValueError("not a gaia blob")
    bo = "<" if blob[1] == 0x01 else ">"
    if blob[38] != 0x7C:
        raise ValueError("gaia MBR_END marker missing")
    (cls,) = struct.unpack_from(bo + "I", blob, 39)
    pos = 43
    if cls == _GAIA_POINTZ:
        x, y, z = struct.unpack_from(bo + "3d", blob, pos)
        return cls, [(x, y, z)]
    if cls == _GAIA_POLYGONZ:
        (nrings,) = struct.unpack_from(bo + "I", blob, pos)
        pos += 4
        pts: list[tuple[float, float, float]] = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(bo + "I", blob, pos)
            pos += 4
            for i in range(n):
                pts.append(struct.unpack_from(bo + "3d", blob, pos + 24 * i))
            pos += 24 * n
        return cls, pts
    raise NotImplementedError(f"gaia geometry class {cls}")


def encode_gaia_pointz(x: float, y: float, z: float, srid: int = 4326) -> bytes:
    return (
        b"\x00\x01"
        + struct.pack("<i", srid)
        + struct.pack("<4d", x, y, x, y)
        + b"\x7c"
        + struct.pack("<I", _GAIA_POINTZ)
        + struct.pack("<3d", x, y, z)
        + b"\xfe"
    )


def encode_gaia_polygonz(ring: list[tuple[float, float, float]], srid: int = 4326) -> bytes:
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    body = struct.pack("<II", 1, len(ring)) + b"".join(
        struct.pack("<3d", *p) for p in ring
    )
    return (
        b"\x00\x01"
        + struct.pack("<i", srid)
        + struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        + b"\x7c"
        + struct.pack("<I", _GAIA_POLYGONZ)
        + body
        + b"\xfe"
    )


def _read_catalog_file(path: str) -> tuple[list[dict], list[dict]]:
    """(entry rows, meta rows) from one reference catalog database."""
    con = sqlite3.connect(path)
    try:
        entries = []
        for p, h, t, props, mtime, size, depth, pt, poly in con.execute(
            """SELECT path, hash, type, properties, mtime, size, depth,
                      point_geom, polygon_geom FROM entries ORDER BY path"""
        ):
            row = {
                "path": p,
                "hash": h or "",
                "type": int(t),
                "properties": props if props else "null",
                "mtime": int(mtime or 0),
                "size": int(size or 0),
                "depth": int(depth or 0),
                "point_lon": None, "point_lat": None, "point_alt": None,
                "bbox_minx": None, "bbox_miny": None,
                "bbox_maxx": None, "bbox_maxy": None,
            }
            if pt is not None:
                try:
                    _cls, pts = parse_gaia_blob(bytes(pt))
                    row["point_lon"], row["point_lat"], row["point_alt"] = pts[0]
                except (ValueError, NotImplementedError, struct.error):
                    pass
            if poly is not None:
                try:
                    _cls, pts = parse_gaia_blob(bytes(poly))
                    row["bbox_minx"] = min(q[0] for q in pts)
                    row["bbox_miny"] = min(q[1] for q in pts)
                    row["bbox_maxx"] = max(q[0] for q in pts)
                    row["bbox_maxy"] = max(q[1] for q in pts)
                except (ValueError, NotImplementedError, struct.error):
                    pass
            elif row["point_lon"] is not None:
                row["bbox_minx"] = row["bbox_maxx"] = row["point_lon"]
                row["bbox_miny"] = row["bbox_maxy"] = row["point_lat"]
            entries.append(row)
        meta = [
            {"id": i, "path": p, "key": k, "data": d, "mtime": int(m)}
            for i, p, k, d, m in con.execute(
                "SELECT id, path, key, data, mtime FROM entries_meta ORDER BY path, key"
            )
        ]
        return entries, meta
    finally:
        con.close()


def read_sqlite_catalog(spark: SparkSession, db_path: str) -> tuple[DataFrame, DataFrame]:
    """One reference .ddb database → (entries DF, meta DF) in this
    engine's schemas — the migration entry point."""
    entries, meta = _read_catalog_file(db_path)
    e_schema = (
        "path string, hash string, type int, properties string, mtime long, "
        "size long, depth int, point_lon double, point_lat double, "
        "point_alt double, bbox_minx double, bbox_miny double, "
        "bbox_maxx double, bbox_maxy double"
    )
    m_schema = "id string, path string, key string, data string, mtime long"
    e_rows = [tuple(r[k] for k in [f.split()[0] for f in e_schema.split(", ")]) for r in entries]
    m_rows = [tuple(r[k] for k in ["id", "path", "key", "data", "mtime"]) for r in meta]
    return (
        spark.createDataFrame(e_rows, schema=e_schema),
        spark.createDataFrame(m_rows, schema=m_schema),
    )


# ------------------------------------------------------------------ check

_SC_N = 64


def _catalog_fixture_path() -> str:
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "sqlite_cat_v1")
    )
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "dbase.sqlite")
    fd, tmp = tempfile.mkstemp(suffix=".sqlite")
    os.close(fd)
    con = sqlite3.connect(tmp)
    con.execute(
        """CREATE TABLE entries (
             path TEXT PRIMARY KEY, hash TEXT, type INTEGER, properties TEXT,
             mtime INTEGER, size INTEGER, depth INTEGER,
             point_geom BLOB, polygon_geom BLOB)"""
    )
    con.execute(
        """CREATE TABLE entries_meta (
             id TEXT PRIMARY KEY, path TEXT NOT NULL, key TEXT NOT NULL,
             data TEXT NOT NULL, mtime INTEGER NOT NULL)"""
    )
    for k in range(_SC_N):
        lon = -120.0 + ((k * 733) % 4000) / 100.0
        lat = 30.0 + ((k * 389) % 1500) / 100.0
        pt = encode_gaia_pointz(lon, lat, 100.0 + k) if k % 3 == 0 else None
        poly = (
            encode_gaia_polygonz(
                [
                    (lon, lat, 0.0), (lon + 0.01, lat, 0.0),
                    (lon + 0.01, lat + 0.02, 0.0), (lon, lat + 0.02, 0.0),
                    (lon, lat, 0.0),
                ]
            )
            if k % 3 == 0
            else None
        )
        con.execute(
            "INSERT INTO entries VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (
                f"img_{k:03d}.jpg",
                f"h{k:08x}",
                3 if k % 3 == 0 else 2,
                f'{{"width": {4000 + k}}}',
                1700000000 + k,
                1000 + 17 * k,
                0,
                pt,
                poly,
            ),
        )
        if k % 4 == 0:
            con.execute(
                "INSERT INTO entries_meta VALUES (?, ?, ?, ?, ?)",
                (f"m{k}", f"img_{k:03d}.jpg", "annotations", f'{{"k": {k}}}', 1700000000),
            )
    con.commit()
    con.close()
    payload = open(tmp, "rb").read()
    os.unlink(tmp)
    if not os.path.exists(path) or open(path, "rb").read() != payload:
        with open(path, "wb") as f:
            f.write(payload)
    os.utime(path, (1700000000, 1700000000))
    return path


@check(
    "sqlite_catalog_entries",
    oracle=f"""
        WITH c AS (
            SELECT k, -120.0 + (k * 733) % 4000 / 100.0 AS lon,
                   30.0 + (k * 389) % 1500 / 100.0 AS lat
            FROM (SELECT unnest(range(0, {_SC_N})) AS k))
        SELECT 'img_' || CASE WHEN k < 10 THEN '00' WHEN k < 100 THEN '0' ELSE '' END || k
                 || '.jpg' AS path,
               CAST(CASE WHEN k % 3 = 0 THEN 3 ELSE 2 END AS INT) AS type,
               CAST(1000 + 17 * k AS BIGINT) AS size,
               CAST(4000 + k AS INT) AS width,
               CASE WHEN k % 3 = 0 THEN lon ELSE -999.0 END AS point_lon,
               CASE WHEN k % 3 = 0 THEN lat ELSE -999.0 END AS point_lat,
               CASE WHEN k % 3 = 0 THEN 100.0 + k ELSE -999.0 END AS point_alt,
               CASE WHEN k % 3 = 0 THEN lon + 0.01 ELSE -999.0 END AS bbox_maxx,
               CASE WHEN k % 3 = 0 THEN lat + 0.02 ELSE -999.0 END AS bbox_maxy,
               CAST(CASE WHEN k % 4 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_meta
        FROM c ORDER BY path""",
)
def q_sqlite_catalog_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL reference-format SQLite catalog (SpatiaLite gaia POINTZ /
    POLYGONZ blobs, database.cpp:40-56 schema) → entries + meta
    DataFrames, joined and value-checked against the closed-form fixture
    spec — the S7 migration path, verified end-to-end."""
    entries, meta = read_sqlite_catalog(spark, _catalog_fixture_path())
    meta_counts = meta.groupBy("path").agg(F.count(F.lit(1)).alias("n_meta"))
    return (
        entries.join(F.broadcast(meta_counts), "path", "left")
        .select(
            "path",
            F.col("type").cast("int").alias("type"),
            F.col("size").cast("bigint").alias("size"),
            F.get_json_object("properties", "$.width").cast("int").alias("width"),
            F.coalesce("point_lon", F.lit(-999.0)).alias("point_lon"),
            F.coalesce("point_lat", F.lit(-999.0)).alias("point_lat"),
            F.coalesce("point_alt", F.lit(-999.0)).alias("point_alt"),
            F.coalesce("bbox_maxx", F.lit(-999.0)).alias("bbox_maxx"),
            F.coalesce("bbox_maxy", F.lit(-999.0)).alias("bbox_maxy"),
            F.coalesce("n_meta", F.lit(0)).cast("bigint").alias("n_meta"),
        )
        .orderBy("path")
    )
