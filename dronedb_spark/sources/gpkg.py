"""GeoPackage (.gpkg) vector reader — public OGC GeoPackage spec over
stdlib ``sqlite3`` (a GeoPackage IS a SQLite database: ``gpkg_contents``
names the feature tables; each feature row carries a GP-header +
well-known-binary geometry blob).

Closes another S8 format from the reference's OGR list
(entry.cpp:1034-1035): features land in the SAME model as
GeoJSON/shapefile/KML input (``sources/geojson.FEATURE_SCHEMA``).

Spark shape: one ``binaryFile`` row per .gpkg; the decode kernel writes
the bytes to a task-local temp file (SQLite requires a file handle),
walks the feature tables, and emits feature rows — one task per
dataset, the same layout as every other vector bridge.
"""

from __future__ import annotations

import os
import sqlite3
import struct
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.sources.geojson import FEATURE_SCHEMA
from dronedb_spark.suite import check

_WKB_GEOM = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint"}


def parse_gpkg_geom(blob: bytes) -> tuple[str | None, list[tuple[float, float]]]:
    """GeoPackage geometry blob: GP magic, version, flags (envelope
    size + endianness), srs_id, envelope, then standard WKB."""
    if blob[:2] != b"GP":
        raise ValueError("not a GPKG geometry blob")
    flags = blob[3]
    env_ind = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_ind, 0)
    return parse_wkb(blob[8 + env_len :])


def parse_wkb(wkb: bytes) -> tuple[str | None, list[tuple[float, float]]]:
    """XY points of a WKB Point/LineString/Polygon/MultiPoint (2D)."""
    bo = "<" if wkb[0] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", wkb, 1)
    base = gtype % 1000  # strip Z/M offsets
    dims = 2 + (1 if gtype // 1000 in (1, 3) else 0) + (1 if gtype // 1000 in (2, 3) else 0)
    step = 8 * dims
    pos = 5

    def pts(n: int, p: int) -> list[tuple[float, float]]:
        out = []
        for i in range(n):
            x, y = struct.unpack_from(bo + "dd", wkb, p + i * step)
            out.append((x, y))
        return out

    if base == 1:
        return "Point", pts(1, pos)
    if base == 2:
        (n,) = struct.unpack_from(bo + "I", wkb, pos)
        return "LineString", pts(n, pos + 4)
    if base == 3:
        (nrings,) = struct.unpack_from(bo + "I", wkb, pos)
        pos += 4
        allpts: list[tuple[float, float]] = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(bo + "I", wkb, pos)
            allpts.extend(pts(n, pos + 4))
            pos += 4 + n * step
        return "Polygon", allpts
    if base == 4:
        (n,) = struct.unpack_from(bo + "I", wkb, pos)
        pos += 4
        allpts = []
        for _ in range(n):
            # each member is a full WKB point
            _t, p = parse_wkb(wkb[pos : pos + 5 + step])
            allpts.extend(p)
            pos += 5 + step
        return "MultiPoint", allpts
    raise NotImplementedError(f"WKB geometry type {gtype}")


def _decode_gpkg_bytes(stem: str, content: bytes) -> list[dict]:
    rows: list[dict] = []
    fd, tmp = tempfile.mkstemp(suffix=".gpkg")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(content)
        con = sqlite3.connect(tmp)
        try:
            layers = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
            ).fetchall()
            for (layer,) in layers:
                gcol = con.execute(
                    "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
                    (layer,),
                ).fetchone()
                if not gcol:
                    continue
                cols = [r[1] for r in con.execute(f'PRAGMA table_info("{layer}")')]
                n_props = len(cols) - 2  # minus fid + geometry
                cur = con.execute(f'SELECT fid, "{gcol[0]}" FROM "{layer}" ORDER BY fid')
                for fid, blob in cur:
                    try:
                        gtype, pts = parse_gpkg_geom(bytes(blob))
                    except Exception:
                        continue  # skip undecodable geometries
                    xs = [p[0] for p in pts]
                    ys = [p[1] for p in pts]
                    rows.append(
                        {
                            "dataset_id": stem,
                            "layer": layer,
                            "fid": int(fid),
                            "geom_type": gtype,
                            "bbox_minx": min(xs) if xs else None,
                            "bbox_miny": min(ys) if ys else None,
                            "bbox_maxx": max(xs) if xs else None,
                            "bbox_maxy": max(ys) if ys else None,
                            "n_vertices": len(pts),
                            "n_props": n_props,
                        }
                    )
        finally:
            con.close()
    finally:
        os.unlink(tmp)
    return rows


def read_gpkg(spark: SparkSession, root: str) -> DataFrame:
    """Directory of .gpkg files → features table, one task per file."""
    sep = root.rstrip("/") + "/"
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.gpkg")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            F.regexp_replace(
                F.substring_index("path", sep, -1), r"\.gpkg$", ""
            ).alias("stem"),
            "content",
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for stem, content in zip(pdf["stem"], pdf["content"]):
                try:
                    rows.extend(_decode_gpkg_bytes(stem, bytes(content)))
                except Exception:
                    continue  # skip undecodable files — never fail the job
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=FEATURE_SCHEMA)


# ----------------------------------------------------------------- write


def encode_gpkg(layers: dict[str, list[dict]]) -> bytes:
    """Minimal spec-shaped GeoPackage: gpkg_contents +
    gpkg_geometry_columns + one feature table per layer.  Each feature:
    {fid, geom_type, points[(x, y)...], props: dict}."""

    def wkb(geom_type: str, pts: list[tuple[float, float]]) -> bytes:
        coords = b"".join(struct.pack("<dd", x, y) for x, y in pts)
        if geom_type == "Point":
            return struct.pack("<BI", 1, 1) + coords
        if geom_type == "LineString":
            return struct.pack("<BII", 1, 2, len(pts)) + coords
        if geom_type == "Polygon":
            return struct.pack("<BIII", 1, 3, 1, len(pts)) + coords
        raise NotImplementedError(geom_type)

    def gp_blob(geom_type: str, pts: list[tuple[float, float]]) -> bytes:
        # flags 0x01: little-endian, no envelope
        return b"GP" + bytes([0, 0x01]) + struct.pack("<i", 4326) + wkb(geom_type, pts)

    fd, tmp = tempfile.mkstemp(suffix=".gpkg")
    os.close(fd)
    try:
        con = sqlite3.connect(tmp)
        con.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
        con.execute(
            """CREATE TABLE gpkg_contents (
                 table_name TEXT PRIMARY KEY, data_type TEXT, identifier TEXT,
                 srs_id INTEGER)"""
        )
        con.execute(
            """CREATE TABLE gpkg_geometry_columns (
                 table_name TEXT, column_name TEXT, geometry_type_name TEXT,
                 srs_id INTEGER, z TINYINT, m TINYINT)"""
        )
        for layer, feats in layers.items():
            con.execute(
                f'''CREATE TABLE "{layer}" (
                     fid INTEGER PRIMARY KEY, geom BLOB, name TEXT, kind INTEGER)'''
            )
            con.execute(
                "INSERT INTO gpkg_contents VALUES (?, 'features', ?, 4326)",
                (layer, layer),
            )
            con.execute(
                "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'GEOMETRY', 4326, 0, 0)",
                (layer,),
            )
            for ft in feats:
                con.execute(
                    f'INSERT INTO "{layer}" VALUES (?, ?, ?, ?)',
                    (
                        ft["fid"],
                        gp_blob(ft["geom_type"], ft["points"]),
                        ft.get("props", {}).get("name", ""),
                        ft.get("props", {}).get("kind", 0),
                    ),
                )
        con.commit()
        con.close()
        with open(tmp, "rb") as f:
            return f.read()
    finally:
        os.unlink(tmp)


# ------------------------------------------------------------------ check

_GP_N = 150


def _gpkg_fixture_root() -> str:
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "gpkg_cat_v1")
    )
    os.makedirs(root, exist_ok=True)
    feats = []
    for k in range(_GP_N):
        x = -120.0 + ((k * 733) % 4000) / 100.0
        y = 30.0 + ((k * 389) % 1500) / 100.0
        dx = (1 + k % 7) / 100.0
        dy = (1 + k % 5) / 100.0
        if k % 4 == 0:
            g, pts = "Point", [(x, y)]
        elif k % 2 == 0:
            g, pts = "LineString", [(x, y), (x + dx, y + dy)]
        else:
            g, pts = "Polygon", [(x, y), (x + dx, y), (x + dx, y + dy), (x, y + dy), (x, y)]
        feats.append({"fid": k + 1, "geom_type": g, "points": pts,
                      "props": {"name": f"f{k}", "kind": k % 3}})
    payload = encode_gpkg({"parcels": feats})
    p = os.path.join(root, "survey.gpkg")
    if not os.path.exists(p) or open(p, "rb").read() != payload:
        with open(p, "wb") as f:
            f.write(payload)
    os.utime(p, (1700000000, 1700000000))
    return root


@check(
    "gpkg_parse_features",
    oracle=f"""
        WITH c AS (
            SELECT k,
                   -120.0 + (k * 733) % 4000 / 100.0 AS x,
                   30.0 + (k * 389) % 1500 / 100.0 AS y,
                   (1 + k % 7) / 100.0 AS dx,
                   (1 + k % 5) / 100.0 AS dy
            FROM (SELECT unnest(range(0, {_GP_N})) AS k))
        SELECT 'survey' AS dataset_id, 'parcels' AS layer,
               CAST(k + 1 AS BIGINT) AS fid,
               CASE WHEN k % 4 = 0 THEN 'Point'
                    WHEN k % 2 = 0 THEN 'LineString' ELSE 'Polygon' END AS geom_type,
               x AS bbox_minx, y AS bbox_miny,
               CASE WHEN k % 4 = 0 THEN x ELSE x + dx END AS bbox_maxx,
               CASE WHEN k % 4 = 0 THEN y ELSE y + dy END AS bbox_maxy,
               CAST(CASE WHEN k % 4 = 0 THEN 1
                         WHEN k % 2 = 0 THEN 2 ELSE 5 END AS INT) AS n_vertices,
               CAST(2 AS INT) AS n_props
        FROM c ORDER BY fid""",
)
def q_gpkg_parse_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL .gpkg bytes (SQLite pages + GP geometry blobs + WKB) →
    distributed decode → features table, value-checked against the
    closed-form coordinate grid."""
    return read_gpkg(spark, _gpkg_fixture_root()).orderBy("fid")
