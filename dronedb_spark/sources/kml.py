"""KML / KMZ vector reader (SURVEY S8 — OGC KML 2.2, public spec; KMZ is
a zip wrapper, stdlib ``zipfile``).

Reference: the OGR KML driver behind ``openVector`` (vector_query.cpp
format list).  Placemark geometries (Point / LineString / Polygon outer
ring / MultiGeometry) land in the SAME features model as GeoJSON and
shapefile input — ``sources/geojson.FEATURE_SCHEMA`` — so the whole
vector operator family (bbox query, paging, describe, MVT) runs on KML
datasets unchanged.

Spark shape: one text/binaryFile row per document, Arrow ``mapInPandas``
for the XML walk (stdlib ElementTree), feature rows fan out per
Placemark — identical layout to the GeoJSON path, one task per file.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.sources.geojson import FEATURE_SCHEMA
from dronedb_spark.suite import check

_NS = re.compile(r"\{[^}]*\}")


def _local(tag: str) -> str:
    return _NS.sub("", tag)


def _coords(text: str) -> list[tuple[float, float]]:
    """KML coordinate string: whitespace-separated lon,lat[,alt] tuples."""
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        if len(parts) >= 2:
            pts.append((float(parts[0]), float(parts[1])))
    return pts


def parse_kml(data: bytes) -> list[dict]:
    """Placemark list: {name, geom_type, points, n_props} — KMZ (zip)
    unwraps to its doc.kml automatically."""
    if data[:2] == b"PK":  # KMZ
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            kml_names = [n for n in zf.namelist() if n.lower().endswith(".kml")]
            if not kml_names:
                raise ValueError("KMZ without .kml member")
            data = zf.read(kml_names[0])
    root = ElementTree.fromstring(data)
    out = []
    for pm in root.iter():
        if _local(pm.tag) != "Placemark":
            continue
        name = None
        n_props = 0
        geom_type = None
        points: list[tuple[float, float]] = []
        for el in pm.iter():
            tag = _local(el.tag)
            if tag == "name":
                name = (el.text or "").strip()
            elif tag == "ExtendedData":
                n_props = sum(1 for d in el.iter() if _local(d.tag) == "Data")
            elif tag in ("Point", "LineString", "Polygon"):
                # MultiGeometry: first geometry wins the type; all points
                # feed the bbox (matching the bbox-over-all-parts model)
                if geom_type is None:
                    geom_type = tag
            elif tag == "coordinates":
                points.extend(_coords(el.text))
        out.append(
            {
                "name": name,
                "geom_type": "LineString" if geom_type == "LineString" else geom_type,
                "points": points,
                "n_props": n_props,
            }
        )
    return out


def read_kml_features(files: DataFrame, content_col: str = "content") -> DataFrame:
    """(dataset_id, layer, content) rows → features table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ds, layer, content in zip(pdf["dataset_id"], pdf["layer"], pdf[content_col]):
                raw = content if isinstance(content, bytes) else str(content).encode()
                try:
                    placemarks = parse_kml(raw)
                except Exception:
                    continue  # skip undecodable documents — never fail the job
                for idx, p in enumerate(placemarks):
                    xs = [q[0] for q in p["points"]]
                    ys = [q[1] for q in p["points"]]
                    rows.append(
                        {
                            "dataset_id": ds,
                            "layer": layer,
                            "fid": idx,
                            "geom_type": p["geom_type"],
                            "bbox_minx": min(xs) if xs else None,
                            "bbox_miny": min(ys) if ys else None,
                            "bbox_maxx": max(xs) if xs else None,
                            "bbox_maxy": max(ys) if ys else None,
                            "n_vertices": len(p["points"]),
                            "n_props": p["n_props"],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=FEATURE_SCHEMA)


# ------------------------------------------------------------------ check

_KML_N = 180


def _placemark(fid: int) -> str:
    x = -120.0 + ((fid * 733) % 4000) / 100.0
    y = 30.0 + ((fid * 389) % 1500) / 100.0
    dx = (1 + fid % 7) / 100.0
    dy = (1 + fid % 5) / 100.0
    ext = (
        "<ExtendedData>"
        + "".join(f'<Data name="k{j}"><value>{fid + j}</value></Data>' for j in range(fid % 3))
        + "</ExtendedData>"
    )
    if fid % 4 == 0:
        geom = f"<Point><coordinates>{x!r},{y!r}</coordinates></Point>"
    elif fid % 2 == 0:
        geom = (
            f"<LineString><coordinates>{x!r},{y!r} {x + dx!r},{y + dy!r}"
            "</coordinates></LineString>"
        )
    else:
        geom = (
            "<Polygon><outerBoundaryIs><LinearRing><coordinates>"
            f"{x!r},{y!r} {x + dx!r},{y!r} {x + dx!r},{y + dy!r} "
            f"{x!r},{y + dy!r} {x!r},{y!r}"
            "</coordinates></LinearRing></outerBoundaryIs></Polygon>"
        )
    return f"<Placemark><name>f{fid}</name>{ext}{geom}</Placemark>"


@check(
    "kml_parse_features",
    oracle=f"""
        WITH c AS (
            SELECT k AS fid,
                   -120.0 + (k * 733) % 4000 / 100.0 AS x,
                   30.0 + (k * 389) % 1500 / 100.0 AS y,
                   (1 + k % 7) / 100.0 AS dx,
                   (1 + k % 5) / 100.0 AS dy
            FROM (SELECT unnest(range(0, {_KML_N})) AS k))
        SELECT 'doc' AS dataset_id, 'doc' AS layer, fid,
               CASE WHEN fid % 4 = 0 THEN 'Point'
                    WHEN fid % 2 = 0 THEN 'LineString' ELSE 'Polygon' END AS geom_type,
               x AS bbox_minx, y AS bbox_miny,
               CASE WHEN fid % 4 = 0 THEN x ELSE x + dx END AS bbox_maxx,
               CASE WHEN fid % 4 = 0 THEN y ELSE y + dy END AS bbox_maxy,
               CAST(CASE WHEN fid % 4 = 0 THEN 1
                         WHEN fid % 2 = 0 THEN 2 ELSE 5 END AS INT) AS n_vertices,
               CAST(fid % 3 AS INT) AS n_props
        FROM c ORDER BY fid""",
)
def q_kml_parse_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL KML text (namespaced XML, ExtendedData, LinearRing nesting) →
    the XML-walk kernel → features table, value-checked against the
    closed-form coordinate grid.  repr() coordinates guarantee the
    shortest round-trip decimal, so text→float returns the identical
    double the oracle computes."""
    ids = spark.range(1).select(F.lit("doc").alias("dataset_id"), F.lit("doc").alias("layer"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        body = "".join(_placemark(i) for i in range(_KML_N))
        doc = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
            + body
            + "</Document></kml>"
        ).encode()
        for pdf in batches:
            yield pd.DataFrame(
                {"dataset_id": pdf["dataset_id"], "layer": pdf["layer"],
                 "content": [doc] * len(pdf)}
            )

    import pyspark.sql.types as T

    gen_schema = T.StructType(
        [
            T.StructField("dataset_id", T.StringType()),
            T.StructField("layer", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = ids.mapInPandas(gen, schema=gen_schema)
    return read_kml_features(files).orderBy("fid")
