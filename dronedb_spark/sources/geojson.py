"""GeoJSON vector reader (SURVEY S8 — the OGR seam made real for the
one vector format that needs no native library).

Reference: ``openVector``/``queryVector`` (vector_query.cpp:121-292) read
any OGR driver; GeoJSON (RFC 7946, public JSON) is decodable directly:
FeatureCollection text → one row per feature with geometry type,
recursive coordinate bbox, vertex count — the same *features* model that
``operators/vector_query.py`` filters, pages, and describes.

Spark shape: files load distributed via ``spark.read.text(wholetext)``
(one row per file; content bytes never ride through the driver); the
JSON decode is an Arrow-batched ``mapInPandas`` kernel (genuinely Python
work), and everything downstream — bbox predicates, paging, describe —
stays pure DataFrame algebra on the parsed columns.  One file row fans
out to n_features rows, so a directory of FeatureCollections parses with
one task per file and no skew beyond file size.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType()),
        T.StructField("layer", T.StringType()),
        T.StructField("fid", T.LongType()),
        T.StructField("geom_type", T.StringType()),
        T.StructField("bbox_minx", T.DoubleType()),
        T.StructField("bbox_miny", T.DoubleType()),
        T.StructField("bbox_maxx", T.DoubleType()),
        T.StructField("bbox_maxy", T.DoubleType()),
        T.StructField("n_vertices", T.IntegerType()),
        T.StructField("n_props", T.IntegerType()),
    ]
)


def _walk_coords(coords) -> Iterator[tuple[float, float]]:
    """Yield (x, y) pairs from arbitrarily nested GeoJSON coordinates
    (Point depth 1 … MultiPolygon depth 4)."""
    if not coords:
        return
    if isinstance(coords[0], (int, float)):
        yield (float(coords[0]), float(coords[1]))
        return
    for sub in coords:
        yield from _walk_coords(sub)


def parse_feature_collections(
    files: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Decode FeatureCollection text rows (dataset_id, layer, content)
    into the features table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ds, layer, content in zip(
                pdf["dataset_id"], pdf["layer"], pdf[content_col]
            ):
                doc = json.loads(content)
                feats = doc.get("features", []) if doc.get("type") == "FeatureCollection" else [doc]
                for idx, feat in enumerate(feats):
                    geom = feat.get("geometry") or {}
                    pts = list(_walk_coords(geom.get("coordinates", [])))
                    fid = feat.get("id")
                    if not isinstance(fid, int):
                        fid = idx
                    xs = [p[0] for p in pts]
                    ys = [p[1] for p in pts]
                    rows.append(
                        {
                            "dataset_id": ds,
                            "layer": layer,
                            "fid": fid,
                            "geom_type": geom.get("type"),
                            "bbox_minx": min(xs) if xs else None,
                            "bbox_miny": min(ys) if ys else None,
                            "bbox_maxx": max(xs) if xs else None,
                            "bbox_maxy": max(ys) if ys else None,
                            "n_vertices": len(pts),
                            "n_props": len(feat.get("properties") or {}),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=FEATURE_SCHEMA)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """S8 entry point: read a file/glob of .geojson FeatureCollections
    into the features table, fully distributed."""
    raw = (
        spark.read.text(path, wholetext=True)
        .withColumn("_file", F.input_file_name())
        .select(
            F.regexp_extract("_file", r"([^/]+)\.[^./]+$", 1).alias("dataset_id"),
            F.regexp_extract("_file", r"([^/]+)\.[^./]+$", 1).alias("layer"),
            F.col("value").alias("content"),
        )
    )
    return parse_feature_collections(raw)


# --------------------------------------------------------------------------
# Driver check: REAL GeoJSON text, generated deterministically from part
# --------------------------------------------------------------------------
# Shared-dialect arithmetic for the synthetic coordinates (same discipline
# as vector_query.FEATURES_SQL): two-decimal grid anchored on p_partkey.
_COORDS_SQL = """
    SELECT CAST(p_partkey AS BIGINT) AS fid,
           CASE WHEN p_partkey % 4 = 0 THEN 'vec2' ELSE 'vec1' END AS dataset_id,
           CASE WHEN p_partkey % 4 = 0 THEN 'pois'
                WHEN p_partkey % 2 = 0 THEN 'roads' ELSE 'parcels' END AS layer,
           CASE WHEN p_partkey % 4 = 0 THEN 'Point'
                WHEN p_partkey % 2 = 0 THEN 'LineString' ELSE 'Polygon' END AS geom_type,
           CAST(-120.0 + ((p_partkey * 733) % 4000) / 100.0 AS DOUBLE) AS x,
           CAST(30.0 + ((p_partkey * 389) % 1500) / 100.0 AS DOUBLE) AS y,
           CAST((1 + p_partkey % 7) / 100.0 AS DOUBLE) AS dx,
           CAST((1 + p_partkey % 5) / 100.0 AS DOUBLE) AS dy
    FROM part
"""


def _feature_json() -> F.Column:
    """One RFC 7946 Feature per row, built as a string column.  Spark's
    double→string cast emits the shortest round-trip decimal, and
    ``json.loads`` parses it back to the identical double — so the value
    that survives generate→serialize→parse equals the closed-form double
    the oracle computes directly."""
    xs, ys = F.col("x").cast("string"), F.col("y").cast("string")
    x2 = (F.col("x") + F.col("dx")).cast("string")
    y2 = (F.col("y") + F.col("dy")).cast("string")
    pt = F.concat(F.lit('[') , xs, F.lit(","), ys, F.lit("]"))
    line = F.concat(F.lit("[["), xs, F.lit(","), ys, F.lit("],["), x2, F.lit(","), y2, F.lit("]]"))
    poly = F.concat(
        F.lit("[[["), xs, F.lit(","), ys,
        F.lit("],["), x2, F.lit(","), ys,
        F.lit("],["), x2, F.lit(","), y2,
        F.lit("],["), xs, F.lit(","), y2,
        F.lit("],["), xs, F.lit(","), ys, F.lit("]]]"),
    )
    coords = (
        F.when(F.col("geom_type") == "Point", pt)
        .when(F.col("geom_type") == "LineString", line)
        .otherwise(poly)
    )
    return F.concat(
        F.lit('{"type":"Feature","id":'),
        F.col("fid").cast("string"),
        F.lit(',"geometry":{"type":"'),
        F.col("geom_type"),
        F.lit('","coordinates":'),
        coords,
        F.lit('},"properties":{"layer":"'),
        F.col("layer"),
        F.lit('"}}'),
    )


@check(
    "geojson_parse_features",
    oracle=f"""
        WITH c AS ({_COORDS_SQL})
        SELECT dataset_id, layer, fid, geom_type,
               x AS bbox_minx, y AS bbox_miny,
               CASE WHEN geom_type = 'Point' THEN x ELSE x + dx END AS bbox_maxx,
               CASE WHEN geom_type = 'Point' THEN y ELSE y + dy END AS bbox_maxy,
               CAST(CASE geom_type WHEN 'Point' THEN 1
                                   WHEN 'LineString' THEN 2 ELSE 5 END AS INT)
                 AS n_vertices,
               CAST(1 AS INT) AS n_props
        FROM c ORDER BY fid""",
)
def q_geojson_parse_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level check of the REAL GeoJSON decode path: part rows →
    genuine FeatureCollection text (grouped per dataset/layer) → the
    parser kernel walks actual JSON — markers, nesting, ring closure —
    and must reproduce the closed-form bbox/vertex values the oracle
    states directly.  Not a tautology: any slip in coordinate walking,
    fid handling, or bbox reduction breaks value parity."""
    from dronedb_spark.tables import register_views

    register_views(spark, sf_dir, ["part"])
    rows = spark.sql(_COORDS_SQL).withColumn("feature_json", _feature_json())
    collections = rows.groupBy("dataset_id", "layer").agg(
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("fid", "feature_json"))),
                    lambda s: s["feature_json"],
                ),
            ),
            F.lit("]}"),
        ).alias("content")
    )
    return parse_feature_collections(collections).orderBy("fid")
