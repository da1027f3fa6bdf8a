"""DXF vector reader (SURVEY S8 — AutoCAD DXF, a public ASCII format of
group-code/value pairs).

Subset: the ENTITIES section's POINT / LINE / LWPOLYLINE entities — the
geometry CAD exports actually carry into survey pipelines.  Features
land in the shared ``features`` model (``sources/geojson.FEATURE_SCHEMA``)
like every other vector reader, so bbox query / paging / describe / MVT
run on DXF input unchanged.  Closes the last practical format from the
reference's OGR list (entry.cpp:1034-1035); DWG (binary, proprietary)
stays out of scope.

Spark shape: identical to the GeoJSON/KML path — one text row per file,
Arrow ``mapInPandas`` for the pair-stream walk.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.sources.geojson import FEATURE_SCHEMA
from dronedb_spark.suite import check


def parse_dxf(text: str) -> list[dict]:
    """ENTITIES-section walk → [{geom_type, points[(x, y)...], layer}].
    DXF is a flat stream of (group code, value) line pairs; an entity
    runs from its `0 <NAME>` pair to the next code-0 pair."""
    lines = [ln.strip() for ln in text.splitlines()]
    pairs = [
        (int(lines[i]), lines[i + 1]) for i in range(0, len(lines) - 1, 2)
        if lines[i].lstrip("-").isdigit()
    ]
    out: list[dict] = []
    in_entities = False
    i = 0
    cur: dict | None = None

    def flush() -> None:
        nonlocal cur
        if cur and cur["points"]:
            out.append(cur)
        cur = None

    while i < len(pairs):
        code, val = pairs[i]
        if code == 0 and val == "SECTION" and i + 1 < len(pairs) and pairs[i + 1] == (2, "ENTITIES"):
            in_entities = True
            i += 2
            continue
        if code == 0 and val == "ENDSEC":
            flush()
            in_entities = False
            i += 1
            continue
        if not in_entities:
            i += 1
            continue
        if code == 0:
            flush()
            if val == "POINT":
                cur = {"geom_type": "Point", "points": [], "layer": "0", "_closed": False}
            elif val == "LINE":
                cur = {"geom_type": "LineString", "points": [], "layer": "0", "_closed": False}
            elif val == "LWPOLYLINE":
                cur = {"geom_type": "LineString", "points": [], "layer": "0", "_closed": False}
            else:
                cur = None
        elif cur is not None:
            if code == 8:
                cur["layer"] = val
            elif code == 70 and cur["geom_type"] == "LineString":
                cur["_closed"] = bool(int(val) & 1)
            elif code in (10, 11):
                cur["points"].append([float(val), None])
            elif code in (20, 21):
                # pair with the most recent x missing its y
                for p in reversed(cur["points"]):
                    if p[1] is None:
                        p[1] = float(val)
                        break
        i += 1
    flush()
    for e in out:
        e["points"] = [(p[0], p[1]) for p in e["points"] if p[1] is not None]
        if e.pop("_closed", False) and len(e["points"]) >= 3:
            e["geom_type"] = "Polygon"
            e["points"].append(e["points"][0])  # close the ring
    return out


def encode_dxf(entities: list[dict]) -> str:
    """Minimal DXF: HEADER stub + ENTITIES with the same subset."""
    parts = ["0", "SECTION", "2", "HEADER", "0", "ENDSEC", "0", "SECTION", "2", "ENTITIES"]
    for e in entities:
        pts = e["points"]
        layer = e.get("layer", "0")
        if e["geom_type"] == "Point":
            parts += ["0", "POINT", "8", layer, "10", repr(pts[0][0]), "20", repr(pts[0][1])]
        elif e["geom_type"] == "LineString" and len(pts) == 2:
            parts += [
                "0", "LINE", "8", layer,
                "10", repr(pts[0][0]), "20", repr(pts[0][1]),
                "11", repr(pts[1][0]), "21", repr(pts[1][1]),
            ]
        else:
            closed = e["geom_type"] == "Polygon"
            ring = pts[:-1] if closed and pts[0] == pts[-1] else pts
            parts += ["0", "LWPOLYLINE", "8", layer, "90", str(len(ring)),
                      "70", "1" if closed else "0"]
            for x, y in ring:
                parts += ["10", repr(x), "20", repr(y)]
    parts += ["0", "ENDSEC", "0", "EOF"]
    return "\n".join(parts) + "\n"


def read_dxf_features(files: DataFrame, content_col: str = "content") -> DataFrame:
    """(dataset_id, layer, content) rows → features table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ds, content in zip(pdf["dataset_id"], pdf[content_col]):
                text = content.decode("ascii", "replace") if isinstance(content, bytes) else str(content)
                try:
                    ents = parse_dxf(text)
                except Exception:
                    continue  # skip undecodable documents — never fail the job
                for idx, e in enumerate(ents):
                    xs = [p[0] for p in e["points"]]
                    ys = [p[1] for p in e["points"]]
                    rows.append(
                        {
                            "dataset_id": ds,
                            "layer": e["layer"],
                            "fid": idx,
                            "geom_type": e["geom_type"],
                            "bbox_minx": min(xs) if xs else None,
                            "bbox_miny": min(ys) if ys else None,
                            "bbox_maxx": max(xs) if xs else None,
                            "bbox_maxy": max(ys) if ys else None,
                            "n_vertices": len(e["points"]),
                            "n_props": 0,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=FEATURE_SCHEMA)


# ------------------------------------------------------------------ check

_DXF_N = 160


@check(
    "dxf_parse_features",
    oracle=f"""
        WITH c AS (
            SELECT k,
                   -120.0 + (k * 733) % 4000 / 100.0 AS x,
                   30.0 + (k * 389) % 1500 / 100.0 AS y,
                   (1 + k % 7) / 100.0 AS dx,
                   (1 + k % 5) / 100.0 AS dy
            FROM (SELECT unnest(range(0, {_DXF_N})) AS k))
        SELECT 'plan' AS dataset_id,
               CASE WHEN k % 3 = 0 THEN 'survey' ELSE 'design' END AS layer,
               CAST(k AS BIGINT) AS fid,
               CASE WHEN k % 4 = 0 THEN 'Point'
                    WHEN k % 2 = 0 THEN 'LineString' ELSE 'Polygon' END AS geom_type,
               x AS bbox_minx, y AS bbox_miny,
               CASE WHEN k % 4 = 0 THEN x ELSE x + dx END AS bbox_maxx,
               CASE WHEN k % 4 = 0 THEN y ELSE y + dy END AS bbox_maxy,
               CAST(CASE WHEN k % 4 = 0 THEN 1
                         WHEN k % 2 = 0 THEN 2 ELSE 5 END AS INT) AS n_vertices,
               CAST(0 AS INT) AS n_props
        FROM c ORDER BY fid""",
)
def q_dxf_parse_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DXF text (group-code pair stream, POINT/LINE/LWPOLYLINE with
    the closed flag) → the walk kernel → features table, value-checked
    against the closed-form grid.  repr() coordinates round-trip the
    exact doubles the oracle computes."""
    from pyspark.sql import types as T

    ids = spark.range(1).select(F.lit("plan").alias("dataset_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ents = []
        for k in range(_DXF_N):
            x = -120.0 + ((k * 733) % 4000) / 100.0
            y = 30.0 + ((k * 389) % 1500) / 100.0
            dx = (1 + k % 7) / 100.0
            dy = (1 + k % 5) / 100.0
            layer = "survey" if k % 3 == 0 else "design"
            if k % 4 == 0:
                ents.append({"geom_type": "Point", "points": [(x, y)], "layer": layer})
            elif k % 2 == 0:
                ents.append(
                    {"geom_type": "LineString", "points": [(x, y), (x + dx, y + dy)],
                     "layer": layer}
                )
            else:
                ents.append(
                    {"geom_type": "Polygon", "layer": layer,
                     "points": [(x, y), (x + dx, y), (x + dx, y + dy), (x, y + dy), (x, y)]}
                )
        doc = encode_dxf(ents).encode()
        for pdf in batches:
            yield pd.DataFrame({"dataset_id": pdf["dataset_id"], "content": [doc] * len(pdf)})

    gen_schema = T.StructType(
        [
            T.StructField("dataset_id", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return read_dxf_features(ids.mapInPandas(gen, schema=gen_schema)).orderBy("fid")
