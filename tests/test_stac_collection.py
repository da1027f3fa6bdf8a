"""The full STAC Collection document assembles as valid JSON with the
reference's field set (stac.cpp:528-595)."""

from __future__ import annotations

import base64
import json

from dronedb_spark.catalog.derive import entries_df
from dronedb_spark.operators.stac import stac_collection_doc


def test_collection_doc_structure(spark, sf_dir):
    entries = entries_df(spark, sf_dir)
    row = stac_collection_doc(
        entries,
        "site42",
        title="Site 42",
        license="CC-BY-4.0",
        collection_root="https://hub.example/org/site42",
        catalog_root="https://hub.example",
    ).collect()[0]
    doc = json.loads(row["doc"])

    assert doc["stac_version"] == "1.0.0"
    assert doc["type"] == "Collection"
    assert doc["id"] == "site42"
    assert doc["title"] == "Site 42"
    assert doc["description"] == "Site 42"  # readme fallback → title
    assert doc["license"] == "CC-BY-4.0"

    rels = [link["rel"] for link in doc["links"]]
    assert rels[:3] == ["root", "parent", "self"]
    items = [link for link in doc["links"] if link["rel"] == "item"]
    assert items, "geometry entries must produce item links"
    # href embeds base64(path), title is the raw path (stac.cpp:567-574)
    first = items[0]
    encoded = first["href"].rsplit("/", 1)[-1]
    assert base64.b64decode(encoded).decode() == first["title"]
    assert first["type"] == "application/geo+json"
    # item links are path-ordered
    titles = [link["title"] for link in items]
    assert titles == sorted(titles)

    ext = doc["extent"]
    bbox = ext["spatial"]["bbox"][0]
    assert len(bbox) == 4 and bbox[0] <= bbox[2] and bbox[1] <= bbox[3]
    t0, t1 = ext["temporal"]["interval"][0]
    assert t0 <= t1 and t0.endswith("Z")

    assert doc["assets"], "no-geometry entries must land in assets"
    for path, asset in doc["assets"].items():
        assert asset["title"] == path
        assert "/download?path=" in asset["href"]


def test_collection_doc_no_static_links(spark, sf_dir):
    entries = entries_df(spark, sf_dir)
    doc = json.loads(
        stac_collection_doc(entries, "ds").collect()[0]["doc"]
    )
    assert all(link["rel"] == "item" for link in doc["links"])


def test_stac_item_proj_rewrite_erases_sources(spark):
    """buildStacItem REWRITES properties in place (stac.cpp:394-416):
    geotransform/projection (and width/height when proj:shape is
    emitted) are erased, proj:* keys added; rows without both source
    keys pass through untouched."""
    import json

    from dronedb_spark.operators.stac import stac_item_props_rewrite

    wkt = ('PROJCS["UTM",GEOGCS["WGS 84",AUTHORITY["EPSG","4326"]],'
           'AUTHORITY["EPSG","32633"]]')
    rows = [
        ("a", json.dumps({"geotransform": [1.0, 0.5, 0.0, 2.0, 0.0, -0.5],
                          "projection": wkt, "width": 100, "height": 80,
                          "datetime": "2021-05-06T10:00:00Z",
                          "captureTime": 1620295200000,
                          "make": "DJI",
                          "bands": [{"colorInterp": "Red"}]})),
        ("b", json.dumps({"geotransform": [1.0, 1.0, 0.0, 2.0, 0.0, -1.0],
                          "projection": 'LOCAL_CS["eng"]'})),
        ("c", json.dumps({"width": 640})),
    ]
    df = spark.createDataFrame(rows, "path string, properties string")
    got = {r["path"]: json.loads(r["properties"])
           for r in stac_item_props_rewrite(df).collect()}
    # a: full extension; LAST EPSG authority wins (rfind semantics)
    assert got["a"]["proj:transform"] == [1.0, 0.5, 0.0, 2.0, 0.0, -0.5]
    assert got["a"]["proj:shape"] == [80, 100]
    assert got["a"]["proj:wkt2"] == wkt
    assert got["a"]["proj:code"] == "EPSG:32633"
    for k in ("geotransform", "projection", "width", "height"):
        assert k not in got["a"]
    # SIBLING properties survive the rewrite (the reference erases only
    # the source keys, stac.cpp:394-416; datetime is set just above the
    # projection block and must never be lost)
    assert got["a"]["datetime"] == "2021-05-06T10:00:00Z"
    assert got["a"]["captureTime"] == 1620295200000
    assert got["a"]["make"] == "DJI"
    assert got["a"]["bands"] == [{"colorInterp": "Red"}]
    # b: no shape (no width/height), no code (no EPSG authority)
    assert "proj:shape" not in got["b"] and "proj:code" not in got["b"]
    assert got["b"]["proj:wkt2"] == 'LOCAL_CS["eng"]'
    # c: untouched passthrough
    assert got["c"] == {"width": 640}


def test_stac_item_proj_rewrite_keeps_width_without_shape(spark):
    """width WITHOUT height ⇒ no proj:shape ⇒ width is NOT erased
    (the reference only erases width/height when it emits the shape)."""
    import json

    from dronedb_spark.operators.stac import stac_item_props_rewrite

    rows = [("w", json.dumps({"geotransform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
                              "projection": 'LOCAL_CS["eng"]', "width": 321}))]
    df = spark.createDataFrame(rows, "path string, properties string")
    got = json.loads(stac_item_props_rewrite(df).collect()[0]["properties"])
    assert got["width"] == 321 and "proj:shape" not in got
