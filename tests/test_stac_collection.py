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
