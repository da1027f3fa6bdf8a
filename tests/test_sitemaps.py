"""Sitemap parse + frontier laws (text/sitemaps.py)."""

from __future__ import annotations

from dronedb_spark.text.sitemaps import (
    _lastmod_epoch_s,
    _sitemaps_root,
    eligible_entries,
    parse_sitemap_text,
    parse_sitemaps,
)


def test_pure_parse_urlset_and_defaults():
    xml = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://h/x</loc><lastmod>2026-03-01</lastmod>"
        "<priority>0.7</priority></url>"
        "<url><loc>https://h/y</loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc → dropped
        "</urlset>"
    )
    rows = parse_sitemap_text("h", "h.sitemap.xml", xml)
    assert [r["loc"] for r in rows] == ["https://h/x", "https://h/y"]
    assert rows[0]["priority_micro"] == 700_000
    assert rows[0]["lastmod_s"] == _lastmod_epoch_s("2026-03-01")
    assert (rows[1]["lastmod_s"], rows[1]["priority_micro"]) == (-1, 500_000)
    assert all(r["kind"] == "url" for r in rows)


def test_pure_parse_index_and_malformed():
    xml = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://h/child.xml</loc></sitemap></sitemapindex>"
    )
    rows = parse_sitemap_text("h", "h.sitemapindex.xml", xml)
    assert rows[0]["kind"] == "ref"
    assert parse_sitemap_text("h", "h.sitemap.xml", "<urlset><url>") == []


def test_lastmod_variants():
    assert _lastmod_epoch_s("2026-01-02") == 1767312000
    assert _lastmod_epoch_s("2026-01-02T10:30:00+00:00") == 1767312000
    assert _lastmod_epoch_s("not-a-date") == -1
    assert _lastmod_epoch_s(None) == -1


def test_orphan_child_sitemap_is_excluded(spark):
    from dronedb_spark.sources.bridge import scan_binaries
    from dronedb_spark.tables import spread

    files = scan_binaries(spark, _sitemaps_root(), "*.xml")
    entries = eligible_entries(parse_sitemaps(spread(files))).collect()
    locs = {r["loc"] for r in entries}
    assert "https://site4.example.com/orphan/z" not in locs
    # referenced children ARE in
    assert "https://site4.example.com/fresh/x" in locs
    # root urlset files contribute directly
    assert "https://site1.example.com/new/b" in locs
    # index ref rows never appear as url entries
    assert all(not l.endswith(".xml") for l in locs)
