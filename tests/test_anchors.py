"""Anchor extraction laws: quote styles, nested tags, entity decode,
scheme filtering, and relative-href resolution."""

from __future__ import annotations

from dronedb_spark.text.anchors import (
    anchor_rollup,
    extract_links,
    resolve_target_host,
)


def test_extract_quote_styles_and_nesting():
    html = (
        b'<a href="https://a.com/x">plain text</a>'
        b"<a href='https://b.com/y'>single <i>quoted</i> inner</a>"
        b'<A HREF="https://c.com/z" class="nav">case insensitive</A>'
    )
    got = extract_links(html)
    assert got == [
        ("https://a.com/x", "plain text"),
        ("https://b.com/y", "single quoted inner"),
        ("https://c.com/z", "case insensitive"),
    ]


def test_extract_entities_and_multiline():
    html = b'<a href="/p">alpha &amp; beta\n  gamma</a>'
    assert extract_links(html) == [("/p", "alpha & beta gamma")]


def test_resolution_rules(spark):
    rows = [
        ("https://src.example.com/page", "https://other.example.com/x", "abs"),
        ("https://src.example.com/page", "HTTP://UPPER.example.com/y", "case"),
        ("https://src.example.com/page", "/relative/path", "rel"),
        ("https://src.example.com/page", "mailto:x@y.com", "mail"),
        ("https://src.example.com/page", "javascript:void(0)", "js"),
        ("https://src.example.com/page", "#fragment", "frag"),
    ]
    df = spark.createDataFrame(
        rows, "source_uri string, href string, anchor_text string"
    )
    got = {
        r["anchor_text"]: r["target_host"]
        for r in resolve_target_host(df).collect()
    }
    assert got == {
        "abs": "other.example.com",
        "case": "upper.example.com",
        "rel": "src.example.com",
    }


def test_rollup_counts_distinct_hosts(spark):
    rows = [
        ("https://a.com/1", "https://t.com/x", "one two"),
        ("https://a.com/2", "https://t.com/y", "three"),
        ("https://b.com/1", "https://t.com/z", "four five six"),
    ]
    df = resolve_target_host(
        spark.createDataFrame(
            rows, "source_uri string, href string, anchor_text string"
        )
    )
    r = anchor_rollup(df).collect()[0]
    assert (r["target_host"], r["n_links"], r["n_src_hosts"], r["anchor_tokens"]) == (
        "t.com",
        3,
        2,
        6,
    )
