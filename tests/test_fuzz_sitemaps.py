"""Hypothesis fuzz for the sitemap parser (text/sitemaps.py) — parse
must never raise on arbitrary bytes and every emitted row must satisfy
the schema invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dronedb_spark.text.sitemaps import (
    DEFAULT_PRIORITY_MICRO,
    _lastmod_epoch_s,
    parse_sitemap_text,
)

_tag = st.sampled_from(["urlset", "sitemapindex", "rss", "html"])
_loc = st.text(
    alphabet="abcxyz:/.?&=%0123456789", min_size=0, max_size=40
)
_lastmod = st.one_of(
    st.none(),
    st.dates().map(str),
    st.text(max_size=12),
)
_priority = st.one_of(st.none(), st.floats(-2, 2).map(str), st.text(max_size=6))


@st.composite
def _xml(draw):
    from xml.sax.saxutils import escape

    tag = draw(_tag)
    item = "sitemap" if tag == "sitemapindex" else "url"
    parts = [f"<{tag}>"]
    for _ in range(draw(st.integers(0, 4))):
        fields = []
        loc = draw(_loc)
        if draw(st.booleans()):
            fields.append(f"<loc>{escape(loc)}</loc>")
        lm = draw(_lastmod)
        if lm is not None:
            fields.append(f"<lastmod>{escape(lm)}</lastmod>")
        pr = draw(_priority)
        if pr is not None:
            fields.append(f"<priority>{escape(pr)}</priority>")
        parts.append(f"<{item}>{''.join(fields)}</{item}>")
    parts.append(f"</{tag}>")
    return "".join(parts)


@given(st.one_of(_xml(), st.text(max_size=200)))
@settings(max_examples=200, deadline=None)
def test_parse_never_raises_and_rows_are_sound(xml):
    rows = parse_sitemap_text("h.example.com", "h.example.com.sitemap.xml", xml)
    for r in rows:
        assert r["kind"] in ("url", "ref")
        assert r["loc"]  # no loc → no row
        assert isinstance(r["lastmod_s"], int) and r["lastmod_s"] >= -1
        assert isinstance(r["priority_micro"], int)


@given(st.one_of(st.none(), st.text(max_size=30), st.dates().map(str)))
@settings(max_examples=200, deadline=None)
def test_lastmod_total_function(s):
    v = _lastmod_epoch_s(s)
    assert isinstance(v, int)
    assert v == -1 or v % 86400 == 0


def test_non_sitemap_roots_emit_url_kind_only_for_urlset():
    rows = parse_sitemap_text(
        "h", "h.sitemap.xml", "<rss><url><loc>https://h/x</loc></url></rss>"
    )
    # unknown root: children named url still parse as non-index entries
    assert all(r["kind"] == "url" for r in rows)
    assert parse_sitemap_text("h", "h.sitemap.xml", "") == []
    assert (
        parse_sitemap_text("h", "h.sitemap.xml", "\x00\x01garbage") == []
    )
