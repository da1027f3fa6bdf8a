"""Property tests for the crawl-side parsers: the robots parser and
anchor extractor never crash and keep their invariants on arbitrary
input; the C4 gate is a fixpoint on its own output."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dronedb_spark.text.anchors import extract_links
from dronedb_spark.text.robots import parse_robots_text

_line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=60,
)
_directive = st.one_of(
    st.builds(lambda a: f"User-agent: {a}", _line),
    st.builds(lambda p: f"Disallow: {p}", _line),
    st.builds(lambda p: f"Allow: {p}", _line),
    st.builds(lambda x: f"Crawl-delay: {x}", st.integers(0, 99)),
    _line,  # arbitrary junk lines
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_directive, max_size=30))
def test_robots_parser_invariants(lines):
    rows = parse_robots_text("h.com", "\n".join(lines))
    for r in rows:
        assert r["host"] == "h.com"
        assert r["rule"] in ("allow", "disallow", "crawl-delay")
        assert r["path"] != ""            # empty Disallow never emits
        if r["rule"] == "crawl-delay":
            assert r["path"].isdigit()
        assert r["agent"] == r["agent"].lower()
        assert "#" not in r["path"].split("#", 1)[:0]  # comments stripped


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_anchor_extractor_total(blob):
    """Total on arbitrary bytes; anchor text never carries a whole tag."""
    for href, text in extract_links(blob):
        assert isinstance(href, str) and isinstance(text, str)
        assert "<a" not in text.lower()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.builds(
            lambda words, punct: " ".join(words) + punct,
            st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=1, max_size=8),
            st.sampled_from([".", "!", "?", '"', "", " trailing"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_c4_line_filter_fixpoint_pure(lines):
    """The pure-python restatement of the C4 line predicate is a
    fixpoint: filtering the filtered lines changes nothing.  (The Spark
    operator uses the same predicate; its equality with this
    restatement is covered by the driver oracle.)"""

    def keep(line: str) -> bool:
        t = line.strip()
        return (
            t[-1:] in ('.', '!', '?', '"')
            and len([w for w in t.split(" ") if w]) >= 3
            and "javascript" not in line.lower()
        )

    kept = [line for line in lines if keep(line)]
    assert [line for line in kept if keep(line)] == kept
