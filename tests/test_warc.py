"""WARC/WET source: record walking, gzip member chaining, HTML→text
extraction, and the malformed-input boundaries."""

from __future__ import annotations

import gzip

from dronedb_spark.sources.warc import (
    encode_warc,
    encode_warc_record,
    html_to_text,
    http_body,
    parse_warc,
)


def test_magic_inside_payload_does_not_split():
    """A page QUOTING a WARC file: the payload contains the record
    magic + fake headers.  Content-Length walking must keep it one
    record; a magic-splitting reader would desync."""
    evil = b"look: WARC/1.0\r\nContent-Length: 0\r\n\r\n done"
    data = encode_warc_record("response", evil, uri="https://a/x")
    recs = parse_warc(data)
    assert len(recs) == 1
    assert recs[0]["payload"] == evil


def test_gzip_member_chaining_matches_plain():
    recs = [
        encode_warc_record("response", b"abc", uri="https://a/1"),
        encode_warc_record("response", b"defgh", uri="https://a/2"),
    ]
    plain = parse_warc(encode_warc(recs, per_record_gzip=False))
    gz = parse_warc(encode_warc(recs, per_record_gzip=True))
    assert plain == gz
    assert [r["content_length"] for r in plain] == [3, 5]


def test_whole_file_gzip_also_parses():
    """Some producers gzip the whole file as one member."""
    recs = [encode_warc_record("response", b"xyz", uri="https://a/1")]
    data = gzip.compress(encode_warc(recs, per_record_gzip=False))
    assert [r["payload"] for r in parse_warc(data)] == [b"xyz"]


def test_truncated_record_stops_cleanly():
    good = encode_warc_record("response", b"abcdef", uri="https://a/1")
    cut = encode_warc_record("response", b"0123456789", uri="https://a/2")[:-8]
    recs = parse_warc(good + cut)
    assert [r["payload"] for r in recs] == [b"abcdef"]


def test_missing_content_length_stops_cleanly():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
    assert parse_warc(bad) == []


def test_http_body_strip():
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<b>hi</b>"
    assert http_body(payload) == b"<b>hi</b>"
    # no header separator: pass through untouched
    assert http_body(b"<b>hi</b>") == b"<b>hi</b>"


def test_html_to_text_rules():
    html = (
        b"<html><head><title>T</title><script>if (a < b) { x(); }</script>"
        b"<style>p{color:red}</style></head><body>"
        b"<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
        b"<!-- secret --></body></html>"
    )
    assert html_to_text(html) == "T a & b <tag> \"q\" 's' end"


def test_html_to_text_case_insensitive_script():
    html = b"<SCRIPT>var x=1;</SCRIPT><P>kept</P>"
    assert html_to_text(html) == "kept"


def test_html_to_blocks_structure():
    from dronedb_spark.sources.warc import html_to_blocks

    html = (
        b"<html><head><title>T</title></head><body>"
        b"<p>First block stays.</p><p></p>"
        b"<div>Second &amp; block.</div>"
        b"line one<br>line two"
        b"<script>var x;</script></body></html>"
    )
    assert html_to_blocks(html) == (
        "T\nFirst block stays.\nSecond & block.\nline one\nline two"
    )
