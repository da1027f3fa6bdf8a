"""Arbitrary-boundary substring dedup: span-exact recovery + the
fixed-window blind spot it exists to close."""

from __future__ import annotations

from dronedb_spark.text.segdedup import segment_dedup_tally
from dronedb_spark.text.substring import K_TOKENS, substring_dup_spans


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_span_recovered_span_exact(spark):
    """A 9-token span copied from doc 1 (tokens 4-12) into doc 2 at
    offset 6 is recovered span-exact in BOTH documents."""
    w = [f"w{i}" for i in range(30)]        # distinct tokens, no noise
    v = [f"v{i}" for i in range(30)]
    span = w[3:12]                           # doc-1 tokens 4..12 (1-based)
    doc1 = " ".join(w[:20])
    doc2 = " ".join(v[:5] + span + v[5:10])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in substring_dup_spans(_mkdocs(spark, [(1, doc1), (2, doc2)])).collect()
    }
    assert got == {(1, 4, 12, 9), (2, 6, 14, 9)}


def test_fixed_window_segdedup_misses_straddling_plant(spark):
    """The same plant straddles segdedup's 8-word grid in both docs —
    zero duplicated segments — while the anchor operator recovers it.
    This is the blind spot: aligned-window dedup only sees duplicates
    that respect its grid."""
    w = [f"w{i}" for i in range(40)]
    v = [f"v{i}" for i in range(40)]
    span = w[3:12]                           # 9 tokens, offset 3 (grid 8)
    doc1 = " ".join(w[:24])
    doc2 = " ".join(v[:5] + span + v[5:15])  # lands at offset 5
    docs = _mkdocs(spark, [(1, doc1), (2, doc2)])
    tally = {r["doc_id"]: r["n_dup_segs"] for r in segment_dedup_tally(docs).collect()}
    assert tally == {1: 0, 2: 0}             # fixed windows: invisible
    spans = substring_dup_spans(docs).collect()
    assert {(r["doc_id"], r["span_tokens"]) for r in spans} == {(1, 9), (2, 9)}


def test_short_docs_and_no_dups(spark):
    docs = _mkdocs(
        spark,
        [(1, "a b c"), (2, " ".join(f"x{i}" for i in range(12)))],
    )
    assert substring_dup_spans(docs).collect() == []


def test_adjacent_windows_merge_and_gap_splits(spark):
    """Two copied spans separated by more than one fresh token yield two
    islands; a single long copy yields one."""
    w = [f"w{i}" for i in range(60)]
    s1, s2 = w[0:8], w[20:28]
    doc1 = " ".join(w[:40])
    doc2 = " ".join(s1 + [f"z{i}" for i in range(10)] + s2)
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_dup_spans(_mkdocs(spark, [(1, doc1), (2, doc2)])).collect()
        if r["doc_id"] == 2
    )
    assert spans == [(2, 1, 8), (2, 19, 26)]


def test_min_span_length_is_k(spark):
    """A duplicate of k-1 tokens produces nothing; k tokens produce a
    span of exactly k."""
    w = [f"w{i}" for i in range(30)]
    v = [f"v{i}" for i in range(30)]
    short = w[0:K_TOKENS - 1]
    exact = w[10:10 + K_TOKENS]
    doc1 = " ".join(w[:20])
    doc2 = " ".join(v[:4] + short + v[4:8] + exact + v[8:12])
    spans = [
        (r["doc_id"], r["span_tokens"])
        for r in substring_dup_spans(_mkdocs(spark, [(1, doc1), (2, doc2)])).collect()
    ]
    assert all(t == K_TOKENS for _, t in spans)
    assert {d for d, _ in spans} == {1, 2}


def test_rewrite_removes_exactly_the_span(spark):
    """The rewrite drops exactly the duplicated tokens from both docs
    and leaves everything else joined in order."""
    from dronedb_spark.text.substring import substring_dedup_rewrite

    w = [f"w{i}" for i in range(30)]
    v = [f"v{i}" for i in range(30)]
    span = w[3:12]
    doc1 = " ".join(w[:20])
    doc2 = " ".join(v[:5] + span + v[5:10])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_dropped"])
        for r in substring_dedup_rewrite(
            _mkdocs(spark, [(1, doc1), (2, doc2)])
        ).collect()
    }
    assert got == {1: (20, 11, 9), 2: (19, 10, 9)}


def test_rewrite_keeps_clean_docs_verbatim(spark):
    """A doc with no duplicated spans fingerprints to its original
    text."""
    import hashlib

    from dronedb_spark.text.substring import substring_dedup_rewrite

    t1 = " ".join(f"x{i}" for i in range(15))
    t2 = " ".join(f"y{i}" for i in range(12))
    rows = {r["doc_id"]: r for r in substring_dedup_rewrite(
        _mkdocs(spark, [(1, t1), (2, t2)])).collect()}
    assert rows[1]["n_dropped"] == 0
    assert rows[1]["clean_md5"] == hashlib.md5(t1.encode()).hexdigest()


def test_spans_10x_is_full_coverage(spark):
    """10 identical copies of every doc => every document's whole token
    range is one duplicated span."""
    from dronedb_spark.text.substring import substring_dup_spans

    docs = [(c * 100 + 1, " ".join(f"w{i}" for i in range(12))) for c in range(10)]
    spans = substring_dup_spans(_mkdocs(spark, docs)).collect()
    assert len(spans) == 10
    assert all(r["span_start"] == 1 and r["span_end"] == 12 for r in spans)
