"""Positional inverted index + phrase query laws (text/invindex.py)."""

from __future__ import annotations

from dronedb_spark.text.invindex import phrase_query, positional_postings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _query(spark, rows, phrase):
    out = phrase_query(positional_postings(_docs(spark, rows)), phrase)
    return {r["doc_id"]: (r["n_occurrences"], r["first_pos"]) for r in out.collect()}


def test_phrase_matches_and_counts_overlaps(spark):
    rows = [
        (1, "a b c a b c"),       # "a b c" twice
        (2, "a b x c"),            # broken phrase: no match
        (3, "c b a"),              # reversed: no match
        (4, "x a b c y"),          # once, at offset 1
    ]
    got = _query(spark, rows, ["a", "b", "c"])
    assert got == {1: (2, 0), 4: (1, 1)}


def test_repeated_token_phrase_needs_both_slots(spark):
    rows = [
        (1, "the the end"),   # matches "the the"
        (2, "the end the"),   # two single "the"s, never adjacent
    ]
    got = _query(spark, rows, ["the", "the"])
    assert got == {1: (1, 0)}
    # overlapping runs: "the the the" has two occurrences of "the the"
    got3 = _query(spark, [(9, "the the the")], ["the", "the"])
    assert got3 == {9: (2, 0)}


def test_matches_brute_force_on_corpus_slice(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    phrase = ["key", "agg"]
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_query(positional_postings(docs), phrase).collect()
    }
    expect = {}
    for row in docs.select("doc_id", "text").collect():
        toks = [t for t in row["text"].split(" ") if t]
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i : i + 2] == phrase
        )
        if n:
            expect[row["doc_id"]] = n
    assert got == expect


def test_postings_positions_sorted_and_complete(spark):
    p = positional_postings(_docs(spark, [(1, "b a b")])).collect()
    by_tok = {r["tok"]: r["positions"] for r in p}
    assert by_tok == {"a": [1], "b": [0, 2]}
