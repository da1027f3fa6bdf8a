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


def test_store_probe_matches_memory_and_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted store answers the phrase query identically to the
    in-memory index, and the probe plan (a) reads ONLY the store — its
    single file scan's location is the store path, the corpus is never
    touched — (b) partition-prunes on the token bucket (PartitionFilters
    carries bkt) and (c) pushes the token filter into the scan."""
    from dronedb_spark.plans.inspect import formatted
    from dronedb_spark.tables import load
    from dronedb_spark.text.invindex import (
        _PHRASE,
        _token_bucket,
        phrase_probe_store,
        phrase_query,
        write_postings_store,
    )

    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "postings_store")
    write_postings_store(docs, path)

    probe = phrase_probe_store(spark, path, _PHRASE)
    want = {
        (r["doc_id"], r["n_occurrences"], r["first_pos"])
        for r in phrase_query(positional_postings(docs), _PHRASE).collect()
    }
    got = {
        (r["doc_id"], r["n_occurrences"], r["first_pos"])
        for r in probe.collect()
    }
    assert got == want and len(got) > 0

    f = formatted(probe)
    # the store is the ONLY file scan (AQE explain repeats the same node
    # in Final/Initial sections — assert on scan LOCATIONS, not lines)
    locs = [ln for ln in f.splitlines() if "Location:" in ln]
    assert locs and all("postings_store" in ln for ln in locs), locs
    assert "documents.parquet" not in f  # corpus never read
    part = f[f.index("PartitionFilters"):]
    assert "bkt" in part[:200]
    pushed = f[f.index("PushedFilters"):]
    assert "tok" in pushed[:200]
    # the prune actually drops directories: phrase buckets < all buckets
    import os

    n_dirs = len([d for d in os.listdir(path) if d.startswith("bkt=")])
    n_phrase = len({_token_bucket(t) for t in _PHRASE})
    assert n_phrase < n_dirs


def test_kwic_probe_store_matches_memory(spark, sf_dir, tmp_path):
    from dronedb_spark.tables import load
    from dronedb_spark.text.invindex import (
        _KWIC_TERM,
        kwic_probe_store,
        kwic_snippets,
        write_postings_store,
    )

    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "postings_store_kwic")
    write_postings_store(docs, path)
    want = {
        tuple(r)
        for r in kwic_snippets(
            docs, positional_postings(docs), _KWIC_TERM, ctx=3
        ).collect()
    }
    got = {
        tuple(r)
        for r in kwic_probe_store(spark, path, docs, _KWIC_TERM, ctx=3).collect()
    }
    assert got == want and len(got) > 0


def test_bucket_col_matches_driver_side_bucket(spark):
    """The Spark bucket column and the Python md5-prefix bucket agree
    on every token — the driver-side prune is exactly the store's
    partitioning."""
    from pyspark.sql import functions as F

    from dronedb_spark.text.invindex import _bucket_col, _token_bucket

    toks = ["stream", "table", "hash", "merge", "", "Ünïcødé", "a b", "x" * 100]
    df = spark.createDataFrame([(t,) for t in toks], "tok string").select(
        "tok", _bucket_col().alias("bkt")
    )
    for r in df.collect():
        assert r["bkt"] == _token_bucket(r["tok"]), r["tok"]


def test_incremental_append_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Store(old) + append(batch) answers every probe exactly like
    store(full) — and the batch append never rewrote an existing
    bucket file (old files survive byte-identical)."""
    import os

    from dronedb_spark.tables import load
    from dronedb_spark.text.invindex import (
        _PHRASE,
        phrase_probe_store,
        update_postings_store,
        write_postings_store,
    )
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    write_postings_store(docs.filter(F.col("doc_id") % 5 != 0), inc)
    before = {
        os.path.join(d, f): os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(inc)
        for f in fs
        if f.endswith(".parquet")
    }
    update_postings_store(docs.filter(F.col("doc_id") % 5 == 0), inc)
    after = {
        p: os.path.getsize(p)
        for p in before
    }
    assert after == before  # old postings files untouched
    write_postings_store(docs, full)
    got = {tuple(r) for r in phrase_probe_store(spark, inc, _PHRASE).collect()}
    want = {tuple(r) for r in phrase_probe_store(spark, full, _PHRASE).collect()}
    assert got == want and len(got) > 0
