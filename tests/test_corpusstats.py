"""Laws for the r9 corpus/event breadth operators: sessionization gap
algebra, saturation/novelty conservation, overlap df-cap, TF-IDF
ranking, and reservoir determinism."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), u)
            for i, (u, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long",
    )


def test_sessionize_gap_boundaries(spark):
    from dronedb_spark.operators.sessionize import session_rollup, sessionize

    # user 1: events at 0s, 60s, then 2000s after gap -> 2 sessions
    # user 2: single event -> 1 session of duration 0
    ev = _events(spark, [(1, 0), (1, 60), (1, 60 + 1900 + 1), (2, 5)])
    s = {(r["user_id"], r["session_no"]): (r["n_events"], r["duration_s"])
         for r in sessionize(ev, gap_s=1800).collect()}
    assert s == {(1, 1): (2, 60), (1, 2): (1, 0), (2, 1): (1, 0)}
    r = {r["user_id"]: (r["n_sessions"], r["n_events"], r["max_session_events"],
                        r["total_session_s"])
         for r in session_rollup(ev, gap_s=1800).collect()}
    assert r == {1: (2, 3, 2, 60), 2: (1, 1, 1, 0)}
    # a gap EXACTLY equal to the threshold does NOT split (strict >)
    ev2 = _events(spark, [(1, 0), (1, 1800)])
    assert sessionize(ev2, gap_s=1800).count() == 1


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_saturation_and_novelty_conservation(spark):
    from dronedb_spark.text.corpusstats import (
        _doc_grams,
        novelty_profile,
        saturation_curve,
    )

    docs = _docs(spark, [
        (i, f"s{i % 3}", " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
        for i in range(30)
    ])
    total = _doc_grams(docs).select("gram").distinct().count()
    sat = sorted((r["bucket"], r["n_docs"], r["new_tokens"], r["cum_tokens"])
                 for r in saturation_curve(docs).collect())
    assert sum(r[1] for r in sat) == 30          # every doc in one bucket
    assert sat[-1][3] == sum(r[2] for r in sat)  # cum == running sum
    nov = novelty_profile(docs).collect()
    assert sum(r["n_novel"] for r in nov) == total  # every gram novel once
    first = next(r for r in nov if r["doc_id"] == 0)
    assert first["n_novel"] == first["n_grams"]  # doc 0 is all-novel
    assert first["novel_permille"] == 1000


def test_overlap_df_cap_drops_boilerplate(spark):
    from dronedb_spark.text.corpusstats import cross_source_overlap

    shared = "alpha beta gamma"          # planted: sources A and B only
    boiler = "one two three"             # in every source
    docs = _docs(spark, [
        (0, "A", f"{boiler} x0 {shared}"),
        (1, "B", f"{boiler} x1 {shared}"),
        (2, "C", f"{boiler} x2"),
        (3, "D", f"{boiler} x3"),
    ])
    got = {(r["src_a"], r["src_b"]): r["n_shared"]
           for r in cross_source_overlap(docs, max_gram_sources=2).collect()}
    # only the planted pair survives: 'alpha beta gamma' (1 gram)
    assert got == {("A", "B"): 1}
    # uncapped, the boilerplate gram links every pair
    raw = {(r["src_a"], r["src_b"]): r["n_shared"]
           for r in cross_source_overlap(docs, max_gram_sources=10).collect()}
    assert len(raw) == 6 and raw[("C", "D")] == 1


def test_tfidf_ranking_and_ties(spark):
    from dronedb_spark.text.tfidf import tfidf_topterms

    docs = _docs(spark, [
        (0, "A", "apple apple apple shared shared zz"),
        (1, "B", "banana banana shared zz zz zz"),
    ])
    rows = {(r["source"], r["rank"]): (r["tok"], r["score_micro"])
            for r in tfidf_topterms(docs, k=2).collect()}
    # A: apple tf=3 df=1 -> 3e6; B: zz tf=3 df=2 -> 1.5e6 < banana 2e6
    assert rows[("A", 1)] == ("apple", 3_000_000)
    assert rows[("B", 1)] == ("banana", 2_000_000)
    assert rows[("B", 2)] == ("zz", 1_500_000)


def test_reservoir_consistent_under_growth(spark):
    from dronedb_spark.text.reservoir import reservoir_sample

    docs = _docs(spark, [(i, "s", "t") for i in range(200)]).select(
        "doc_id", "source"
    )
    small = {r["doc_id"] for r in reservoir_sample(docs.filter("doc_id < 100"), n=10).collect()}
    grown = {r["doc_id"] for r in reservoir_sample(docs, n=10).collect()}
    # consistent-hashing property: growing the corpus keeps most of the
    # old sample (evictions only by hash order)
    assert len(small & grown) >= 5
    assert len(grown) == 10


def test_ssjoin_exact_and_prunes(spark):
    """Prefix filtering is EXACT (result == brute force) and actually
    prunes (candidate pairs < all sharing-a-gram pairs)."""
    from pyspark.sql import functions as F

    from dronedb_spark.text.ssjoin import _doc_arrays, jaccard_ssjoin

    base = [f"w{i}" for i in range(30)]
    rows = [(0, " ".join(base)),
            (1, " ".join(base[:24] + [f"x{i}" for i in range(6)])),  # high J
            (2, " ".join(base[:10] + [f"y{i}" for i in range(20)])),  # low J
            (3, " ".join(f"z{i}" for i in range(30)))]               # disjoint
    rows += [(10 + i, " ".join(f"u{i}_{j}" for j in range(25))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]) for r in jaccard_ssjoin(docs, 50).collect()}
    # brute force over the same gram sets
    arrs = _doc_arrays(docs)
    g = arrs.select("doc_id", "n", F.explode("toks").alias("tok"))
    a = g.select(F.col("doc_id").alias("da"), F.col("n").alias("na"), "tok")
    b = g.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"), "tok")
    inter = (
        a.join(b, "tok").filter(F.col("da") < F.col("db"))
        .groupBy("da", "db", "na", "nb").count()
    )
    want = {
        (r["da"], r["db"]) for r in inter.collect()
        if r["count"] * 100 >= 50 * (r["na"] + r["nb"] - r["count"])
    }
    assert got == want and (0, 1) in got and (0, 2) not in got
    # pruning: the prefix-candidate set is strictly smaller than the
    # share-any-gram pair set on this fixture
    from dronedb_spark.text.ssjoin import TAU_PCT  # noqa: F401

    all_sharing = inter.count()
    pre = arrs.select(
        "doc_id", "n",
        F.explode(F.expr(
            "slice(toks, 1, CAST(n - ((n * 50 + 99) DIV 100) + 1 AS INT))"
        )).alias("ptok"))
    pa = pre.select(F.col("doc_id").alias("da"), "ptok")
    pb = pre.select(F.col("doc_id").alias("db"), "ptok")
    cand = pa.join(pb, "ptok").filter(F.col("da") < F.col("db")) \
             .select("da", "db").distinct().count()
    assert cand < all_sharing
