"""Winnowing fingerprints (text/winnow.py): the SIGMOD-2003 guarantee,
position independence, boilerplate capping, and the plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.winnow import K, W, winnow_fingerprints, winnow_overlap


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_guarantee_shared_passage(spark):
    """Any shared passage of >= W + K - 1 words must yield a shared
    fingerprint, wherever it sits in either document."""
    passage = "the quick brown fox jumps over"  # exactly W + K - 1 = 6 words
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {passage} gamma delta"),
            (2, f"one two three four five {passage}"),
        ],
    )
    fps = winnow_fingerprints(docs)
    shared = (
        fps.groupBy("fp").agg(F.countDistinct("doc_id").alias("n")).filter("n = 2")
    )
    assert shared.count() >= 1


def test_winnowing_position_shift_invariance(spark):
    """Shifting a document by a prefix changes every k-gram POSITION but
    not the fingerprint set of the shared suffix."""
    body = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = _docs(spark, [(1, body), (2, "p1 p2 p3 " + body)])
    fps = {
        r["doc_id"]: set()
        for r in docs.select("doc_id").collect()
    }
    for r in winnow_fingerprints(docs).collect():
        fps[r["doc_id"]].add(r["fp"])
    # doc 1's entire fingerprint set must survive inside doc 2's
    assert fps[1] <= fps[2]
    assert len(fps[1]) >= 1


def test_winnowing_short_doc_single_window(spark):
    """A doc with 1..W-1 k-grams contributes exactly its overall
    minimum; an empty/too-short doc contributes nothing."""
    docs = _docs(spark, [(1, "a b c"), (2, "a b")])  # 1 gram / 0 grams
    rows = winnow_fingerprints(docs).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1


def test_winnow_overlap_df_cap_drops_boilerplate(spark):
    """A fingerprint present in more than max_df documents must not
    produce pairs (the fan-out bound)."""
    boiler = "same old boilerplate phrase here always"
    docs = _docs(spark, [(i, boiler) for i in range(5)])
    assert winnow_overlap(docs, max_df=5).count() == 10  # 5 choose 2
    assert winnow_overlap(docs, max_df=4).count() == 0  # df=5 > cap


def test_winnow_overlap_plan_shape(spark):
    """No cartesian product; the df-cap aggregation partial-aggregates
    before its shuffle."""
    from dronedb_spark.plans.inspect import has_cartesian, has_partial_aggregation
    from dronedb_spark.suite import load_all

    reg = load_all()
    q = reg["winnow_overlap_pairs"].spark_fn(spark, "/root/testdata/sf0.001")
    assert not has_cartesian(q)
    assert has_partial_aggregation(q)
