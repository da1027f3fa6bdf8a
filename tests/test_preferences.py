"""Preference-pair laws (text/preferences.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.preferences import preference_pairs


def _scored(spark, rows):
    return spark.createDataFrame(rows, "source string, doc_id bigint, s bigint")


def _pairs(spark, rows, margin=0):
    return preference_pairs(
        _scored(spark, rows), "source", F.col("s"), min_margin_micro=margin
    ).collect()


def test_top_pairs_with_bottom_rank_symmetric(spark):
    rows = [("a", i, i * 100_000) for i in range(1, 7)]  # scores 100k..600k
    got = {
        (r["pair_rank"], r["chosen_id"], r["rejected_id"], r["margin_micro"])
        for r in _pairs(spark, rows)
    }
    # best pairs worst, 2nd best pairs 2nd worst, ...
    assert got == {
        (1, 6, 1, 500_000),
        (2, 5, 2, 300_000),
        (3, 4, 3, 100_000),
    }


def test_odd_group_middle_sits_out(spark):
    rows = [("a", i, i * 100_000) for i in range(1, 6)]  # n = 5
    got = _pairs(spark, rows)
    assert len(got) == 2
    assert {r["chosen_id"] for r in got} == {5, 4}
    assert {r["rejected_id"] for r in got} == {1, 2}
    assert all(r["chosen_id"] != 3 and r["rejected_id"] != 3 for r in got)


def test_margin_floor_drops_close_pairs(spark):
    rows = [("a", 1, 100_000), ("a", 2, 150_000),
            ("a", 3, 900_000), ("a", 4, 950_000)]
    got = _pairs(spark, rows, margin=200_000)
    # pairs: (4 vs 1, margin 850k) keeps; (3 vs 2, 750k) keeps
    assert len(got) == 2
    got2 = _pairs(spark, rows, margin=800_000)
    assert [(r["chosen_id"], r["rejected_id"]) for r in got2] == [(4, 1)]


def test_groups_never_cross(spark):
    rows = [("a", 1, 1), ("a", 2, 999_999), ("b", 3, 1), ("b", 4, 999_999)]
    got = _pairs(spark, rows)
    assert {(r["source"], r["chosen_id"], r["rejected_id"]) for r in got} == {
        ("a", 2, 1), ("b", 4, 3),
    }
