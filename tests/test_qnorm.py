"""Quantile-normalization laws (text/qnorm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.qnorm import quantile_normalize


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, g string, s bigint")


def _norm(spark, rows):
    return quantile_normalize(_scored(spark, rows), "g", F.col("s")).collect()


def test_every_row_maps_exactly_once(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", (i * 37) % 100) for i in range(40)]
    out = _norm(spark, rows)
    assert len(out) == 40
    assert len({r["doc_id"] for r in out}) == 40


def test_shifted_group_maps_onto_global_shape(spark):
    # group a: scores 1..10; group b: the same shape shifted +1000 —
    # after normalization both groups land on identical value SETS
    rows = [(i, "a", i) for i in range(1, 11)] + [
        (100 + i, "b", 1000 + i) for i in range(1, 11)
    ]
    out = _norm(spark, rows)
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["norm_score_micro"])
    assert sorted(by_g["a"]) == sorted(by_g["b"])
    # rank order is preserved within each group
    a = sorted((r["rank_in_group"], r["norm_score_micro"])
               for r in out if r["g"] == "a")
    assert [v for _, v in a] == sorted(v for _, v in a)


def test_identity_when_one_group(spark):
    # a single group IS the global distribution with distinct scores:
    # normalization must be the identity
    rows = [(i, "only", i * 10) for i in range(1, 21)]
    out = _norm(spark, rows)
    assert all(r["norm_score_micro"] == r["score_micro"] for r in out)


def test_top_rank_maps_to_global_max(spark):
    rows = [(1, "a", 5), (2, "a", 7), (3, "b", 900), (4, "b", 950)]
    out = {r["doc_id"]: r["norm_score_micro"] for r in _norm(spark, rows)}
    # both groups' top documents map to the global maximum bucket
    assert out[2] == 950 and out[4] == 950
