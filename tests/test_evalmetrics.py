"""Exact ROC-AUC + calibration laws (text/evalmetrics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.evalmetrics import calibration_bins, roc_auc


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


def test_auc_perfect_separation_is_one(spark):
    rows = [(0.9 + i / 100.0, True) for i in range(5)] + [
        (0.1 + i / 100.0, False) for i in range(7)
    ]
    r = roc_auc(_scored(spark, rows), F.col("score"), F.col("label")).first()
    assert (r["n_pos"], r["n_neg"]) == (5, 7)
    assert r["auc"] == 1.0
    assert r["num_x2"] == 2 * 5 * 7


def test_auc_reversed_is_zero_and_all_tied_is_half(spark):
    rev = [(0.1, True)] * 3 + [(0.9, False)] * 4
    assert roc_auc(_scored(spark, rev), F.col("score"), F.col("label")).first()[
        "auc"
    ] == 0.0
    tied = [(0.5, True)] * 3 + [(0.5, False)] * 4
    r = roc_auc(_scored(spark, tied), F.col("score"), F.col("label")).first()
    assert r["auc"] == 0.5
    assert r["num_x2"] == 3 * 4  # every pair tied, counted once


def test_auc_hand_computed_with_partial_ties(spark):
    # pos scores {0.3, 0.5}, neg {0.3, 0.4}: pairs (p,n):
    # (0.3,0.3) tie, (0.3,0.4) discordant, (0.5,0.3) conc, (0.5,0.4) conc
    rows = [(0.3, True), (0.5, True), (0.3, False), (0.4, False)]
    r = roc_auc(_scored(spark, rows), F.col("score"), F.col("label")).first()
    assert r["num_x2"] == 2 * 2 + 1
    assert r["auc"] == 5 / 8


def test_calibration_bins_partition_the_corpus(spark):
    rows = [(i / 20.0, i % 3 == 0) for i in range(20)] + [(1.0, True)]
    df = _scored(spark, rows)
    out = calibration_bins(df, F.col("score"), F.col("label")).collect()
    assert sum(r["n"] for r in out) == 21
    assert sum(r["n_pos"] for r in out) == sum(1 for _, l in rows if l)
    by_bin = {r["bin"]: r for r in out}
    # top edge (score == 1.0 → micro 10^6) folds into the last bin
    assert by_bin[9]["n"] == 3  # 0.90, 0.95, 1.00
    assert all(0 <= b <= 9 for b in by_bin)


def test_discretization_defines_ties(spark):
    # scores within the same micro unit are ties by contract
    rows = [(0.1000000001, True), (0.1000000002, False)]
    r = roc_auc(_scored(spark, rows), F.col("score"), F.col("label")).first()
    assert r["auc"] == 0.5
