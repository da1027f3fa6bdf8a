"""Round-13 wave-5 operators: Mann-Whitney U, chi-square independence,
trimmed/winsorized location."""

from __future__ import annotations

import math

import pytest

from dronedb_spark.tables import load
from dronedb_spark.text.nonparam import (
    chisq_lang_source,
    mannwhitney_u,
    trimmed_location,
)


def test_mwu_conservation_law(spark, sf_dir):
    """U_A + U_B == n_A * n_B (in half units: u2_a + u2_b == 2 n_a n_b)."""
    row = mannwhitney_u(load(spark, sf_dir, "documents")).collect()[0]
    assert row["u2_a"] + row["u2_b"] == 2 * row["n_a"] * row["n_b"]
    assert math.isfinite(row["z"])


def test_mwu_hand_fixture(spark):
    """A = {1, 2}, B = {2, 3} under the (a > b) + ties/2 convention:
    U_A = (2==2)/2 = 0.5 -> u2_a = 1; U_B = (2>1) + (3>1) + (3>2) +
    (2==2)/2 = 3.5 -> u2_b = 7."""
    rows = [
        (0, "src0", 1), (1, "src0", 2),      # half A
        (2, "src10", 2), (3, "src10", 3),    # half B
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    row = mannwhitney_u(docs).collect()[0]
    assert (row["n_a"], row["n_b"]) == (2, 2)
    assert row["u2_a"] == 1 and row["u2_b"] == 7


def test_mwu_detects_planted_shift(spark):
    """Half B shifted up by 1000 -> U_A = 0, z strongly negative."""
    rows = [(i, "src0", 100 + i) for i in range(50)] + [
        (100 + i, "src10", 1100 + i) for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    row = mannwhitney_u(docs).collect()[0]
    assert row["u2_a"] == 0
    assert row["z"] < -5


def test_chisq_hand_2x2(spark):
    """2x2 with counts [[10, 20], [20, 10]]: chi2 = n(ad-bc)^2 /
    (r1 r2 c1 c2) = 60*(100-400)^2/(30*30*30*30) = 6.666..."""
    rows = (
        [(i, "s0", "en", 1) for i in range(10)]
        + [(100 + i, "s1", "en", 1) for i in range(20)]
        + [(200 + i, "s0", "de", 1) for i in range(20)]
        + [(300 + i, "s1", "de", 1) for i in range(10)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long"
    )
    row = chisq_lang_source(docs).collect()[0]
    assert (row["n"], row["n_rows"], row["n_cols"], row["dof"]) == (60, 2, 2, 1)
    assert row["chi2"] == pytest.approx(60 * (10 * 10 - 20 * 20) ** 2 / 30**4, abs=1e-6)


def test_chisq_fixture_nonnegative(spark, sf_dir):
    row = chisq_lang_source(load(spark, sf_dir, "documents")).collect()[0]
    assert row["chi2"] >= 0
    assert row["dof"] == (row["n_rows"] - 1) * (row["n_cols"] - 1)


def test_trimmed_hand_fixture(spark):
    """10 values 0..900 step 100 in one source, 10% trim -> drop 0 and
    900; trimmed mean = mean(100..800) = 450; winsorized clamps 0->100,
    900->800 -> mean = (100 + 3600 + 800) / 10 = 450."""
    rows = [(i, "s", 100 * i) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    row = trimmed_location(docs).collect()[0]
    assert (row["lo_cut"], row["hi_cut"]) == (100, 800)
    assert row["trimmed_mean_micro"] == 450 * 1_000_000
    assert row["winsor_mean_micro"] == 450 * 1_000_000


def test_trimmed_bounds(spark, sf_dir):
    for r in trimmed_location(load(spark, sf_dir, "documents")).collect():
        assert r["lo_cut"] <= r["hi_cut"]
        assert r["lo_cut"] * 1_000_000 <= r["trimmed_mean_micro"] <= r["hi_cut"] * 1_000_000
        assert r["lo_cut"] * 1_000_000 <= r["winsor_mean_micro"] <= r["hi_cut"] * 1_000_000
