"""Unit tests for the band-algebra formula registry
(vegetation.cpp:85-113, 214-325 semantics)."""

import pytest
from pyspark.sql import functions as F

from dronedb_spark.functions.formulas import FORMULAS, apply_formula


@pytest.fixture(scope="module")
def px(spark):
    return spark.createDataFrame(
        [
            # R,    G,    B,    N,    Re
            (0.1, 0.2, 0.05, 0.6, 0.3),  # vegetated
            (0.4, 0.5, 0.45, 0.2, 0.25),  # water-ish
            (-9999.0, 0.5, 0.45, 0.2, 0.25),  # nodata in R
            (0.1, 0.0, 0.2, -0.1, 0.3),  # NDVI denom == 0 → ε-guard
        ],
        ["R", "G", "B", "N", "Re"],
    )


def test_all_formulas_registered():
    # vegetation.cpp:85-113 registers 18: 4 RGB + 5 NIR + NDRE + 6 phase-1 + 2 thermal
    assert len(FORMULAS) == 18


def test_ndvi_values(px):
    vals = [r[0] for r in px.select(apply_formula(px, "NDVI")).collect()]
    assert vals[0] == pytest.approx((0.6 - 0.1) / (0.6 + 0.1))
    assert vals[1] == pytest.approx((0.2 - 0.4) / (0.2 + 0.4))
    assert vals[2] is None  # nodata propagation
    assert vals[3] is None  # ε-guarded division


def test_kelvin(px):
    df = px.withColumn("T", F.col("R"))
    vals = [r[0] for r in df.select(apply_formula(df, "KELVIN")).collect()]
    assert vals[0] == pytest.approx(0.1 + 273.15)
    assert vals[2] is None  # nodata T


def test_evi(px):
    vals = [r[0] for r in px.select(apply_formula(px, "EVI")).collect()]
    r, g, b, n = 0.1, 0.2, 0.05, 0.6
    assert vals[0] == pytest.approx(2.5 * (n - r) / (n + 6 * r - 7.5 * b + 1))
