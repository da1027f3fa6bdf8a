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


def test_thermal_calibration_feeds_formula_registry(spark):
    """Planck raw→°C (raster_analysis.cpp:108-110) produces the T band the
    CELSIUS/KELVIN formulas consume; saturated counts become NULL."""
    import math

    from pyspark.sql import functions as F

    from dronedb_spark.functions.formulas import apply_formula
    from dronedb_spark.raster.thermal import (
        PLANCK_B, PLANCK_F, PLANCK_O, PLANCK_R1, PLANCK_R2, RAW_NODATA,
        calibrate, thermal_raw_df,
    )

    px = calibrate(thermal_raw_df(spark))
    rows = {(r["row"], r["col"]): r for r in px.withColumn(
        "kelvin", apply_formula(px, "KELVIN")).collect()}
    assert rows[(0, 0)]["raw"] == RAW_NODATA and rows[(0, 0)]["T"] is None
    r = rows[(3, 5)]
    expected = PLANCK_B / math.log(
        PLANCK_R1 / (PLANCK_R2 * (r["raw"] + PLANCK_O)) + PLANCK_F) - 273.15
    assert abs(r["T"] - expected) < 1e-9
    assert abs(r["kelvin"] - (expected + 273.15)) < 1e-9
    # physically plausible range for the synthetic scene
    stats = px.agg(F.min("T"), F.max("T")).collect()[0]
    assert 20.0 < stats[0] < stats[1] < 80.0
