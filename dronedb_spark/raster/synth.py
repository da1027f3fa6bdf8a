"""Deterministic synthetic rasters as pixel DataFrames.

The reference's raster analytics (SURVEY §2.8) operate on GDAL datasets;
our engine's representation is a *pixels table* (row, col, value | band
columns) — the form that distributes: partitionable by tile, prunable by
row/col range predicates, aggregable without any raster library.

The generators below use ONLY +,-,*,/,% and GREATEST over doubles, so the
same text evaluates bit-identically in Spark SQL and DuckDB — the
cross-engine determinism the oracle parity depends on (no exp/trig).
Every value expression is anchored on the DOUBLE-typed ``rowd``/``cold``
columns: Spark parses bare fractional literals as DECIMAL (whose limited
scale silently truncates chained arithmetic), but decimal⊕double promotes
to double in both engines, so seeding the expressions with doubles keeps
all arithmetic in IEEE doubles everywhere.

DEM: 128×128, inclined base plane + two paraboloid mounds + a nodata
patch (value −9999, rows 5-10 × cols 100-110).
MS:  64×64, five bands R,G,B,N,Re in reflectance range, nodata holes in R
     where (row*64+col) % 37 == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEM_W = 128
NODATA = -9999.0

_GRID = """(SELECT CAST((id - (id % {w})) / {w} AS INT) AS row,
                  CAST(id % {w} AS INT) AS col,
                  CAST((id - (id % {w})) / {w} AS DOUBLE) AS rowd,
                  CAST(id % {w} AS DOUBLE) AS cold
           FROM {ids}) g"""

_DEM_BODY = """
SELECT row, col,
       CASE WHEN row >= 5 AND row <= 10 AND col >= 100 AND col <= 110 THEN -9999.0
            ELSE 200.0 + 0.05 * rowd + 0.03 * cold
                 + 60.0 * GREATEST(0.0 * rowd, 1.0 - ((rowd - 40.0) * (rowd - 40.0)
                                             + (cold - 50.0) * (cold - 50.0)) / 400.0)
                 + 45.0 * GREATEST(0.0 * rowd, 1.0 - ((rowd - 90.0) * (rowd - 90.0)
                                             + (cold - 90.0) * (cold - 90.0)) / 300.0)
       END AS value
FROM {grid}
"""

MS_W = 64

_MS_BODY = """
SELECT row, col,
       CASE WHEN ((row * 64 + col) % 37) = 0 THEN -9999.0
            ELSE 0.1 + ((rowd * 31.0 + cold * 17.0) % 100.0) / 250.0 END AS R,
       0.15 + ((rowd * 13.0 + cold * 29.0) % 100.0) / 250.0 AS G,
       0.05 + ((rowd * 7.0 + cold * 23.0) % 100.0) / 250.0 AS B,
       0.2 + ((rowd * 19.0 + cold * 11.0) % 100.0) / 200.0 AS N,
       0.18 + ((rowd * 5.0 + cold * 3.0) % 100.0) / 220.0 AS Re
FROM {grid}
"""


def _ids(dialect: str, n: int) -> str:
    return f"range(0, {n})" if dialect == "spark" else f"(SELECT range AS id FROM range({n}))"


def dem_sql(dialect: str) -> str:
    """DEM pixel-table SELECT for 'spark' or 'duckdb'."""
    grid = _GRID.format(w=DEM_W, ids=_ids(dialect, DEM_W * DEM_W))
    return _DEM_BODY.format(grid=grid)


def ms_sql(dialect: str) -> str:
    grid = _GRID.format(w=MS_W, ids=_ids(dialect, MS_W * MS_W))
    return _MS_BODY.format(grid=grid)


def dem_df(spark: SparkSession) -> DataFrame:
    from dronedb_spark.tables import _tune_session

    _tune_session(spark)
    return spark.sql(dem_sql("spark"))


def ms_df(spark: SparkSession) -> DataFrame:
    return spark.sql(ms_sql("spark"))

TH_W = 64

_TH_BODY = """
SELECT row, col,
       CASE WHEN ((row * 64 + col) % 41) = 0 THEN -9999.0
            ELSE -5.0 + ((rowd * 7.0 + cold * 13.0) % 85.0) END AS T
FROM {grid}
"""


def thermal_sql(dialect: str) -> str:
    """Thermal raster (°C band) for CELSIUS/KELVIN formulas."""
    grid = _GRID.format(w=TH_W, ids=_ids(dialect, TH_W * TH_W))
    return _TH_BODY.format(grid=grid)


def thermal_df(spark: SparkSession) -> DataFrame:
    return spark.sql(thermal_sql("spark"))


N_RASTERS = 8

_MULTI_GRID = """(SELECT CAST((id - (id % {per})) / {per} AS INT) AS raster_id,
                        CAST(((id % {per}) - (id % {w})) / {w} AS INT) AS row,
                        CAST(id % {w} AS INT) AS col,
                        CAST((id - (id % {per})) / {per} AS DOUBLE) AS rid,
                        CAST(((id % {per}) - (id % {w})) / {w} AS DOUBLE) AS rowd,
                        CAST(id % {w} AS DOUBLE) AS cold
                 FROM {ids}) g"""

_MULTI_DEM_BODY = """
SELECT raster_id, row, col,
       CASE WHEN row >= 5 AND row <= 10 AND col >= 100 AND col <= 110 THEN -9999.0
            ELSE 150.0 + rid * 12.5 + 0.05 * rowd + 0.03 * cold
                 + 40.0 * GREATEST(0.0 * rowd, 1.0 - ((rowd - 40.0 - rid * 4.0) * (rowd - 40.0 - rid * 4.0)
                          + (cold - 50.0 + rid * 3.0) * (cold - 50.0 + rid * 3.0)) / 400.0) END AS value
FROM {grid}
"""


def multi_dem_sql(dialect: str) -> str:
    """A CATALOG of DEMs as one pixel table: raster_id × 128×128 grids,
    each with its own base elevation and mound position — the shape of a
    1000s-of-rasters deployment where per-raster analytics run as ONE
    grouped pass, not a per-file loop."""
    per = DEM_W * DEM_W
    grid = _MULTI_GRID.format(per=per, w=DEM_W, ids=_ids(dialect, N_RASTERS * per))
    return _MULTI_DEM_BODY.format(grid=grid)


def multi_dem_df(spark: SparkSession) -> DataFrame:
    from dronedb_spark.tables import _tune_session

    _tune_session(spark)
    return spark.sql(multi_dem_sql("spark"))
