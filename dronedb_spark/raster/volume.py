"""Zonal volume with a best-fit base plane — distributed least squares.

Reference: ``volume.cpp:61-66`` (base-plane methods), plane solve at
``volume.cpp:98-123`` (least-squares plane on perimeter pixels).  The
3×3 normal-equation system is assembled from nine perimeter aggregates
(one distributed pass) and solved in closed form via Cramer's rule —
no driver-side matrix library, no collect of pixel data.  The fitted
plane then feeds the same cut/fill aggregation as the flat method.

The post-aggregate arithmetic strings are shared verbatim with the
DuckDB oracle, so the solve is bit-identical across engines
(coordinate sums are exact BIGINTs; z-sums are exact decimals rounded
then cast — see operators/relational.py on decimal→double discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.raster.synth import dem_df, dem_sql
from dronedb_spark.suite import check

# Cramer's rule on M = [[n,sc,sr],[sc,scc,scr],[sr,scr,srr]], rhs [sz,szc,szr]
DET = "(n*(scc*srr - scr*scr) - sc*(sc*srr - scr*sr) + sr*(sc*scr - scc*sr))"
PLANE_A = f"((sz*(scc*srr - scr*scr) - sc*(szc*srr - scr*szr) + sr*(szc*scr - scc*szr)) / {DET})"
PLANE_B = f"((n*(szc*srr - scr*szr) - sz*(sc*srr - scr*sr) + sr*(sc*szr - szc*sr)) / {DET})"
PLANE_C = f"((n*(scc*szr - szc*scr) - sc*(sc*szr - szc*sr) + sz*(sc*scr - scc*sr)) / {DET})"

_ZONE = (70, 115, 70, 115)
_PX_AREA = 0.25


def bestfit_volume(spark: SparkSession, pixels: DataFrame) -> DataFrame:
    r0, r1, c0, c1 = _ZONE
    zone = pixels.filter(
        (F.col("row").between(r0, r1))
        & (F.col("col").between(c0, c1))
        & (F.col("value") != -9999.0)
    )
    perim = zone.filter(
        (F.col("row") == r0) | (F.col("row") == r1) | (F.col("col") == c0) | (F.col("col") == c1)
    )
    sums = perim.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("col").cast("double").alias("sc"),
        F.sum("row").cast("double").alias("sr"),
        F.sum(F.col("col").cast("long") * F.col("col")).cast("double").alias("scc"),
        F.sum(F.col("col").cast("long") * F.col("row")).cast("double").alias("scr"),
        F.sum(F.col("row").cast("long") * F.col("row")).cast("double").alias("srr"),
        F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4).cast("double").alias("sz"),
        F.round(F.sum((F.col("value") * F.col("col")).cast("decimal(38,10)")), 4)
        .cast("double")
        .alias("szc"),
        F.round(F.sum((F.col("value") * F.col("row")).cast("decimal(38,10)")), 4)
        .cast("double")
        .alias("szr"),
    )
    plane = sums.selectExpr(
        f"{PLANE_A} AS pa", f"{PLANE_B} AS pb", f"{PLANE_C} AS pc"
    )
    j = zone.crossJoin(F.broadcast(plane))
    base = F.col("pa") + F.col("pb") * F.col("col") + F.col("pc") * F.col("row")
    cut = F.round(
        F.sum((F.greatest(F.col("value") - base, F.lit(0.0)) * _PX_AREA).cast("decimal(38,10)")), 4
    ).cast("double")
    fill = F.round(
        F.sum((F.greatest(base - F.col("value"), F.lit(0.0)) * _PX_AREA).cast("decimal(38,10)")), 4
    ).cast("double")
    return j.groupBy("pa", "pb", "pc").agg(cut.alias("cut"), fill.alias("fill"))


@check(
    "zonal_volume_bestfit",
    oracle=f"""
        WITH px AS ({dem_sql("duckdb")}),
        zone AS (SELECT * FROM px WHERE row BETWEEN 70 AND 115 AND col BETWEEN 70 AND 115
                 AND value <> -9999.0),
        sums AS (
            SELECT CAST(COUNT(1) AS DOUBLE) AS n,
                   CAST(SUM(col) AS DOUBLE) AS sc,
                   CAST(SUM(row) AS DOUBLE) AS sr,
                   CAST(SUM(CAST(col AS BIGINT) * col) AS DOUBLE) AS scc,
                   CAST(SUM(CAST(col AS BIGINT) * row) AS DOUBLE) AS scr,
                   CAST(SUM(CAST(row AS BIGINT) * row) AS DOUBLE) AS srr,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) AS sz,
                   CAST(ROUND(SUM(CAST(value * col AS DECIMAL(38,10))), 4) AS DOUBLE) AS szc,
                   CAST(ROUND(SUM(CAST(value * row AS DECIMAL(38,10))), 4) AS DOUBLE) AS szr
            FROM zone WHERE row = 70 OR row = 115 OR col = 70 OR col = 115),
        plane AS (SELECT {PLANE_A} AS pa, {PLANE_B} AS pb, {PLANE_C} AS pc FROM sums)
        SELECT pa, pb, pc,
               CAST(ROUND(SUM(CAST(GREATEST(value - (pa + pb*col + pc*row), 0.0) * 0.25
                    AS DECIMAL(38,10))), 4) AS DOUBLE) AS cut,
               CAST(ROUND(SUM(CAST(GREATEST((pa + pb*col + pc*row) - value, 0.0) * 0.25
                    AS DECIMAL(38,10))), 4) AS DOUBLE) AS fill
        FROM zone, plane GROUP BY pa, pb, pc""",
)
def q_bestfit_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bestfit_volume(spark, dem_df(spark))


# ------------------------------------------------------------------ polygon
# R3/A11 with a TRUE polygon mask (volume.cpp:277-280 rasterizes the
# polygon via GDAL; our rasterization IS the point-in-polygon predicate,
# evaluated as closed-form column arithmetic — a crossing-number test
# against the polygon's edges, no geometry library).  Perimeter pixels
# (volume.cpp:292-321) are mask pixels with a 4-neighbor OUTSIDE the
# mask — since membership is a formula, neighbor membership needs NO
# join, just the predicate evaluated at shifted coordinates.

_POLY = [(30.0, 25.0), (110.0, 45.0), (70.0, 105.0)]  # (x=col, y=row)


def _pip_sql(px: str, py: str) -> str:
    """Crossing-number point-in-polygon as engine-portable SQL."""
    terms = []
    n = len(_POLY)
    for i in range(n):
        xa, ya = _POLY[i]
        xb, yb = _POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({ya} > {py}) <> ({yb} > {py}))"
            f" AND ({px} < ({xb} - {xa}) * ({py} - {ya}) / ({yb} - {ya}) + {xa})"
            f" THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def _polygon_volume_sql(dialect: str) -> str:
    x, y = "CAST(col AS DOUBLE)", "CAST(row AS DOUBLE)"
    inside = _pip_sql(x, y)
    on_perim = (
        f"NOT ({_pip_sql(x, f'({y} - 1.0)')} AND {_pip_sql(x, f'({y} + 1.0)')}"
        f" AND {_pip_sql(f'({x} - 1.0)', y)} AND {_pip_sql(f'({x} + 1.0)', y)})"
    )
    return f"""
    WITH px AS ({dem_sql(dialect)}),
    zone AS (
        SELECT row, col, value, {on_perim} AS on_perim
        FROM px WHERE {inside} AND value <> -9999.0),
    bases AS (
        SELECT 'flat' AS method, 205.0 AS base FROM (SELECT 1) one
        UNION ALL
        SELECT 'lowest_perimeter' AS method, MIN(value) AS base
        FROM zone WHERE on_perim
        UNION ALL
        SELECT 'average_perimeter' AS method,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) / COUNT(1) AS base
        FROM zone WHERE on_perim)
    SELECT method, base,
           CAST(ROUND(SUM(CAST(GREATEST(value - base, 0.0) * 0.25 AS DECIMAL(38,10))), 4) AS DOUBLE) AS cut,
           CAST(ROUND(SUM(CAST(GREATEST(base - value, 0.0) * 0.25 AS DECIMAL(38,10))), 4) AS DOUBLE) AS fill,
           CAST(ROUND(SUM(CAST(GREATEST(value - base, 0.0) * 0.25 AS DECIMAL(38,10)))
               - SUM(CAST(GREATEST(base - value, 0.0) * 0.25 AS DECIMAL(38,10))), 4) AS DOUBLE) AS net,
           CAST(COUNT(1) AS DOUBLE) * 0.25 AS area2d
    FROM zone CROSS JOIN bases
    GROUP BY method, base ORDER BY method"""


@check("zonal_volume_polygon", oracle=_polygon_volume_sql("duckdb"))
def q_polygon_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut/fill over a true polygon mask, base methods flat /
    lowest_perimeter / average_perimeter (volume.cpp:61-66) — the mask
    and its perimeter are pure predicates, so the whole operator is one
    scan + one tiny base aggregate + one grouped aggregate."""
    return spark.sql(_polygon_volume_sql("spark"))
