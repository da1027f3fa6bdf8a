"""Raster analytics as distributed aggregations (SURVEY A9-A15, R1-R5).

Reference kernels re-expressed over the pixels table:
  * area stats (raster_analysis.cpp:318-507): ROI filter + min/max/mean/
    population-stddev/EXACT median/pixel count, nodata excluded.  Mean and
    stddev are computed from DECIMAL sums (order-independent across
    partitions); the median is Spark's exact sort-based ``percentile``.
  * zonal volume (volume.cpp:140-463): cut = Σ max(z−base,0)·pxArea,
    fill = Σ max(base−z,0)·pxArea over the masked region, for base-plane
    methods flat / average_perimeter (lowest_perimeter and best_fit are the
    same aggregate with a different base scalar).
  * elevation profile (raster_profile.cpp:84-180): N interpolated samples
    along a segment joined to the pixel grid (an equi-join on (row,col) —
    broadcast of the tiny sample table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.raster.synth import dem_df, dem_sql, ms_df, ms_sql
from dronedb_spark.functions.formulas import apply_formula
from dronedb_spark.suite import check

NODATA = -9999.0


def area_stats(pixels: DataFrame, r0: int, r1: int, c0: int, c1: int) -> DataFrame:
    """A9/R2: stats over a pixel ROI, nodata excluded, exact median."""
    roi = pixels.filter(
        (F.col("row").between(r0, r1)) & (F.col("col").between(c0, c1)) & (F.col("value") != NODATA)
    )
    s = F.sum(F.col("value").cast("decimal(38,10)"))
    s2 = F.sum((F.col("value") * F.col("value")).cast("decimal(38,10)"))
    n = F.count(F.lit(1))
    return roi.agg(
        n.alias("pixel_count"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        (F.round(s, 4).cast("double") / n).alias("v_mean"),
        F.sqrt(
            (F.round(s2, 4).cast("double")
             - F.round(s, 4).cast("double") * F.round(s, 4).cast("double") / n) / n
        ).alias("v_stddev"),
        F.expr("percentile(value, 0.5)").alias("v_median"),
    )


def zonal_volume(pixels: DataFrame, r0: int, r1: int, c0: int, c1: int, px_area: float) -> DataFrame:
    """A11/R3 for a rectangular zone, methods flat(z=205) and
    average_perimeter.  The perimeter scalar is itself a distributed
    aggregate; cut/fill accumulate as decimals for order independence."""
    zone = pixels.filter(
        (F.col("row").between(r0, r1)) & (F.col("col").between(c0, c1)) & (F.col("value") != NODATA)
    )
    perim = zone.filter(
        (F.col("row") == r0) | (F.col("row") == r1) | (F.col("col") == c0) | (F.col("col") == c1)
    )
    base_avg = (
        perim.agg(
            (F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4).cast("double")
             / F.count(F.lit(1))).alias("base")
        )
        .withColumn("method", F.lit("average_perimeter"))
    )
    base_flat = zone.limit(1).select(F.lit(205.0).alias("base"), F.lit("flat").alias("method"))
    bases = base_flat.unionByName(base_avg)

    j = zone.crossJoin(F.broadcast(bases))
    cut = F.sum((F.greatest(F.col("value") - F.col("base"), F.lit(0.0)) * px_area).cast("decimal(38,10)"))
    fill = F.sum((F.greatest(F.col("base") - F.col("value"), F.lit(0.0)) * px_area).cast("decimal(38,10)"))
    return (
        j.groupBy("method", "base")
        .agg(
            F.round(cut, 4).cast("double").alias("cut"),
            F.round(fill, 4).cast("double").alias("fill"),
            F.round(cut - fill, 4).cast("double").alias("net"),
            (F.count(F.lit(1)) * px_area).alias("area2d"),
        )
        .select("method", "base", "cut", "fill", "net", "area2d")
        .orderBy("method")
    )


def elevation_profile(spark: SparkSession, pixels: DataFrame, n_samples: int = 64) -> DataFrame:
    """A15/R4: nearest-pixel samples along the (10,10)→(120,120) segment.

    Plan: Spark cannot build-left for a left-outer join, so a broadcast
    hint on the samples side of ``samples LEFT JOIN pixels`` is IGNORED
    and the whole pixel table would shuffle on (row,col) to answer a
    ≤4096-row profile.  Instead: left-semi filter the pixels under a
    broadcast of the sample grid (build-right, shuffle-free — the pixel
    table streams through untouched), then left-outer join the ≤n_samples
    hit rows back, broadcast (build-right is supported for left-outer).
    Zero exchanges on the pixel side at any scale."""
    samples = spark.range(n_samples).select(
        F.col("id").cast("int").alias("i"),
        F.floor(10.0 + 110.0 * F.col("id") / (n_samples - 1) + 0.5).cast("int").alias("row"),
        F.floor(10.0 + 110.0 * F.col("id") / (n_samples - 1) + 0.5).cast("int").alias("col"),
    )
    hits = pixels.join(F.broadcast(samples.select("row", "col")), ["row", "col"], "left_semi")
    j = samples.join(F.broadcast(hits), ["row", "col"], "left")
    return j.select(
        "i",
        "row",
        "col",
        F.when(F.col("value") == NODATA, None).otherwise(F.col("value")).alias("elev"),
    ).orderBy("i")


# ---------------------------------------------------------------- checks

_ROI = (20, 110, 20, 110)


@check(
    "raster_area_stats",
    oracle=f"""
        WITH px AS ({dem_sql("duckdb")}),
        roi AS (SELECT * FROM px WHERE row BETWEEN 20 AND 110 AND col BETWEEN 20 AND 110
                AND value <> -9999.0)
        SELECT CAST(COUNT(1) AS BIGINT) AS pixel_count,
               MIN(value) AS v_min,
               MAX(value) AS v_max,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) / COUNT(1) AS v_mean,
               sqrt((CAST(ROUND(SUM(CAST(value * value AS DECIMAL(38,10))), 4) AS DOUBLE)
                     - CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE)
                       * CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) / COUNT(1)) / COUNT(1)) AS v_stddev,
               quantile_cont(value, 0.5) AS v_median
        FROM roi""",
)
def q_area_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return area_stats(dem_df(spark), *_ROI)


@check(
    "zonal_volume_cutfill",
    oracle=f"""
        WITH px AS ({dem_sql("duckdb")}),
        zone AS (SELECT * FROM px WHERE row BETWEEN 70 AND 115 AND col BETWEEN 70 AND 115
                 AND value <> -9999.0),
        bases AS (
            SELECT 'flat' AS method, 205.0 AS base
            UNION ALL
            SELECT 'average_perimeter' AS method,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) / COUNT(1) AS base
            FROM zone WHERE row = 70 OR row = 115 OR col = 70 OR col = 115
        )
        SELECT method, base,
               CAST(ROUND(SUM(CAST(GREATEST(value - base, 0.0) * 0.25 AS DECIMAL(38,10))), 4) AS DOUBLE) AS cut,
               CAST(ROUND(SUM(CAST(GREATEST(base - value, 0.0) * 0.25 AS DECIMAL(38,10))), 4) AS DOUBLE) AS fill,
               CAST(ROUND(SUM(CAST(GREATEST(value - base, 0.0) * 0.25 AS DECIMAL(38,10)))
                   - SUM(CAST(GREATEST(base - value, 0.0) * 0.25 AS DECIMAL(38,10))), 4) AS DOUBLE) AS net,
               CAST(COUNT(1) AS DOUBLE) * 0.25 AS area2d
        FROM zone, bases
        GROUP BY method, base ORDER BY method""",
)
def q_zonal_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zonal_volume(dem_df(spark), 70, 115, 70, 115, 0.25)


@check(
    "elevation_profile",
    oracle=f"""
        WITH px AS ({dem_sql("duckdb")}),
        samples AS (
            SELECT CAST(range AS INT) AS i,
                   CAST(floor(10.0 + 110.0 * range / 63 + 0.5) AS INT) AS row,
                   CAST(floor(10.0 + 110.0 * range / 63 + 0.5) AS INT) AS col
            FROM range(64))
        SELECT s.i, s.row, s.col,
               CASE WHEN p.value = -9999.0 THEN NULL ELSE p.value END AS elev
        FROM samples s LEFT JOIN px p ON s.row = p.row AND s.col = p.col
        ORDER BY s.i""",
)
def q_elevation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return elevation_profile(spark, dem_df(spark))


@check(
    "formula_ndvi_vari_stats",
    oracle=f"""
        WITH px AS ({ms_sql("duckdb")}),
        f AS (
            SELECT
                CASE WHEN R = -9999.0 THEN NULL
                     WHEN abs(N + R) < 1e-10 THEN NULL
                     ELSE (N - R) / (N + R) END AS ndvi,
                CASE WHEN R = -9999.0 THEN NULL
                     WHEN abs(G + R - B) < 1e-10 THEN NULL
                     ELSE (G - R) / (G + R - B) END AS vari
            FROM px)
        SELECT CAST(COUNT(ndvi) AS BIGINT) AS n_valid,
               MIN(ndvi) AS ndvi_min, MAX(ndvi) AS ndvi_max,
               CAST(ROUND(SUM(CAST(ndvi AS DECIMAL(38,12))), 6) AS DOUBLE) / COUNT(ndvi) AS ndvi_mean,
               MIN(vari) AS vari_min, MAX(vari) AS vari_max
        FROM f""",
)
def q_formula_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formula engine over the multispectral grid: NDVI + VARI with
    reference nodata/ε semantics (vegetation.cpp:243-325)."""
    px = ms_df(spark)
    f = px.select(
        apply_formula(px, "NDVI").alias("ndvi"), apply_formula(px, "VARI").alias("vari")
    )
    return f.agg(
        F.count("ndvi").alias("n_valid"),
        F.min("ndvi").alias("ndvi_min"),
        F.max("ndvi").alias("ndvi_max"),
        (F.round(F.sum(F.col("ndvi").cast("decimal(38,12)")), 6).cast("double")
         / F.count("ndvi")).alias("ndvi_mean"),
        F.min("vari").alias("vari_min"),
        F.max("vari").alias("vari_max"),
    )


def _formula_sweep_sql(dialect: str) -> str:
    """Long-format stats for every rational formula (vNDVI's pow excluded —
    cross-library pow is not bit-reproducible) over the MS + thermal grids.
    The formula CASE expressions are shared verbatim with the oracle
    (functions/formulas.py:formula_case_sql)."""
    from dronedb_spark.functions.formulas import FORMULA_SQL, formula_case_sql
    from dronedb_spark.raster.synth import ms_sql, thermal_sql

    parts = []
    for fid, (_, _, bands) in FORMULA_SQL.items():
        src = "th" if bands == "T" else "ms"
        parts.append(
            f"""SELECT '{fid}' AS formula,
                   CAST(COUNT(f) AS BIGINT) AS n_valid,
                   MIN(f) AS f_min, MAX(f) AS f_max,
                   CAST(ROUND(SUM(CAST(f AS DECIMAL(38,12))), 6) AS DOUBLE) / COUNT(f) AS f_mean
            FROM (SELECT {formula_case_sql(fid)} AS f FROM {src}) t_{fid}"""
        )
    body = "\nUNION ALL\n".join(parts)
    return f"WITH ms AS ({ms_sql(dialect)}), th AS ({thermal_sql(dialect)})\n{body}"


@check("formula_engine_sweep", oracle=_formula_sweep_sql("duckdb"))
def q_formula_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 17 rational formulas of the registry (vegetation.cpp:85-113)
    with nodata/ε parity, as one long-format stats query.

    One-pass plan: every formula over a source grid is computed as a
    column in a SINGLE projection, aggregated in ONE multi-aggregate pass
    (4 aggregates × formula), then pivoted to long format by exploding
    the 1-row result — one scan + one reduce per source table, versus a
    UNION ALL of per-formula aggregates that rescans the grid 17 times
    (the oracle keeps that shape; results are identical)."""
    from dronedb_spark.functions.formulas import FORMULA_SQL, formula_case_sql
    from dronedb_spark.raster.synth import ms_sql, thermal_sql

    out = None
    for src_sql, want_thermal in ((ms_sql("spark"), False), (thermal_sql("spark"), True)):
        fids = [
            fid
            for fid, (_, _, bands) in FORMULA_SQL.items()
            if (bands == "T") == want_thermal
        ]
        if not fids:
            continue
        grid = spark.sql(src_sql)
        vals = grid.select(*[F.expr(formula_case_sql(fid)).alias(fid) for fid in fids])
        aggs = []
        for fid in fids:
            aggs += [
                F.count(F.col(fid)).alias(f"n_{fid}"),
                F.min(F.col(fid)).alias(f"min_{fid}"),
                F.max(F.col(fid)).alias(f"max_{fid}"),
                F.round(F.sum(F.col(fid).cast("decimal(38,12)")), 6)
                .cast("double")
                .alias(f"s_{fid}"),
            ]
        row = vals.agg(*aggs)
        long = row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(fid).alias("formula"),
                            F.col(f"n_{fid}").alias("n_valid"),
                            F.col(f"min_{fid}").alias("f_min"),
                            F.col(f"max_{fid}").alias("f_max"),
                            (F.col(f"s_{fid}") / F.col(f"n_{fid}")).alias("f_mean"),
                        )
                        for fid in fids
                    ]
                )
            ).alias("s")
        ).select("s.*")
        out = long if out is None else out.unionByName(long)
    return out


@check(
    "raster_point_query",
    oracle=f"""
        WITH px AS ({dem_sql("duckdb")})
        SELECT row, col, value,
               100000.0 + col * 0.5 AS geo_x,
               5000000.0 - row * 0.5 AS geo_y
        FROM px
        WHERE (row, col) IN ((40, 50), (90, 90), (7, 105), (0, 0))
        ORDER BY row, col""",
)
def q_raster_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 (raster_analysis.cpp:180-316): pixel value lookup + affine
    pixel→geo transform (geotransform gt = [100000, 0.5, 0, 5000000, 0,
    -0.5]); the nodata patch row (7,105) comes back as −9999 exactly as
    the reference reports it before thermal conversion."""
    px = dem_df(spark)
    pts = [(40, 50), (90, 90), (7, 105), (0, 0)]
    cond = None
    for r, c in pts:
        this = (F.col("row") == r) & (F.col("col") == c)
        cond = this if cond is None else (cond | this)
    return (
        px.filter(cond)
        .select(
            "row",
            "col",
            "value",
            (100000.0 + F.col("col") * 0.5).alias("geo_x"),
            (5000000.0 - F.col("row") * 0.5).alias("geo_y"),
        )
        .orderBy("row", "col")
    )


def _band_stats_sql(dialect: str) -> str:
    """A10/R-global (raster_analysis.cpp:78-178): per-band global stats —
    band min/max/mean + valid-pixel count, nodata-aware.  Long format via
    UNION ALL (runs verbatim in both engines); at scale each branch is an
    independent scan-aggregate over the same cached pixel table and the
    final GROUP BY touches 5 rows."""
    from dronedb_spark.raster.synth import ms_sql

    branches = "\nUNION ALL\n".join(
        f"SELECT '{b}' AS band, CASE WHEN {b} = -9999.0 THEN NULL ELSE {b} END AS v FROM ms"
        for b in ["B", "G", "N", "R", "Re"]
    )
    return f"""WITH ms AS ({ms_sql(dialect)}),
        long AS ({branches})
        SELECT band, CAST(COUNT(v) AS BIGINT) AS n_valid,
               MIN(v) AS v_min, MAX(v) AS v_max,
               CAST(ROUND(SUM(CAST(v AS DECIMAL(38,12))), 6) AS DOUBLE) / COUNT(v) AS v_mean
        FROM long GROUP BY band ORDER BY band"""


@check("raster_band_stats", oracle=_band_stats_sql("duckdb"))
def q_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_band_stats_sql("spark"))


def _multiraster_stats_sql(dialect: str) -> str:
    """A9 over a whole raster CATALOG in one grouped pass: per-raster ROI
    stats keyed by raster_id (the reference runs rasters one at a time —
    raster_analysis.cpp is per-dataset; on Spark 1000s of rasters are one
    groupBy over the partitioned pixel table, shuffling only the
    per-raster partial aggregates)."""
    from dronedb_spark.raster.synth import multi_dem_sql

    return f"""
    WITH px AS ({multi_dem_sql(dialect)}),
    roi AS (SELECT * FROM px WHERE row BETWEEN 20 AND 110 AND col BETWEEN 20 AND 110
            AND value <> -9999.0)
    SELECT raster_id,
           CAST(COUNT(1) AS BIGINT) AS pixel_count,
           MIN(value) AS v_min,
           MAX(value) AS v_max,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) / COUNT(1) AS v_mean
    FROM roi GROUP BY raster_id ORDER BY raster_id"""


@check("multiraster_area_stats", oracle=_multiraster_stats_sql("duckdb"))
def q_multiraster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_multiraster_stats_sql("spark"))


def _overview_pyramid_sql(dialect: str) -> str:
    """K5/X11 (COG ≈ materialized overview pyramid, cog.cpp:78): levels
    1 and 2 downsample 2×2 / 4×4 blocks by nodata-aware mean — the exact
    shape of overview materialization as grouped aggregation (one scan
    per level here; a production build chains level N from level N−1 so
    each level reads 1/4 the rows of the previous)."""
    levels = []
    for lv, blk in ((1, 2), (2, 4)):
        levels.append(f"""
        SELECT {lv} AS level,
               CAST((row - (row % {blk})) / {blk} AS INT) AS orow,
               CAST((col - (col % {blk})) / {blk} AS INT) AS ocol,
               CAST(COUNT(CASE WHEN value <> -9999.0 THEN 1 END) AS BIGINT) AS n_valid,
               CAST(ROUND(SUM(CASE WHEN value <> -9999.0
                                   THEN CAST(value AS DECIMAL(38,10)) END), 4) AS DOUBLE)
                   / COUNT(CASE WHEN value <> -9999.0 THEN 1 END) AS mean_v
        FROM px
        GROUP BY 1, 2, 3""")
    body = "\nUNION ALL\n".join(levels)
    return f"""WITH px AS ({dem_sql(dialect)})
    SELECT * FROM ({body}) t WHERE n_valid > 0 ORDER BY level, orow, ocol"""


@check("overview_pyramid", oracle=_overview_pyramid_sql("duckdb"))
def q_overview_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_overview_pyramid_sql("spark"))


def _profile_distance_sql(dialect: str) -> str:
    """A15 full shape (raster_profile.cpp:84-180): N interpolated samples
    along a segment, nearest-pixel elevation lookup, PLUS the cumulative
    haversine distance from the segment start — pixel (row,col) maps to
    lon/lat via the affine geotransform used by raster_point_query
    (gt = [100000, 0.5, 0, 5000000, 0, -0.5] meters ≈ converted here to a
    small degree-scale transform so haversine operates in its domain).
    Trig matches cross-engine at ROUND 6 (same discipline as the
    standalone haversine check).

    Spark-dialect plan uses the same left-semi-then-broadcast shape as
    ``elevation_profile`` (a hinted build-left left-outer is ignored by
    the planner); the DuckDB oracle keeps the plain LEFT JOIN — results
    are identical."""
    n = 64
    samples_src = (
        f"range(0, {n}) AS t(i)" if dialect == "spark"
        else f"(SELECT range AS i FROM range({n}))"
    )
    hint = "/*+ BROADCAST(p) */ " if dialect == "spark" else ""
    select_body = f"""SELECT {hint}s.i, s.row, s.col,
           CASE WHEN p.value = -9999.0 THEN NULL ELSE p.value END AS elev,
           ROUND(2 * 6378137.0 * asin(sqrt(
               sin(radians(s.lat - 46.0) / 2) * sin(radians(s.lat - 46.0) / 2)
               + cos(radians(46.0)) * cos(radians(s.lat))
                 * sin(radians(s.lon - 8.0) / 2) * sin(radians(s.lon - 8.0) / 2))), 2) AS dist_m"""
    if dialect == "spark":
        join_tail = f"""
    , hits AS (
        SELECT /*+ BROADCAST(s) */ p.row, p.col, p.value
        FROM px p LEFT SEMI JOIN samples s ON p.row = s.row AND p.col = s.col)
    {select_body}
    FROM samples s LEFT JOIN hits p ON s.row = p.row AND s.col = p.col
    ORDER BY s.i"""
    else:
        join_tail = f"""
    {select_body}
    FROM samples s LEFT JOIN px p ON s.row = p.row AND s.col = p.col
    ORDER BY s.i"""
    return f"""
    WITH px AS ({dem_sql(dialect)}),
    samples AS (
        SELECT CAST(i AS INT) AS i,
               CAST(floor(10.0 + 110.0 * i / {n - 1} + 0.5) AS INT) AS row,
               CAST(floor(10.0 + 110.0 * i / {n - 1} + 0.5) AS INT) AS col,
               8.0 + (CAST(i AS DOUBLE) / {n - 1}) * 0.01 AS lon,
               46.0 - (CAST(i AS DOUBLE) / {n - 1}) * 0.01 AS lat
        FROM {samples_src}
    ){join_tail}"""


@check("elevation_profile_dist", oracle=_profile_distance_sql("duckdb"))
def q_profile_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_profile_distance_sql("spark"))
