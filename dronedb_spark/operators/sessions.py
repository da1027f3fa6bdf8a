"""Flight-session detection — group a catalog's geotagged photos into
capture sessions (the drone-flight unit the reference's flight-speed /
GPS-metadata surface reasons about; tests/flight_speed_test.cpp,
exif.cpp GPS speed chain): a new session starts when the time gap from
the previous capture exceeds ``GAP_MS`` or the camera moved more than
``DIST_M`` meters (landed, drove to the next site, re-launched).

Classic sessionization algebra — LAG + flag + running SUM — but over
the CATALOG with a haversine gate (`functions/geo.py:haversine_m`,
raster_profile.cpp:35-44).  Windows partition by top-level folder (a
source = one upload area), so the computation parallelizes per folder
and no global sort exists; within a folder the order is
(capture_ms, path) — deterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_df, with_catalog
from dronedb_spark.functions.geo import haversine_m
from dronedb_spark.suite import check

GAP_MS = 5 * 60 * 1000   # 5 minutes
DIST_M = 500.0           # meters


def photo_sessions(entries: DataFrame, gap_ms: int = GAP_MS,
                   dist_m: float = DIST_M) -> DataFrame:
    """(folder, path, capture_ms, session_no, step_m): per-photo session
    assignment; ``step_m`` is the distance from the previous photo of
    the same folder (NULL at each folder head)."""
    e = entries.filter(
        (F.col("capture_ms") > 0) & F.col("point_lon").isNotNull()
    ).select(
        F.substring_index("path", "/", 1).alias("folder"),
        "path", "capture_ms", "point_lon", "point_lat",
    )
    w = Window.partitionBy("folder").orderBy("capture_ms", "path")
    prev_ms = F.lag("capture_ms").over(w)
    prev_lon = F.lag("point_lon").over(w)
    prev_lat = F.lag("point_lat").over(w)
    step = haversine_m(prev_lon, prev_lat, F.col("point_lon"), F.col("point_lat"))
    flagged = e.select(
        "folder", "path", "capture_ms",
        step.alias("step_m"),
        F.when(
            prev_ms.isNull()
            | ((F.col("capture_ms") - prev_ms) > gap_ms)
            | (step > dist_m),
            1,
        ).otherwise(0).alias("new_sess"),
    )
    running = Window.partitionBy("folder").orderBy("capture_ms", "path").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return flagged.select(
        "folder", "path", "capture_ms", "step_m",
        F.sum("new_sess").over(running).cast("int").alias("session_no"),
    )


def session_rollup(entries: DataFrame, gap_ms: int = GAP_MS,
                   dist_m: float = DIST_M) -> DataFrame:
    """(folder, session_no, n_photos, t_start_s, t_end_s, max_step_m):
    the per-flight summary (max_step_m over WITHIN-session steps — an
    order-free aggregate, so it is engine-exact)."""
    p = photo_sessions(entries, gap_ms, dist_m)
    w = Window.partitionBy("folder").orderBy("capture_ms", "path")
    sess_of_prev = F.lag("session_no").over(w)
    within = p.select(
        "folder", "session_no", "capture_ms",
        F.when(sess_of_prev == F.col("session_no"), F.col("step_m")).alias("in_step"),
    )
    return within.groupBy("folder", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_photos"),
        (F.min("capture_ms") / 1000).cast("bigint").alias("t_start_s"),
        (F.max("capture_ms") / 1000).cast("bigint").alias("t_end_s"),
        F.coalesce(F.round(F.max("in_step"), 2), F.lit(-1.0)).alias("max_step_m"),
    )


_D_HAV = """2 * 6378137.0 * asin(sqrt(
    sin(radians(point_lat - p_lat) / 2) * sin(radians(point_lat - p_lat) / 2)
    + cos(radians(p_lat)) * cos(radians(point_lat))
      * sin(radians(point_lon - p_lon) / 2)
      * sin(radians(point_lon - p_lon) / 2)))"""


# Driver-check thresholds: the synthetic catalog shoots one photo per
# folder every 720 s with pseudo-random global coordinates, so the
# production gates (5 min / 500 m) would make every session a
# singleton and the within-session path would go untested.  A 1000 s
# gap + 14000 km distance make BOTH gates split on this data: %4
# doc_ids carry no captureTime, opening 1440 s holes (time splits),
# and roughly half the hops exceed 14000 km (distance splits) while
# the rest chain into multi-photo sessions.
_CHECK_GAP_MS = 1000 * 1000
_CHECK_DIST_M = 14000000.0


@check(
    "flight_session_rollup",
    oracle=with_catalog(
        f"""SELECT folder, session_no,
                   CAST(COUNT(*) AS BIGINT) AS n_photos,
                   CAST(MIN(capture_ms) // 1000 AS BIGINT) AS t_start_s,
                   CAST(MAX(capture_ms) // 1000 AS BIGINT) AS t_end_s,
                   COALESCE(ROUND(MAX(in_step), 2), -1.0) AS max_step_m
            FROM (
              SELECT folder, capture_ms,
                     CASE WHEN LAG(session_no) OVER w2 = session_no
                          THEN step_m END AS in_step,
                     session_no
              FROM (
                SELECT folder, path, capture_ms, step_m,
                       CAST(SUM(new_sess) OVER w2 AS INT) AS session_no
                FROM (
                  SELECT folder, path, capture_ms, step_m,
                         CASE WHEN p_ms IS NULL
                                   OR capture_ms - p_ms > {_CHECK_GAP_MS}
                                   OR step_m > {_CHECK_DIST_M} THEN 1 ELSE 0 END AS new_sess
                  FROM (
                    SELECT folder, path, capture_ms, point_lon, point_lat,
                           LAG(capture_ms) OVER w AS p_ms,
                           LAG(point_lon) OVER w AS p_lon,
                           LAG(point_lat) OVER w AS p_lat,
                           {_D_HAV} AS step_m
                    FROM (
                      SELECT string_split(path, '/')[1] AS folder, path,
                             capture_ms, point_lon, point_lat
                      FROM entries
                      WHERE capture_ms > 0 AND point_lon IS NOT NULL) src
                    WINDOW w AS (PARTITION BY folder
                                 ORDER BY capture_ms, path)) stepped
                  ) flagged
                WINDOW w2 AS (PARTITION BY folder ORDER BY capture_ms, path
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                ) sessed
              WINDOW w2 AS (PARTITION BY folder ORDER BY capture_ms, path)
              ) marked
            GROUP BY folder, session_no
            ORDER BY folder, session_no"""
    ),
)
def q_flight_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-folder capture sessions over the derived catalog — photo
    counts, time spans, and the largest within-session hop, all value-
    checked (the haversine gate uses the exact shared formula, so the
    session boundaries are engine-identical)."""
    return session_rollup(
        entries_df(spark, sf_dir), gap_ms=_CHECK_GAP_MS, dist_m=_CHECK_DIST_M
    ).orderBy("folder", "session_no")
