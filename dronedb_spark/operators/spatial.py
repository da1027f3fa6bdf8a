"""Spatial join — points against rectangle extents at scale.

The reference's spatial predicates are MBR-only (SURVEY X9: bbox columns
+ 4 comparisons); what it never needs — but a catalog-scale engine does —
is the JOIN form: which of millions of entry points fall inside which of
millions of feature extents.  A raw containment predicate plans as a
nested-loop/cartesian (O(|P|·|F|)); the scale shape is GRID BUCKETING:

  * each point hashes to one grid cell (pure arithmetic),
  * each rectangle explodes to the (bounded) range of cells it covers,
  * candidates come from the cell equi-join — shuffle on the cell key,
  * the exact 4-comparison containment refines candidates,
  * pairs that span multiple shared cells are deduplicated by keying
    the pair to ONE owner cell (the rectangle's min corner cell,
    clamped to the point's cell grid) — cheaper than a distinct over
    the pair stream.

Same pattern as the interval join (operators/interval.py) lifted to 2-D.
**[pinned]** no CartesianProduct / BroadcastNestedLoopJoin in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_sql
from dronedb_spark.operators.vector_query import FEATURES_SQL
from dronedb_spark.suite import check
from dronedb_spark.tables import register_views

CELL_DEG = 2.0  # grid pitch; rectangles here are ≤0.07°, so ≤4 cells each


def _cell(col: F.Column) -> F.Column:
    return F.floor(col / F.lit(CELL_DEG)).cast("bigint")


def points_in_rects(points: DataFrame, rects: DataFrame) -> DataFrame:
    """(point key columns, fid) candidate-refined containment pairs.

    ``points`` needs (pt_id, lon, lat); ``rects`` needs (fid, bbox_minx,
    bbox_miny, bbox_maxx, bbox_maxy).  Containment is inclusive on all
    edges (X9 semantics)."""
    p = points.select(
        "pt_id", "lon", "lat", _cell(F.col("lon")).alias("cx"), _cell(F.col("lat")).alias("cy")
    )
    r = rects.select(
        "fid",
        "bbox_minx",
        "bbox_miny",
        "bbox_maxx",
        "bbox_maxy",
        F.explode(
            F.sequence(_cell(F.col("bbox_minx")), _cell(F.col("bbox_maxx")))
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(_cell(F.col("bbox_miny")), _cell(F.col("bbox_maxy")))
        ).alias("cy"),
    )
    cand = p.join(r, ["cx", "cy"])
    contained = cand.filter(
        (F.col("lon") >= F.col("bbox_minx"))
        & (F.col("lon") <= F.col("bbox_maxx"))
        & (F.col("lat") >= F.col("bbox_miny"))
        & (F.col("lat") <= F.col("bbox_maxy"))
    )
    # owner-cell dedup: the containing point's cell is inside the
    # rectangle's cell range by construction, so each (pt, fid) pair
    # survives in exactly the point's own cell — emit only there.
    return contained.filter(
        (F.col("cx") == _cell(F.col("lon"))) & (F.col("cy") == _cell(F.col("lat")))
    ).select("pt_id", "fid")


def feature_point_counts(points: DataFrame, rects: DataFrame) -> DataFrame:
    """Per-rectangle count of contained points (features with none are
    absent — the aggregate form a tile/coverage report wants)."""
    return (
        points_in_rects(points, rects)
        .groupBy("fid")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("fid")
    )


# ---------------------------------------------------------------- checks

# The check joins two DERIVED double columns against each other — and the
# engines disagree by 1 ulp on the derivations (Spark evaluates the bare
# fractional literals as exact DECIMAL, DuckDB as binary doubles), which
# flips boundary containments.  Both sides therefore ROUND the
# coordinates to 6 dp (the data's true grain is 2 dp — rounding collapses
# the 1-ulp split to identical doubles) before comparing.  The feature
# rectangles are also INFLATED by 3°: at their native ≤0.07° size the
# globe-scattered points yield ~zero matches (a vacuous check).
_INFLATE_DEG = 3.0


@check(
    "spatial_join_counts",
    oracle=f"""
        WITH entries AS ({entries_sql('a')}),
        features AS ({FEATURES_SQL})
        SELECT f.fid, CAST(COUNT(1) AS BIGINT) AS n_points
        FROM (SELECT fid, ROUND(bbox_minx - {_INFLATE_DEG}, 6) AS minx,
                     ROUND(bbox_miny - {_INFLATE_DEG}, 6) AS miny,
                     ROUND(bbox_maxx + {_INFLATE_DEG}, 6) AS maxx,
                     ROUND(bbox_maxy + {_INFLATE_DEG}, 6) AS maxy
              FROM features WHERE dataset_id = 'vec1') f
        JOIN (SELECT ROUND(point_lon, 6) AS lon, ROUND(point_lat, 6) AS lat
              FROM entries WHERE point_lon IS NOT NULL) e
          ON e.lon >= f.minx AND e.lon <= f.maxx
         AND e.lat >= f.miny AND e.lat <= f.maxy
        GROUP BY f.fid ORDER BY f.fid""",
)
def q_spatial_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["documents", "part"])
    pts = (
        spark.sql(entries_sql("a"))
        .filter(F.col("point_lon").isNotNull())
        .select(
            F.col("path").alias("pt_id"),
            F.round("point_lon", 6).alias("lon"),
            F.round("point_lat", 6).alias("lat"),
        )
    )
    rects = (
        spark.sql(FEATURES_SQL)
        .filter(F.col("dataset_id") == "vec1")
        .select(
            "fid",
            F.round(F.col("bbox_minx") - _INFLATE_DEG, 6).alias("bbox_minx"),
            F.round(F.col("bbox_miny") - _INFLATE_DEG, 6).alias("bbox_miny"),
            F.round(F.col("bbox_maxx") + _INFLATE_DEG, 6).alias("bbox_maxx"),
            F.round(F.col("bbox_maxy") + _INFLATE_DEG, 6).alias("bbox_maxy"),
        )
    )
    return feature_point_counts(pts, rects)
