"""Dataset-level aggregates (SURVEY A1-A5).

Reference: entry count (database.cpp:229), size roll-up (entry.cpp:968),
temporal extent with captureTime→mtime fallback (database.cpp:391-458),
spatial extent (database.cpp:375-384).  All are single-pass partial+final
aggregations in Spark — no shuffle beyond the final reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_df, with_catalog
from dronedb_spark.suite import check


def dataset_counts(entries: DataFrame) -> DataFrame:
    return entries.agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.sum(F.when(F.col("type") == 1, 1).otherwise(0)).cast("bigint").alias("n_dirs"),
        F.sum(F.when(F.col("type") != 1, 1).otherwise(0)).cast("bigint").alias("n_files"),
        F.sum("size").cast("bigint").alias("total_size"),
    )


def temporal_extent(entries: DataFrame) -> DataFrame:
    """Per-entry instant = captureTime (ms→s) when > 0 else mtime
    (database.cpp:391-458, stac.cpp:642-646); extent = min/max epoch s."""
    instant = F.when(
        F.col("capture_ms") > 0,
        ((F.col("capture_ms") - F.col("capture_ms") % 1000) / 1000).cast("bigint"),
    ).otherwise(F.col("mtime"))
    inst = entries.filter(F.col("type") != 1).select(instant.alias("instant"))
    return inst.filter(F.col("instant") > 0).agg(
        F.min("instant").alias("t_min"), F.max("instant").alias("t_max")
    )


def spatial_extent(entries: DataFrame) -> DataFrame:
    """Envelope of union == union of envelopes over materialized MBR columns
    (SURVEY A5/X9) — a 4-way min/max, no geometry library needed."""
    geo = entries.filter(F.col("bbox_minx").isNotNull())
    return geo.agg(
        F.min("bbox_minx").alias("minx"),
        F.min("bbox_miny").alias("miny"),
        F.max("bbox_maxx").alias("maxx"),
        F.max("bbox_maxy").alias("maxy"),
        F.count(F.lit(1)).alias("n_geo"),
    )


# ---------------------------------------------------------------- checks


@check(
    "dataset_counts",
    oracle=with_catalog(
        """SELECT CAST(COUNT(1) AS BIGINT) AS n_entries,
                  CAST(SUM(CASE WHEN type = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dirs,
                  CAST(SUM(CASE WHEN type <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_files,
                  CAST(SUM(size) AS BIGINT) AS total_size
           FROM entries"""
    ),
)
def q_dataset_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_counts(entries_df(spark, sf_dir))


@check(
    "temporal_extent",
    oracle=with_catalog(
        """SELECT CAST(MIN(instant) AS BIGINT) AS t_min, CAST(MAX(instant) AS BIGINT) AS t_max
           FROM (
               SELECT CASE WHEN capture_ms > 0
                           THEN CAST((capture_ms - capture_ms % 1000) / 1000 AS BIGINT)
                           ELSE mtime END AS instant
               FROM entries WHERE type <> 1
           ) t WHERE instant > 0"""
    ),
)
def q_temporal_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal_extent(entries_df(spark, sf_dir))


@check(
    "spatial_extent",
    oracle=with_catalog(
        """SELECT MIN(bbox_minx) AS minx, MIN(bbox_miny) AS miny,
                  MAX(bbox_maxx) AS maxx, MAX(bbox_maxy) AS maxy,
                  CAST(COUNT(1) AS BIGINT) AS n_geo
           FROM entries WHERE bbox_minx IS NOT NULL"""
    ),
)
def q_spatial_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial_extent(entries_df(spark, sf_dir))
