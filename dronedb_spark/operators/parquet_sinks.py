"""Parquet sink round-trips — the engine's durable output format for
normalized tables (SURVEY K3 role-equivalent GPKG sink, R13 raster
export): write the table as (partitioned) Parquet, re-read it, and
aggregate — proving the sink preserves values, types, and partition
keys end to end.

Scale notes: ``partitionBy`` on the layer key gives partition-pruned
re-reads (a query for one layer opens one directory); pixel tables
export with their natural (row-range) ordering so min/max column
statistics prune ROI scans on re-read — the same pruning the synthetic
checks pin via .explain in tests/test_plans.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.operators.vector_query import FEATURES_SQL, features_df
from dronedb_spark.raster.stats import area_stats
from dronedb_spark.raster.synth import dem_df, dem_sql
from dronedb_spark.suite import check


@check(
    "features_parquet_sink",
    oracle=f"""
        WITH f AS ({FEATURES_SQL})
        SELECT dataset_id, layer,
               CAST(COUNT(1) AS BIGINT) AS n_features,
               CAST(SUM(n_vertices) AS BIGINT) AS sum_vertices,
               MIN(bbox_minx) AS minx, MAX(bbox_maxx) AS maxx
        FROM f GROUP BY dataset_id, layer
        ORDER BY dataset_id, layer""",
)
def q_features_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: features table → layer-partitioned Parquet → re-read →
    per-layer rollup.  Any loss in the write (type coercion, partition
    key encoding, dropped rows) breaks parity with the oracle computed
    straight from the source derivation."""
    out = tempfile.mkdtemp(prefix="feat_sink_")
    features_df(spark, sf_dir).write.mode("overwrite").partitionBy(
        "dataset_id", "layer"
    ).parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("dataset_id", "layer")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("n_vertices").cast("bigint").alias("sum_vertices"),
            F.min("bbox_minx").alias("minx"),
            F.max("bbox_maxx").alias("maxx"),
        )
        .orderBy("dataset_id", "layer")
    )


@check(
    "raster_export_parquet",
    oracle=f"""
        WITH px AS ({dem_sql("duckdb")}),
        roi AS (SELECT * FROM px WHERE row BETWEEN 30 AND 100 AND col BETWEEN 10 AND 90
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
def q_raster_export_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13: pixel-table Parquet export → re-read → ROI stats.  Doubles
    round-trip bit-exactly through Parquet, so the post-export stats
    equal the oracle computed from the source expression directly."""
    out = tempfile.mkdtemp(prefix="raster_exp_")
    dem_df(spark).write.mode("overwrite").parquet(out)
    return area_stats(spark.read.parquet(out), 30, 100, 10, 90)
