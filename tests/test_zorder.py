"""Z-order layout laws (catalog/zorder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.catalog.zorder import q_zorder_skipping, zorder_layout


def test_morton_interleave_hand_values(spark):
    # 2x2 grid at the extremes: bucket 0 and 65535 per axis
    df = spark.createDataFrame(
        [(0, 0), (0, 3), (3, 0), (3, 3)], "x bigint, y bigint"
    )
    out = {
        (r["x"], r["y"]): r["zval"]
        for r in zorder_layout(df, "x", "y", n_files=4).collect()
    }
    assert out[(0, 0)] == 0
    # y=max alone: all 16 even bit positions set
    assert out[(0, 3)] == sum(1 << (2 * i) for i in range(16))
    # x=max alone: all 16 odd bit positions
    assert out[(3, 0)] == sum(1 << (2 * i + 1) for i in range(16))
    assert out[(3, 3)] == (1 << 32) - 1


def test_file_ids_bounded_and_locality(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    laid = zorder_layout(li, "l_partkey", "l_suppkey")
    mm = laid.agg(
        F.min("file_id").alias("lo"), F.max("file_id").alias("hi")
    ).first()
    assert 0 <= mm["lo"] and mm["hi"] <= 63


def test_zorder_prunes_more_than_linear(spark, sf_dir):
    rows = {r["layout"]: r for r in q_zorder_skipping(spark, sf_dir).collect()}
    z, l = rows["zorder"], rows["linear"]
    # both layouts contain the same data → identical ground truth
    assert z["rows_matching"] == l["rows_matching"] > 0
    # pruning must be sound: scanned rows bound the matching rows
    assert z["rows_scanned"] >= z["rows_matching"]
    assert l["rows_scanned"] >= l["rows_matching"]
    # the point of z-ordering: a 2-D box touches fewer files
    assert z["files_scanned"] < l["files_scanned"]
