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


def test_rewrite_plan_dirties_only_touched_files(spark):
    from pyspark.sql import functions as F

    from dronedb_spark.catalog.zorder import (
        file_stats,
        zorder_layout,
        zorder_rewrite_plan,
    )

    # a uniform 2-D grid corpus, then a batch confined to one corner
    corpus = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x bigint, y bigint"
    )
    laid = zorder_layout(corpus, "x", "y", n_files=16)
    stats = laid.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    mm = corpus.agg(
        F.min("x").cast("bigint").alias("_xmin"),
        F.max("x").cast("bigint").alias("_xmax"),
        F.min("y").cast("bigint").alias("_ymin"),
        F.max("y").cast("bigint").alias("_ymax"),
    )
    batch = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x bigint, y bigint"
    ).join(F.broadcast(mm))
    plan = zorder_rewrite_plan(stats, batch, "x", "y", n_files=16).collect()
    rewrites = [r for r in plan if r["action"] == "rewrite"]
    keeps = [r for r in plan if r["action"] == "keep"]
    # a corner batch touches exactly one z-range file; the rest keep
    assert len(rewrites) == 1
    assert sum(r["n_new"] for r in rewrites) == 16
    assert len(keeps) == 15 and all(r["n_new"] == 0 for r in keeps)


def test_rewrite_plan_clamps_out_of_bounds_batch(spark):
    from pyspark.sql import functions as F

    from dronedb_spark.catalog.zorder import zorder_layout, zorder_rewrite_plan

    corpus = spark.createDataFrame(
        [(x, x) for x in range(10, 50)], "x bigint, y bigint"
    )
    laid = zorder_layout(corpus, "x", "y", n_files=8)
    stats = laid.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    mm = corpus.agg(
        F.min("x").cast("bigint").alias("_xmin"),
        F.max("x").cast("bigint").alias("_xmax"),
        F.min("y").cast("bigint").alias("_ymin"),
        F.max("y").cast("bigint").alias("_ymax"),
    )
    # batch values OUTSIDE the persisted layout bounds clamp to the
    # edge buckets instead of corrupting the z-value
    batch = spark.createDataFrame(
        [(0, 0), (99, 99)], "x bigint, y bigint"
    ).join(F.broadcast(mm))
    plan = zorder_rewrite_plan(stats, batch, "x", "y", n_files=8).collect()
    assert sum(r["n_new"] for r in plan) == 2
    dirty = sorted(r["file_id"] for r in plan if r["n_new"] > 0)
    assert dirty[0] == min(r["file_id"] for r in plan)
    assert dirty[-1] == max(r["file_id"] for r in plan)


def test_maintenance_plan_composes_rewrite_and_packing(spark, sf_dir):
    """The composed worklist: every 'rewrite' file gets a packing group,
    every 'keep' file gets -1, groups are contiguous from 0, and no
    group exceeds target once it has >1 member (the packing law: a file
    starts a new group only when the bytes before it fill the
    target)."""
    from dronedb_spark.catalog.maintenance import (
        PACK_TARGET,
        ROW_BYTES,
        maintenance_plan,
    )
    from dronedb_spark.catalog.zorder import zorder_layout
    from dronedb_spark.tables import load
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    batch = li.filter(F.col("l_orderkey") % 37 == 0)
    mm = li.agg(
        F.min("l_partkey").cast("bigint").alias("_xmin"),
        F.max("l_partkey").cast("bigint").alias("_xmax"),
        F.min("l_suppkey").cast("bigint").alias("_ymin"),
        F.max("l_suppkey").cast("bigint").alias("_ymax"),
    )
    laid = zorder_layout(li, "l_partkey", "l_suppkey").filter(
        F.col("l_orderkey") % 37 != 0
    )
    stats = laid.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    rows = maintenance_plan(
        stats, batch.join(F.broadcast(mm)), "l_partkey", "l_suppkey"
    ).collect()
    rew = sorted(
        (r["file_id"], r["n_rows"], r["n_new"], r["group_no"])
        for r in rows
        if r["action"] == "rewrite"
    )
    assert all(r["group_no"] == -1 for r in rows if r["action"] == "keep")
    assert rew, "fixture must dirty at least one file"
    groups = sorted({g for _, _, _, g in rew})
    assert groups == list(range(len(groups)))  # contiguous from 0
    # packing law: cumulative bytes BEFORE a file // target == its group
    cum = 0
    for _fid, n_rows, n_new, g in rew:
        assert g == cum // PACK_TARGET
        cum += (n_rows + n_new) * ROW_BYTES
