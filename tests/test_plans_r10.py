"""Physical-plan pins for the round-10 operators — the scale
properties each docstring claims, asserted so refactors can't silently
lose them (the test_plans.py discipline)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dronedb_spark.plans.inspect import (
    exchange_count,
    has_broadcast_join,
    has_cartesian,
    has_partial_aggregation,
    physical_plan,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from dronedb_spark.tables import load

    return load(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_maintenance_plan_never_rereads_the_corpus(spark, sf_dir):
    """The composed maintenance plan's batch assignment is zero-shuffle
    and the corpus parquet appears in the plan only through the
    files-sized stats aggregate — the packing window adds no
    corpus-sized exchange."""
    from dronedb_spark.catalog.maintenance import maintenance_plan
    from dronedb_spark.catalog.zorder import zorder_layout

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    batch = li.filter(F.col("l_orderkey") % 37 == 0)
    mm = li.agg(
        F.min("l_partkey").cast("bigint").alias("_xmin"),
        F.max("l_partkey").cast("bigint").alias("_xmax"),
        F.min("l_suppkey").cast("bigint").alias("_ymin"),
        F.max("l_suppkey").cast("bigint").alias("_ymax"),
    )
    stats = (
        zorder_layout(li, "l_partkey", "l_suppkey")
        .filter(F.col("l_orderkey") % 37 != 0)
        .groupBy("file_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    q = maintenance_plan(stats, batch.join(F.broadcast(mm)), "l_partkey", "l_suppkey")
    assert not has_cartesian(q)
    # the dirty-file attach and the packing rejoin are files-sized:
    # partial aggregation runs map-side on the only corpus-sized branch
    assert has_partial_aggregation(q)


def test_rollup_is_one_shuffle(spark, events):
    from dronedb_spark.operators.reshape import rollup_counts

    q = rollup_counts(events)
    assert exchange_count(q) <= 1
    assert has_partial_aggregation(q)


def test_ewma_hourly_count_partial_aggregates(spark, events):
    from dronedb_spark.operators.ewma import ewma_series

    q = ewma_series(events)
    # the only data-sized job is the map-side-combined hourly count;
    # the per-series fold reads TIME-sized rows
    assert has_partial_aggregation(q)
    # the grid's span cross-join is a 1-row BROADCAST constant, not a
    # data-sized cartesian
    plan = physical_plan(q)
    assert "BroadcastNestedLoopJoin" in plan and "CartesianProduct" not in plan


def test_filtered_search_probes_by_broadcast(spark, emb):
    from dronedb_spark.vectors.filtered import filtered_ivf_search

    q = filtered_ivf_search(emb, 0, 3, 10)
    plan = physical_plan(q)
    # probe set and query vector attach by broadcast; the candidate
    # side is the only shuffled data
    assert has_broadcast_join(q)
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort


def test_semdedup_rollup_pairs_stay_inside_cells(spark, emb):
    from dronedb_spark.vectors.semdedup import semdedup_rollup

    q = semdedup_rollup(emb)
    # no relational pair join exists at all — the pair work runs inside
    # the per-cell Arrow kernel; the plan shuffles on cell once
    plan = physical_plan(q)
    assert not has_cartesian(q)
    assert "FlatMapGroupsInArrow" in plan or "FlatMapGroupsInPandas" in plan


def test_mixture_plan_is_sources_sized_after_one_pass(spark, sf_dir):
    from dronedb_spark.tables import load
    from dronedb_spark.text.mixture import mixture_plan

    q = mixture_plan(load(spark, sf_dir, "documents"))
    assert has_partial_aggregation(q)
    # the 1-row total attaches as a BROADCAST constant, never a
    # data-sized cartesian
    plan = physical_plan(q)
    assert "BroadcastNestedLoopJoin" in plan and "CartesianProduct" not in plan
