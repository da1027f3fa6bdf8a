"""Physical-plan pins for the round-11 operators — the scale
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
def docs(spark, sf_dir):
    from dronedb_spark.tables import load

    return load(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from dronedb_spark.tables import load

    return load(spark, sf_dir, "events")


def test_migration_plan_has_no_pair_join(spark, sf_dir):
    """Both assignment passes are broadcast argmins over the centroid
    sets — the corpus never joins itself."""
    from dronedb_spark.vectors.maintenance import ivf_migration_plan

    q = ivf_migration_plan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    assert not has_cartesian(q)
    assert has_broadcast_join(q)
    assert has_partial_aggregation(q)


def test_range_plan_has_no_single_partition_window(spark, events):
    """The prefix sum is the two-phase distributed scan: every window
    in the plan is partitioned (by _pid), never a global one-partition
    window over the histogram."""
    from dronedb_spark.operators.rangeplan import range_partition_plan

    ev = events.select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0))
        .otherwise(F.col("user_id") % 50)
        .cast("bigint")
        .alias("k")
    )
    q = range_partition_plan(ev, "k")
    plan = physical_plan(q)
    # running_offsets' intra-partition window declares partitionBy _pid;
    # the only unpartitioned window is over the P-row partition totals
    assert "partitionspecification=[_pid" in plan.lower().replace(" ", "") or (
        "_pid" in plan
    )
    # the 1-row total attaches by broadcast, never a data-sized cartesian
    assert "CartesianProduct" not in plan
    assert has_partial_aggregation(q)


def test_moments_merge_partial_aggregates(spark, events):
    from dronedb_spark.operators.varmerge import moments_merge_daily

    q = moments_merge_daily(events)
    assert has_partial_aggregation(q)
    plan = physical_plan(q)
    assert "CartesianProduct" not in plan


def test_kappa_is_confusion_sized_after_one_pass(spark, docs):
    """One corpus-sized aggregate to the C×C confusion matrix; the
    marginal product and totals run on C²-row inputs."""
    from dronedb_spark.text.agreement import annotator_labels, cohen_kappa

    q = cohen_kappa(annotator_labels(docs))
    assert has_partial_aggregation(q)
    assert not has_cartesian(q) or "BroadcastNestedLoopJoin" in physical_plan(q)


def test_kanonymity_is_two_aggregates_one_shuffle_chain(spark, docs):
    from dronedb_spark.text.kanon import kanonymity_audit

    q = kanonymity_audit(docs)
    assert has_partial_aggregation(q)
    assert exchange_count(q) <= 2  # QI grain + source rollup
    assert not has_cartesian(q)


def test_precedence_merge_is_one_fingerprint_shuffle(spark, docs):
    """The winner set derives from the same fingerprint-keyed aggregate
    the accounting reads — no window over the corpus, no self pair
    join beyond the fp equi-join."""
    from dronedb_spark.text.precedence import (
        _with_cross_source_copies,
        precedence_merge,
    )

    q = precedence_merge(_with_cross_source_copies(docs))
    plan = physical_plan(q)
    assert not has_cartesian(q)
    assert "Window" not in plan
    assert has_partial_aggregation(q)


def test_sft_packing_uses_distributed_prefix_sum(spark, docs):
    from dronedb_spark.text.sft import sft_pack_batches

    q = sft_pack_batches(docs)
    plan = physical_plan(q)
    # running_offsets: the only windows are _pid-partitioned or over the
    # P-row totals; the budget division is arithmetic, not a join
    assert "_pid" in plan
    assert "CartesianProduct" not in plan
    assert has_partial_aggregation(q)


def test_hll_trajectory_prefix_is_register_sized(spark, events):
    """The day-prefix merge joins the (days × registers) history to the
    day list by BROADCAST — the events table feeds exactly one
    aggregate."""
    from dronedb_spark.streaming.hll import hll_register_trajectory

    q = hll_register_trajectory(events)
    assert has_broadcast_join(q) or "BroadcastNestedLoopJoin" in physical_plan(q)
    assert has_partial_aggregation(q)
    assert "CartesianProduct" not in physical_plan(q)
