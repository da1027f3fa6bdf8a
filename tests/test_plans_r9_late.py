"""Physical-plan pins for the late round-9 operators — the scale
properties each docstring claims, asserted so refactors can't silently
lose them (the test_plans.py discipline)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dronedb_spark.plans.inspect import (
    exchange_count,
    has_cartesian,
    has_partial_aggregation,
    physical_plan,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from dronedb_spark.tables import load

    return load(spark, sf_dir, "events")


def test_roc_auc_is_histogram_sized_after_one_shuffle(spark, docs):
    from dronedb_spark.text.evalmetrics import _score_col, roc_auc

    q = roc_auc(docs, _score_col(), F.col("lang") == "en")
    # groupBy(score_micro) partial-aggregates map-side; no pair join
    assert has_partial_aggregation(q)
    assert not has_cartesian(q)


def test_phrase_query_has_no_cartesian_and_prunes_tokens(spark, docs):
    from dronedb_spark.text.invindex import phrase_query, positional_postings

    q = phrase_query(positional_postings(docs), ["stream", "table", "hash"])
    plan = physical_plan(q)
    assert not has_cartesian(q)
    # the slot table attaches by broadcast, not shuffle
    assert "BroadcastHashJoin" in plan


def test_ohlc_window_and_aggregate_share_one_exchange(spark, events):
    from dronedb_spark.operators.ohlc import ohlc_bars

    q = ohlc_bars(events)
    # one hash exchange on (series, bucket) feeds window AND aggregate
    assert exchange_count(q) <= 1


def test_zorder_assignment_is_zero_shuffle(spark, sf_dir):
    from dronedb_spark.catalog.zorder import zorder_layout

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    q = zorder_layout(li, "l_partkey", "l_suppkey")
    plan = physical_plan(q)
    # min/max attach via broadcast; the z/file projection itself adds no
    # exchange on the data rows — the only exchange in the whole plan is
    # the 1-row min/max aggregate's own SinglePartition gather
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the only exchanges are the 1-row stats gather + its broadcast —
    # the data rows themselves are never hash-repartitioned
    assert "hashpartitioning" not in plan


def test_scd2_reuses_one_hash_exchange(spark, events):
    from dronedb_spark.operators.scd2 import _TIER, scd2_intervals

    q = scd2_intervals(events, "user_id", F.expr(_TIER))
    # lag -> island sum -> episode agg -> lead all ride the same
    # partitioning: exactly one shuffle on the key
    assert exchange_count(q) == 1


def test_skew_profile_partial_aggregates(spark, events):
    from dronedb_spark.operators.skewprof import key_skew_profile

    q = key_skew_profile(events, "user_id", "events.user_id")
    assert has_partial_aggregation(q)
    assert not has_cartesian(q)


def test_sitemap_frontier_broadcasts_metadata_sides(spark, docs):
    from dronedb_spark.sources.bridge import scan_binaries
    from dronedb_spark.tables import spread
    from dronedb_spark.text.robots import _robots_root, parse_robots
    from dronedb_spark.text.sitemaps import (
        _sitemaps_root,
        eligible_entries,
        parse_sitemaps,
        sitemap_frontier,
    )
    from dronedb_spark.text.urls import canonicalize, with_url

    sm = scan_binaries(spark, _sitemaps_root(), "*.xml")
    entries = eligible_entries(parse_sitemaps(spread(sm)))
    rules = parse_robots(
        spread(scan_binaries(spark, _robots_root(), "*.robots.txt"))
    )
    seen = canonicalize(with_url(docs.select("doc_id", "source"))).select(
        "canonical_url"
    )
    q = sitemap_frontier(entries, seen, rules)
    plan = physical_plan(q)
    assert "BroadcastHashJoin" in plan  # verdicts/rules sides broadcast
    assert not has_cartesian(q)
