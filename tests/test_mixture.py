"""Mixture-plan laws (text/mixture.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.text.mixture import mixture_plan


def test_shares_sum_to_one_and_budget_never_overshoots(spark, sf_dir):
    rows = mixture_plan(load(spark, sf_dir, "documents")).collect()
    assert len(rows) == 20  # the 20 corpus sources
    total_share = sum(r["share_ppm"] for r in rows)
    # floor division: within one ppm per source of 10^6, never above
    assert 1_000_000 - len(rows) <= total_share <= 1_000_000
    assert sum(r["docs_budget"] for r in rows) <= 100_000


def test_temperature_upweights_small_sources(spark, sf_dir):
    """α = ½ compresses the range: a source's share of the budget must
    exceed its raw token share when it is below-average sized, and
    weights match the closed form."""
    rows = mixture_plan(load(spark, sf_dir, "documents")).collect()
    tok_total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert r["weight_micro"] == math.floor(
            math.sqrt(r["n_tokens"]) * 1_000_000.0
        )
        raw_ppm = r["n_tokens"] * 1_000_000 // tok_total
        if raw_ppm < 1_000_000 // len(rows):  # below-average source
            assert r["share_ppm"] >= raw_ppm


def test_rate_identity(spark, sf_dir):
    rows = mixture_plan(load(spark, sf_dir, "documents")).collect()
    for r in rows:
        assert r["rate_ppm"] == r["docs_budget"] * 1_000_000 // r["n_docs"]
