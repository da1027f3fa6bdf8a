"""Burn-rate alert laws (operators/slo.py) — the driver fixture burns
under budget (both rules 0), so these plant bursts that fire."""

from __future__ import annotations

import datetime as dt

from dronedb_spark.operators.slo import burn_rate_alerts


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )


def _mk(spec, end=dt.datetime(2026, 1, 10, 0, 0, 0)):
    """spec: list of (minutes_before_end, event_type)."""
    return [
        (i, end - dt.timedelta(minutes=m), t) for i, (m, t) in enumerate(spec)
    ]


RULES = (("page", 3600 * 6, 3600, 12),)  # burn > 1.2 on 6 h AND 1 h


def test_sustained_burst_fires(spark):
    # 10 events in the last hour, 8 errors (80% >> 24% = 1.2x budget);
    # long window sees the same burst
    spec = [(m, "error") for m in range(2, 42, 5)] + [
        (m, "view") for m in range(3, 13, 5)
    ]
    ev = _events(spark, _mk(spec))
    out = burn_rate_alerts(ev, budget_permille=200, rules=RULES).first()
    assert out["fired"] == 1
    assert out["short_errors"] == 8 and out["short_total"] == 10


def test_old_burst_alone_does_not_fire(spark):
    # heavy errors 3-5 h ago, but the LAST hour is clean — the short
    # window gate ("still happening") must hold the alert back
    spec = [(180 + m, "error") for m in range(0, 100, 10)] + [
        (m, "view") for m in range(1, 50, 5)
    ]
    ev = _events(spark, _mk(spec))
    out = burn_rate_alerts(ev, budget_permille=200, rules=RULES).first()
    assert out["short_errors"] == 0
    assert out["long_errors"] == 10
    assert out["fired"] == 0


def test_budget_scales_the_threshold(spark):
    # 30% errors in both windows: fires on a 20% budget (burn 1.5 >
    # 1.2) but not on a 50% budget (burn 0.6)
    spec = [(m, "error") for m in range(1, 31, 10)] + [
        (m, "view") for m in range(2, 60, 8)
    ]
    ev = _events(spark, _mk(spec))
    tight = burn_rate_alerts(ev, budget_permille=200, rules=RULES).first()
    loose = burn_rate_alerts(ev, budget_permille=500, rules=RULES).first()
    assert tight["fired"] == 1
    assert loose["fired"] == 0
    # identical integer sufficient statistics either way
    assert (tight["short_errors"], tight["short_total"]) == (
        loose["short_errors"], loose["short_total"],
    )
