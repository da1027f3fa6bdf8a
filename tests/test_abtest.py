"""Wilson A/B readout laws (operators/abtest.py)."""

from __future__ import annotations

import datetime as dt
import math

from dronedb_spark.operators.abtest import (
    CONVERT_WINDOW_S,
    ab_readout,
    variant_conversions,
)


def _conv(spark, rows):
    return spark.createDataFrame(rows, "variant bigint, n bigint, k bigint")


def test_wilson_matches_closed_form(spark):
    rows = [(0, 40, 10), (1, 40, 0), (2, 40, 40)]
    out = {r["variant"]: r for r in ab_readout(_conv(spark, rows)).collect()}

    def wilson(n, k, sign):
        z = 1.959963984540054
        p = k / n
        c = (p + z * z / (2 * n)
             + sign * z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) \
            / (1 + z * z / n)
        return min(1.0, max(0.0, c))

    r = out[0]
    assert abs(r["wilson_lo"] - wilson(40, 10, -1)) < 1e-12
    assert abs(r["wilson_hi"] - wilson(40, 10, +1)) < 1e-12
    # clamped extremes
    assert out[1]["wilson_lo"] == 0.0 and out[1]["wilson_hi"] < 0.15
    assert out[2]["wilson_hi"] == 1.0 and out[2]["wilson_lo"] > 0.85
    # CI always brackets the point estimate
    for v, r in out.items():
        assert r["wilson_lo"] <= r["k"] / r["n"] <= r["wilson_hi"]


def test_z_sign_and_control_zero(spark):
    rows = [(0, 100, 20), (1, 100, 40), (2, 100, 5)]
    out = {r["variant"]: r["z_vs_control"]
           for r in ab_readout(_conv(spark, rows)).collect()}
    assert out[0] == 0.0
    assert out[1] > 1.96      # 40% vs 20% on n=100: clearly significant
    assert out[2] < 0         # worse than control


def test_conversion_is_time_bounded(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 0: purchase 10 min after first view → converts
        (1, t0, 0, "view"),
        (2, t0 + dt.timedelta(minutes=10), 0, "purchase"),
        # user 1: purchase BEFORE the first view → no
        (3, t0 - dt.timedelta(minutes=5), 1, "purchase"),
        (4, t0, 1, "view"),
        # user 2: purchase after the window → no
        (5, t0, 2, "view"),
        (6, t0 + dt.timedelta(seconds=CONVERT_WINDOW_S + 1), 2, "purchase"),
        # user 3: never viewed → not exposed at all
        (7, t0, 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    out = {r["variant"]: (r["n"], r["k"])
           for r in variant_conversions(ev, n_variants=10).collect()}
    assert out == {0: (1, 1), 1: (1, 0), 2: (1, 0)}
