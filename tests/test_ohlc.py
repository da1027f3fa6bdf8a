"""OHLC bar laws (operators/ohlc.py)."""

from __future__ import annotations

import datetime as dt

from dronedb_spark.operators.ohlc import ohlc_bars


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, "
        "value double, props string"
    )


def _t(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


def test_endpoints_extremes_and_weighted_mean(spark):
    rows = [
        (1, _t(5), "a", 10.0, '{"k": 1}'),
        (2, _t(10), "a", 30.0, '{"k": 3}'),
        (3, _t(1), "a", 20.0, '{"k": 2}'),   # earliest → open
        (4, _t(59), "a", 5.0, '{"k": 4}'),   # latest → close
    ]
    r = ohlc_bars(_events(spark, rows), bucket_s=3600).first()
    assert (r["open"], r["close"], r["high"], r["low"], r["n"]) == (
        20.0, 5.0, 30.0, 5.0, 4,
    )
    assert r["vol"] == 10
    # (10e6*1 + 30e6*3 + 20e6*2 + 5e6*4) DIV 10
    assert r["vwap_micro"] == (10_000_000 + 90_000_000 + 40_000_000 + 20_000_000) // 10


def test_equal_ts_ties_resolve_by_event_id(spark):
    rows = [
        (7, _t(0), "a", 1.0, '{"k": 1}'),
        (2, _t(0), "a", 2.0, '{"k": 1}'),   # same ts, smaller id → open
        (9, _t(30), "a", 3.0, '{"k": 1}'),
        (8, _t(30), "a", 4.0, '{"k": 1}'),  # same ts, larger id (9) → close
    ]
    r = ohlc_bars(_events(spark, rows), bucket_s=3600).first()
    assert r["open"] == 2.0
    assert r["close"] == 3.0


def test_buckets_split_series(spark):
    rows = [
        (1, dt.datetime(2026, 1, 1, 0, 30), "a", 1.0, '{"k": 1}'),
        (2, dt.datetime(2026, 1, 1, 1, 30), "a", 2.0, '{"k": 1}'),
        (3, dt.datetime(2026, 1, 1, 1, 45), "b", 3.0, '{"k": 1}'),
    ]
    out = ohlc_bars(_events(spark, rows), bucket_s=3600).collect()
    assert len(out) == 3
    assert {(r["event_type"], r["n"]) for r in out} == {("a", 1), ("b", 1)} | {("a", 1)}
