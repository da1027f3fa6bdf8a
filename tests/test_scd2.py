"""SCD2 history laws (operators/scd2.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dronedb_spark.operators.scd2 import scd2_intervals


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, state string"
    )


def _t(m):
    return dt.datetime(2026, 1, 1, 0, m)


def test_consecutive_states_collapse_and_chain(spark):
    rows = [
        (1, _t(0), 7, "a"),
        (2, _t(1), 7, "a"),
        (3, _t(2), 7, "b"),
        (4, _t(3), 7, "a"),   # a again → NEW episode, not merged
    ]
    out = scd2_intervals(_events(spark, rows), "user_id", F.col("state")).orderBy(
        "valid_from_us"
    ).collect()
    assert [(r["state"], r["n_events"]) for r in out] == [
        ("a", 2), ("b", 1), ("a", 1),
    ]
    # half-open chaining: each valid_to equals the next valid_from
    for cur, nxt in zip(out, out[1:]):
        assert cur["valid_to_us"] == nxt["valid_from_us"]
        assert cur["is_current"] == 0
    assert out[-1]["valid_to_us"] == -1 and out[-1]["is_current"] == 1


def test_keys_are_independent(spark):
    rows = [
        (1, _t(0), 1, "x"),
        (2, _t(1), 2, "x"),
        (3, _t(2), 1, "y"),
    ]
    out = scd2_intervals(_events(spark, rows), "user_id", F.col("state")).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2 and len(by_user[2]) == 1
    assert by_user[2][0]["is_current"] == 1


def test_equal_ts_ties_order_by_event_id(spark):
    rows = [
        (5, _t(0), 1, "b"),
        (2, _t(0), 1, "a"),  # same ts, smaller id → first
    ]
    out = scd2_intervals(_events(spark, rows), "user_id", F.col("state")).orderBy(
        "valid_from_us", "state"
    ).collect()
    states = [r["state"] for r in sorted(out, key=lambda r: r["is_current"])]
    # episode order: a (event 2) then b (event 5, current)
    assert {r["state"]: r["is_current"] for r in out} == {"a": 0, "b": 1}
