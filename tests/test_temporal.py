"""Boundary semantics for the temporal joins (as-of, interval) on tiny
in-memory frames — the oracle parity tests share the predicate text with
DuckDB, so inclusive/exclusive edges are pinned here independently."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.operators.asof import asof_join
from dronedb_spark.operators.interval import interval_join


def test_asof_matches_at_exact_time_and_none_before(spark):
    snaps = spark.createDataFrame(
        [("u1", 100, "s100"), ("u1", 200, "s200")], "user_id string, t long, status string"
    )
    events = spark.createDataFrame(
        [("u1", 99), ("u1", 100), ("u1", 150), ("u1", 200), ("u1", 201)],
        "user_id string, t long",
    )
    out = {
        r["t"]: r["status"]
        for r in asof_join(events, snaps, "user_id", "t", "t", ["status"]).collect()
    }
    # >= semantics: a snapshot AT the event time matches; nothing matches
    # before the first snapshot
    assert out == {99: None, 100: "s100", 150: "s100", 200: "s200", 201: "s200"}


def test_asof_key_isolation(spark):
    snaps = spark.createDataFrame([("u1", 100, "s")], "user_id string, t long, status string")
    events = spark.createDataFrame([("u2", 150)], "user_id string, t long")
    [row] = asof_join(events, snaps, "user_id", "t", "t", ["status"]).collect()
    assert row["status"] is None  # u1's snapshot never leaks to u2


def test_interval_half_open_and_bucket_spanning(spark):
    # window [1000, 2000) spans several 900 s buckets; start inclusive,
    # end exclusive; results independent of bucket width
    win = spark.createDataFrame([(1, 1000, 2000)], "window_id long, s long, e long")
    ev = spark.createDataFrame([(999,), (1000,), (1500,), (1999,), (2000,)], "t long")
    for bucket_s in (7, 900, 10_000):
        got = sorted(
            r["t"]
            for r in interval_join(ev, win, "t", "s", "e", bucket_s=bucket_s).collect()
        )
        assert got == [1000, 1500, 1999], f"bucket_s={bucket_s}: {got}"


def test_interval_pair_appears_exactly_once(spark):
    # an event inside a window that covers many buckets must match once,
    # not once per shared bucket
    win = spark.createDataFrame([(1, 0, 10_000)], "window_id long, s long, e long")
    ev = spark.createDataFrame([(5000,)], "t long")
    rows = interval_join(ev, win, "t", "s", "e", bucket_s=100).collect()
    assert len(rows) == 1


def test_asof_null_in_latest_snapshot_is_row_wise(spark):
    """ADVICE r1: a NULL value in the MOST RECENT snapshot must be carried
    (row-wise ASOF), not skipped in favor of an older non-NULL snapshot —
    all value columns come from the same matched snapshot row."""
    snaps = spark.createDataFrame(
        [("u1", 100, "old", 1), ("u1", 200, None, 2)],
        "user_id string, t long, status string, ver int",
    )
    events = spark.createDataFrame([("u1", 250)], "user_id string, t long")
    [row] = asof_join(events, snaps, "user_id", "t", "t", ["status", "ver"]).collect()
    assert row["ver"] == 2
    assert row["status"] is None  # from the t=200 snapshot, NOT "old"


def test_photo_sessions_invariants(spark, sf_dir):
    """Session numbers are contiguous from 1 per folder; a session
    boundary exists exactly where the time gap or the distance gate
    trips; within-session steps respect both gates."""
    from dronedb_spark.catalog.derive import entries_df
    from dronedb_spark.operators.sessions import photo_sessions

    gap_ms, dist_m = 1000 * 1000, 14000000.0
    rows = photo_sessions(entries_df(spark, sf_dir), gap_ms, dist_m).collect()
    by_folder: dict[str, list] = {}
    for r in rows:
        by_folder.setdefault(r["folder"], []).append(r)
    assert by_folder
    for folder, fr in by_folder.items():
        fr.sort(key=lambda r: (r["capture_ms"], r["path"]))
        assert fr[0]["session_no"] == 1
        prev = None
        for r in fr:
            if prev is not None:
                gap = r["capture_ms"] - prev["capture_ms"]
                new = r["session_no"] != prev["session_no"]
                should = gap > gap_ms or r["step_m"] > dist_m
                assert new == should, (folder, r["path"], gap, r["step_m"])
                assert r["session_no"] - prev["session_no"] in (0, 1)
            prev = r
