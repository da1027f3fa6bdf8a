"""Streaming sessionize == batch twin (streaming/sessionize.py vs
operators/sessionize.py), including the idle-key event-time-timeout
flush and out-of-order arrival."""

from __future__ import annotations

import pytest

import datetime as dt

from dronedb_spark.operators.sessionize import sessionize
from dronedb_spark.streaming.sessionize import stream_sessionize
from dronedb_spark.tables import load

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, value double"


def _runner(spark, tmp_path, gap_s, delay):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    emitted = []

    def run_file(df_or_rows):
        df = (
            df_or_rows
            if not isinstance(df_or_rows, list)
            else spark.createDataFrame(df_or_rows, SCHEMA)
        )
        df.coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_sessionize(
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                ).parquet(src),
                gap_s=gap_s,
                delay=delay,
            )
            .writeStream.foreachBatch(
                lambda d, _eid: emitted.extend(tuple(r) for r in d.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    return emitted, run_file


def test_stream_sessions_match_batch_on_full_corpus(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    max_ts = events.agg({"ts": "max"}).collect()[0][0]
    emitted, run_file = _runner(spark, tmp_path, gap_s=1800, delay="1 hour")
    run_file(events)
    # two far-future sentinel batches (alien key): the first advances the
    # watermark past every real session's close horizon, the second runs
    # a batch in which the expired event-time timeouts flush idle keys
    run_file([(9_000_001, max_ts + dt.timedelta(days=40), -1, 0.0)])
    run_file([(9_000_002, max_ts + dt.timedelta(days=40, hours=2), -1, 0.0)])

    got = {t for t in emitted if t[0] != -1}
    want = {tuple(r) for r in sessionize(events).collect()}
    assert got == want
    assert len(want) > 100


@pytest.mark.heavy
def test_out_of_order_and_idle_timeout_flush(spark, tmp_path):
    def ts(sec):
        return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=sec)

    emitted, run_file = _runner(
        spark, tmp_path, gap_s=60, delay="5000 seconds"
    )
    # u1 event-time order: 1000, 1030, 1050 (session 1), 2000 (session 2)
    # — arrival order scrambles the backfill across batches
    run_file([(1, ts(1000), 1, 0.0), (3, ts(2000), 1, 0.0)])
    run_file([(2, ts(1030), 1, 0.0), (4, ts(1050), 1, 0.0)])
    assert emitted == []  # watermark still at 0 — nothing folds yet
    run_file([(90, ts(100000), 9, 0.0)])   # raises wm for the NEXT batch
    run_file([(91, ts(101000), 9, 0.0)])   # u1 flushes by TIMEOUT here
    got = {t for t in emitted if t[0] == 1}
    base = int(ts(0).timestamp()) * 1_000_000
    assert got == {
        (1, 1, 3, base + 1000_000000, base + 1050_000000, 50),
        (1, 2, 1, base + 2000_000000, base + 2000_000000, 0),
    }
    # an event later than the delay is dropped without corrupting state
    run_file([(5, ts(50000), 1, 0.0)])
    run_file([(92, ts(102000), 9, 0.0)])
    assert {t for t in emitted if t[0] == 1} == got


def test_native_session_window_matches_batch(spark, sf_dir, tmp_path):
    """The built-in session_window runtime closes the same sessions as
    the batch build (counts, first and last event times) once the
    watermark passes them."""
    import datetime as dt

    from dronedb_spark.streaming.sessionize import stream_sessionize_native

    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    max_ts = events.agg({"ts": "max"}).collect()[0][0]
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    emitted = []

    def run(df):
        df.coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_sessionize_native(
                spark.readStream.schema(df.schema).parquet(src), gap_s=1800
            )
            .writeStream.foreachBatch(
                lambda d, _eid: emitted.extend(tuple(r) for r in d.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    run(events)
    run(
        spark.createDataFrame(
            [(9_000_001, max_ts + dt.timedelta(days=40), -1, 0.0)],
            events.schema,
        )
    )
    got = {t for t in emitted if t[0] != -1}
    want = {
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(events).collect()
    }
    assert got == want and len(want) > 100
