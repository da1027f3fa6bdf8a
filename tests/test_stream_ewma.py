"""Streaming EWMA == batch twin (streaming/ewma.py vs operators/ewma.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dronedb_spark.operators.ewma import ewma_series
from dronedb_spark.streaming.ewma import stream_ewma
from dronedb_spark.tables import load


def test_stream_matches_batch_grid(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    lo_us, hi_us = events.agg(
        F.expr("min(unix_micros(ts))"), F.expr("max(unix_micros(ts))")
    ).collect()[0]
    origin_idx = lo_us // 3_600_000_000
    hi_idx = hi_us // 3_600_000_000

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    emitted = []

    def run_file(df):
        df.coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_ewma(
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                ).parquet(src),
                origin_idx=origin_idx,
                delay="2 hours",
            )
            .writeStream.foreachBatch(
                lambda d, _eid: emitted.extend(tuple(r) for r in d.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # split the month into two arrival halves (by event_id parity, NOT
    # by time — so each batch carries out-of-window events)... parity
    # would make rows arrive later than the 2h watermark allows, so
    # split by time with an overlap instead:
    mid = (lo_us + hi_us) // 2
    first = events.filter(F.expr(f"unix_micros(ts) <= {mid}"))
    second = events.filter(F.expr(f"unix_micros(ts) > {mid}"))
    run_file(first)
    run_file(second)
    # two flush sentinels: advance the watermark past the grid, then
    # fire the timeouts that drain every series to the final bucket
    flush_t = dt.datetime.fromtimestamp(hi_us / 1e6) + dt.timedelta(hours=8)
    sent = spark.createDataFrame(
        [("__flush__", flush_t, -1)], "event_type string, ts timestamp, event_id bigint"
    )
    sent2 = spark.createDataFrame(
        [("__flush__", flush_t + dt.timedelta(hours=1), -2)],
        "event_type string, ts timestamp, event_id bigint",
    )
    run_file(sent)
    run_file(sent2)

    got = {
        t for t in emitted
        if t[0] != "__flush__" and t[1] <= hi_idx * 3600
    }
    want = {
        tuple(r)
        for r in ewma_series(
            load(spark, sf_dir, "events")
        ).collect()
    }
    assert got == want
    assert len(want) == 5 * 720  # 5 types x 720 grid hours
    # beyond the batch grid the stream keeps decaying on zeros — every
    # post-grid row it emitted is a zero-count step
    post = [t for t in emitted if t[0] != "__flush__" and t[1] > hi_idx * 3600]
    assert all(t[2] == 0 for t in post)
