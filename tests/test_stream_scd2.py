"""Streaming SCD2 == batch twin (streaming/scd2.py vs operators/scd2.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.operators.scd2 import _TIER, scd2_intervals
from dronedb_spark.streaming.scd2 import stream_scd2
from dronedb_spark.tables import load


def test_stream_closed_episodes_match_batch(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events")
    src = str(tmp_path / "events_scd2")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = stream_scd2(stream, _TIER)
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["state"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"])
        for r in spark.sql("SELECT * FROM scd2_stream_test").collect()
    }
    want = {
        (r["user_id"], r["state"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"])
        for r in scd2_intervals(events, "user_id", F.expr(_TIER))
        .filter(F.col("is_current") == 0)  # stream emits CLOSED episodes
        .collect()
    }
    assert got == want
    assert len(got) > 100  # non-trivial corpus


def test_open_episodes_stay_in_state(spark, tmp_path):
    import datetime as dt

    rows = [
        (1, dt.datetime(2026, 1, 1, 0, 0), 7, 10.0),   # low
        (2, dt.datetime(2026, 1, 1, 1, 0), 7, 350.0),  # high → closes low
        (3, dt.datetime(2026, 1, 1, 2, 0), 7, 400.0),  # high continues (open)
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    src = str(tmp_path / "mini")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream_scd2(stream, _TIER)
        .writeStream.format("memory")
        .queryName("scd2_mini")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM scd2_mini").collect()
    # only the low→high transition closed; the open high episode is state
    assert len(got) == 1
    r = got[0]
    assert (r["state"], r["n_events"]) == ("low", 1)
    assert r["valid_to_us"] > r["valid_from_us"]
