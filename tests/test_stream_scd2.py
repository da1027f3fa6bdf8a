"""Streaming SCD2 == batch twin (streaming/scd2.py vs operators/scd2.py)."""

from __future__ import annotations

import pytest

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


@pytest.mark.heavy
def test_reordered_stream_matches_batch_under_out_of_order_arrival(
    spark, tmp_path
):
    """The watermark reorder front: microbatches arrive with
    INTERLEAVED and BACKFILLED timestamps (bounded by the delay), and
    the emitted closed episodes still equal the batch build's — plus a
    genuinely-late row (beyond the delay) is dropped without corrupting
    any episode."""
    import datetime as dt

    from dronedb_spark.streaming.scd2 import stream_scd2_reordered

    def ts(sec):
        return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=sec)

    schema = "event_id bigint, ts timestamp, user_id bigint, value double"
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    emitted = []
    run_no = [0]

    def run_file(rows):
        run_no[0] += 1
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            stream_scd2_reordered(
                spark.readStream.schema(schema).parquet(src),
                _TIER,
                delay="500 seconds",
            )
            .writeStream.foreachBatch(
                lambda df, _eid: emitted.extend(tuple(r) for r in df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # real events for user 7, EVENT-TIME order: 100 low, 200 low,
    # 300 high, 450 high, 600 low — arrival order scrambles them
    # across microbatches within the 500 s watermark delay
    real = [
        (2, ts(300), 7, 400.0),   # high
        (4, ts(600), 7, 10.0),    # low
        (1, ts(100), 7, 20.0),    # low   (backfilled after later events)
        (5, ts(450), 7, 350.0),   # high
        (3, ts(200), 7, 30.0),    # low
    ]
    run_file(real[0:2])           # batch 1: t=300, t=600 → wm 0, then 100
    run_file([real[2], real[3]])  # batch 2: backfill t=100, t=450
    run_file([real[4]])           # batch 3: backfill t=200
    # flush: two far-future sentinels push the watermark past the reals
    run_file([(90, ts(2000), 7, 999.0)])
    run_file([(91, ts(2100), 7, 999.0)])

    want = {
        (r["user_id"], r["state"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"])
        for r in scd2_intervals(
            spark.createDataFrame(real, schema), "user_id", F.expr(_TIER)
        )
        .filter(F.col("is_current") == 0)
        .collect()
    }
    assert set(emitted) == want
    assert len(want) == 2  # (low,100→300,n=2), (high,300→600,n=2)

    # a row later than the delay (t=500 while wm=1500) is DROPPED —
    # nothing new may be emitted and state stays consistent
    run_file([(6, ts(500), 7, 999.0)])
    run_file([(92, ts(2200), 7, 999.0)])
    assert set(emitted) == want
