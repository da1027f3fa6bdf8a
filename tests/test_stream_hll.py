"""Streaming HLL registers == batch registers (streaming/hll.py vs
text/sketch.py) — the built-in update-mode register max-merge, fed in
multiple availableNow microbatches, must converge to exactly the batch
register table; the trajectory twin's final day must equal the
whole-corpus state."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.streaming.hll import hll_register_trajectory, stream_hll_registers
from dronedb_spark.tables import load
from dronedb_spark.text.sketch import M, _hll_state, hll_user_registers


def test_stream_registers_match_batch(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events").select("user_id", "ts")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = {}

    def absorb(df, _eid):
        for r in df.collect():
            state[r["bucket"]] = r["max_rho"]

    # three day-sliced appends, one availableNow run each — the update
    # stream's final state must not depend on the trigger boundaries
    day = F.expr("unix_micros(ts) DIV 86400000000")
    cuts = [10, 20, 10_000]
    lo = -1
    d0 = events.select("user_id", "ts", day.alias("d"))
    dmin = d0.agg(F.min("d")).collect()[0][0]
    for hi in cuts:
        batch = d0.filter((F.col("d") - dmin > lo) & (F.col("d") - dmin <= hi))
        lo = hi
        if batch.isEmpty():
            continue
        batch.select("user_id", "ts").coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_hll_registers(
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                ).parquet(src)
            )
            .writeStream.foreachBatch(absorb)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    batch_regs = {
        r["bucket"]: r["max_rho"]
        for r in hll_user_registers(events, None).collect()
    }
    assert state == batch_regs
    assert 0 < len(state) <= M


def test_trajectory_is_monotone_and_ends_at_full_state(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    traj = sorted(
        (r["day"], r["n_seen"], r["s_inv"], r["n_zero"])
        for r in hll_register_trajectory(events).collect()
    )
    # registers only fill: n_seen non-decreasing, s_inv non-increasing
    for a, b in zip(traj, traj[1:]):
        assert b[1] >= a[1] and b[2] <= a[2] and b[3] <= a[3]
    full = _hll_state(hll_user_registers(events, None), "full").collect()[0]
    assert traj[-1][2] == full["s_inv"] and traj[-1][3] == full["n_zero"]
