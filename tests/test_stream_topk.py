"""Streaming per-key counts == batch counts (streaming/topk.py) across
arbitrary microbatch splits, and the trajectory twin's final day must
rank exactly the converged state."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.streaming.topk import (
    TOP_K,
    stream_user_counts,
    topk_trajectory,
)
from dronedb_spark.tables import load


def test_stream_counts_match_batch_and_final_day_ranks(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events").select("user_id", "ts")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = {}

    def absorb(df, _eid):
        for r in df.collect():
            state[r["user_id"]] = r["n_events"]

    day = F.expr("unix_micros(ts) DIV 86400000000")
    d0 = events.select("user_id", "ts", day.alias("d"))
    dmin = d0.agg(F.min("d")).collect()[0][0]
    lo = -1
    for hi in [3, 11, 10_000]:
        batch = d0.filter((F.col("d") - dmin > lo) & (F.col("d") - dmin <= hi))
        lo = hi
        if batch.isEmpty():
            continue
        batch.select("user_id", "ts").coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_user_counts(
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

    batch_counts = {
        r["user_id"]: r["cnt"]
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert state == batch_counts

    # the trajectory's last day == the converged state's own top-k
    traj = topk_trajectory(events).collect()
    last_day = max(r["day"] for r in traj)
    got = [
        (r["rank"], r["user_id"], r["n_events"])
        for r in sorted(traj, key=lambda r: r["rank"])
        if r["day"] == last_day
    ]
    want = sorted(
        batch_counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:TOP_K]
    assert got == [(i + 1, u, n) for i, (u, n) in enumerate(want)]


def test_trajectory_is_monotone_per_user(spark, sf_dir):
    """A user's cumulative count can only grow day over day wherever
    they appear on consecutive leaderboards."""
    traj = topk_trajectory(load(spark, sf_dir, "events")).collect()
    seen = {}
    for r in sorted(traj, key=lambda r: r["day"]):
        if r["user_id"] in seen:
            assert r["n_events"] >= seen[r["user_id"]]
        seen[r["user_id"]] = r["n_events"]
