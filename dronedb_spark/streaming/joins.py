"""Stream-stream joins — windowed event attribution as a continuous
operator (beyond the reference; the one core Structured Streaming
capability the streaming family didn't yet exercise).

``stream_attribution`` joins two unbounded streams (views, clicks) on
the user key with an event-time range: a click attributes to every view
by the same user in the preceding ``horizon``.  Both sides carry
watermarks and the join condition bounds event time in BOTH directions,
so Spark can evict join state once the watermark passes — state is
bounded by horizon × arrival rate, the property that keeps a
stream-stream join feasible forever (an unbounded-range join would
buffer a side in perpetuity).

The batch twin states the same predicate as a plain equi+range join —
the equi key (user) drives the shuffle; the range is a post-join
filter, so there is no interval-explosion and no cartesian anywhere.
tests/test_streaming.py pins stream == batch twin on the same input;
the driver check pins batch twin == oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HORIZON = "30 minutes"


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return views, clicks


def stream_attribution(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """(view, click) pairs within the horizon over a live stream —
    inner stream-stream join, state evicted past the watermark."""
    views, clicks = _sides(events_stream)
    v = views.withWatermark("view_ts", watermark)
    c = clicks.withWatermark("click_ts", watermark)
    return v.join(
        c,
        (v["user_id"] == c["user_id"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {HORIZON}")),
    ).select(
        v["user_id"], "view_id", "view_ts", "click_id", "click_ts"
    )


def attribution_batch(events: DataFrame) -> DataFrame:
    """Batch twin: identical predicate, plain equi+range join."""
    views, clicks = _sides(events)
    return views.join(
        clicks,
        ["user_id"],
    ).filter(
        (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {HORIZON}"))
    ).select("user_id", "view_id", "view_ts", "click_id", "click_ts")


# ------------------------------------------------------------------ check


def _register_check() -> None:
    from pyspark.sql import SparkSession

    from dronedb_spark.suite import check
    from dronedb_spark.tables import load

    @check(
        "stream_attribution_twin",
        oracle="""
            SELECT v.user_id,
                   CAST(COUNT(1) AS BIGINT) AS n_pairs,
                   CAST(SUM(date_diff('second', v.ts, c.ts)) AS BIGINT)
                       AS sum_lag_s,
                   CAST(MIN(c.event_id) AS BIGINT) AS first_click
            FROM events v JOIN events c
              ON v.user_id = c.user_id
             AND v.event_type = 'view' AND c.event_type = 'click'
             AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
            GROUP BY v.user_id ORDER BY v.user_id""",
    )
    def q_stream_attribution_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
        """View→click attribution within 30 min, batch twin of the
        stream-stream join: pair count, integer lag-second sum (pins
        WHICH pairs matched), and first click id, per user."""
        pairs = attribution_batch(load(spark, sf_dir, "events"))
        lag = F.col("click_ts").cast("long") - F.col("view_ts").cast("long")
        return (
            pairs.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(lag).cast("bigint").alias("sum_lag_s"),
                F.min("click_id").alias("first_click"),
            )
            .orderBy("user_id")
        )


_register_check()
