"""Custom stateful streaming operator: user sessionization via
``applyInPandasWithState`` — the "custom stateful operator" surface of
the engine (the reference has no streaming; this extends it per the
north star).

Semantics: events are grouped by user; a session closes after
``gap_seconds`` of inactivity (processing-time timeout for the streaming
case).  Emits one row per closed session: user_id, n_events, first/last
event time, total value.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("t_first", T.TimestampType()),
        T.StructField("t_last", T.TimestampType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("t_first", T.LongType()),
        T.StructField("t_last", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _sessionize(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, t0, t1, sv = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "t_first": pd.Timestamp(t0, unit="us"),
                    "t_last": pd.Timestamp(t1, unit="us"),
                    "sum_value": sv,
                }
            ]
        )
        return
    n, t0, t1, sv = state.get if state.exists else (0, None, None, 0.0)
    for pdf in pdfs:
        ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        n += len(pdf)
        t0 = int(ts_us.min()) if t0 is None else min(t0, int(ts_us.min()))
        t1 = int(ts_us.max()) if t1 is None else max(t1, int(ts_us.max()))
        sv += float(pdf["value"].sum())
    state.update((n, t0, t1, sv))
    state.setTimeoutDuration(30_000)  # close session after 30 s idle
    yield pd.DataFrame(
        columns=["user_id", "n_events", "t_first", "t_last", "sum_value"]
    ).astype({"user_id": "int64", "n_events": "int64", "sum_value": "float64"})


def stream_sessionize(events_stream: DataFrame) -> DataFrame:
    """Stateful sessionization over a streaming events DataFrame."""
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def batch_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch-mode sessionization (same semantics, event-time gaps):
    session boundaries via lag() window, session ids via running sum —
    the classic two-window formulation.  Ordered by (ts, event_id) so tie
    rows sessionize deterministically; session times emitted as epoch
    seconds (timezone-free for cross-engine comparison)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tl = F.col("ts").cast("long")
    gapped = events.withColumn(
        "new_session",
        (tl - F.lag(tl, 1, 0).over(w) > gap_seconds).cast("int"),
    )
    sess = gapped.withColumn("session_id", F.sum("new_session").over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(tl).alias("t_first_s"),
            F.max(tl).alias("t_last_s"),
            F.round(F.sum(F.col("value").cast("decimal(14,2)")), 2).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


from dronedb_spark.suite import check  # noqa: E402
from dronedb_spark.tables import load  # noqa: E402


@check(
    "events_sessionize",
    oracle="""
        WITH b AS (
            SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS tl,
                   CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                             - lag(CAST(floor(epoch(ts)) AS BIGINT), 1, 0)
                               OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events),
        s AS (
            SELECT *, SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY tl, event_id
                ROWS UNBOUNDED PRECEDING) AS session_id
            FROM b)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(1) AS BIGINT) AS n_events,
               MIN(tl) AS t_first_s, MAX(tl) AS t_last_s,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",
)
def q_sessionize(spark, sf_dir: str) -> DataFrame:
    df = batch_sessionize(load(spark, sf_dir, "events"))
    return df.withColumn("session_id", F.col("session_id").cast("bigint"))
