"""Per-user engagement rollups over gap-based sessions — the summary
layer ABOVE the session table: ``streaming/stateful.py`` produces the
session rows themselves (batch twin ``events_sessionize`` +
``applyInPandasWithState`` streaming runtime) and
``operators/sessions.py`` sessionizes the CATALOG with a haversine
gate; this module answers the per-USER questions product analytics
asks of those sessions (how many, how large, how long), with the
rollup reusing the sessionization window's partitioning so the whole
profile costs one exchange.

Exactness: all arithmetic is integer epoch-microseconds
(``unix_micros``; DuckDB ``epoch_us``), ordering is (ts, event_id) —
deterministic under timestamp ties; durations are microsecond
differences ``DIV``-ed to whole seconds so no float exists anywhere.

Scale shape: LAG + flag + running SUM windows partition by user — the
embarrassingly-parallel per-key sessionization every engine ships; the
per-user rollup is one map-side-combinable aggregate over the already
user-partitioned rows (the window's exchange is reused, no second
shuffle).  No global sort exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

GAP_S = 1800  # 30 minutes of inactivity ends a session


def sessionize(events: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """(user_id, session_no, n_events, start_us, end_us, duration_s):
    one row per session, sessions numbered 1.. per user in time order."""
    gap_us = gap_s * 1_000_000
    e = events.select(
        "user_id", F.expr("unix_micros(ts)").alias("t_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = e.select(
        "user_id",
        "t_us",
        F.when(
            F.lag("t_us").over(w).isNull()
            | ((F.col("t_us") - F.lag("t_us").over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    numbered = flagged.select(
        "user_id",
        "t_us",
        F.sum("new_sess")
        .over(
            Window.partitionBy("user_id")
            .orderBy("t_us")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("t_us").alias("start_us"),
        F.max("t_us").alias("end_us"),
        F.expr("(max(t_us) - min(t_us)) DIV 1000000").alias("duration_s"),
    )


def session_rollup(events: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """Per-user session profile: session count, event total, the
    largest session (events), and total in-session seconds — the
    engagement row an analytics job materializes per user."""
    s = sessionize(events, gap_s)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
        F.sum("duration_s").cast("bigint").alias("total_session_s"),
    )


@check(
    "sessionize_gap_windows",
    oracle=f"""
        WITH e AS (
            SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
        flagged AS (
            SELECT user_id, t_us,
                   CASE WHEN LAG(t_us) OVER
                             (PARTITION BY user_id ORDER BY t_us, event_id)
                             IS NULL
                          OR t_us - LAG(t_us) OVER
                             (PARTITION BY user_id ORDER BY t_us, event_id)
                             > {GAP_S * 1_000_000}
                        THEN 1 ELSE 0 END AS new_sess
            FROM e),
        numbered AS (
            SELECT user_id, t_us,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_no
            FROM flagged),
        sess AS (
            SELECT user_id, session_no,
                   COUNT(*) AS n_events,
                   MIN(t_us) AS start_us, MAX(t_us) AS end_us,
                   CAST((MAX(t_us) - MIN(t_us)) // 1000000 AS BIGINT)
                       AS duration_s
            FROM numbered GROUP BY user_id, session_no)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(MAX(n_events) AS BIGINT) AS max_session_events,
               CAST(SUM(duration_s) AS BIGINT) AS total_session_s
        FROM sess GROUP BY user_id ORDER BY user_id""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization of the event stream rolled up per
    user: session counts, event totals, the largest session, and total
    in-session seconds — all integer-exact epoch arithmetic."""
    return session_rollup(load(spark, sf_dir, "events")).orderBy("user_id")
