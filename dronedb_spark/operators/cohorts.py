"""Cohort retention — the other event-analytics staple next to the
funnel (``operators/funnel.py``): group users by the week of their
FIRST event (the cohort), then count how many of each cohort are still
active k weeks later — the retention triangle every growth dashboard
draws.

Exactness: weeks are integer epoch arithmetic (``epoch_days DIV 7``;
no calendar functions whose week-numbering conventions differ between
engines), activity is a (user, week) DISTINCT, and the triangle is a
COUNT DISTINCT over exact integers.

Shape: first-event week is one map-side-combinable MIN per user
(broadcastable — one row per user); the (user, week) activity table
dedupes in the same shuffle that the cohort join reuses; the triangle
rollup is one aggregate.  Nothing scales with per-user event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

_WEEK = "unix_micros(ts) DIV 604800000000"  # epoch weeks (7*86400*1e6 us)


def cohort_retention(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_active): the retention triangle.
    cohort_week = the user's first active epoch-week; offset 0 row is
    the cohort's size by construction."""
    activity = events.select(
        "user_id", F.expr(_WEEK).cast("bigint").alias("week")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = activity.join(F.broadcast(cohorts), "user_id")
    return (
        j.select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )


# The uniform fixture has every user active every week (retention 100%
# everywhere — nothing to check).  The driver check derives a sparse
# activity pattern deterministically: a user participates in a week
# only when (user_id·7 + week) divides by their personal period
# (2 + user_id % 5) — staggered first weeks AND churny offsets, same
# integer arithmetic in both engines.
_SPARSE = "(user_id * 7 + week) % (2 + user_id % 5) = 0"


@check(
    "cohort_retention",
    oracle=f"""
        WITH weeks AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 604800000000 AS week
            FROM events),
        activity AS (SELECT * FROM weeks WHERE {_SPARSE}),
        cohorts AS (
            SELECT user_id, MIN(week) AS cohort_week
            FROM activity GROUP BY user_id)
        SELECT c.cohort_week,
               CAST(a.week - c.cohort_week AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        FROM activity a JOIN cohorts c ON c.user_id = a.user_id
        GROUP BY c.cohort_week, a.week - c.cohort_week
        ORDER BY 1, 2""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohorts over the derived sparse-activity events: the exact
    retention triangle (staggered cohort starts, per-offset churn)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "week", F.expr(_WEEK).cast("bigint")
    )
    sparse = ev.filter(F.expr(_SPARSE)).drop("week")
    return cohort_retention(sparse).orderBy("cohort_week", "week_offset")


# ------------------------------------------------- rolling active users


def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """(day, dau, wau): exact daily actives and rolling-window actives
    (WAU for window=7) for every day in the span — the liveness curve
    next to the retention triangle.

    Exact sliding COUNT DISTINCT does not decompose into a window
    aggregate, so it computes as (user, day) dedup → a generated day
    grid range-joined against each user's active days within the
    window — the join is (days × activity) on a bounded integer range,
    grid rows are time-sized, and the heavy input collapses to the
    deduped activity table first (one map-side-combinable shuffle).
    Days are integer epoch-days (``DIV 86400``), engine-portable."""
    activity = events.select(
        "user_id", F.expr("unix_micros(ts) DIV 86400000000").cast("bigint").alias("day")
    ).distinct()
    span = activity.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    w = F.lit(window_days - 1)
    joined = days.join(
        activity.select(F.col("day").alias("aday"), "user_id"),
        (F.col("aday") <= F.col("day")) & (F.col("aday") >= F.col("day") - w),
        "left",  # zero-activity days stay on the curve with dau=wau=0
    )
    return (
        joined.groupBy("day")
        .agg(
            F.countDistinct(F.when(F.col("aday") == F.col("day"), F.col("user_id")))
            .cast("bigint")
            .alias("dau"),
            F.countDistinct("user_id").cast("bigint").alias("wau"),
        )
    )


@check(
    "rolling_active_users",
    oracle=f"""
        WITH weeks AS (
            SELECT user_id, ts,
                   epoch_us(ts) // 604800000000 AS week
            FROM events),
        activity AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS day
            FROM weeks WHERE {_SPARSE}),
        span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM activity),
        days AS (SELECT unnest(range(lo, hi + 1)) AS day FROM span)
        SELECT d.day,
               CAST(COUNT(DISTINCT CASE WHEN a.day = d.day
                                        THEN a.user_id END) AS BIGINT) AS dau,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau
        FROM days d
        LEFT JOIN activity a ON a.day <= d.day AND a.day >= d.day - 6
        GROUP BY d.day ORDER BY d.day""",
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU and rolling 7-day actives for every day of the events
    month, on the same derived sparse-activity pattern the retention
    check uses (uniform activity would pin every number to 150)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "week", F.expr(_WEEK).cast("bigint")
    )
    sparse = ev.filter(F.expr(_SPARSE)).drop("week")
    return rolling_active_users(sparse).orderBy("day")
