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
