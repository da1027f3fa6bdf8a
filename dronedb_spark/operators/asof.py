"""As-of (point-in-time) join — a custom temporal operator Spark lacks.

Matches each event to the MOST RECENT dimension snapshot at or before the
event's time — the join every feature-store / training-data pipeline
needs ("what was the user's state when this event happened").  The
reference has no temporal joins (SURVEY §2.3); this is a north-star
extension, and DuckDB's native ``ASOF JOIN`` provides a true independent
oracle for it.

Spark-first implementation (no native as-of): the classic union-merge —
tag snapshots 0 and events 1, union, and take the running ``last``
non-null snapshot value over a window ordered by (time, tag) per key.
One shuffle on the join key, one per-key sort — the same cost profile as
a sort-merge join, and skew on a hot key is AQE's problem like any other
shuffle.  No broadcast needed on either side, so BOTH sides scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load


def asof_join(
    events: DataFrame,
    snapshots: DataFrame,
    key: str,
    ts_col: str,
    snap_ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """events ⟕asof snapshots on `key`, event time >= snapshot time.

    The snapshot's value columns travel as ONE struct, so the running
    ``last`` matches a whole snapshot ROW — per-column ``last(ignorenulls)``
    would skip a NULL value in the most recent snapshot in favor of an
    older non-NULL one, drifting from row-wise ASOF semantics (and the
    DuckDB oracle) whenever snapshot columns contain NULLs."""
    import pyspark.sql.types as T

    snap_struct = F.struct(*[F.col(c) for c in value_cols])
    snap = snapshots.select(
        F.col(key),
        F.col(snap_ts_col).alias("_t"),
        F.lit(0).alias("_tag"),
        snap_struct.alias("_snap"),
    )
    struct_type = T.StructType(
        [T.StructField(c, snapshots.schema[c].dataType, True) for c in value_cols]
    )
    extra = [c for c in events.columns if c not in (key, ts_col)]
    ev = events.select(
        F.col(key),
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(struct_type).alias("_snap"),
        *[F.col(c) for c in extra],
    )
    # ordering (time, tag): a snapshot at exactly the event time sorts
    # first and is therefore matched (>= semantics, like DuckDB ASOF)
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.unionByName(snap, allowMissingColumns=True).select(
        "*", F.last(F.col("_snap"), ignorenulls=True).over(w).alias("_asof")
    )
    ev_cols = [c for c in events.columns if c not in (key, ts_col)]
    return (
        filled.filter(F.col("_tag") == 1)
        .withColumnRenamed("_t", ts_col)
        .select(
            key,
            ts_col,
            *ev_cols,
            *[F.col(f"_asof.{c}").alias(c) for c in value_cols],
        )
    )


def _snapshots(events: DataFrame) -> DataFrame:
    """Deterministic user-status snapshot table derived from events: one
    snapshot per (user, day-ish bucket) with a computable status string —
    shared semantics with the oracle CTE."""
    return (
        events.groupBy("user_id", (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 21600).alias("snap_s"))
        .agg(F.count(F.lit(1)).alias("n_in_bucket"))
        .select(
            "user_id",
            F.timestamp_seconds(F.col("snap_s")).alias("snap_ts"),
            F.concat(F.lit("tier_"), (F.col("n_in_bucket") % 3).cast("string")).alias("status"),
        )
    )


@check(
    "asof_join_events",
    oracle="""
        WITH snaps AS (
            SELECT user_id,
                   to_timestamp(snap_s) AS snap_ts,
                   'tier_' || CAST(n_in_bucket % 3 AS STRING) AS status
            FROM (
                SELECT user_id,
                       epoch(ts) - epoch(ts) % 21600 AS snap_s,
                       COUNT(1) AS n_in_bucket
                FROM events GROUP BY 1, 2) b),
        ev AS (SELECT user_id, ts, event_id, value FROM events WHERE event_id % 7 = 0)
        SELECT ev.user_id, CAST(ev.event_id AS BIGINT) AS event_id, ev.value,
               CAST(FLOOR(epoch(ev.ts)) AS BIGINT) AS ts_s,
               CAST(epoch(s.snap_ts) AS BIGINT) AS snap_s,
               s.status
        FROM ev ASOF LEFT JOIN snaps s
          ON ev.user_id = s.user_id AND ev.ts >= s.snap_ts
        ORDER BY event_id""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    snaps = _snapshots(events)
    ev = events.filter(F.col("event_id") % 7 == 0).select("user_id", "ts", "event_id", "value")
    joined = asof_join(ev, snaps.withColumn("snap_s", F.unix_timestamp("snap_ts")),
                       "user_id", "ts", "snap_ts", ["snap_s", "status"])
    # No final orderBy: the driver comparator sorts row tuples and there is
    # no LIMIT, so a global sort would only add a range-partitioning
    # sampling job + exchange (measured 0.9s -> 0.4s at sf0.1 without it).
    return joined.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        "value",
        F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
        F.col("snap_s").cast("bigint").alias("snap_s"),
        "status",
    )
