"""Ordered-funnel analysis — "of the users who VIEWED, how many went
on to CLICK, then PURCHASE, and when?" — the event-analytics staple
(every product-analytics engine ships it; here in the exact-arithmetic
house style).  Step k's timestamp is the FIRST occurrence of step k's
event STRICTLY AFTER the user's step-(k-1) time, so out-of-order
events (a purchase before any view) never count — the semantic that
separates a funnel from three independent MINs.

Shape: one conditional-min aggregate pass per step (map-side
combinable), each joined back on user_id to gate the next step —
K small passes instead of per-user event-array folds, so memory stays
bounded however active a user is and no Python touches the data.
Times are integer epoch-micros end to end (``unix_micros``), absent
steps sentinel to -1 (the driver comparator's NULL discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

STEPS = ("view", "click", "purchase")
WITHIN_S = 86_400  # conversion window between consecutive steps


def funnel_times(
    events: DataFrame,
    steps: tuple[str, ...] = STEPS,
    within_s: int | None = WITHIN_S,
) -> DataFrame:
    """(user_id, t1_us..tK_us, reached): strictly-ordered first-arrival
    times per funnel step, -1 where the user never got there.  With
    ``within_s`` set, step k must land within that window of step k-1
    (the product-analytics conversion-window semantic); None removes
    the bound."""
    # out at step k is referenced TWICE by step k+1 (the gate join and
    # the left attach), so the lazy chain re-ran all earlier steps per
    # later step — per-step localCheckpoint truncates it (the linkgraph
    # superstep discipline; measured 1.58 s lazy vs 1.25 s checkpointed
    # at sf0.1, and the gap grows with step count).  ev itself is NOT
    # persisted: measured slower (1.89 s) — the three narrow gates are
    # cheaper than the cache populate at this row weight.
    ev = events.select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("t_us")
    )
    users = ev.select("user_id").distinct()
    out = users
    prev_col = None
    for i, step in enumerate(steps, start=1):
        gated = ev.filter(F.col("event_type") == step)
        if prev_col is not None:
            gated = gated.join(
                out.select("user_id", F.col(prev_col).alias("_prev")), "user_id"
            ).filter((F.col("_prev") >= 0) & (F.col("t_us") > F.col("_prev")))
            if within_s is not None:
                gated = gated.filter(
                    F.col("t_us") <= F.col("_prev") + F.lit(within_s * 1_000_000)
                )
        step_t = gated.groupBy("user_id").agg(F.min("t_us").alias(f"t{i}_us"))
        out = out.join(step_t, "user_id", "left").withColumn(
            f"t{i}_us", F.coalesce(f"t{i}_us", F.lit(-1)).cast("bigint")
        )
        if i < len(steps):
            out = out.localCheckpoint()
        prev_col = f"t{i}_us"
    reached = sum(
        (F.col(f"t{i}_us") >= 0).cast("int") for i in range(1, len(steps) + 1)
    )
    return out.withColumn("reached", reached.cast("int"))


@check(
    "funnel_view_click_purchase",
    oracle=f"""
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
        users AS (SELECT DISTINCT user_id FROM ev),
        s1 AS (
            SELECT user_id, MIN(t_us) AS t1_us FROM ev
            WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (
            SELECT e.user_id, MIN(e.t_us) AS t2_us
            FROM ev e JOIN s1 ON s1.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.t_us > s1.t1_us
              AND e.t_us <= s1.t1_us + {WITHIN_S * 1_000_000}
            GROUP BY e.user_id),
        s3 AS (
            SELECT e.user_id, MIN(e.t_us) AS t3_us
            FROM ev e JOIN s2 ON s2.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.t_us > s2.t2_us
              AND e.t_us <= s2.t2_us + {WITHIN_S * 1_000_000}
            GROUP BY e.user_id)
        SELECT u.user_id,
               CAST(COALESCE(s1.t1_us, -1) AS BIGINT) AS t1_us,
               CAST(COALESCE(s2.t2_us, -1) AS BIGINT) AS t2_us,
               CAST(COALESCE(s3.t3_us, -1) AS BIGINT) AS t3_us,
               CAST(CASE WHEN s1.user_id IS NULL THEN 0
                         WHEN s2.user_id IS NULL THEN 1
                         WHEN s3.user_id IS NULL THEN 2 ELSE 3 END AS INT)
                   AS reached
        FROM users u
        LEFT JOIN s1 ON s1.user_id = u.user_id
        LEFT JOIN s2 ON s2.user_id = u.user_id
        LEFT JOIN s3 ON s3.user_id = u.user_id
        ORDER BY u.user_id""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase within a 24h conversion window, per
    user: strictly-ordered first arrivals in epoch-micros (fixture
    funnel: 150 viewed → 60 clicked → 25 purchased)."""
    return funnel_times(load(spark, sf_dir, "events")).orderBy("user_id")


def conversion_latencies(
    events: DataFrame,
    steps: tuple[str, ...] = STEPS,
    within_s: int | None = WITHIN_S,
) -> DataFrame:
    """(step_pair, n, p50_us, p90_us): time-to-convert between
    consecutive funnel steps, over the users who made each transition —
    the funnel's companion metric (a conversion that takes 23 hours and
    one that takes 40 seconds are different products).  Quantiles are
    TYPE-1 order statistics (ties by user_id): integer epoch-micro
    deltas, engine-exact picks, no interpolation."""
    t = funnel_times(events, steps, within_s)
    pairs = []
    for i in range(1, len(steps)):
        a, b = f"t{i}_us", f"t{i + 1}_us"
        pairs.append(
            t.filter((F.col(a) >= 0) & (F.col(b) >= 0)).select(
                F.lit(f"{steps[i - 1]}->{steps[i]}").alias("step_pair"),
                (F.col(b) - F.col(a)).alias("delta_us"),
                "user_id",
            )
        )
    deltas = pairs[0]
    for p in pairs[1:]:
        deltas = deltas.unionByName(p)
    w = Window.partitionBy("step_pair")
    staged = deltas.select(
        "step_pair",
        "delta_us",
        F.row_number().over(w.orderBy("delta_us", "user_id")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    picks = staged.filter(
        (F.col("rk") == F.expr("(50 * n + 99) DIV 100"))
        | (F.col("rk") == F.expr("(90 * n + 99) DIV 100"))
    )
    return (
        picks.groupBy("step_pair")
        .agg(
            F.first("n").cast("bigint").alias("n"),
            F.min(
                F.when(F.col("rk") == F.expr("(50 * n + 99) DIV 100"), F.col("delta_us"))
            ).cast("bigint").alias("p50_us"),
            F.min(
                F.when(F.col("rk") == F.expr("(90 * n + 99) DIV 100"), F.col("delta_us"))
            ).cast("bigint").alias("p90_us"),
        )
    )



@check(
    "funnel_conversion_latency",
    oracle=f"""
        WITH ev AS (
            SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
        s1 AS (
            SELECT user_id, MIN(t_us) AS t1 FROM ev
            WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (
            SELECT e.user_id, MIN(e.t_us) AS t2
            FROM ev e JOIN s1 ON s1.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.t_us > s1.t1
              AND e.t_us <= s1.t1 + {WITHIN_S * 1_000_000}
            GROUP BY e.user_id),
        s3 AS (
            SELECT e.user_id, MIN(e.t_us) AS t3
            FROM ev e JOIN s2 ON s2.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.t_us > s2.t2
              AND e.t_us <= s2.t2 + {WITHIN_S * 1_000_000}
            GROUP BY e.user_id),
        deltas AS (
            SELECT 'view->click' AS step_pair, s2.t2 - s1.t1 AS delta_us,
                   s2.user_id
            FROM s2 JOIN s1 ON s1.user_id = s2.user_id
            UNION ALL
            SELECT 'click->purchase', s3.t3 - s2.t2, s3.user_id
            FROM s3 JOIN s2 ON s2.user_id = s3.user_id),
        staged AS (
            SELECT step_pair, delta_us,
                   ROW_NUMBER() OVER (PARTITION BY step_pair
                       ORDER BY delta_us, user_id) AS rk,
                   COUNT(*) OVER (PARTITION BY step_pair) AS n
            FROM deltas)
        SELECT step_pair, CAST(ANY_VALUE(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN rk = (50 * n + 99) // 100
                             THEN delta_us END) AS BIGINT) AS p50_us,
               CAST(MIN(CASE WHEN rk = (90 * n + 99) // 100
                             THEN delta_us END) AS BIGINT) AS p90_us
        FROM staged
        WHERE rk = (50 * n + 99) // 100 OR rk = (90 * n + 99) // 100
        GROUP BY step_pair ORDER BY step_pair""",
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90 time-to-convert for both funnel transitions under the
    24h window — exact order-statistic picks over epoch-micro deltas."""
    return conversion_latencies(load(spark, sf_dir, "events")).orderBy("step_pair")
