"""Multi-window error-budget burn-rate alerts — the SRE-workbook
alerting rule (Beyer et al., ch. 5: alert when BOTH a long and a short
trailing window burn the error budget faster than a threshold; the
short window gates on "still happening", the long on "material
damage").  The telemetry complement of CUSUM (changepoint detection):
CUSUM finds WHERE the regime shifted, the burn rule decides whether to
wake someone NOW.  Beyond the reference (no ops-analytics surface).

Exactness discipline: burn-rate comparisons never divide — with budget
``bp`` permille and threshold ``thr×10`` (one decimal), window (e, t)
burns iff ``10000·e > thr_x10·bp·t`` (all BIGINTs).  Windows anchor to
the stream's LAST event time (integer microseconds).

Scale shape: both windows of both rules are conditional sums in ONE
pass over the events scan (the constraint-audit discipline) after a
1-row broadcast of t_max; output is rules-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

BUDGET_PERMILLE = 200  # SLO: ≤20% errors (the fixture is error-rich)
_US = 1_000_000

# (rule, long_window_s, short_window_s, threshold ×10)
RULES = (
    ("page", 3600 * 6, 3600, 12),     # burn > 1.2 on 6 h AND 1 h
    ("ticket", 86400 * 3, 3600 * 6, 10),  # burn > 1.0 on 3 d AND 6 h
)


def burn_rate_alerts(
    events: DataFrame,
    budget_permille: int = BUDGET_PERMILLE,
    rules=RULES,
) -> DataFrame:
    """(rule, long_errors, long_total, short_errors, short_total,
    fired): trailing-window burn evaluation at the stream's end."""
    tmax = events.agg(F.max(F.expr("unix_micros(ts)")).alias("_tmax"))
    base = events.join(F.broadcast(tmax)).select(
        F.expr("unix_micros(ts)").alias("t_us"),
        (F.col("event_type") == "error").cast("int").alias("is_err"),
        "_tmax",
    )
    aggs = []
    for rule, long_s, short_s, _ in rules:
        for tag, win_s in (("long", long_s), ("short", short_s)):
            in_w = (F.col("t_us") > F.col("_tmax") - win_s * _US).cast("int")
            aggs.append(
                F.sum(in_w * F.col("is_err")).cast("bigint").alias(f"_e_{rule}_{tag}")
            )
            aggs.append(F.sum(in_w).cast("bigint").alias(f"_t_{rule}_{tag}"))
    row = base.agg(*aggs)
    cells = []
    for rule, _, _, thr_x10 in rules:
        e_l, t_l = F.col(f"_e_{rule}_long"), F.col(f"_t_{rule}_long")
        e_s, t_s = F.col(f"_e_{rule}_short"), F.col(f"_t_{rule}_short")
        burns = (
            (e_l * 10000 > F.lit(thr_x10 * budget_permille) * t_l)
            & (e_s * 10000 > F.lit(thr_x10 * budget_permille) * t_s)
        )
        cells.append(
            F.struct(
                F.lit(rule).alias("rule"),
                e_l.alias("long_errors"),
                t_l.alias("long_total"),
                e_s.alias("short_errors"),
                t_s.alias("short_total"),
                burns.cast("bigint").alias("fired"),
            )
        )
    return row.select(F.explode(F.array(*cells)).alias("c")).select(
        "c.rule",
        "c.long_errors",
        "c.long_total",
        "c.short_errors",
        "c.short_total",
        "c.fired",
    )


def _rule_sql(rule: str, long_s: int, short_s: int, thr_x10: int) -> str:
    def win(tag: str, win_s: int) -> str:
        return f"""
            SUM(CASE WHEN t_us > tmax - {win_s * _US}
                      AND is_err = 1 THEN 1 ELSE 0 END) AS e_{tag},
            SUM(CASE WHEN t_us > tmax - {win_s * _US}
                     THEN 1 ELSE 0 END) AS t_{tag}"""

    return f"""
        SELECT '{rule}' AS rule,
               CAST(e_long AS BIGINT) AS long_errors,
               CAST(t_long AS BIGINT) AS long_total,
               CAST(e_short AS BIGINT) AS short_errors,
               CAST(t_short AS BIGINT) AS short_total,
               CAST(CASE WHEN e_long * 10000
                              > {thr_x10 * BUDGET_PERMILLE} * t_long
                          AND e_short * 10000
                              > {thr_x10 * BUDGET_PERMILLE} * t_short
                         THEN 1 ELSE 0 END AS BIGINT) AS fired
        FROM (SELECT {win("long", long_s)}, {win("short", short_s)}
              FROM base)"""


@check(
    "slo_burn_alerts",
    oracle=f"""
        WITH base AS (
            SELECT epoch_us(ts) AS t_us,
                   CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
                   (SELECT MAX(epoch_us(ts)) FROM events) AS tmax
            FROM events)
        {_rule_sql(*RULES[0])}
        UNION ALL
        {_rule_sql(*RULES[1])}
        ORDER BY rule""",
)
def q_slo_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page and ticket burn rules over the events month, anchored to
    the last event: integer cross-multiplied thresholds, both windows
    of both rules in one scan."""
    return burn_rate_alerts(load(spark, sf_dir, "events")).orderBy("rule")
