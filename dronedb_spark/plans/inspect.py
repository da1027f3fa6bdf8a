"""Physical-plan inspection helpers — the engine's scale guardrails.

These are used by tests to pin the plans we designed for: filters pushed
to the Parquet scan (SURVEY X1-X3), small dims broadcast, partial
aggregation before shuffles, no cartesian products.  A plan regression
(e.g. a filter that stops pushing down after a refactor) fails CI rather
than silently becoming a full scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters fragments of every scan in the plan."""
    plan = formatted(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    p = physical_plan(df)
    return "CartesianProduct" in p or ("BroadcastNestedLoopJoin" in p and "Cross" in p)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Partial+final hash aggregation (map-side combine before shuffle)."""
    p = physical_plan(df)
    return p.count("HashAggregate") >= 2 or "partial_" in p


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (lower is better for a fixed result)."""
    return physical_plan(df).count("Exchange ")
