"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship STAC-style catalog query at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (and the
training-data pipeline extensions), keyed by check name.
``oracle_sql()`` — DuckDB-equivalent SQL per check (same column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from dronedb_spark.suite import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: STAC ItemCollection page
    (bbox + temporal + paging) over the derived entries catalog."""
    from dronedb_spark.operators.stac import q_stac_items_page

    return q_stac_items_page(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: c.spark_fn for name, c in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: c.oracle for name, c in _registry().items() if c.oracle is not None}
