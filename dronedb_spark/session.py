"""SparkSession factory tuned for the test harness (local mode) while
keeping settings that carry to a real cluster (AQE, shuffle partitions,
Arrow).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dronedb_spark", cpus: int | None = None) -> SparkSession:
    """Build or reuse a SparkSession.

    Cluster-relevant settings (AQE, skew-join handling, Arrow transfer,
    partition sizing) are set here; local-only knobs (driver memory) are
    harmless on a cluster where they'd be overridden by spark-submit.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("DDB_SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # No \r stage-progress spam: the bench driver records a bounded
        # stdout tail, and progress bars were drowning the final JSON
        # line out of it (BENCH_r12 tail was 100% progress-bar output).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # A task occasionally stalls for seconds on block-manager cleanup
        # contention (local mode shares one JVM); speculation re-launches
        # the straggler — the same defense a real cluster needs against a
        # slow node, so this setting carries to the 1000-executor case.
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "250ms")
        .config("spark.speculation.multiplier", "3")
        .config("spark.speculation.quantile", "0.75")
        # Partitioning on a SUBSET of the join keys (catalog bucketed by
        # path; delta joins on (path, hash)) is semantically sufficient
        # for co-partitioning; Spark's conservative default would insert
        # a full re-shuffle of both catalogs.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
