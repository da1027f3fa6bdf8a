"""Loaders for the driver-generated synthetic tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (applicationId, sf_dir, name) -> DataFrame.  Reusing the DataFrame
# object skips repeated parquet-footer/schema resolution across the
# driver's ~90 checks.  Keyed by applicationId so a fresh session (tests,
# bench, driver) never sees another session's plans.
#
# Deliberately NOT .persist()ed: measured at sf0.1 the block-manager cache
# gave ZERO steady-state speedup on the scan-light aggregations (q1 0.94s
# cached vs 0.94s direct) while costing ~1.5s population on first touch
# and destabilizing later queries via cache churn (dedup_neardup_pairs
# spiked 0.74 -> 2.35s) — the round-2 bench regressions.  At 100 TB
# persisting base tables would be wrong outright; parquet scans with
# pushdown ARE the fast path.
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _tune_session(spark: SparkSession) -> None:
    """Right-size shuffle width for whichever session runs our operators.

    A vanilla session keeps Spark's 200-partition default; on small/local
    inputs that is 200 near-empty reduce tasks per exchange — pure
    scheduling latency (measured ~20% of the correctness-gate wall).
    Only the untouched default is overridden, and only downward to the
    session's own parallelism, so a deliberately-configured cluster
    session is never second-guessed (AQE re-splits upward at need)."""
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            width = max(spark.sparkContext.defaultParallelism, 8)
            if width < 200:
                spark.conf.set("spark.sql.shuffle.partitions", str(width))
    except Exception:
        pass


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune_session(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    hit = _LOAD_CACHE.get(key)
    if hit is not None:
        return hit
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) — which
        # Spark's vectorized reader rejects, so it must be read as long
        # nanos and rebuilt — and TIMESTAMP(MICROS), which reads natively.
        # Adapt to whichever this dataset carries.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer `div` keeps the rebuild in pure long arithmetic —
            # the previous float-division form ((ts - ts%1000)/1000) went
            # through DOUBLE, which both adds per-row fp work on every
            # scan of events and would lose precision past 2^53
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        else:
            # native timestamp; normalize to session-TZ-agnostic NTZ→TS
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _LOAD_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the synthetic tables as temp views (mirrors the DuckDB
    oracle environment, where the same names are pre-registered)."""
    for name in names or TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


# (applicationId, semanticHash) -> input partition count, so repeated
# spread() calls on the same logical plan skip the df.rdd conversion
# (it compiles the plan each time; cheap but measurable across ~90
# driver checks).
_SPREAD_CACHE: dict[tuple[str, int], int] = {}


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism IF the input
    has fewer partitions — the small-file/heavy-compute fix.

    A CPU-heavy narrow stage (hashing, dot products, decode kernels)
    inherits the scan's partitioning; a corpus that arrives as a handful
    of files would run nearly single-threaded regardless of cluster
    size.  At 100 TB inputs have ~800k splits and this is a no-op (the
    condition fails), so the extra shuffle is only paid when it buys
    parallelism.  Measured 6x on the MinHash signature stage at sf0.1
    (1 input file, 32 cores)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        key = (df.sparkSession.sparkContext.applicationId, df.semanticHash())
    except Exception:
        key = None
    n = _SPREAD_CACHE.get(key) if key else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if key:
            _SPREAD_CACHE[key] = n
    if n < target:
        return df.repartition(target)
    return df


# (applicationId, plan semantic hash) -> persisted barrier DataFrame.
# ``barrier_persist`` is the CSE-barrier primitive for HOF-heavy
# pipelines (MinHash shingles, winnowing k-gram hashes): Catalyst's
# projection collapse re-inlines derived arrays into every higher-order
# lambda (no CSE there), so the array must be MATERIALIZED once.  A
# plain .persist() leaks storage in a long-running service; an eager
# localCheckpoint keeps lineage short but stores RDD rows (measured 5x
# slower than the columnar InMemoryRelation on the minhash stage at
# sf0.1).  This keyed LRU keeps the fast columnar cache AND bounds
# lifetime deterministically: at most _BARRIER_MAX distinct plans stay
# cached per session; eviction unpersists.  Re-running the same
# pipeline (bench best-of-3, repeated driver checks, a daily job on the
# same inputs) also reuses the cache instead of re-shingling.
from collections import OrderedDict

_BARRIER_CACHE: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_BARRIER_MAX = 8


def barrier_persist(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    try:
        key = (df.sparkSession.sparkContext.applicationId, df.semanticHash())
    except Exception:
        key = None
    if key is not None:
        hit = _BARRIER_CACHE.get(key)
        if hit is not None:
            # semanticHash is 32-bit and equal hashes do NOT guarantee
            # equal plans — confirm before serving the cached frame, or
            # a collision would silently substitute another pipeline's
            # data.  On mismatch fall through to a fresh persist (the
            # collided entry keeps its slot; correctness first).
            try:
                same = df.sameSemantics(hit)
            except Exception:
                same = False
            if same:
                _BARRIER_CACHE.move_to_end(key)
                return hit
    p = df.persist(StorageLevel.MEMORY_AND_DISK)
    if key is not None:
        if key in _BARRIER_CACHE:
            # Hash collision with a DIFFERENT plan (sameSemantics said no
            # above).  The collided entry keeps its slot: it may still be
            # referenced by an earlier caller, and unpersisting it here
            # would silently drop live cached data mid-pipeline.  The new
            # frame stays persisted for THIS caller but is not tracked.
            return p
        _BARRIER_CACHE[key] = p
        if len(_BARRIER_CACHE) > _BARRIER_MAX:
            _, old = _BARRIER_CACHE.popitem(last=False)
            try:
                old.unpersist()
            except Exception:
                pass
    return p


def reset_run_cache(spark: SparkSession) -> None:
    """Drop every cross-call cache so the NEXT query invocation computes
    from the parquet inputs again: unpersist and clear the barrier LRU,
    and clear the catalog cache.  The bench harness calls this before
    EVERY run — warm and timed alike — so a ``barrier_persist`` subtree
    materializes inside the run being timed and is never served from a
    previous run's warm-up (that would time a cached read, not the
    computation).  ``_LOAD_CACHE`` (unpersisted plan handles) and
    ``_SPREAD_CACHE`` (partition-count metadata) hold no row data and
    are deliberately kept."""
    for cached in list(_BARRIER_CACHE.values()):
        try:
            cached.unpersist()
        except Exception:
            pass
    _BARRIER_CACHE.clear()
    try:
        spark.catalog.clearCache()
    except Exception:
        pass
