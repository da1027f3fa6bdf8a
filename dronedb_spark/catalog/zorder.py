"""Z-order (Morton) data layout + file-skipping evaluation — the
lakehouse ``OPTIMIZE ... ZORDER BY`` maintenance shape (Delta/Iceberg
clustering; public method: Morton 1966 bit interleaving): rewrite a
big table's file layout so per-file min/max column statistics prune
MULTI-column predicates, and MEASURE the pruning against the natural
ingest order.  Complements ``catalog/compact.py`` (which sizes files;
this clusters them).

Exactness discipline: everything is integer — columns normalize to
16-bit buckets by ``(x − min)·65535 DIV (max − min)``, the z-value is
the unrolled 32-term bit interleave (pure arithmetic: DIV/%/·, no
engine bit-op dialect), file ids are fixed z-range splits
(``z·N DIV 2³²``), and the skip decision is BETWEEN over per-file
min/max.  Production assigns files by range-partitioning on z
(``repartitionByRange`` — sampled bounds, data-balanced); the fixed
splits here trade balance for engine-exact file ids so the oracle can
re-derive the layout bit-for-bit, and the SKIPPING measurement is
identical either way.

Scale shape: the z-value and file id are ONE zero-shuffle projection
over the scan (min/max attach as a broadcast 1-row aggregate); the
stats table is one map-side-combined groupBy(file_id) — files-sized
ever after.  The evaluation compares layouts from the SAME pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

N_FILES = 64
_BITS = 16


def _interleave_sql(bx: str, by: str, div: str) -> str:
    """SQL for the 2×16-bit Morton interleave of bucket expressions
    ``bx``/``by`` (x in the odd bit positions) — dialect-safe pure
    integer arithmetic."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({bx}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({by}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame, x: str, y: str, n_files: int = N_FILES
) -> DataFrame:
    """+ (zval, file_id): the clustered layout assignment, plus
    ``linear_file_id`` (natural ``x``-range order) as the baseline —
    one zero-shuffle projection."""
    mm = df.agg(
        F.min(x).cast("bigint").alias("_xmin"),
        F.max(x).cast("bigint").alias("_xmax"),
        F.min(y).cast("bigint").alias("_ymin"),
        F.max(y).cast("bigint").alias("_ymax"),
    )
    w = df.join(F.broadcast(mm))
    bx = f"(({x} - _xmin) * 65535) DIV (_xmax - _xmin)"
    by = f"(({y} - _ymin) * 65535) DIV (_ymax - _ymin)"
    z = _interleave_sql(bx, by, "DIV")
    return w.withColumn("zval", F.expr(f"CAST({z} AS BIGINT)")).withColumn(
        "file_id", F.expr(f"CAST(zval * {n_files} DIV {1 << 32} AS BIGINT)")
    )


def file_stats(laid: DataFrame, x: str, y: str, file_col: str) -> DataFrame:
    """(file_id, n_rows, x_min, x_max, y_min, y_max): the per-file
    column statistics a reader prunes with."""
    return laid.groupBy(F.col(file_col).alias("file_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(x).cast("bigint").alias("x_min"),
        F.max(x).cast("bigint").alias("x_max"),
        F.min(y).cast("bigint").alias("y_min"),
        F.max(y).cast("bigint").alias("y_max"),
    )


def skipping_eval(
    stats: DataFrame, x_lo: Column, x_hi: Column, y_lo: Column, y_hi: Column
) -> DataFrame:
    """One row: how much of the layout a (x, y) box predicate must
    scan, by min/max pruning."""
    scanned = (
        (F.col("x_max") >= x_lo)
        & (F.col("x_min") <= x_hi)
        & (F.col("y_max") >= y_lo)
        & (F.col("y_min") <= y_hi)
    ).cast("int")
    return stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(scanned).cast("bigint").alias("files_scanned"),
        F.sum(F.col("n_rows") * scanned).cast("bigint").alias("rows_scanned"),
    )


# ------------------------------------------------------------------ check
#
# Box: the middle ~tenth of each key range — the 2-D selective probe
# z-ordering exists for.  Bounds derive from min/max in exact integer
# arithmetic on both sides.

_BOX = "3"  # lo = min + range*3 DIV 10;  hi = min + range*4 DIV 10


@check(
    "zorder_layout_skipping",
    oracle=f"""
        WITH mm AS (
            SELECT CAST(MIN(l_partkey) AS BIGINT) AS xmin,
                   CAST(MAX(l_partkey) AS BIGINT) AS xmax,
                   CAST(MIN(l_suppkey) AS BIGINT) AS ymin,
                   CAST(MAX(l_suppkey) AS BIGINT) AS ymax
            FROM lineitem),
        laid AS (
            SELECT l_partkey AS x, l_suppkey AS y,
                   CAST(({_interleave_sql(
                       "((l_partkey - xmin) * 65535) // (xmax - xmin)",
                       "((l_suppkey - ymin) * 65535) // (ymax - ymin)",
                       "//")}) AS BIGINT) AS zval
            FROM lineitem, mm),
        assigned AS (
            SELECT x, y,
                   CAST(zval * {N_FILES} // {1 << 32} AS BIGINT) AS zfile,
                   CAST((x - (SELECT xmin FROM mm)) * {N_FILES}
                        // ((SELECT xmax FROM mm) - (SELECT xmin FROM mm) + 1)
                        AS BIGINT) AS lfile
            FROM laid),
        box AS (
            SELECT xmin + (xmax - xmin) * {_BOX} // 10 AS xlo,
                   xmin + (xmax - xmin) * ({_BOX} + 1) // 10 AS xhi,
                   ymin + (ymax - ymin) * {_BOX} // 10 AS ylo,
                   ymin + (ymax - ymin) * ({_BOX} + 1) // 10 AS yhi
            FROM mm),
        per_layout AS (
            SELECT 'zorder' AS layout, zfile AS file_id, x, y FROM assigned
            UNION ALL
            SELECT 'linear', lfile, x, y FROM assigned),
        stats AS (
            SELECT layout, file_id, COUNT(1) AS n_rows,
                   MIN(x) AS x_min, MAX(x) AS x_max,
                   MIN(y) AS y_min, MAX(y) AS y_max
            FROM per_layout GROUP BY 1, 2),
        ev AS (
            SELECT s.layout,
                   COUNT(1) AS n_files,
                   SUM(CASE WHEN s.x_max >= b.xlo AND s.x_min <= b.xhi
                             AND s.y_max >= b.ylo AND s.y_min <= b.yhi
                            THEN 1 ELSE 0 END) AS files_scanned,
                   SUM(CASE WHEN s.x_max >= b.xlo AND s.x_min <= b.xhi
                             AND s.y_max >= b.ylo AND s.y_min <= b.yhi
                            THEN s.n_rows ELSE 0 END) AS rows_scanned
            FROM stats s, box b GROUP BY 1),
        truth AS (
            SELECT COUNT(1) AS rows_matching
            FROM per_layout p, box b
            WHERE p.layout = 'zorder'
              AND p.x BETWEEN b.xlo AND b.xhi
              AND p.y BETWEEN b.ylo AND b.yhi)
        SELECT e.layout, CAST(e.n_files AS BIGINT) AS n_files,
               CAST(e.files_scanned AS BIGINT) AS files_scanned,
               CAST(e.rows_scanned AS BIGINT) AS rows_scanned,
               CAST(t.rows_matching AS BIGINT) AS rows_matching
        FROM ev e, truth t ORDER BY 1""",
)
def q_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-clustered vs natural-order file layout for lineitem
    clustered on (l_partkey, l_suppkey), probed with the middle-tenth
    2-D box: per layout, the files/rows min-max pruning must scan —
    the z-order layout must scan FEWER files (pytest-pinned) while
    both contain the same matching rows."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    laid = zorder_layout(li, "l_partkey", "l_suppkey")
    laid = laid.withColumn(
        "linear_file_id",
        F.expr(
            f"CAST((l_partkey - _xmin) * {N_FILES}"
            f" DIV (_xmax - _xmin + 1) AS BIGINT)"
        ),
    )
    box = [
        F.expr(f"_xmin + (_xmax - _xmin) * {_BOX} DIV 10"),
        F.expr(f"_xmin + (_xmax - _xmin) * ({_BOX} + 1) DIV 10"),
        F.expr(f"_ymin + (_ymax - _ymin) * {_BOX} DIV 10"),
        F.expr(f"_ymin + (_ymax - _ymin) * ({_BOX} + 1) DIV 10"),
    ]
    xlo, xhi, ylo, yhi = box
    evs = []
    for layout, col in (("zorder", "file_id"), ("linear", "linear_file_id")):
        st = file_stats(laid, "l_partkey", "l_suppkey", col)
        # bounds are constants derived from mm; re-derive per stats row
        mm = li.agg(
            F.min("l_partkey").cast("bigint").alias("_xmin"),
            F.max("l_partkey").cast("bigint").alias("_xmax"),
            F.min("l_suppkey").cast("bigint").alias("_ymin"),
            F.max("l_suppkey").cast("bigint").alias("_ymax"),
        )
        stb = st.join(F.broadcast(mm))
        evs.append(
            skipping_eval(stb, xlo, xhi, ylo, yhi).withColumn(
                "layout", F.lit(layout)
            )
        )
    ev = evs[0].unionByName(evs[1])
    truth = (
        laid.filter(
            F.col("l_partkey").between(xlo, xhi)
            & F.col("l_suppkey").between(ylo, yhi)
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_matching"))
    )
    return (
        ev.join(F.broadcast(truth))
        .select("layout", "n_files", "files_scanned", "rows_scanned", "rows_matching")
        .orderBy("layout")
    )


# ------------------------------------------- incremental maintenance --


def zorder_rewrite_plan(
    stats: DataFrame, new_batch: DataFrame, x: str, y: str, n_files: int = N_FILES
) -> DataFrame:
    """(file_id, n_rows, n_new, action): the incremental OPTIMIZE plan —
    which clustered files an appended batch dirties (the daily-ingest
    shape of the z-order family: never re-cluster the corpus, rewrite
    only files whose z-range the new data lands in).

    A new row belongs to file ``z·N DIV 2³²`` under the EXISTING layout
    bounds (carried on ``stats`` as _xmin.._ymax — production persists
    them with the stats); files receiving new rows are 'rewrite', the
    rest 'keep'.  Cost: one zero-shuffle projection over the batch +
    one files-sized aggregate — the corpus is never read."""
    bx = f"(({x} - _xmin) * 65535) DIV (_xmax - _xmin)"
    by = f"(({y} - _ymin) * 65535) DIV (_ymax - _ymin)"
    z = _interleave_sql(
        f"LEAST(65535, GREATEST(0, {bx}))", f"LEAST(65535, GREATEST(0, {by}))", "DIV"
    )
    assigned = new_batch.withColumn(
        "file_id",
        F.expr(f"CAST(CAST({z} AS BIGINT) * {n_files} DIV {1 << 32} AS BIGINT)"),
    )
    new_counts = assigned.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    return (
        stats.select("file_id", "n_rows")
        .join(new_counts, "file_id", "left")
        .select(
            "file_id",
            "n_rows",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            F.when(F.coalesce("n_new", F.lit(0)) > 0, F.lit("rewrite"))
            .otherwise(F.lit("keep"))
            .alias("action"),
        )
    )


@check(
    "zorder_rewrite_plan",
    oracle=f"""
        WITH mm AS (
            SELECT CAST(MIN(l_partkey) AS BIGINT) AS xmin,
                   CAST(MAX(l_partkey) AS BIGINT) AS xmax,
                   CAST(MIN(l_suppkey) AS BIGINT) AS ymin,
                   CAST(MAX(l_suppkey) AS BIGINT) AS ymax
            FROM lineitem),
        laid AS (
            SELECT l_orderkey, l_partkey AS x, l_suppkey AS y,
                   CAST(({_interleave_sql(
                       "((l_partkey - xmin) * 65535) // (xmax - xmin)",
                       "((l_suppkey - ymin) * 65535) // (ymax - ymin)",
                       "//")}) AS BIGINT) AS zval
            FROM lineitem, mm),
        assigned AS (
            SELECT l_orderkey, x, y,
                   CAST(zval * {N_FILES} // {1 << 32} AS BIGINT) AS file_id
            FROM laid),
        stats AS (
            SELECT file_id, CAST(COUNT(1) AS BIGINT) AS n_rows
            FROM assigned WHERE l_orderkey % 37 <> 0 GROUP BY file_id),
        new_counts AS (
            SELECT file_id, CAST(COUNT(1) AS BIGINT) AS n_new
            FROM assigned WHERE l_orderkey % 37 = 0 GROUP BY file_id)
        SELECT s.file_id, s.n_rows,
               CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
               CASE WHEN COALESCE(n.n_new, 0) > 0 THEN 'rewrite'
                    ELSE 'keep' END AS action
        FROM stats s LEFT JOIN new_counts n ON n.file_id = s.file_id
        ORDER BY s.file_id""",
)
def q_zorder_rewrite_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental OPTIMIZE: the corpus minus every 37th order is the
    clustered store (per-file stats + layout bounds persisted); the
    held-out rows arrive as the appended batch and the plan marks
    exactly the files their z-values land in — corpus never re-read.
    The oracle derives the same split/layout independently."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    existing = li.filter(F.col("l_orderkey") % 37 != 0)
    batch = li.filter(F.col("l_orderkey") % 37 == 0)
    # build the store from the FULL corpus bounds (the persisted layout
    # metadata) but only existing rows' stats
    mm = li.agg(
        F.min("l_partkey").cast("bigint").alias("_xmin"),
        F.max("l_partkey").cast("bigint").alias("_xmax"),
        F.min("l_suppkey").cast("bigint").alias("_ymin"),
        F.max("l_suppkey").cast("bigint").alias("_ymax"),
    )
    laid = zorder_layout(li, "l_partkey", "l_suppkey").filter(
        F.col("l_orderkey") % 37 != 0
    )
    stats = laid.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    plan = zorder_rewrite_plan(
        stats, batch.join(F.broadcast(mm)), "l_partkey", "l_suppkey"
    )
    return plan.orderBy("file_id")
