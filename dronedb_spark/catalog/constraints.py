"""Declarative table-constraint audit — the data-quality gate a
lakehouse pipeline runs on every ingest (the Deequ / dbt-test /
``CHECK CONSTRAINT`` shape): not-null, key uniqueness, value ranges,
set membership, and cross-table referential integrity, each evaluated
distributively and reported as one violations row per constraint.
Beyond the reference (no relational quality surface).

Scale shape: every constraint is ONE aggregate over its table —
not-null/range/membership are map-side-combinable conditional counts
sharing a single scan per table (one ``agg`` with k conditional sums,
NOT k passes); uniqueness is the key groupBy the table's writer
already shuffles by; referential integrity is a left-anti join whose
dimension side broadcasts when small.  The report is
constraints-sized.  Sample keys are deterministic MINs, never
``first()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load


def row_constraint_audit(
    df: DataFrame, table: str, constraints: list[tuple[str, Column, Column]]
) -> DataFrame:
    """Row-level constraints in ONE scan.  Each constraint is
    (name, violated_predicate, sample_key_col); output one row per
    constraint: (constraint, n_rows, n_violations, sample_key)."""
    aggs = []
    for name, bad, key in constraints:
        aggs.append(F.sum(bad.cast("bigint")).alias(f"_n_{name}"))
        aggs.append(
            F.min(F.when(bad, key.cast("string"))).alias(f"_k_{name}")
        )
    row = df.agg(F.count(F.lit(1)).cast("bigint").alias("_total"), *aggs)
    cells = [
        F.struct(
            F.lit(f"{table}:{name}").alias("constraint"),
            F.col("_total").alias("n_rows"),
            F.col(f"_n_{name}").alias("n_violations"),
            F.coalesce(F.col(f"_k_{name}"), F.lit("-")).alias("sample_key"),
        )
        for name, _, _ in constraints
    ]
    return row.select(F.explode(F.array(*cells)).alias("c")).select(
        "c.constraint", "c.n_rows", "c.n_violations", "c.sample_key"
    )


def unique_key_audit(df: DataFrame, table: str, key: str) -> DataFrame:
    """(constraint, n_rows, n_violations, sample_key): rows carrying a
    duplicated key (violations = rows beyond the first per key)."""
    dup = (
        df.groupBy(F.col(key).cast("string").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    rep = dup.agg(
        F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
        .cast("bigint")
        .alias("n_violations"),
        F.min("k").alias("_k"),
    )
    return rep.join(F.broadcast(total)).select(
        F.lit(f"{table}:unique_{key}").alias("constraint"),
        "n_rows",
        "n_violations",
        F.coalesce("_k", F.lit("-")).alias("sample_key"),
    )


def foreign_key_audit(
    child: DataFrame, table: str, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """(constraint, n_rows, n_violations, sample_key): child rows whose
    foreign key has no parent — a left-anti join (broadcast when the
    parent key set is small)."""
    orphans = child.select(F.col(fk).alias("_fk")).join(
        parent.select(F.col(pk).alias("_fk")).distinct(),
        "_fk",
        "left_anti",
    )
    total = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    rep = orphans.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        F.min(F.col("_fk").cast("string")).alias("_k"),
    )
    return rep.join(F.broadcast(total)).select(
        F.lit(f"{table}:fk_{fk}").alias("constraint"),
        "n_rows",
        "n_violations",
        F.coalesce("_k", F.lit("-")).alias("sample_key"),
    )


@check(
    "table_constraint_audit",
    oracle="""
        WITH li AS (
            SELECT CAST(COUNT(1) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
                   COALESCE(MIN(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
                       THEN CAST(l_orderkey AS VARCHAR) END), '-') AS k_qty,
                   CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
                   COALESCE(MIN(CASE WHEN l_discount < 0 OR l_discount > 1
                       THEN CAST(l_orderkey AS VARCHAR) END), '-') AS k_disc,
                   CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS bad_rf,
                   COALESCE(MIN(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                       THEN CAST(l_orderkey AS VARCHAR) END), '-') AS k_rf,
                   CAST(SUM(CASE WHEN l_shipdate IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS bad_ship,
                   COALESCE(MIN(CASE WHEN l_shipdate IS NULL
                       THEN CAST(l_orderkey AS VARCHAR) END), '-') AS k_ship
            FROM lineitem),
        ord_dup AS (
            SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS n_violations,
                   COALESCE(MIN(k), '-') AS sample_key
            FROM (SELECT CAST(o_orderkey AS VARCHAR) AS k, COUNT(1) AS cnt
                  FROM orders GROUP BY 1 HAVING COUNT(1) > 1)),
        ord_n AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_rows FROM orders),
        li_orph AS (
            SELECT CAST(COUNT(1) AS BIGINT) AS n_violations,
                   COALESCE(MIN(CAST(l.l_orderkey AS VARCHAR)), '-')
                       AS sample_key
            FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
              ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderkey IS NULL),
        cust_orph AS (
            SELECT CAST(COUNT(1) AS BIGINT) AS n_violations,
                   COALESCE(MIN(CAST(o.o_custkey AS VARCHAR)), '-')
                       AS sample_key
            FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
              ON c.c_custkey = o.o_custkey
            WHERE c.c_custkey IS NULL)
        SELECT 'lineitem:positive_quantity' AS constraint, n_rows,
               bad_qty AS n_violations, k_qty AS sample_key FROM li
        UNION ALL
        SELECT 'lineitem:discount_range', n_rows, bad_disc, k_disc FROM li
        UNION ALL
        SELECT 'lineitem:returnflag_domain', n_rows, bad_rf, k_rf FROM li
        UNION ALL
        SELECT 'lineitem:shipdate_not_null', n_rows, bad_ship, k_ship FROM li
        UNION ALL
        SELECT 'orders:unique_o_orderkey', n.n_rows, d.n_violations,
               d.sample_key FROM ord_dup d, ord_n n
        UNION ALL
        SELECT 'lineitem:fk_l_orderkey', l.n_rows, o.n_violations,
               o.sample_key FROM li l, li_orph o
        UNION ALL
        SELECT 'orders:fk_o_custkey', n.n_rows, c.n_violations, c.sample_key
        FROM ord_n n, cust_orph c
        ORDER BY 1""",
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven constraints across lineitem/orders/customer — four row
    rules in ONE lineitem scan, key uniqueness, and two referential
    checks; a clean TPC-H-ish corpus must report zero violations with
    '-' sample keys (the oracle re-derives every count, so a false
    zero cannot hide)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    key = F.col("l_orderkey")
    rows = row_constraint_audit(
        li,
        "lineitem",
        [
            ("positive_quantity",
             F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0), key),
            ("discount_range",
             (F.col("l_discount") < 0) | (F.col("l_discount") > 1), key),
            ("returnflag_domain",
             ~F.col("l_returnflag").isin("A", "N", "R"), key),
            ("shipdate_not_null", F.col("l_shipdate").isNull(), key),
        ],
    )
    uniq = unique_key_audit(orders, "orders", "o_orderkey")
    fk1 = foreign_key_audit(li, "lineitem", "l_orderkey", orders, "o_orderkey")
    fk2 = foreign_key_audit(orders, "orders", "o_custkey", cust, "c_custkey")
    return (
        rows.unionByName(uniq).unionByName(fk1).unionByName(fk2)
        .orderBy("constraint")
    )
