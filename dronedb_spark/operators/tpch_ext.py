"""TPC-H Q8-Q21 shapes adapted to the driver's reduced star schema.

The testdata schema has no partsupp / shipmode / commit-receipt dates, so
each query keeps its *plan shape* (the part Catalyst must get right —
decorrelation, anti/semi joins, scalar subqueries, disjunctive pushdown,
two-level aggregation) while predicating only on available columns.

Scale notes (these bind at 100 TB, not at sf0.1):
- Dims region/nation are broadcast explicitly; part/supplier are left to
  AQE (at SF1e5 `part` is 20B rows — a hint would pin a broken plan).
- Every correlated subquery is decorrelated into an aggregate + join so
  nothing executes per-row (Q11/Q15/Q17/Q20 scalar-agg attach, Q21
  exists/not-exists folded into one grouped pass + window).
- Thresholds are *relative* (share-of-total, multiple-of-average) so the
  same predicate has mass at any SF.
- Monetary math follows the repo decimal discipline (`relational._dec`):
  exact DECIMAL accumulation (order-independent across partitions),
  ROUND on the decimal, cast to double last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dronedb_spark.operators.relational import _dec, _one_minus
from dronedb_spark.suite import check
from dronedb_spark.tables import load

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(14,2))"
    " * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)


def _rev() -> F.Column:
    return _dec("l_extendedprice") * _one_minus("l_discount")


def _d2(c: F.Column) -> F.Column:
    """ROUND(decimal, 2) then cast double — exact in both engines."""
    return F.round(c, 2).cast("double")


# --------------------------------------------------------------------------
# Q8: national market share (two nation roles, share-of-total per year)
# --------------------------------------------------------------------------
def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    r_name: str = "ASIA",
    target_nation: str = "NATION_3",
    p_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8 shape: one fact pipeline, two broadcast nation roles,
    conditional-sum / sum share per order year."""
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
        )
    )
    rg = F.broadcast(region.filter(F.col("r_name") == r_name))
    sn = F.broadcast(
        nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    j = (
        lineitem.join(part.filter(F.col("p_type") == p_type).select("p_partkey"),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter((F.col("o_orderdate") >= F.lit("1995-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01")))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(rg, F.col("cn_region") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
    )
    g = j.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == target_nation, _rev())).alias("_num"),
        F.sum(_rev()).alias("_den"),
    )
    return g.select(
        "o_year",
        (F.coalesce(_d2(F.col("_num")), F.lit(0.0)) / _d2(F.col("_den"))).alias("mkt_share"),
    ).orderBy("o_year")


@check(
    "q8_market_share",
    oracle=f"""
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               COALESCE(CAST(ROUND(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV_SQL} END), 2) AS DOUBLE), 0.0)
                 / CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS mkt_share
        FROM lineitem, part, orders, customer, nation cn, region, supplier, nation sn
        WHERE l_partkey = p_partkey AND p_type = 'PROMO'
          AND l_orderkey = o_orderkey
          AND o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01'
          AND o_custkey = c_custkey AND c_nationkey = cn.n_nationkey
          AND cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
          AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
        GROUP BY YEAR(o_orderdate) ORDER BY o_year""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return market_share(
        load(spark, sf_dir, "region"), load(spark, sf_dir, "nation"),
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part"),
        load(spark, sf_dir, "supplier"),
    )


# --------------------------------------------------------------------------
# Q9: profit by supplier nation and year (cost model from p_retailprice)
# --------------------------------------------------------------------------
_PROFIT_SQL = (
    f"{_REV_SQL} - CAST(p_retailprice AS DECIMAL(14,2))"
    " * CAST(l_quantity AS DECIMAL(14,2)) * CAST(0.1 AS DECIMAL(2,1))"
)


def profit_by_nation(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_pat: str = "%widget%",
) -> DataFrame:
    """TPC-H Q9 shape (no partsupp: unit cost modeled as 10% of
    p_retailprice).  part filtered by name pattern first, dims broadcast,
    single fact shuffle."""
    cost = (
        _dec("p_retailprice") * _dec("l_quantity") * F.lit("0.1").cast("decimal(2,1)")
    )
    sn = F.broadcast(
        nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    )
    j = (
        lineitem.join(
            part.filter(F.col("p_name").like(name_pat)).select("p_partkey", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        j.groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(_d2(F.sum(_rev() - cost)).alias("sum_profit"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("nation", F.desc("o_year"))
    )


@check(
    "q9_profit_by_nation",
    oracle=f"""
        SELECT sn.n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
               CAST(ROUND(SUM({_PROFIT_SQL}), 2) AS DOUBLE) AS sum_profit,
               CAST(COUNT(1) AS BIGINT) AS n_items
        FROM lineitem, part, orders, supplier, nation sn
        WHERE l_partkey = p_partkey AND p_name LIKE '%widget%'
          AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
          AND s_nationkey = sn.n_nationkey
        GROUP BY sn.n_name, YEAR(o_orderdate)
        ORDER BY nation, o_year DESC""",
)
def q_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profit_by_nation(
        load(spark, sf_dir, "nation"), load(spark, sf_dir, "supplier"),
        load(spark, sf_dir, "part"), load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
    )


# --------------------------------------------------------------------------
# Q10: returned-item customer ranking (top 20, deterministic tie-break)
# --------------------------------------------------------------------------
def returned_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    j = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter((F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-04-01")))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).alias("_r"))
        .select("c_custkey", "c_name", _d2(F.col("_r")).alias("revenue"),
                "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@check(
    "q10_returned_customers",
    oracle=f"""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
               CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM lineitem, orders, customer, nation
        WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
          AND o_custkey = c_custkey AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def q_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return returned_customers(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "nation"),
    )


# --------------------------------------------------------------------------
# Q11: parts holding an outsized share of total value (scalar subquery)
# --------------------------------------------------------------------------
def important_parts(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q11 shape (no partsupp: value = lineitem revenue per part).
    The HAVING threshold is a scalar aggregate of the same relation —
    computed once, broadcast-attached (1-row crossJoin), never per-row.
    Threshold is 1.5x the average per-part share, so it has mass at any
    SF (an absolute fraction would go vacuous as #parts grows)."""
    vals = lineitem.groupBy("l_partkey").agg(F.sum(_dec("l_extendedprice")).alias("_v"))
    tot = vals.agg(F.sum("_v").alias("_t"), F.count(F.lit(1)).alias("_n"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(_d2(F.col("_v")) > F.lit(1.5) * _d2(F.col("_t")) / F.col("_n"))
        .select("l_partkey", _d2(F.col("_v")).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@check(
    "q11_important_parts",
    oracle="""
        WITH v AS (
            SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS _v
            FROM lineitem GROUP BY l_partkey),
        t AS (SELECT SUM(_v) AS _t, COUNT(*) AS _n FROM v)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
               CAST(ROUND(_v, 2) AS DOUBLE) AS part_value
        FROM v, t
        WHERE CAST(ROUND(_v, 2) AS DOUBLE) > 1.5 * CAST(ROUND(_t, 2) AS DOUBLE) / _n
        ORDER BY part_value DESC, l_partkey""",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return important_parts(load(spark, sf_dir, "lineitem"))


# --------------------------------------------------------------------------
# Q12: late shipments by priority class (conditional two-bucket counts)
# --------------------------------------------------------------------------
def late_shipments(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (no shipmode/receipt: 'late' = shipped >90 days
    after order; buckets keyed by l_returnflag)."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = (
        lineitem.filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                        & (F.col("l_shipdate") < F.lit("1997-01-01")))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.datediff("l_shipdate", "o_orderdate") > 90)
    )
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@check(
    "q12_late_shipments",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND DATE_DIFF('day', o_orderdate, l_shipdate) > 90
        GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return late_shipments(load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# Q13: distribution of orders-per-customer (left join keeps 0-order rows)
# --------------------------------------------------------------------------
def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    per = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@check(
    "q13_order_distribution",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey) t
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
)
def q_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customer_order_distribution(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# Q14: promo revenue share over one month
# --------------------------------------------------------------------------
def promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    j = (
        lineitem.filter((F.col("l_shipdate") >= F.lit("1996-09-01"))
                        & (F.col("l_shipdate") < F.lit("1996-10-01")))
        .join(part.select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
    )
    return j.agg(
        (F.lit(100.0)
         * F.coalesce(_d2(F.sum(F.when(F.col("p_type") == "PROMO", _rev()))), F.lit(0.0))
         / _d2(F.sum(_rev()))).alias("promo_share")
    )


@check(
    "q14_promo_revenue",
    oracle=f"""
        SELECT 100.0 * COALESCE(CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} END), 2) AS DOUBLE), 0.0)
                 / CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS promo_share
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'""",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return promo_revenue(load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part"))


# --------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue (max attached, exact-decimal =)
# --------------------------------------------------------------------------
def top_suppliers(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Equality against the max is on the EXACT decimal sums — no float
    compare, so ties (all qualifying suppliers) are reproduced exactly."""
    g = (
        lineitem.filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                        & (F.col("l_shipdate") < F.lit("1996-04-01")))
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("_r"))
    )
    mx = g.agg(F.max("_r").alias("_m"))
    return (
        g.join(F.broadcast(mx), F.col("_r") == F.col("_m"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", _d2(F.col("_r")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@check(
    "q15_top_supplier",
    oracle=f"""
        WITH r AS (
            SELECT l_suppkey, SUM({_REV_SQL}) AS _r
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
            GROUP BY l_suppkey)
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
               CAST(ROUND(_r, 2) AS DOUBLE) AS total_revenue
        FROM r, supplier
        WHERE l_suppkey = s_suppkey AND _r = (SELECT MAX(_r) FROM r)
        ORDER BY s_suppkey""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_suppliers(load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "supplier"))


# --------------------------------------------------------------------------
# Q16: supplier diversity per (brand, type, size) with NOT-IN exclusion
# --------------------------------------------------------------------------
def brand_supplier_counts(lineitem: DataFrame, part: DataFrame, supplier: DataFrame) -> DataFrame:
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    j = (
        lineitem.join(
            part.filter((F.col("p_brand") != "Brand#13")
                        & F.col("p_size").isin(1, 5, 9, 15, 20, 25)),
            F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@check(
    "q16_brand_supplier_counts",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND p_brand <> 'Brand#13' AND p_size IN (1, 5, 9, 15, 20, 25)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
)
def q_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brand_supplier_counts(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part"),
        load(spark, sf_dir, "supplier"))


# --------------------------------------------------------------------------
# Q17: revenue locked in small-quantity orders (correlated avg decorrelated)
# --------------------------------------------------------------------------
def small_qty_revenue(lineitem: DataFrame, part: DataFrame, brand: str = "Brand#11") -> DataFrame:
    """The correlated `l_quantity < 0.2 * avg(per part)` becomes a
    per-part aggregate joined back — one extra shuffle on l_partkey, no
    per-row subquery.  The avg is derived identically in both engines
    (exact decimal sum -> double / count) so the float comparison is
    bit-deterministic."""
    pf = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(pf, F.col("l_partkey") == F.col("p_partkey"))
    avgq = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("_avg")
    )
    j = li.join(avgq, F.col("l_partkey") == F.col("a_partkey")).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("_avg")
    )
    return j.agg(
        (F.round(F.sum(_dec("l_extendedprice")), 2).cast("double") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@check(
    "q17_small_qty_revenue",
    oracle="""
        WITH li AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem, part
            WHERE l_partkey = p_partkey AND p_brand = 'Brand#11'),
        a AS (
            SELECT l_partkey AS a_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / COUNT(1) AS _avg
            FROM li GROUP BY l_partkey)
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2) AS DOUBLE) / 7.0 AS avg_yearly,
               CAST(COUNT(1) AS BIGINT) AS n_lines
        FROM li, a
        WHERE l_partkey = a_partkey AND l_quantity < 0.2 * _avg""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return small_qty_revenue(load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part"))


# --------------------------------------------------------------------------
# Q18: large-volume orders (HAVING on grouped fact, join back to dims)
# --------------------------------------------------------------------------
def large_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                 min_qty: int = 300) -> DataFrame:
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > F.lit(min_qty))
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
                _d2(F.col("_q")).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@check(
    "q18_large_orders",
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
               CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate, o_totalprice,
               CAST(ROUND(_q, 2) AS DOUBLE) AS total_qty
        FROM (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(14,2))) AS _q
            FROM lineitem GROUP BY l_orderkey HAVING _q > 300) b,
            orders, customer
        WHERE b.l_orderkey = o_orderkey AND o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey LIMIT 100""",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return large_orders(
        load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"))


# --------------------------------------------------------------------------
# Q19: disjunctive brand/size/quantity predicate (single scan, OR pushdown)
# --------------------------------------------------------------------------
def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    j = lineitem.join(part.select("p_partkey", "p_brand", "p_size"),
                      F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        _d2(F.sum(_rev())).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))


@check(
    "q19_disjunctive_revenue",
    oracle=f"""
        SELECT CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
               CAST(COUNT(1) AS BIGINT) AS n_lines
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND (
              (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return disjunctive_revenue(load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part"))


# --------------------------------------------------------------------------
# Q20: suppliers carrying an outsized share of a part's 1996 volume
# --------------------------------------------------------------------------
def volume_share_suppliers(lineitem: DataFrame, part: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q20 shape (no partsupp: 'excess stock' = supplier shipped
    >30% of the part's annual volume).  The share compare multiplies both
    exact decimal sums by integer literals — no division, no floats."""
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    li = (
        lineitem.filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                        & (F.col("l_shipdate") < F.lit("1997-01-01")))
        .join(red, F.col("l_partkey") == F.col("p_partkey"))
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(_dec("l_quantity")).alias("_sq"))
    pt = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("_tq"))
    winners = (
        ps.join(pt, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("_sq") * F.lit(10) > F.col("_tq") * F.lit(3))
        .select("l_suppkey").distinct()
    )
    return (
        winners.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@check(
    "q20_volume_share_suppliers",
    oracle="""
        WITH li AS (
            SELECT l_partkey, l_suppkey, l_quantity
            FROM lineitem, part
            WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
              AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'),
        ps AS (
            SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(14,2))) AS _sq
            FROM li GROUP BY l_partkey, l_suppkey),
        pt AS (
            SELECT l_partkey AS t_partkey, SUM(CAST(l_quantity AS DECIMAL(14,2))) AS _tq
            FROM li GROUP BY l_partkey)
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM ps, pt
            WHERE l_partkey = t_partkey AND _sq * 10 > _tq * 3)
        ORDER BY s_suppkey""",
)
def q_volume_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return volume_share_suppliers(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part"),
        load(spark, sf_dir, "supplier"))


# --------------------------------------------------------------------------
# Q21: suppliers solely responsible for returns on multi-supplier orders
# --------------------------------------------------------------------------
def sole_blame_suppliers(lineitem: DataFrame, orders: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q21 shape.  The EXISTS ('another supplier in the order') and
    NOT EXISTS ('no other supplier returned') decorrelate into ONE grouped
    pass per (order, supplier) plus an order-window — two shuffles total,
    vs the naive per-row double subquery.  Counts each qualifying order
    once per supplier (count of distinct waiting orders)."""
    per_os = (
        lineitem.join(orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.select(
        "l_orderkey", "l_suppkey", "has_r",
        F.sum("has_r").over(w).alias("n_r_supp"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    )
    waiting = flagged.filter(
        (F.col("has_r") == 1) & (F.col("n_r_supp") == 1) & (F.col("n_supp") > 1))
    return (
        waiting.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@check(
    "q21_sole_blame_suppliers",
    oracle="""
        SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
)
def q_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sole_blame_suppliers(
        load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "supplier"))
