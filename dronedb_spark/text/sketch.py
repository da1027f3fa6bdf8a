"""HyperLogLog distinct-count sketch (Flajolet et al. 2007), built from
deterministic portable hashing so the register state is exactly
reproducible in any engine with md5 — the fixed-size cardinality
primitive a 100 TB pipeline uses for vocabulary / user / URL counts
where an exact COUNT(DISTINCT) would shuffle the full key set.

Beyond the reference (no text pipeline there).  Scale design:

  * the register table is a groupBy(bucket).max(rho) — map-side partial
    max reduces every partition to at most m=2^p rows before the
    shuffle, so the shuffle moves O(m) rows per partition regardless of
    corpus size (the whole point of the sketch);
  * registers merge across corpora/days by element-wise max — the same
    groupBy shape — giving mergeable daily sketches for free;
  * the ESTIMATE is a tiny driver-side fold over m rows.

Determinism note: the register state (bucket, max rho) is integer-exact
and oracle-checked against DuckDB; the floating-point estimate itself is
validated in pytest against the exact distinct count within the
published error bound (sigma = 1.04/sqrt(m)), not hash-compared across
engines, because ln()/pow() may differ in the last ulp between
implementations.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

P = 8  # register address bits: m = 256 registers, sigma ~ 6.5%
M = 1 << P


def hll_token_registers(docs: DataFrame) -> DataFrame:
    """(bucket, max_rho) over the corpus token stream.

    h = md5(token); bucket = first 2 hex chars (8 bits); rho = 1 +
    leading zeros of the next 60 bits (15 hex chars), i.e. 61 -
    bit_length(v), with v = 0 mapping to the full 61.  Buckets never
    observed are absent (their register is implicitly 0).
    """
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    bucket = F.expr("CAST(conv(substr(md5(tok), 1, 2), 16, 10) AS BIGINT)")
    v = F.expr("CAST(conv(substr(md5(tok), 3, 15), 16, 10) AS BIGINT)")
    rho = F.when(v == 0, F.lit(61)).otherwise(61 - F.length(F.expr("bin(CAST(conv(substr(md5(tok), 3, 15), 16, 10) AS BIGINT))")))
    return (
        toks.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame) -> float:
    """Driver-side fold of the m-row register table into the HLL
    cardinality estimate with the small-range (linear counting)
    correction."""
    rows = {r["bucket"]: r["max_rho"] for r in registers.collect()}
    alpha = 0.7213 / (1 + 1.079 / M)
    s = sum(2.0 ** -rows.get(j, 0) for j in range(M))
    est = alpha * M * M / s
    zeros = M - len(rows)
    if est <= 2.5 * M and zeros > 0:
        est = M * math.log(M / zeros)
    return est


@check(
    "hll_token_registers",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        hashed AS (
            SELECT CAST('0x' || substr(md5(tok), 1, 2) AS BIGINT) AS bucket,
                   CAST('0x' || substr(md5(tok), 3, 15) AS BIGINT) AS v
            FROM toks WHERE tok <> ''),
        rhos AS (
            SELECT bucket,
                   CASE WHEN v = 0 THEN 61 ELSE 61 - length(bin(v)) END AS rho
            FROM hashed)
        SELECT bucket, CAST(MAX(rho) AS INT) AS max_rho
        FROM rhos GROUP BY bucket ORDER BY bucket""",
)
def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    regs = hll_token_registers(load(spark, sf_dir, "documents"))
    return regs.select("bucket", F.col("max_rho").cast("int").alias("max_rho")).orderBy(
        "bucket"
    )


# ----------------------------------------------- count-min sketch ----

CMS_D = 4      # hash rows
CMS_W = 256    # counters per row


def cms_token_sketch(docs: DataFrame) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the corpus
    token stream: (row, col, cnt) for d=4 portable hash rows of w=256
    counters — fixed O(d*w) state however large the corpus, mergeable by
    element-wise sum, point estimate = min over rows (never an
    undercount).  col_j(tok) = 8 bits of md5(j || ':' || tok), the same
    salted-md5 family the MinHash signatures use.

    Scale: one groupBy((row, col)) with map-side partial sums — at most
    d*w rows leave each partition, the same O(state) shuffle bound as
    the HLL registers."""
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    rows = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.expr(
                            f"CAST(conv(substr(md5('{j}:' || tok), 1, 2), 16, 10) AS INT)"
                        ).alias("col"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("s")
    ).select("s.row", "s.col")
    return rows.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cms_point_estimates(docs: DataFrame, queries: DataFrame) -> DataFrame:
    """(tok, est) — count-min frequency estimate for each query token:
    min over the d rows of the queried counters.  The sketch side is
    O(d*w) and BROADCAST into the join; estimates are exact integer
    arithmetic, hence oracle-checkable end to end (including the
    guaranteed est >= true property)."""
    sketch = cms_token_sketch(docs)
    probes = queries.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.expr(
                            f"CAST(conv(substr(md5('{j}:' || tok), 1, 2), 16, 10) AS INT)"
                        ).alias("col"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("s"),
    ).select("tok", "s.row", "s.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est"))
    )


_DUCK_CMS = f"""
    toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    cms AS (
        SELECT j AS row,
               CAST('0x' || substr(md5(j || ':' || tok), 1, 2) AS INT) AS col,
               COUNT(1) AS cnt
        FROM (SELECT tok FROM toks WHERE tok <> '') t,
             (SELECT unnest(range(0, {CMS_D})) AS j) js
        GROUP BY row, col)
"""


@check(
    "cms_heavy_hitters",
    oracle=f"""
        WITH {_DUCK_CMS},
        queries AS (
            SELECT tok, COUNT(1) AS true_cnt
            FROM (SELECT tok FROM toks WHERE tok <> '') t
            GROUP BY tok ORDER BY COUNT(1) DESC, tok LIMIT 20),
        est AS (
            SELECT q.tok,
                   MIN(c.cnt) AS est
            FROM queries q
            JOIN cms c
              ON c.row BETWEEN 0 AND {CMS_D - 1}
             AND c.col = CAST('0x' || substr(md5(c.row || ':' || q.tok), 1, 2) AS INT)
            GROUP BY q.tok)
        SELECT q.tok, CAST(q.true_cnt AS BIGINT) AS true_cnt,
               CAST(e.est AS BIGINT) AS est
        FROM queries q JOIN est e ON q.tok = e.tok
        ORDER BY true_cnt DESC, q.tok""",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 true heavy hitters with their count-min estimates — the
    oracle verifies the exact sketch state AND that est carries the
    one-sided error (est >= true always holds by construction)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "tok")
        .limit(20)
    )
    est = cms_point_estimates(docs, top.select("tok"))
    return (
        top.join(est, "tok")
        .select("tok", "true_cnt", "est")
        .orderBy(F.desc("true_cnt"), "tok")
    )
