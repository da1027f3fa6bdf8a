"""Bloom-filter sync pre-screening — the bandwidth optimization the
push/pull family grows at scale (beyond the reference's wire protocol;
the standard distributed-sync trick, e.g. rsync batch hints / Cassandra
anti-entropy): instead of shipping the server's FULL content-hash set
to plan a push, the server ships an m-bit Bloom filter (m = 2048 bits
= 256 bytes however many objects it stores); the client classifies
each candidate hash locally —

  * ``new_sure`` — some probe bit is unset ⇒ DEFINITELY absent
    server-side (Bloom filters have no false negatives): upload without
    any round trip;
  * ``check``    — all k bits set ⇒ PROBABLY present: only these fall
    through to the exact content-address anti-join (``push_plan``).

Portable hashing: position_j(h) = first 8 hex chars of
md5(j || ':' || h) mod m — the salted-md5 family every sketch in this
engine uses, so the DuckDB oracle reproduces the exact bit array and
classification.

Scale shape: building the filter is a map-side-combined DISTINCT of at
most m positions (the HLL register discipline — O(m) rows leave any
partition); classification is a narrow explode + broadcast join against
the m-row bit table + one groupBy(hash) — the corpus-sized side never
shuffles more than its own k·distinct-hash probe rows, and the exact
anti-join afterwards runs on the ``check`` subset only (false-positive
rate (1-e^{-kn/m})^k, ~0.6% at n=256·k/m)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.operators.delta import _push_fixture_sql, push_plan
from dronedb_spark.suite import check

M_BITS = 2048
K_HASH = 4


def _pos_expr(j: int, hash_col: str = "hash") -> F.Column:
    return F.expr(
        f"CAST(conv(substr(md5('{j}:' || {hash_col}), 1, 8), 16, 10) AS BIGINT)"
        f" % {M_BITS}"
    ).cast("int")


def bloom_bits(hashes: DataFrame) -> DataFrame:
    """(pos) — the set bit positions of the filter over the distinct
    non-empty ``hash`` column."""
    h = hashes.select("hash").where(F.col("hash") != "").distinct()
    return (
        h.select(
            F.explode(F.array(*[_pos_expr(j) for j in range(K_HASH)])).alias("pos")
        )
        .distinct()
    )


def bloom_classify(client: DataFrame, bits: DataFrame) -> DataFrame:
    """(hash, n_set, cls) per distinct client hash: 'new_sure' when any
    probe bit is unset (no false negatives ⇒ safe to upload without the
    exact check), else 'check'."""
    probes = (
        client.select("hash")
        .where(F.col("hash") != "")
        .distinct()
        .select(
            "hash",
            F.explode(F.array(*[_pos_expr(j) for j in range(K_HASH)])).alias("pos"),
        )
    )
    hit = probes.join(
        F.broadcast(bits.withColumn("set", F.lit(1))), "pos", "left"
    )
    return (
        hit.groupBy("hash")
        .agg(F.sum(F.coalesce(F.col("set"), F.lit(0))).cast("int").alias("n_set"))
        .select(
            "hash",
            "n_set",
            F.when(F.col("n_set") < K_HASH, "new_sure").otherwise("check").alias("cls"),
        )
    )


def push_plan_prefiltered(
    client: DataFrame, server: DataFrame, bits: DataFrame
) -> DataFrame:
    """``push_plan``'s neededFiles computed THROUGH the Bloom screen:
    'new_sure' hashes upload directly; only 'check' hashes run the
    exact anti-join.  Returns exactly what the unscreened plan returns
    (pytest pins equality) — the screen changes bandwidth, never the
    answer."""
    cls = bloom_classify(client, bits)
    c_hashes = client.select("path", "hash").where(F.col("hash") != "")
    sure = (
        c_hashes.join(cls.filter(F.col("cls") == "new_sure").select("hash"), "hash")
        .groupBy("hash")
        .agg(F.min("path").alias("item"))
    )
    candidates = c_hashes.join(
        cls.filter(F.col("cls") == "check").select("hash"), "hash"
    )
    checked = (
        candidates.groupBy("hash")
        .agg(F.min("path").alias("item"))
        .join(
            server.select("hash").where(F.col("hash") != "").distinct(),
            "hash",
            "left_anti",
        )
    )
    return (
        sure.select("item")
        .unionByName(checked.select("item"))
        .select("item", F.lit("file").alias("kind"))
    )


# ----------------------------------------------------------- check --


def _bloom_oracle() -> str:
    t = _push_fixture_sql("duckdb")
    pos = (
        "CAST(CAST('0x' || substr(md5(j || ':' || hash), 1, 8) AS BIGINT)"
        f" % {M_BITS} AS INT)"
    )
    return f"""
        WITH server AS ({t["server"]}), client AS ({t["client"]}),
        bits AS (
            SELECT DISTINCT {pos} AS pos
            FROM (SELECT DISTINCT hash FROM server WHERE hash <> '') s,
                 (SELECT unnest(range(0, {K_HASH})) AS j) js),
        probes AS (
            SELECT hash, {pos} AS pos
            FROM (SELECT DISTINCT hash FROM client WHERE hash <> '') c,
                 (SELECT unnest(range(0, {K_HASH})) AS j) js),
        scored AS (
            SELECT p.hash,
                   CAST(SUM(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS INT)
                       AS n_set
            FROM probes p LEFT JOIN bits b ON b.pos = p.pos
            GROUP BY p.hash)
        SELECT hash, n_set,
               CASE WHEN n_set < {K_HASH} THEN 'new_sure' ELSE 'check' END AS cls
        FROM scored ORDER BY hash"""


@check("push_bloom_classify", oracle=_bloom_oracle())
def q_push_bloom_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom screen over the push fixture: exact bit counts and the
    classification of every distinct client hash (the oracle rebuilds
    the identical 2048-bit array).  No-false-negative law and
    screen == exact-plan equality are pytest-pinned."""
    t = _push_fixture_sql("spark")
    server = spark.sql(t["server"])
    client = spark.sql(t["client"])
    return bloom_classify(client, bloom_bits(server)).orderBy("hash")
