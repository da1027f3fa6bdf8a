"""SimHash document fingerprints — 64-bit signatures, engine-portable.

SimHash: each token votes ±1 on every one of 64 bit positions (its md5
decides the sign); the signature bit is the sign of the vote sum.  Near-
duplicate documents differ in few bits (Hamming distance).

Portability: the 64 bits live in the first 16 hex chars of md5(token).
Hex digit d at position p contributes to 4 bit-sums via pure arithmetic
(d>=8, d%8>=4, d%4>=2, d%2) — the same text works in Spark SQL and
DuckDB, which is what lets the oracle verify exact signatures.

Scale shape: explode tokens → 64 CASE sums via ONE groupBy(doc_id) with
map-side combine — the shuffle carries one 64-int row per doc.  Hamming
distance between signatures is JVM-side ``bit_count(xor)`` on the
reconstructed int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

N_HEX = 16  # 16 hex chars = 64 bits
_HEX = "0123456789abcdef"


def _digit_expr(p: int, dialect: str) -> str:
    # hex digit value at md5 position p (0..15)
    if dialect == "spark":
        return f"(instr('{_HEX}', substr(md5(s), {p + 1}, 1)) - 1)"
    return f"(strpos('{_HEX}', substr(md5(s), {p + 1}, 1)) - 1)"


def _bit_tests(p: int, dialect: str) -> list[str]:
    d = f"d{p}"
    return [
        f"SUM(CASE WHEN {d} >= 8 THEN 1 ELSE -1 END) AS s{p}_3",
        f"SUM(CASE WHEN ({d} % 8) >= 4 THEN 1 ELSE -1 END) AS s{p}_2",
        f"SUM(CASE WHEN ({d} % 4) >= 2 THEN 1 ELSE -1 END) AS s{p}_1",
        f"SUM(CASE WHEN ({d} % 2) = 1 THEN 1 ELSE -1 END) AS s{p}_0",
    ]


def _final_digit(p: int) -> str:
    return (
        f"(CASE WHEN s{p}_3 > 0 THEN 8 ELSE 0 END + CASE WHEN s{p}_2 > 0 THEN 4 ELSE 0 END"
        f" + CASE WHEN s{p}_1 > 0 THEN 2 ELSE 0 END + CASE WHEN s{p}_0 > 0 THEN 1 ELSE 0 END)"
    )


def _signature_select(dialect: str) -> str:
    """SELECT doc_id, simhash FROM <token sums>; dialect differs only in
    the tokenizer and strpos/instr."""
    if dialect == "spark":
        tokens = "SELECT doc_id, explode(split(text, ' ')) AS s FROM documents"
    else:
        tokens = "SELECT doc_id, unnest(string_split(text, ' ')) AS s FROM documents"
    digits = ", ".join(f"{_digit_expr(p, dialect)} AS d{p}" for p in range(N_HEX))
    sums = ", ".join(", ".join(_bit_tests(p, dialect)) for p in range(N_HEX))
    chars = " || ".join(f"substr('{_HEX}', {_final_digit(p)} + 1, 1)" for p in range(N_HEX))
    return f"""
        SELECT doc_id, {chars} AS simhash
        FROM (
            SELECT doc_id, {sums}
            FROM (SELECT doc_id, {digits} FROM ({tokens}) tok) d
            GROUP BY doc_id
        ) t
    """


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per document (hex string).  The per-token digit
    arithmetic is CPU-heavy, so the input is spread to full parallelism
    first (no-op when the scan already has enough splits)."""
    from dronedb_spark.tables import spread

    docs = spread(docs)
    docs.createOrReplaceTempView("documents")
    return docs.sparkSession.sql(_signature_select("spark"))


def simhash_hamming(sig: DataFrame, max_dist: int = 16) -> DataFrame:
    """Candidate near-dups by Hamming distance — JVM-side bit_count over
    the parsed int64 signature (engine surface; not oracle-checked since
    conv() has no DuckDB twin)."""
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    j = a.join(b, F.col("doc_a") < F.col("doc_b"))
    dist = F.expr("bit_count(conv(ha, 16, 10) ^ conv(hb, 16, 10))")
    return j.select("doc_a", "doc_b", dist.cast("int").alias("hamming")).filter(
        F.col("hamming") <= max_dist
    )


@check("text_simhash", oracle=_signature_select("duckdb"))
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_signatures(load(spark, sf_dir, "documents"))
