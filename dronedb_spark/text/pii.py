"""PII detection / redaction metrics — a standard pre-training scrub
stage (emails, IPv4 addresses, long digit runs), as pure column regex.

Patterns stick to character classes + bounded quantifiers so Java regex
(Spark) and RE2 (DuckDB) agree exactly; counting is non-overlapping
left-to-right scan in both engines.  Redaction replaces in a fixed order
(email → ip → long-id) so the passes compose identically.

The synthetic corpus contains no PII, so the checked corpus APPENDS
deterministic PII to a doc_id-keyed subset (same construction in the
oracle) — real match mass, not a vacuous all-zeros pass.  Everything is
one narrow scan: no shuffle, no UDF, safe at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import register_views

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
LONGID_RE = r"[0-9]{9,}"


def pii_metrics(docs: DataFrame) -> DataFrame:
    """Per-doc PII match counts + the redacted text length."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
        ),
        LONGID_RE,
        "<ID>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(IP_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_ips"),
        F.size(F.regexp_extract_all("text", F.lit(LONGID_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_longids"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
    )


# deterministic PII injection — identical text in both engines
_PII_CORPUS = """
    SELECT doc_id,
           text || CASE
               WHEN doc_id % 4 = 0 THEN ' reach user' || CAST(doc_id AS STRING)
                                        || '@example.com soon'
               WHEN doc_id % 4 = 1 THEN ' node 10.' || CAST(doc_id % 256 AS STRING)
                                        || '.0.' || CAST((doc_id * 7) % 256 AS STRING)
               WHEN doc_id % 4 = 2 THEN ' ref 9' || LPAD(CAST(doc_id AS STRING), 10, '0')
               ELSE '' END AS text
    FROM documents
"""


@check(
    "pii_redaction_metrics",
    oracle=f"""
        WITH corpus AS ({_PII_CORPUS})
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{IP_RE}')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(text, '{LONGID_RE}')) AS BIGINT) AS n_longids,
               CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
                    '{EMAIL_RE}', '<EMAIL>', 'g'), '{IP_RE}', '<IP>', 'g'),
                    '{LONGID_RE}', '<ID>', 'g')) AS BIGINT) AS redacted_len
        FROM corpus ORDER BY doc_id""",
)
def q_pii_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["documents"])
    return pii_metrics(spark.sql(_PII_CORPUS)).orderBy("doc_id")
