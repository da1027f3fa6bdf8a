"""SFT / chat-data preparation — the turn-structured operators every
instruction-tuning pipeline runs between curation and packing: parse
documents into role-alternating TURNS, mask the loss to
assistant-authored tokens only (user turns condition, never train),
and truncate long conversations to their last K turns (the
context-window discipline that keeps the newest exchange).

Fixture note: the corpus has no real chat markup, so a turn here is a
fixed window of ``WORDS_PER_TURN`` whitespace tokens with alternating
user/assistant roles — the derivation is synthetic, the operator
plumbing (turn explode, role assignment, role-masked token accounting,
suffix truncation) is the real shape and every number is
oracle-checked.  A production deployment swaps ``to_turns`` for its
template parser; everything downstream is unchanged.

Scale shape: ``to_turns`` is one explode (corpus-sized, the packing
stage needs the rows anyway); the mask/truncation accounting
aggregates back to doc-sized with map-side combine; no window over
token rows (turn indices derive arithmetically from positions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

WORDS_PER_TURN = 8
LAST_K_TURNS = 4


def to_turns(docs: DataFrame, words_per_turn: int = WORDS_PER_TURN) -> DataFrame:
    """(doc_id, turn_no, role, n_tokens): the conversation rows — token
    position DIV words_per_turn is the turn, even turns are 'user',
    odd are 'assistant' (conversations open with the user)."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    turned = toks.select(
        "doc_id", F.expr(f"pos DIV {words_per_turn}").alias("turn_no")
    )
    return turned.groupBy("doc_id", "turn_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    ).select(
        "doc_id",
        "turn_no",
        F.when(F.col("turn_no") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "n_tokens",
    )


def sft_mask_rollup(
    docs: DataFrame,
    words_per_turn: int = WORDS_PER_TURN,
    last_k: int = LAST_K_TURNS,
) -> DataFrame:
    """(doc_id, n_turns, trained_tokens, masked_tokens, last_k_tokens):
    the loss-masking + truncation accounting per conversation —
    trained = assistant-turn tokens, masked = user-turn tokens,
    last_k_tokens = what survives truncating to the newest ``last_k``
    turns."""
    turns = to_turns(docs, words_per_turn)
    per_doc = turns.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(
            F.when(F.col("role") == "assistant", F.col("n_tokens")).otherwise(0)
        )
        .cast("bigint")
        .alias("trained_tokens"),
        F.sum(
            F.when(F.col("role") == "user", F.col("n_tokens")).otherwise(0)
        )
        .cast("bigint")
        .alias("masked_tokens"),
        F.max("turn_no").alias("_max_turn"),
    )
    kept = (
        turns.join(
            per_doc.select("doc_id", "_max_turn"), "doc_id"
        )
        .filter(F.col("turn_no") > F.col("_max_turn") - last_k)
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").cast("bigint").alias("last_k_tokens"))
    )
    return per_doc.drop("_max_turn").join(kept, "doc_id")


@check(
    "sft_mask_rollup",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, w[i] AS tok,
                   CAST((i - 1) // {WORDS_PER_TURN} AS BIGINT) AS turn_no
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents),
                 UNNEST(range(1, len(w) + 1)) AS r(i)
            WHERE w[i] <> ''),
        turns AS (
            SELECT doc_id, turn_no,
                   CASE WHEN turn_no % 2 = 0 THEN 'user'
                        ELSE 'assistant' END AS role,
                   CAST(COUNT(1) AS BIGINT) AS n_tokens
            FROM toks GROUP BY doc_id, turn_no),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(1) AS BIGINT) AS n_turns,
                   CAST(SUM(CASE WHEN role = 'assistant' THEN n_tokens
                                 ELSE 0 END) AS BIGINT) AS trained_tokens,
                   CAST(SUM(CASE WHEN role = 'user' THEN n_tokens
                                 ELSE 0 END) AS BIGINT) AS masked_tokens,
                   MAX(turn_no) AS max_turn
            FROM turns GROUP BY doc_id),
        kept AS (
            SELECT t.doc_id,
                   CAST(SUM(t.n_tokens) AS BIGINT) AS last_k_tokens
            FROM turns t JOIN per_doc p ON p.doc_id = t.doc_id
            WHERE t.turn_no > p.max_turn - {LAST_K_TURNS}
            GROUP BY t.doc_id)
        SELECT p.doc_id, p.n_turns, p.trained_tokens, p.masked_tokens,
               k.last_k_tokens
        FROM per_doc p JOIN kept k ON k.doc_id = p.doc_id
        ORDER BY p.doc_id""",
)
def q_sft_mask_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-mask + last-4-turn truncation accounting for every
    conversation in the corpus — turn counts, trained vs masked token
    mass, and the truncated suffix size all re-derived by the
    oracle."""
    return sft_mask_rollup(load(spark, sf_dir, "documents")).orderBy("doc_id")
