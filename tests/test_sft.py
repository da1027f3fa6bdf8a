"""SFT turn/mask laws (text/sft.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.text.sft import sft_mask_rollup, to_turns


def test_roles_alternate_and_conserve_tokens(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))],  # 20 tokens, 8/turn
        "doc_id bigint, text string",
    )
    turns = sorted(
        (r["turn_no"], r["role"], r["n_tokens"])
        for r in to_turns(docs).collect()
    )
    assert turns == [(0, "user", 8), (1, "assistant", 8), (2, "user", 4)]
    roll = sft_mask_rollup(docs).collect()[0]
    assert (roll["n_turns"], roll["trained_tokens"], roll["masked_tokens"]) == (
        3, 8, 12
    )
    # truncation keeps the NEWEST turns; 3 turns <= last 4 → everything
    assert roll["last_k_tokens"] == 20


def test_mask_partition_is_total(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    roll = sft_mask_rollup(docs)
    tok = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n"),
    )
    j = roll.join(tok, "doc_id").collect()
    for r in j:
        assert r["trained_tokens"] + r["masked_tokens"] == r["n"]
        assert 0 < r["last_k_tokens"] <= r["n"]


def test_truncation_drops_oldest(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(50)))],  # 7 turns: 6x8 + 2
        "doc_id bigint, text string",
    )
    roll = sft_mask_rollup(docs).collect()[0]
    assert roll["n_turns"] == 7
    # last 4 turns = turns 3..6 = 8+8+8+2 tokens
    assert roll["last_k_tokens"] == 26
