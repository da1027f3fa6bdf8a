"""Round-13 session operators: blocked fuzzy record linkage (batch,
store, 10x, streaming), Kneser-Ney bigram smoothing, and Bradley-Terry
preference strengths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.text.btrank import bradley_terry, player_wins, source_duels
from dronedb_spark.text.fuzzy import (
    MAX_DIST,
    entity_records,
    fuzzy_blocked_matches,
    fuzzy_match_triples,
    incremental_fuzzy_probe,
    inflated_probes,
    perturbed_probes,
    probe_blocks,
    write_fuzzy_store,
)
from dronedb_spark.text.lm import doc_cross_entropy_kn


# ------------------------------------------------------------- fuzzy --


def test_fuzzy_blocked_equals_brute_force(spark, sf_dir):
    """The blocking key must lose NOTHING on the bounded-position edit
    model: blocked matches == the all-pairs Levenshtein join."""
    docs = load(spark, sf_dir, "documents")
    recs = entity_records(docs)
    probes = perturbed_probes(docs)
    blocked = {
        (r["probe_id"], r["rec_id"], r["dist"])
        for r in fuzzy_match_triples(recs, probes).collect()
    }
    brute = {
        (r["probe_id"], r["rec_id"], r["dist"])
        for r in probes.crossJoin(recs.withColumnRenamed("block", "_rb"))
        .select(
            "probe_id", "rec_id", F.levenshtein("pname", "name").alias("dist")
        )
        .filter(F.col("dist") <= MAX_DIST)
        .collect()
    }
    assert blocked == brute
    assert blocked


def test_fuzzy_every_probe_finds_its_original(spark, sf_dir):
    """Each planted edit is within MAX_DIST of its own source record,
    so every probe id must appear with best_dist in 1..2 and its own
    rec_id among the matches."""
    docs = load(spark, sf_dir, "documents")
    out = {
        r["probe_id"]: r
        for r in fuzzy_blocked_matches(
            entity_records(docs), perturbed_probes(docs)
        ).collect()
    }
    probe_ids = [r["probe_id"] for r in perturbed_probes(docs).collect()]
    triples = fuzzy_match_triples(
        entity_records(docs), perturbed_probes(docs)
    ).collect()
    matched_pairs = {(r["probe_id"], r["rec_id"]) for r in triples}
    for pid in probe_ids:
        assert pid in out, f"probe {pid} matched nothing"
        assert 0 <= out[pid]["best_dist"] <= MAX_DIST
        assert (pid, pid) in matched_pairs  # self-record always qualifies


def test_fuzzy_store_probe_equals_batch(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    recs = entity_records(docs)
    probes = perturbed_probes(docs)
    path = str(tmp_path / "fstore")
    write_fuzzy_store(recs, path)
    blocks = probe_blocks(probes)
    assert blocks == sorted(blocks) and len(blocks) <= 4096
    via_store = sorted(
        tuple(r) for r in incremental_fuzzy_probe(spark, path, probes).collect()
    )
    in_mem = sorted(
        tuple(r) for r in fuzzy_blocked_matches(recs, probes).collect()
    )
    assert via_store == in_mem


def test_fuzzy_10x_copies_identical(spark, sf_dir):
    """Every inflated replica must reproduce the 1x per-probe result —
    the linear-scaling evidence the oracle also derives analytically."""
    docs = load(spark, sf_dir, "documents")
    recs = entity_records(docs)
    base = sorted(
        (r["probe_id"], r["n_matches"], r["best_dist"], r["best_rec_id"])
        for r in fuzzy_blocked_matches(recs, perturbed_probes(docs)).collect()
    )
    big = fuzzy_blocked_matches(recs, inflated_probes(docs, copies=3)).collect()
    by_copy: dict[int, list] = {}
    for r in big:
        k, pid = divmod(r["probe_id"], 10000000)
        by_copy.setdefault(k, []).append(
            (pid, r["n_matches"], r["best_dist"], r["best_rec_id"])
        )
    assert set(by_copy) == {0, 1, 2}
    for k in by_copy:
        assert sorted(by_copy[k]) == base


def test_stream_fuzzy_triples_match_batch(spark, sf_dir, tmp_path):
    """Stateless stream-static join: any microbatch split of the probe
    arrivals yields exactly the batch triples."""
    from dronedb_spark.streaming.fuzzy import stream_fuzzy_probe

    docs = load(spark, sf_dir, "documents")
    recs = entity_records(docs)
    probes = stream_fuzzy_probe(perturbed_probes(docs), recs)
    want = sorted(tuple(r) for r in probes.collect())

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    got: list[tuple] = []

    def absorb(df, _eid):
        got.extend(tuple(r) for r in df.collect())

    batch_probes = perturbed_probes(docs)
    for sl in [0, 1, 2]:
        part = batch_probes.filter(F.expr(f"probe_id % 3 = {sl}"))
        if part.isEmpty():
            continue
        part.coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_fuzzy_probe(
                spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
                recs,
            )
            .writeStream.foreachBatch(absorb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    assert sorted(got) == want
    assert got


# ---------------------------------------------------------- Kneser-Ney --


def test_kn_hand_computed_probability(spark):
    """Lock the smoothing arithmetic on a hand-computed fixture:
    train = {a b, a b, a c} -> n1(a)=3, fan1(a)=2, cont(b)=cont(c)=1,
    T=2 bigram types, V=3 vocab; p_cont(b) = 2/6; with D=0.75
    p(b|a) = (max(2-0.75,0) + 0.75*2*(2/6)) / 3 = 1.75/3."""
    import math

    train = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    score = spark.createDataFrame([(10, "a b")], "doc_id long, text string")
    row = doc_cross_entropy_kn(score, train).collect()[0]
    assert row["n_pairs"] == 1
    assert row["cross_entropy"] == pytest.approx(-math.log(1.75 / 3.0), abs=1e-12)


def test_kn_unseen_context_backs_off_to_continuation(spark):
    """A pair with an unseen left context scores p_cont(w2) exactly;
    a fully OOV pair scores the 1/(T+V+1) floor."""
    import math

    train = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    # 'b c': left context 'b' unseen in training bigrams -> p_cont(c)=2/6
    row = doc_cross_entropy_kn(
        spark.createDataFrame([(10, "b c")], "doc_id long, text string"), train
    ).collect()[0]
    assert row["cross_entropy"] == pytest.approx(-math.log(2.0 / 6.0), abs=1e-12)
    # 'z z': both OOV -> p = (0+1)/(2+3+1) = 1/6
    row = doc_cross_entropy_kn(
        spark.createDataFrame([(11, "z z")], "doc_id long, text string"), train
    ).collect()[0]
    assert row["cross_entropy"] == pytest.approx(-math.log(1.0 / 6.0), abs=1e-12)


def test_kn_orders_docs_like_frequency(spark, sf_dir):
    """Corpus sanity: a document made of the corpus' most frequent
    bigram scores lower cross-entropy than shuffled rare tokens."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = doc_cross_entropy_kn(docs, docs).collect()
    assert all(r["cross_entropy"] > 0 for r in out)
    assert all(r["perplexity"] > 1 for r in out)


# -------------------------------------------------------- Bradley-Terry --


def _mm_reference(games: dict[tuple[str, str], tuple[int, int]], n_iter: int = 3):
    """Independent driver-side MM implementation (numpy-free, pure
    Python) for the pin: games maps (s1, s2) -> (n_games, wins_of_s1)."""
    players = sorted({p for k in games for p in k})
    wins = {p: 0.0 for p in players}
    n_ij: dict[tuple[str, str], float] = {}
    for (s1, s2), (n, w1) in games.items():
        wins[s1] += w1
        wins[s2] += n - w1
        n_ij[(s1, s2)] = n_ij.get((s1, s2), 0) + n
        n_ij[(s2, s1)] = n_ij.get((s2, s1), 0) + n
    p = {pl: 1.0 for pl in players}
    for _ in range(n_iter):
        new = {}
        for i in players:
            denom = sum(
                n / (p[i] + p[j]) for (a, j), n in n_ij.items() if a == i
            )
            new[i] = wins[i] / denom
        total = sum(new.values())
        p = {i: v * len(players) / total for i, v in new.items()}
    return p, wins


def test_bradley_terry_matches_reference_mm(spark):
    rows = [
        # doc_id, source, n_chars: A's docs longer than B's, B's than C's
        (0, "A", 30), (1, "B", 20), (2, "C", 10), (3, "A", 31),
        (4, "B", 21), (5, "C", 11), (6, "A", 32), (7, "B", 22),
        (8, "C", 12), (9, "A", 33),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    games_df = source_duels(docs).collect()
    games = {(r["s1"], r["s2"]): (r["n_games"], r["w1"]) for r in games_df}
    ref_p, ref_w = _mm_reference(games)
    got = {r["i"]: r for r in bradley_terry(source_duels(docs)).collect()}
    assert set(got) == set(ref_p)
    for pl in ref_p:
        assert got[pl]["strength"] == pytest.approx(ref_p[pl], rel=1e-9)
        assert got[pl]["w"] == int(ref_w[pl])
    # the always-longer source dominates
    assert got["A"]["strength"] > got["B"]["strength"] > got["C"]["strength"]


def test_bradley_terry_normalized_and_consistent(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = bradley_terry(source_duels(docs)).collect()
    assert out
    mean = sum(r["strength"] for r in out) / len(out)
    assert mean == pytest.approx(1.0, abs=1e-9)
    wins = {r["i"]: r["w"] for r in player_wins(source_duels(docs)).collect()}
    for r in out:
        assert r["w"] == wins[r["i"]]
        assert 0 <= r["w"] <= r["n_games"]
        assert r["strength"] >= 0
