"""LM perplexity scoring (text/lm.py) and sequence packing
(text/packing.py) unit tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dronedb_spark.text.lm import doc_cross_entropy, train_unigram, unigram_logprob, explode_tokens
from dronedb_spark.text.packing import pack_sequences, running_offsets


def _docs(spark, texts):
    return spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )


def test_unigram_probabilities_sum_below_one(spark):
    lm = train_unigram(_docs(spark, ["a a b", "b c"])).collect()
    by_tok = {r["tok"]: r for r in lm}
    # N=5 tokens, V=3 vocab → denom 9; add-one: a:(2+1)/9, b:(2+1)/9, c:(1+1)/9
    assert by_tok["a"]["logp"] == pytest.approx(math.log(3 / 9))
    assert by_tok["c"]["logp"] == pytest.approx(math.log(2 / 9))
    assert by_tok["a"]["oov_logp"] == pytest.approx(math.log(1 / 9))
    total_p = sum(math.exp(r["logp"]) for r in lm) + math.exp(lm[0]["oov_logp"])
    assert total_p == pytest.approx(1.0)


def test_cross_entropy_with_oov(spark):
    train = _docs(spark, ["a a b"])
    lm = train_unigram(train)
    score = _docs(spark, ["a z"])  # z is OOV
    [row] = doc_cross_entropy(score, lm).collect()
    # N=3, V=2 → denom 6; a: 3/6, oov: 1/6
    expect = -(math.log(3 / 6) + math.log(1 / 6)) / 2
    assert row["n_tokens"] == 2 and row["n_oov"] == 1
    assert row["cross_entropy"] == pytest.approx(expect)
    assert row["perplexity"] == pytest.approx(math.exp(expect))


def test_head_tail_split_matches_full_broadcast(spark):
    docs = _docs(spark, ["a b c d e", "a a b z q", "c c c c x"])
    lm = train_unigram(docs)
    toks = explode_tokens(docs)
    tiny = unigram_logprob(toks, lm, head_k=1).groupBy("doc_id").agg(
        F.round(F.sum("logp"), 9).alias("s")).collect()
    big = unigram_logprob(toks, lm, head_k=10_000).groupBy("doc_id").agg(
        F.round(F.sum("logp"), 9).alias("s")).collect()
    assert sorted(map(tuple, tiny)) == sorted(map(tuple, big))


def test_running_offsets_matches_serial_scan(spark):
    import random

    rng = random.Random(7)
    rows = [{"k": i, "v": rng.randint(0, 50)} for i in range(500)]
    df = spark.createDataFrame(rows).repartition(13)  # scrambled input
    got = {r["k"]: r["offset"]
           for r in running_offsets(df, "k", "v").collect()}
    acc = 0
    for r in rows:  # already in k order
        assert got[r["k"]] == acc, r
        acc += r["v"]


def test_pack_sequences_roster(spark):
    # 3 docs of 4, 5, 3 tokens; seq_len 6 → chunks [0,6) [6,12)
    docs = _docs(spark, ["a b c d", "e f g h i", "j k l"])
    out = {r["chunk_id"]: r for r in pack_sequences(docs, 6).collect()}
    assert set(out) == {0, 1}
    # chunk 0: doc0 (0-3) + doc1 (4-8 spills) → docs {0,1}
    assert (out[0]["n_docs"], out[0]["first_doc"], out[0]["last_doc"]) == (2, 0, 1)
    assert out[0]["n_tokens"] == 6
    # chunk 1: doc1 tail + doc2 (9-11) → docs {1,2}; short fill 12-12=6 → total=12 → 6
    assert (out[1]["n_docs"], out[1]["first_doc"], out[1]["last_doc"]) == (2, 1, 2)
    assert out[1]["n_tokens"] == 6
    # short last chunk
    out2 = {r["chunk_id"]: r for r in pack_sequences(docs, 5).collect()}
    assert out2[2]["n_tokens"] == 2  # total 12 tokens → last chunk holds 2


def test_lm_score_plan_broadcasts_head(spark):
    docs = _docs(spark, ["a b", "b c"])
    lm = train_unigram(docs)
    plan = (
        doc_cross_entropy(docs, lm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semdedup_drops_exact_copies_keeps_originals(spark, sf_dir):
    from dronedb_spark.tables import load
    from dronedb_spark.vectors.semdedup import semdedup

    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 5 == 0).withColumn("vec_id", F.col("vec_id") + 10000)
    )
    rows = {r["vec_id"]: r["kept"] for r in semdedup(corpus).collect()}
    originals = [v for v in rows if v < 10000]
    copies = [v for v in rows if v >= 10000]
    assert copies and all(not rows[v] for v in copies)      # every copy pruned
    assert all(rows[v] for v in originals)                  # every original kept


def test_semdedup_plan_equijoin_on_cell(spark, sf_dir):
    from dronedb_spark.tables import load
    from dronedb_spark.vectors.semdedup import semdedup

    plan = (
        semdedup(load(spark, sf_dir, "embeddings"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_bigram_interp_closed_form(spark):
    import math

    from dronedb_spark.text.lm import (
        doc_cross_entropy_interp, train_bigram, train_unigram,
    )

    train = _docs(spark, ["a b a b"])
    uni, bi = train_unigram(train), train_bigram(train)
    # unigram: N=4, V=2 → denom 7; p(a)=3/7, p(b)=3/7, oov=1/7
    # bigrams: (a,b)x2, (b,a)x1; n1(a)=2, n1(b)=1; V=2
    score = _docs(spark, ["a b z"])  # pairs: (a,b) seen, (b,z) unseen pair
    [row] = doc_cross_entropy_interp(score, uni, bi, lam=0.7).collect()
    p_ab = 0.7 * (2 + 1) / (2 + 2 + 1) + 0.3 * (3 / 7)
    p_bz = 0.7 * 0.0 + 0.3 * (1 / 7)  # unseen pair AND oov word
    expect = -(math.log(p_ab) + math.log(p_bz)) / 2
    assert row["n_pairs"] == 2
    assert row["cross_entropy"] == pytest.approx(expect)
    # seen text scores lower entropy than gibberish
    [good] = doc_cross_entropy_interp(_docs(spark, ["a b a b"]), uni, bi).collect()
    [bad] = doc_cross_entropy_interp(_docs(spark, ["z q w v"]), uni, bi).collect()
    assert good["cross_entropy"] < bad["cross_entropy"]


def test_bpe_learns_classic_merges(spark):
    from dronedb_spark.text.bpe import END, encode_words, learn_bpe, word_freqs

    docs = _docs(spark, ["low low low low low", "lower lower", "newest newest newest",
                         "widest widest"])
    merges = learn_bpe(docs, 8)
    assert len(merges) >= 4
    # 'lo' must merge early: 'l','o' appears in low(5)+lower(2) = 7 words
    assert merges[0] == ("l", "o")
    assert ("lo", "w") in merges[:3]
    # encoding compresses: 'low</w>' becomes a single token eventually
    words = word_freqs(docs)
    enc = {r["word"]: r["tokens"] for r in encode_words(words, merges).collect()}
    assert len(enc["low"]) < len("low") + 1
    # the two encode paths agree
    enc2 = {r["word"]: r["tokens"]
            for r in encode_words(words, merges, expr_max=0).collect()}
    assert enc == enc2
    # every token stream reassembles the word + end marker
    for w, toks in enc.items():
        assert "".join(toks) == w + END


def test_bpe_merge_fold_is_greedy_left(spark):
    from dronedb_spark.text.bpe import apply_merge

    t = spark.createDataFrame([{"word": "aaa", "freq": 1,
                                "syms": ["a", "a", "a", "</w>"]}])
    [row] = apply_merge(t, "a", "a").collect()
    assert row["syms"] == ["aa", "a", "</w>"]  # left-to-right, no re-merge


def test_pca_matches_numpy_and_orders_variance(spark, sf_dir):
    import numpy as np

    from dronedb_spark.tables import load
    from dronedb_spark.vectors.pca import covariance, pca_components, pca_project

    emb = load(spark, sf_dir, "embeddings")
    x = np.array([np.asarray(r["embedding"], np.float64)
                  for r in emb.select("embedding").collect()])
    cov, mean, n = covariance(emb)
    assert n == len(x)
    ref_cov = (x.T @ x) / n - np.outer(x.mean(0), x.mean(0))
    assert np.allclose(cov, ref_cov, atol=1e-9)
    comps, mean2 = pca_components(emb, 4)
    assert comps.shape == (4, x.shape[1])
    # projections: variance non-increasing across components, and the
    # distributed projection equals the numpy one
    proj = pca_project(emb.select("vec_id", "embedding"), comps, mean2)
    rows = proj.orderBy("vec_id").collect()
    got = np.array([[r[f"pc{k}"] for k in range(4)] for r in rows])
    ids = [r["vec_id"] for r in rows]
    ref = (x[np.argsort(np.argsort(ids))] - mean2) @ comps.T  # rows align by vec_id order
    xs = np.array([np.asarray(r["embedding"], np.float64) for r in rows])
    ref = (xs - mean2) @ comps.T
    assert np.allclose(got, ref, atol=1e-9)
    var = got.var(axis=0)
    assert all(var[i] + 1e-12 >= var[i + 1] for i in range(3))
    # top-4 capture more variance than any other 4 coordinates would
    assert var.sum() > np.sort(np.diag(cov))[-4:].sum() - 1e-9


def test_ridge_classifier_beats_majority_baseline(spark, sf_dir):
    import numpy as np

    from dronedb_spark.tables import load
    from dronedb_spark.text.classifier import fit_ridge, score

    docs = load(spark, sf_dir, "documents")
    label = F.col("lang") == "en"
    w = fit_ridge(docs, label)
    assert w.shape == (5,)
    scored = score(docs, w).select("quality_score", label.alias("y")).collect()
    ys = np.array([r["y"] for r in scored])
    ss = np.array([r["quality_score"] for r in scored])
    acc = ((ss > 0.5) == ys).mean()
    majority = max(ys.mean(), 1 - ys.mean())
    assert acc >= majority  # the fitted filter is at least as good
    # gram solve matches a driver-side least-squares on the same features
    from dronedb_spark.text.classifier import feature_cols

    fx = load(spark, sf_dir, "documents").select(
        *[c.alias(n) for n, c in feature_cols()], label.cast("double").alias("y")
    ).collect()
    X = np.array([[r[n] for n, _ in feature_cols()] for r in fx])
    y = np.array([r["y"] for r in fx])
    ref = np.linalg.solve(X.T @ X + 1e-3 * np.eye(5), X.T @ y)
    assert np.allclose(w, ref, atol=1e-8)


def test_connected_components_long_chain_converges(spark):
    from dronedb_spark.text.dedup import connected_components

    # 40-node path: O(diameter) propagation would need 40 rounds; the
    # pointer-doubled loop must reach the exact fixpoint (all label 0)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    labels = connected_components(edges).collect()
    assert len(labels) == 41
    assert all(r["label"] == 0 for r in labels)
    # two disjoint chains keep separate min labels
    edges2 = spark.createDataFrame(
        [(i, i + 1) for i in range(10)] + [(100 + i, 101 + i) for i in range(10)],
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["label"] for r in connected_components(edges2).collect()}
    assert all(got[n] == 0 for n in range(11))
    assert all(got[n] == 100 for n in range(100, 111))


def test_bpe_encode_corpus_paths_agree(spark, sf_dir):
    """The expr-chain fold and the Arrow greedy-lowest-rank pass must
    tokenize the real corpus vocabulary identically (sequential rank
    passes == greedy: a merge only creates pairs over later-learned
    symbols) — the driver row exercises only the expr path."""
    from dronedb_spark.tables import load
    from dronedb_spark.text.bpe import BPE_MERGES, encode_words, word_freqs

    words = word_freqs(load(spark, sf_dir, "documents"))
    a = {r["word"]: list(r["tokens"])
         for r in encode_words(words, BPE_MERGES).collect()}
    b = {r["word"]: list(r["tokens"])
         for r in encode_words(words, BPE_MERGES, expr_max=0).collect()}
    assert a == b and len(a) > 0
    # every word reassembles from its tokens
    for w, toks in a.items():
        assert "".join(toks) == w + "</w>"


def test_chunking_invariants(spark, sf_dir):
    """Coverage + overlap invariants of the sliding-window chunker:
    every token index covered, consecutive chunks overlap by exactly
    OVERLAP tokens, short docs yield one chunk, reconstruction of the
    document from stride-prefixes is exact."""
    from dronedb_spark.tables import load
    from dronedb_spark.text.chunking import CHUNK, OVERLAP, STRIDE, chunk_documents

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs.collect()}
    rows = chunk_documents(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, t in toks.items() if t}
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_no"])
        n = len(toks[d])
        assert [c["chunk_no"] for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            words = c["chunk_text"].split(" ")
            assert c["n_tokens"] == len(words) <= CHUNK
            start = c["chunk_no"] * STRIDE
            assert words == toks[d][start : start + CHUNK]
            covered.update(range(start, start + len(words)))
        assert covered == set(range(n))
        if n <= CHUNK:
            assert len(chunks) == 1
        for a, b in zip(chunks, chunks[1:]):
            ov = a["chunk_text"].split(" ")[STRIDE:]
            assert b["chunk_text"].split(" ")[: len(ov)] == ov
            assert len(ov) == OVERLAP or b is chunks[-1]


def test_chunking_guard():
    import pytest as _pytest

    from dronedb_spark.text.chunking import chunk_documents

    with _pytest.raises(ValueError):
        chunk_documents(None, chunk=4, overlap=4)


def test_shard_shuffle_balanced_and_deterministic(spark, sf_dir):
    from dronedb_spark.tables import load
    from dronedb_spark.text.sharding import N_SHARDS, shard_shuffle

    docs = load(spark, sf_dir, "documents").select("doc_id")
    a = {(r["doc_id"], r["shard"], r["pos"]) for r in shard_shuffle(docs).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in shard_shuffle(docs).collect()}
    assert a == b and len(a) == docs.count()
    sizes = {}
    for _, s, _ in a:
        sizes[s] = sizes.get(s, 0) + 1
    n = len(a)
    # balanced in expectation: no shard more than 2x the fair share
    assert max(sizes.values()) <= 2 * (n // N_SHARDS) + 1
    # a different seed permutes differently
    c = {(r["doc_id"], r["shard"], r["pos"])
         for r in shard_shuffle(docs, seed="other").collect()}
    assert c != a


def test_temperature_budgets_conserve_and_flatten(spark, sf_dir):
    """Budgets sum exactly to the total (largest-remainder conservation)
    and flatten the distribution: every source's budget share sits
    between its raw share and the uniform share."""
    from dronedb_spark.tables import load
    from dronedb_spark.text.mixture import TOTAL_BUDGET, temperature_budgets

    docs = load(spark, sf_dir, "documents").select("source")
    rows = temperature_budgets(docs).collect()
    assert sum(r["budget"] for r in rows) == TOTAL_BUDGET
    n_total = sum(r["n_docs"] for r in rows)
    k = len(rows)
    for r in rows:
        raw = r["n_docs"] / n_total
        share = r["budget"] / TOTAL_BUDGET
        lo, hi = sorted((raw, 1.0 / k))
        assert lo - 0.01 <= share <= hi + 0.01, (r["source"], raw, share)


def test_eval_decontam_flags_only_planted(spark, sf_dir):
    from dronedb_spark.tables import load
    from dronedb_spark.vectors.evalfilter import eval_contaminated
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 17 == 0)
    got = {r["vec_id"]: r["max_cos_micro"] for r in eval_contaminated(emb, ev).collect()}
    planted = {r["vec_id"] for r in ev.collect()}
    assert set(got) == planted
    assert all(v == 1000000 for v in got.values())


def test_quota_twophase_equals_window_formulation(spark, sf_dir):
    """The two-phase cutoff path must select EXACTLY the window
    formulation's survivors, source for source."""
    from dronedb_spark.tables import load
    from dronedb_spark.text.quality import (
        mixture_quota_sample,
        mixture_quota_twophase,
    )

    docs = load(spark, sf_dir, "documents")
    a = {tuple(r) for r in mixture_quota_sample(docs).collect()}
    b = {tuple(r) for r in mixture_quota_twophase(docs).collect()}
    assert a == b and len(a) > 0


def test_ccnet_buckets_are_balanced_terciles(spark, sf_dir):
    """Per language: bucket sizes differ by at most 1 and bucket 0
    holds the lowest cross-entropy (head) documents."""
    import collections

    from dronedb_spark.tables import load
    from dronedb_spark.text.curation import ccnet_perplexity_buckets

    rows = ccnet_perplexity_buckets(load(spark, sf_dir, "documents")).collect()
    by_lang = collections.defaultdict(list)
    for r in rows:
        by_lang[r["lang_pred"]].append((r["ppl_bucket"], r["cross_entropy"]))
    for lang, vals in by_lang.items():
        sizes = collections.Counter(b for b, _ in vals)
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        h0 = max(ce for b, ce in vals if b == 0)
        h2 = min(ce for b, ce in vals if b == 2)
        assert h0 <= h2


def test_cluster_keep_prefers_quality_over_min_id(spark):
    """A cluster whose LATER member has more distinct tokens keeps the
    later member — the policy min-id representatives get wrong."""
    from dronedb_spark.text.curation import cluster_quality_keep

    # near-identical docs (share shingles => same band) but doc 2 has an
    # extra distinct token appended
    base = "alpha beta gamma delta epsilon zeta eta theta"
    # "kappa" keeps one LSH band shared (verified); doc 2 gains a
    # distinct token, so quality selection must beat min-id
    docs = spark.createDataFrame(
        [(1, base), (2, base + " kappa")], "doc_id long, text string"
    )
    got = cluster_quality_keep(docs).collect()
    assert len(got) == 1
    r = got[0]
    assert r["cluster_id"] == 1 and r["keep_id"] == 2 and r["n_members"] == 2
