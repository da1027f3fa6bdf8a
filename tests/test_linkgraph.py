"""Domain PageRank: closed-form tiny graphs, mass conservation under
integer truncation, and determinism across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.linkgraph import SCALE, domain_edges, domain_pagerank


def _docs(spark, rows):
    # (doc_id, source) → derived domain = source/'d'<doc_id² mod 10>
    return spark.createDataFrame(
        [(i, s, "x", "en", 1) for i, s in rows],
        "doc_id long, source string, text string, lang string, n_chars long",
    )


def test_edges_weights_and_outw(spark):
    # 4 docs in one source: links i -> (13i+7) mod 4 = 3,0,1,2
    docs = _docs(spark, [(i, "s") for i in range(4)])
    e = {(r["src"], r["dst"]): (r["w"], r["outw"]) for r in domain_edges(docs).collect()}
    # domains: d0 (docs 0), d1 (doc 1,3 -> 1,9%10=1,9? 3*3=9 -> d9), d4 (doc 2)
    # doc0: s/d0 -> doc3 = s/d9 ; doc1: s/d1 -> doc0 = s/d0
    # doc2: s/d4 -> doc1 = s/d1 ; doc3: s/d9 -> doc2 = s/d4
    assert e == {
        ("s/d0", "s/d9"): (1, 1),
        ("s/d1", "s/d0"): (1, 1),
        ("s/d4", "s/d1"): (1, 1),
        ("s/d9", "s/d4"): (1, 1),
    }


def test_symmetric_cycle_stays_uniform(spark):
    """A pure cycle of equal-degree nodes is PageRank's fixed point:
    every rank stays at the uniform start (up to DIV truncation)."""
    docs = _docs(spark, [(i, "s") for i in range(4)])
    ranks = {r["domain"]: r["rank"] for r in domain_pagerank(docs, 4).collect()}
    base = SCALE // 4
    want = (15 * base) // 100 + (85 * base) // 100
    assert set(ranks.values()) == {want}


def test_mass_conserved_up_to_truncation(spark):
    docs = _docs(spark, [(i, f"s{i % 3}") for i in range(60)])
    ranks = domain_pagerank(docs, 8)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    n = ranks.count()
    # every DIV drops < 1 unit per edge/node per iteration: the loss
    # bound is iterations * (edges + nodes + 2) — tiny vs SCALE
    n_edges = domain_edges(docs).count()
    loss_bound = 8 * (n_edges + n + 2) + n  # + initial base rounding
    assert SCALE - loss_bound <= total <= SCALE
    assert n >= 2


def test_deterministic_across_runs_and_partitionings(spark):
    docs = _docs(spark, [(i, f"s{i % 4}") for i in range(50)])
    a = sorted(tuple(r) for r in domain_pagerank(docs, 5).collect())
    b = sorted(
        tuple(r) for r in domain_pagerank(docs.repartition(13), 5).collect()
    )
    assert a == b


def test_sink_via_self_loop_accumulates(spark):
    """A domain whose outlink is itself keeps received mass — ranks
    must be non-uniform when the graph funnels into a self-loop."""
    # find a configuration with a self-loop: single doc links to itself
    docs = _docs(spark, [(0, "s")])  # 13*0+7 mod 1 = 0 -> self-loop
    [r] = domain_pagerank(docs, 3).collect()
    base = SCALE // 1
    want = base
    # teleport + damped self-inflow each round: stays at (15+85)% = base
    assert abs(r["rank"] - want) <= 3  # DIV truncation only


def test_triangle_counts_exact_on_known_graphs(spark):
    from dronedb_spark.text.linkgraph import triangle_counts

    def _und(pairs):
        return spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in pairs], "u string, v string"
        ).distinct()

    # K4: 4 triangles, every node in 3
    k4 = _und([(a, b) for a in "abcd" for b in "abcd" if a < b])
    got = {r["domain"]: r["n_triangles"] for r in triangle_counts(k4).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # a 4-cycle has none
    c4 = _und([("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")])
    assert triangle_counts(c4).count() == 0
    # two triangles sharing an edge: shared nodes in 2, tips in 1
    bowtie = _und([("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"), ("c", "d")])
    got = {r["domain"]: r["n_triangles"] for r in triangle_counts(bowtie).collect()}
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_fixture_domain_graph_is_permutation_trianglefree(spark, sf_dir):
    """The statement in undirected_domain_edges' docstring, pinned."""
    from dronedb_spark.tables import load
    from dronedb_spark.text.linkgraph import (
        triangle_counts,
        undirected_domain_edges,
    )

    docs = load(spark, sf_dir, "documents")
    assert triangle_counts(undirected_domain_edges(docs)).count() == 0
