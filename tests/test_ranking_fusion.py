"""rrf_fuse / ndcg_at_k / triangle_stats: fusion must equal the hand
formula with -1 sentinels for absent lists; NDCG must hit its closed-form
anchors (perfect ranking -> 1.0); triangle counting must equal the
brute-force enumeration on a known graph."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.graphstats import triangle_stats
from uncharted_ta1_spark.operators.ranking import ndcg_at_k, rrf_fuse


def test_rrf_matches_hand_formula(spark):
    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(11, 1), (13, 2), (10, 3)], "doc_id long, rank long"
    )
    rows = {
        r.doc_id: r
        for r in rrf_fuse([lex, dense], topk=10).collect()
    }
    def rrf(*ranks):
        return round(sum(1.0 / (60.0 + r) for r in ranks if r > 0), 9)

    assert rows[11].rrf_score == rrf(2, 1)  # in both lists
    assert rows[10].rrf_score == rrf(1, 3)
    assert rows[12].rrf_score == rrf(3)     # lex only
    assert (rows[12].rank_0, rows[12].rank_1) == (3, -1)
    assert rows[13].rank_0 == -1            # dense only
    # doc 11 wins: 1/62 + 1/61 is the largest
    assert min(rows.values(), key=lambda r: r.fused_rank).doc_id == 11


def test_rrf_requires_two_rankings(spark):
    one = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
    try:
        rrf_fuse([one])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_ndcg_perfect_and_partial(spark):
    # q1: all 3 top-ranked items relevant, n_rel=3 -> ndcg == 1.0
    # q2: only rank 3 relevant, n_rel=1 -> dcg=1/log2(4), idcg=1/log2(2)=1
    graded = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 1), (1, 3, 1), (2, 1, 0), (2, 2, 0), (2, 3, 1)],
        "qid long, rank long, rel int",
    )
    nrel = spark.createDataFrame([(1, 3), (2, 1)], "qid long, n_rel long")
    rows = {r.qid: r for r in ndcg_at_k(graded, nrel, k=3).collect()}
    assert rows[1].ndcg == 1.0
    assert rows[1].hits_at_k == 3
    # 1/log2(4) = 0.5 exactly; idcg term at rank 1 = 1e9
    assert rows[2].ndcg == 0.5
    assert rows[2].n_rel == 1


def test_triangles_match_bruteforce(spark):
    rng = random.Random(31)
    nodes = list(range(30))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(90)}
    )
    df = spark.createDataFrame(edges, "doc1 long, doc2 long")
    got = {
        r.doc_id: (r.degree, r.n_triangles)
        for r in triangle_stats(df).collect()
    }

    eset = set(edges)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_per = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if (a, b) in eset and (a, c) in eset and (b, c) in eset:
            tri_per[a] += 1
            tri_per[b] += 1
            tri_per[c] += 1
    expect = {
        n: (len(adj[n]), tri_per[n]) for n in adj if len(adj[n]) >= 2
    }
    assert got == expect


def test_triangle_clique_coefficient_is_one(spark):
    # K4: every node has degree 3 and sits in 3 triangles -> coeff 1.0
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(edges, "doc1 long, doc2 long")
    for r in triangle_stats(df).collect():
        assert (r.degree, r.n_triangles, r.clustering_coeff) == (3, 3, 1.0)
