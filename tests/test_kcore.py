"""kcore_membership: the bounded peel must strip tails/fringe, keep
cliques, match a brute-force peel, and certify convergence."""

from __future__ import annotations

import random

from uncharted_ta1_spark.operators.graphstats import kcore_membership


def _brute_kcore(edges, k, rounds):
    cur = set(edges)
    for _ in range(rounds):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in cur if a in keep and b in keep}
        if nxt == cur:
            break
        cur = nxt
    deg = {}
    for a, b in cur:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_clique_survives_tail_peels(spark):
    # K4 (0-3) with a pendant path 3-10-11-12: path peels off under k=2
    # over successive rounds; the clique stays
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(3, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "doc1 long, doc2 long")
    got = {r.doc_id: r.core_degree for r in kcore_membership(df, k=2).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert all(r.converged for r in kcore_membership(df, k=2).collect())


def test_matches_bruteforce_random_graph(spark):
    rng = random.Random(17)
    edges = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)})
    df = spark.createDataFrame(edges, "doc1 long, doc2 long")
    for k in (2, 3, 4):
        got = {
            r.doc_id: r.core_degree
            for r in kcore_membership(df, k=k, rounds=8).collect()
        }
        assert got == _brute_kcore(edges, k, 8), f"k={k}"


def test_everything_peels(spark):
    # a pure path has no 2-core
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "doc1 long, doc2 long"
    )
    assert kcore_membership(df, k=2).count() == 0
