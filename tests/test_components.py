"""Connected-components semantics on hand-built graphs: chains force
multi-round propagation, separate components stay separate, cluster ids are
the lexicographic minimum."""

from __future__ import annotations

from uncharted_ta1_spark.operators.components import connected_components


def test_chain_and_separate_components(spark):
    # chain e-d-c-b-a (reverse order, so min propagates the long way) plus a
    # separate pair (x, y): diameters > 1 exercise the iteration
    edges = spark.createDataFrame(
        [("e", "d"), ("d", "c"), ("c", "b"), ("b", "a"), ("x", "y")],
        "doc1 string, doc2 string",
    )
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in connected_components(edges).collect()
    }
    assert got == {
        "a": ("a", 5), "b": ("a", 5), "c": ("a", 5), "d": ("a", 5), "e": ("a", 5),
        "x": ("x", 2), "y": ("x", 2),
    }


def test_max_iter_caps_rounds(spark):
    # a long chain with max_iter=1 must still return a valid partial labeling
    # (every label is some reachable node), just not fully converged
    edges = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a")], "doc1 string, doc2 string"
    )
    rows = connected_components(edges, max_iter=1).collect()
    assert {r.doc_id for r in rows} == {"a", "b", "c", "d"}
    assert all(r.cluster_id <= r.doc_id for r in rows)
