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


def test_unconverged_raises_instead_of_splitting(spark):
    # with convergence checking on, running out of rounds must FAIL LOUDLY —
    # a silent partial labeling would emit split clusters as if correct
    import pytest

    edges = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a")], "doc1 string, doc2 string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        # driver_finish_limit=0 forces the iterative path (the driver-side
        # union-find finisher would otherwise solve this exactly)
        connected_components(edges, max_iter=1, driver_finish_limit=0).collect()


def test_cap_rounds_mode_returns_partial(spark):
    # check_convergence=False is the explicit cap-rounds mode: no per-round
    # count jobs, partial labels allowed (every label <= its node)
    edges = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a")], "doc1 string, doc2 string"
    )
    rows = connected_components(
        edges, max_iter=1, check_convergence=False, driver_finish_limit=0
    ).collect()
    assert {r.doc_id for r in rows} == {"a", "b", "c", "d"}
    assert all(r.cluster_id <= r.doc_id for r in rows)


def test_long_chain_converges_in_log_rounds(spark):
    # a 33-node chain (diameter 32) must fully converge well inside
    # max_iter=20: star contraction + path halving give O(log d) rounds,
    # where plain propagation would need >20
    n = 33
    names = [f"n{i:02d}" for i in range(n)]
    edges = spark.createDataFrame(
        [(names[i + 1], names[i]) for i in range(n - 1)],
        "doc1 string, doc2 string",
    )
    rows = connected_components(edges, max_iter=20, driver_finish_limit=0).collect()
    assert len(rows) == n
    assert all(r.cluster_id == "n00" and r.cluster_size == n for r in rows)


def test_no_broadcast_path_matches(spark):
    # broadcast_labels=False (the billions-of-nodes fallback) must produce
    # identical clusters
    edges = spark.createDataFrame(
        [("e", "d"), ("d", "c"), ("c", "b"), ("b", "a"), ("x", "y")],
        "doc1 string, doc2 string",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, broadcast_labels=False).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a",
                   "x": "x", "y": "x"}
