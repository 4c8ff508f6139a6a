"""TextRank (operators/graphrank.py): exact-integer iteration semantics."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE
from uncharted_ta1_spark.operators.graphrank import textrank, word_edges


def test_textrank_hand_computed(spark):
    """Two rounds on a 3-node chain, checked against hand arithmetic in
    micro-units: a->b (c=2), b->c (c=1)."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "b c")], "doc_id long, text string"
    )
    got = {r["word"]: r for r in textrank(spark, docs, rounds=2).collect()}
    # round 1: contrib(b) = (1e6*2) DIV 2 = 1e6 -> p1(b) = 150000 + 850000
    # round 2: contrib(b) = (p1(a)*2) DIV 2 = 150000
    #          -> p2(b) = 150000 + (850*150000) DIV 1000 = 277500
    assert got["a"]["pr_micro"] == 150000
    assert got["b"]["pr_micro"] == 277500
    assert got["c"]["pr_micro"] == 1000000  # fed by p1(b) = 1e6
    assert got["a"]["outdeg"] == 2
    assert got["c"]["outdeg"] == 0  # dangling sink


def test_textrank_corpus_sanity(spark):
    """On real data: one row per graph node, all ranks >= the damping
    floor, and the total mass stays positive and bounded."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pr = textrank(spark, docs, rounds=3)
    edges = word_edges(docs)
    n_nodes = (
        edges.select(F.col("w1").alias("w"))
        .unionByName(edges.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    rows = pr.collect()
    assert len(rows) == n_nodes
    assert all(r["pr_micro"] >= 150000 for r in rows)
    # damped total mass cannot exceed nodes * (0.15 + 0.85 * max_in_share)
    assert sum(r["pr_micro"] for r in rows) < n_nodes * 10_000_000
