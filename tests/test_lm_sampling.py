"""Hand-computed semantics for bigram_logprob and importance_sample
(the corpus-level behavior is pinned by the oracle gate; these check the
math on a corpus small enough to verify by hand)."""

from __future__ import annotations

import math

from uncharted_ta1_spark.operators.sampling import (
    SCALE,
    hash_sample,
    importance_sample,
)
from uncharted_ta1_spark.operators.textstats import bigram_logprob


def test_bigram_logprob_hand_computed(spark):
    # corpus: doc1 = "a b a b", doc2 = "a b"
    # bigrams: doc1 {ab:2, ba:1}, doc2 {ab:1}; corpus C(ab)=3, C(ba)=1
    # unigrams: C(a)=3, C(b)=3; V=2
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    lp_ab = math.log((3 + 1) / (3 + 2))  # ln(4/5)
    lp_ba = math.log((1 + 1) / (3 + 2))  # ln(2/5)
    want1 = round((2 * lp_ab + 1 * lp_ba) / 3, 6)
    want2 = round(lp_ab, 6)
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 1
    assert abs(out[1]["avg_logprob"] - want1) < 1e-9
    assert abs(out[2]["avg_logprob"] - want2) < 1e-9


def test_importance_sample_membership_rules(spark):
    rows = [(i, float(w) / 10.0) for i, w in zip(range(200), [1, 3, 5, 8, 10] * 40)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = importance_sample(
        df, key_cols=["doc_id"], weight_col="w", min_rate=0.1, salt="s"
    )
    got = {r["doc_id"] for r in kept.collect()}
    # weight 1.0 rows are ALWAYS kept
    full = {i for i, _ in rows if rows[i][1] == 1.0}
    assert full <= got
    # membership is consistent with the flat hash sample at the same rate:
    # a kept low-weight row would also be in any flat sample with rate >= w
    flat_50 = {
        r["doc_id"]
        for r in hash_sample(df, key_cols=["doc_id"], rate=0.5, salt="s").collect()
    }
    for i, w in rows:
        if w <= 0.5 and i in got:
            assert i in flat_50
    # deterministic across recomputation
    again = {r["doc_id"] for r in kept.collect()}
    assert got == again
    # kept fraction of weight-0.1 rows is well below that of weight-1.0 rows
    lo = [i for i, w in rows if w == 0.1]
    assert len([i for i in lo if i in got]) < 0.5 * len(lo)
    assert SCALE == 1_000_000
