"""Hand-computed skip-gram pair generation + deterministic negatives."""

from __future__ import annotations

import hashlib


def _md5_i64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_skipgram_pairs_hand_computed(spark):
    from uncharted_ta1_spark.operators.skipgram import skipgram_pairs

    docs = spark.createDataFrame([("d1", "a b a b c")], ["doc_id", "text"])
    out = skipgram_pairs(
        docs, window=2, min_pair_count=2, top_n=200, neg_k=3
    ).toPandas()

    # window +-2 over [a b a b c]: pair counts (a,b)=3 (b,a)=3 (a,a)=2
    # (b,b)=2; the four singleton pairs are screened by min_pair_count=2
    expect_pairs = {
        ("a", "b"): (3, 1),
        ("b", "a"): (3, 2),
        ("a", "a"): (2, 3),
        ("b", "b"): (2, 4),
    }
    got = {
        (r.center, r.context): (r.n_pairs, r.rank)
        for r in out.drop_duplicates(["center", "context"]).itertuples()
    }
    assert got == expect_pairs
    assert len(out) == 4 * 3  # every pair carries exactly neg_k negatives
    assert sorted(out.groupby(["center", "context"]).neg_rank.apply(list).iloc[0]) == [1, 2, 3]

    # negatives: content-addressed slot into the frequency-ranked vocab
    # (a:2 -> id 0, b:2 -> id 1, c:1 -> id 2; V=3)
    vocab = {0: "a", 1: "b", 2: "c"}
    for r in out.itertuples():
        slot = _md5_i64(f"sgneg{r.center}|{r.context}#{r.neg_rank}") % 3
        assert r.neg_word == vocab[slot], (r.center, r.context, r.neg_rank)


def test_skipgram_window_edges(spark):
    """First/last tokens emit only inward contexts; a 1-token doc emits
    nothing; pair emission never crosses documents."""
    from uncharted_ta1_spark.operators.skipgram import skipgram_pairs

    docs = spark.createDataFrame(
        [("d1", "x y"), ("d2", "z"), ("d3", "y x")], ["doc_id", "text"]
    )
    out = skipgram_pairs(
        docs, window=2, min_pair_count=1, top_n=200, neg_k=1
    ).toPandas()
    got = {(r.center, r.context): r.n_pairs for r in out.itertuples()}
    # (x,y) from d1 + (x,y) from d3 = 2, same for (y,x); z pairs with nothing
    assert got == {("x", "y"): 2, ("y", "x"): 2}
