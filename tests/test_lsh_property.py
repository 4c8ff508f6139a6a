"""LSH recall guarantee, property-tested: documents with IDENTICAL shingle
sets have identical minhash signatures in every permutation, hence agree on
ALL bands — they can NEVER be missed by the banded candidate join.  (False
negatives for near-dups are probabilistic by design; for exact dups they
must be structurally impossible.)"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from uncharted_ta1_spark.operators.dedup import (
    doc_shingles,
    lsh_pairs_from_bands,
    minhash_bands,
)

words = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=3, max_size=10
)


@settings(max_examples=10, deadline=None)
@given(st.lists(words, min_size=1, max_size=4))
def test_exact_duplicates_always_lsh_candidates(spark, texts):
    # each generated text appears TWICE (doc_id i and i+100) -> every
    # (i, i+100) pair is an exact dup and must surface as a candidate
    rows = [(i, " ".join(t)) for i, t in enumerate(texts)]
    rows += [(i + 100, txt) for i, txt in rows]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = doc_shingles(docs, n=3)
    pairs = lsh_pairs_from_bands(minhash_bands(sh, k=16, band_size=4))
    got = {(r["doc1"], r["doc2"]): r["n_bands"] for r in pairs.collect()}
    for i, _ in enumerate(texts):
        assert (i, i + 100) in got, f"exact dup pair ({i},{i+100}) missed by LSH"
        assert got[(i, i + 100)] == 4, "exact dups must agree on ALL 4 bands"
