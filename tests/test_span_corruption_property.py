"""Property check of T5 span corruption: on arbitrary token sequences the
(corrupted, target) pair must LOSSLESSLY reconstruct the original — splice
each target span back over its sentinel in the corrupted input — and the
sentinel streams must be well-formed (dense 1..n ids, closing sentinel)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from uncharted_ta1_spark.operators.packing import span_corruption

BASE = 100  # sentinel_base default


def _reconstruct(corrupted, target):
    # split target into spans keyed by sentinel id
    spans, cur = {}, None
    for t in target:
        if t <= -BASE:
            cur = -t - BASE
            spans[cur] = []
        else:
            spans[cur].append(t)
    closing = max(spans)
    assert spans.pop(closing) == []  # closing sentinel carries no tokens
    out = []
    for t in corrupted:
        if t <= -BASE:
            out.extend(spans.pop(-t - BASE))
        else:
            out.append(t)
    assert not spans  # every span consumed exactly once
    return out, closing


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(128, 50256), min_size=1, max_size=30),
        min_size=1,
        max_size=6,
    )
)
def test_span_corruption_is_lossless(spark, seqs):
    rows = [(f"p{i}", i, toks) for i, toks in enumerate(seqs)]
    df = spark.createDataFrame(rows, "doc_id string, seq_no long, tokens array<int>")
    out = span_corruption(df).toPandas().set_index("doc_id")
    for doc_id, _, toks in rows:
        r = out.loc[doc_id]
        rebuilt, closing = _reconstruct(list(r.corrupted_tokens), list(r.target_tokens))
        assert rebuilt == toks, doc_id
        # sentinel ids are dense 1..n_spans, closing = n_spans + 1
        assert closing == r.n_spans + 1
        assert r.n_masked >= r.n_spans
