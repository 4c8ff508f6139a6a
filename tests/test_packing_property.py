"""Property-based check of concat-and-chunk packing: on arbitrary
generated token-length streams, the packed coordinates must equal a
brute-force running-offset scan — gapless tiling, exact integer chunk
math, straddle detection."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from uncharted_ta1_spark.operators.packing import pack_chunks

CAP = 7
row = st.integers(1, 15)  # n_tok per sequence


@settings(max_examples=10, deadline=None)
@given(st.lists(row, min_size=1, max_size=12), st.lists(row, min_size=0, max_size=6))
def test_pack_chunks_matches_running_offset(spark, stream_a, stream_b):
    data = []
    for key, toks in (("a", stream_a), ("b", stream_b)):
        for i, n in enumerate(toks):
            data.append((key, i, n))
    df = spark.createDataFrame(data, "stream string, seq_no long, n_tok long")
    got = {
        (r["stream"], r["seq_no"]): (
            r["start_off"], r["chunk_id"], r["chunk_off"], r["end_chunk"], r["straddles"]
        )
        for r in pack_chunks(
            df, capacity=CAP, keys=["stream"], order=["seq_no"]
        ).collect()
    }
    for key, toks in (("a", stream_a), ("b", stream_b)):
        off = 0
        for i, n in enumerate(toks):
            want = (off, off // CAP, off % CAP, (off + n - 1) // CAP,
                    (off + n - 1) // CAP > off // CAP)
            assert got[(key, i)] == want, (key, i, got[(key, i)], want)
            off += n
    # gapless: every row starts exactly where the previous one ended
    assert all(
        got[(k, i)][0] + toks[i] == got[(k, i + 1)][0]
        for k, toks in (("a", stream_a), ("b", stream_b))
        for i in range(len(toks) - 1)
    )
