"""BPE merge-statistics semantics: left-to-right run merging + recounting."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.operators.bpe import bpe_merges_sql

BPE_STREAM_SPARK = """
stream0 AS (
  SELECT doc_id, source, seq_no, pos, tok
  FROM sequences LATERAL VIEW posexplode(tokens) t AS pos, tok
)"""


def _merges(spark, token_rows, k, base=1000):
    spark.createDataFrame(
        [(str(i), "s", 0, toks) for i, toks in enumerate(token_rows)],
        "doc_id string, source string, seq_no int, tokens array<int>",
    ).createOrReplaceTempView("sequences")
    sql = datagen.spark_with(BPE_STREAM_SPARK) + bpe_merges_sql(
        k, merge_base=base
    )
    return {
        r.merge_round: (r.tok_a, r.tok_b, r.pair_count, r.merged_id)
        for r in spark.sql(sql).collect()
    }


def test_repeated_run_merges_left_to_right(spark):
    """[7,7,7,7,5,7,7]: round 0 counts (7,7) 4 times and the left-to-right
    merge collapses the run to [m,m,5,m]; round 1 recounts over MERGED
    symbols and tie-breaks (cnt desc, a asc, b asc)."""
    out = _merges(spark, [[7, 7, 7, 7, 5, 7, 7]], k=2)
    assert out[0] == (7, 7, 4, 1000)
    assert out[1] == (5, 1000, 1, 1001)


def test_merged_symbol_participates_in_later_rounds(spark):
    # (1,2) dominates round 0; round 1's top pair is (m, 3) — a pair that
    # only exists AFTER the merge rewrites the stream
    out = _merges(spark, [[1, 2, 3], [1, 2, 3], [1, 2, 4]], k=2)
    assert out[0] == (1, 2, 3, 1000)
    assert out[1] == (1000, 3, 2, 1001)


def _ref_bpe(seqs, k, base):
    """Direct Python reference: count adjacent pairs, pick (cnt desc, a asc,
    b asc), left-to-right merge in every sequence, repeat."""
    seqs = [list(s) for s in seqs]
    out = []
    for r in range(k):
        counts: dict[tuple, int] = {}
        for s in seqs:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        m = base + r
        out.append((r, a, b, cnt, m))
        nxt = []
        for s in seqs:
            t, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    t.append(m)
                    i += 2
                else:
                    t.append(s[i])
                    i += 1
            nxt.append(t)
        seqs = nxt
    return out


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 3), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_property_matches_direct_reference(spark, seqs):
    """The relational run-parity merge must equal a direct left-to-right
    scan for arbitrary corpora — tiny alphabet (0..3) maximizes repeated-
    token runs and pair ties, the two subtle paths."""
    ref = _ref_bpe(seqs, 2, 1000)
    got = sorted(_merges(spark, seqs, k=2).items())
    got = [(r, *vals) for r, vals in got]
    assert got == ref


def test_nonoverlapping_distinct_pair_merges_everywhere(spark):
    # a != b: every occurrence merges in one round, even back-to-back "ababab"
    out = _merges(spark, [[8, 9, 8, 9, 8, 9]], k=2)
    assert out[0] == (8, 9, 3, 1000)
    # after merging: [m, m, m] -> (m, m) twice, but left-to-right run rule
    # merges only floor(3/2) = 1 pair; the count is still the raw pair count
    assert out[1] == (1000, 1000, 2, 1001)


def _encode(spark, token_rows, k, base=1000):
    from uncharted_ta1_spark.operators.bpe import bpe_encode_sql

    spark.createDataFrame(
        [(str(i), "s", 0, toks) for i, toks in enumerate(token_rows)],
        "doc_id string, source string, seq_no int, tokens array<int>",
    ).createOrReplaceTempView("sequences")
    sql = datagen.spark_with(BPE_STREAM_SPARK) + bpe_encode_sql(
        k, merge_base=base
    )
    return {r.doc_id: r for r in spark.sql(sql).collect()}


def test_encode_manifest_counts_and_checksums(spark):
    # k=1 on [1,2,3,1,2]: top pair (1,2) x2 -> encoded [m,3,m], and on a
    # second doc [9] untouched.  Checksums pin the exact encoded stream.
    out = _encode(spark, [[1, 2, 3, 1, 2], [9]], k=1)
    d0 = out["0"]
    assert (d0.n_tok_before, d0.n_tok_after) == (5, 3)
    enc = [1000, 3, 1000]
    assert d0.tok_sum == sum(enc)
    assert d0.pos_tok_sum == sum((i + 1) * t for i, t in enumerate(enc))
    d1 = out["1"]
    assert (d1.n_tok_before, d1.n_tok_after, d1.tok_sum) == (1, 1, 9)


def test_encode_runner_matches_single_text_chain(spark):
    # the materialized round-by-round runner must equal the one-text chain
    from uncharted_ta1_spark.operators.bpe import run_bpe_encode

    rows = [[1, 2, 3, 1, 2, 1, 2], [2, 3, 2, 3], [5, 5, 5]]
    want = _encode(spark, rows, k=2)
    stream0 = spark.sql(
        datagen.spark_with(BPE_STREAM_SPARK) + " SELECT * FROM stream0"
    )
    got = {
        r.doc_id: r
        for r in run_bpe_encode(spark, stream0, 2, merge_base=1000).collect()
    }
    for d in want:
        assert tuple(want[d]) == tuple(got[d])
