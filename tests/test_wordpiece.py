"""Greedy WordPiece segmentation vs a pure-python maximal-munch model."""

from __future__ import annotations

from collections import Counter


def _python_wordpiece(texts, max_piece=4, min_df=3):
    words_stream = [w for t in texts for w in t.split() if w]
    occ = Counter(words_stream)
    words = sorted(occ)
    df = Counter()
    for w in words:
        subs = {
            w[p : p + k]
            for p in range(len(w))
            for k in range(1, max_piece + 1)
            if p + k <= len(w)
        }
        for s in subs:
            df[s] += 1
    vocab = {s for s in df if len(s) == 1 or df[s] >= min_df}
    out = {}
    for w in words:
        pos, pieces = 0, []
        while pos < len(w):
            k = max(
                kk
                for kk in range(1, max_piece + 1)
                if pos + kk <= len(w) and w[pos : pos + kk] in vocab
            )
            pieces.append(w[pos : pos + k])
            pos += k
        out[w] = (occ[w], pieces)
    return out


def test_wordpiece_matches_python_model(spark):
    from uncharted_ta1_spark.operators.wordpiece import wordpiece_encode

    texts = [
        "windy window winter wind",
        "winter wind window sing ring",
        "winding sing song ring rings",
        "a ab abc window",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = wordpiece_encode(docs).toPandas().set_index("word")
    exp = _python_wordpiece(texts)
    assert set(got.index) == set(exp)
    for w, (n_occ, pieces) in exp.items():
        r = got.loc[w]
        assert r.n_occurrences == n_occ, w
        assert r.pieces_csv == " ".join(pieces), (w, r.pieces_csv, pieces)
        assert r.n_pieces == len(pieces) and r.n_chars == len(w)
        assert r.fertility == round(len(pieces) / len(w), 9)
    # the fixture must actually exercise a multi-char piece (df('win')>=3)
    assert any(len(p) > 1 for _, ps in exp.values() for p in ps)


def test_wordpiece_segmentation_is_exact_cover(spark):
    """Concatenating the pieces reproduces every word exactly (greedy
    cover property — no gaps, no overlaps) on the real corpus tier."""
    from uncharted_ta1_spark.operators.wordpiece import wordpiece_encode

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = wordpiece_encode(docs).toPandas()
    assert len(out) > 0
    for r in out.itertuples():
        assert r.pieces_csv.replace(" ", "") == r.word


def _python_optimal(texts, max_piece=4, min_df=3):
    exp = _python_wordpiece(texts, max_piece, min_df)
    # rebuild the same vocab
    words = sorted(exp)
    from collections import Counter

    df = Counter()
    for w in words:
        subs = {
            w[p : p + k]
            for p in range(len(w))
            for k in range(1, max_piece + 1)
            if p + k <= len(w)
        }
        for s in subs:
            df[s] += 1
    vocab = {s for s in df if len(s) == 1 or df[s] >= min_df}
    out = {}
    for w in words:
        dp = [0] + [10**9] * len(w)
        for i in range(1, len(w) + 1):
            for k in range(1, min(max_piece, i) + 1):
                if w[i - k : i] in vocab:
                    dp[i] = min(dp[i], dp[i - k] + 1)
        out[w] = (len(exp[w][1]), dp[len(w)])
    return out


def test_optimal_segmentation_matches_python_dp(spark):
    from uncharted_ta1_spark.operators.wordpiece import optimal_segmentation

    # 'abcd': greedy eats 'abc' (in vocab via min_df) then 'd' is fine —
    # construct a case where greedy is SUBOPTIMAL: vocab has 'ab', 'cd',
    # 'abc' but not anything covering after 'abc' in two chars... use a
    # corpus where 'xyz' and 'zq' are in vocab but greedy on 'xyzq' takes
    # 'xyz' + 'q' (2) = optimal anyway; suboptimality needs greedy to
    # strand a position: vocab {'ab','bc','cd','abc'}: 'abcd' greedy:
    # 'abc'+'d' = 2; optimal 'ab'+'cd' = 2 — equal. True suboptimal:
    # vocab {'ab', 'cde', 'abc', 'de'} word 'abcde': greedy 'abc'+'de'=2;
    # both 2. Classic: 'aaab' with vocab {'aaa','ab','aa'}: greedy
    # 'aaa'+'b'=2, optimal 'aa'+'ab'=2. Hard to beat 2 with singles in
    # vocab; need length-5: vocab {'abcd' NO (max 4)...}.  'aabab' with
    # vocab {'aaba' (df>=3), 'ab'}: greedy 'aaba'+'b' = 2; optimal
    # 'a'+'ab'+'ab' = 3 — greedy wins. Greedy is suboptimal on 'abab'
    # with vocab {'aba','ab'}: greedy 'aba'+'b'=2 vs 'ab'+'ab'=2.  With
    # max_piece=4 and all singles in vocab, greedy worst case is known
    # to be suboptimal on e.g. 'xxyz' vocab {'xxy','yz'}: greedy
    # 'xxy'+'z'=2, optimal 'x'+'x'+'yz'=3.  So equality often holds —
    # the test asserts exact DP agreement, and separately hunts any
    # suboptimal row on the real corpus without requiring one.
    texts = [
        "windy window winter wind aabab aabab",
        "winter wind window sing ring aabab",
        "winding sing song ring rings",
        "a ab abc window aab aab aab",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = optimal_segmentation(docs).toPandas().set_index("word")
    exp = _python_optimal(texts)
    assert set(got.index) == set(exp)
    for w, (greedy, mn) in exp.items():
        r = got.loc[w]
        assert (r.greedy_pieces, r.min_pieces) == (greedy, mn), (w, tuple(r))
        assert bool(r.greedy_is_optimal) == (greedy == mn)
        assert r.saved_pieces == greedy - mn
        assert r.min_pieces <= r.greedy_pieces


def test_optimal_segmentation_corpus_invariants(spark):
    from uncharted_ta1_spark.operators.wordpiece import optimal_segmentation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = optimal_segmentation(docs).toPandas()
    assert len(out) > 0
    assert (out.min_pieces <= out.greedy_pieces).all()
    assert (out.min_pieces >= 1).all()
    # ceil(len/max_piece) lower bound
    assert (out.min_pieces >= (out.n_chars + 3) // 4).all()
