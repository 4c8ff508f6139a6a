"""exact_duplicate_spans: exact maximal duplicated-substring recovery.

Proves the contract VERDICT r05 task #6 asked for: the exact tier catches
(and measures exactly) a duplicated passage that the sliding tier
(span_words=10, stride=5 — catches only >= 14 words at arbitrary
alignment) provably misses, plus brute-force agreement on randomized
corpora.
"""

from __future__ import annotations

import itertools
import random

from uncharted_ta1_spark.operators.dedup import (
    exact_duplicate_spans,
    sliding_span_duplication,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [(d, "en", "t", text) for d, text in rows],
        "doc_id string, lang string, source string, text string",
    )


def _uwords(tag, n):
    return [f"{tag}{i:03d}" for i in range(n)]


def test_catches_straddling_dup_sliding_misses(spark):
    """A 12-word passage placed at p_a % 5 == 1 in A and p_b % 5 == 4 in B:
    sliding windows (starts at 1, 6, 11, ... 1-based) can only cover it at
    relative offset 0 in A and offset 2 in B — no shared alignment, so the
    sliding tier sees zero duplicated windows; the exact tier must report
    the pair with longest_span_words == 12 and the exact positions."""
    dup = _uwords("dup", 12)
    # doc A: 5 unique words then the passage (p_a = 6, 6 % 5 == 1)
    a_words = _uwords("fa", 5) + dup + _uwords("fb", 7)
    # doc B: 8 unique words then the passage (p_b = 9, 9 % 5 == 4)
    b_words = _uwords("fc", 8) + dup + _uwords("fd", 6)
    docs = _mk_docs(
        spark, [("A", " ".join(a_words)), ("B", " ".join(b_words))]
    )

    slid = sliding_span_duplication(docs, span_words=10, stride=5).collect()
    assert all(r.n_dup_spans == 0 for r in slid), slid

    got = exact_duplicate_spans(
        docs, n_anchor=8, max_df=50, min_span_words=10
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.doc_a, r.doc_b) == ("A", "B")
    assert r.longest_span_words == 12
    assert r.longest_start_a == 6
    assert r.longest_start_b == 9
    assert r.n_long_islands == 1


def test_span_is_exactly_maximal_not_inflated(spark):
    """A 15-word shared passage surrounded by unique words must come back
    as exactly 15 — not n_anchor-rounded, not extended into the filler."""
    dup = _uwords("dup", 15)
    docs = _mk_docs(
        spark,
        [
            ("A", " ".join(_uwords("fa", 3) + dup + _uwords("fb", 3))),
            ("B", " ".join(_uwords("fc", 9) + dup + _uwords("fd", 2))),
        ],
    )
    r = exact_duplicate_spans(docs, n_anchor=8).collect()[0]
    assert r.longest_span_words == 15
    assert (r.longest_start_a, r.longest_start_b) == (4, 10)


def test_two_islands_counted(spark):
    """Two disjoint >=10-word shared passages on different diagonals ->
    n_long_islands == 2, longest wins the summary row."""
    d1 = _uwords("d1x", 11)
    d2 = _uwords("d2x", 13)
    docs = _mk_docs(
        spark,
        [
            ("A", " ".join(d1 + _uwords("fa", 5) + d2)),
            ("B", " ".join(d2 + _uwords("fb", 8) + d1)),
        ],
    )
    r = exact_duplicate_spans(docs, n_anchor=8).collect()[0]
    assert r.n_long_islands == 2
    assert r.longest_span_words == 13


def _brute_longest_common_span(wa, wb, min_len):
    """O(n*m) reference: longest common word-level substring + count of
    maximal common substrings >= min_len (maximal = extendable neither
    left nor right at those positions)."""
    best = (0, None, None)
    islands = 0
    for i, j in itertools.product(range(len(wa)), range(len(wb))):
        if wa[i] != wb[j]:
            continue
        if i > 0 and j > 0 and wa[i - 1] == wb[j - 1]:
            continue  # not a run start
        k = 0
        while i + k < len(wa) and j + k < len(wb) and wa[i + k] == wb[j + k]:
            k += 1
        if k >= min_len:
            islands += 1
        if (k, -(i + 1), -(j + 1)) > (
            best[0],
            -(best[1] or 10**9),
            -(best[2] or 10**9),
        ):
            best = (k, i + 1, j + 1)
    return best, islands


def test_brute_force_agreement_randomized(spark):
    """Randomized corpora with planted shared passages: the operator's
    longest span/positions/island count equal an O(n*m) brute force."""
    rng = random.Random(606)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(4):
        shared = [f"s{trial}_{i}" for i in range(rng.randint(10, 16))]
        docs_py = {}
        for d in ("A", "B"):
            w = [rng.choice(vocab) for _ in range(rng.randint(20, 40))]
            at = rng.randint(0, len(w))
            docs_py[d] = w[:at] + shared + w[at:]
        docs = _mk_docs(
            spark, [(d, " ".join(w)) for d, w in docs_py.items()]
        )
        got = {
            (r.doc_a, r.doc_b): r
            for r in exact_duplicate_spans(
                docs, n_anchor=8, max_df=50, min_span_words=10
            ).collect()
        }
        (blen, bi, bj), n_isl = _brute_longest_common_span(
            docs_py["A"], docs_py["B"], 10
        )
        if blen >= 10:
            r = got[("A", "B")]
            assert r.longest_span_words == blen, (trial, r, blen)
            assert r.n_long_islands == n_isl
            # brute force ranks by (len desc, start_a asc, start_b asc)
            assert (r.longest_start_a, r.longest_start_b) == (bi, bj)
        else:
            assert ("A", "B") not in got
