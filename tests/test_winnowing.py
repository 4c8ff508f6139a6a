"""winnow_fingerprints: the MOSS guarantee and density properties.

Guarantee (Schleimer et al. 2003): with gram size k and window w, any two
documents sharing a passage of >= w + k - 1 words select at least one
COMMON fingerprint (same hash; positions may differ).  Density: each full
window selects exactly one gram, so fingerprints <= number of windows.
"""

from __future__ import annotations

import random

from uncharted_ta1_spark.operators.dedup import winnow_fingerprints

K, W = 4, 5


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, "en", "t", t) for d, t in rows],
        "doc_id string, lang string, source string, text string",
    )


def _brute_winnow(words, k=K, w=W):
    """Reference implementation: per full window, min (hash, rightmost)."""
    import hashlib

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)

    grams = [
        (p + 1, h(" ".join(words[p:p + k])))
        for p in range(len(words) - k + 1)
    ]
    if not grams:
        return set()
    sel = set()
    n_starts = max(len(grams) - w + 1, 1)
    for t in range(n_starts):
        win = grams[t:t + w]
        m = min(x[1] for x in win)
        pos = max(p for p, x in win if x == m)
        sel.add((pos, m))
    return sel


def test_matches_brute_force_reference(spark):
    rng = random.Random(11)
    vocab = [f"v{i}" for i in range(40)]
    rows = [
        (f"d{i}", " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 60))))
        for i in range(30)
    ]
    got = {}
    for r in winnow_fingerprints(_docs(spark, rows), k=K, w=W).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.sh_hash))
    for d, t in rows:
        expect = _brute_winnow(t.split())
        assert got.get(d, set()) == expect, d


def test_shared_passage_guarantee(spark):
    """Plant an exactly (w+k-1)=8-word shared passage at misaligned offsets
    in two otherwise-disjoint docs: they MUST share a fingerprint hash."""
    shared = [f"s{i}" for i in range(W + K - 1)]
    a = [f"a{i}" for i in range(7)] + shared + [f"b{i}" for i in range(9)]
    b = [f"c{i}" for i in range(13)] + shared + [f"e{i}" for i in range(3)]
    out = winnow_fingerprints(
        _docs(spark, [("A", " ".join(a)), ("B", " ".join(b))]), k=K, w=W
    ).collect()
    ha = {r.sh_hash for r in out if r.doc_id == "A"}
    hb = {r.sh_hash for r in out if r.doc_id == "B"}
    assert ha & hb, "winnowing guarantee violated"


def test_density_bound(spark):
    rng = random.Random(5)
    words = [f"w{rng.randint(0, 999)}" for _ in range(500)]
    out = winnow_fingerprints(
        _docs(spark, [("D", " ".join(words))]), k=K, w=W
    ).collect()
    n_grams = len(words) - K + 1
    n_windows = n_grams - W + 1
    assert 0 < len(out) <= n_windows
    # expected density ~ 2/(w+1): allow generous slack, it must be sparse
    assert len(out) < 0.6 * n_grams
