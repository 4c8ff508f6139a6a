"""Interpolated Kneser-Ney bigram LM vs a pure-python model."""

from __future__ import annotations

import math
from collections import Counter


def _python_kn(texts, d=0.75):
    docs = {i: [w for w in t.split() if w] for i, t in enumerate(texts)}
    doc_bg = {
        i: Counter(zip(ws, ws[1:])) for i, ws in docs.items() if len(ws) > 1
    }
    bg = Counter()
    for c in doc_bg.values():
        bg.update(c)
    c1 = Counter(w for ws in docs.values() for w in ws)
    nright = Counter(w1 for (w1, _) in bg)
    nleft = Counter(w2 for (_, w2) in bg)
    t = len(bg)
    out = {}
    for i, cnts in doc_bg.items():
        if not cnts:
            continue
        s = 0.0
        k_tot = 0
        for (w1, w2), k in cnts.items():
            p = max(bg[(w1, w2)] - d, 0.0) / c1[w1] + d * nright[w1] / c1[
                w1
            ] * (nleft[w2] / t)
            s += k * math.log(p)
            k_tot += k
        out[i] = (k_tot, round(s / k_tot, 6))
    return out


def test_kn_logprob_matches_python(spark):
    from uncharted_ta1_spark.operators.textstats import kn_bigram_logprob

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a bird",
        "the the the the",
        "unique words only here now",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = kn_bigram_logprob(docs).toPandas().set_index("doc_id")
    exp = _python_kn(texts)
    assert set(got.index) == set(exp)
    for i, (k_tot, lp) in exp.items():
        r = got.loc[i]
        assert r.n_bigrams == k_tot
        assert abs(r.kn_logprob - lp) < 2e-6, (i, r.kn_logprob, lp)
    # KN must rank the repetitive doc above the all-singleton doc
    assert got.loc[3].kn_logprob > got.loc[4].kn_logprob


def test_kn_is_finite_on_corpus(spark):
    from uncharted_ta1_spark.operators.textstats import kn_bigram_logprob

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = kn_bigram_logprob(docs).toPandas()
    assert len(out) > 0
    assert out.kn_logprob.notna().all()
    assert (out.kn_logprob < 0).all()
