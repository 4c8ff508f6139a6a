"""sparse_cosine_pairs: hand-computable anchors — identical docs hit
cos 1.0, engineered half-overlap lands near the analytic value, and
boilerplate terms (df over the cap) contribute nothing."""

from __future__ import annotations

import math

from uncharted_ta1_spark.operators.similarity import sparse_cosine_pairs


def test_identical_docs_cos_one(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc1, r.doc2): r.cos_sim
        for r in sparse_cosine_pairs(df, min_cosine=0.1, max_df_frac=0.9).collect()
    }
    assert rows[(1, 2)] == 1.0
    assert (1, 3) not in rows and (2, 3) not in rows


def test_half_overlap_matches_analytic(spark):
    # docs 1/2 share 2 of their 4 rare terms, each tf=1 and identical df
    # (each term appears in exactly one or two docs of four): with equal
    # weights w, cos = 2w^2 / (4w^2) = 0.5 when all four terms share one
    # idf — arrange df=1 for uniqueness terms and df=2 for shared ones,
    # then compute the expected value exactly below.
    df = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),
            (2, "cc dd ee ff"),
            (3, "zz yy xx ww"),
            (4, "qq rr ss tt"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc1, r.doc2): r.cos_sim
        for r in sparse_cosine_pairs(df, min_cosine=0.05, max_df_frac=0.9).collect()
    }
    n = 4
    w1 = math.floor(math.log((n + 1) / (1 + 1)) * 1000.0 + 0.5)  # df=1 terms
    w2 = math.floor(math.log((n + 1) / (2 + 1)) * 1000.0 + 0.5)  # df=2 terms
    dot = 2 * w2 * w2
    nrm = math.sqrt(2 * w1 * w1 + 2 * w2 * w2)
    expect = round(dot / (nrm * nrm), 9)
    assert rows[(1, 2)] == expect
    assert 0 < expect < 1


def test_boilerplate_term_excluded(spark):
    # "the" appears in every doc: with max_df_frac=0.5 it is dropped from
    # the vectors, so docs sharing ONLY "the" produce no pair
    df = spark.createDataFrame(
        [(1, "the aaa"), (2, "the bbb"), (3, "the ccc")],
        "doc_id long, text string",
    )
    got = sparse_cosine_pairs(df, min_cosine=0.01, max_df_frac=0.5).collect()
    assert got == []


def test_matches_bruteforce_random_corpora(spark):
    """Randomized check: pairs and cosines must equal a brute-force
    numpy/python computation of the same milli-quantized semantics."""
    import itertools
    import random

    rng = random.Random(43)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 12))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc1, r.doc2): (r.dot_milli, r.cos_sim)
        for r in sparse_cosine_pairs(
            df, min_cosine=0.2, max_df_frac=0.5
        ).collect()
    }

    n = len(docs)
    tf = {}
    dfc = {}
    for i, text in docs:
        counts = {}
        for w in text.split():
            counts[w] = counts.get(w, 0) + 1
        tf[i] = counts
        for w in counts:
            dfc[w] = dfc.get(w, 0) + 1
    vec = {}
    for i, counts in tf.items():
        v = {}
        for w, t in counts.items():
            if dfc[w] <= n / 2:
                v[w] = math.floor(
                    t * math.log((n + 1) / (dfc[w] + 1)) * 1000.0 + 0.5
                )
        vec[i] = v
    expect = {}
    for a, b in itertools.combinations(range(n), 2):
        shared = set(vec[a]) & set(vec[b])
        if not shared:
            continue
        dot = sum(vec[a][w] * vec[b][w] for w in shared)
        na = math.sqrt(sum(x * x for x in vec[a].values()))
        nb = math.sqrt(sum(x * x for x in vec[b].values()))
        cos = dot / (na * nb)
        if cos >= 0.2:
            expect[(a, b)] = (dot, round(cos, 9))
    assert set(got) == set(expect)
    for k in got:
        assert got[k][0] == expect[k][0], k
        assert abs(got[k][1] - expect[k][1]) < 1e-9, k
