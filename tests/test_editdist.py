"""Token edit distance / WER vs independent pure-python models."""

from __future__ import annotations

import hashlib


def _lev(a, b):
    prev = list(range(len(a) + 1))
    for t in b:
        new = [prev[0] + 1]
        for i, x in enumerate(a, 1):
            new.append(min(prev[i] + 1, new[-1] + 1, prev[i - 1] + (0 if x == t else 1)))
        prev = new
    return prev[-1]


def _md5_i64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _corrupt(tokens, key, salt="wer", del_pct=10, sub_pct=20):
    out = []
    for i, t in enumerate(tokens):
        h = _md5_i64(f"{salt}|{key}|{i}") % 100
        if h < del_pct:
            continue
        out.append((t * 31 + 7) % 50257 if h < sub_pct else t)
    return out


def test_token_edit_distance_matches_python_dp(spark):
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.operators.editdist import token_edit_distance

    cases = [
        ([7, 3, 9, 3], [7, 9, 3, 3, 5]),
        ([], [1, 2]),
        ([1, 2], []),
        ([5], [5]),
        ([1, 2, 3, 4, 5], [5, 4, 3, 2, 1]),
        ([9] * 12, [9] * 7 + [8] * 5),
        ([1, 1, 2, 1], [1, 2, 1, 1]),
    ]
    df = spark.createDataFrame(cases, "ref array<long>, cand array<long>")
    got = [
        r.d
        for r in df.select(
            token_edit_distance(F.col("ref"), F.col("cand")).alias("d")
        ).collect()
    ]
    assert got == [_lev(a, b) for a, b in cases]


def test_batch_dp_matches_python_and_jvm_fold(spark):
    """Three independent derivations agree: the numpy batch DP (the
    corpus path), the JVM aggregate fold, and the pure-python DP."""
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.operators.editdist import (
        _batch_edit_distances,
        token_edit_distance,
    )

    cases = [
        ([7, 3, 9, 3], [7, 9, 3, 3, 5]),
        ([], [1, 2]),
        ([1, 2], []),
        ([5], [5]),
        ([1, 2, 3, 4, 5], [5, 4, 3, 2, 1]),
        ([9] * 12, [9] * 7 + [8] * 5),
        ([1, 1, 2, 1], [1, 2, 1, 1]),
        ([], []),
    ]
    py = [_lev(a, b) for a, b in cases]
    batch = list(_batch_edit_distances([a for a, _ in cases], [b for _, b in cases]))
    assert batch == py
    df = spark.createDataFrame(cases, "ref array<long>, cand array<long>")
    jvm = [
        r.d
        for r in df.select(
            token_edit_distance(F.col("ref"), F.col("cand")).alias("d")
        ).collect()
    ]
    assert jvm == py


def test_wer_eval_matches_python_model(spark):
    from uncharted_ta1_spark.operators.editdist import wer_eval

    rows = [
        ("doc_0", "s0", 0, [7, 3, 9, 3, 11, 2, 9]),
        ("doc_0", "s0", 1, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
        ("doc_1", "s0", 0, [50256, 0, 1, 50255]),
        ("doc_1", "s1", 0, [4, 4, 4, 4, 4, 4]),
        ("doc_2", "s1", 1, [13]),
    ]
    seq = spark.createDataFrame(
        rows, "doc_id string, source string, seq_no int, tokens array<int>"
    )
    got = wer_eval(seq).toPandas().set_index("source")
    by_src = {}
    for doc_id, source, seq_no, tokens in rows:
        cand = _corrupt(tokens, f"{doc_id}|{source}|{seq_no}")
        d = _lev(tokens, cand)
        st = by_src.setdefault(source, [0, 0, 0, 0, 0])
        st[0] += 1
        st[1] += len(tokens)
        st[2] += len(cand)
        st[3] += d
        st[4] += d == 0
    assert set(got.index) == set(by_src)
    corrupted_somewhere = False
    for source, (n_seq, n_ref, n_cand, n_edits, n_exact) in by_src.items():
        r = got.loc[source]
        assert (r.n_seq, r.n_ref, r.n_cand, r.n_edits, r.n_exact) == (
            n_seq,
            n_ref,
            n_cand,
            n_edits,
            n_exact,
        ), source
        assert r.wer == round(n_edits / n_ref, 9)
        corrupted_somewhere |= n_edits > 0
    assert corrupted_somewhere  # the fixture must exercise real edits


def test_wer_bounds_on_corpus(spark):
    """0 <= WER <= 1 on the real corpus under this corruption (deletion +
    substitution only — each corrupted position costs at most one edit),
    and the corruption must hit every source."""
    from uncharted_ta1_spark.datagen import sequences_df

    from uncharted_ta1_spark.operators.editdist import wer_eval

    out = wer_eval(sequences_df(spark, "/root/testdata/sf0.001")).toPandas()
    assert len(out) > 0
    assert (out.n_edits <= out.n_ref).all()
    assert (out.n_edits > 0).all()
    assert ((out.wer > 0) & (out.wer <= 1)).all()
