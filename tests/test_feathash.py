"""Semantics of operators/feathash.py and the RANGE-frame window features."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.feathash import hashed_features, vocab_index
from uncharted_ta1_spark.operators.windows import range_window_features


def test_hashed_features_partition_words_exactly(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c a"), Row(doc_id=2, text="  x   "), Row(doc_id=3, text="")]
    )
    out = hashed_features(docs, n_buckets=16)
    rows = out.collect()
    # every word lands in exactly one bucket: n_terms sums to the word count
    per_doc = {r: 0 for r in (1, 2, 3)}
    for r in rows:
        per_doc[r["doc_id"]] += r["n_terms"]
        assert 0 <= r["bucket"] < 16
        assert abs(r["feat_val"]) <= r["n_terms"]
        assert (r["feat_val"] - r["n_terms"]) % 2 == 0  # signs are +-1
    assert per_doc == {1: 4, 2: 1, 3: 0}
    # same word -> same bucket and sign: doc 1's two 'a's contribute +-2 together
    a_bucket = {
        (r["bucket"], r["feat_val"], r["n_terms"])
        for r in hashed_features(
            spark.createDataFrame([Row(doc_id=9, text="a a")]), n_buckets=16
        ).collect()
    }
    assert len(a_bucket) == 1
    (_, fv, nt), = a_bucket
    assert nt == 2 and abs(fv) == 2


def test_hashed_features_rejects_non_power_of_two(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a")])
    with pytest.raises(ValueError):
        hashed_features(docs, n_buckets=100)


def test_vocab_index_frequency_then_lex(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="b b b a a c"), Row(doc_id=2, text="a c")]
    )
    out = {r["word"]: (r["word_id"], r["n_occurrences"])
           for r in vocab_index(docs).collect()}
    # counts: a=3, b=3, c=2 -> tie a/b broken lexicographically
    assert out == {"a": (0, 3), "b": (1, 3), "c": (2, 2)}


def test_range_window_features_brute_force(spark):
    rows = [
        Row(doc_id=1, source="s", seq_no=i, event_epoch=t, n_tok=n)
        for i, (t, n) in enumerate(
            [(0, 5), (100, 7), (86400, 1), (86401, 2), (200000, 3)]
        )
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["seq_no"]: r
        for r in range_window_features(
            df, keys=("doc_id", "source"), ts="event_epoch",
            value="n_tok", range_sec=86400, tiebreak=("seq_no",),
        ).collect()
    }
    ts = {r.seq_no: (r.event_epoch, r.n_tok) for r in rows}
    for i, (t, _) in ts.items():
        in_frame = [j for j, (tj, _) in ts.items() if t - 86400 <= tj <= t]
        assert out[i]["n_last_86400s"] == len(in_frame)
        assert out[i]["n_tok_last_86400s"] == sum(ts[j][1] for j in in_frame)
    # frame is CLOSED on both ends: row at 86400 still sees row at 0
    assert out[2]["n_last_86400s"] == 3
    # row at 86401 no longer sees row at 0
    assert out[3]["n_last_86400s"] == 3
    assert out[0]["gap_prev_sec"] is None
    assert out[3]["gap_prev_sec"] == 1
