"""OOV-rate coverage audit and hard-negative mining semantics."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.feathash import vocab_index
from uncharted_ta1_spark.operators.similarity import hard_negatives


def test_oov_against_known_vocab(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a a b rare1"),
            Row(doc_id=2, text="b b a rare2 rare3"),
        ]
    )
    top2 = (
        vocab_index(docs).where(F.col("word_id") < 2).select("word").collect()
    )
    assert {r.word for r in top2} == {"a", "b"}  # 5 a's, 4 b's
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda w: F.length(w) > 0))
        .alias("word"),
    )
    flagged = toks.join(
        F.broadcast(
            vocab_index(docs).where(F.col("word_id") < 2).select("word")
        ).withColumn("_inv", F.lit(1)),
        "word",
        "left",
    )
    per = {
        r.doc_id: r
        for r in flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .collect()
    }
    assert (per[1].n_tok, per[1].n_oov) == (5, 1)
    assert (per[2].n_tok, per[2].n_oov) == (5, 2)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=e, label=lb) for i, e, lb in rows]
    )


def test_hard_negatives_excludes_same_label_and_self(spark):
    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(60)
    ]
    out = hard_negatives(
        _emb_df(spark, rows), query_pred=F.col("vec_id") % 10 == 0, k=4
    ).collect()
    labels = {i: lb for i, _, lb in rows}
    for r in out:
        assert r.vid != r.qid
        assert labels[r.vid] != labels[r.qid]
        assert r.neg_label == labels[r.vid] and r.q_label == labels[r.qid]


def test_hard_negatives_matches_brute_force(spark):
    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 2) for i in range(40)
    ]
    out = {}
    for r in hard_negatives(
        _emb_df(spark, rows), query_pred=F.col("vec_id") % 20 == 0, k=3
    ).collect():
        out.setdefault(r.qid, []).append((r.rank, r.vid))
    vecs = {i: e for i, e, _ in rows}
    labels = {i: lb for i, _, lb in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    for qid in (0, 20):
        cands = sorted(
            (
                (-cos(vecs[qid], vecs[v]), v)
                for v in vecs
                if v != qid and labels[v] != labels[qid]
            ),
        )[:3]
        want = [v for _, v in cands]
        got = [v for _, v in sorted(out[qid])]
        assert got == want, qid
