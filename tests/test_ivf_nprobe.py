"""Multi-probe IVF: nprobe=1 equivalence and recall monotonicity."""

from __future__ import annotations

import __spark_entry__ as E
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.similarity import ann_ivf_topk

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.qid, r.vid) for r in df.select("qid", "vid").collect()}


def test_nprobe1_identical_to_original(spark):
    emb = E._embeddings(spark, SF)
    pred = F.col("vec_id") % 50 == 0
    a = ann_ivf_topk(emb, query_pred=pred, k=3, nprobe=1)
    b = E.q_ann_ivf_topk(spark, SF)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_recall_monotone_in_nprobe(spark):
    """Probing more cells can only add candidates: the exact top-3 overlap
    must be non-decreasing in nprobe (strictly better here by data)."""
    emb = E._embeddings(spark, SF)
    pred = F.col("vec_id") % 50 == 0
    exact = _pairs(E.q_ann_cosine_topk(spark, SF).where("rank <= 3"))
    r = [
        len(exact & _pairs(ann_ivf_topk(emb, query_pred=pred, k=3, nprobe=p)))
        for p in (1, 2, 4)
    ]
    assert r[0] <= r[1] <= r[2]
    assert r[2] > r[0]
