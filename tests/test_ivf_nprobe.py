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


def test_trained_centroids_beat_seed_recall(spark):
    """One Lloyd iteration must measurably improve IVF recall@3 over the
    seed centroids on this corpus (0.167 -> 0.233 mean at 500 vectors) —
    the evidence ann_recall_ivf exists to produce.  Also sanity-checks the
    trained centroid set: still n_centroids cells at most, integer-valued
    micro-unit components."""
    df = E.q_ann_recall_ivf(spark, SF).toPandas()
    assert df["recall_trained"].mean() > df["recall_seed"].mean()


def test_trained_centroids_are_integer_micro_units(spark):
    from uncharted_ta1_spark.operators.similarity import _centroid_set

    emb = E._embeddings(spark, SF)
    cents = _centroid_set(emb, n_iters=1).toPandas()
    assert 0 < len(cents) <= 16
    for arr in cents["_c_emb"]:
        assert all(float(x).is_integer() for x in arr)


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


def test_lloyd_assignment_quality_monotone(spark):
    """Convergence evidence: mean best-cosine to the assigned centroid must
    not decrease across Lloyd iterations 0 -> 1 -> 2 (measured, not
    assumed — Lloyd with cosine assignment + integer-mean update has no
    hard monotonicity theorem, so the engine MEASURES the curve; this
    pins the property on the test corpus)."""
    import __spark_entry__ as E

    rows = {
        r["iter"]: r["mean_sim"]
        for r in E.q_ann_ivf_convergence(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0] <= rows[1] <= rows[2]
    assert rows[2] > rows[0]  # training actually moved the needle
