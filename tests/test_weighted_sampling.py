"""weighted_fixed_k_sample (A-ES): exact k, per-row weight monotonicity
(raising a weight can only improve the row's key), and the weighting
property itself — heavy rows win far more often than their population
share across independent salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.sampling import weighted_fixed_k_sample


def _pop(spark, heavy_w=1.0, light_w=0.05, n=200, n_heavy=20):
    rows = [
        (i, heavy_w if i < n_heavy else light_w) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, w double")


def test_exactly_k_rows(spark):
    df = _pop(spark)
    assert (
        weighted_fixed_k_sample(
            df, key_cols=["doc_id"], weight_col="w", k=17
        ).count()
        == 17
    )


def test_heavy_rows_overrepresented(spark):
    # heavy rows are 10% of the population at 20x the weight: across 8
    # deterministic salts they must take well over half the sample slots
    df = _pop(spark)
    heavy = light = 0
    for s in range(8):
        got = weighted_fixed_k_sample(
            df, key_cols=["doc_id"], weight_col="w", k=20, salt=f"aes{s}"
        ).collect()
        heavy += sum(1 for r in got if r.doc_id < 20)
        light += sum(1 for r in got if r.doc_id >= 20)
    assert heavy > light, (heavy, light)


def test_weight_monotone_per_row(spark):
    # same u (same key+salt): a larger weight strictly increases the
    # (negative) score ln(u)/w toward zero
    lo = weighted_fixed_k_sample(
        spark.createDataFrame([(7, 0.2)], "doc_id long, w double"),
        key_cols=["doc_id"],
        weight_col="w",
        k=1,
    ).collect()[0]
    hi = weighted_fixed_k_sample(
        spark.createDataFrame([(7, 0.9)], "doc_id long, w double"),
        key_cols=["doc_id"],
        weight_col="w",
        k=1,
    ).collect()[0]
    assert hi.aes_score > lo.aes_score
    assert hi.aes_score < 0
