"""Leakage-free expanding mean + group z-score + fixed-k sample semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.sampling import fixed_k_hash_sample
from uncharted_ta1_spark.operators.windows import (
    expanding_leakfree_mean,
    group_zscore,
)


def test_expanding_mean_sees_only_strict_past(spark):
    """The target-encoding contract: a row's feature must not include its
    own value, and equal-ts rows resolve by the declared tie-break."""
    rows = [
        (1, 10, 100, 6.0),
        (1, 20, 101, 12.0),
        (1, 20, 102, 0.0),   # same ts as 101: order by event_id
        (1, 30, 103, 99.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_id long, value double")
    out = {r.event_id: r for r in expanding_leakfree_mean(
        df, keys=["user_id"], ts="ts_us", value="value",
        order_tiebreak=["event_id"],
    ).collect()}
    assert out[100].n_prior == 0 and out[100].prior_mean is None
    assert out[101].prior_mean == pytest.approx(6.0)
    assert out[102].prior_mean == pytest.approx(9.0)   # (6+12)/2, not own 0.0
    assert out[103].prior_mean == pytest.approx(6.0)   # (6+12+0)/3
    # leakage check: no row's own value contributes to its feature
    assert out[103].n_prior == 3


def test_expanding_mean_matches_pandas_reference(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(u), int(t), i, float(v))
        for i, (u, t, v) in enumerate(
            zip(rng.integers(0, 3, 60), rng.integers(0, 20, 60),
                rng.uniform(0, 100, 60))
        )
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_id long, value double")
    got = expanding_leakfree_mean(
        df, keys=["user_id"], ts="ts_us", value="value",
        order_tiebreak=["event_id"],
    ).toPandas().set_index("event_id")
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_id", "value"])
    pdf["vq"] = np.floor(pdf["value"] * 1e6) / 1e6  # micro-quantized contract
    pdf = pdf.sort_values(["user_id", "ts_us", "event_id"])
    ref = pdf.groupby("user_id")["vq"].transform(
        lambda s: s.expanding().mean().shift(1)
    )
    for eid, want in zip(pdf["event_id"], ref):
        gotv = got.loc[eid, "prior_mean"]
        if np.isnan(want):
            assert gotv is None or np.isnan(gotv)
        else:
            assert gotv == pytest.approx(want, rel=1e-9)


def test_group_zscore_matches_numpy(spark):
    rows = [(1, "a", float(v)) for v in (2.0, 4.0, 6.0, 8.0)] + [
        (2, "a", 5.0), (2, "a", 5.0),  # zero variance -> NULL z
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    out = group_zscore(df, keys=["user_id", "event_type"], value="value").collect()
    g1 = sorted(r.zscore for r in out if r.user_id == 1)
    vals = np.array([2.0, 4.0, 6.0, 8.0])
    want = sorted((vals - vals.mean()) / vals.std())
    assert np.allclose(g1, want, atol=1e-9)
    assert all(r.zscore is None for r in out if r.user_id == 2)
    assert all(r.key_mean == pytest.approx(5.0) for r in out if r.user_id == 2)


def test_fixed_k_sample_exact_counts_and_stability(spark):
    rows = [(i, "t" + str(i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    out1 = fixed_k_hash_sample(df, strata=["event_type"], key_cols=["event_id"], k=10)
    counts = {r.event_type: r.n for r in
              out1.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert counts == {"t0": 10, "t1": 10, "t2": 10}
    # rerun-stable: same rows both times, and a stratum smaller than k
    # returns whole stratum
    ids1 = sorted(r.event_id for r in out1.collect())
    ids2 = sorted(r.event_id for r in fixed_k_hash_sample(
        df, strata=["event_type"], key_cols=["event_id"], k=10).collect())
    assert ids1 == ids2
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "event_id long, event_type string")
    assert fixed_k_hash_sample(tiny, strata=["event_type"], key_cols=["event_id"], k=10).count() == 2
