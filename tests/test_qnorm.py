"""Quantile normalization onto a reference distribution."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.qnorm import quantile_normalize


def _df(spark, vals, g=1):
    return spark.createDataFrame(
        [Row(id=i, v=float(x), g=g) for i, x in enumerate(vals)]
    )


def _qn(spark, src, ref, **kw):
    return quantile_normalize(
        _df(spark, src),
        _df(spark, ref),
        keys=["g"],
        col="v",
        tiebreak=["id"],
        ref_tiebreak=["id"],
        **kw,
    )


def test_qnorm_equal_sizes_is_rank_swap(spark):
    out = {
        r.id: r.q_value
        for r in _qn(spark, [9.0, 1.0, 5.0], [20.0, 30.0, 10.0]).collect()
    }
    # src ranks: 1->1.0, 5->2, 9->3 ; ref order stats 10,20,30
    assert out[1] == 10.0 and out[2] == 20.0 and out[0] == 30.0


def test_qnorm_k_index_with_unequal_sizes(spark):
    # n=2, nref=4: k = ceil(r*4/2) -> 2nd and 4th ref order statistics
    out = sorted(
        r.q_value for r in _qn(spark, [7.0, 3.0], [1.0, 2.0, 3.0, 4.0]).collect()
    )
    assert out == [2.0, 4.0]


def test_qnorm_transforms_to_reference_distribution(spark):
    rng = random.Random(13)
    src = [rng.gauss(100.0, 50.0) for _ in range(500)]
    ref = [rng.expovariate(0.1) for _ in range(500)]
    got = sorted(r.q_value for r in _qn(spark, src, ref).collect())
    # equal sizes: the transformed multiset IS the reference multiset
    assert got == sorted(ref)


def test_qnorm_monotone_and_matches_brute_force(spark):
    rng = random.Random(21)
    src = [round(rng.uniform(0, 50), 2) for _ in range(300)]
    ref = [round(rng.uniform(-10, 10), 2) for _ in range(170)]
    rows = sorted(
        _qn(spark, src, ref, n_buckets=7).collect(), key=lambda r: r._r
    )
    ref_sorted = sorted(ref)
    n, nref = len(src), len(ref)
    prev = -math.inf
    for r in rows:
        k = math.ceil(r._r * nref / n)
        assert r.q_value == ref_sorted[k - 1]
        assert r.q_value >= prev
        prev = r.q_value
