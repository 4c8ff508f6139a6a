"""ntile_equal_freq must equal window ntile bit-for-bit (operators/binning.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.operators.binning import ntile_equal_freq


def _reference(df, k):
    w = Window.partitionBy("cls").orderBy(F.col("v").asc(), F.col("rid").asc())
    return df.select("rid", "cls", "v", F.ntile(k).over(w).cast("int").alias("decile"))


def _check(spark, rows, k, n_buckets=7):
    df = spark.createDataFrame(rows, "rid long, cls string, v double")
    got = {
        r.rid: r.decile
        for r in ntile_equal_freq(
            df, keys=["cls"], col="v", order_tiebreak=["rid"], k=k,
            n_buckets=n_buckets,
        ).collect()
    }
    want = {r.rid: r.decile for r in _reference(df, k).collect()}
    assert got == want


def test_matches_ntile_uneven_sizes(spark):
    rng = random.Random(7)
    rows = [(i, "c" + str(i % 3), float(rng.randint(0, 40))) for i in range(157)]
    _check(spark, rows, k=10)


def test_matches_ntile_small_groups_n_below_k(spark):
    # n < k: ntile hands each row its own tile — the q=0 branch
    rows = [(i, "only", float(i)) for i in range(7)]
    _check(spark, rows, k=10)


def test_matches_ntile_heavy_ties_across_bucket_edges(spark):
    # many duplicate values: equal values must never straddle a range
    # bucket, and the rid tie-break must order them exactly like ntile
    rng = random.Random(11)
    rows = [(i, "c", float(rng.randint(0, 3))) for i in range(200)]
    _check(spark, rows, k=10, n_buckets=4)


def test_matches_ntile_exact_multiples(spark):
    rows = [(i, "c" + str(i % 2), float(i)) for i in range(200)]
    _check(spark, rows, k=10)
