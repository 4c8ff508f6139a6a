"""KMV sketches: merge property (union sketch from sketch union == sketch
of the union), estimator accuracy on known cardinalities, and the exact
collapse for sets smaller than k."""

from __future__ import annotations

from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import md5_i64
from uncharted_ta1_spark.operators.sketches import (
    kmv_estimate,
    kmv_sketch,
)


def _hashes(spark, name, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.lit(name).alias("setname"),
            md5_i64(F.col("id").cast("string"), salt="kmvtest").alias(
                "sh_hash"
            ),
        )
    )


def test_small_set_collapses_to_exact(spark):
    df = _hashes(spark, "s", 0, 40)
    [r] = kmv_estimate(kmv_sketch(df, "setname", k=256), "setname", k=256).collect()
    assert (r.n_kmv, r.kmv_est) == (40, 40.0)


def test_estimate_within_tolerance(spark):
    # 20k distinct uniform hashes, k=256: standard error ~ 1/sqrt(k) ~ 6%
    df = _hashes(spark, "s", 0, 20_000)
    [r] = kmv_estimate(kmv_sketch(df, "setname", k=256), "setname", k=256).collect()
    assert abs(r.kmv_est - 20_000) / 20_000 < 0.25


def test_union_of_sketches_equals_sketch_of_union(spark):
    a = _hashes(spark, "u", 0, 5_000)
    b = _hashes(spark, "u", 3_000, 9_000)  # overlapping ranges
    ka = kmv_sketch(_hashes(spark, "a", 0, 5_000), "setname", k=64)
    kb = kmv_sketch(_hashes(spark, "b", 3_000, 9_000), "setname", k=64)
    merged = sorted(
        r.sh_hash
        for r in ka.select("sh_hash")
        .unionByName(kb.select("sh_hash"))
        .distinct()
        .orderBy("sh_hash")
        .limit(64)
        .collect()
    )
    direct = sorted(
        r.sh_hash
        for r in kmv_sketch(a.unionByName(b), "setname", k=64)
        .select("sh_hash")
        .collect()
    )
    assert merged == direct
