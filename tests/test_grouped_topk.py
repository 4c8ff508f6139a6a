"""grouped_topk: the two-phase salted per-group top-k must be EXACTLY the
naive group-partitioned window — same rows, same ranks — at any salt count,
and its plan must never sort a whole group in one task."""

from __future__ import annotations

import random
import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.aggregates import grouped_topk


def _data(spark, n=3000, groups=4):
    rng = random.Random(99)
    rows = [
        (f"g{rng.randint(0, groups - 1)}", rng.randint(0, 500), f"id{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "g string, score long, uid string")


def test_equals_naive_window_any_salt(spark):
    df = _data(spark)
    w = Window.partitionBy("g").orderBy(
        F.col("score").desc(), F.col("uid").asc()
    )
    naive = (
        df.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 7)
        .collect()
    )
    expect = sorted((r.g, r.uid, r.rank) for r in naive)
    for n_salt in (1, 2, 32, 257):
        got = grouped_topk(
            df,
            group_cols=["g"],
            order_exprs=[(F.col("score"), True), (F.col("uid"), False)],
            k=7,
            n_salt=n_salt,
        ).collect()
        assert sorted((r.g, r.uid, r.rank) for r in got) == expect, n_salt


def test_groups_smaller_than_k(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 5, "z")],
        "g string, score long, uid string",
    )
    got = grouped_topk(
        df,
        group_cols=["g"],
        order_exprs=[(F.col("score"), True), (F.col("uid"), False)],
        k=10,
    ).collect()
    assert len(got) == 3
    assert {(r.g, r.rank) for r in got} == {("a", 1), ("a", 2), ("b", 1)}


def test_phase1_window_is_salted(spark):
    """Every row_number window over the full candidate frame must include
    the salt in its partitioning; only the post-filter (<= k*n_salt rows)
    rank may partition by the group alone."""
    df = _data(spark)
    out = grouped_topk(
        df,
        group_cols=["g"],
        order_exprs=[(F.col("score"), True), (F.col("uid"), False)],
        k=7,
        n_salt=32,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    wins = re.findall(r"Window \[row_number\(\)[^\]]*\], \[([^\]]*)\]", plan)
    assert len(wins) == 2
    assert sum("_salt" in w for w in wins) == 1
