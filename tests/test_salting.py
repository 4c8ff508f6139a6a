"""Salting invariance: the salted two-phase aggregate must equal the plain
groupBy for any salt count, and its plan must contain the two-phase shape
(two exchanges, partial on (keys, salt))."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from uncharted_ta1_spark import datagen
from uncharted_ta1_spark.operators.salting import salted_agg

SF = "/root/testdata/sf0.001"

AGGS = {
    "n_rows": ("*", "count"),
    "sum_n_tok": ("n_tok", "sum"),
    "min_epoch": ("event_epoch", "min"),
    "max_epoch": ("event_epoch", "max"),
}


def _plain(seq):
    return seq.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("n_tok").cast("long")).cast("long").alias("sum_n_tok"),
        F.min("event_epoch").alias("min_epoch"),
        F.max("event_epoch").alias("max_epoch"),
    )


def test_salted_equals_plain_for_any_salt_count(spark):
    seq = datagen.sequences_df(spark, SF)
    want = _plain(seq).orderBy("doc_id").toPandas()
    for n_salts in (1, 4, 64):
        got = (
            salted_agg(seq, keys=["doc_id"], salt_from="seq_no", n_salts=n_salts, aggs=AGGS)
            .orderBy("doc_id")
            .toPandas()
        )
        assert got.equals(want), f"n_salts={n_salts}"


def test_salted_plan_is_two_phase(spark):
    seq = datagen.sequences_df(spark, SF)
    plan = (
        salted_agg(seq, keys=["doc_id"], salt_from="seq_no", n_salts=16, aggs=AGGS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # phase 1 keyed by (doc_id, _salt), phase 2 by doc_id → two exchanges
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "_salt" in plan


def test_non_algebraic_rejected(spark):
    seq = datagen.sequences_df(spark, SF)
    try:
        salted_agg(seq, keys=["doc_id"], salt_from="seq_no", aggs={"m": ("n_tok", "median")})
    except ValueError as e:
        assert "non-algebraic" in str(e)
    else:
        raise AssertionError("median must be rejected")


def test_salted_join_equals_plain_join_without_broadcast(spark):
    """With broadcast off (the hot-key scenario the operator exists for),
    the salted join must produce exactly the plain join's rows and spread
    each key over multiple salt values."""
    from pyspark.sql import functions as F

    from uncharted_ta1_spark.operators.salting import salted_join

    big = spark.createDataFrame(
        [(i, "hot" if i % 10 != 0 else f"cold{i % 3}") for i in range(1000)],
        "row_id long, k string",
    )
    small = big.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = salted_join(
            big, small, keys=["k"], salt_from="row_id", n_salts=8
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        rows = {(r.row_id, r.k, r.n) for r in got.collect()}
        want = {(r.row_id, r.k, r.n) for r in big.join(small, "k").collect()}
        assert rows == want and len(rows) == 1000
        # the hot key's big-side rows really carry > 1 distinct salt
        n_salts_used = (
            big.where(F.col("k") == "hot")
            .select(F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).alias("s"))
            .distinct()
            .count()
        )
        assert n_salts_used > 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
