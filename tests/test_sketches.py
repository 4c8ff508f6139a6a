"""Sketch operators: HyperLogLog distinct + count-min frequency
(operators/sketches.py) and BM25 ranking (operators/ranking.py).

The structural properties tested here are the ones that make the sketches
trustworthy at 100 TB: mergeability (partial sketches over shards combine
to exactly the whole-data sketch) and one-sided error (CMS never
underestimates).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE
from uncharted_ta1_spark.functions.portable import words_col
from uncharted_ta1_spark.operators.ranking import bm25_topk
from uncharted_ta1_spark.operators.sketches import (
    cms_counters,
    cms_lookup,
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_type", F.col("user_id").cast("string").alias("uk")
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_hll_merge_equals_direct(events):
    """Registers merged from per-group partials == registers built on the
    whole input — the mergeability that makes HLL shard-safe."""
    per_group = hll_registers(events, ["event_type"], "uk")
    merged = (
        hll_merge(
            per_group.withColumn("event_type", F.lit("ALL")), ["event_type"]
        )
        .select("bucket", "m_reg")
    )
    direct = (
        hll_registers(events.withColumn("event_type", F.lit("ALL")),
                      ["event_type"], "uk")
        .select("bucket", "m_reg")
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_estimate_accuracy(spark, events):
    """m=64 gives ~13% standard error; assert within 4 sigma on real data,
    for the merged whole-table estimate AND each per-type estimate."""
    regs = hll_registers(events, ["event_type"], "uk")
    est = {
        r["event_type"]: r["hll_est"]
        for r in hll_estimate(regs, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("uk").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(est[et] - n) / n < 0.52, (et, est[et], n)


def test_hll_small_range_correction(spark):
    """A 10-key input lands in the linear-counting branch and still
    estimates within ~30%."""
    df = spark.createDataFrame(
        [("a", str(i)) for i in range(10)], "g string, uk string"
    )
    regs = hll_registers(df, ["g"], "uk")
    est = hll_estimate(regs, ["g"]).collect()[0]["hll_est"]
    assert 7.0 <= est <= 13.0, est


def test_cms_never_underestimates(spark, docs):
    """The defining CMS guarantee: estimate >= true count for EVERY key."""
    wc = (
        docs.select(F.explode(words_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    counters = cms_counters(wc)
    est = cms_lookup(wc.select("word"), counters)
    bad = (
        wc.join(est, "word")
        .filter(F.col("cms_estimate") < F.col("c"))
        .count()
    )
    assert bad == 0


def test_cms_merge_equals_direct(spark, docs):
    """Counters summed from two disjoint shards == counters on the union."""
    wc = lambda d: (
        d.select(F.explode(words_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    left = docs.filter(F.col("doc_id") % 2 == 0)
    right = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        cms_counters(wc(left))
        .unionByName(cms_counters(wc(right)))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    direct = cms_counters(wc(docs))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_bloom_no_false_negatives(spark, docs):
    """One-sided error: every key actually in the filter's key set MUST
    test positive."""
    from uncharted_ta1_spark.operators.dedup import doc_shingles

    ev = doc_shingles(docs.filter(F.col("doc_id") % 10 == 3), n=3)
    from uncharted_ta1_spark.operators.sketches import (
        bloom_bits,
        bloom_membership,
    )

    bits = bloom_bits(ev.select("sh_hash").distinct())
    # probe the filter with its OWN keys: all must hit
    tested = bloom_membership(
        ev.select("doc_id", "sh_hash"), bits
    )
    assert tested.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_fp_rate_sane(spark, docs):
    """Keys NOT in the set should rarely hit: at 16384 bits / 4 hashes and
    the sf0.001 eval-slice load the false-positive rate stays under 5%."""
    from uncharted_ta1_spark.operators.dedup import doc_shingles
    from uncharted_ta1_spark.operators.sketches import (
        bloom_bits,
        bloom_membership,
    )

    ev = doc_shingles(docs.filter(F.col("doc_id") % 10 == 3), n=3)
    tr = doc_shingles(docs.filter(F.col("doc_id") % 10 != 3), n=3)
    ev_keys = ev.select("sh_hash").distinct()
    bits = bloom_bits(ev_keys)
    negatives = (
        tr.select("sh_hash").distinct().join(ev_keys, "sh_hash", "left_anti")
    )
    tested = bloom_membership(negatives, bits)
    n = tested.count()
    fp = tested.filter(F.col("bloom_hit")).count()
    assert n > 0 and fp / n < 0.05, (fp, n)


def test_bm25_orders_by_relevance(docs):
    """Scores are positive, sorted descending, and every hit contains at
    least one query term."""
    terms = ["table", "scan", "merge"]
    top = bm25_topk(docs, terms=terms, k=10).collect()
    assert len(top) == 10
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    hit_ids = {r["doc_id"] for r in top}
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin(list(hit_ids))).collect()
    }
    for d in hit_ids:
        assert any(t in texts[d].split(" ") for t in terms)


def test_bm25_plan_is_take_ordered(docs):
    """Top-k must plan as TakeOrdered (distributed partial top-k), not a
    single-partition global sort."""
    plan = bm25_topk(docs, terms=["table"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
