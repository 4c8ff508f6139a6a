"""Greedy one-to-one buffered matching semantics (the reference's scoring
rule): ascending-distance consumption, each side matched at most once."""

from __future__ import annotations

from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.evalmetrics import (
    buffered_f1,
    greedy_buffered_f1,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts_us long"
    )


def test_one_to_one_vs_any_within(spark):
    """Two preds near ONE truth: any-within counts both preds matched;
    greedy one-to-one matches exactly one (the closer)."""
    rows = [
        (1, "u", "pred", 1000),
        (2, "u", "pred", 1100),
        (3, "u", "truth", 1050),
    ]
    kw = dict(keys=["user_id"], ts="ts_us", id_col="event_id",
              pred_filter=F.col("event_type") == "pred",
              truth_filter=F.col("event_type") == "truth", buffer=500)
    loose = buffered_f1(_ev(spark, rows), **kw).collect()[0]
    tight = greedy_buffered_f1(_ev(spark, rows), **kw).collect()[0]
    assert loose.matched_pred == 2          # both preds within buffer
    assert tight.n_matched == 1             # but only one can consume the truth
    assert tight.precision == 0.5 and tight.recall == 1.0


def test_greedy_order_is_by_distance(spark):
    """truth A sits between two preds; the closer pred takes it, the farther
    pred then matches truth B even though A was also in range."""
    rows = [
        (1, "u", "pred", 1000),   # dist to A=50, to B=300
        (2, "u", "pred", 1100),   # dist to A=50, to B=200
        (3, "u", "truth", 1050),  # A
        (4, "u", "truth", 1300),  # B
    ]
    kw = dict(keys=["user_id"], ts="ts_us", id_col="event_id",
              pred_filter=F.col("event_type") == "pred",
              truth_filter=F.col("event_type") == "truth", buffer=400)
    r = greedy_buffered_f1(_ev(spark, rows), **kw).collect()[0]
    # pair ranks: (50, A, p1) then (50, A, p2) skipped, (200, B, p2) matched
    assert r.n_matched == 2
    assert r.f1 == 1.0


def test_groups_without_pairs(spark):
    rows = [(1, "u1", "pred", 0), (2, "u2", "truth", 0)]
    kw = dict(keys=["user_id"], ts="ts_us", id_col="event_id",
              pred_filter=F.col("event_type") == "pred",
              truth_filter=F.col("event_type") == "truth", buffer=10)
    got = {r.user_id: r for r in greedy_buffered_f1(_ev(spark, rows), **kw).collect()}
    assert got["u1"].n_matched == 0 and got["u1"].precision == 0.0
    assert got["u2"].n_matched == 0 and got["u2"].recall == 0.0
