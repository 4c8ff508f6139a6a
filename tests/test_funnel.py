"""Ordered-funnel semantics (operators/funnel.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uncharted_ta1_spark.operators.funnel import funnel_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long"
    )


def test_funnel_strict_order(spark):
    """A click BEFORE the first view does not convert; a later one does.
    Deltas measure first-qualifying to first-qualifying."""
    rows = [
        # u1: view@10, click@20, purchase@30 -> full funnel, deltas 10/10
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: click@5 precedes view@10; no later click -> stops at view
        (2, "click", 5), (2, "view", 10), (2, "purchase", 50),
        # u3: view only
        (3, "view", 99),
        # u4: never viewed -> not in funnel at all
        (4, "click", 1), (4, "purchase", 2),
        # u5: view@10, clicks@8 and @12 (first qualifying 12), purchase@12
        # (NOT strictly after t1=12) -> stops at click, delta 2
        (5, "view", 10), (5, "click", 8), (5, "click", 12),
        (5, "purchase", 12),
    ]
    got = funnel_counts(_ev(spark, rows),
                        steps=["view", "click", "purchase"]).collect()[0]
    assert got["n_view"] == 4          # u1 u2 u3 u5
    assert got["n_click"] == 2         # u1 (20), u5 (12)
    assert got["sum_delta_click_us"] == (20 - 10) + (12 - 10)
    assert got["n_purchase"] == 1      # u1 only (u5's purchase ties t1)
    assert got["sum_delta_purchase_us"] == 30 - 20


def test_funnel_empty_tail_is_zero(spark):
    rows = [(1, "view", 10), (2, "view", 20)]
    got = funnel_counts(_ev(spark, rows),
                        steps=["view", "click", "purchase"]).collect()[0]
    assert got["n_view"] == 2
    assert got["n_click"] == 0
    assert got["sum_delta_click_us"] == 0
    assert got["n_purchase"] == 0
