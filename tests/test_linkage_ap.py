"""Average precision (step PR) and Fellegi-Sunter linkage weights."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.evalmetrics import (
    grouped_average_precision,
)
from uncharted_ta1_spark.operators.linkage import fs_pattern_weights


def _ap_exact(pairs: list[tuple[int, int]]) -> float:
    """Step AP at distinct-threshold granularity: (score, label) pairs."""
    from collections import defaultdict

    by_score: dict[int, list[int]] = defaultdict(list)
    for s, y in pairs:
        by_score[s].append(y)
    n_pos = sum(y for _, y in pairs)
    tp = t_seen = 0
    ap = 0.0
    for s in sorted(by_score, reverse=True):
        labels = by_score[s]
        p = sum(labels)
        tp += p
        t_seen += len(labels)
        if p > 0:
            # the module quantizes each term to the 1e-12 grid
            ap += math.floor(p * tp / (n_pos * t_seen) * 1e12) / 1e12
    return ap


def test_ap_hand_example(spark):
    # ranking (desc): pos, neg, pos -> AP = 1/2*(1) + 1/2*(2/3)
    rows = [
        Row(g=1, s=30, y=True),
        Row(g=1, s=20, y=False),
        Row(g=1, s=10, y=True),
    ]
    [r] = grouped_average_precision(
        spark.createDataFrame(rows),
        group_cols=["g"],
        label_col="y",
        score_col="s",
    ).collect()
    assert (r.n_pos, r.n_total) == (2, 3)
    assert abs(r.ap - (0.5 + 0.5 * 2 / 3)) < 1e-9


def test_ap_ties_at_threshold_granularity(spark):
    # one threshold holds 1 pos + 1 neg: P at that cut counts both
    rows = [
        Row(g=1, s=10, y=True),
        Row(g=1, s=10, y=False),
    ]
    [r] = grouped_average_precision(
        spark.createDataFrame(rows),
        group_cols=["g"],
        label_col="y",
        score_col="s",
    ).collect()
    assert abs(r.ap - 0.5) < 1e-9


def test_ap_matches_brute_force_random(spark):
    rng = random.Random(5)
    data = [
        (g, rng.randint(0, 40), rng.random() < 0.3)
        for g in (1, 2)
        for _ in range(400)
    ]
    df = spark.createDataFrame(
        [Row(g=g, s=s, y=y) for g, s, y in data]
    )
    out = {
        r.g: r
        for r in grouped_average_precision(
            df, group_cols=["g"], label_col="y", score_col="s"
        ).collect()
    }
    for g in (1, 2):
        want = _ap_exact([(s, int(y)) for gg, s, y in data if gg == g])
        assert abs(out[g].ap - want) < 1e-9, g


def test_ap_no_positives_is_null(spark):
    rows = [Row(g=1, s=i, y=False) for i in range(5)]
    [r] = grouped_average_precision(
        spark.createDataFrame(rows),
        group_cols=["g"],
        label_col="y",
        score_col="s",
    ).collect()
    assert r.ap is None and r.n_pos == 0


def test_fs_weights_hand_example(spark):
    # 4 true pairs: field a agrees on 3 (m_a=3/4), field b on all (m_b=1)
    # 8 false pairs: a agrees on 2 (u_a=1/4), b agrees on 4 (u_b=1/2)
    def mk(a, b, t, n):
        return [Row(fa=a, fb=b, tr=t)] * n

    rows = (
        mk(1, 1, 1, 3)  # true, both agree
        + mk(0, 1, 1, 1)  # true, a disagrees
        + mk(1, 1, 0, 1)  # false, both agree
        + mk(1, 0, 0, 1)  # false, a agrees only
        + mk(0, 1, 0, 3)  # false, b agrees only
        + mk(0, 0, 0, 3)  # false, none
    )
    out = {
        (r.fa, r.fb): r
        for r in fs_pattern_weights(
            spark.createDataFrame(rows), agree_cols=["fa", "fb"], truth_col="tr"
        ).collect()
    }
    r = out[(1, 1)]
    assert (r.n_pairs, r.n_true) == (4, 3)
    assert abs(r.m_fa - 0.75) < 1e-9 and abs(r.u_fa - 0.25) < 1e-9
    assert abs(r.m_fb - 1.0) < 1e-9 and abs(r.u_fb - 0.5) < 1e-9
    # (1,1): ln(m_a/u_a) + ln(m_b/u_b) = ln(3) + ln(2)
    assert abs(r.weight - (math.log(3.0) + math.log(2.0))) < 1e-6
    # (1,0): b disagrees but m_b = 1 -> that term undefined -> NULL weight
    assert out[(1, 0)].weight is None
    # (0,1): ln((1-.75)/(1-.25)) + ln(1/.5) = ln(1/3) + ln(2)
    assert abs(
        out[(0, 1)].weight - (math.log(1.0 / 3.0) + math.log(2.0))
    ) < 1e-6


def test_fs_weight_orders_patterns_by_match_evidence(spark):
    # with informative fields, both-agree must outscore both-disagree
    rng = random.Random(9)
    rows = []
    for i in range(500):
        true_pair = rng.random() < 0.2
        fa = int(rng.random() < (0.9 if true_pair else 0.3))
        fb = int(rng.random() < (0.8 if true_pair else 0.1))
        rows.append(Row(fa=fa, fb=fb, tr=int(true_pair)))
    out = {
        (r.fa, r.fb): r.weight
        for r in fs_pattern_weights(
            spark.createDataFrame(rows), agree_cols=["fa", "fb"], truth_col="tr"
        ).collect()
    }
    assert out[(1, 1)] > out[(1, 0)] > out[(0, 0)]
    assert out[(1, 1)] > out[(0, 1)] > out[(0, 0)]
