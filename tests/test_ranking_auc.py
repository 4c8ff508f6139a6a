"""grouped_auc: exact Mann-Whitney AUC vs an O(n^2) pair-counting brute
force, including tie handling, degenerate groups, and the bucketed-prefix
decomposition at several bucket counts (must be bit-identical: u2 is pure
integer algebra)."""

from __future__ import annotations

import itertools
import random

from uncharted_ta1_spark.operators.evalmetrics import grouped_auc


def _brute_u2(rows):
    """2*U = sum over (pos, neg) pairs of 2*[s_p > s_n] + 1*[s_p == s_n]."""
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    u2 = 0
    for sp, sn in itertools.product(pos, neg):
        if sp > sn:
            u2 += 2
        elif sp == sn:
            u2 += 1
    return len(pos), len(neg), u2


def test_auc_matches_pair_counting_with_ties(spark):
    rng = random.Random(66)
    data = []
    for g in ("a", "b", "c"):
        for _ in range(200):
            # coarse scores force heavy ties
            data.append((g, rng.randint(0, 20), rng.random() < 0.3))
    df = spark.createDataFrame(
        [(g, s, y) for g, s, y in data], "g string, vm long, is_pos boolean"
    )
    got = {
        r.g: r
        for r in grouped_auc(
            df, group_cols=["g"], label_col="is_pos", score_col="vm"
        ).collect()
    }
    for g in ("a", "b", "c"):
        rows = [(s, y) for gg, s, y in data if gg == g]
        n_pos, n_neg, u2 = _brute_u2(rows)
        r = got[g]
        assert (r.n_pos, r.n_neg, r.u2) == (n_pos, n_neg, u2)
        assert r.auc == u2 / (2 * n_pos * n_neg)


def test_bucket_count_invariance(spark):
    """u2 must be bit-identical at every bucket granularity (the GK
    boundaries steer load balancing only, never the result)."""
    rng = random.Random(7)
    data = [("g", rng.randint(0, 50), rng.random() < 0.4) for _ in range(500)]
    df = spark.createDataFrame(data, "g string, vm long, is_pos boolean")
    outs = [
        grouped_auc(
            df, group_cols=["g"], label_col="is_pos",
            score_col="vm", n_buckets=k,
        ).collect()[0]
        for k in (2, 10, 100)
    ]
    assert len({(o.n_pos, o.n_neg, o.u2, o.auc) for o in outs}) == 1


def test_degenerate_groups_null_auc(spark):
    df = spark.createDataFrame(
        [("allpos", 1, True), ("allpos", 2, True),
         ("allneg", 1, False), ("allneg", 2, False)],
        "g string, vm long, is_pos boolean",
    )
    got = {r.g: r for r in grouped_auc(
        df, group_cols=["g"], label_col="is_pos", score_col="vm"
    ).collect()}
    assert got["allpos"].auc is None and got["allpos"].n_neg == 0
    assert got["allneg"].auc is None and got["allneg"].n_pos == 0


def test_perfect_and_inverted_ranking(spark):
    df = spark.createDataFrame(
        [("g", s, s >= 50) for s in range(100)],
        "g string, vm long, is_pos boolean",
    )
    r = grouped_auc(
        df, group_cols=["g"], label_col="is_pos", score_col="vm"
    ).collect()[0]
    assert r.auc == 1.0
    inv = spark.createDataFrame(
        [("g", s, s < 50) for s in range(100)],
        "g string, vm long, is_pos boolean",
    )
    r2 = grouped_auc(
        inv, group_cols=["g"], label_col="is_pos", score_col="vm"
    ).collect()[0]
    assert r2.auc == 0.0
