"""Lift/gain table, Cohen's kappa, Markov transitions, two-sample KS."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.agreement import cohen_kappa
from uncharted_ta1_spark.operators.kstest import ks_two_sample
from uncharted_ta1_spark.operators.lift import lift_table
from uncharted_ta1_spark.operators.markov import session_transitions


# --------------------------------------------------------------------------
# lift_table
# --------------------------------------------------------------------------


def test_lift_hand_example(spark):
    # 10 rows, scores 10..1; positives are exactly the top 3 scores
    rows = [Row(id=i, score=float(i), y=i >= 8) for i in range(1, 11)]
    out = {
        r.decile: r
        for r in lift_table(
            spark.createDataFrame(rows),
            score_col="score",
            label=F.col("y"),
            tiebreak="id",
            k=10,
            n_buckets=5,
        ).collect()
    }
    assert len(out) == 10
    # decile 1 = the single highest score (descending ranking)
    assert (out[1].n, out[1].n_pos) == (1, 1)
    assert out[1].pos_rate == 1.0
    # base rate 0.3 -> top decile lift = 1/0.3
    assert abs(out[1].lift - 1.0 / 0.3) < 1e-9
    # positives exhausted by decile 3: cumulative gain hits 1 and stays
    assert out[3].cum_gain == 1.0 and out[10].cum_gain == 1.0
    # the bottom decile's lift is the base rate ratio = 1
    assert abs(out[10].lift - 1.0) < 1e-9


def test_lift_matches_single_sort_ntile(spark):
    rng = random.Random(7)
    rows = [
        Row(id=i, score=float(rng.randint(0, 30)), y=rng.random() < 0.4)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.decile: (r.n, r.n_pos, r.cum_n, r.cum_pos)
        for r in lift_table(
            df, score_col="score", label=F.col("y"), tiebreak="id", k=10
        ).collect()
    }
    # oracle: plain ntile over one global sort
    ref_rows = df.select(
        F.expr(
            "ntile(10) OVER (ORDER BY score DESC, id ASC)"
        ).alias("decile"),
        F.col("y").cast("long").alias("pos"),
    ).collect()
    per = {}
    for r in ref_rows:
        n, p = per.get(r.decile, (0, 0))
        per[r.decile] = (n + 1, p + r.pos)
    cum_n = cum_p = 0
    for d in sorted(per):
        n, p = per[d]
        cum_n, cum_p = cum_n + n, cum_p + p
        assert got[d] == (n, p, cum_n, cum_p)


# --------------------------------------------------------------------------
# cohen_kappa
# --------------------------------------------------------------------------


def test_kappa_textbook_cells(spark):
    # n11=20 n10=5 n01=10 n00=15 -> po=.7 pa=.5 pb=.6 pe=.5 -> kappa=.4
    rows = (
        [Row(a=True, b=True)] * 20
        + [Row(a=True, b=False)] * 5
        + [Row(a=False, b=True)] * 10
        + [Row(a=False, b=False)] * 15
    )
    [r] = cohen_kappa(
        spark.createDataFrame(rows), rater_a=F.col("a"), rater_b=F.col("b")
    ).collect()
    assert (r.n, r.n11, r.n10, r.n01, r.n00) == (50, 20, 5, 10, 15)
    assert abs(r.po - 0.7) < 1e-9
    assert abs(r.kappa - 0.4) < 1e-9


def test_kappa_perfect_and_degenerate(spark):
    perfect = [Row(g="p", a=i % 2 == 0, b=i % 2 == 0) for i in range(10)]
    constant = [Row(g="c", a=True, b=True) for _ in range(10)]
    out = {
        r.g: r
        for r in cohen_kappa(
            spark.createDataFrame(perfect + constant),
            rater_a=F.col("a"),
            rater_b=F.col("b"),
            keys=["g"],
        ).collect()
    }
    assert out["p"].kappa == 1.0
    # both raters constant: expected agreement 1, kappa undefined -> NULL
    assert out["c"].kappa is None and out["c"].po == 1.0


# --------------------------------------------------------------------------
# session_transitions
# --------------------------------------------------------------------------


def test_transitions_hand_chain(spark):
    gap = 100
    rows = [
        # user 1, session 0: A -> B -> A
        Row(user_id=1, ts=0, eid=1, s="A"),
        Row(user_id=1, ts=10, eid=2, s="B"),
        Row(user_id=1, ts=20, eid=3, s="A"),
        # gap > 100 -> session 1: B -> B
        Row(user_id=1, ts=500, eid=4, s="B"),
        Row(user_id=1, ts=510, eid=5, s="B"),
        # user 2: A -> B (sessions never cross users)
        Row(user_id=2, ts=0, eid=6, s="A"),
        Row(user_id=2, ts=10, eid=7, s="B"),
    ]
    out = {
        (r.from_state, r.to_state): r
        for r in session_transitions(
            spark.createDataFrame(rows),
            keys=["user_id"],
            ts="ts",
            gap=gap,
            state_col="s",
            order_tiebreak=["eid"],
        ).collect()
    }
    # A->B twice, B->A once, B->B once; no cross-session A(20)->B(500) edge
    assert out[("A", "B")].n_trans == 2 and out[("A", "B")].n_from == 2
    assert out[("A", "B")].p == 1.0
    assert out[("B", "A")].n_trans == 1 and out[("B", "B")].n_trans == 1
    assert out[("B", "A")].n_from == 2 and abs(out[("B", "A")].p - 0.5) < 1e-9
    assert ("A", "A") not in out and len(out) == 3


def test_transitions_rows_normalize_to_one(spark):
    rng = random.Random(3)
    rows = [
        Row(user_id=rng.randint(1, 5), ts=i * 7, eid=i, s=rng.choice("XYZ"))
        for i in range(300)
    ]
    out = session_transitions(
        spark.createDataFrame(rows),
        keys=["user_id"],
        ts="ts",
        gap=10_000,
        state_col="s",
        order_tiebreak=["eid"],
    ).collect()
    by_from: dict[str, list] = {}
    for r in out:
        by_from.setdefault(r.from_state, []).append(r)
    for rows_f in by_from.values():
        assert all(r.n_from == sum(x.n_trans for x in rows_f) for r in rows_f)
        assert abs(sum(r.p for r in rows_f) - 1.0) < 1e-6


# --------------------------------------------------------------------------
# ks_two_sample
# --------------------------------------------------------------------------


def _ks_exact(xs: list[float], ys: list[float]) -> float:
    n1, n2 = len(xs), len(ys)
    best = 0
    for v in sorted(set(xs) | set(ys)):
        c1 = sum(1 for x in xs if x <= v)
        c2 = sum(1 for y in ys if y <= v)
        best = max(best, abs(c1 * n2 - c2 * n1))
    return best / (n1 * n2)


def test_ks_identical_samples_zero(spark):
    rows = [Row(v=float(i % 13), grp=c) for i in range(260) for c in "ab"]
    [r] = ks_two_sample(
        spark.createDataFrame(rows),
        value_col="v",
        in_sample_1=F.col("grp") == "a",
        in_sample_2=F.col("grp") == "b",
    ).collect()
    assert r.max_gap_scaled == 0 and r.ks_stat == 0.0


def test_ks_disjoint_samples_one(spark):
    rows = [Row(v=float(i), grp="a") for i in range(20)] + [
        Row(v=float(i + 100), grp="b") for i in range(30)
    ]
    [r] = ks_two_sample(
        spark.createDataFrame(rows),
        value_col="v",
        in_sample_1=F.col("grp") == "a",
        in_sample_2=F.col("grp") == "b",
    ).collect()
    assert (r.n1, r.n2) == (20, 30)
    assert r.ks_stat == 1.0


def test_ks_matches_brute_force_and_bucket_count_invariance(spark):
    rng = random.Random(11)
    xs = [round(rng.gauss(0.0, 1.0), 3) for _ in range(400)]
    ys = [round(rng.gauss(0.4, 1.2), 3) for _ in range(300)]
    rows = [Row(v=x, grp="a") for x in xs] + [Row(v=y, grp="b") for y in ys]
    df = spark.createDataFrame(rows)
    want = _ks_exact(xs, ys)
    for nb in (3, 17, 100):
        [r] = ks_two_sample(
            df,
            value_col="v",
            in_sample_1=F.col("grp") == "a",
            in_sample_2=F.col("grp") == "b",
            n_buckets=nb,
        ).collect()
        assert (r.n1, r.n2) == (400, 300)
        assert abs(r.ks_stat - want) < 1e-9
