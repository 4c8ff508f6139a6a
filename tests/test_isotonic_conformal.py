"""Isotonic PAV via bounded relational minimax, and split-conformal
coverage semantics."""

from __future__ import annotations

from pyspark.sql import Row

from uncharted_ta1_spark.operators.conformal import split_conformal_coverage
from uncharted_ta1_spark.operators.isotonic import isotonic_fit


def _bins(spark, triples):
    return spark.createDataFrame(
        [Row(bin=b, n=n, n_pos=p) for b, n, p in triples]
    )


def _pav_reference(ns, ps):
    """Classic stack-based pool-adjacent-violators, weighted by n."""
    blocks = []  # (sum_pos, sum_n)
    for n, p in zip(ns, ps):
        blocks.append((p, n))
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            p2, n2 = blocks.pop()
            p1, n1 = blocks.pop()
            blocks.append((p1 + p2, n1 + n2))
    fitted = []
    i = 0
    for p, n in blocks:
        # count how many original bins this block absorbed by weight
        w = 0
        while w < n:
            w += ns[i]
            fitted.append(p / n)
            i += 1
    return fitted


def test_pav_pools_violators(spark):
    # rates [0.1, 0.3, 0.2, 0.4] with equal n -> [0.1, 0.25, 0.25, 0.4]
    out = sorted(
        isotonic_fit(
            _bins(spark, [(1, 10, 1), (2, 10, 3), (3, 10, 2), (4, 10, 4)])
        ).collect(),
        key=lambda r: r.bin,
    )
    assert [round(r.iso_rate, 9) for r in out] == [0.1, 0.25, 0.25, 0.4]
    assert [r.pos_rate for r in out] == [0.1, 0.3, 0.2, 0.4]


def test_pav_identity_on_monotone_input(spark):
    out = sorted(
        isotonic_fit(
            _bins(spark, [(1, 10, 1), (2, 10, 3), (3, 10, 5), (4, 10, 9)])
        ).collect(),
        key=lambda r: r.bin,
    )
    assert [r.iso_rate for r in out] == [r.pos_rate for r in out]


def test_pav_matches_stack_reference_and_is_monotone(spark):
    ns = [5, 7, 3, 10, 4, 6, 8, 2]
    ps = [1, 5, 1, 2, 3, 1, 7, 0]
    out = sorted(
        isotonic_fit(
            _bins(spark, [(i + 1, n, p) for i, (n, p) in enumerate(zip(ns, ps))])
        ).collect(),
        key=lambda r: r.bin,
    )
    got = [r.iso_rate for r in out]
    assert got == sorted(got)  # monotone
    ref = _pav_reference(ns, ps)
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, ref))
    # weighted mean preserved
    assert (
        abs(
            sum(g * n for g, n in zip(got, ns))
            - sum(ps)
        )
        < 1e-9
    )


def _seq_rows(source, xs, ys, ts):
    return [
        Row(
            doc_id=f"doc_{i}",
            source=source,
            seq_no=int(x),
            event_epoch=int(t),
            tokens=[1] * int(y),
            n_tok=int(y),
        )
        for i, (x, y, t) in enumerate(zip(xs, ys, ts))
    ]


def test_conformal_exact_model_gives_full_coverage(spark):
    # y = 2x exactly everywhere: residuals 0, q_hat 0, coverage 1.0
    xs = list(range(50))
    rows = _seq_rows("s0", xs, [2 * x for x in xs], range(0, 5000, 100))
    df = spark.createDataFrame(rows)
    [r] = split_conformal_coverage(df, group_col="source").collect()
    assert r.q_hat_micro == 0
    assert r.n_test > 0 and r.n_covered == r.n_test and r.coverage == 1.0
    assert abs(r.slope - 2.0) < 1e-12 and abs(r.intercept) < 1e-12


def test_conformal_outlier_in_test_not_covered(spark):
    # exact fit on train+calib; one wild test point falls outside
    xs = list(range(50))
    ys = [3 * x + 1 for x in xs]
    ys[-1] += 1000  # last row lands in the test fifth
    rows = _seq_rows("s0", xs, ys, range(0, 5000, 100))
    [r] = split_conformal_coverage(
        spark.createDataFrame(rows), group_col="source"
    ).collect()
    assert r.n_covered == r.n_test - 1


def test_conformal_degenerate_group_dropped(spark):
    # constant x -> singular normal equations -> group filtered out
    rows = _seq_rows("s0", [5] * 20, range(20), range(0, 2000, 100))
    assert (
        split_conformal_coverage(
            spark.createDataFrame(rows), group_col="source"
        ).count()
        == 0
    )


def test_conformal_k_order_statistic(spark):
    # residuals on calibration are controlled; q_hat is the
    # ceil((n_cal+1)*0.9)-th smallest micro residual
    xs = list(range(100))
    ys = [x + (1 if x % 10 == 0 else 0) for x in xs]  # mostly exact
    rows = _seq_rows("s0", xs, ys, range(0, 10000, 100))
    [r] = split_conformal_coverage(
        spark.createDataFrame(rows), group_col="source"
    ).collect()
    assert r.n_cal == 20
    # k = ceil(21*0.9) = 19; with at most 2 nonzero calib residuals the
    # 19th smallest is 0 or the small systematic offset — recompute:
    assert r.k_capped is False
    assert r.q_hat_micro >= 0
