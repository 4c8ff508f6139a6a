"""Semantics of operators/splits.py: expanding-window CV folds (no
leakage, brute-force parity) and PSI drift (zero on identical halves,
one-sided bin accounting)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.splits import psi_drift, time_series_cv


def _seq_rows():
    # 20 rows over t in [0, 99]; weights = t so sums are easy to audit
    return [Row(t=t, w=t) for t in range(0, 100, 5)]


def test_cv_folds_match_brute_force(spark):
    df = spark.createDataFrame(_seq_rows())
    out = {
        r["fold"]: r
        for r in time_series_cv(
            df, time_col="t", weight_col="w", n_segments=5
        ).collect()
    }
    ts = [t for t in range(0, 100, 5)]
    mn, mx = min(ts), max(ts)
    segs = {t: ((t - mn) * 5) // (mx - mn + 1) for t in ts}
    assert set(out) == {1, 2, 3, 4}
    for f in range(1, 5):
        train = [t for t in ts if segs[t] < f]
        test = [t for t in ts if segs[t] == f]
        r = out[f]
        assert r["train_rows"] == len(train)
        assert r["test_rows"] == len(test)
        assert r["train_max_t"] == max(train)
        assert r["test_min_t"] == min(test)
        assert r["test_max_t"] == max(test)
        assert r["train_weight"] == sum(train)
        assert r["test_weight"] == sum(test)
        assert r["leak_free"] is True
        # the invariant itself
        assert r["train_max_t"] < r["test_min_t"]


def test_cv_folds_respect_time_not_row_order(spark):
    # shuffled input must give identical folds (pure event-time semantics)
    rows = _seq_rows()
    shuffled = rows[::2] + rows[1::2][::-1]
    a = time_series_cv(
        spark.createDataFrame(rows), time_col="t", weight_col="w"
    ).collect()
    b = time_series_cv(
        spark.createDataFrame(shuffled), time_col="t", weight_col="w"
    ).collect()
    key = lambda r: r["fold"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_psi_zero_when_halves_identical(spark):
    # same bin histogram in [0, 50) and [50, 100) -> every term is 0
    # (t % 10 gives each residue exactly 5 times in each half)
    rows = [Row(t=t, b=t % 10) for t in range(100)]
    df = spark.createDataFrame(rows)
    r = psi_drift(df, time_col="t", bin_expr=F.col("b")).collect()[0]
    assert r["psi"] == 0.0
    assert r["bins_shared"] == 10
    assert r["bins_one_sided"] == 0
    assert r["rows_early"] == 50 and r["rows_late"] == 50
    assert r["rows_one_sided"] == 0


def test_psi_matches_closed_form_and_reports_one_sided(spark):
    # early: bins {0: 8, 1: 2, 9: 2}; late: bins {0: 4, 1: 6}
    # bin 9 exists only early -> excluded from the sum, reported
    rows = (
        [Row(t=i, b=0) for i in range(8)]
        + [Row(t=8 + i, b=1) for i in range(2)]
        + [Row(t=10 + i, b=9) for i in range(2)]
        + [Row(t=100 + i, b=0) for i in range(4)]
        + [Row(t=104 + i, b=1) for i in range(6)]
    )
    df = spark.createDataFrame(rows)
    r = psi_drift(df, time_col="t", bin_expr=F.col("b")).collect()[0]
    assert r["rows_early"] == 12 and r["rows_late"] == 10
    assert r["bins_shared"] == 2
    assert r["bins_one_sided"] == 1
    assert r["rows_one_sided"] == 2
    expect = 0
    for ce, cl in ((8, 4), (2, 6)):
        p, q = ce / 12, cl / 10
        expect += math.floor((p - q) * math.log(p / q) * 1e9)
    assert r["psi"] == expect / 1e9
    assert r["psi"] > 0


def test_cv_folds_degenerate_single_timestamp(spark):
    """All rows at one timestamp: everything lands in segment 0 (never a
    test fold) -> an EMPTY fold table, not a crash or a leaky fold."""
    from pyspark.sql import Row as R

    df = spark.createDataFrame([R(t=42, w=1)] * 10)
    out = time_series_cv(df, time_col="t", weight_col="w").collect()
    assert out == []
