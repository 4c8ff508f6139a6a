"""WOE/IV encoding and Kaplan-Meier survival semantics."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.survival import kaplan_meier
from uncharted_ta1_spark.operators.woe import woe_encode


def test_woe_hand_example(spark):
    rows = (
        [Row(cat="A", y=True)] * 3
        + [Row(cat="A", y=False)] * 1
        + [Row(cat="B", y=True)] * 1
        + [Row(cat="B", y=False)] * 3
    )
    out = {
        r.category: r
        for r in woe_encode(
            spark.createDataFrame(rows), cat_col="cat", label=F.col("y")
        ).collect()
    }
    assert (out["A"].n_pos, out["A"].n_neg) == (3, 1)
    assert abs(out["A"].woe - math.log(3)) < 1e-9
    assert abs(out["A"].iv_term - 0.5 * math.log(3)) < 1e-9
    # symmetric category has the mirrored encoding
    assert abs(out["B"].woe + math.log(3)) < 1e-9
    assert abs(out["B"].iv_term - out["A"].iv_term) < 1e-9


def test_woe_zero_cell_reported_null(spark):
    rows = [Row(cat="A", y=True), Row(cat="A", y=False), Row(cat="C", y=True)]
    out = {
        r.category: r
        for r in woe_encode(
            spark.createDataFrame(rows), cat_col="cat", label=F.col("y")
        ).collect()
    }
    assert out["C"].woe is None and out["C"].iv_term is None
    assert out["C"].n_pos == 1 and out["C"].n_neg == 0


def _sess(spark, rows):
    return spark.createDataFrame(
        [Row(dur_sec=d, censored=c) for d, c in rows]
    )


def test_km_hand_curve_with_censoring(spark):
    # deaths at 5 (2 of 4 at risk) and 8 (1 of 2); censored 10 never dies
    df = _sess(spark, [(5, False), (5, False), (8, False), (10, True)])
    out = {r.t_sec: r for r in kaplan_meier(df).collect()}
    assert set(out) == {5, 8}
    assert (out[5].n_at_risk, out[5].n_deaths) == (4, 2)
    assert abs(out[5].survival - 0.5) < 1e-9
    assert (out[8].n_at_risk, out[8].n_deaths) == (2, 1)
    assert abs(out[8].survival - 0.25) < 1e-9


def test_km_censored_only_durations_not_emitted_but_shrink_risk(spark):
    # censoring at 3 removes a subject from the risk set at 7
    df = _sess(spark, [(3, True), (7, False), (7, False)])
    out = kaplan_meier(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.t_sec, r.n_at_risk, r.n_deaths) == (7, 2, 2)
    assert r.survival == 0.0  # everyone at risk dies: terminal zero


def test_km_all_die_at_once_zero_survival(spark):
    df = _sess(spark, [(3, False), (3, False)])
    [r] = kaplan_meier(df).collect()
    assert r.survival == 0.0 and r.n_at_risk == 2 and r.n_deaths == 2


def test_km_no_censoring_matches_complement_ecdf(spark):
    durs = [1, 2, 2, 3, 5, 5, 5, 9]
    df = _sess(spark, [(d, False) for d in durs])
    out = sorted(kaplan_meier(df).collect(), key=lambda r: r.t_sec)
    n = len(durs)
    for r in out:
        frac_alive = sum(1 for d in durs if d > r.t_sec) / n
        assert abs(r.survival - frac_alive) < 1e-9
