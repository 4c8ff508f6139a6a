"""Semantics of the deterministic RANSAC analog (fit -> reject -> refit).

Reference behavior being modeled (tasks/geo_referencing/outlier_filter.py:
190-261): robust regression flags outlier coords but KEEPS them (moved to an
excluded map, not deleted), and the returned slope comes from the refit on
inliers.  These tests pin the Spark operator's semantics on hand-built
contaminated groups where the right answer is known in closed form.
"""

from __future__ import annotations

import pytest

from uncharted_ta1_spark.operators.groupfit import (
    fit_residual_outliers,
    group_fit,
    ransac_refit_outliers,
)


def _seq_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, seq_no int, event_epoch long, n_tok int"
    )


@pytest.fixture(scope="module")
def contaminated(spark):
    """One group on an exact line n_tok = 10 + 2*t with two gross outliers
    injected (40% contamination at the tail), plus a clean group and a
    degenerate single-row group."""
    rows = []
    # group A: 8 clean points on the line, 2 gross outliers
    for i in range(8):
        rows.append(("d1", "s", i, 1000 + i * 10, 10 + 2 * i * 10))
    rows.append(("d1", "s", 8, 1000 + 80, 9000))
    rows.append(("d1", "s", 9, 1000 + 90, -4000 + 8192))  # second outlier
    # group B: clean line, no outliers
    for i in range(5):
        rows.append(("d2", "s", i, 2000 + i * 7, 100 + 3 * i * 7))
    # group C: degenerate (single row, no fit)
    rows.append(("d3", "s", 0, 5000, 42))
    return rows


def test_flag_dont_delete(spark, contaminated):
    out = ransac_refit_outliers(_seq_df(spark, contaminated)).toPandas()
    # every input row survives — outliers are flagged, never dropped
    assert len(out) == len(contaminated)


def test_refit_recovers_true_line_under_contamination(spark, contaminated):
    """The one-shot fit is dragged by the outliers; the refit must land back
    on the true line so the 8 clean points get ~0 residuals."""
    df = _seq_df(spark, contaminated)
    one_shot = fit_residual_outliers(df).toPandas()
    refit = ransac_refit_outliers(df).toPandas()

    a1 = one_shot[one_shot.doc_id == "d1"].set_index("seq_no")
    a2 = refit[refit.doc_id == "d1"].set_index("seq_no")
    clean = list(range(8))
    # after refit, clean-point residuals shrink vs the contaminated fit
    assert a2.loc[clean, "resid"].abs().max() < a1.loc[clean, "resid"].abs().max()
    # and the refit flags at least one of the injected outliers
    assert bool(a2.loc[[8, 9], "is_outlier"].any())
    assert bool(a2["used_refit"].all())


def test_clean_group_unchanged(spark, contaminated):
    """A group with zero contamination must keep all rows as inliers and
    produce the same fit in both rounds (exact line -> zero residuals)."""
    out = ransac_refit_outliers(_seq_df(spark, contaminated)).toPandas()
    b = out[out.doc_id == "d2"]
    assert (b["n_inliers"] == 5).all()
    assert not b["is_outlier"].any()
    assert b["resid"].abs().max() == 0.0


def test_degenerate_group_null_resid_no_flag(spark, contaminated):
    out = ransac_refit_outliers(_seq_df(spark, contaminated)).toPandas()
    c = out[out.doc_id == "d3"]
    assert len(c) == 1
    assert c["resid"].isna().all()
    assert not c["is_outlier"].any()
    assert not c["used_refit"].any()
    assert (c["n_inliers"] == 1).all()


def test_matches_group_fit_params_on_inliers(spark, contaminated):
    """used_refit groups' residuals must equal residuals computed from a
    group_fit run over ONLY the surviving inliers (round-1 model == the
    closed-form fit of the inlier subset)."""
    df = _seq_df(spark, contaminated)
    refit = ransac_refit_outliers(df).toPandas()
    a = refit[refit.doc_id == "d1"]
    inlier_seq = a.loc[~a["is_outlier"], "seq_no"]
    # recompute the fit over the round-0 inlier subset
    one_shot = fit_residual_outliers(df).toPandas()
    r0_in = one_shot[(one_shot.doc_id == "d1")
                     & (~one_shot["is_outlier"])]["seq_no"].tolist()
    sub = [r for r in contaminated if r[0] == "d1" and r[2] in r0_in]
    params = group_fit(_seq_df(spark, sub)).toPandas().iloc[0]
    x0, m, b = int(params["x0"]), params["slope"], params["intercept"]
    for row in contaminated:
        if row[0] != "d1":
            continue
        expect = row[4] - (b + m * float(row[3] - x0))
        got = float(a.loc[a.seq_no == row[2], "resid"].iloc[0])
        assert got == pytest.approx(expect, abs=1e-9)
