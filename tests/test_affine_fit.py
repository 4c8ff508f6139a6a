"""affine_fit vs numpy least squares, incl. degenerate groups."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from uncharted_ta1_spark.operators.affinefit import affine_fit


def _fit_rows(spark, rows):
    df = spark.createDataFrame(
        rows, "doc long, px long, py long, wx long, wy long"
    )
    return {r.doc: r for r in affine_fit(df, keys=["doc"]).collect()}


def _np_affine(pts):
    a = np.array([[px, py, 1.0] for px, py, _, _ in pts])
    bx = np.array([wx for _, _, wx, _ in pts], dtype=float)
    by = np.array([wy for _, _, _, wy in pts], dtype=float)
    cx, *_ = np.linalg.lstsq(a, bx, rcond=None)
    cy, *_ = np.linalg.lstsq(a, by, rcond=None)
    rx = bx - a @ cx
    ry = by - a @ cy
    return cx, cy, np.sqrt((rx**2).mean()), np.sqrt((ry**2).mean())


def test_exact_affine_recovered(spark):
    # noiseless data from a known affine must be recovered exactly-ish
    pts = [(px, py, 3 * px - 2 * py + 7, -px + 4 * py + 1)
           for px in (0, 5, 11, 23) for py in (2, 9, 17)]
    rows = [(1, *p) for p in pts]
    r = _fit_rows(spark, rows)[1]
    assert not r.degenerate
    got = (r.a, r.b, r.c, r.d, r.e, r.f)
    assert np.allclose(got, (3, -2, 7, -1, 4, 1), atol=1e-9)
    assert r.rmse_x == pytest.approx(0.0, abs=1e-9)


def test_degenerate_groups_flagged(spark):
    rows = (
        # n < 3
        [(1, 0, 0, 1, 1), (1, 5, 5, 2, 2)]
        # collinear: px == py for every point -> singular normal matrix
        + [(2, t, t, 2 * t + 1, t - 4) for t in range(6)]
        # healthy control group
        + [(3, px, py, px + py, px - py)
           for px in (0, 7, 19) for py in (1, 8)]
    )
    r = _fit_rows(spark, rows)
    assert r[1].degenerate and r[1].a is None and r[1].rmse_x is None
    assert r[2].degenerate and r[2].a is None
    assert not r[3].degenerate and r[3].a is not None


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 60), st.integers(0, 60),
            st.integers(-500, 500), st.integers(-500, 500),
        ),
        min_size=3,
        max_size=25,
        unique_by=lambda p: (p[0], p[1]),
    )
)
def test_property_matches_numpy_lstsq(spark, pts):
    rows = [(7, *p) for p in pts]
    r = _fit_rows(spark, rows)[7]
    cx, cy, rmx, rmy = _np_affine(pts)
    a = np.array([[px, py, 1.0] for px, py, _, _ in pts])
    # numpy lstsq handles rank deficiency by min-norm; only compare where
    # the normal matrix is genuinely well-conditioned
    if r.degenerate or np.linalg.matrix_rank(a) < 3:
        return
    assert np.allclose((r.a, r.b, r.c), cx, rtol=1e-6, atol=1e-6)
    assert np.allclose((r.d, r.e, r.f), cy, rtol=1e-6, atol=1e-6)
    # rmse via the one-pass identity RSS = sww - a*sxw - b*syw - c*sw has a
    # cancellation floor of ~sqrt(eps * |sww| / n) ~ 1e-5 for near-exact
    # fits; cross-engine it is still bit-identical (the shared tree), so the
    # loose abs tolerance is only vs numpy's two-pass residual sum
    assert r.rmse_x == pytest.approx(rmx, rel=1e-6, abs=1e-4)
    assert r.rmse_y == pytest.approx(rmy, rel=1e-6, abs=1e-4)
