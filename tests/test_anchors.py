"""Anchor-synthesis semantics on hand-built groups with known answers
(reference finalize_coordinates.py:30-230)."""

from __future__ import annotations

import pytest

from uncharted_ta1_spark.operators.anchors import synthesize_anchors


def _coords(spark, rows):
    return spark.createDataFrame(
        rows, "grp string, id long, pi long, pj long, deg int"
    )


@pytest.fixture(scope="module")
def result(spark):
    rows = [
        # g_colinear: 4 points nearly on the i-axis (j range 40, i range 9000
        # -> 40*20=800 < 9000 => colinear) with slope ~0
        ("g_colinear", 1, 100, 5000, 10),
        ("g_colinear", 2, 3000, 5010, 20),
        ("g_colinear", 3, 6000, 5030, 30),
        ("g_colinear", 4, 9100, 5040, 40),
        # g_two: exactly 2 distinct points, NOT colinear (j range dominates)
        ("g_two", 5, 1000, 1000, 11),
        ("g_two", 6, 1400, 9000, 22),
        # g_wide: well-spread, no synthesis
        ("g_wide", 7, 100, 100, 1),
        ("g_wide", 8, 5000, 7000, 2),
        ("g_wide", 9, 9000, 2000, 3),
        # g_single: one point, no rules apply
        ("g_single", 10, 42, 42, 5),
    ]
    df = synthesize_anchors(_coords(spark, rows), keys=["grp"])
    return df.toPandas(), rows


def test_originals_always_pass_through(result):
    out, rows = result
    orig = out[~out.is_synthetic]
    assert len(orig) == len(rows)
    assert (orig.confidence == 1.0).all()


def test_colinear_group_gets_far_j_anchor(result):
    out, _ = result
    s = out[(out.grp == "g_colinear") & out.is_synthetic]
    assert len(s) == 1
    r = s.iloc[0]
    # first point is (100, 5000, deg 10); f_j=5000 <= 6000 -> far bound 12000
    assert r.pj == 12000
    assert r.deg == 10
    assert r.id == -1 and r.confidence == 0.5
    # slope ~ 0.0044 -> offset = trunc(m * (5000 - 12000)) ~ -31
    assert 0 <= r.pi < 100  # pulled left of the first point, clamped >= 0


def test_two_point_group_gets_third_anchor(result):
    out, _ = result
    s = out[(out.grp == "g_two") & out.is_synthetic]
    assert len(s) == 1
    r = s.iloc[0]
    # first point (1000, 1000): pi+1, far j bound (1000 <= 6000 -> 12000)
    assert r.pi == 1001 and r.pj == 12000 and r.deg == 11


def test_healthy_and_degenerate_groups_unchanged(result):
    out, _ = result
    assert out[(out.grp == "g_wide") & out.is_synthetic].empty
    assert out[(out.grp == "g_single") & out.is_synthetic].empty
