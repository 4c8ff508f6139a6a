"""Georeference composite semantics: project / fallback / confidence / score.

Reference behaviors under test (tasks/geo_referencing/georeference.py):
- :228-275 probe projection through the fitted affine + ±1px companions
- :391-429 clue-midpoint fallback at confidence 0 when no model exists
- :431-475 RMSE of geodesic error km, -1 sentinel with no truth points
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.georef import (
    georef_answers,
    georef_doc_scores,
)

GCP_SCHEMA = "doc long, event_id long, px long, py long, wx long, wy long"
PROBE_SCHEMA = "doc long, probe_id long, qpx long, qpy long, gt_wx long, gt_wy long"


def _gcps(spark):
    # doc 1: exact plane wx = 2*px + 1*py + 10, wy = -1*px + 3*py + 5 (4 pts)
    # doc 2: only 2 GCPs -> degenerate (min_gcps=3)
    rows = []
    for i, (px, py) in enumerate([(0, 0), (10, 0), (0, 10), (7, 3)]):
        rows.append((1, i, px, py, 2 * px + py + 10, -px + 3 * py + 5))
    rows += [(2, 10, 0, 0, 100, 200), (2, 11, 5, 5, 150, 260)]
    return spark.createDataFrame(rows, GCP_SCHEMA)


def _probes(spark):
    return spark.createDataFrame(
        [
            # doc 1, exact model: truth ON the plane -> error 0
            (1, 100, 4, 6, 2 * 4 + 6 + 10, -4 + 3 * 6 + 5),
            # doc 1, no truth
            (1, 101, 2, 2, None, None),
            # doc 2 (degenerate): falls back to doc clue midpoint
            (2, 102, 3, 3, 130, 230),
            # doc 9 (no GCPs at all): global clue midpoint
            (9, 103, 1, 1, 50, 60),
        ],
        PROBE_SCHEMA,
    )


def test_fitted_doc_projects_exactly(spark):
    out = georef_answers(_gcps(spark), _probes(spark)).collect()
    by_id = {r.probe_id: r for r in out}
    r = by_id[100]
    assert not r.used_fallback
    # noiseless GCPs -> exact recovery -> prediction == truth -> error 0
    assert r.lon_pred == pytest.approx((2 * 4 + 6 + 10) / 20.0, abs=1e-12)
    assert r.lat_pred == pytest.approx((-4 + 3 * 6 + 5) / 20.0, abs=1e-12)
    assert r.error_km == pytest.approx(0.0, abs=1e-6)
    # ±1px finite difference: |a|/20 deg of longitude ~ 2/20 deg -> ~11 km
    assert r.dist_xp_km > 1.0
    assert r.confidence > 0.0
    # truth-free probe: error NULL, same confidence
    assert by_id[101].error_km is None
    assert by_id[101].confidence == by_id[100].confidence


def test_degenerate_doc_falls_back_to_doc_clue_midpoint(spark):
    out = {r.probe_id: r for r in georef_answers(_gcps(spark), _probes(spark)).collect()}
    r = out[102]
    assert r.used_fallback and r.confidence == 0.0
    # doc 2 clue window: wx in [100,150], wy in [200,260] -> mid (125, 230)
    assert r.lon_pred == pytest.approx(125 / 20.0, abs=1e-12)
    assert r.lat_pred == pytest.approx(230 / 20.0, abs=1e-12)
    # the xp/yp companions collapse onto the clue point (reference
    # _add_fallback sets lonlat_xp = lonlat) -> zero finite-difference dist
    assert r.dist_xp_km == pytest.approx(0.0, abs=1e-12)
    assert r.dist_yp_km == pytest.approx(0.0, abs=1e-12)


def test_missing_doc_falls_back_to_global_clue_midpoint(spark):
    out = {r.probe_id: r for r in georef_answers(_gcps(spark), _probes(spark)).collect()}
    r = out[103]
    assert r.used_fallback and r.confidence == 0.0
    # global clue window recomputed from the fixture (all docs' GCPs)
    gx = [2 * px + py + 10 for px, py in [(0, 0), (10, 0), (0, 10), (7, 3)]] + [100, 150]
    gy = [-px + 3 * py + 5 for px, py in [(0, 0), (10, 0), (0, 10), (7, 3)]] + [200, 260]
    assert r.lon_pred == pytest.approx(abs((min(gx) + max(gx)) / 2.0) / 20.0, abs=1e-12)
    assert r.lat_pred == pytest.approx(abs((min(gy) + max(gy)) / 2.0) / 20.0, abs=1e-12)


def test_rmse_rollup_sentinel_and_counts(spark):
    probes = spark.createDataFrame(
        [
            (1, 100, 4, 6, 2 * 4 + 6 + 10, -4 + 3 * 6 + 5),
            (1, 101, 2, 2, None, None),
            # doc 2: ONLY truth-free probes -> -1 sentinel
            (2, 102, 3, 3, None, None),
            (2, 103, 1, 1, None, None),
        ],
        PROBE_SCHEMA,
    )
    out = {r.doc: r for r in georef_doc_scores(_gcps(spark), probes).collect()}
    assert out[1].n_probes == 2 and out[1].n_truth == 1
    assert out[1].rmse_km == pytest.approx(0.0, abs=1e-6)
    assert out[1].n_within_5km == 1
    assert out[2].n_truth == 0
    assert out[2].rmse_km == -1.0  # the :470 sentinel
    assert out[2].n_fallback == 2


def test_plan_probe_side_never_shuffles(spark):
    """Probes join params/clue via broadcast only: no SortMergeJoin, no
    shuffle of the probe relation (the 100-TB contract: only the much
    smaller GCP table aggregates)."""
    df = georef_answers(_gcps(spark), _probes(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
