"""Geodesy operator semantics: polynomial accuracy + spherical sanity.

The cross-engine hash-match is covered by test_entry_oracle; these pin that
the fixed-polynomial trig is actually RIGHT (not merely consistent) against
libm and known geodesy constants (reference scale_analyzer.py:147-167).
"""

from __future__ import annotations

import math

import pytest

from uncharted_ta1_spark.operators import geodesy


def test_cos_poly_matches_libm_within_2e13(spark):
    """The 8-term Horner cosine must track math.cos to <5e-13 over the
    +/-85 degree latitude band the operators use."""
    xs = [i / 100.0 for i in range(-149, 150)]  # +/-1.49 rad ~ 85.4 deg
    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "i int, x double")
    from pyspark.sql import functions as F

    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", F.expr(geodesy.cos_poly_sql("x")).alias("c")
        ).collect()
    }
    for i, x in rows:
        assert got[i] == pytest.approx(math.cos(x), abs=5e-13)


def test_deg_per_km_matches_spherical_arc(spark):
    """1 km of latitude is ~1/111.195 deg everywhere; 1 km of longitude at
    60N is ~twice the equatorial value (cos 60 = 0.5)."""
    df = spark.createDataFrame([(0.0,), (60.0,)], "lat double")
    out = {
        r["lat"]: (r["lat_per_km"], r["lon_per_km"])
        for r in geodesy.with_deg_per_km(df, lat_col="lat").collect()
    }
    assert out[0.0][0] == pytest.approx(1 / 111.195, rel=1e-4)
    assert out[0.0][1] == pytest.approx(1 / 111.195, rel=1e-4)
    assert out[60.0][1] == pytest.approx(2 * out[0.0][1], rel=1e-6)


def test_equirect_km_known_distance(spark):
    """Paris (48.8566N, 2.3522E) to Orleans-ish 1 degree south: ~111.2 km of
    latitude; and a pure-longitude degree at 48.86N ~ 73.2 km."""
    df = spark.createDataFrame([(1,)], "i int")
    from pyspark.sql import functions as F

    r = df.select(
        F.expr(geodesy.equirect_km_sql("48.8566e0", "2.3522e0", "47.8566e0", "2.3522e0")).alias("d_lat"),
        F.expr(geodesy.equirect_km_sql("48.8566e0", "2.3522e0", "48.8566e0", "3.3522e0")).alias("d_lon"),
    ).collect()[0]
    assert r["d_lat"] == pytest.approx(111.195, rel=1e-3)
    assert r["d_lon"] == pytest.approx(111.195 * math.cos(math.radians(48.8566)), rel=1e-3)


def test_geodesic_rmse_zero_for_identical_points(spark):
    df = spark.createDataFrame(
        [("u1", 10.0, 20.0), ("u1", 11.0, 21.0)],
        "user_id string, lat double, lon double",
    )
    out = geodesy.geodesic_rmse(
        df, keys=["user_id"], lat_pred="lat", lon_pred="lon",
        lat_truth="lat", lon_truth="lon",
    ).collect()[0]
    assert out["rmse_km"] == 0.0
    assert out["match_rate"] == 1.0
    assert out["n_pts"] == 2
