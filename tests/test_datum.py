"""Abridged-Molodensky datum shift: magnitude and structure sanity
(georeference.py:162-174 analog).  Cross-engine equality is covered by the
entry oracle; these pin the physics."""

from __future__ import annotations

from uncharted_ta1_spark.operators import datum


def _shift(spark, pts, **kw):
    df = spark.createDataFrame(pts, "lat double, lon double")
    return datum.with_datum_shift(df, lat_col="lat", lon_col="lon", **kw).select(
        "lat", "lon", "lat_shifted", "lon_shifted"
    ).collect()


def test_conus_shift_is_tens_of_meters(spark):
    """NAD27->WGS84 over CONUS moves points by roughly 10-100 m, never km."""
    pts = [(39.0, -77.0), (34.0, -118.0), (41.9, -87.6), (29.8, -95.4)]
    for r in _shift(spark, pts):
        dlat_m = abs(r.lat_shifted - r.lat) * 111_195
        dlon_m = abs(r.lon_shifted - r.lon) * 111_195
        assert 0.1 < dlat_m < 300, (r.lat, r.lon, dlat_m)
        assert 0.1 < dlon_m < 300, (r.lat, r.lon, dlon_m)


def test_zero_offsets_still_shift_via_ellipsoid_change(spark):
    """With dx=dy=dz=0 the ellipsoid difference (da, df) alone produces a
    latitude-dependent shift that vanishes at the equator (sin 2phi = 0)."""
    rows = _shift(spark, [(0.0, 10.0), (45.0, 10.0)], dx=0.0, dy=0.0, dz=0.0)
    eq, mid = rows[0], rows[1]
    assert abs(eq.lat_shifted - eq.lat) < 1e-9
    assert abs(mid.lat_shifted - mid.lat) > 1e-4  # ~hundreds of meters


def test_longitude_sign_symmetry(spark):
    """dlam depends on lon through sin/cos only: shifting at +lon and -lon
    with dy=0 gives mirrored longitude deltas."""
    rows = _shift(spark, [(40.0, 60.0), (40.0, -60.0)], dy=0.0)
    d1 = rows[0].lon_shifted - rows[0].lon
    d2 = rows[1].lon_shifted - rows[1].lon
    assert abs(d1 + d2) < 1e-12
