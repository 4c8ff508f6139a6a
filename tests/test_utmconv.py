"""UTM conversion accuracy against published reference values
(the public `utm` package's own README example and zone-exception rules)."""

from __future__ import annotations

import pytest

from uncharted_ta1_spark.operators import utmconv


def _convert(spark, pts):
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = utmconv.with_utm(df, lat_col="lat", lon_col="lon")
    return out.select(
        "lat", "lon", "utm_zone", "utm_easting", "utm_northing", "is_northern"
    ).collect()


def test_utm_package_readme_anchor(spark):
    """utm.from_latlon(51.2, 7.5) == (395201.3103811303, 5673135.241182375,
    32, 'U') — the utm package's documented example.  The fixed-polynomial
    trig tracks the libm-based reference to sub-mm."""
    r = _convert(spark, [(51.2, 7.5)])[0]
    assert r.utm_zone == 32
    assert r.utm_easting == pytest.approx(395201.3103811303, abs=1e-3)
    assert r.utm_northing == pytest.approx(5673135.241182375, abs=1e-3)
    assert r.is_northern


def test_southern_hemisphere_false_northing(spark):
    r = _convert(spark, [(-33.92, 18.42)])[0]
    assert r.utm_zone == 34
    assert not r.is_northern
    # false northing applied: northing measured from 10,000 km
    assert 6_000_000 < r.utm_northing < 7_000_000


def test_zone_exceptions_norway_svalbard(spark):
    rows = _convert(
        spark,
        [
            (60.0, 5.0),   # Norway 32V exception (would be 31 by formula)
            (75.0, 15.0),  # Svalbard: 33X
            (75.0, 25.0),  # Svalbard: 35X
            (75.0, 35.0),  # Svalbard: 37X
            (40.0, 5.0),   # no exception: plain zone 31
        ],
    )
    assert [r.utm_zone for r in rows] == [32, 33, 35, 37, 31]


def test_easting_within_zone_bounds(spark):
    """Eastings must stay inside (100km, 900km) for in-band latitudes."""
    pts = [(lat, lon) for lat in (-60.0, -10.0, 10.0, 60.0)
           for lon in (-179.0, -91.5, 0.5, 120.7)]
    for r in _convert(spark, pts):
        assert 100_000 < r.utm_easting < 900_000


def test_roundtrip_closes(spark):
    """from_latlon then to_latlon must recover the input to ~1e-6 deg
    (sub-meter) across hemispheres, zone edges, and the Svalbard band."""
    pts = [(51.2, 7.5), (-33.92, 18.42), (75.0, 25.0), (0.5, -0.5),
           (-79.5, 179.5), (83.9, -120.3)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    fwd = utmconv.with_utm(df, lat_col="lat", lon_col="lon").select(
        "lat", "lon", "utm_zone", "utm_easting", "utm_northing", "is_northern"
    )
    rt = utmconv.with_latlon(
        fwd, easting_col="utm_easting", northing_col="utm_northing",
        zone_col="utm_zone", northern_col="is_northern",
    )
    for r in rt.select("lat", "lon", "lat_deg", "lon_deg").collect():
        assert abs(r.lat - r.lat_deg) < 1e-6, (r.lat, r.lat_deg)
        assert abs(r.lon - r.lon_deg) < 1e-6, (r.lon, r.lon_deg)
