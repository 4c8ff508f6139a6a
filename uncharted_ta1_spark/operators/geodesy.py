"""Geodesic scalar math (C6): degrees-per-km resolution + geodesic error.

Reference analogs:
- ``tasks/geo_referencing/scale_analyzer.py:147-167`` ``calc_deg_per_km`` —
  geopy geodesic destination 1 km north / east of a lon/lat point, returning
  (lon_per_km, lat_per_km) degree resolutions.
- ``eval/18month_eval/eval_utils.py:8-41`` ``score_query_points`` — RMSE of
  the per-point geodesic error distance in KM between predicted and truth
  coordinates.

Spark-first recast: both are closed-form SPHERICAL approximations (mean
Earth radius R = 6371.0088 km) as pure column arithmetic — no geopy, no UDF,
fully pushdown-friendly.  ``deg_per_km`` follows from arc length on the
sphere (1 km north = (1/R) rad of latitude; 1 km east = 1/(R·cos φ) rad of
longitude); the error distance uses the equirectangular approximation
d = R·sqrt(Δφ² + (cos φm·Δλ)²), accurate to <0.5% at the sub-degree deltas
an eval join compares (the reference's WGS-84 geodesic differs from the
sphere by <0.6% anyway).

Cross-engine bit-exactness: JVM ``Math.cos`` and DuckDB's libm ``cos`` are
each only 1-ulp-accurate and NOT guaranteed to agree, so cos is evaluated as
a FIXED 8-term Taylor/Horner polynomial (max truncation error <5e-13 for
|φ| <= 85°) written once as a SQL text fragment: the Spark side runs it via
``F.expr`` and the DuckDB oracle embeds the identical text, so every
intermediate is the same IEEE-754 +,*,/ tree in both engines.  sqrt is
IEEE-correctly-rounded in both.  All numeric literals carry an ``e0``
exponent so both parsers type them DOUBLE (Spark types a bare ``0.5`` as
DECIMAL).  For aggregation (RMSE), distances are quantized to integer
micro-km (``floor(d*1e6 + 0.5)``) so group sums are exact integers —
order-independent — and the final rmse is one fixed float tree over them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = "6371.0088e0"  # IUGG mean Earth radius
DEG2RAD = "1.7453292519943295e-2"  # pi / 180
RAD2DEG = "5.729577951308232e1"  # 180 / pi


def cos_poly_sql(x: str) -> str:
    """cos(x) as a fixed 8-term Taylor series in Horner form — pure IEEE
    +,-,* so the identical text evaluates bit-identically in Spark SQL and
    DuckDB.  Valid for |x| <= ~1.49 rad (85°); truncation error < 5e-13."""
    x2 = f"(({x}) * ({x}))"
    return (
        f"(1.0e0 - {x2} * (0.5e0 - {x2} * (4.1666666666666664e-2 - {x2} * "
        f"(1.388888888888889e-3 - {x2} * (2.48015873015873e-5 - {x2} * "
        f"(2.755731922398589e-7 - {x2} * (2.08767569878681e-9 - {x2} * "
        f"(1.1470745597729725e-11 - {x2} * 4.779477332387385e-14))))))))"
    )


def sin_poly_sql(x: str) -> str:
    """sin(x) as a fixed 8-term Taylor series in Horner form — same
    cross-engine bit-exactness contract as :func:`cos_poly_sql`.  Valid for
    |x| <= ~1.49 rad; truncation error < 3e-12."""
    x2 = f"(({x}) * ({x}))"
    return (
        f"(({x}) * (1.0e0 - {x2} * (1.6666666666666666e-1 - {x2} * "
        f"(8.333333333333333e-3 - {x2} * (1.984126984126984e-4 - {x2} * "
        f"(2.7557319223985893e-6 - {x2} * (2.505210838544172e-8 - {x2} * "
        f"(1.6059043836821613e-10 - {x2} * 7.647163731819816e-13))))))))"
    )


def lat_per_km_sql() -> str:
    """Degrees of latitude per km: (180/pi)/R — constant on the sphere."""
    return f"({RAD2DEG} / {EARTH_RADIUS_KM})"


def lon_per_km_sql(lat_deg: str) -> str:
    """Degrees of longitude per km at latitude ``lat_deg`` (degrees):
    (180/pi) / (R * cos(lat))."""
    return (
        f"({RAD2DEG} / ({EARTH_RADIUS_KM} * "
        f"{cos_poly_sql(f'({lat_deg}) * {DEG2RAD}')}))"
    )


def equirect_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Equirectangular distance in km between two lon/lat points (degrees):
    R * sqrt(dlat² + (cos(mean_lat) * dlon)²)."""
    dlat = f"((({lat2}) - ({lat1})) * {DEG2RAD})"
    dlon = f"((({lon2}) - ({lon1})) * {DEG2RAD})"
    mlat = f"((({lat1}) + ({lat2})) * 0.5e0 * {DEG2RAD})"
    cosm = cos_poly_sql(mlat)
    return (
        f"({EARTH_RADIUS_KM} * sqrt({dlat} * {dlat} + "
        f"({cosm} * {dlon}) * ({cosm} * {dlon})))"
    )


def dist_ukm_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The distance quantized to integer micro-km: exact, summable in any
    order (the aggregation-safety contract of this module)."""
    return (
        f"CAST(floor({equirect_km_sql(lat1, lon1, lat2, lon2)} * 1e6 + 0.5e0) "
        f"AS BIGINT)"
    )


def with_deg_per_km(df: DataFrame, *, lat_col: str) -> DataFrame:
    """Append (lon_per_km, lat_per_km) degree-resolution columns — the
    scale_analyzer.calc_deg_per_km analog, vectorized over the whole frame.
    Only latitude enters: on the sphere the resolution is longitude-free."""
    return df.withColumn(
        "lat_per_km", F.expr(lat_per_km_sql())
    ).withColumn("lon_per_km", F.expr(lon_per_km_sql(lat_col)))


def with_geodesic_error_km(
    df: DataFrame,
    *,
    lat_pred: str,
    lon_pred: str,
    lat_truth: str,
    lon_truth: str,
) -> DataFrame:
    """Append ``dist_km`` (double) and ``dist_ukm`` (exact BIGINT micro-km)
    per-point geodesic error columns — the eval_utils.score_query_points
    per-gcp error, as pure column arithmetic."""
    return df.withColumn(
        "dist_km", F.expr(equirect_km_sql(lat_pred, lon_pred, lat_truth, lon_truth))
    ).withColumn(
        "dist_ukm", F.expr(dist_ukm_sql(lat_pred, lon_pred, lat_truth, lon_truth))
    )


def geodesic_rmse(
    df: DataFrame,
    *,
    keys: list[str],
    lat_pred: str,
    lon_pred: str,
    lat_truth: str,
    lon_truth: str,
    buffer_km: float = 5.0,
) -> DataFrame:
    """Per-group geodesic eval: n points, RMSE of the error distance in km,
    and the fraction of points within ``buffer_km`` (the buffered-matching
    criterion of A9/J10, now dimensionally in km).

    The group sum runs over the exact integer ``dist_ukm²`` so it is
    order-independent; rmse_km and match_rate are fixed float trees over
    those integers (bit-identical to the DuckDB oracle's identical text).
    """
    d = with_geodesic_error_km(
        df,
        lat_pred=lat_pred,
        lon_pred=lon_pred,
        lat_truth=lat_truth,
        lon_truth=lon_truth,
    )
    buf_ukm = int(round(buffer_km * 1_000_000))
    agg = d.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_pts"),
        F.sum(F.col("dist_ukm") * F.col("dist_ukm")).cast("long").alias("_sd2"),
        F.sum(
            F.when(F.col("dist_ukm") <= F.lit(buf_ukm), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("_matched"),
    )
    # raw doubles, not rounded: the inputs are exact integers and the trees
    # are shared-text, so both engines emit identical bits; engine round()
    # itself diverges at decimal ties and is the only hazard to avoid
    return agg.select(
        *keys,
        "n_pts",
        F.expr("sqrt(CAST(_sd2 AS DOUBLE) / CAST(n_pts AS DOUBLE)) / 1e6")
        .alias("rmse_km"),
        F.expr("CAST(_matched AS DOUBLE) / CAST(n_pts AS DOUBLE)")
        .alias("match_rate"),
    )
