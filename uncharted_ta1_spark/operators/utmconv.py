"""UTM zone + projection math (C4): lat/lon -> (zone, easting, northing).

Reference analog: ``tasks/geo_referencing/utm_extractor.py`` (imports the
``utm`` package at :5 and converts at :168-175, :214, :332+ via
``utm.from_latlon`` / ``utm.to_latlon``).  The regex half of C4 is covered
by ``scalar_extract``; this module supplies the missing conversion
arithmetic — the standard Snyder/Krüger transverse-Mercator series that the
public ``utm`` package implements (WGS-84: a = 6378137 m, e² = 0.00669438,
k0 = 0.9996), including the Norway (32V) and Svalbard (31X/33X/35X/37X)
zone exceptions and the 10,000 km southern-hemisphere false northing.

Spark-first: the whole conversion is pure column arithmetic — no ``utm``
import, no pandas UDF, fully codegen'd JVM-side.  Cross-engine
bit-exactness follows the geodesy.py scheme: sin/cos of latitude come from
fixed Horner polynomials, the series' sin(2φ)/sin(4φ)/sin(6φ) terms from
double-angle/addition recurrences (pure +,*), and every stage is a named
column whose defining SQL TEXT is shared verbatim between the Spark plan
(``F.expr`` per stage) and the DuckDB oracle (nested SELECT per stage) — so
both engines evaluate the identical IEEE-754 tree and hash-match exactly.
Valid for the UTM latitude band (-80°, 84°].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.geodesy import (
    DEG2RAD,
    cos_poly_sql,
    sin_poly_sql,
)

# WGS-84 constants, composed as literal arithmetic so both engines fold the
# identical IEEE ops (never pre-evaluated in Python)
_R = "6378137.0e0"
_K0 = "0.9996e0"
_E = "6.69438e-3"
_E2 = f"({_E} * {_E})"
_E3 = f"({_E2} * {_E})"
_EP2 = f"({_E} / (1.0e0 - {_E}))"
_M1 = f"(1.0e0 - {_E} / 4.0e0 - 3.0e0 * {_E2} / 64.0e0 - 5.0e0 * {_E3} / 256.0e0)"
_M2 = f"(3.0e0 * {_E} / 8.0e0 + 3.0e0 * {_E2} / 32.0e0 + 45.0e0 * {_E3} / 1024.0e0)"
_M3 = f"(15.0e0 * {_E2} / 256.0e0 + 45.0e0 * {_E3} / 1024.0e0)"
_M4 = f"(35.0e0 * {_E3} / 3072.0e0)"


def zone_sql(lat: str, lon: str) -> str:
    """UTM zone number with the utm-package's Norway/Svalbard exceptions."""
    return (
        f"(CASE WHEN ({lat}) >= 56.0e0 AND ({lat}) < 64.0e0 "
        f"AND ({lon}) >= 3.0e0 AND ({lon}) < 12.0e0 THEN 32 "
        f"WHEN ({lat}) >= 72.0e0 AND ({lat}) <= 84.0e0 AND ({lon}) >= 0.0e0 "
        f"AND ({lon}) < 9.0e0 THEN 31 "
        f"WHEN ({lat}) >= 72.0e0 AND ({lat}) <= 84.0e0 AND ({lon}) >= 9.0e0 "
        f"AND ({lon}) < 21.0e0 THEN 33 "
        f"WHEN ({lat}) >= 72.0e0 AND ({lat}) <= 84.0e0 AND ({lon}) >= 21.0e0 "
        f"AND ({lon}) < 33.0e0 THEN 35 "
        f"WHEN ({lat}) >= 72.0e0 AND ({lat}) <= 84.0e0 AND ({lon}) >= 33.0e0 "
        f"AND ({lon}) < 42.0e0 THEN 37 "
        f"ELSE CAST(floor((({lon}) + 180.0e0) / 6.0e0) AS INT) + 1 END)"
    )


def utm_stages(lat: str, lon: str) -> list[tuple[str, str]]:
    """Ordered (column, defining-SQL) stages of the conversion.  Later
    stages reference earlier column names; applying them in order via
    withColumn (Spark) or nested SELECT (DuckDB) yields the identical tree.
    Final columns: utm_zone INT, utm_easting, utm_northing DOUBLE (meters),
    is_northern BOOLEAN."""
    return [
        ("utm_zone", zone_sql(lat, lon)),
        ("phi", f"({lat}) * {DEG2RAD}"),
        ("lam0", f"CAST((utm_zone - 1) * 6 - 177 AS DOUBLE) * {DEG2RAD}"),
        ("lam", f"({lon}) * {DEG2RAD}"),
        ("s_phi", sin_poly_sql("phi")),
        ("c_phi", cos_poly_sql("phi")),
        ("t_phi", "s_phi / c_phi"),
        ("tt2", "t_phi * t_phi"),
        ("sin2p", "2.0e0 * s_phi * c_phi"),
        ("cos2p", "1.0e0 - 2.0e0 * s_phi * s_phi"),
        ("sin4p", "2.0e0 * sin2p * cos2p"),
        ("cos4p", "1.0e0 - 2.0e0 * sin2p * sin2p"),
        ("sin6p", "sin4p * cos2p + cos4p * sin2p"),
        ("nn", f"{_R} / sqrt(1.0e0 - {_E} * s_phi * s_phi)"),
        ("cc", f"{_EP2} * c_phi * c_phi"),
        ("aa", "c_phi * (lam - lam0)"),
        ("a2", "aa * aa"),
        (
            "m_arc",
            f"{_R} * ({_M1} * phi - {_M2} * sin2p + {_M3} * sin4p - {_M4} * sin6p)",
        ),
        (
            "utm_easting",
            f"{_K0} * nn * (aa + (a2 * aa) / 6.0e0 * (1.0e0 - tt2 + cc) "
            f"+ ((a2 * a2) * aa) / 120.0e0 * (5.0e0 - 18.0e0 * tt2 "
            f"+ tt2 * tt2 + 72.0e0 * cc - 58.0e0 * {_EP2})) + 500000.0e0",
        ),
        (
            "northing0",
            f"{_K0} * (m_arc + nn * t_phi * (a2 / 2.0e0 "
            f"+ (a2 * a2) / 24.0e0 * (5.0e0 - tt2 + 9.0e0 * cc + 4.0e0 * cc * cc) "
            f"+ ((a2 * a2) * a2) / 720.0e0 * (61.0e0 - 58.0e0 * tt2 "
            f"+ tt2 * tt2 + 600.0e0 * cc - 330.0e0 * {_EP2})))",
        ),
        (
            "utm_northing",
            f"CASE WHEN ({lat}) < 0.0e0 THEN northing0 + 10000000.0e0 "
            f"ELSE northing0 END",
        ),
        ("is_northern", f"({lat}) >= 0.0e0"),
    ]


# inverse-series constants (utm package to_latlon): e1 and the footprint-
# latitude coefficients, composed as literal arithmetic
_SQRT1E = f"sqrt(1.0e0 - {_E})"
_E1 = f"((1.0e0 - {_SQRT1E}) / (1.0e0 + {_SQRT1E}))"
_P2 = f"(3.0e0 / 2.0e0 * {_E1} - 27.0e0 / 32.0e0 * (({_E1} * {_E1}) * {_E1}))"
_P3 = (
    f"(21.0e0 / 16.0e0 * ({_E1} * {_E1}) "
    f"- 55.0e0 / 32.0e0 * (({_E1} * {_E1}) * ({_E1} * {_E1})))"
)
_P4 = f"(151.0e0 / 96.0e0 * (({_E1} * {_E1}) * {_E1}))"
_P5 = f"(1097.0e0 / 512.0e0 * (({_E1} * {_E1}) * ({_E1} * {_E1})))"
_RAD2DEG = "5.729577951308232e1"


def utm_inverse_stages(
    easting: str, northing: str, zone: str, northern: str
) -> list[tuple[str, str]]:
    """Ordered stages of the inverse conversion (utm package ``to_latlon``):
    footprint latitude via the e1 series (sin of multiples from double-angle
    recurrences, same bit-exactness contract as the forward path), then the
    standard inverse TM series.  Final columns: lat_deg, lon_deg (degrees).
    """
    return [
        ("inv_x", f"({easting}) - 500000.0e0"),
        (
            "inv_y",
            f"CASE WHEN {northern} THEN ({northing}) "
            f"ELSE ({northing}) - 10000000.0e0 END",
        ),
        ("inv_mu", f"(inv_y / {_K0}) / ({_R} * {_M1})"),
        ("mu_s", sin_poly_sql("inv_mu")),
        ("mu_c", cos_poly_sql("inv_mu")),
        ("mu_s2", "2.0e0 * mu_s * mu_c"),
        ("mu_c2", "1.0e0 - 2.0e0 * mu_s * mu_s"),
        ("mu_s4", "2.0e0 * mu_s2 * mu_c2"),
        ("mu_c4", "1.0e0 - 2.0e0 * mu_s2 * mu_s2"),
        ("mu_s6", "mu_s4 * mu_c2 + mu_c4 * mu_s2"),
        ("mu_s8", "2.0e0 * mu_s4 * mu_c4"),
        (
            "p_rad",
            f"inv_mu + {_P2} * mu_s2 + {_P3} * mu_s4 "
            f"+ {_P4} * mu_s6 + {_P5} * mu_s8",
        ),
        ("p_sin", sin_poly_sql("p_rad")),
        ("p_cos", cos_poly_sql("p_rad")),
        ("p_tan", "p_sin / p_cos"),
        ("p_tan2", "p_tan * p_tan"),
        ("ep_sin", f"1.0e0 - {_E} * p_sin * p_sin"),
        ("inv_n", f"{_R} / sqrt(ep_sin)"),
        ("inv_r", f"(1.0e0 - {_E}) / ep_sin"),
        ("inv_c", f"{_EP2} * p_cos * p_cos"),
        ("inv_d", f"inv_x / (inv_n * {_K0})"),
        ("d2", "inv_d * inv_d"),
        (
            "lat_rad",
            f"p_rad - (p_tan / inv_r) * (d2 / 2.0e0 "
            f"- (d2 * d2) / 24.0e0 * (5.0e0 + 3.0e0 * p_tan2 "
            f"+ 10.0e0 * inv_c - 4.0e0 * (inv_c * inv_c) - 9.0e0 * {_EP2})) "
            f"+ ((d2 * d2) * d2) / 720.0e0 * (61.0e0 + 90.0e0 * p_tan2 "
            f"+ 298.0e0 * inv_c + 45.0e0 * (p_tan2 * p_tan2) "
            f"- 252.0e0 * {_EP2} - 3.0e0 * (inv_c * inv_c))",
        ),
        (
            "lon_rad",
            f"(inv_d - (d2 * inv_d) / 6.0e0 * (1.0e0 + 2.0e0 * p_tan2 + inv_c) "
            f"+ ((d2 * d2) * inv_d) / 120.0e0 * (5.0e0 - 2.0e0 * inv_c "
            f"+ 28.0e0 * p_tan2 - 3.0e0 * (inv_c * inv_c) + 8.0e0 * {_EP2} "
            f"+ 24.0e0 * (p_tan2 * p_tan2))) / p_cos",
        ),
        ("lat_deg", f"lat_rad * {_RAD2DEG}"),
        (
            "lon_deg",
            f"lon_rad * {_RAD2DEG} + CAST(({zone} - 1) * 6 - 177 AS DOUBLE)",
        ),
    ]


def with_latlon(
    df: DataFrame,
    *,
    easting_col: str,
    northing_col: str,
    zone_col: str,
    northern_col: str,
) -> DataFrame:
    """Inverse conversion: append lat_deg / lon_deg (degrees) columns."""
    for name, expr in utm_inverse_stages(
        easting_col, northing_col, zone_col, northern_col
    ):
        df = df.withColumn(name, F.expr(expr))
    return df


def utm_inverse_select_sql(
    src_sql: str, easting: str, northing: str, zone: str, northern: str
) -> str:
    """Oracle twin of :func:`with_latlon` (nested SELECT per stage)."""
    sql = src_sql
    for name, expr in utm_inverse_stages(easting, northing, zone, northern):
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql


def with_utm(df: DataFrame, *, lat_col: str, lon_col: str) -> DataFrame:
    """Append utm_zone / utm_easting / utm_northing / is_northern columns
    (plus the intermediate stage columns; callers select what they need)."""
    for name, expr in utm_stages(lat_col, lon_col):
        df = df.withColumn(name, F.expr(expr))
    return df


def utm_select_sql(src_sql: str, lat: str, lon: str) -> str:
    """The oracle twin: wrap ``src_sql`` in one nested SELECT per stage so
    DuckDB evaluates the exact same per-column expressions in order."""
    sql = src_sql
    for name, expr in utm_stages(lat, lon):
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql
