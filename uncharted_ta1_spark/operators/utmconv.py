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
