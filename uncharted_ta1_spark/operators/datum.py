"""Datum shift (J8): abridged Molodensky transform as column arithmetic.

Reference analog: ``tasks/geo_referencing/georeference.py:162-174`` — query
points are datum-shifted with a pyproj ``Transformer`` from the extracted
CRS to the external CRS (EPSG:4269, NAD83) before scoring.  The reference
runs it point-at-a-time in Python; here it is the standard abridged
Molodensky 3-parameter shift (public DMA/NIMA TR 8350.2 formulas) over
whole columns — vectorized, shuffle-free, codegen'd.

Defaults shift NAD27 (Clarke 1866 ellipsoid) -> WGS84/NAD83 with the CONUS
mean offsets (dx, dy, dz) = (-8, 160, 176) m.

Bit-exactness: same shared-text scheme as geodesy.py/utmconv.py — fixed
Horner polynomials for trig, longitude sin/cos via half-angle + double-angle
(the polynomials are only valid to ~1.58 rad, |lam|/2 <= pi/2 fits), every
stage one SQL fragment evaluated verbatim by both engines, ellipsoid
constants precomputed in Python and embedded via repr (shortest-repr
doubles parse to identical bits in both engines).  Outputs are RAW doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.geodesy import (
    DEG2RAD,
    RAD2DEG,
    cos_poly_sql,
    sin_poly_sql,
)

# source ellipsoid: Clarke 1866 (NAD27)
A_SRC = 6378206.4
F_SRC = 1.0 / 294.978698214
# target ellipsoid: WGS84 / GRS80 (NAD83)
A_DST = 6378137.0
F_DST = 1.0 / 298.257223563

# CONUS mean NAD27 -> WGS84 origin shift, meters (DMA TR 8350.2)
DX, DY, DZ = -8.0, 160.0, 176.0

_E2_SRC = 2.0 * F_SRC - F_SRC * F_SRC
_DA = A_DST - A_SRC
_DF = F_DST - F_SRC


def molodensky_stages(
    lat: str,
    lon: str,
    *,
    dx: float = DX,
    dy: float = DY,
    dz: float = DZ,
) -> list[tuple[str, str]]:
    """Ordered (column, SQL) stages: lat/lon in degrees on the source datum
    -> ``lat_shifted`` / ``lon_shifted`` degrees on the target datum."""
    a, f, e2, da, df = (
        repr(A_SRC), repr(F_SRC), repr(_E2_SRC), repr(_DA), repr(_DF),
    )
    return [
        ("ds_phi", f"({lat}) * {DEG2RAD}"),
        ("ds_lam_h", f"(({lon}) * {DEG2RAD}) * 0.5e0"),
        ("ds_sp", sin_poly_sql("ds_phi")),
        ("ds_cp", cos_poly_sql("ds_phi")),
        ("ds_slh", sin_poly_sql("ds_lam_h")),
        ("ds_clh", cos_poly_sql("ds_lam_h")),
        ("ds_sl", "2.0e0 * ds_slh * ds_clh"),
        ("ds_cl", "1.0e0 - 2.0e0 * ds_slh * ds_slh"),
        ("ds_w2", f"1.0e0 - {e2} * ds_sp * ds_sp"),
        ("ds_w", "sqrt(ds_w2)"),
        ("ds_rn", f"{a} / ds_w"),
        ("ds_rm", f"{a} * (1.0e0 - {e2}) / (ds_w2 * ds_w)"),
        (
            "ds_dphi",
            f"({repr(-dx)} * ds_sp * ds_cl + {repr(-dy)} * ds_sp * ds_sl "
            f"+ {repr(dz)} * ds_cp "
            f"+ ({a} * {df} + {f} * {da}) * (2.0e0 * ds_sp * ds_cp)) / ds_rm",
        ),
        (
            "ds_dlam",
            f"({repr(-dx)} * ds_sl + {repr(dy)} * ds_cl) / (ds_rn * ds_cp)",
        ),
        ("lat_shifted", f"({lat}) + ds_dphi * {RAD2DEG}"),
        ("lon_shifted", f"({lon}) + ds_dlam * {RAD2DEG}"),
    ]


def with_datum_shift(
    df: DataFrame,
    *,
    lat_col: str,
    lon_col: str,
    dx: float = DX,
    dy: float = DY,
    dz: float = DZ,
) -> DataFrame:
    """Append ``lat_shifted`` / ``lon_shifted`` (target-datum degrees)."""
    for name, expr in molodensky_stages(lat_col, lon_col, dx=dx, dy=dy, dz=dz):
        df = df.withColumn(name, F.expr(expr))
    return df


def datum_shift_select_sql(
    src_sql: str,
    lat: str,
    lon: str,
    *,
    dx: float = DX,
    dy: float = DY,
    dz: float = DZ,
) -> str:
    """Oracle twin (nested SELECT per stage)."""
    sql = src_sql
    for name, expr in molodensky_stages(lat, lon, dx=dx, dy=dy, dz=dz):
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql
