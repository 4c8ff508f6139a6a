"""Per-group 6-parameter 2-D affine fit from ground-control points.

Reference analog: ``tasks/geo_referencing/util.py:242-335`` — each map's
GCPs (>=3 pixel->world point pairs) fit a 6-parameter affine transform
(``rasterio.transform.from_gcps``), with per-GCP residuals and degenerate
groups (collinear / too few points) flagged rather than crashing.  Here the
fit itself is re-derived: closed-form least squares via Cramer's rule on the
3x3 normal equations, one system per world axis (both axes share the same
design matrix)::

    wx = a*px + b*py + c          wy = d*px + e*py + f

Spark-first shape: sufficient statistics are one map-side-combinable
``groupBy`` over exact integer sums (a single shuffle whose reduced size is
one row per group — the 10^12-GCP plan), and the parameters are a FIXED
IEEE-754 expression tree over those sums.  The tree lives in this module as
SQL text applied via ``F.expr`` AND embedded verbatim in the DuckDB oracle,
so both engines evaluate the identical float op sequence — results are
bit-identical, not merely allclose (the shared-text convention of
operators/datum.py).  No applyInPandas needed: unlike the iterative fits in
groupfit.py, Cramer's rule is plain column algebra.

Degeneracy: ``n < min_gcps`` or a zero normal-matrix determinant yields NULL
parameters and ``degenerate = true`` (the reference's "fewer than 3 GCPs ->
no transform" path).  The determinant predicate is evaluated on the same
shared tree in both engines, so the classification can never disagree.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# determinant of the normal matrix [[sxx,sxy,sx],[sxy,syy,sy],[sx,sy,n]] —
# fixed association; every engine must see exactly this text
AFFINE_DET = "(sxx*(syy*nf - sy*sy) - sxy*(sxy*nf - sx*sy) + sx*(sxy*sy - syy*sx))"


def cramer_sql(t: str, *, min_gcps: int = 3) -> dict[str, str]:
    """Shared SQL texts for the Cramer solution of target column ``t``
    (``t`` in {"wx","wy"}; expects sums named sx{t}, sy{t}, s{t}, s{t}{t}).

    Returns {"a": ..., "b": ..., "c": ...} — each a CASE expression that is
    NULL for degenerate groups — plus "rmse" (in terms of a_{t}/b_{t}/c_{t}
    columns, to be applied after the params are materialized).
    """
    det = AFFINE_DET
    da = (
        f"(sx{t}*(syy*nf - sy*sy) - sxy*(sy{t}*nf - sy*s{t})"
        f" + sx*(sy{t}*sy - syy*s{t}))"
    )
    db = (
        f"(sxx*(sy{t}*nf - sy*s{t}) - sx{t}*(sxy*nf - sy*sx)"
        f" + sx*(sxy*s{t} - sy{t}*sx))"
    )
    dc = (
        f"(sxx*(syy*s{t} - sy{t}*sy) - sxy*(sxy*s{t} - sy{t}*sx)"
        f" + sx{t}*(sxy*sy - syy*sx))"
    )
    guard = f"{det} = 0.0e0 OR n < {min_gcps}"
    return {
        "a": f"CASE WHEN {guard} THEN NULL ELSE {da} / {det} END",
        "b": f"CASE WHEN {guard} THEN NULL ELSE {db} / {det} END",
        "c": f"CASE WHEN {guard} THEN NULL ELSE {dc} / {det} END",
        "rmse": (
            f"CASE WHEN a_{t} IS NULL THEN NULL ELSE "
            f"sqrt(greatest((s{t}{t} - a_{t}*sx{t} - b_{t}*sy{t} - c_{t}*s{t})"
            f" / nf, 0.0e0)) END"
        ),
        "degenerate": f"({det} = 0.0e0 OR n < {min_gcps})",
    }


def affine_sums(
    gcps: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id",),
    px: str = "px",
    py: str = "py",
    wx: str = "wx",
    wy: str = "wy",
    extras: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Exact-integer sufficient statistics per group, cast to DOUBLE under
    the canonical names the shared expression trees expect.  Inputs must be
    integer-valued and sized so every sum stays below 2^53 (pixel coords and
    world coords of real GCP sets are far below that).

    ``extras``: additional aggregate columns (name -> aggregate Column)
    computed in the SAME groupBy — callers that need companion per-group
    stats (e.g. the georeference clue window, operators/georef.py) extend
    this pass instead of re-shuffling the GCPs a second time."""
    x = F.col(px).cast("long")
    y = F.col(py).cast("long")
    tx = F.col(wx).cast("long")
    ty = F.col(wy).cast("long")
    sums = gcps.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(x * y).alias("_sxy"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * tx).alias("_sxwx"),
        F.sum(y * tx).alias("_sywx"),
        F.sum(tx).alias("_swx"),
        F.sum(tx * tx).alias("_swxwx"),
        F.sum(x * ty).alias("_sxwy"),
        F.sum(y * ty).alias("_sywy"),
        F.sum(ty).alias("_swy"),
        F.sum(ty * ty).alias("_swywy"),
        *[col.alias(name) for name, col in (extras or {}).items()],
    )
    doubled = [F.col(k) for k in keys] + [F.col("n")]
    for c in ("sx", "sy", "sxx", "sxy", "syy", "sxwx", "sywx", "swx",
              "swxwx", "sxwy", "sywy", "swy", "swywy"):
        doubled.append(F.col(f"_{c}").cast("double").alias(c))
    doubled.extend(F.col(name) for name in (extras or {}))
    return sums.select(*doubled, F.col("n").cast("double").alias("nf"))


def affine_params(
    gcps: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id",),
    px: str = "px",
    py: str = "py",
    wx: str = "wx",
    wy: str = "wy",
    min_gcps: int = 3,
    extras: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Keyed parameter table under the canonical tree names (a_wx..c_wy,
    rmse_x/rmse_y, degenerate) — shared by :func:`affine_fit` (renamed
    contract output) and :func:`affine_residuals` (joined back per GCP)."""
    sums = affine_sums(gcps, keys=keys, px=px, py=py, wx=wx, wy=wy,
                       extras=extras)
    cx = cramer_sql("wx", min_gcps=min_gcps)
    cy = cramer_sql("wy", min_gcps=min_gcps)
    return sums.withColumns(
        {
            "a_wx": F.expr(cx["a"]),
            "b_wx": F.expr(cx["b"]),
            "c_wx": F.expr(cx["c"]),
            "a_wy": F.expr(cy["a"]),
            "b_wy": F.expr(cy["b"]),
            "c_wy": F.expr(cy["c"]),
        }
    ).withColumns(
        {
            "rmse_x": F.expr(cx["rmse"]),
            "rmse_y": F.expr(cy["rmse"]),
            "degenerate": F.expr(cx["degenerate"]),
        }
    )


def residual_sql(t: str) -> str:
    """Per-GCP residual of target ``t`` against the fitted plane — NULL for
    degenerate groups.  Same shared-text convention as the parameter trees."""
    return (
        f"CASE WHEN a_{t} IS NULL THEN NULL ELSE "
        f"CAST({t} AS DOUBLE) - (a_{t}*CAST(px AS DOUBLE)"
        f" + b_{t}*CAST(py AS DOUBLE) + c_{t}) END"
    )


OUTLIER_SQL = (
    "CASE WHEN a_wx IS NULL THEN false ELSE "
    "(abs(resid_x) > 2.0e0*rmse_x OR abs(resid_y) > 2.0e0*rmse_y) END"
)


def affine_residuals(
    gcps: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id",),
    min_gcps: int = 3,
) -> DataFrame:
    """Per-GCP residuals against the group's fitted affine + an outlier flag
    (|resid| > 2*rmse on either axis — the reference's per-GCP rejection,
    outlier_filter.py:34-293, on the 2-D model).  Degenerate groups emit
    NULL residuals and false flags (flag-don't-delete).  Plan: the tiny
    per-group params table joins back to the GCPs on the group key — an
    equi shuffle co-partitioned with the aggregation that produced it."""
    keys = list(keys)
    params = affine_params(gcps, keys=keys, min_gcps=min_gcps)
    joined = gcps.join(
        params.select(
            *keys, "a_wx", "b_wx", "c_wx", "a_wy", "b_wy", "c_wy",
            "rmse_x", "rmse_y", "degenerate",
        ),
        keys,
    )
    return (
        joined.withColumns(
            {
                "resid_x": F.expr(residual_sql("wx")),
                "resid_y": F.expr(residual_sql("wy")),
            }
        )
        .withColumn("is_outlier", F.expr(OUTLIER_SQL))
        .select(*gcps.columns, "resid_x", "resid_y", "is_outlier")
    )


def affine_fit(
    gcps: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id",),
    px: str = "px",
    py: str = "py",
    wx: str = "wx",
    wy: str = "wy",
    min_gcps: int = 3,
) -> DataFrame:
    """One row per group: n_gcps, the 6 affine parameters (a,b,c,d,e,f),
    per-axis fit rmse, and the degenerate flag."""
    params = affine_params(
        gcps, keys=keys, px=px, py=py, wx=wx, wy=wy, min_gcps=min_gcps
    )
    return params.select(
        *keys,
        F.col("n").alias("n_gcps"),
        F.col("a_wx").alias("a"),
        F.col("b_wx").alias("b"),
        F.col("c_wx").alias("c"),
        F.col("a_wy").alias("d"),
        F.col("b_wy").alias("e"),
        F.col("c_wy").alias("f"),
        "rmse_x",
        "rmse_y",
        "degenerate",
    )
