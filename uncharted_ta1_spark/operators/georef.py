"""Georeference query answering: fit -> project -> fallback -> score.

The reference's flagship end-to-end flow (``tasks/geo_referencing/
georeference.py:80-275``): each document's ground-control points fit an
affine pixel->world model (``util.py:242-335`` — recast in
operators/affinefit.py), every query point is projected through the fitted
model together with two +1-pixel finite-difference probes
(``georeference.py:228-275``: the xp/yp companion points that measure local
pixel scale), documents whose model is degenerate or absent fall back to the
clue-window midpoint with confidence 0 (``georeference.py:391-429``
``_add_fallback`` — abs() of the lon/lat min-max midpoint, geofence window
when one exists for the doc, default window otherwise), answers carry a
product-of-point-confidences score with the >2-point 1.1 boost
(``georeference.py:196-226`` ``_calc_confidence``), and predictions with
ground truth score as the RMSE of geodesic error km with a -1 sentinel for
docs with no truth points (``georeference.py:431-475``
``_score_query_points``).

Spark-first shape, end to end:

- ONE groupBy over the GCPs produces the per-doc affine parameters AND the
  clue window (min/max world extent) AND the ln-confidence sum — the
  ``extras`` hook on affinefit.affine_sums keeps it a single shuffle whose
  output is one short row per doc.
- The probe table (the big side at scale) LEFT-joins that per-doc table on
  the doc key and cross-joins the 1-row global clue window; projection,
  finite differences, fallback selection, confidence, and geodesic error
  are then pure column arithmetic — no UDF, no second shuffle over probes.
- Every float-bearing expression is a shared SQL text (evaluated via
  ``F.expr`` on the Spark side and embedded verbatim in the DuckDB oracle)
  over integer-exact aggregates, so results are bit-identical across
  engines, except ``confidence``: its ln-sum accumulates in engine order,
  so it is rounded to 9 dp on both sides (the confidence_product
  convention).
- The RMSE rollup quantizes error to integer milli-km and sums squares as
  DECIMAL(38,0): exact, order-independent, and overflow-safe even for the
  ~4000-km fallback errors (BIGINT squares would overflow near 3e9 ukm).

World units scale to degrees by /20 so every latitude stays inside the
fixed cos-polynomial's validity window (operators/geodesy.py, |lat|<=85°).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.operators.affinefit import affine_params
from uncharted_ta1_spark.operators.geodesy import equirect_km_sql

UNITS_PER_DEG = "2.0e1"  # planted world units -> degrees

# per-GCP ln(confidence), c = 0.5 + (event_id % 50)/100 — the synthetic
# point confidence, summed per doc inside the affine-sums groupBy
GCP_LN_CONF_SQL = "ln(0.5e0 + CAST(event_id % 50 AS DOUBLE) / 100.0e0)"

# model-absent predicate: degenerate fit (Cramer guard nulled the params)
# or doc never seen among the GCPs (left-join miss) — one doc-level guard
# for both axes since they share the design matrix
NO_MODEL_SQL = "(a_wx IS NULL OR a_wy IS NULL)"


def plane_sql(t: str, *, dx: int = 0, dy: int = 0) -> str:
    """Fitted plane evaluated at the probe pixel (+optional 1-px offset
    for the finite-difference companions, georeference.py:243-258)."""
    px = "CAST(qpx AS DOUBLE)" + (f" + {dx}.0e0" if dx else "")
    py = "CAST(qpy AS DOUBLE)" + (f" + {dy}.0e0" if dy else "")
    return f"(a_{t}*({px}) + b_{t}*({py}) + c_{t})"


def clue_mid_sql(t: str) -> str:
    """Fallback answer in world units: abs() of the clue-window midpoint —
    the doc's own GCP extent when it has one (the geofence branch,
    georeference.py:407-416), else the global extent (the default window).
    All inputs are exact integers, so the midpoint double is exact."""
    return (
        f"abs(CASE WHEN d_min_{t} IS NOT NULL THEN "
        f"(CAST(d_min_{t} AS DOUBLE) + CAST(d_max_{t} AS DOUBLE)) * 0.5e0 "
        f"ELSE (CAST(g_min_{t} AS DOUBLE) + CAST(g_max_{t} AS DOUBLE)) * 0.5e0 "
        f"END)"
    )


def answer_deg_sql(t: str, *, dx: int = 0, dy: int = 0) -> str:
    """One projected coordinate in degrees: fitted plane when a model
    exists, clue midpoint otherwise.  The finite-difference companions
    reuse the same tree — for fallback docs they collapse onto the clue
    point exactly as the reference's _add_fallback sets xp=yp=lonlat."""
    return (
        f"(CASE WHEN {NO_MODEL_SQL} THEN {clue_mid_sql(t)} "
        f"ELSE {plane_sql(t, dx=dx, dy=dy)} END / {UNITS_PER_DEG})"
    )


# doc-level answer confidence (georeference.py:196-226): product of the
# point confidences with a 1.1 boost per point beyond 2, capped at 1;
# 0 for fallback answers.  exp/ln-sum product with round(9) on both
# engines — the one non-bit-exact accumulation in this module.
CONF_SQL = (
    f"CASE WHEN {NO_MODEL_SQL} THEN 0.0e0 ELSE "
    "round(least(1.0e0, exp(ln_conf_sum + "
    "greatest(nf - 2.0e0, 0.0e0) * ln(1.1e0))), 9) END"
)


def answer_cols_sql() -> dict[str, str]:
    """The projection stage: shared texts keyed by output column name,
    evaluated over the probe+params+clue join in BOTH engines."""
    return {
        "lon_pred": answer_deg_sql("wx"),
        "lat_pred": answer_deg_sql("wy"),
        "lon_xp": answer_deg_sql("wx", dx=1),
        "lat_xp": answer_deg_sql("wy", dx=1),
        "lon_yp": answer_deg_sql("wx", dy=1),
        "lat_yp": answer_deg_sql("wy", dy=1),
        "confidence": CONF_SQL,
        "used_fallback": NO_MODEL_SQL,
        "lon_truth": (
            "CASE WHEN gt_wx IS NULL THEN NULL "
            f"ELSE CAST(gt_wx AS DOUBLE) / {UNITS_PER_DEG} END"
        ),
        "lat_truth": (
            "CASE WHEN gt_wy IS NULL THEN NULL "
            f"ELSE CAST(gt_wy AS DOUBLE) / {UNITS_PER_DEG} END"
        ),
    }


def final_cols_sql() -> dict[str, str]:
    """The scoring stage (georeference.py:443-458): per-probe geodesic
    distances to the finite-difference companions and to ground truth."""
    return {
        "dist_xp_km": equirect_km_sql("lat_pred", "lon_pred", "lat_xp", "lon_xp"),
        "dist_yp_km": equirect_km_sql("lat_pred", "lon_pred", "lat_yp", "lon_yp"),
        "error_km": (
            "CASE WHEN lon_truth IS NULL THEN NULL ELSE "
            + equirect_km_sql("lat_pred", "lon_pred", "lat_truth", "lon_truth")
            + " END"
        ),
    }


# exact milli-km quantization of the per-probe error for the rollup sums
ERROR_MKM_SQL = "CAST(floor(error_km * 1.0e3 + 0.5e0) AS BIGINT)"


def rmse_agg_sql() -> dict[str, str]:
    """Per-doc rollup (georeference.py:431-475): RMSE of geodesic error km
    over truth-bearing probes, -1 sentinel when the doc has none (:470),
    plus fallback and 5-km buffered-match counts.  Sum of squares as
    DECIMAL(38,0) — exact in any order, no BIGINT overflow."""
    return {
        "n_probes": "CAST(count(*) AS BIGINT)",
        "n_truth": "CAST(count(error_km) AS BIGINT)",
        "n_fallback": (
            "CAST(sum(CASE WHEN used_fallback THEN 1 ELSE 0 END) AS BIGINT)"
        ),
        "n_within_5km": (
            f"CAST(sum(CASE WHEN {ERROR_MKM_SQL} <= 5000 THEN 1 ELSE 0 END) "
            "AS BIGINT)"
        ),
        "rmse_km": (
            "CASE WHEN count(error_km) = 0 THEN -1.0e0 ELSE "
            f"sqrt(CAST(sum(CAST({ERROR_MKM_SQL} * {ERROR_MKM_SQL} "
            "AS DECIMAL(38,0))) AS DOUBLE) "
            "/ CAST(count(error_km) AS DOUBLE)) / 1.0e3 END"
        ),
    }


PARAM_COLS = [
    "n", "nf", "a_wx", "b_wx", "c_wx", "a_wy", "b_wy", "c_wy",
    "ln_conf_sum", "d_min_wx", "d_max_wx", "d_min_wy", "d_max_wy",
]


def georef_param_table(gcps: DataFrame, *, key: str = "doc") -> DataFrame:
    """Per-doc model + clue window + confidence sum in ONE groupBy over the
    GCPs (the extras hook keeps the companion stats in the same shuffle)."""
    return affine_params(
        gcps,
        keys=[key],
        extras={
            "d_min_wx": F.min("wx").cast("long"),
            "d_max_wx": F.max("wx").cast("long"),
            "d_min_wy": F.min("wy").cast("long"),
            "d_max_wy": F.max("wy").cast("long"),
            "ln_conf_sum": F.sum(F.expr(GCP_LN_CONF_SQL)),
        },
    ).select(key, *PARAM_COLS)


def georef_answers(gcps: DataFrame, probes: DataFrame, *, key: str = "doc") -> DataFrame:
    """Full composite: per-probe projected lon/lat + finite-difference
    distances + confidence + fallback flag + geodesic error vs truth.

    Plan at scale: probes (the big table) take one broadcast LEFT join
    against the one-row-per-doc param table and one broadcast cross join
    against the 1-row global clue window — the probe side never shuffles.
    (The broadcast hint assumes a bounded doc count, as here; with
    unbounded docs drop the hint and AQE picks the strategy.)"""
    params = georef_param_table(gcps, key=key)
    glob = gcps.agg(
        F.min("wx").cast("long").alias("g_min_wx"),
        F.max("wx").cast("long").alias("g_max_wx"),
        F.min("wy").cast("long").alias("g_min_wy"),
        F.max("wy").cast("long").alias("g_max_wy"),
    )
    j = probes.join(F.broadcast(params), key, "left").crossJoin(F.broadcast(glob))
    ans = j.select(
        key,
        "probe_id",
        "qpx",
        "qpy",
        *[F.expr(sql).alias(name) for name, sql in answer_cols_sql().items()],
    )
    out = ans.select(
        key,
        "probe_id",
        "qpx",
        "qpy",
        "lon_pred",
        "lat_pred",
        "confidence",
        "used_fallback",
        *[F.expr(sql).alias(name) for name, sql in final_cols_sql().items()],
    )
    return out


def georef_doc_scores(gcps: DataFrame, probes: DataFrame, *, key: str = "doc") -> DataFrame:
    """Per-doc eval rollup over :func:`georef_answers` — one combinable
    groupBy on the doc key (integer sums/counts; the only float tree runs
    over the exact DECIMAL sum)."""
    pa = georef_answers(gcps, probes, key=key)
    return pa.groupBy(key).agg(
        *[F.expr(sql).alias(name) for name, sql in rmse_agg_sql().items()]
    )
