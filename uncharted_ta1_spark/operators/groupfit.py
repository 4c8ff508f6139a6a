"""Grouped model-fit: per-key closed-form least squares + residual outliers.

Reference analog: the reference's core answering loop fits a per-document
regression from accumulated keypoints and then evaluates query points
against it (``tasks/geo_referencing/georeference.py:130-144`` — per-map
``estimate_pxl2geo_mapping``), with regression-based outlier rejection
(``tasks/geo_referencing/outlier_filter.py:34-293``).  Here the "model" is a
per-(doc_id, source) linear fit of ``n_tok`` over event time; the residual
flags are the outlier-filter half.

This is the UDAF surface of SURVEY.md §2.11: a grouped fit cannot be a plain
SQL aggregate chain (the reference uses an iterative/regression kernel), so
it runs as ``applyInPandas`` — exactly ONE hash Exchange on the group keys,
then a single Arrow-batched MapInPandas-style stage (plan-asserted in
tests/test_plans.py).  At 10^12 rows the shuffle is the cost; the per-group
kernel is O(group) with exact integer sums.

Engine-exact determinism: all sums (sx, sy, sxy, sxx, syy) are computed over
INTEGERS (x is centered on the group's min event_epoch, so magnitudes stay
far below 2^53), and every float result is derived from those exact integers
through a FIXED IEEE-754 expression tree that the DuckDB oracle replicates
verbatim — so slope/intercept/r2/rmse/residuals are bit-identical across
engines, not merely allclose.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame

FIT_SCHEMA = (
    "doc_id string, source string, n long, x0 long, "
    "slope double, intercept double, r2 double, rmse double"
)

RESID_SCHEMA = (
    "doc_id string, source string, seq_no int, event_epoch long, n_tok int, "
    "resid double, is_outlier boolean"
)


def _sums(pdf):
    """Exact integer sufficient statistics of the (x, y) cloud of one group."""
    ep = pdf["event_epoch"].astype("int64")
    y = pdf["n_tok"].astype("int64")
    x0 = int(ep.min())
    x = ep - x0
    n = len(pdf)
    sx = int(x.sum())
    sy = int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    return x, x0, n, sx, sy, num, d1, d2


def _fit_params(n, sx, sy, num, d1, d2):
    """(slope, intercept, r2, rmse) via the fixed expression tree the DuckDB
    oracle mirrors — every op is a float64 op on exact integers."""
    if d1 == 0:
        return None, None, None, None
    slope = float(num) / float(d1)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    r2 = None if d2 == 0 else (float(num) * float(num)) / (float(d1) * float(d2))
    rmse = math.sqrt(
        max(
            (float(d2) - (float(num) * float(num)) / float(d1)) / float(n * n),
            0.0,
        )
    )
    return slope, intercept, r2, rmse


def group_fit(
    seq: DataFrame, *, keys: Sequence[str] = ("doc_id", "source")
) -> DataFrame:
    """One row per key group: n, x0 (centering origin = min event_epoch),
    slope, intercept (at x0), r2, rmse of the least-squares fit of n_tok
    over centered event time.  Degenerate groups (single row / constant x)
    yield NULL fit params; constant-y groups yield NULL r2."""
    import pandas as pd

    keys = list(keys)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        _x, x0, n, sx, sy, num, d1, d2 = _sums(pdf)
        slope, intercept, r2, rmse = _fit_params(n, sx, sy, num, d1, d2)
        return pd.DataFrame(
            [
                {
                    "doc_id": pdf["doc_id"].iloc[0],
                    "source": pdf["source"].iloc[0],
                    "n": n,
                    "x0": x0,
                    "slope": slope,
                    "intercept": intercept,
                    "r2": r2,
                    "rmse": rmse,
                }
            ]
        )

    return seq.select(*keys, "event_epoch", "n_tok").groupBy(*keys).applyInPandas(
        fit, FIT_SCHEMA
    )


def fit_residual_outliers(
    seq: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    sigma: float = 2.0,
) -> DataFrame:
    """Per input row: the fit residual and an outlier flag
    (|resid| > sigma * group rmse), the reference's regression-residual
    outlier rejection (``outlier_filter.py:34-293``).  Rows of degenerate
    groups get NULL residuals and is_outlier = false."""
    import pandas as pd

    keys = list(keys)

    def resid(pdf: pd.DataFrame) -> pd.DataFrame:
        x, _x0, n, sx, sy, num, d1, d2 = _sums(pdf)
        slope, intercept, _r2, rmse = _fit_params(n, sx, sy, num, d1, d2)
        out = pdf[["doc_id", "source", "seq_no", "event_epoch", "n_tok"]].copy()
        if slope is None:
            out["resid"] = None
            out["is_outlier"] = False
            return out
        rs = [
            float(yv) - (intercept + slope * float(xv))
            for xv, yv in zip(x.tolist(), pdf["n_tok"].tolist())
        ]
        out["resid"] = rs
        out["is_outlier"] = [abs(r) > sigma * rmse for r in rs]
        return out

    return (
        seq.select(*keys, "seq_no", "event_epoch", "n_tok")
        .groupBy(*keys)
        .applyInPandas(resid, RESID_SCHEMA)
    )
