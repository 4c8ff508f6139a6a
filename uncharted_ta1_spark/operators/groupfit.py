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
it runs as ``applyInPandas``.

Scale design — bucket the shuffle, vectorize the kernel:
``applyInPandas`` invokes Python once per GROUP; with millions of small
(doc_id, source) groups the fixed per-call overhead dominates (measured 40s
for 10k groups at sf0.1 vs ~2s vectorized).  So the Spark group key is a
coarse HASH BUCKET of the fit key, and each Arrow batch fits ALL of its
bucket's groups with one vectorized pandas groupby — exactly ONE hash
Exchange, ~n_buckets Python invocations total, identical results (the fit is
a pure per-group function; bucketing only changes co-location).  Same layout
trick as plans/backfill.py: a hot key concentrates in one bucket and slows
only that bucket's task.

Engine-exact determinism: all sums (sx, sy, sxy, sxx, syy) are computed over
INTEGERS (x is centered on the group's min event_epoch, so magnitudes stay
far below 2^53), and every float result is derived from those exact integers
through a FIXED IEEE-754 expression tree (element-wise float64 numpy ops ==
scalar C doubles) that the DuckDB oracle replicates verbatim — so
slope/intercept/r2/rmse/residuals are bit-identical across engines, not
merely allclose.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uncharted_ta1_spark.functions.portable import md5_i64

FIT_SCHEMA = (
    "doc_id string, source string, n long, x0 long, "
    "slope double, intercept double, r2 double, rmse double"
)

RESID_SCHEMA = (
    "doc_id string, source string, seq_no int, event_epoch long, n_tok int, "
    "resid double, is_outlier boolean"
)

def _default_buckets(df: DataFrame) -> int:
    """2 tasks per core: enough granularity for AQE to balance a hot bucket,
    few enough that per-call Python overhead stays negligible (measured: 256
    buckets on 32 cores cost 6x more wall time than 64 at sf0.1)."""
    return 2 * df.sparkSession.sparkContext.defaultParallelism


def _group_params(pdf, keys):
    """Vectorized per-group sufficient statistics + fit params over one
    bucket's rows.  Returns a params frame indexed by the group keys with
    exact-int sums and float64 (slope, intercept, r2, rmse) columns."""
    import numpy as np

    df = pdf[[*keys, "event_epoch", "n_tok"]].copy()
    df["event_epoch"] = df["event_epoch"].astype("int64")
    df["n_tok"] = df["n_tok"].astype("int64")
    g0 = df.groupby(list(keys), sort=False)
    df["x"] = df["event_epoch"] - g0["event_epoch"].transform("min")
    df["xy"] = df["x"] * df["n_tok"]
    df["xx"] = df["x"] * df["x"]
    df["yy"] = df["n_tok"] * df["n_tok"]

    g = df.groupby(list(keys), sort=False)
    p = g.agg(
        n=("x", "size"),
        x0=("event_epoch", "min"),
        sx=("x", "sum"),
        sy=("n_tok", "sum"),
        sxy=("xy", "sum"),
        sxx=("xx", "sum"),
        syy=("yy", "sum"),
    )
    n = p["n"].to_numpy("int64")
    sx = p["sx"].to_numpy("int64")
    sy = p["sy"].to_numpy("int64")
    num = n * p["sxy"].to_numpy("int64") - sx * sy
    d1 = n * p["sxx"].to_numpy("int64") - sx * sx
    d2 = n * p["syy"].to_numpy("int64") - sy * sy

    nf = n.astype("float64")
    numf = num.astype("float64")
    d1f = d1.astype("float64")
    d2f = d2.astype("float64")
    fit = d1 != 0
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = np.where(fit, numf / d1f, np.nan)
        intercept = np.where(fit, (sy.astype("float64") - slope * sx.astype("float64")) / nf, np.nan)
        r2 = np.where(fit & (d2 != 0), (numf * numf) / (d1f * d2f), np.nan)
        rmse = np.where(
            fit,
            np.sqrt(np.maximum((d2f - (numf * numf) / d1f) / (nf * nf), 0.0)),
            np.nan,
        )
    p["slope"] = slope
    p["intercept"] = intercept
    p["r2"] = r2
    p["rmse"] = rmse
    p["has_fit"] = fit
    return p.reset_index(), df["x"]


def _with_bucket(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in keys])
    return df.withColumn("_fb", F.pmod(md5_i64(key), F.lit(n_buckets)).cast("int"))


def group_fit(
    seq: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    n_buckets: int | None = None,
) -> DataFrame:
    """One row per key group: n, x0 (centering origin = min event_epoch),
    slope, intercept (at x0), r2, rmse of the least-squares fit of n_tok
    over centered event time.  Degenerate groups (single row / constant x)
    yield NULL fit params; constant-y groups yield NULL r2."""
    import pandas as pd

    keys = list(keys)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        p, _x = _group_params(pdf, keys)
        return p[[*keys, "n", "x0", "slope", "intercept", "r2", "rmse"]]

    src = _with_bucket(
        seq.select(*keys, "event_epoch", "n_tok"),
        keys,
        n_buckets or _default_buckets(seq),
    )
    return src.groupBy("_fb").applyInPandas(fit, FIT_SCHEMA)


RANSAC_SCHEMA = (
    "doc_id string, source string, seq_no int, event_epoch long, n_tok int, "
    "resid double, is_outlier boolean, n_inliers long, used_refit boolean"
)


def ransac_refit_outliers(
    seq: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    sigma: float = 2.0,
    n_buckets: int | None = None,
) -> DataFrame:
    """Deterministic RANSAC-style robust refit: fit -> reject -> refit.

    Reference analog: ``tasks/geo_referencing/outlier_filter.py:190-261`` —
    ``RANSACRegressor`` with a MAD-derived residual threshold computes an
    inlier mask, outlier coords are FLAGGED (moved aside, not silently
    dropped), and the final slope comes from the refit on inliers.  The
    reference pins ``random_state=911`` for determinism; here determinism is
    structural instead of seeded: round 0 is the exact-integer closed-form
    fit, the inlier mask is a bit-identical float compare (|resid0| <=
    sigma*rmse0), and round 1 refits the same closed form on the inlier
    subset — no sampling, so no seed.

    Per input row the output carries the ROUND-1 residual and outlier flag,
    plus ``n_inliers`` (rows the refit used) and ``used_refit`` (false when
    the refit was degenerate — fewer than 2 distinct inlier x values — in
    which case the round-0 fit is the fallback, mirroring the reference's
    "exception -> keep all coords" path at ``outlier_filter.py:224-228``).
    Groups with no round-0 fit at all emit NULL residuals, no flags.

    Scale design: identical to :func:`fit_residual_outliers` — one hash
    Exchange on coarse buckets, both fit rounds vectorized inside one Arrow
    batch per bucket (a second round costs zero extra shuffles).
    """
    import numpy as np
    import pandas as pd

    keys = list(keys)

    def resid2(pdf: pd.DataFrame) -> pd.DataFrame:
        p0, x0c = _group_params(pdf, keys)
        out = pdf[[*keys, "seq_no", "event_epoch", "n_tok"]].copy()
        m = out.merge(
            p0[[*keys, "x0", "slope", "intercept", "rmse", "has_fit"]],
            on=keys, how="left",
        )
        y = m["n_tok"].to_numpy("int64").astype("float64")
        xf0 = (m["event_epoch"].to_numpy("int64") - m["x0"].to_numpy("int64")).astype(
            "float64"
        )
        r0 = y - (m["intercept"].to_numpy() + m["slope"].to_numpy() * xf0)
        has0 = m["has_fit"].to_numpy(bool)
        inlier = has0 & (np.abs(r0) <= sigma * m["rmse"].to_numpy())

        p1, _ = _group_params(pdf[inlier], keys)
        n_in = (
            pd.Series(inlier, index=pdf.index)
            .groupby([pdf[k] for k in keys], sort=False)
            .transform("sum")
            .to_numpy("int64")
        )
        m2 = out.merge(
            p1[[*keys, "x0", "slope", "intercept", "rmse", "has_fit"]],
            on=keys, how="left", suffixes=("", "_1"),
        )
        # .eq(True): NaN (group absent from refit params) -> False, warning-free
        has1 = m2["has_fit"].eq(True).to_numpy(bool)
        use1 = has0 & has1
        x0_sel = np.where(use1, m2["x0"].to_numpy("float64"), m["x0"].to_numpy("float64")).astype("int64")
        slope = np.where(use1, m2["slope"].to_numpy(), m["slope"].to_numpy())
        icpt = np.where(use1, m2["intercept"].to_numpy(), m["intercept"].to_numpy())
        rmse1 = np.where(use1, m2["rmse"].to_numpy(), m["rmse"].to_numpy())
        xf1 = (m["event_epoch"].to_numpy("int64") - x0_sel).astype("float64")
        r1 = y - (icpt + slope * xf1)
        out["resid"] = np.where(has0, r1, np.nan)
        out["is_outlier"] = has0 & (np.abs(r1) > sigma * rmse1)
        # no-analysis groups keep all rows: n_inliers = group size
        grp_n = (
            out.groupby(keys, sort=False)["seq_no"].transform("size").to_numpy("int64")
        )
        out["n_inliers"] = np.where(has0, n_in, grp_n)
        out["used_refit"] = use1
        return out[[*keys, "seq_no", "event_epoch", "n_tok", "resid",
                    "is_outlier", "n_inliers", "used_refit"]]

    src = _with_bucket(
        seq.select(*keys, "seq_no", "event_epoch", "n_tok"),
        keys,
        n_buckets or _default_buckets(seq),
    )
    return src.groupBy("_fb").applyInPandas(resid2, RANSAC_SCHEMA)


def fit_residual_outliers(
    seq: DataFrame,
    *,
    keys: Sequence[str] = ("doc_id", "source"),
    sigma: float = 2.0,
    n_buckets: int | None = None,
) -> DataFrame:
    """Per input row: the fit residual and an outlier flag
    (|resid| > sigma * group rmse), the reference's regression-residual
    outlier rejection (``outlier_filter.py:34-293``).  Rows of degenerate
    groups get NULL residuals and is_outlier = false."""
    import numpy as np
    import pandas as pd

    keys = list(keys)

    def resid(pdf: pd.DataFrame) -> pd.DataFrame:
        p, x = _group_params(pdf, keys)
        out = pdf[[*keys, "seq_no", "event_epoch", "n_tok"]].copy()
        out["_x"] = x.to_numpy("int64")
        merged = out.merge(
            p[[*keys, "slope", "intercept", "rmse", "has_fit"]], on=keys, how="left"
        )
        yf = merged["n_tok"].to_numpy("int64").astype("float64")
        xf = merged["_x"].to_numpy("float64")
        r = yf - (merged["intercept"].to_numpy() + merged["slope"].to_numpy() * xf)
        has_fit = merged["has_fit"].to_numpy(bool)
        merged["resid"] = np.where(has_fit, r, np.nan)
        merged["is_outlier"] = has_fit & (
            np.abs(r) > sigma * merged["rmse"].to_numpy()
        )
        return merged[[*keys, "seq_no", "event_epoch", "n_tok", "resid", "is_outlier"]]

    src = _with_bucket(
        seq.select(*keys, "seq_no", "event_epoch", "n_tok"),
        keys,
        n_buckets or _default_buckets(seq),
    )
    return src.groupBy("_fb").applyInPandas(resid, RESID_SCHEMA)
