"""Mergeable moment-sketch profile — per-group mean/variance/skewness/
kurtosis from exact integer power sums (the "moments sketch" of Gan et al.,
"Moment-Based Quantile Sketches for Efficient High Cardinality Aggregation
Queries", VLDB 2018 — public method; here used for the distribution-shape
audit a training pipeline runs over per-sequence token counts).

Reference analog: the reference scores per-extraction confidence
distributions with simple summary statistics before thresholding
(``tasks/geo_referencing/scoring.py`` RMSE aggregation; this extends the
same one-pass reduction to 3rd/4th-order shape so a corpus skew/heavy-tail
shift is visible without a quantile pass).

Scale design (100 TB):

* The ONLY corpus-sized work is one map-side-combinable groupBy computing
  ``(n, Σx, Σx², Σx³, Σx⁴)`` — five BIGINT registers per group, mergeable
  by addition, the textbook distributive sketch.  No window, no sort, no
  second pass.
* Registers stay exact BIGINT end-to-end (value ≤ 64 ⇒ x⁴ ≤ 2²⁴; even
  10¹² rows per group keeps Σx⁴ < 2⁶³).  The float moments are derived
  from the exact registers through one FIXED IEEE expression tree —
  identical operation order in Spark and the DuckDB oracle — and rounded
  to 6 dp, the repo's bit-exact cross-engine float recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_profile(
    df: DataFrame,
    *,
    group_col: str = "source",
    value_col: str = "n_tok",
) -> DataFrame:
    """Per-group ``(n, s1..s4, mean, variance, skewness, kurtosis_excess)``.

    Population moments; groups with zero variance emit NULL skew/kurtosis
    (never a division by zero).  The five registers are the contract's
    exact truth; the doubles are 6-dp conveniences derived from them.
    """
    x = F.col(value_col).cast("long")
    regs = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("long").alias("s1"),
        F.sum(x * x).cast("long").alias("s2"),
        F.sum(x * x * x).cast("long").alias("s3"),
        F.sum(x * x * x * x).cast("long").alias("s4"),
    )
    # fixed IEEE tree — textually mirrored in the DuckDB oracle.  The
    # `+ 0.0` collapses IEEE -0.0 to +0.0 on BOTH sides (a zero-variance
    # group's m2/m3 can float-round to -0.0, which the driver's value-hash
    # distinguishes): same collapse appears in the oracle fragments.
    return regs.select(
        group_col,
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        F.expr("round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0").alias("mean"),
        F.expr(_VAR_EXPR + " + 0.0").alias("variance"),
        F.expr(_SKEW_EXPR + " + 0.0").alias("skewness"),
        F.expr(_KURT_EXPR + " + 0.0").alias("kurtosis_excess"),
    )


# Shared scalar fragments: the SAME text runs under Spark SQL and DuckDB
# (both accept CAST/ROUND/SQRT/NULLIF with these semantics), so the IEEE
# evaluation tree — and therefore the 6-dp rounding — matches bit-for-bit.
_MEAN = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
_M2 = f"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - {_MEAN} * {_MEAN})"
_M3 = (
    f"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3.0 * {_MEAN} * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 2.0 * {_MEAN} * {_MEAN} * {_MEAN})"
)
_M4 = (
    f"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 4.0 * {_MEAN} * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 6.0 * {_MEAN} * {_MEAN} * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" - 3.0 * {_MEAN} * {_MEAN} * {_MEAN} * {_MEAN})"
)
_VAR_EXPR = f"round({_M2}, 6)"
_SKEW_EXPR = f"round({_M3} / NULLIF(SQRT({_M2}) * {_M2}, 0.0), 6)"
_KURT_EXPR = f"round({_M4} / NULLIF({_M2} * {_M2}, 0.0) - 3.0, 6)"


def moments_oracle_select(from_clause: str, *, group_col: str = "source",
                          value_col: str = "n_tok") -> str:
    """The DuckDB twin — built from the SAME expression fragments so the
    two engines cannot drift (the dual-dialect invariant, CLAUDE.md)."""
    return f"""
, mom_regs AS (
  SELECT {group_col},
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)) AS BIGINT) AS s2,
         CAST(sum(CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)
                  * CAST({value_col} AS BIGINT)) AS BIGINT) AS s3,
         CAST(sum(CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)
                  * CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)) AS BIGINT) AS s4
  FROM {from_clause} GROUP BY {group_col}
)
SELECT {group_col}, n, s1, s2, s3, s4,
  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS mean,
  {_VAR_EXPR} + 0.0 AS variance,
  {_SKEW_EXPR} + 0.0 AS skewness,
  {_KURT_EXPR} + 0.0 AS kurtosis_excess
FROM mom_regs
"""
