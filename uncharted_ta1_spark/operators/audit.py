"""First-significant-digit (Benford) distribution audit — the
data-quality plausibility gate for monetary/measured columns.

Reference analog: the reference gates extracted coordinates through
statistical plausibility filters before trusting them — RANSAC regression
over the digit-parsed values with explicit outlier exclusion
(``tasks/geo_referencing/outlier_filter.py:34-165``) and consecutive-digit
noise heuristics (``tasks/geo_referencing/util.py``).  Generalized to the
table-level audit a 100 TB ingest pipeline runs per batch: compare the
first-significant-digit histogram of a positive measured column against
Benford's law (public: Benford 1938; Hill 1995) and emit per-digit
chi-square contributions — fabricated, truncated, or unit-mixed data jumps
out as a digit-histogram distortion long before row-level rules fire.

Scale design: ONE combinable groupBy over 9 digit groups (map-side
partials collapse everything); the total-count broadcast is a single row.
The digit is extracted via exact integer cents (``round(x*100)`` then the
first character of the integer's decimal string), never via float
``log10`` whose libm varies across engines at power-of-ten boundaries.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_digit_audit(df: DataFrame, *, amount_col: str) -> DataFrame:
    """Per-digit Benford audit of a positive money column.

    Output: 9 rows (digit 1..9) with ``n_obs`` (BIGINT), ``p_obs`` (raw
    IEEE division — identical single-op tree in the oracle), ``p_benford``
    (round 9: ln is libm 1-ulp across engines) and ``chisq_term``
    ``(n_obs - n*p)^2 / (n*p)`` (round 6).  Rows with non-positive or NULL
    amounts are excluded (Benford applies to positive measurements).
    """
    cents = F.round(F.col(amount_col) * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        df.where(F.col(amount_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    total = obs.agg(F.sum("n_obs").cast("long").alias("_n"))
    # ln(1+1/d)/ln(10) with the SAME double tree in the oracle; the ln
    # calls are the only cross-engine 1-ulp hazard, handled by round(9).
    ln10 = "ln(10e0)"
    p_benford = F.expr(f"ln(1e0 + 1e0 / cast(digit as double)) / {ln10}")
    return (
        obs.join(F.broadcast(total))
        .withColumn("p_obs", F.col("n_obs") / F.col("_n"))
        .withColumn("p_benford", F.round(p_benford, 9))
        .withColumn(
            "chisq_term",
            F.round(
                F.pow(
                    F.col("n_obs")
                    - F.col("_n") * F.expr(f"ln(1e0 + 1e0 / cast(digit as double)) / {ln10}"),
                    2,
                )
                / (F.col("_n") * F.expr(f"ln(1e0 + 1e0 / cast(digit as double)) / {ln10}")),
                6,
            ),
        )
        .select("digit", "n_obs", "p_obs", "p_benford", "chisq_term")
    )


def benford_expected(digit: int) -> float:
    """Python-side twin for tests: Benford probability of ``digit``."""
    return math.log10(1.0 + 1.0 / digit)
