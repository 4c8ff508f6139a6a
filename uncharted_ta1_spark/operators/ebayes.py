"""Empirical-Bayes beta-binomial rate smoothing — the classic shrinkage
encoder for per-entity success rates (CTR smoothing): fit a Beta(a, b)
prior to the population of per-entity rates by method of moments, then
shrink every entity's raw rate toward it in proportion to its evidence
(public method: Robbins 1956 empirical Bayes; the beta-binomial MoM fit
of standard CTR-feature practice).

Reference analog: the reference's vote-weighted geocoding shrinks
low-support candidates toward the population consensus
(``tasks/metadata_extraction/point_geocoder.py:178-189`` inverse-support
weighting); this operator is that shrinkage as a reusable encoder.

Cross-engine exactness: per-entity rates are micro-quantized to BIGINT
(floor(hits * 10^6 / n)) BEFORE the population moments, so the moment
registers are EXACT integer sums (the repo's micro-floor convention —
bit-identical in any engine and mergeable by addition).  The prior
(a, b) and the smoothed rates then derive through one fixed IEEE tree
whose SQL text is shared verbatim with the DuckDB oracle (the
dual-dialect invariant), rounded at 9 dp.

Scale design (100 TB): one combinable per-entity groupBy; the moment
fit is a reaggregation of that table into a SINGLE broadcast row;
smoothing is pure map work against the broadcast prior.  Degenerate
populations (zero variance, or variance >= m(1-m) where the MoM common
factor is non-positive) emit a NULL prior and fall back to the raw rate
— never a domain error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

# fixed IEEE fragments, textually shared with the oracle (dual-dialect
# invariant — never fork a copy)
EB_M_EXPR = f"CAST(s1 AS DOUBLE) / CAST(n_keys AS DOUBLE) / {MICRO}.0"
EB_V_EXPR = (
    f"(CAST(s2 AS DOUBLE) / CAST(n_keys AS DOUBLE)"
    f" - (CAST(s1 AS DOUBLE) / CAST(n_keys AS DOUBLE))"
    f" * (CAST(s1 AS DOUBLE) / CAST(n_keys AS DOUBLE)))"
    f" / ({MICRO}.0 * {MICRO}.0)"
)
EB_COMMON_EXPR = (
    "CASE WHEN v > 0.0 AND m * (1.0 - m) > v "
    "THEN m * (1.0 - m) / v - 1.0 END"
)
EB_OUT_EXPRS = (
    "round(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE), 9) AS raw_rate",
    "round(m * common, 9) + 0.0 AS alpha",
    "round((1.0 - m) * common, 9) + 0.0 AS beta",
    "CASE WHEN common IS NULL "
    "THEN round(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE), 9) "
    "ELSE round((CAST(hits AS DOUBLE) + m * common) "
    "           / (CAST(n AS DOUBLE) + common), 9) END + 0.0 AS smoothed_rate",
)


def eb_smoothed_rate(
    df: DataFrame,
    *,
    key: str,
    hit: Column,
    out_key: str | None = None,
) -> DataFrame:
    """Per-``key`` EB-smoothed rate of the boolean ``hit`` expression.

    Returns (key, n, hits, r_micro, raw_rate, alpha, beta,
    smoothed_rate): exact BIGINT registers, the shared prior applied on
    every row (pinning the fit inside the oracle hash), 9-dp floats.
    """
    out_key = out_key or key
    per = df.groupBy(F.col(key).alias(out_key)).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("hits"),
    )
    per = per.withColumn(
        "r_micro", F.expr(f"(hits * {MICRO}) div n").cast("long")
    )
    mom = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("r_micro").cast("long").alias("s1"),
        F.sum(F.col("r_micro") * F.col("r_micro")).cast("long").alias("s2"),
    )
    prior = mom.selectExpr(
        "n_keys", f"{EB_M_EXPR} AS m", f"{EB_V_EXPR} AS v"
    ).selectExpr("n_keys", "m", "v", f"{EB_COMMON_EXPR} AS common")
    joined = per.crossJoin(F.broadcast(prior))
    return joined.selectExpr(
        out_key, "n", "hits", "r_micro", "n_keys", *EB_OUT_EXPRS
    )


def eb_oracle_select(
    *, src_cte: str, key: str, hit_sql: str, out_key: str | None = None
) -> str:
    """DuckDB twin over a CTE named ``src_cte``: identical register
    derivation (``//`` is DuckDB's integer division — exact, like Spark's
    ``div``) and the SAME IEEE fragments for every float."""
    out_key = out_key or key
    return f"""
, eb_per AS MATERIALIZED (
  SELECT {key} AS {out_key},
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN {hit_sql} THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM {src_cte} GROUP BY 1
),
eb_perm AS (
  SELECT *, CAST((hits * {MICRO}) // n AS BIGINT) AS r_micro FROM eb_per
),
eb_mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(r_micro) AS BIGINT) AS s1,
         CAST(sum(r_micro * r_micro) AS BIGINT) AS s2
  FROM eb_perm
),
eb_prior AS (
  SELECT n_keys, m, v, {EB_COMMON_EXPR} AS common
  FROM (SELECT n_keys, {EB_M_EXPR} AS m, {EB_V_EXPR} AS v FROM eb_mom)
)
SELECT {out_key}, n, hits, r_micro, n_keys,
       {EB_OUT_EXPRS[0]},
       {EB_OUT_EXPRS[1]},
       {EB_OUT_EXPRS[2]},
       {EB_OUT_EXPRS[3]}
FROM eb_perm CROSS JOIN eb_prior
"""
