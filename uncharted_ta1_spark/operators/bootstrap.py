"""Poisson bootstrap confidence intervals — the web-scale resampling
method (public: Chamandy et al., "Estimating Uncertainty for Massive
Data Streams", Google 2012; Hanley & MacGibbon 2006): instead of
materializing B multinomial resamples (impossible distributed — the
joint constraint couples all rows), each row independently draws a
Poisson(1) replication weight per replicate.  Replicate statistics are
then plain WEIGHTED aggregates — map-side combinable registers — and
the percentile CI reads off the B replicate values.

Determinism: the Poisson draw is the repo's md5 position-hash inverted
through a FIXED integer CDF table (cumulative Poisson(1) probabilities
scaled to 1e6 and frozen as literals, identical in both engines) — no
RNG state, rerun-stable, engine-portable.

Reference analog: the reference's eval harness reports score
distributions over repeated runs (``eval/18month_eval/
points_extraction_calc_metrics.py:120-145`` decile summaries); the
bootstrap is the principled CI on such metrics.

Scale design (100 TB): the row x B fan-out collapses IMMEDIATELY into a
per-(group, replicate) combinable groupBy — shuffle volume is
|groups| x B registers, not row-level; the CI rank runs on the
B-row-per-group table (documented bounded window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# cumulative Poisson(1) CDF * 1e6, frozen (k = #thresholds <= h gives the
# weight); tail beyond 8 is < 1e-5 and rounds into the last bucket
POISSON_CDF_MICRO = (367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990)
N_REPLICATES = 200


def poisson_weight(h: Column) -> Column:
    """Poisson(1) weight from a uniform [0, 1e6) integer hash: the count
    of CDF thresholds <= h.  Built as a when-chain (NOT an array fold):
    whole-stage codegen's subexpression elimination then evaluates the
    (expensive, md5-backed) ``h`` ONCE per row — the fold form embedded
    ``h`` in the lambda and re-evaluated it per threshold, measured 6x
    slower end-to-end."""
    chain = F.when(h < POISSON_CDF_MICRO[0], 0)
    for i, t in enumerate(POISSON_CDF_MICRO[1:], 1):
        chain = chain.when(h < t, i)
    return chain.otherwise(len(POISSON_CDF_MICRO))


def bootstrap_mean_ci(
    df: DataFrame,
    *,
    group: str,
    value: str,
    row_key: Column,
    n_replicates: int = N_REPLICATES,
    salt: str = "boot",
) -> DataFrame:
    """Per-``group`` Poisson-bootstrap percentile CI (2.5/97.5) of the
    mean of ``value``.

    Returns (group, n_rows, mean_value, n_replicates, ci_lo, ci_hi) with
    exact integer registers underneath: replicate sums/counts are BIGINT,
    each replicate mean is ONE division (rounded 9 dp) and the CI picks
    order statistics by rank over the B-row-per-group table.
    """
    from uncharted_ta1_spark.functions.portable import md5_i64

    b = F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("b")
    rows = df.select(
        F.col(group).alias("grp"), F.col(value).cast("long").alias("v"), row_key.alias("rk")
    ).select("grp", "v", "rk", b)
    h = md5_i64(F.concat_ws("|", F.lit(salt), F.col("rk"), F.col("b").cast("string"))) % 1_000_000
    weighted = rows.withColumn("w", poisson_weight(h))
    reps = weighted.groupBy("grp", "b").agg(
        F.sum(F.col("w") * F.col("v")).cast("long").alias("s"),
        F.sum("w").cast("long").alias("c"),
    )
    reps = reps.withColumn(
        "m",
        F.when(
            F.col("c") > 0,
            F.round(F.col("s").cast("double") / F.col("c").cast("double"), 9),
        ),
    )
    # rank over the B-row-per-group replicate table (bounded: B rows/group)
    w_rank = Window.partitionBy("grp").orderBy(
        F.col("m").asc_nulls_first(), F.col("b").asc()
    )
    ranked = reps.withColumn("_r", F.row_number().over(w_rank))
    lo_r = max(1, round(0.025 * n_replicates))
    hi_r = min(n_replicates, round(0.975 * n_replicates))
    ci = ranked.groupBy("grp").agg(
        F.max(F.when(F.col("_r") == lo_r, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("_r") == hi_r, F.col("m"))).alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    )
    base = df.groupBy(F.col(group).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.sum(F.col(value).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("mean_value"),
    )
    return base.join(ci, "grp").select(
        F.col("grp").alias(group),
        "n_rows",
        "mean_value",
        "n_replicates",
        "ci_lo",
        "ci_hi",
    )
