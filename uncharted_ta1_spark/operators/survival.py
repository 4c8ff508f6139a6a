"""Kaplan-Meier survival estimation over session durations with
right-censoring — "how long do sessions live", answered correctly when
some sessions are still open at the observation horizon.

Reference analog: the reference's queue/service liveness accounting
treats in-flight work as open-ended rather than failed
(``tasks/common/request_client.py:50,107`` heartbeat 900 s /
blocked-connection timeout semantics; requeue-limit bookkeeping) — the
censoring idea.  The estimator itself is public (Kaplan & Meier 1958):
``S(t) = prod_{t_i <= t} (1 - d_i / n_i)`` over observed death times,
where censored subjects leave the risk set without counting as deaths.

Scale design (100 TB):

* the corpus-sized work is the per-session rollup the caller brings
  (one combinable groupBy);
* the KM table itself has one row per DISTINCT second-quantized
  duration — bounded by the duration DOMAIN (seconds within the session
  gap horizon), not by corpus size, so the two cumulative windows over
  it are droplet-sized (the splits.py segment-summary convention);
* risk counts and death counts are exact BIGINTs; the survival product
  is ``exp(cumsum(ln((n-d)/n)))`` in fixed ascending-duration order —
  identical window order both engines, ln the only 1-ulp hazard,
  rounded at 9; the everyone-dies terminal step (n == d) is handled by
  an explicit zero flag, never ``ln(0)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(
    sessions: DataFrame,
    *,
    dur_col: str = "dur_sec",
    censored_col: str = "censored",
) -> DataFrame:
    """KM estimate from per-session (duration, censored) rows.

    Output: one row per distinct duration at which at least one DEATH
    (uncensored end) occurs — ``t_sec``, ``n_at_risk``, ``n_deaths``,
    ``n_censored_at_t`` (BIGINT) and ``survival`` (round 9).
    """
    per_t = (
        sessions.select(
            F.col(dur_col).cast("long").alias("t_sec"),
            F.col(censored_col).cast("boolean").alias("_c"),
        )
        .groupBy("t_sec")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_cnt"),
            F.sum((~F.col("_c")).cast("long")).cast("long").alias("n_deaths"),
            F.sum(F.col("_c").cast("long")).cast("long").alias(
                "n_censored_at_t"
            ),
        )
    )
    total = per_t.agg(F.sum("_cnt").cast("long").alias("_tot"))
    # windows over the distinct-duration table only (domain-bounded)
    w = Window.orderBy("t_sec").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wprev = Window.orderBy("t_sec").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = per_t.join(F.broadcast(total)).withColumn(
        "n_at_risk",
        (
            F.col("_tot")
            - F.coalesce(F.sum("_cnt").over(wprev), F.lit(0))
        ).cast("long"),
    )
    term_ln = F.when(
        F.col("n_deaths") < F.col("n_at_risk"),
        F.expr(
            "ln(CAST(n_at_risk - n_deaths AS DOUBLE) "
            "/ CAST(n_at_risk AS DOUBLE))"
        ),
    )
    km = (
        risk.withColumn("_ln", term_ln)
        .withColumn(
            "_dead",
            F.max(
                (F.col("n_deaths") == F.col("n_at_risk")).cast("int")
            ).over(w),
        )
        .withColumn(
            "survival",
            F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum("_ln").over(w)), 9)
            ),
        )
    )
    return km.where(F.col("n_deaths") > 0).select(
        "t_sec", "n_at_risk", "n_deaths", "n_censored_at_t", "survival"
    )
