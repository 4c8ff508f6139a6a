"""Weight-of-evidence (WOE) categorical encoding with information value
(IV) — the credit-scoring-standard supervised encoder and its feature-
strength summary.

Reference analog: the reference votes on categorical evidence by summing
per-source log-ish confidence weights before thresholding
(``tasks/metadata_extraction/metadata_extraction.py`` place-vote tallies;
``tasks/geo_referencing/coordinates_extractor.py`` confidence
combination).  WOE is the public, calibrated form of that vote
(Siddiqi, "Credit Risk Scorecards", 2006): per category,
``woe = ln( (pos_c / pos_tot) / (neg_c / neg_tot) )`` and the feature's
information value ``IV = sum_c (pos_c/pos_tot - neg_c/neg_tot) * woe_c``.

Scale design: ONE combinable (category, label) groupBy; the totals are a
broadcast single row; every later step is per-category arithmetic over
the category table (droplet-sized).  Zero-cell categories (no positives
or no negatives) get NULL woe and are REPORTED, not epsilon-smoothed —
the psi_drift convention: the engine surfaces the degenerate cell, the
caller decides the smoothing.

Exactness: counts are exact BIGINTs; the single ``ln`` runs over one
division of exact integer products (``ln((pos_c * neg_tot) / (neg_c *
pos_tot))`` as a DOUBLE ratio) — the only cross-engine 1-ulp hazard,
rounded at 9; the IV term reuses the same tree, rounded at 9.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def woe_encode(
    df: DataFrame,
    *,
    cat_col: str,
    label: Column,
) -> DataFrame:
    """Per-category WOE/IV table for binary ``label`` over ``cat_col``.

    Output: one row per category — n, n_pos, n_neg (BIGINT),
    ``woe`` (round 9, NULL when a cell is zero), ``iv_term`` (round 9,
    NULL likewise).  Total IV = sum of iv_term over non-NULL rows.
    """
    cats = (
        df.select(F.col(cat_col).alias("category"), label.alias("_y"))
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("_y").cast("long")).cast("long").alias("n_pos"),
        )
        .withColumn("n_neg", (F.col("n") - F.col("n_pos")).cast("long"))
    )
    totals = cats.agg(
        F.sum("n_pos").cast("long").alias("_pt"),
        F.sum("n_neg").cast("long").alias("_nt"),
    )
    woe = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            F.expr(
                "ln(CAST(n_pos * _nt AS DOUBLE) / CAST(n_neg * _pt AS DOUBLE))"
            ),
            9,
        ),
    )
    iv = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (
                F.col("n_pos").cast("double") / F.col("_pt").cast("double")
                - F.col("n_neg").cast("double") / F.col("_nt").cast("double")
            )
            * F.expr(
                "ln(CAST(n_pos * _nt AS DOUBLE) / CAST(n_neg * _pt AS DOUBLE))"
            ),
            9,
        ),
    )
    return (
        cats.join(F.broadcast(totals))
        .select(
            "category",
            "n",
            "n_pos",
            "n_neg",
            woe.alias("woe"),
            iv.alias("iv_term"),
        )
    )
