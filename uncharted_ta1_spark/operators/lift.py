"""Cumulative gain / lift table over a score ranking.

Reference analog: the reference constantly acts on "the top of a ranked
list" — ``tasks/point_extraction/legend_analyzer.py:202-212`` sorts
candidate predictions by model confidence and keeps the best,
``tasks/text_extraction`` filters by confidence tiers.  The engine-side
evaluation of that pattern is the classic decile lift/gain table: rank
the population by the score, cut into equal-frequency deciles, and ask
how concentrated the positives are at the top — the companion diagnostic
to :func:`ranking_auc` (AUC is threshold-free; lift says what you
actually capture at a given review budget).

Scale shape: the ranking reuses :func:`binning.ntile_equal_freq` (GK
range buckets + bounded per-bucket ranks — never one corpus-wide sort);
everything after is a 10-row summary, so the cumulative window is
bounded by construction.  All rates come from exact BIGINT counts
through a fixed IEEE division tree, so the output hash-matches the
single-sort ntile oracle bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uncharted_ta1_spark.operators.binning import ntile_equal_freq


def lift_table(
    df: DataFrame,
    *,
    score_col: str,
    label: Column,
    tiebreak: str,
    k: int = 10,
    n_buckets: int = 50,
) -> DataFrame:
    """Per-decile lift/gain of ``label`` when ranking by ``score_col``
    DESCENDING (decile 1 = highest scores; ties broken by ``tiebreak``
    ascending).  Returns k rows:
    (decile, n, n_pos, pos_rate, cum_n, cum_pos, cum_gain, lift).
    """
    # rank descending by binning ascending on the negated score — the
    # bucketer only needs a monotone order, and negation keeps the
    # float values bit-exact
    scored = df.select(
        (-F.col(score_col)).alias("_neg_score"),
        F.col(tiebreak).alias("_tb"),
        label.cast("long").alias("_pos"),
    ).withColumn("_g", F.lit(1))
    d = ntile_equal_freq(
        scored,
        keys=["_g"],
        col="_neg_score",
        order_tiebreak=["_tb"],
        k=k,
        n_buckets=n_buckets,
    )
    per = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_pos").cast("long").alias("n_pos"),
    )
    # k-row summary: the unpartitioned windows below run over exactly k
    # rows by construction (same bounded-domain convention as
    # splits.py:79)
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = per.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(wcum).cast("long").alias("cum_n"),
        F.sum("n_pos").over(wcum).cast("long").alias("cum_pos"),
        F.sum("n").over(wtot).cast("long").alias("_tot_n"),
        F.sum("n_pos").over(wtot).cast("long").alias("_tot_pos"),
    )
    dbl = lambda col: F.col(col).cast("double")  # noqa: E731
    return c.select(
        "decile",
        "n",
        "n_pos",
        F.round(dbl("n_pos") / dbl("n"), 9).alias("pos_rate"),
        "cum_n",
        "cum_pos",
        F.when(
            F.col("_tot_pos") > 0,
            F.round(dbl("cum_pos") / dbl("_tot_pos"), 9),
        ).alias("cum_gain"),
        F.when(
            F.col("_tot_pos") > 0,
            F.round(
                (dbl("cum_pos") / dbl("cum_n"))
                / (dbl("_tot_pos") / dbl("_tot_n")),
                9,
            ),
        ).alias("lift"),
    )
