"""Isotonic regression (pool-adjacent-violators) over a bounded bin
table — the monotone score-calibration step between a raw model score and
a trustworthy probability.

Reference analog: the reference trusts raw extraction confidences as
comparable probabilities when it products/boosts them
(``tasks/geo_referencing/coordinates_extractor.py`` confidence
combination; ``tasks/point_extraction/point_orientation.py`` score
tiers).  Isotonic calibration is the public fix (Zadrozny & Elkan 2002;
Robertson/Wright/Dykstra's PAV): fit the best monotone step function from
score bins to observed positive rate.

Scale + exactness design:

* the corpus-sized pass is the BINNING (combinable counts per score bin —
  the caller brings it, e.g. the GK-bucketed deciles of
  ``operators/binning.py``); PAV itself runs over the BIN table, whose
  size is a fixed constant (k bins) independent of corpus size.
* over that bounded table, PAV is expressed as the minimax identity
  (Robertson et al. 1988):
  ``fitted[k] = max_{i<=k} min_{j>=k} mean(pos[i..j]) / mean(n[i..j])``
  — pure relational algebra: prefix sums + a bounded triple expansion
  (k^3/6 rows for k bins; 20 bins -> ~1.3k rows).  No iteration, no
  driver loop, no UDF — and the DuckDB oracle runs the IDENTICAL SQL
  shape, so the doubles are bit-identical (each interval mean is ONE
  division of exact BIGINT sums; min/max over identical sets).
* the windows here order <= k rows (documented bounded — same convention
  as splits.py's segment-summary windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def isotonic_fit(
    bins: DataFrame,
    *,
    order_col: str = "bin",
    n_col: str = "n",
    pos_col: str = "n_pos",
) -> DataFrame:
    """PAV isotonic fit over an ordered bin table.

    Input: one row per score bin — ``order_col`` (ascending score order),
    ``n_col`` (rows in bin), ``pos_col`` (positives in bin).  The table
    must be BOUNDED (k bins, constant in corpus size).

    Output: every input bin with ``pos_rate`` (raw observed rate) and
    ``iso_rate`` (the isotonic fit — non-decreasing in ``order_col``,
    preserving the weighted mean).  Both are raw IEEE doubles: each is a
    single division of exact integer sums, and the oracle computes the
    identical tree.
    """
    w = Window.orderBy("_b")  # bounded: k bin rows
    pre = bins.select(
        F.col(order_col).alias("_b"),
        F.col(n_col).cast("long").alias("_n"),
        F.col(pos_col).cast("long").alias("_p"),
    ).select(
        "_b",
        "_n",
        "_p",
        F.sum("_n").over(w).alias("_cn"),
        F.sum("_p").over(w).alias("_cp"),
    )
    # interval means m(i,j) over bins i..j from prefix sums (exclusive
    # left prefix via self-join on the bounded table)
    lo = pre.select(
        F.col("_b").alias("_i"),
        (F.col("_cn") - F.col("_n")).alias("_cn_lo"),
        (F.col("_cp") - F.col("_p")).alias("_cp_lo"),
    )
    hi = pre.select(
        F.col("_b").alias("_j"),
        F.col("_cn").alias("_cn_hi"),
        F.col("_cp").alias("_cp_hi"),
    )
    pairs = (
        F.broadcast(lo)
        .join(F.broadcast(hi), F.col("_i") <= F.col("_j"))
        .select(
            "_i",
            "_j",
            (
                (F.col("_cp_hi") - F.col("_cp_lo")).cast("double")
                / (F.col("_cn_hi") - F.col("_cn_lo")).cast("double")
            ).alias("_m"),
        )
    )
    spine = pre.select(F.col("_b").alias("_k"))
    # A(i,k) = min_{j>=k} m(i,j); fitted(k) = max_{i<=k} A(i,k)
    inner = (
        F.broadcast(pairs)
        .join(
            F.broadcast(spine),
            (F.col("_i") <= F.col("_k")) & (F.col("_j") >= F.col("_k")),
        )
        .groupBy("_k", "_i")
        .agg(F.min("_m").alias("_a"))
    )
    fitted = inner.groupBy("_k").agg(F.max("_a").alias("iso_rate"))
    return (
        bins.join(F.broadcast(fitted), F.col(order_col) == F.col("_k"))
        .select(
            *bins.columns,
            (
                F.col(pos_col).cast("double") / F.col(n_col).cast("double")
            ).alias("pos_rate"),
            "iso_rate",
        )
    )
