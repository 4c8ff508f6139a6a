"""Fellegi-Sunter record-linkage scoring over blocked candidate pairs.

Reference analog: the reference links noisy extracted labels to a
canonical dimension by exact-then-fuzzy agreement
(``tasks/point_extraction/legend_item_utils.py:108-180`` label-to-legend
matching, the fuzzy join family in SURVEY §2.3 J9) and fuses multiple
agreeing/disagreeing evidence sources into one confidence
(``tasks/metadata_extraction`` place votes).  Fellegi-Sunter (1969) is
the canonical probabilistic form of that rule: each comparison field i
contributes ``ln(m_i/u_i)`` when it agrees and ``ln((1-m_i)/(1-u_i))``
when it disagrees, where ``m_i = P(agree | true match)`` and
``u_i = P(agree | non-match)``.

This module takes a *blocked pair frame* (the caller supplies the
blocking equi-join — hash join on block keys, never cartesian) with 0/1
agreement columns and a 0/1 truth column, and returns the agreement-
pattern table with m/u estimated from the data itself (exact BIGINT
count ratios over true vs false pairs) and the FS log-likelihood weight
per pattern.

Scale shape: ONE combinable groupBy collapses the pair corpus to
<= 2^k pattern rows; every window after runs over that droplet.  A
pattern whose required ratio is degenerate (a zero cell) reports a NULL
weight — never a ln(0) or an epsilon fudge (the woe.py convention).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fs_pattern_weights(
    pairs: DataFrame,
    *,
    agree_cols: Sequence[str],
    truth_col: str,
) -> DataFrame:
    """Agreement-pattern table with estimated m/u and FS weights.

    Returns (agree_cols..., n_pairs, n_true, m_<f>, u_<f> per field,
    weight).  ``weight`` is the summed per-field log-likelihood ratio for
    the pattern; NULL when any used ratio has a zero cell.
    """
    fields = list(agree_cols)
    pat = pairs.groupBy(*[F.col(c) for c in fields]).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col(truth_col).cast("long")).cast("long").alias("n_true"),
    )
    # <= 2^k pattern rows: the unpartitioned windows below are bounded by
    # the field-pattern alphabet, never the pair corpus
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    false_pairs = F.col("n_pairs") - F.col("n_true")
    # all droplet totals in ONE select so they share a single WindowExec
    tot_cols = [
        F.sum("n_true").over(w).cast("long").alias("_tt"),
        F.sum(false_pairs).over(w).cast("long").alias("_tf"),
    ]
    for f in fields:
        agree = F.col(f) == 1
        tot_cols += [
            F.sum(F.when(agree, F.col("n_true")).otherwise(F.lit(0)))
            .over(w)
            .cast("long")
            .alias(f"_mt_{f}"),
            F.sum(F.when(agree, false_pairs).otherwise(F.lit(0)))
            .over(w)
            .cast("long")
            .alias(f"_ut_{f}"),
        ]
    t = pat.select("*", *tot_cols)

    dbl = lambda c: c.cast("double")  # noqa: E731
    out_cols = [*fields, "n_pairs", "n_true"]
    terms = []
    for f in fields:
        mt, ut = F.col(f"_mt_{f}"), F.col(f"_ut_{f}")
        tt, tf = F.col("_tt"), F.col("_tf")
        m = dbl(mt) / dbl(tt)
        u = dbl(ut) / dbl(tf)
        t = t.withColumn(f"m_{f}", F.round(m, 9)).withColumn(
            f"u_{f}", F.round(u, 9)
        )
        out_cols += [f"m_{f}", f"u_{f}"]
        # agree term needs m>0,u>0; disagree term needs m<1,u<1 — pattern-
        # specific degeneracy, NULL propagates into the weight sum
        terms.append(
            F.when((F.col(f) == 1) & (mt > 0) & (ut > 0), F.log(m / u)).when(
                (F.col(f) == 0) & (mt < tt) & (ut < tf),
                F.log((F.lit(1.0) - m) / (F.lit(1.0) - u)),
            )
        )
    weight = terms[0]
    for term in terms[1:]:
        weight = weight + term
    return t.select(*out_cols, F.round(weight, 9).alias("weight"))
