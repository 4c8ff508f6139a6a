"""Filter operators driven by grouped aggregates.

Reference analogs (SURVEY.md §2.2):
  * F3 ``UTMStatePlaneFilter`` (``tasks/geo_referencing/filter.py:60-140``) —
    drop whole source-groups based on per-group counts / max confidence.
  * F2 ``ROIFilter`` adaptive re-add (``filter.py:200-237``) — if fewer than
    N survivors remain after filtering, re-admit the best dropped rows at
    reduced confidence until N is reached.
  * F9 ``_should_run`` guards (``coordinates_extractor.py:138-146``) —
    conditional stages expressed as predicate splits.

All are single-shuffle window/group formulations — the grouped aggregate is
computed over a window on the same keys, so Catalyst plans ONE exchange and
reuses its sort; no self-join, no second scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_agg_filter(
    df: DataFrame,
    *,
    keys: Sequence[str],
    min_count: int | None = None,
    agg_predicates: dict[str, tuple[str, Column]] | None = None,
) -> DataFrame:
    """Keep only rows whose key group passes group-level predicates.

    ``agg_predicates`` maps an output column name to ``(spark_agg_sql,
    predicate_column)`` evaluated over the group window.  The group count is
    always emitted as ``grp_count``.
    """
    w = Window.partitionBy(*keys)
    out = df.withColumn("grp_count", F.count(F.lit(1)).over(w).cast("long"))
    cond = F.lit(True)
    if min_count is not None:
        cond = cond & (F.col("grp_count") >= min_count)
    for name, (expr_sql, pred) in (agg_predicates or {}).items():
        out = out.withColumn(name, F.expr(expr_sql).over(w))
        cond = cond & pred
    return out.where(cond)


def adaptive_topup_filter(
    df: DataFrame,
    *,
    keys: Sequence[str],
    keep: Column,
    order: Sequence[str],
    target: int = 2,
    readmit_factor: float = 0.5,
    value_col: str = "value",
) -> DataFrame:
    """Predicate filter with best-first re-admission up to `target` rows.

    Rows passing ``keep`` survive unconditionally.  If a key group has fewer
    than ``target`` survivors, the best excluded rows (by ``order`` desc,
    deterministic) are re-admitted with ``adj_{value_col} = value *
    readmit_factor`` (the reference's 0.5× confidence re-add) and
    ``was_topup = true``.
    """
    marked = df.withColumn("_keep", keep)
    wgrp = Window.partitionBy(*keys)
    wexc = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order]
    )
    out = (
        marked.withColumn(
            "_n_surv", F.sum(F.col("_keep").cast("int")).over(wgrp)
        )
        .withColumn(
            "_exc_rank",
            F.when(
                ~F.col("_keep"),
                F.row_number().over(
                    Window.partitionBy(*keys)
                    .orderBy(
                        F.col("_keep").desc(),  # survivors first, then best excluded
                        *[F.col(c).desc() for c in order],
                    )
                ),
            ),
        )
    )
    # excluded rows are ranked after survivors, so excluded rank within the
    # excluded subset = _exc_rank - _n_surv
    admit_excluded = (F.col("_exc_rank") - F.col("_n_surv")) <= (
        F.lit(target) - F.least(F.lit(target), F.col("_n_surv"))
    )
    out = out.where(F.col("_keep") | admit_excluded)
    out = out.withColumn("was_topup", ~F.col("_keep")).withColumn(
        f"adj_{value_col}",
        F.when(
            F.col("was_topup"), F.round(F.col(value_col) * readmit_factor, 6)
        ).otherwise(F.round(F.col(value_col), 6)),
    )
    return out.drop("_keep", "_n_surv", "_exc_rank")


def mad_outlier_flag(
    df: DataFrame,
    *,
    keys: Sequence[str],
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Flag rows > k median-absolute-deviations from the group median.

    Reference analog: ``OutlierFilter``'s MAD residual threshold
    (``tasks/geo_referencing/outlier_filter.py:246-261``) — flag, don't
    delete (rows keep a status column).  Exact medians via two grouped
    aggregations (Catalyst plans partial+final sort-based percentiles).
    """
    med = df.groupBy(*keys).agg(F.median(F.col(value_col)).alias("_med"))
    j = df.join(F.broadcast(med), list(keys))
    mad = (
        j.withColumn("_absdev", F.abs(F.col(value_col) - F.col("_med")))
        .groupBy(*keys)
        .agg(F.median(F.col("_absdev")).alias("_mad"))
    )
    out = j.join(F.broadcast(mad), list(keys))
    return (
        out.withColumn(
            "is_outlier",
            F.abs(F.col(value_col) - F.col("_med")) > F.lit(k) * F.col("_mad"),
        )
        .withColumn("grp_median", F.round(F.col("_med"), 6))
        .withColumn("grp_mad", F.round(F.col("_mad"), 6))
        .drop("_med", "_mad", "_absdev")
    )
