"""Leakage-free temporal dataset splitting: expanding-window CV folds and
train/serve drift measurement (PSI).

Reference analog: the reference prepares held-out evaluation sets apart
from the data the pipeline was tuned on (``eval/18month_eval/
georef_groundtruth_prepare.py:27-80`` builds the ground-truth holdout,
``util/etl/ngmdb_to_contest.py`` carves contest subsets).  This module is
the engine-side generalization demanded by the north rule's point-in-time
contract: when the corpus is a time-keyed stream of training sequences,
*train/test membership must respect event time* — an evaluation fold may
only be preceded by its training data, never interleaved with it
(otherwise the as-of features leak the future).

Both operators are pure DataFrame algebra:

* :func:`time_series_cv` — one corpus scan (min/max), one 5-key groupBy
  (map-side combinable), then window math over the <=``n_segments``-row
  summary.  At 10^12 rows the only corpus-wide work is the scan + partial
  aggregation; the fold arithmetic runs on a handful of rows.
* :func:`psi_drift` — one conditional aggregation per (bin) over a single
  hash shuffle; the PSI formula runs on the per-bin summary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_series_cv(
    df: DataFrame,
    *,
    time_col: str = "event_epoch",
    weight_col: str | None = None,
    n_segments: int = 5,
) -> DataFrame:
    """Expanding-window cross-validation folds over event time.

    The observed time span ``[min, max]`` is cut into ``n_segments`` equal
    integer ranges; fold ``f`` (``1 <= f <= n_segments-1``) uses segment
    ``f`` as its test window and ALL earlier segments as training data —
    the classic expanding-window scheme that can never leak future rows
    into a training fold.

    Returns one row per fold: ``(fold, train_rows, test_rows,
    train_max_t, test_min_t, test_max_t, leak_free)`` plus
    ``train_weight/test_weight`` when ``weight_col`` is given.
    ``leak_free`` is the materialized invariant ``train_max_t <
    test_min_t`` (true whenever both sides are non-empty).

    Scale shape: segment assignment is exact integer math on each row
    (no sort), the per-segment rollup is a combinable groupBy on
    ``n_segments`` keys, and the fold expansion is a window over that
    tiny summary — deliberately NOT a per-fold corpus self-join, which
    would scan the corpus ``n_segments`` times.
    """
    t = F.col(time_col).cast("long")
    bounds = df.agg(
        F.min(t).alias("_mn"), F.max(t).alias("_mx")
    )
    seg = F.expr(
        f"CAST((({time_col} - _mn) * {n_segments}) DIV (_mx - _mn + 1) AS BIGINT)"
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("_cnt"),
        F.min(t).alias("_seg_min"),
        F.max(t).alias("_seg_max"),
    ]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col).cast("long")).alias("_w"))
    per_seg = (
        df.join(F.broadcast(bounds))
        .withColumn("_seg", seg)
        .groupBy("_seg")
        .agg(*aggs)
    )
    # the summary has <= n_segments rows: an unpartitioned window here is a
    # driver-scale sort over a handful of rows, not a corpus sort
    prev = Window.orderBy("_seg").rowsBetween(Window.unboundedPreceding, -1)
    enriched = (
        per_seg.withColumn("train_rows", F.sum("_cnt").over(prev).cast("long"))
        .withColumn("train_max_t", F.max("_seg_max").over(prev))
    )
    if weight_col is not None:
        # window must run BEFORE the fold filter: fold f's training mass is
        # every earlier segment, including segment 0 (never a test fold)
        enriched = enriched.withColumn(
            "train_weight", F.sum("_w").over(prev).cast("long")
        )
    return (
        enriched.where((F.col("_seg") >= 1) & (F.col("_seg") <= n_segments - 1))
        .select(
            F.col("_seg").alias("fold"),
            "train_rows",
            F.col("_cnt").alias("test_rows"),
            "train_max_t",
            F.col("_seg_min").alias("test_min_t"),
            F.col("_seg_max").alias("test_max_t"),
            (F.col("train_max_t") < F.col("_seg_min")).alias("leak_free"),
            *(
                ["train_weight", F.col("_w").alias("test_weight")]
                if weight_col is not None
                else []
            ),
        )
    )


def psi_drift(
    df: DataFrame,
    *,
    time_col: str,
    bin_expr: Column,
) -> DataFrame:
    """Population Stability Index between the early and late half of the
    corpus's time span — the standard train/serve drift gate for a feature
    column (``PSI = sum_i (p_i - q_i) * ln(p_i / q_i)`` over shared bins).

    ``bin_expr`` must be a deterministic integer-valued binning of the
    feature (e.g. ``F.col("n_tok")`` for an already-discrete feature).
    Bins that appear on only one side carry an undefined log-ratio; they
    are excluded from the PSI sum and reported via the
    ``bins_one_sided`` / ``rows_one_sided`` columns instead of being
    silently epsilon-smoothed — the caller sees exactly how much mass the
    index ignored.

    One scan computes the midpoint; one combinable groupBy per bin with
    conditional counts does the rest.  Output is a single summary row:
    ``(bins_shared, bins_one_sided, rows_early, rows_late,
    rows_one_sided, psi)``.

    Cross-engine determinism: each bin's PSI term is a fixed IEEE
    expression tree over exact integer counts (bit-identical in any
    engine); terms are then floored to integer nano-units and summed as
    BIGINT — an order-free exact sum — so the final ``psi`` double is
    reproducible bit-for-bit regardless of aggregation order.
    """
    t = F.col(time_col).cast("long")
    bounds = df.agg(F.min(t).alias("_mn"), F.max(t).alias("_mx"))
    # integer midpoint (integer division — double->long casts truncate in
    # Spark but round in DuckDB); early half = [mn, mid], late = (mid, mx]
    mid = F.expr("_mn + (_mx - _mn) DIV 2")
    binned = (
        df.join(F.broadcast(bounds))
        .withColumn("_late", (t > mid).cast("int"))
        .withColumn("_bin", bin_expr.cast("long"))
    )
    per_bin = binned.groupBy("_bin").agg(
        F.sum(F.when(F.col("_late") == 0, 1).otherwise(0)).cast("long").alias("c_early"),
        F.sum(F.col("_late")).cast("long").alias("c_late"),
    )
    tot = per_bin.agg(
        F.sum("c_early").cast("long").alias("n_early"),
        F.sum("c_late").cast("long").alias("n_late"),
    )
    shared = (F.col("c_early") > 0) & (F.col("c_late") > 0)
    p = F.col("c_early").cast("double") / F.col("n_early").cast("double")
    q = F.col("c_late").cast("double") / F.col("n_late").cast("double")
    contrib_nano = F.floor((p - q) * F.log(p / q) * F.lit(1e9)).cast("long")
    return (
        per_bin.join(F.broadcast(tot))
        .agg(
            F.sum(F.when(shared, 1).otherwise(0)).cast("long").alias("bins_shared"),
            F.sum(F.when(shared, 0).otherwise(1)).cast("long").alias("bins_one_sided"),
            F.max("n_early").alias("rows_early"),
            F.max("n_late").alias("rows_late"),
            F.sum(
                F.when(shared, F.lit(0)).otherwise(F.col("c_early") + F.col("c_late"))
            )
            .cast("long")
            .alias("rows_one_sided"),
            (F.sum(F.when(shared, contrib_nano).otherwise(F.lit(0))).cast("double")
             / F.lit(1e9)).alias("psi"),
        )
    )
