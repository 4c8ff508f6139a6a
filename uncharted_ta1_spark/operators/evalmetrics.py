"""Buffered-match evaluation metrics (precision / recall / F1).

Reference analog (SURVEY.md §2.4 A9): point-extraction scoring matches
predicted points to ground truth within a distance buffer and reports
per-class precision/recall/F1 (``eval/18month_eval/fe_metrics_utils.py:
18-120``, ``points_extraction_calc_metrics.py:120-145``).

Here the buffer is temporal: a prediction matches iff ANY truth lies within
±buffer (set semantics — the reference's overlap-or-nearest rule reduced to
its deterministic core).  Implemented as two semi-join-shaped aggregations;
the pair join is equi-keyed on the entity so it never goes cartesian.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def buffered_f1(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("user_id",),
    ts: str = "ts_us",
    id_col: str = "event_id",
    pred_filter: Column,
    truth_filter: Column,
    buffer: int = 3_600_000_000,
) -> DataFrame:
    """Per key group: n_pred, n_truth, matched counts, precision/recall/F1.

    Groups with zero predictions (or truths) get NULL precision (recall);
    F1 is NULL unless both are defined and positive-summed.
    """
    keys = list(keys)
    preds = events.where(pred_filter).select(
        *keys, F.col(id_col).alias("_pid"), F.col(ts).alias("_pts")
    )
    truths = events.where(truth_filter).select(
        *[F.col(k).alias(f"_t_{k}") for k in keys],
        F.col(id_col).alias("_tid"),
        F.col(ts).alias("_tts"),
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_t_{k}"))
    within = F.abs(F.col("_pts") - F.col("_tts")) <= buffer

    pairs = preds.join(truths, cond & within)
    matched_preds = pairs.groupBy(*keys).agg(
        F.countDistinct("_pid").alias("matched_pred")
    )
    matched_truths = pairs.groupBy(*keys).agg(
        F.countDistinct("_tid").alias("matched_truth")
    )
    n_pred = preds.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    n_truth = (
        truths.groupBy(*[F.col(f"_t_{k}").alias(k) for k in keys])
        .agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    )
    base = events.select(*keys).distinct()
    out = (
        base.join(n_pred, keys, "left")
        .join(n_truth, keys, "left")
        .join(matched_preds, keys, "left")
        .join(matched_truths, keys, "left")
        .fillna(0, subset=["n_pred", "n_truth", "matched_pred", "matched_truth"])
    )
    precision = F.when(
        F.col("n_pred") > 0, F.col("matched_pred") / F.col("n_pred")
    )
    recall = F.when(F.col("n_truth") > 0, F.col("matched_truth") / F.col("n_truth"))
    f1 = F.when(
        precision.isNotNull() & recall.isNotNull() & ((precision + recall) > 0),
        2 * precision * recall / (precision + recall),
    )
    return out.select(
        *keys,
        "n_pred",
        "n_truth",
        F.col("matched_pred").cast("long").alias("matched_pred"),
        F.col("matched_truth").cast("long").alias("matched_truth"),
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
